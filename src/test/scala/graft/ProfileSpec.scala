package graft

import org.apache.spark.sql.execution.ExplainMode

import graft.ext.PipelineOps

/** Column profiling: exact stats with nulls, and the one-job plan shape. */
class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (1L, Some("en"), 10L), (2L, None, 10L), (3L, Some("fr"), 20L),
    (4L, Some("en"), 30L)).toDF("id", "lang", "n")

  test("per-column rows / non-null / distinct / min / max are exact") {
    val p = PipelineOps.profile(df, Seq("id", "lang", "n"))
      .as[(String, Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(p("id") === (("id", 4L, 4L, 4L, "1", "4")))
    assert(p("lang") === (("lang", 4L, 3L, 2L, "en", "fr")))
    assert(p("n") === (("n", 4L, 4L, 3L, "10", "30")))
  }

  test("all columns profile in ONE aggregation job (Expand, single agg subtree)") {
    val plan = PipelineOps.profile(df, Seq("id", "lang", "n"))
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("Expand"), plan)
    // one logical aggregation (partial/final pairs over one Expand), not
    // a per-column union of scans
    assert(!plan.contains("Union"), plan)
  }
}
