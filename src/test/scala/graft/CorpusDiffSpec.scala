package graft

import graft.ext.PipelineOps

/** Corpus-version diff classification, including the NULL-text edges the
  * hash-presence formulation gets wrong. */
class CorpusDiffSpec extends SparkSpec {
  import spark.implicits._

  test("added / removed / changed / unchanged classify correctly") {
    val v1 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "text")
    val v2 = Seq((2L, "b"), (3L, "c2"), (4L, "d")).toDF("id", "text")
    val d = PipelineOps.corpusDiff(v1, v2, "id", "text")
      .as[(Long, String)].collect().toMap
    assert(d === Map(1L -> "removed", 2L -> "unchanged", 3L -> "changed",
      4L -> "added"))
  }

  test("NULL text: present rows stay present; NULL vs text reads changed") {
    val v1 = Seq((1L, null), (2L, null), (3L, "x")).toDF("id", "text")
    val v2 = Seq((1L, null), (2L, "now-set"), (3L, null: String))
      .toDF("id", "text")
    val d = PipelineOps.corpusDiff(v1, v2, "id", "text")
      .as[(Long, String)].collect().toMap
    assert(d === Map(1L -> "unchanged", 2L -> "changed", 3L -> "changed"))
  }
}
