package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.PipelineOps

/** Count-based per-group sampling: determinism, group caps, and
  * equivalence with the window row_number formulation. */
class SamplePerGroupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs =
    Tables.load(spark, SF, "documents").select("doc_id", "source")

  test("exactly min(k, |group|) rows per group, deterministic across runs") {
    val k = 7
    val sizes = docs.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    val once = PipelineOps.samplePerGroup(docs, "doc_id", "source", k)
    val counts = once.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    assert(counts === sizes.map { case (s, n) => s -> math.min(k.toLong, n) })
    val a = once.as[(Long, String)].collect().toSet
    val b = PipelineOps.samplePerGroup(docs, "doc_id", "source", k)
      .as[(Long, String)].collect().toSet
    assert(a === b)
  }

  test("matches the window row_number formulation exactly") {
    val k = 20
    val w = Window.partitionBy("source")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    val windowed = docs.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k).select("doc_id", "source")
      .as[(Long, String)].collect().toSet
    val custom = PipelineOps.samplePerGroup(docs, "doc_id", "source", k)
      .as[(Long, String)].collect().toSet
    assert(custom === windowed)
  }
}
