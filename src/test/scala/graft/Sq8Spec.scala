package graft

import org.apache.spark.sql.functions._

import graft.ext.Similarity
import graft.functions.GraftFunctions

/** SQ8 quantized similarity: quantization range/sign invariants, the
  * exact-integer dot kernel, and recall of shortlist+rerank against the
  * exact brute force on real testdata embeddings. */
class Sq8Spec extends SparkSpec {
  import spark.implicits._

  GraftFunctions.register(spark)

  test("quantization uses the full int8 range and preserves signs") {
    val rows = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f, 0.0f)),   // max |v| = 1.0 → ±127 grid
      (2L, Array(0.001f, -0.002f, 0.004f, 0.003f)), // tiny but nonzero
      (3L, Array(0.0f, 0.0f, 0.0f, 0.0f)))     // all-zero
      .toDF("id", "vec")
      .select(col("id"), Similarity.quantizeSq8(col("vec")).alias("q"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Byte](1)).toMap
    assert(rows(1L) === Seq[Byte](64, -127, 32, 0))
    // max component always hits ±127 regardless of magnitude
    assert(rows(2L).max === 127 || rows(2L).min === -127)
    assert(rows(2L).forall(b => b >= -127 && b <= 127))
    assert(rows(3L) === Seq[Byte](0, 0, 0, 0))
  }

  test("vec_dot_i8 is the exact integer dot; zero-norm cosine is NULL") {
    // NB Array[Byte] would encode as BinaryType; Seq[Byte] is array<tinyint>
    val df = Seq((Seq[Byte](1, -2, 3), Seq[Byte](4, 5, -6)))
      .toDF("a", "b")
    val dot = df.select(call_function("vec_dot_i8", col("a"), col("b")))
      .collect()(0).getLong(0)
    assert(dot === (4 - 10 - 18))
    val z = Seq((Seq[Byte](0, 0), Seq[Byte](1, 1))).toDF("a", "b")
      .select(Similarity.sq8Cosine(col("a"), col("b")).alias("c")).collect()
    assert(z(0).isNullAt(0))
  }

  test("sq8 top-5 recall vs exact brute force on testdata embeddings") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = emb.filter(col("vec_id") < 10)
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select("q_id", "n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(
      emb, queries, "vec_id", "embedding", k = 5))
    val sq8 = pairs(Similarity.sq8TopK(
      emb, queries, "vec_id", "embedding", k = 5))
    val recall = (exact & sq8).size.toDouble / exact.size
    // uniform-random embeddings are the WORST case for quantized
    // shortlists (neighbor gaps ~1e-3 vs grid step ~1/127); real corpora
    // have far clearer margins. The rerank still recovers most of it.
    assert(recall >= 0.8, s"recall@5 = $recall")
    assert(exact.size === 50)
  }
}
