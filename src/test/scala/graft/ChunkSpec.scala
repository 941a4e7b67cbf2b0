package graft

import org.apache.spark.sql.functions._

import graft.ext.PipelineOps

/** Sliding token-window chunking: boundaries, overlap, tiling, edge docs. */
class ChunkSpec extends SparkSpec {
  import spark.implicits._

  private def doc(id: Long, nTokens: Int) =
    (id, (1 to nTokens).map(i => s"t$i").mkString(" "))

  test("chunk count, boundaries, and overlap (size=8, stride=6)") {
    val df = Seq(doc(1, 20)).toDF("doc_id", "text")
    val rows = PipelineOps.chunkByTokens(df, "doc_id", "text", 8, 6)
      .orderBy("chunk_idx")
      .select("chunk_idx", "n_chunk_tokens", "chunk_text")
      .as[(Int, Int, String)].collect()
    // ceil((20-8)/6)+1 = 3 chunks at offsets 0, 6, 12
    assert(rows.length === 3)
    assert(rows(0) === ((0, 8, (1 to 8).map(i => s"t$i").mkString(" "))))
    assert(rows(1) === ((1, 8, (7 to 14).map(i => s"t$i").mkString(" "))))
    assert(rows(2) === ((2, 8, (13 to 20).map(i => s"t$i").mkString(" "))))
  }

  test("stride == size tiles without overlap; tail chunk is short") {
    val df = Seq(doc(1, 10)).toDF("doc_id", "text")
    val rows = PipelineOps.chunkByTokens(df, "doc_id", "text", 4, 4)
      .orderBy("chunk_idx").select("n_chunk_tokens").as[Int].collect()
    assert(rows.toSeq === Seq(4, 4, 2))
  }

  test("short and empty docs produce exactly one chunk") {
    val df = Seq(doc(1, 3), (2L, ""), (3L, "   ")).toDF("doc_id", "text")
    val rows = PipelineOps.chunkByTokens(df, "doc_id", "text", 8, 6)
      .select("doc_id", "chunk_idx", "n_chunk_tokens", "chunk_text")
      .as[(Long, Int, Int, String)].collect().sortBy(_._1)
    assert(rows.toSeq === Seq((1L, 0, 3, "t1 t2 t3"), (2L, 0, 0, ""),
      (3L, 0, 0, "")))
  }

  test("every token appears untruncated in some chunk (overlap >= 0 guard)") {
    val df = Seq(doc(1, 101)).toDF("doc_id", "text")
    val covered = PipelineOps.chunkByTokens(df, "doc_id", "text", 16, 12)
      .select(explode(split(col("chunk_text"), " ")).alias("t"))
      .distinct().as[String].collect().toSet
    assert(covered === (1 to 101).map(i => s"t$i").toSet)
  }
}
