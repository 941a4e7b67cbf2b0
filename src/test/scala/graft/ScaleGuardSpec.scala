package graft

import org.apache.spark.sql.functions._

import graft.ext.{Dedup, IvfIndex, Similarity, TextAnalysis}

/** Guards that only matter at scale: hot-bucket caps on the LSH/SimHash
  * self-joins (a boilerplate cluster collapsing to one signature must not
  * go quadratic), the de-quadratic'd repetition filter on adversarially
  * long docs, and the IVF index at a cell count a plan-literal argmin
  * could not survive.
  */
class ScaleGuardSpec extends SparkSpec {
  import spark.implicits._

  // 10k identical docs (one hot signature bucket) + two near-dup docs in
  // their own small bucket
  private lazy val hotDocs = {
    val hot = (0L until 10000L).map(i => (i, "lorem ipsum boilerplate footer text repeated on every page"))
    val pair = Seq(
      (20000L, "a genuinely unique document about distributed query engines"),
      (20001L, "a genuinely unique document about distributed query engines"))
    (hot ++ pair).toDF("doc_id", "text")
  }

  test("simhash hot bucket is capped: boilerplate cluster dropped, small bucket still pairs") {
    val pairs = Dedup.simhashPairs(hotDocs, "doc_id", "text",
      maxHamming = 3, chunks = 4, maxBucket = 100)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    // without the cap this would be a 10k×10k/2 within-bucket join
    assert(pairs.toSet === Set((20000L, 20001L)))
  }

  test("minhash band hot bucket is capped the same way") {
    graft.functions.GraftFunctions.register(spark)
    val hashed = hotDocs.select(col("doc_id").alias("id"),
      Dedup.shingleHashes(col("text"), 3).alias("hs"))
    val cands = Dedup.minhashBandCandidates(hashed, numHashes = 64,
      bands = 16, maxBucket = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(cands.toSet === Set((20000L, 20001L)))
  }

  test("embedding LSH hot bucket is capped") {
    val hot = (0L until 5000L).map(i => (i, Array.fill(64)(0.5f)))
    val pair = Seq(
      (90000L, Array.tabulate(64)(j => if (j % 2 == 0) 1.0f else -1.0f)),
      (90001L, Array.tabulate(64)(j => if (j % 2 == 0) 0.99f else -1.0f)))
    val df = (hot ++ pair).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDupPairs(df, "vec_id", "embedding",
      threshold = 0.9, nPlanes = 8, maxBucket = 100)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet === Set((90000L, 90001L)))
  }

  test("repetition ratio is linearithmic: a 50k-token doc computes instantly and exactly") {
    val n = 50000
    val text = (Seq.fill(n / 2)("spam") ++ (0 until n / 2).map(i => s"tok$i"))
      .mkString(" ")
    val t0 = System.nanoTime()
    val r = Seq(Tuple1(text)).toDF("text")
      .select(TextAnalysis.repetitionRatio(col("text"))).head().getDouble(0)
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    assert(r === 0.5) // 25k copies of "spam" over 50k tokens
    // the old distinct×filter form did 25k × 50k = 1.25e9 comparisons here
    assert(elapsedMs < 20000, s"took ${elapsedMs}ms")
    // empty doc keeps the NULL contract
    assert(Seq(Tuple1("   ")).toDF("text")
      .select(TextAnalysis.repetitionRatio(col("text"))).head().isNullAt(0))
  }

  test("IVF at 1024 cells: broadcast centroid assignment, sane recall, no literal ceiling") {
    val emb = Tables.load(spark, "/root/testdata/sf0.1", "embeddings")
    val queries = emb.filter(col("vec_id") < 5)
    val ivfDf = IvfIndex.topK(emb, queries, "vec_id", "embedding",
      k = 5, nCells = 1024, nProbe = 128)
    // the centroids travel as a broadcast, not as a 1024-struct plan literal
    val plan = ivfDf.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"), plan.take(2000))
    val ivf = ivfDf.select("q_id", "n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf.size === 25)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(ivf).size.toDouble / exact.size
    assert(recall > 0.0, s"recall was $recall")
  }
}
