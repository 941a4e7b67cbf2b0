package graft

import org.apache.spark.sql.functions._

import graft.ext.Dedup
import graft.functions.GraftFunctions

/** Incremental dedup against a persisted band index: a new batch must find
  * exactly the cross-boundary pairs the full-corpus self-join would. */
class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = {
    GraftFunctions.register(spark)
    Tables.load(spark, SF, "documents")
  }

  private def hashed(df: org.apache.spark.sql.DataFrame) = df.select(
    col("doc_id").alias("id"), Dedup.shingleHashes(col("text"), 3).alias("hs"))

  test("incremental candidates == full self-join candidates restricted to cross pairs") {
    val split = 250L
    val idxBands = Dedup.minhashBandTable(
      hashed(docs.filter(col("doc_id") < split)), 64, 16)
    val newBands = Dedup.minhashBandTable(
      hashed(docs.filter(col("doc_id") >= split)), 64, 16)
    val incremental = Dedup.incrementalCandidates(newBands, idxBands)
      .select(col("id_new").as[Long], col("id_idx").as[Long]).collect()
      .map { case (n, i) => (math.min(n, i), math.max(n, i)) }.toSet

    val full = Dedup.minhashBandCandidates(hashed(docs), 64, 16)
      .select(col("id_a").as[Long], col("id_b").as[Long]).collect().toSet
    val cross = full.filter { case (a, b) => a < split && b >= split }

    // The band tables are deterministic per doc, so cross-boundary pairs
    // agree exactly — the property that makes "band once, join increments"
    // equivalent to re-running the self-join over the grown corpus.
    // (Caveat proven by construction: per-bucket caps apply per side in
    // the incremental path; at this scale no bucket nears the cap.)
    assert(incremental === cross)
    assert(incremental.nonEmpty,
      "fixture must contain cross-boundary near-dups for this test to bite")
  }

  test("bucketed band index: the incremental join shuffles ONLY the batch side") {
    val split = 250L
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a non-broadcast join so exchanges (or their absence) show
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      Dedup.minhashBandTable(hashed(docs.filter(col("doc_id") < split)), 64, 16)
        .write.mode("overwrite").format("parquet")
        .bucketBy(8, "band", "band_hash").saveAsTable("band_index")
      val newBands = Dedup.minhashBandTable(
        hashed(docs.filter(col("doc_id") >= split)), 64, 16)

      val joined = newBands.join(spark.table("band_index")
          .withColumnRenamed("id", "id_idx"), Seq("band", "band_hash"))
      val plan = joined.queryExecution.executedPlan.toString
      // exactly one Exchange — the O(batch) side; the stored index is
      // read pre-partitioned on the join key (the scaladoc's 100 TB
      // claim: an increment never shuffles the corpus)
      assert("Exchange hashpartitioning".r.findAllIn(plan).length === 1, plan)
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS band_index")
    }
  }

  test("verify stage keeps only pairs at/above the Jaccard threshold") {
    val split = 250L
    val idxH = hashed(docs.filter(col("doc_id") < split))
    val newH = hashed(docs.filter(col("doc_id") >= split))
    val verified = Dedup.verifyJaccardIncremental(
      Dedup.incrementalCandidates(
        Dedup.minhashBandTable(newH, 64, 16),
        Dedup.minhashBandTable(idxH, 64, 16)),
      Dedup.shingleSets(newH), Dedup.shingleSets(idxH), threshold = 0.2)
    val rows = verified.select("id_new", "id_idx", "jaccard")
      .as[(Long, Long, Double)].collect()
    assert(rows.forall(_._3 >= 0.2))
    assert(rows.forall { case (n, i, _) => n >= split && i < split })
  }
}
