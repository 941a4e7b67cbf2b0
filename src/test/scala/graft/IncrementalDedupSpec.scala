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

  test("crash-replay of the last batch leaves sink and index duplicate-free") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.streaming.Trigger
    // The st42 shape: txlog-source commits drive incrementalDedupBatch in
    // foreachBatch. Simulate the worst crash — every data write of the
    // final batch landed, but the stream DIED BEFORE the checkpoint
    // commit — by deleting the last _cp/commits/<id> marker, then
    // restarting. The replayed batch must leave the sink and index
    // byte-equal to the clean run (batchId-keyed overwrites + the
    // strictly-earlier-batch probe), not append duplicates.
    val root = tmpDir("inc_dedup_replay")
    val table = s"$root/docs"
    (0 until 4).foreach { q =>
      graft.ops.TxLog.append(docs.filter(
        col("doc_id") >= q * 125 && col("doc_id") < (q + 1) * 125)
        .select("doc_id", "text").repartition(2), table)
    }
    val idxBands = s"$root/idx_bands"; val idxSets = s"$root/idx_sets"
    val sink = s"$root/pairs"; val cp = s"$root/_cp"
    def runOnce(): Unit =
      spark.readStream.format("graft.sources.txlog")
        .option("path", table).option("maxVersionsPerTrigger", "1").load()
        .writeStream.option("checkpointLocation", cp)
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          Dedup.incrementalDedupBatch(spark,
            hashed(batch.select("doc_id", "text")), batchId,
            idxBands, idxSets, sink)
        }
        .trigger(Trigger.AvailableNow()).start().awaitTermination()

    runOnce()
    def pairs() = spark.read.parquet(sink)
      .select(col("id_new").as[Long], col("id_idx").as[Long]).collect()
      .toSeq.sorted
    val cleanPairs = pairs()
    val cleanIdx = spark.read.parquet(idxBands).count()
    assert(cleanPairs.nonEmpty, "fixture must produce cross-batch pairs")
    assert(cleanPairs.distinct === cleanPairs, "clean run must be dup-free")

    // crash: the last batch's writes are all on disk, its checkpoint
    // commit never happened
    val commitFiles = java.nio.file.Files.list(
        java.nio.file.Paths.get(s"$cp/commits")).iterator()
    val last = scala.jdk.CollectionConverters
      .IteratorHasAsScala(commitFiles).asScala.toSeq
      .filter(_.getFileName.toString.forall(_.isDigit))
      .maxBy(_.getFileName.toString.toLong)
    java.nio.file.Files.delete(last)
    // the local checksum FS keeps a .N.crc sidecar; a stale one fails
    // the rewrite's rename on restart
    java.nio.file.Files.deleteIfExists(
      last.resolveSibling(s".${last.getFileName}.crc"))
    runOnce() // replays the final batch

    assert(pairs() === cleanPairs,
      "replayed batch must overwrite its own partition, not append")
    assert(spark.read.parquet(idxBands).count() === cleanIdx,
      "replayed batch must not duplicate index bands")
    assert(spark.read.parquet(idxSets).groupBy("id").count()
      .filter(col("count") > 1).count() === 0,
      "no document may appear twice in the set index")
  }
}
