package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.ops.TxLog

/** Round-15 session-3 cross-feature compositions: each new table-tier
  * feature against the ones that could plausibly break it. */
class CrossFeatureR15Spec extends SparkSpec {
  import spark.implicits._

  test("partition evolution on a column-mapped table stays metadata-only") {
    val t = tmpDir("xf15_pecm") + "/t"
    TxLog.setProperties(t, Map("graft.partition.columns" -> "a"))
    TxLog.append(Seq((1L, "x", 10), (2L, "y", 20)).toDF("k", "a", "b"), t)
    TxLog.enableColumnMapping(t)
    TxLog.renameColumn(t, "b", "bucket")
    val before = TxLog.activeFiles(t).toSet
    // evolve to the RENAMED logical name — resolution is logical, the
    // layout lands the frozen physical name
    TxLog.alterPartitioning(t, Seq("bucket"))
    assert(TxLog.activeFiles(t).toSet === before, "evolution rewrote data")
    TxLog.append(Seq((3L, "z", 30)).toDF("k", "a", "bucket"), t)
    val newEra = TxLog.activeFiles(t).diff(before.toSeq)
    // the new era's directory carries the PHYSICAL name (b's frozen
    // name), not the logical "bucket"
    assert(newEra.nonEmpty && newEra.forall(_.contains("=")), newEra)
    assert(TxLog.read(spark, t).orderBy("k").select("k", "a", "bucket")
      .as[(Long, String, Int)].collect().toSeq ===
      Seq((1L, "x", 10), (2L, "y", 20), (3L, "z", 30)))
    // a subsequent logical rename of the NEW partition column stays
    // metadata-only too
    val files = TxLog.activeFiles(t).toSet
    TxLog.renameColumn(t, "bucket", "cell")
    assert(TxLog.activeFiles(t).toSet === files)
    assert(TxLog.read(spark, t).columns.toSeq === Seq("k", "a", "cell"))
  }

  test("partition evolution preserves row-tracking ids across eras") {
    val t = tmpDir("xf15_pert") + "/t"
    TxLog.enableRowTracking(t)
    TxLog.append(Seq((1L, "p1"), (2L, "p2")).toDF("k", "p").coalesce(1), t)
    val before = TxLog.readWithRowIds(spark, t)
      .select("k", "_row_id").as[(Long, Long)].collect().toMap
    TxLog.alterPartitioning(t, Seq("p"))
    TxLog.append(Seq((3L, "p1")).toDF("k", "p"), t)
    val after = TxLog.readWithRowIds(spark, t)
      .select("k", "_row_id").as[(Long, Long)].collect().toMap
    assert(after(1L) === before(1L) && after(2L) === before(2L),
      "old-era rows keep their ids through the layout change")
    assert(after.values.toSeq.distinct.size === 3, "new row got a fresh id")
    // DML across the mixed eras keeps ids of untouched rows
    TxLog.delete(spark, t, col("k") === 2L)
    val postDml = TxLog.readWithRowIds(spark, t)
      .select("k", "_row_id").as[(Long, Long)].collect().toMap
    assert(postDml(1L) === before(1L))
  }

  test("streaming source reads transparently through a compacted log") {
    val t = tmpDir("xf15_lcstream") + "/t"
    (1 to 35).foreach(i => TxLog.append(
      Seq((i.toLong, s"v$i")).toDF("k", "v").coalesce(1), t))
    val cp = tmpDir("xf15_lc_cp"); val sink = tmpDir("xf15_lc_sink")
    def drain(): Unit =
      spark.readStream.format("graft.sources.txlog").option("path", t).load()
        .writeStream.format("parquet")
        .option("checkpointLocation", cp).option("path", sink)
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    drain()
    assert(spark.read.parquet(sink).count() === 35)
    // compact the cold range, append, resume from the SAME checkpoint:
    // the offset ledger is versions, which the containers preserve
    assert(TxLog.compactLog(t).nonEmpty)
    TxLog.append(Seq((99L, "z")).toDF("k", "v").coalesce(1), t)
    drain()
    assert(spark.read.parquet(sink).count() === 36, "exactly the new row")
    // a FRESH stream from genesis folds through the containers
    val sink2 = tmpDir("xf15_lc_sink2")
    spark.readStream.format("graft.sources.txlog").option("path", t).load()
      .writeStream.format("parquet")
      .option("checkpointLocation", tmpDir("xf15_lc_cp2"))
      .option("path", sink2)
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
    assert(spark.read.parquet(sink2).count() === 36)
  }

  test("NOT MATCHED BY SOURCE sees only LIVE rows on a DV'd table") {
    val t = tmpDir("xf15_nmbsdv") + "/t"
    TxLog.append(Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
      .toDF("k", "v").coalesce(1), t)
    TxLog.deleteVectors(spark, t, col("k") === 3L) // DV kill, no rewrite
    Seq(1L).toDF("k").createOrReplaceTempView("xf15_nmbs_src")
    spark.sql(
      s"""MERGE INTO txlog.`$t` AS t USING xf15_nmbs_src AS s ON t.k = s.k
         |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = 'stale'
         |""".stripMargin)
    val got = TxLog.read(spark, t).orderBy("k")
      .select("k", "v").as[(Long, String)].collect().toSeq
    // k=3 is DV-dead: it must NOT resurrect as a 'stale' row
    assert(got === Seq((1L, "a"), (2L, "stale"), (4L, "stale")))
  }

  test("TRUNCATE retires every partition; SHOW PARTITIONS empties") {
    val t = tmpDir("xf15_truncpart") + "/t"
    TxLog.setProperties(t, Map("graft.partition.columns" -> "p"))
    TxLog.append(Seq((1L, "x"), (2L, "y"), (3L, "x")).toDF("k", "p"), t)
    assert(spark.sql(s"SHOW PARTITIONS txlog.`$t`").count() === 2)
    spark.sql(s"TRUNCATE TABLE txlog.`$t`")
    assert(TxLog.read(spark, t).count() === 0)
    assert(spark.sql(s"SHOW PARTITIONS txlog.`$t`").count() === 0)
    // refill lands the declared layout again
    TxLog.append(Seq((9L, "z")).toDF("k", "p"), t)
    assert(TxLog.activeFiles(t).forall(_.contains("p=")))
  }

  test("log compaction preserves COPY INTO idempotence and replay guards") {
    val t = tmpDir("xf15_lccopy") + "/t"
    val src = tmpDir("xf15_lccopy_src")
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").coalesce(1)
      .write.mode("overwrite").parquet(src)
    spark.sql(s"COPY INTO txlog.`$t` FROM '$src' FILEFORMAT = PARQUET")
    (1 to 30).foreach(i => TxLog.append(
      Seq((100L + i, "t")).toDF("k", "v").coalesce(1), t))
    assert(TxLog.compactLog(t).nonEmpty)
    // the copySources ledger rode the container: a re-COPY is a no-op
    val before = TxLog.latestVersion(t).get
    spark.sql(s"COPY INTO txlog.`$t` FROM '$src' FILEFORMAT = PARQUET")
    assert(TxLog.read(spark, t).filter(col("k") <= 2L).count() === 2,
      "no double ingestion through the compacted ledger")
    assert(TxLog.latestVersion(t).get === before,
      "idempotent COPY INTO must not commit")
  }
}
