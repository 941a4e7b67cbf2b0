package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.ops.TxLog

/** Dev-tool main (VERDICT r13 items 3 and 5): two maintenance probes,
  * printed as PERF.md table rows.
  *
  *   A. Streaming partitioned sink small-file growth — files per
  *      partition after N triggers, autoCompactEvery off vs on (the
  *      spiral a 100 TB hourly-partition stream dies of, and the bound
  *      the cadence buys).
  *   B. OPTIMIZE ZORDER skipping effectiveness — files a 2-D range
  *      query must read before vs after a clustered rewrite of the same
  *      snapshot (stats-pruned via TxLog.filesForRanges), with a plain
  *      bin-packing OPTIMIZE as the control.
  */
object MaintenanceProbe {

  def main(args: Array[String]): Unit = {
    val spark = Graft.session("local[8]", shufflePartitions = 8)
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // ---- A: small-file growth over N triggers --------------------------
    val triggers = 30
    Seq(0, 5).foreach { every =>
      val t = java.nio.file.Files
        .createTempDirectory(s"probe_smallfile_$every").toString + "/t"
      TxLog.setProperties(t, Map("graft.partition.columns" -> "p"))
      val in = MemoryStream[(Long, String)]
      val w = in.toDF().toDF("k", "p")
        .writeStream.format("graft.sources.txlog")
        .option("checkpointLocation", java.nio.file.Files
          .createTempDirectory(s"probe_smallfile_cp_$every").toString)
        .option("path", t)
      val q = (if (every > 0) w.option("autoCompactEvery", every.toString)
               else w)
        .trigger(Trigger.ProcessingTime(0)).start()
      try {
        (1 to triggers).foreach { b =>
          in.addData((b.toLong, "a"), (b.toLong, "b"), (b.toLong, "c"))
          q.processAllAvailable()
        }
      } finally q.stop()
      val perPart = TxLog.activeFiles(t).groupBy(f =>
        f.split("/").find(_.startsWith("p=")).getOrElse("?"))
        .view.mapValues(_.size)
      val versions = TxLog.latestVersion(t).getOrElse(0L)
      println(s"PROBE_A|autoCompactEvery=$every|triggers=$triggers|" +
        s"maxFilesPerPartition=${perPart.values.max}|" +
        s"totalFiles=${TxLog.activeFiles(t).size}|versions=$versions|" +
        s"rows=${TxLog.read(spark, t).count()}")
    }

    // ---- B: zorder skipping effectiveness ------------------------------
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val ord = Tables.load(spark, sf, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    def build(): String = {
      val t = java.nio.file.Files
        .createTempDirectory("probe_zorder").toString + "/t"
      TxLog.setProperties(t,
        Map("graft.stats.columns" -> "o_custkey,o_totalprice"))
      TxLog.append(ord.repartition(16), t)
      t
    }
    // a selective 2-D box: ~10% of each dimension
    val (loK, hiK) = (1000.0, 2000.0)
    val (loP, hiP) = (50000.0, 80000.0)
    def scanned(t: String): Int = TxLog.filesForRanges(t,
      Map("o_custkey" -> (loK, hiK), "o_totalprice" -> (loP, hiP))).size
    def rows(t: String): Long = TxLog.readRanges(spark, t,
      Map("o_custkey" -> (loK, hiK), "o_totalprice" -> (loP, hiP)))
      .filter(col("o_custkey").between(loK, hiK) &&
        col("o_totalprice").between(loP, hiP)).count()
    val t0 = build()
    val before = scanned(t0); val nRows = rows(t0)
    // hold output file count at ~16 for BOTH rewrites, so the comparison
    // isolates LAYOUT (random vs curve-clustered) at equal granularity
    val target = math.max(1L, TxLog.fileSizes(t0).values.sum / 16)
    spark.conf.set("spark.graft.optimize.targetFileBytes", target.toString)
    spark.conf.set("spark.graft.optimize.minFileBytes", Long.MaxValue.toString)
    spark.sql(s"OPTIMIZE txlog.`$t0`") // control: re-pack, no clustering
    val packed = scanned(t0); val packedTotal = TxLog.activeFiles(t0).size
    val t1 = build()
    spark.sql(
      s"OPTIMIZE txlog.`$t1` ZORDER BY (o_custkey, o_totalprice)")
    val after = scanned(t1); val zTotal = TxLog.activeFiles(t1).size
    require(rows(t1) == nRows, "clustered rewrite changed the answer")
    println(s"PROBE_B|scannedBefore=$before/16|" +
      s"scannedPacked=$packed/$packedTotal|" +
      s"scannedZordered=$after/$zTotal|rows=$nRows")
    Graft.shutdown(spark)
  }
}
