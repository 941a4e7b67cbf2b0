package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** The catalog's streaming entries must run on the RocksDB state store
  * (VERDICT r5/r6): unbounded state (st3's reference-mandated
  * watermark-free join) then spills to disk instead of sizing the JVM heap
  * to the key space. Two layers: the catalog builder sets the provider
  * conf, and a running stream-stream join actually reports RocksDB
  * custom metrics. */
class StateStoreSpec extends SparkSpec {

  private val Provider = "spark.sql.streaming.stateStore.providerClass"

  test("st3's builder configures the RocksDB provider before starting") {
    spark.conf.unset(Provider)
    val out = SparkEntry.queries("st3_stream_stream_join")(spark, SF)
    assert(out.count() > 0)
    assert(spark.conf.get(Provider).contains("RocksDBStateStoreProvider"),
      spark.conf.get(Provider))
  }

  test("a running stream-stream join reports rocksdb state-store metrics") {
    graft.streaming.SessionizeTws.configure(spark)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val src = tmpDir("sss_src")
    Files.copy(Paths.get(s"$SF/events.parquet"),
      Paths.get(s"$src/events.parquet"))
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val es = spark.readStream.schema(schema).parquet(src)
    val p = es.filter(col("event_type") === "purchase")
      .select(col("event_id").alias("pid"), col("user_id"))
    val c = es.filter(col("event_type") === "click")
      .select(col("event_id").alias("cid"), col("user_id").alias("cuid"))
    val out = tmpDir("sss_out")
    val q = p.join(c, col("user_id") === col("cuid")).select("pid", "cid")
      .writeStream.format("parquet")
      .option("checkpointLocation", s"$out/_cp")
      .option("path", s"$out/sink")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val metricKeys = q.recentProgress.toSeq
      .flatMap(_.stateOperators.toSeq)
      .flatMap(_.customMetrics.keySet.asScala)
    assert(metricKeys.exists(_.toLowerCase.contains("rocksdb")),
      s"state-store custom metrics carry no rocksdb keys: " +
        metricKeys.distinct.sorted.mkString(","))
  }

  /** The quantified form of "st3 is weak at scale, st4 is the fix"
    * (VERDICT r7 #4): identical data through the two join shapes — the
    * watermark-free join's state grows monotonically with everything ever
    * seen, while the watermarked time-bounded join's state plateaus at
    * roughly one eviction horizon regardless of stream length. */
  test("watermarked join state plateaus under the watermark; unbounded join grows monotonically") {
    import spark.implicits._
    graft.streaming.SessionizeTws.configure(spark)
    val src = tmpDir("evict_src")
    val base = 1700000000L // any fixed epoch; only deltas matter
    val chunks = 4
    // one parquet file per 2-hour chunk, written sequentially so the file
    // source (ordered by mod time) delivers them as 4 micro-batches in
    // event-time order — the precondition for the watermark to advance
    (0 until chunks).foreach { i =>
      val rows = for (u <- 1 to 40; e <- 0 until 4) yield
        (i * 10000L + u * 10L + e,
          base + i * 7200L + e * 900L, u.toLong,
          if (e % 2 == 0) "click" else "purchase")
      rows.toDF("event_id", "epoch", "user_id", "event_type")
        .select(col("event_id"), timestamp_seconds(col("epoch")).alias("ts"),
          col("user_id"), col("event_type"))
        .coalesce(1).write.mode("append").parquet(src)
    }
    val totalRows = chunks * 40 * 4
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType),
      StructField("event_type", StringType)))
    def stream() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(src)

    def run(watermarked: Boolean): Seq[Long] = {
      val out = tmpDir(s"evict_out_$watermarked")
      val p0 = stream().filter(col("event_type") === "purchase")
        .select(col("event_id").alias("pid"), col("user_id"),
          col("ts").alias("p_ts"))
      val c0 = stream().filter(col("event_type") === "click")
        .select(col("event_id").alias("cid"),
          col("user_id").alias("c_user_id"), col("ts").alias("c_ts"))
      val joined =
        if (watermarked)
          p0.withWatermark("p_ts", "30 minutes").join(
            c0.withWatermark("c_ts", "30 minutes"),
            col("user_id") === col("c_user_id") &&
              col("c_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES") &&
              col("c_ts") <= col("p_ts"), "inner")
        else
          p0.join(c0, col("user_id") === col("c_user_id"), "inner")
      val q = joined.select("pid", "cid")
        .writeStream.format("parquet")
        .option("checkpointLocation", s"$out/_cp")
        .option("path", s"$out/sink")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      q.recentProgress.toSeq.filter(_.numInputRows > 0)
        .flatMap(_.stateOperators.toSeq.map(_.numRowsTotal))
    }

    val unbounded = run(watermarked = false)
    val bounded = run(watermarked = true)
    assert(unbounded.size >= chunks && bounded.size >= chunks,
      s"expected >= $chunks data micro-batches: $unbounded / $bounded")
    // unbounded: never evicts — every batch strictly adds both sides' rows,
    // ending with the entire stream buffered
    assert(unbounded.zip(unbounded.tail).forall { case (a, b) => b > a },
      s"unbounded state should grow every batch: $unbounded")
    assert(unbounded.last === totalRows.toLong,
      s"unbounded join must buffer ALL $totalRows rows: $unbounded")
    // watermarked: after the first eviction the state stays at ~one
    // 30-minute horizon per side — far below the full stream
    assert(bounded.last <= totalRows / 2,
      s"watermarked state did not evict: $bounded")
    assert(bounded.max < unbounded.last,
      s"watermarked peak ${bounded.max} should stay under unbounded total ${unbounded.last}")
    // plateau: the last two batches hold the same bounded horizon, not a
    // growing tail (each chunk is shaped identically)
    assert(bounded.last <= bounded(bounded.size - 2),
      s"watermarked state still growing at stream end: $bounded")
  }
}
