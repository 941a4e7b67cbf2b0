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
}
