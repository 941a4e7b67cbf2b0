package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the harness test tables (TESTDATA.md).
  *
  * Tables are one parquet file/dir each under `\$dir/<name>.parquet`.
  * All reads go through [[Tables.load]] so that column pruning and filter
  * pushdown reach the parquet scan (we never cache eagerly here — Catalyst
  * prunes better on the raw scan).
  *
  * `events.ts` is stored as parquet TIMESTAMP(NANOS), which Spark's vectorized
  * reader rejects. We read it as a nanosecond long
  * (`spark.sql.legacy.parquet.nanosAsLong`) and surface a microsecond
  * TimestampType `ts` (Spark's native precision; floor-truncated exactly like
  * DuckDB's `epoch_us`).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      // integer DIV, not `/`: Column `/` is double division, which loses
      // the low microsecond bit at 1e15+ nanosecond magnitudes
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
  }

  /** Register every table as a session temp view (SURVEY.md §2.11 C1/C2). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
