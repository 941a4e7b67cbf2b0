package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loaders for the harness test tables (TESTDATA.md).
  *
  * Tables are one parquet file/dir each under `\$dir/<name>.parquet`.
  * All reads go through [[Tables.load]] so that column pruning and filter
  * pushdown reach the parquet scan (we never cache eagerly here — Catalyst
  * prunes better on the raw scan).
  *
  * `events.ts` has been produced by the lake with THREE physical encodings
  * across regenerations: parquet TIMESTAMP(NANOS) (which Spark's vectorized
  * reader only accepts as a nanosecond long via
  * `spark.sql.legacy.parquet.nanosAsLong`), TIMESTAMP_NTZ(µs), and
  * session-TZ µs TIMESTAMP. A 100 TB lake with heterogeneous writers mixes
  * precisions exactly like this, so [[loadEvents]] branches on the footer
  * schema instead of hard-coding one encoding, and normalizes every variant
  * to the same µs TimestampType `ts` (session TZ is UTC, so the epoch
  * microseconds equal DuckDB's `epoch_us` of the NTZ value).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") loadEvents(spark, s"$dir/events.parquet")
    else if (name == "embeddings") loadEmbeddings(spark, s"$dir/embeddings.parquet")
    else spark.read.parquet(s"$dir/$name.parquet")

  /** Schema-adaptive embeddings reader (the events lesson applied before
    * it bites): the vector tier's native expressions (vec_dot, minhash
    * over planes, PQ/OPQ encode) assume `embedding: array<float>`. A
    * testdata regeneration that ships array<double> — or a future lake
    * writer that does — normalizes here, at the one read site, instead
    * of each of the ~15 ANN/dedup entries branching or breaking. */
  def loadEmbeddings(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.parquet(path)
    raw.schema("embedding").dataType match {
      case ArrayType(FloatType, _) => raw
      case ArrayType(_: NumericType, _) =>
        raw.withColumn("embedding", col("embedding").cast("array<float>"))
      case dt => throw new IllegalStateException(
        s"embeddings.embedding read as unsupported type $dt from $path")
    }
  }

  /** Schema-adaptive events reader — see the class doc. Normalizes `ts`
    * to µs TimestampType whatever the file's physical encoding.
    */
  def loadEvents(spark: SparkSession, path: String): DataFrame = {
    // harmless on µs/NTZ files (the conf only affects TIMESTAMP(NANOS)
    // columns); required to read a NANOS file at all
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(path)
    raw.schema("ts").dataType match {
      case LongType =>
        // TIMESTAMP(NANOS) read as nanos long. Integer DIV, not `/`:
        // Column `/` is double division, which loses the low microsecond
        // bit at 1e15+ nanosecond magnitudes.
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case _: TimestampNTZType =>
        // wall-clock µs; session TZ is UTC so this cast is epoch-exact
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _: TimestampType => raw
      case dt => throw new IllegalStateException(
        s"events.ts read as unsupported type $dt from $path")
    }
  }

  /** Register every table as a session temp view (SURVEY.md §2.11 C1/C2). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
