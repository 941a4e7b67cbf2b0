package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-10 regression: the harness regenerated `events.ts` from parquet
  * TIMESTAMP(NANOS) to TIMESTAMP_NTZ(µs) and the hard-coded nanos path
  * errored out 22 catalog entries (batch) and silently collapsed event
  * time 1000× in 9 more (streaming). [[Tables.loadEvents]] must accept
  * every encoding the lake has produced and normalize all of them to the
  * same µs TimestampType — this spec pins each branch against a fixture
  * written in that physical encoding, so the NEXT regeneration can't
  * zero the catalog again.
  */
class EventsIngestSpec extends SparkSpec {

  import spark.implicits._

  // one logical row in three physical encodings: 2021-03-04T05:06:07.123456
  private val micros = 1614834367123456L

  private def base = Seq((1L, micros, 10L, "click", 1.5, "{}"))
    .toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  private def writeFixture(prefix: String)(f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): String = {
    val d = tmpDir(prefix)
    f(base).coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    s"$d/events.parquet"
  }

  private def loadedMicros(path: String): (DataType, Long) = {
    val df = Tables.loadEvents(spark, path)
    (df.schema("ts").dataType,
      df.select(unix_micros(col("ts"))).head().getLong(0))
  }

  test("nanos-as-long encoding normalizes to µs TimestampType") {
    // TIMESTAMP(NANOS) surfaces as a nanosecond long under
    // spark.sql.legacy.parquet.nanosAsLong — a plain long column of nanos
    // exercises the identical LongType branch
    val p = writeFixture("ev_nanos") {
      _.withColumn("ts", col("ts") * lit(1000L))
    }
    assert(loadedMicros(p) === (TimestampType, micros))
  }

  test("TIMESTAMP_NTZ(µs) encoding (current testdata) normalizes identically") {
    val p = writeFixture("ev_ntz") {
      _.withColumn("ts", timestamp_micros(col("ts")).cast(TimestampNTZType))
    }
    assert(loadedMicros(p) === (TimestampType, micros))
  }

  test("µs TimestampType encoding passes through") {
    val p = writeFixture("ev_us") {
      _.withColumn("ts", timestamp_micros(col("ts")))
    }
    assert(loadedMicros(p) === (TimestampType, micros))
  }

  test("the live testdata loads with µs TimestampType ts, whatever its encoding") {
    val df = Tables.load(spark, SF, "events")
    assert(df.schema("ts").dataType === TimestampType)
    assert(df.count() > 0)
  }

  test("embeddings normalize to array<float> whatever element type shipped") {
    import spark.implicits._
    // a regeneration (or future lake writer) shipping array<double> must
    // not break the vector tier's float-typed native expressions — the
    // same regression class the events encodings pinned above
    val d = tmpDir("embnorm")
    Seq((1L, Seq(1.5, 2.5), 0), (2L, Seq(3.0, 4.0), 1))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$d/embeddings.parquet")
    val out = Tables.load(spark, d, "embeddings")
    assert(out.schema("embedding").dataType ===
      ArrayType(FloatType, containsNull = true))
    assert(out.orderBy("vec_id").select("embedding")
      .as[Seq[Float]].collect().toSeq ===
      Seq(Seq(1.5f, 2.5f), Seq(3.0f, 4.0f)))
    // the live testdata reads float-typed too
    assert(Tables.load(spark, SF, "embeddings")
      .schema("embedding").dataType.asInstanceOf[ArrayType]
      .elementType === FloatType)
  }
}
