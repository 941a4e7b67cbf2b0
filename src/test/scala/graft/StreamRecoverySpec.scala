package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.streaming.Trigger

/** T6 exactly-once: a restarted stream with the same checkpoint resumes
  * from committed offsets — new files are processed once, old files never
  * reprocessed. */
class StreamRecoverySpec extends SparkSpec {

  test("checkpointed file stream restarts without reprocessing") {
    val src = tmpDir("rec_src")
    val sink = tmpDir("rec_sink")
    val cp = tmpDir("rec_cp")
    val events = s"$SF/events.parquet"

    def runOnce(): Unit = {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.readStream
        .schema(spark.read.parquet(events).schema)
        .parquet(src)
        .select("event_id", "event_type")
        .writeStream.format("parquet")
        .option("checkpointLocation", cp).option("path", sink)
        .outputMode("append").trigger(Trigger.AvailableNow())
        .start().awaitTermination()
    }

    Files.copy(Paths.get(events), Paths.get(s"$src/batch1.parquet"))
    runOnce()
    val n1 = spark.read.parquet(sink).count()
    assert(n1 === 1000)

    // restart with NO new data: nothing reprocessed
    runOnce()
    assert(spark.read.parquet(sink).count() === n1)

    // add a second file; restart processes exactly the delta
    Files.copy(Paths.get(events), Paths.get(s"$src/batch2.parquet"))
    runOnce()
    assert(spark.read.parquet(sink).count() === 2 * n1)
  }
}
