package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.ops.Upsert

/** Streaming upsert sink: latest-version-per-key semantics across
  * micro-batches (Delta MERGE analog on plain parquet). */
object UpsertSpec {
  case class Update(id: Long, value: String, version: Long)
}

class UpsertSpec extends SparkSpec {
  import UpsertSpec.Update

  test("foreachBatch merge keeps the latest version per key across batches") {
    implicit val s = spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = tmpDir("upsert") + "/t"

    val input = MemoryStream[Update]
    val q = input.toDS().toDF()
      .writeStream
      .option("checkpointLocation", tmpDir("upsert_cp"))
      .foreachBatch(Upsert.sink(dir, Seq("id"), "version") _)
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData(Update(1, "a1", 1), Update(2, "b1", 1))
      q.processAllAvailable()
      input.addData(Update(1, "a2", 2), Update(3, "c1", 1))
      q.processAllAvailable()
      // stale version arrives late: must NOT overwrite v2
      input.addData(Update(1, "a0", 0))
      q.processAllAvailable()

      val rows = spark.read.parquet(dir).as[Update].collect()
        .map(u => u.id -> (u.value, u.version)).toMap
      assert(rows === Map(
        1L -> ("a2", 2L), 2L -> ("b1", 1L), 3L -> ("c1", 1L)))
    } finally q.stop()
  }

  test("interrupted swap is refused, not treated as a first batch") {
    import graft.ops.SafeSwap
    import spark.implicits._
    val dir = tmpDir("swapcrash") + "/t"
    // simulate a crash between rename(target -> backup) and
    // rename(staging -> target): only the backup exists
    Seq((1L, "old", 1L)).toDF("id", "value", "version")
      .write.parquet(SafeSwap.backup(dir))
    val updates = Seq((2L, "new", 2L)).toDF("id", "value", "version")
    val e = intercept[java.io.IOException] {
      Upsert.mergeIntoParquet(spark, dir, updates, Seq("id"), "version")
    }
    assert(e.getMessage.contains("interrupted"))
    // the backup is untouched — recoverable by hand
    assert(spark.read.parquet(SafeSwap.backup(dir)).count() === 1)
  }

  // st19's oracle ("latest event per user, versioned by µs timestamp")
  // is only deterministic if (user_id, µs-ts) never ties — otherwise
  // row_number in DuckDB and max-version-wins in the merge could pick
  // different rows. Pin the invariant at both scales the driver checks.
  test("st19 invariant: (user_id, µs timestamp) is unique in events") {
    import org.apache.spark.sql.functions._
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { d =>
      val dups = Tables.load(spark, d, "events")
        .groupBy(col("user_id"), unix_micros(col("ts")).alias("ts_us"))
        .count().filter(col("count") > 1).count()
      assert(dups === 0L,
        s"$d: $dups (user_id, ts_us) collisions — st19 oracle tie-break unsound")
    }
  }
}
