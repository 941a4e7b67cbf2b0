package graft

import org.apache.spark.sql.functions._

import graft.ops.TxLog

/** Delta's idempotent batch writes (`txnAppId`/`txnVersion` writer
  * options): a retried write carrying the same (app, version) applies
  * exactly once; a later version lands; a different app is never
  * confused with this one. The race window between pre-check and commit
  * converts to a silent skip rather than a failure. */
class IdempotentWriteSpec extends SparkSpec {
  import spark.implicits._

  private def rows(ks: Range) = ks.map(k => (k.toLong, s"v$k")).toDF("k", "v")

  test("same (txnAppId, txnVersion) applies exactly once") {
    val t = tmpDir("idw") + "/t"
    def put(ver: Long, ks: Range): Unit =
      rows(ks).write.format("graft.sources.txlog")
        .option("path", t).option("txnAppId", "etl-task")
        .option("txnVersion", ver).mode("append").save()
    put(1, 1 to 10)
    val v1 = TxLog.latestVersion(t).get
    put(1, 1 to 10) // orchestrator retry: same logical write
    assert(TxLog.latestVersion(t).get === v1, "replay must not commit")
    assert(TxLog.read(spark, t).count() === 10)
    put(2, 11 to 15) // the next version is new work
    assert(TxLog.read(spark, t).count() === 15)
    // Delta's monotone rule: an older version is also a replay
    put(1, 100 to 200)
    assert(TxLog.read(spark, t).count() === 15)
  }

  test("a different app id is independent") {
    val t = tmpDir("idw_app") + "/t"
    rows(1 to 5).write.format("graft.sources.txlog").option("path", t)
      .option("txnAppId", "a").option("txnVersion", 1).mode("append").save()
    rows(6 to 10).write.format("graft.sources.txlog").option("path", t)
      .option("txnAppId", "b").option("txnVersion", 1).mode("append").save()
    assert(TxLog.read(spark, t).count() === 10)
  }

  test("txnAppId without txnVersion (and vice versa) refuses") {
    val t = tmpDir("idw_half") + "/t"
    val e = intercept[IllegalArgumentException] {
      rows(1 to 2).write.format("graft.sources.txlog").option("path", t)
        .option("txnAppId", "a").mode("append").save()
    }
    assert(e.getMessage.contains("come together"))
  }

  test("overwrite mode honors the txn identity too") {
    val t = tmpDir("idw_ow") + "/t"
    def ow(ver: Long, ks: Range): Unit =
      rows(ks).write.format("graft.sources.txlog")
        .option("path", t).option("txnAppId", "refresh")
        .option("txnVersion", ver).mode("overwrite").save()
    ow(1, 1 to 8)
    ow(1, 1 to 3) // replayed refresh: must NOT shrink the table
    assert(TxLog.read(spark, t).count() === 8)
    ow(2, 1 to 3)
    assert(TxLog.read(spark, t).count() === 3)
  }

  test("losing the race after the pre-check converts to a silent skip") {
    val t = tmpDir("idw_race") + "/t"
    TxLog.append(rows(1 to 2), t)
    // the write lambda simulates a rival landing the SAME (app, version)
    // after idempotentWrite's pre-check: the inner append commits it,
    // then the outer attempt hits the commit-time replay guard
    val got = TxLog.idempotentWrite(t, "racer", 7) {
      TxLog.append(rows(3 to 4), t, batchId = 7, streamId = Some("racer"))
      TxLog.append(rows(5 to 6), t, batchId = 7, streamId = Some("racer"))
    }
    assert(got.isEmpty, "the beaten writer sees a skip, not an error")
    assert(TxLog.read(spark, t).count() === 4, "rival's rows only")
  }
}
