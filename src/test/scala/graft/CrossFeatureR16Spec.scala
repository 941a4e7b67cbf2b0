package graft

import org.apache.spark.sql.functions._

import graft.ops.TxLog

/** Round-16 cross-feature compositions: LOG RETENTION ([[TxLog.expireLog]])
  * against every table-tier feature whose state folds from the expired
  * range — with the commits gone, each answer must come from the
  * full-state checkpoint, byte-equal to the pre-expiry answer. */
class CrossFeatureR16Spec extends SparkSpec {
  import spark.implicits._

  test("row-tracking ids survive log expiry (bases fold from the checkpoint)") {
    val t = tmpDir("xf16_rt") + "/t"
    TxLog.enableRowTracking(t)
    TxLog.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v").coalesce(1), t)
    TxLog.append(Seq((3L, "c")).toDF("k", "v").coalesce(1), t)
    val before = TxLog.readWithRowIds(spark, t)
      .select("k", "_row_id").as[(Long, Long)].collect().toMap
    TxLog.compact(t)
    TxLog.append(Seq((4L, "d")).toDF("k", "v").coalesce(1), t)
    TxLog.expireLog(t)
    val after = TxLog.readWithRowIds(spark, t)
      .select("k", "_row_id").as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L).forall(k => after(k) === before(k)),
      s"pre-expiry rows must keep their ids: $before vs $after")
    assert(after.values.toSeq.distinct.size === 4, "fresh id for the tail row")
    // DML after expiry preserves untouched ids (rewrite needs the bases
    // of files whose adds were expired — they live in the checkpoint)
    TxLog.update(spark, t, col("k") === 2L, Map("v" -> lit("B")))
    val postDml = TxLog.readWithRowIds(spark, t)
      .select("k", "_row_id").as[(Long, Long)].collect().toMap
    assert(postDml(1L) === before(1L) && postDml(2L) === before(2L),
      "update must preserve ids across the expiry boundary")
  }

  test("column mapping survives log expiry (mapping folds from the checkpoint)") {
    val t = tmpDir("xf16_cm") + "/t"
    TxLog.append(Seq((1L, 10), (2L, 20)).toDF("k", "b"), t)
    TxLog.enableColumnMapping(t)
    TxLog.renameColumn(t, "b", "bucket")
    TxLog.compact(t)
    TxLog.append(Seq((3L, 30)).toDF("k", "bucket"), t)
    TxLog.expireLog(t)
    // the rename commit is GONE — the logical name must still resolve
    assert(TxLog.read(spark, t).columns.toSeq === Seq("k", "bucket"))
    assert(TxLog.read(spark, t).orderBy("k").select("bucket")
      .as[Int].collect().toSeq === Seq(10, 20, 30))
    // and a further rename (metadata commit on the tail) still works
    TxLog.renameColumn(t, "bucket", "cell")
    assert(TxLog.read(spark, t).columns.toSeq === Seq("k", "cell"))
  }

  test("DML, OPTIMIZE, and a shallow clone work on an expired log") {
    val t = tmpDir("xf16_dml") + "/t"
    TxLog.setProperties(t, Map("graft.stats.columns" -> "k"))
    TxLog.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v").coalesce(1), t)
    TxLog.append(Seq((3L, "c"), (4L, "d")).toDF("k", "v").coalesce(1), t)
    TxLog.compact(t)
    TxLog.expireLog(t)
    // stats-pruned DML: the per-file stats folded from the checkpoint
    spark.sql(s"DELETE FROM txlog.`$t` WHERE k = 2")
    spark.sql(s"UPDATE txlog.`$t` SET v = 'C' WHERE k = 3")
    assert(TxLog.read(spark, t).orderBy("k").select("k", "v")
      .as[(Long, String)].collect().toSeq ===
      Seq((1L, "a"), (3L, "C"), (4L, "d")))
    // OPTIMIZE rewrites the current snapshot (sizes from the checkpoint)
    TxLog.optimize(spark, t, targetFiles = 1)
    assert(TxLog.read(spark, t).count() === 3)
    // a shallow clone of the expired table snapshots its CURRENT state
    val dst = tmpDir("xf16_clone") + "/t"
    TxLog.cloneTable(spark, t, dst)
    assert(TxLog.read(spark, dst).orderBy("k").select("k", "v")
      .as[(Long, String)].collect().toSeq ===
      Seq((1L, "a"), (3L, "C"), (4L, "d")))
    // clone-side history is independent: its own v1 is readable even
    // though the SOURCE's early history is expired
    assert(TxLog.read(spark, dst, Some(1L)).count() === 3)
  }

  test("constraints and properties enforce from the checkpoint after expiry") {
    val t = tmpDir("xf16_chk") + "/t"
    TxLog.append(Seq((1L, 5.0)).toDF("k", "amt"), t)
    TxLog.addConstraint(spark, t, "amt_pos", "amt > 0")
    TxLog.setProperties(t, Map("custom.owner" -> "team-x"))
    TxLog.compact(t)
    TxLog.expireLog(t)
    // the addConstraint/setProperty commits are gone; enforcement and
    // the property answer must come from the checkpoint state
    assert(TxLog.properties(t)("custom.owner") === "team-x")
    val e = intercept[Exception] {
      TxLog.append(Seq((2L, -1.0)).toDF("k", "amt"), t)
    }
    assert(e.getMessage.contains("amt_pos"), e.getMessage)
    TxLog.append(Seq((3L, 7.0)).toDF("k", "amt"), t)
    assert(TxLog.read(spark, t).count() === 2)
  }

  test("streaming replay guard survives expiry (no duplicate, no refusal)") {
    val t = tmpDir("xf16_guard") + "/t"
    // batch 0 and 1 committed by streamA, then checkpoint + expiry
    TxLog.append(Seq((1L, "a")).toDF("k", "v"), t, batchId = 0L,
      streamId = Some("streamA"))
    TxLog.append(Seq((2L, "b")).toDF("k", "v"), t, batchId = 1L,
      streamId = Some("streamA"))
    TxLog.compact(t)
    TxLog.expireLog(t)
    // a replay of batch 1 must be detected from the CHECKPOINTED guard
    assert(TxLog.batchCommitted(t, Some("streamA"), 1L),
      "committed batch must stay detected after its commit was expired")
    // a NEW batch and a NEW stream are not swallowed
    assert(!TxLog.batchCommitted(t, Some("streamA"), 2L))
    assert(!TxLog.batchCommitted(t, Some("streamB"), 0L))
  }
}
