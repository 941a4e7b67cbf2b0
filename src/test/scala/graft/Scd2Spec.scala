package graft

import org.apache.spark.sql.functions._

import graft.ops.TxLog

/** SCD Type 2 apply-changes (DLT's APPLY CHANGES … STORED AS SCD TYPE 2):
  * upserts open history rows, the next change per key closes them,
  * deletes close without opening; incremental folding equals the global
  * lead()-chain recompute. */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def hist(t: String): Set[(Long, String, Long, Option[Long])] =
    TxLog.read(spark, t).select("k", "v", "__start_at", "__end_at")
      .as[(Long, String, Long, Option[Long])].collect().toSet

  test("initial load opens rows; upsert closes and reopens; delete closes") {
    val t = tmpDir("scd2") + "/t"
    def batch(rows: Seq[(Long, String, Long, String)]) =
      rows.toDF("k", "v", "ver", "op")
    TxLog.applyChangesScd2(spark, t,
      batch(Seq((1L, "a", 1L, "upsert"), (2L, "b", 1L, "upsert"))),
      Seq("k"), "ver", "op")
    assert(hist(t) === Set((1L, "a", 1L, None), (2L, "b", 1L, None)))
    TxLog.applyChangesScd2(spark, t,
      batch(Seq((1L, "a2", 5L, "upsert"))), Seq("k"), "ver", "op")
    assert(hist(t) === Set(
      (1L, "a", 1L, Some(5L)), (1L, "a2", 5L, None), (2L, "b", 1L, None)))
    TxLog.applyChangesScd2(spark, t,
      batch(Seq((2L, null.asInstanceOf[String], 7L, "delete"))),
      Seq("k"), "ver", "op")
    assert(hist(t) === Set(
      (1L, "a", 1L, Some(5L)), (1L, "a2", 5L, None),
      (2L, "b", 1L, Some(7L))))
    // current state = open rows only
    assert(TxLog.read(spark, t).filter(col("__end_at").isNull)
      .select("k", "v").as[(Long, String)].collect().toSet ===
      Set((1L, "a2")))
    // state AS OF sequence 3: both keys at their v1 images
    assert(TxLog.read(spark, t)
      .filter(col("__start_at") <= 3 &&
        (col("__end_at").isNull || col("__end_at") > 3))
      .select("k", "v").as[(Long, String)].collect().toSet ===
      Set((1L, "a"), (2L, "b")))
  }

  test("several changes to one key in ONE batch chain through lead()") {
    val t = tmpDir("scd2") + "/t"
    TxLog.applyChangesScd2(spark, t,
      Seq((1L, "x", 1L, "upsert"), (1L, "y", 2L, "upsert"),
        (1L, "z", 3L, "upsert")).toDF("k", "v", "ver", "op"),
      Seq("k"), "ver", "op")
    assert(hist(t) === Set(
      (1L, "x", 1L, Some(2L)), (1L, "y", 2L, Some(3L)), (1L, "z", 3L, None)))
  }

  test("untouched keys' files stay byte-identical in place") {
    val t = tmpDir("scd2") + "/t"
    TxLog.applyChangesScd2(spark, t,
      Seq((1L, "a", 1L, "upsert")).toDF("k", "v", "ver", "op")
        .coalesce(1), Seq("k"), "ver", "op")
    val f1 = TxLog.activeFiles(t).toSet
    TxLog.applyChangesScd2(spark, t,
      Seq((50L, "m", 1L, "upsert")).toDF("k", "v", "ver", "op")
        .coalesce(1), Seq("k"), "ver", "op")
    val f2 = TxLog.activeFiles(t).toSet
    // key 50 contests nothing: key-bounds pruning + the open-row
    // semi-join leave key 1's file alone
    assert(f1.subsetOf(f2))
    TxLog.applyChangesScd2(spark, t,
      Seq((1L, "a2", 2L, "upsert")).toDF("k", "v", "ver", "op")
        .coalesce(1), Seq("k"), "ver", "op")
    val f3 = TxLog.activeFiles(t).toSet
    assert((f2 -- f1).subsetOf(f3), "key 50's file must survive")
    assert(f1.intersect(f3).isEmpty, "key 1's file was rewritten")
  }

  test("a late event for a fully-CLOSED chain refuses (no silent resurrect)") {
    val t = tmpDir("scd2") + "/t"
    def b(rows: Seq[(Long, String, Long, String)]) =
      rows.toDF("k", "v", "ver", "op")
    TxLog.applyChangesScd2(spark, t,
      b(Seq((1L, "a", 1L, "upsert"))), Seq("k"), "ver", "op")
    TxLog.applyChangesScd2(spark, t,
      b(Seq((1L, null.asInstanceOf[String], 5L, "delete"))),
      Seq("k"), "ver", "op")
    // late upsert@3 would overlap the closed [1,5) interval — refuse
    val e = intercept[IllegalArgumentException](
      TxLog.applyChangesScd2(spark, t,
        b(Seq((1L, "late", 3L, "upsert"))), Seq("k"), "ver", "op"))
    assert(e.getMessage.contains("repairScd2"))
    // a FORWARD re-insert after the delete is legitimate: new chain
    TxLog.applyChangesScd2(spark, t,
      b(Seq((1L, "back", 7L, "upsert"))), Seq("k"), "ver", "op")
    assert(hist(t) === Set((1L, "a", 1L, Some(5L)), (1L, "back", 7L, None)))
  }

  test("an out-of-order batch refuses instead of corrupting history") {
    val t = tmpDir("scd2") + "/t"
    TxLog.applyChangesScd2(spark, t,
      Seq((1L, "a", 10L, "upsert")).toDF("k", "v", "ver", "op"),
      Seq("k"), "ver", "op")
    val e = intercept[IllegalArgumentException](
      TxLog.applyChangesScd2(spark, t,
        Seq((1L, "old", 3L, "upsert")).toDF("k", "v", "ver", "op"),
        Seq("k"), "ver", "op"))
    assert(e.getMessage.contains("non-decreasing"))
  }

  test("incremental folding equals the global lead()-chain recompute") {
    val t = tmpDir("scd2") + "/t"
    val ev = (1L to 40L).flatMap { k =>
      (1L to (k % 4 + 1)).map { i =>
        (k, s"v$i", i * 10L, if (k % 7 == 0 && i == k % 4 + 1) "delete"
        else "upsert")
      }
    }
    val byBatch = ev.groupBy(_._3).toSeq.sortBy(_._1) // one batch per seq
    byBatch.foreach { case (_, rows) =>
      TxLog.applyChangesScd2(spark, t,
        rows.toDF("k", "v", "ver", "op"), Seq("k"), "ver", "op")
    }
    // global recompute over ALL events at once
    val all = ev.toDF("k", "v", "ver", "op")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("k").orderBy(col("ver").asc, col("op").desc)
    val expect = all.withColumn("__end_at", lead(col("ver"), 1).over(w))
      .filter(col("op") =!= "delete")
      .select(col("k"), col("v"), col("ver").cast("long").alias("__start_at"),
        col("__end_at").cast("long"))
      .as[(Long, String, Long, Option[Long])].collect().toSet
    assert(hist(t) === expect)
  }

  test("repairScd2 splices a late event into the key's chain") {
    val t = tmpDir("scd2") + "/t"
    def b(rows: Seq[(Long, String, Long, String)]) =
      rows.toDF("k", "v", "ver", "op")
    TxLog.applyChangesScd2(spark, t,
      b(Seq((1L, "a", 1L, "upsert"), (2L, "b", 1L, "upsert"))),
      Seq("k"), "ver", "op")
    TxLog.applyChangesScd2(spark, t,
      b(Seq((1L, "c", 5L, "upsert"))), Seq("k"), "ver", "op")
    // the late event refuses on the normal path…
    intercept[IllegalArgumentException](TxLog.applyChangesScd2(spark, t,
      b(Seq((1L, "mid", 3L, "upsert"))), Seq("k"), "ver", "op"))
    // …and splices through the repair verb
    TxLog.repairScd2(spark, t,
      b(Seq((1L, "mid", 3L, "upsert"))), Seq("k"), "ver", "op")
    assert(hist(t) === Set(
      (1L, "a", 1L, Some(3L)), (1L, "mid", 3L, Some(5L)),
      (1L, "c", 5L, None),
      (2L, "b", 1L, None)), "key 2's history is untouched")
  }

  test("repairScd2 reconstructs deletes: a late event before a delete") {
    val t = tmpDir("scd2") + "/t"
    def b(rows: Seq[(Long, String, Long, String)]) =
      rows.toDF("k", "v", "ver", "op")
    TxLog.applyChangesScd2(spark, t,
      b(Seq((1L, "a", 1L, "upsert"))), Seq("k"), "ver", "op")
    TxLog.applyChangesScd2(spark, t,
      b(Seq((1L, null.asInstanceOf[String], 9L, "delete"))),
      Seq("k"), "ver", "op")
    TxLog.repairScd2(spark, t,
      b(Seq((1L, "mid", 4L, "upsert"))), Seq("k"), "ver", "op")
    // the reconstructed delete@9 still ends the chain
    assert(hist(t) === Set(
      (1L, "a", 1L, Some(4L)), (1L, "mid", 4L, Some(9L))))
  }

  test("scd2Sink replays idempotently on a re-delivered batch") {
    val t = tmpDir("scd2") + "/t"
    val sink = TxLog.scd2Sink(t, Seq("k"), "ver", "op",
      streamId = Some("scd2test")) _
    val b0 = Seq((1L, "a", 1L, "upsert")).toDF("k", "v", "ver", "op")
    sink(b0, 0L)
    sink(b0, 0L) // checkpoint-recovery re-delivery
    assert(hist(t) === Set((1L, "a", 1L, None)))
    assert(TxLog.latestVersion(t) === Some(1L), "replay must not commit")
  }
}
