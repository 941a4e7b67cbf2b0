package graft

import java.util.concurrent.CountDownLatch

import org.apache.spark.sql.functions._

import graft.ops.TxLog

/** Partition-disjoint concurrent-writer rules for overwritePartitions
  * (Delta's replaceWhere conflict resolution, VERDICT r13 item 2):
  * disjoint-partition writers racing one table BOTH commit (the loser
  * re-derives metadata only — its data files are already staged); under
  * `graft.isolationLevel=serializable` a commit that touched this
  * writer's tuples makes the loser REFUSE with ConcurrentWriteException
  * instead of blindly overwriting the winner's rows. Complements
  * TxLogPartitionSpec's single-writer race cases. */
class TxLogConflictSpec extends SparkSpec {
  import spark.implicits._

  private def mk(): String = {
    val t = tmpDir("txconflict") + "/t"
    TxLog.setProperties(t, Map("graft.partition.columns" -> "y"))
    TxLog.append(Seq((1L, 2019), (2L, 2020), (3L, 2021)).toDF("k", "y"), t)
    t
  }

  private def tuple(y: Int): Map[String, Option[String]] =
    Map("y" -> Some(y.toString))

  test("racing disjoint-partition overwrites BOTH commit") {
    val t = mk()
    val start = new CountDownLatch(1)
    val results = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val threads = Seq(2020, 2021).map { y =>
      val th = new Thread(() => {
        start.await()
        val df = Seq((100L + y, y)).toDF("k", "y")
        results.put(y, TxLog.overwritePartitions(df, t))
      }, s"writer-$y")
      th.start(); th
    }
    start.countDown()
    threads.foreach(_.join(120000))
    assert(results.size === 2, "both disjoint writers must commit")
    assert(results.values().toArray.toSet.size === 2,
      "each on its own version")
    val got = TxLog.read(spark, t).select("k", "y").as[(Long, Int)]
      .collect().toSet
    assert(got === Set((1L, 2019), (2120L, 2020), (2121L, 2021)))
  }

  test("serializable isolation: commit on MY tuple since base refuses") {
    val t = mk()
    TxLog.setProperties(t, Map("graft.isolationLevel" -> "serializable"))
    val base = TxLog.latestVersion(t)
    // a concurrent writer lands new 2020 data after `base`
    TxLog.append(Seq((9L, 2020)).toDF("k", "y"), t)
    val e = intercept[TxLog.ConcurrentWriteException] {
      TxLog.checkPartitionConflicts(t, base, Set(tuple(2020)), Seq("y"))
    }
    assert(e.getMessage.contains("touched partition"))
    // …but a writer replacing a DISJOINT tuple passes the same check
    TxLog.checkPartitionConflicts(t, base, Set(tuple(2021)), Seq("y"))
  }

  test("serializable isolation: metadata and DV commits conflict with all") {
    val t = mk()
    TxLog.setProperties(t, Map("graft.isolationLevel" -> "serializable"))
    val base = TxLog.latestVersion(t)
    TxLog.setProperties(t, Map("owner" -> "other"))
    intercept[TxLog.ConcurrentWriteException] {
      TxLog.checkPartitionConflicts(t, base, Set(tuple(2021)), Seq("y"))
    }
    val base2 = TxLog.latestVersion(t)
    TxLog.deleteVectors(spark, t, col("k") === 1L)
    intercept[TxLog.ConcurrentWriteException] {
      TxLog.checkPartitionConflicts(t, base2, Set(tuple(2021)), Seq("y"))
    }
  }

  test("retry after a concurrent RENAME/DROP refuses (metadata change)") {
    val t = tmpDir("txconflict") + "/m"
    TxLog.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), t)
    TxLog.enableColumnMapping(t)
    // snapshot the metadata a writer would stage under, then land a
    // concurrent rename — the writer's retry must REFUSE rather than
    // re-commit its stale schemaDdl/colMap (which would silently revert
    // the rename, since the newest entry wins the schema fold)
    val meta0 = TxLog.metaFingerprint(t)
    TxLog.refuseIfMetaChanged(t, "append", meta0) // unchanged: passes
    TxLog.renameColumn(t, "k", "kk")
    val e = intercept[TxLog.ConcurrentWriteException] {
      TxLog.refuseIfMetaChanged(t, "append", meta0)
    }
    assert(e.getMessage.contains("concurrent metadata change"))
    // a plain data commit does NOT trip the guard (schema unchanged)
    val meta1 = TxLog.metaFingerprint(t)
    TxLog.append(Seq((8L, "c")).toDF("kk", "v"), t)
    TxLog.refuseIfMetaChanged(t, "append", meta1)
  }

  test("dvDelete records its covered files; file-disjoint DML commutes") {
    val t = tmpDir("txconflict") + "/f"
    TxLog.append((1L to 10L).map((_, "a")).toDF("k", "v").coalesce(1), t)
    TxLog.append((11L to 20L).map((_, "b")).toDF("k", "v").coalesce(1), t)
    TxLog.setProperties(t, Map("graft.isolationLevel" -> "serializable"))
    val fileA = TxLog.commits(t).head.add.head
    val fileB = TxLog.commits(t).find(_.version == 2L).get.add.head
    val base = TxLog.latestVersion(t)
    // a DV delete lands, covering ONLY file A (k=1 lives there)
    TxLog.deleteVectors(spark, t, col("k") === 1L)
    val cmt = TxLog.commits(t).last
    assert(cmt.op === "dvDelete")
    assert(cmt.dvTargets === Seq(fileA.split('/').takeRight(2).mkString("/")),
      "the DV commit must attribute its row kills to their data files")
    // a racing writer that read/rewrites only file B commutes …
    TxLog.checkFileConflicts(t, base, Set(fileB), "delete")
    // … one touching file A refuses
    val e = intercept[TxLog.ConcurrentWriteException] {
      TxLog.checkFileConflicts(t, base, Set(fileA), "delete")
    }
    assert(e.getMessage.contains("serializable isolation refuses"))
    // data commits conflict the same way: an append (new file C) then a
    // delete rewriting file B — only writers overlapping B refuse
    val base2 = TxLog.latestVersion(t)
    TxLog.delete(spark, t, col("k") === 15L) // rewrites file B
    TxLog.checkFileConflicts(t, base2, Set(fileA), "update")
    intercept[TxLog.ConcurrentWriteException] {
      TxLog.checkFileConflicts(t, base2, Set(fileB), "update")
    }
  }

  test("racing dvDeletes on DISJOINT files both commit under serializable") {
    val t = tmpDir("txconflict") + "/r"
    TxLog.append((1L to 10L).map((_, "a")).toDF("k", "v").coalesce(1), t)
    TxLog.append((11L to 20L).map((_, "b")).toDF("k", "v").coalesce(1), t)
    TxLog.setProperties(t, Map("graft.isolationLevel" -> "serializable"))
    val start = new CountDownLatch(1)
    val results = new java.util.concurrent.ConcurrentHashMap[Long, Long]()
    val threads = Seq(1L, 11L).map { k =>
      val th = new Thread(() => {
        start.await()
        results.put(k, TxLog.deleteVectors(spark, t, col("k") === k))
      }, s"dv-$k")
      th.start(); th
    }
    start.countDown()
    threads.foreach(_.join(120000))
    assert(results.size === 2, "both disjoint-file DV deletes must commit")
    assert(TxLog.read(spark, t).select("k").as[Long].collect().toSet ===
      ((2L to 10L) ++ (12L to 20L)).toSet)
  }

  test("default isolation keeps INSERT OVERWRITE semantics (no refusal)") {
    val t = mk() // graft.isolationLevel unset
    val base = TxLog.latestVersion(t)
    TxLog.append(Seq((9L, 2020)).toDF("k", "y"), t)
    // same-tuple interleave under the default: check passes, the retry
    // loop re-derives and the last writer wins the tuple
    TxLog.checkPartitionConflicts(t, base, Set(tuple(2020)), Seq("y"))
    TxLog.overwritePartitions(Seq((200L, 2020)).toDF("k", "y"), t)
    assert(TxLog.read(spark, t).filter(col("y") === 2020)
      .select("k").as[Long].collect().toSet === Set(200L))
  }
}
