package graft

import org.apache.spark.sql.functions._

import graft.ops.TxLog

/** Writer auto-compaction (Databricks' `delta.autoOptimize.autoCompact`,
  * synchronous form): after a data-adding commit, once the active files
  * below `graft.autoCompact.minFileSize` reach
  * `graft.autoCompact.minFiles`, just those small files fold into
  * ~targetSize outputs as a layout-only `optimize` commit. The
  * small-file answer for trickle/streaming writers — scan cost grows
  * with file count, not bytes, and this caps it without an operator
  * remembering OPTIMIZE. Opt-in by table property. */
class AutoCompactSpec extends SparkSpec {
  import spark.implicits._

  private def dataFiles(t: String): Seq[String] = TxLog.activeFiles(t)

  test("small files fold once the threshold is reached; rows unchanged") {
    val t = tmpDir("autocompact") + "/t"
    TxLog.setProperties(t, Map(
      "graft.autoCompact.enabled" -> "true",
      "graft.autoCompact.minFileSize" -> (1024L * 1024).toString,
      "graft.autoCompact.minFiles" -> "5"))
    (1 to 4).foreach { i =>
      TxLog.append(Seq((i.toLong, s"r$i")).toDF("k", "v").coalesce(1), t)
    }
    assert(dataFiles(t).size === 4, "below the threshold: no compaction")
    assert(!TxLog.commits(t).exists(_.op == "optimize"))
    TxLog.append(Seq((5L, "r5")).toDF("k", "v").coalesce(1), t)
    // 5 small files >= minFiles → the synchronous fold ran
    assert(TxLog.commits(t).exists(_.op == "optimize"),
      "reaching minFiles must trigger the auto-compaction commit")
    assert(dataFiles(t).size === 1,
      s"small files must fold to ~targetSize outputs, got ${dataFiles(t)}")
    assert(TxLog.read(spark, t).as[(Long, String)].collect().toSet ===
      (1 to 5).map(i => (i.toLong, s"r$i")).toSet)
  }

  test("off by default; layout-only commits never self-trigger") {
    val t = tmpDir("autocompact_off") + "/t"
    (1 to 6).foreach { i =>
      TxLog.append(Seq((i.toLong, s"r$i")).toDF("k", "v").coalesce(1), t)
    }
    assert(dataFiles(t).size === 6)
    assert(!TxLog.commits(t).exists(_.op == "optimize"),
      "auto-compaction is the table owner's opt-in, never a default")
    // a manual OPTIMIZE on an enabled table must not recurse
    TxLog.setProperties(t, Map(
      "graft.autoCompact.enabled" -> "true",
      "graft.autoCompact.minFiles" -> "2"))
    TxLog.optimize(spark, t, targetFiles = 2)
    assert(TxLog.commits(t).count(_.op == "optimize") === 1,
      "the optimize commit itself must not re-trigger auto-compaction")
  }

  test("declared-partitioned tables keep the Hive layout through the fold") {
    val t = tmpDir("autocompact_part") + "/t"
    TxLog.setProperties(t, Map(
      "graft.partition.columns" -> "p",
      "graft.autoCompact.enabled" -> "true",
      "graft.autoCompact.minFileSize" -> (1024L * 1024).toString,
      "graft.autoCompact.minFiles" -> "4"))
    (1 to 4).foreach { i =>
      TxLog.append(Seq((i.toLong, s"p${i % 2}")).toDF("k", "p")
        .coalesce(1), t)
    }
    assert(TxLog.commits(t).exists(_.op == "optimize"))
    val files = dataFiles(t)
    assert(files.nonEmpty && files.forall(_.contains("p=")),
      s"compacted outputs must stay Hive-partitioned: $files")
    assert(TxLog.read(spark, t).as[(Long, String)].collect().toSet ===
      (1 to 4).map(i => (i.toLong, s"p${i % 2}")).toSet)
    // partition pruning still works over the compacted layout
    val pruned = TxLog.read(spark, t).filter(col("p") === "p0")
    assert(pruned.as[(Long, String)].collect().toSet ===
      Set((2L, "p0"), (4L, "p0")))
  }

  test("concurrent appenders race the synchronous fold; nothing is lost") {
    // two writers trickle single-file appends into one auto-compacting
    // table: every append can trigger the hook's optimizeSmall, whose
    // optimistic rewrite races the OTHER writer's commits. The invariant
    // is the multiset — a lost row or a double-fold would break it.
    val t = tmpDir("autocompact_race") + "/t"
    TxLog.setProperties(t, Map(
      "graft.autoCompact.enabled" -> "true",
      "graft.autoCompact.minFileSize" -> (1024L * 1024).toString,
      "graft.autoCompact.minFiles" -> "3"))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val futures = (0 until 2).map { w =>
        pool.submit(new Runnable {
          override def run(): Unit =
            (1 to 8).foreach { i =>
              // the documented client contract on ConcurrentWriteException
              // (a racer changed schema metadata — here the first schema
              // commit, or an optimize's nullability relaxation): re-read
              // and retry the whole operation
              var tries = 0
              var done = false
              while (!done) {
                try {
                  TxLog.append(Seq((w * 100L + i, s"w$w-$i"))
                    .toDF("k", "v").coalesce(1), t)
                  done = true
                } catch {
                  case _: TxLog.ConcurrentWriteException if tries < 20 =>
                    tries += 1
                }
              }
            }
        })
      }
      futures.foreach(_.get())
    } finally pool.shutdown()
    val rows = TxLog.read(spark, t).as[(Long, String)].collect()
    assert(rows.length === 16, s"all 16 appended rows must survive")
    assert(rows.map(_._1).toSet ===
      (0 until 2).flatMap(w => (1 to 8).map(w * 100L + _)).toSet)
    assert(TxLog.commits(t).exists(_.op == "optimize"),
      "at least one fold must have fired under the race")
    assert(dataFiles(t).size < 16, "folding must have reduced file count")
  }

  test("a DV'd small file folds; the DV retires with the rewrite") {
    val t = tmpDir("autocompact_dv") + "/t"
    TxLog.setProperties(t, Map(
      "graft.autoCompact.enabled" -> "true",
      "graft.autoCompact.minFileSize" -> (1024L * 1024).toString,
      "graft.autoCompact.minFiles" -> "4"))
    (1 to 3).foreach { i =>
      TxLog.append(Seq((i.toLong, s"r$i")).toDF("k", "v").coalesce(1), t)
    }
    TxLog.deleteVectors(spark, t, col("k") === 2L)
    assert(TxLog.activeDvs(t).nonEmpty)
    TxLog.append(Seq((4L, "r4")).toDF("k", "v").coalesce(1), t)
    assert(TxLog.commits(t).exists(_.op == "optimize"))
    assert(TxLog.activeDvs(t).isEmpty,
      "the DV's file was rewritten — the DV must retire as inert")
    assert(TxLog.read(spark, t).as[(Long, String)].collect().toSet ===
      Set((1L, "r1"), (3L, "r3"), (4L, "r4")))
  }
}
