package graft

import java.nio.file.{Files, Paths}

import graft.ops.TxLog

/** Log compaction ([[TxLog.compactLog]] — the lossless form of Delta's
  * log cleanup): consolidate the cold range of loose commit JSONs into
  * one container file, bounding the log's FILE count for long-lived
  * trickle-written tables while keeping every fold answer — schema,
  * properties, time travel, history — byte-identical. */
class LogCompactionSpec extends SparkSpec {
  import spark.implicits._

  private def loose(t: String): Seq[String] =
    scala.jdk.CollectionConverters.IteratorHasAsScala(
      Files.list(Paths.get(t, "_txlog")).iterator()).asScala
      .map(_.getFileName.toString).filter(_.matches("""\d{20}\.json"""))
      .toSeq.sorted

  private def containers(t: String): Seq[String] =
    scala.jdk.CollectionConverters.IteratorHasAsScala(
      Files.list(Paths.get(t, "_txlog")).iterator()).asScala
      .map(_.getFileName.toString)
      .filter(_.endsWith(".compactedlog.json")).toSeq

  private def seed(t: String, n: Int): Unit =
    (1 to n).foreach(i => TxLog.append(
      Seq((i.toLong, s"v$i")).toDF("k", "v").coalesce(1), t))

  test("compactLog consolidates the cold range losslessly") {
    val t = tmpDir("logc") + "/t"
    TxLog.setProperties(t, Map("graft.stats.columns" -> "k"))   // v1
    seed(t, 40)                                                 // v2..v41
    val commitsBefore = TxLog.commits(t)
      .map(c => (c.version, c.op, c.add, c.remove, c.ts))
    val filesBefore = TxLog.activeFiles(t)
    val schemaBefore = TxLog.schemaAsOf(t)
    val propsBefore = TxLog.properties(t)
    val v5Before = TxLog.read(spark, t, Some(5L)).count()
    assert(loose(t).size === 41)

    val (from, to) = TxLog.compactLog(t).get
    assert(from === 1L && to === 21L, s"expected 1-21, got $from-$to")
    assert(loose(t).size === 20, "keepTail loose commits survive")
    assert(containers(t).size === 1)

    // every fold answer is unchanged — the container carries the raw
    // commit records verbatim
    assert(TxLog.commits(t)
      .map(c => (c.version, c.op, c.add, c.remove, c.ts)) === commitsBefore)
    assert(TxLog.activeFiles(t) === filesBefore)
    assert(TxLog.schemaAsOf(t) === schemaBefore)
    assert(TxLog.properties(t) === propsBefore)
    assert(TxLog.read(spark, t, Some(5L)).count() === v5Before,
      "time travel below the compaction horizon must keep working")
    assert(TxLog.read(spark, t).count() === 40)
  }

  test("a post-compaction commit stamps reader protocol v6") {
    val t = tmpDir("logc_v6") + "/t"
    seed(t, 25)
    TxLog.compactLog(t, keepTail = 5)
    TxLog.append(Seq((99L, "z")).toDF("k", "v").coalesce(1), t)
    val last = TxLog.commits(t).last
    assert(last.minReader === 6,
      s"commit on a compacted log must stamp v6, got ${last.minReader}")
    // and the next checkpoint carries the floor too
    TxLog.compact(t)
    val cp = scala.jdk.CollectionConverters.IteratorHasAsScala(
      Files.list(Paths.get(t, "_txlog")).iterator()).asScala
      .filter(_.getFileName.toString.endsWith(".checkpoint.json"))
      .map(p => new String(Files.readAllBytes(p))).toSeq
    assert(cp.exists(_.contains("\"protocolVersion\":6")), cp.mkString)
  }

  test("compactLog publishes the v6 floor atomically with the container") {
    val t = tmpDir("logc_floor") + "/t"
    seed(t, 40)
    TxLog.compactLog(t).get
    // BEFORE any subsequent commit or manual compact(): a pre-v6 reader
    // lists only loose <v>.json files, so some file it DOES parse —
    // checkpoints are parsed unconditionally by every reader generation —
    // must already say 6, or it silently folds a log missing every
    // consolidated commit
    val cp = scala.jdk.CollectionConverters.IteratorHasAsScala(
      Files.list(Paths.get(t, "_txlog")).iterator()).asScala
      .filter(_.getFileName.toString.endsWith(".checkpoint.json"))
      .map(p => new String(Files.readAllBytes(p))).toSeq
    assert(cp.exists(_.contains("\"protocolVersion\":6")),
      s"no v6-stamped checkpoint right after compactLog: ${cp.mkString}")
    // the floor checkpoint is a REAL checkpoint: folds stay correct
    assert(TxLog.read(spark, t).count() === 40)
    assert(TxLog.activeFiles(t).size === 40)
  }

  test("readers racing compactLog re-list instead of throwing") {
    // compactLog unlinks loose commits AFTER publishing the container; a
    // reader that listed before the unlink can open a vanished file and
    // must re-list (the container now carries the commit). Drive both
    // sides hard from separate threads — pre-fix this threw
    // NoSuchFileException from parseLogFile.
    val t = tmpDir("logc_race") + "/t"
    seed(t, 12)
    @volatile var readerErr: Option[Throwable] = None
    @volatile var stop = false
    val reader = new Thread(() => {
      try while (!stop) {
        val cs = TxLog.commits(t)
        assert(cs.map(_.version) === (1L to cs.size))
      } catch { case e: Throwable => readerErr = Some(e) }
    })
    reader.start()
    try (1 to 15).foreach { i =>
      seed(t, 4)
      TxLog.compactLog(t, keepTail = 1, minFiles = 2)
    } finally { stop = true; reader.join(10000) }
    readerErr.foreach(throw _)
    val n = TxLog.commits(t).size
    assert(n === 12 + 15 * 4)
    assert(TxLog.read(spark, t).count() === n.toLong)
  }

  test("repeat compaction is incremental and race-safe") {
    val t = tmpDir("logc_inc") + "/t"
    seed(t, 40)
    assert(TxLog.compactLog(t).contains((1L, 20L)))
    // nothing new to consolidate: below minFiles → no-op
    assert(TxLog.compactLog(t).isEmpty)
    seed(t, 20)                                                 // v41..v60
    val (from2, to2) = TxLog.compactLog(t).get
    assert(from2 === 21L && to2 === 40L,
      s"second pass starts after the first container: $from2-$to2")
    assert(containers(t).size === 2)
    assert(TxLog.commits(t).map(_.version) === (1L to 60L))
    assert(TxLog.read(spark, t).count() === 60)
  }

  test("auto compaction triggers from graft.logCompaction.threshold") {
    val t = tmpDir("logc_auto") + "/t"
    TxLog.setProperties(t, Map("graft.logCompaction.threshold" -> "30"))
    seed(t, 45)
    assert(containers(t).nonEmpty,
      "threshold crossed: a container must exist without any manual call")
    assert(loose(t).size < 45)
    assert(TxLog.commits(t).size === 46) // property commit + 45 appends
    assert(TxLog.read(spark, t).count() === 45)
  }
}
