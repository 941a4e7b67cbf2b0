package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.ops.TxLog

/** Multi-part checkpoints (Delta's `<v>.checkpoint.<i>.<n>` split) plus
  * the `_last_checkpoint` pointer. Past `graft.checkpoint.partMaxFiles`
  * active files the checkpoint splits: part 1 carries the scalar state,
  * every part a disjoint slice of the file list with the file-keyed maps
  * restricted to its slice. At 10^6 active files the single-JSON form is
  * a ~90 MB driver-side write; parts bound each write, and readers use a
  * set only when EVERY part is present — a crash mid-publish leaves an
  * invisible partial set, never a torn snapshot. These specs pin the
  * split shape, fold equivalence cold, torn-set fallback, pointer
  * resilience, and retention floored on a multi-part checkpoint. */
class MultipartCheckpointSpec extends SparkSpec {
  import spark.implicits._

  private def coldCopy(src: String): String = {
    val dst = tmpDir("mpcp_cold") + "/t"
    val s = Paths.get(src)
    TxLog.walkDir(s).foreach { p =>
      val rel = s.relativize(p)
      val t = Paths.get(dst).resolve(rel)
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else { Files.createDirectories(t.getParent); Files.copy(p, t) }
    }
    dst
  }

  private def logNames(t: String): Seq[String] =
    TxLog.walkDir(Paths.get(t, "_txlog")).map(_.getFileName.toString)

  private val PartName = """\d{20}\.checkpoint\.\d{10}\.\d{10}\.json""".r

  /** 6 single-file appends + properties/constraint/DV/guarded commit —
    * with partMaxFiles=2 the tip checkpoint must split into >= 3 parts. */
  private def fixture(): String = {
    val t = tmpDir("mpcp") + "/t"
    TxLog.setProperties(t, Map("graft.checkpoint.partMaxFiles" -> "2",
      "graft.stats.columns" -> "k", "custom.tag" -> "v1"))
    (1 to 6).foreach { i =>
      TxLog.append(Seq((i.toLong, s"r$i")).toDF("k", "v").coalesce(1), t)
    }
    TxLog.addConstraint(spark, t, "k_pos", "k > 0")
    TxLog.append(Seq((7L, "g")).toDF("k", "v").coalesce(1), t,
      batchId = 5L, streamId = Some("streamA"))
    TxLog.deleteVectors(spark, t, col("k") === 2L)
    TxLog.compact(t)
    TxLog.append(Seq((8L, "h")).toDF("k", "v").coalesce(1), t) // tail
    t
  }

  test("past partMaxFiles the checkpoint splits; cold folds are exact") {
    val t = fixture()
    val names = logNames(t)
    val parts = names.filter(PartName.matches)
    assert(parts.size >= 3, s"expected >= 3 parts, got $names")
    val tipV = parts.map(_.take(20).toLong).max
    assert(!names.contains(f"$tipV%020d.checkpoint.json"),
      "the split checkpoint must not also write the single-file form")
    assert(TxLog.lastCheckpoint(t) === Some((tipV, parts.size)),
      "_last_checkpoint must name the newest set and its part count")
    val warm = (TxLog.activeFiles(t), TxLog.activeDvs(t),
      TxLog.properties(t), TxLog.constraints(t), TxLog.schemaAsOf(t),
      TxLog.fileSizes(t), TxLog.fileRowCounts(t))
    val cold = coldCopy(t)
    assert(TxLog.activeFiles(cold) === warm._1)
    assert(TxLog.activeDvs(cold) === warm._2)
    assert(TxLog.properties(cold) === warm._3)
    assert(TxLog.constraints(cold) === warm._4)
    assert(TxLog.schemaAsOf(cold) === warm._5)
    assert(TxLog.fileSizes(cold) === warm._6)
    assert(TxLog.fileRowCounts(cold) === warm._7)
    assert(TxLog.batchCommitted(cold, Some("streamA"), 5L))
    assert(!TxLog.batchCommitted(cold, Some("streamA"), 6L))
    assert(TxLog.read(spark, cold).as[(Long, String)].collect().toSet ===
      (1 to 8).filter(_ != 2).map(i => (i.toLong, veeOf(i))).toSet)
  }

  private def veeOf(i: Int): String =
    if (i == 7) "g" else if (i == 8) "h" else s"r$i"

  test("the parts are consulted: a marker planted in part 1 folds cold") {
    val cold = coldCopy(fixture())
    val p1 = TxLog.walkDir(Paths.get(cold, "_txlog"))
      .filter(p => PartName.matches(p.getFileName.toString))
      .filter(_.getFileName.toString.contains(".checkpoint.0000000001."))
      .maxBy(_.getFileName.toString)
    val json = new String(Files.readAllBytes(p1))
    val edited = json.replace("\"custom.tag\":\"v1\"",
      "\"custom.tag\":\"v1\",\"cp.marker\":\"from-part-1\"")
    assert(edited != json, "marker injection must hit part 1's state props")
    Files.write(p1, edited.getBytes)
    assert(TxLog.properties(cold).get("cp.marker") === Some("from-part-1"),
      "cold properties must fold from the merged part states")
  }

  test("a torn set (missing part) is invisible; folds fall back exactly") {
    val t = fixture()
    val warm = (TxLog.activeFiles(t), TxLog.properties(t),
      TxLog.read(spark, t).count())
    val cold = coldCopy(t)
    val victim = TxLog.walkDir(Paths.get(cold, "_txlog"))
      .filter(p => PartName.matches(p.getFileName.toString))
      .maxBy(_.getFileName.toString)
    Files.delete(victim) // crash between part links, simulated
    assert(TxLog.activeFiles(cold) === warm._1,
      "an incomplete part set must not anchor a fold")
    assert(TxLog.properties(cold) === warm._2)
    assert(TxLog.read(spark, cold).count() === warm._3)
  }

  test("a missing or corrupt _last_checkpoint pointer changes nothing") {
    val t = fixture()
    val warmFiles = TxLog.activeFiles(t)
    val gone = coldCopy(t)
    Files.delete(Paths.get(gone, "_txlog", "_last_checkpoint.json"))
    assert(TxLog.activeFiles(gone) === warmFiles)
    assert(TxLog.lastCheckpoint(gone) === None)
    val bad = coldCopy(t)
    Files.write(Paths.get(bad, "_txlog", "_last_checkpoint.json"),
      "{not json".getBytes)
    assert(TxLog.activeFiles(bad) === warmFiles)
    assert(TxLog.lastCheckpoint(bad) === None)
  }

  test("log retention floored on a multi-part checkpoint stamps v8") {
    val t = fixture()
    val preRows = TxLog.read(spark, t).count()
    val h = TxLog.expireLog(t)
      .getOrElse(fail("expireLog must find the multi-part floor"))
    // the multi-part set IS the newest state checkpoint → the horizon
    val names = logNames(t)
    assert(names.exists(PartName.matches),
      "the floor set must survive expiry")
    assert(!names.exists(n => CommitJson.matches(n) &&
      n.take(20).toLong <= h), "covered commits must be gone")
    assert(TxLog.commits(t).exists(c => c.version > h && c.minReader >= 8),
      "a surviving commit must carry the v8 floor — a v7 reader's " +
        "listing cannot see the part files")
    assert(TxLog.read(spark, t).count() === preRows,
      "retained reads must answer exactly")
    val refused =
      try { TxLog.read(spark, t, Some(h - 1)).count(); false }
      catch { case e: IllegalStateException =>
        e.getMessage.contains("log-retention horizon") }
    assert(refused, "below-horizon time travel must refuse")
    // post-expiry writes and checkpoints keep working on the v8 log
    TxLog.append(Seq((9L, "i")).toDF("k", "v").coalesce(1), t)
    assert(TxLog.read(spark, t).count() === preRows + 1)
  }

  private val CommitJson = """\d{20}\.json""".r

  test("a stray part with a different count never hides a complete set") {
    // two compactors under different partMaxFiles settings can leave one
    // complete set plus an abandoned stray of another part count at the
    // SAME version — the reader must use the complete set, not reject
    // the version
    val t = fixture()
    val cold = coldCopy(t)
    val warmFiles = TxLog.activeFiles(t)
    val p1 = TxLog.walkDir(Paths.get(cold, "_txlog"))
      .filter(p => PartName.matches(p.getFileName.toString))
      .minBy(_.getFileName.toString)
    val v = p1.getFileName.toString.take(20)
    // abandoned first part of a would-be 9-part set at the same version
    Files.copy(p1, Paths.get(cold, "_txlog",
      s"$v.checkpoint.0000000001.0000000009.json"))
    assert(TxLog.activeFiles(cold) === warmFiles,
      "the complete set must stay visible beside the stray")
    assert(TxLog.read(spark, cold).count() === TxLog.read(spark, t).count())
  }

  test("parts compose with column mapping, row tracking, and identity") {
    val t = tmpDir("mpcp_x") + "/t"
    TxLog.setProperties(t, Map(
      "graft.checkpoint.partMaxFiles" -> "2",
      "graft.rowTracking.enabled" -> "true"))
    (1 to 5).foreach { i =>
      TxLog.append(Seq((i.toLong, s"r$i")).toDF("k", "v").coalesce(1), t)
    }
    TxLog.setProperties(t, Map("graft.columnMapping.mode" -> "name"))
    spark.sql(s"ALTER TABLE txlog.`$t` RENAME COLUMN v TO label")
    TxLog.deleteVectors(spark, t, col("k") === 3L)
    TxLog.compact(t)
    val warmRows = TxLog.read(spark, t)
      .select("k", "label").as[(Long, String)].collect().toSet
    val warmMap = TxLog.mappingAsOf(t)
    val cold = coldCopy(t)
    assert(logNames(cold).count(PartName.matches) >= 2,
      "the feature-heavy snapshot must have split")
    assert(TxLog.mappingAsOf(cold) === warmMap,
      "column mapping must fold from the merged part states")
    assert(TxLog.read(spark, cold).select("k", "label")
      .as[(Long, String)].collect().toSet === warmRows,
      "renamed columns + DVs must read identically from the part fold")
    assert(warmRows === (1 to 5).filter(_ != 3)
      .map(i => (i.toLong, s"r$i")).toSet)
    // row-id continuity: the next append on the cold copy allocates
    // ABOVE the checkpointed high water, never reusing ids
    val hw = TxLog.readWithRowIds(spark, cold)
      .agg(max(col("_row_id"))).collect()(0).getLong(0)
    TxLog.append(Seq((6L, "r6")).toDF("k", "label").coalesce(1), cold)
    val after = TxLog.readWithRowIds(spark, cold)
      .filter(col("k") === 6L)
      .select(col("_row_id")).collect()(0).getLong(0)
    assert(after > hw,
      s"row ids must continue above the checkpointed high water " +
        s"($after vs $hw)")
  }

  test("the default partMaxFiles keeps the single-file form and pointer") {
    val t = tmpDir("mpcp_single") + "/t"
    TxLog.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), t)
    TxLog.compact(t)
    val names = logNames(t)
    assert(names.exists(_.endsWith(".checkpoint.json")))
    assert(!names.exists(PartName.matches))
    val v = names.filter(_.endsWith(".checkpoint.json"))
      .map(_.take(20).toLong).max
    assert(TxLog.lastCheckpoint(t) === Some((v, 1)))
  }
}
