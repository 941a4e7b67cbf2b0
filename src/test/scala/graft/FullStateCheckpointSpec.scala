package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.ops.TxLog

/** Full-state checkpoints (Delta's checkpoint content, beyond the file
  * list): every metadata fold — schema, properties, constraints, column
  * mapping, DVs, sizes/rows, row-id bases, replay guard, COPY INTO
  * ledger — restarts from the newest state-carrying checkpoint and folds
  * only the tail commits, so COLD metadata is O(active + tail) instead
  * of O(history-bytes). These specs pin three things: the state
  * round-trips (cold answers equal warm answers), the checkpoint is
  * actually CONSULTED (a marker edited into the checkpoint state shows
  * up in a cold fold), and a corrupt state section falls back to the
  * full commit fold instead of failing or misreading. */
class FullStateCheckpointSpec extends SparkSpec {
  import spark.implicits._

  /** Copy a table dir to a fresh path — caches key by path, so the copy
    * is a COLD reader of the same log (the LogCompactionProbe pattern). */
  private def coldCopy(src: String): String = {
    val dst = tmpDir("fscp_cold") + "/t"
    val s = Paths.get(src)
    TxLog.walkDir(s).foreach { p =>
      val rel = s.relativize(p)
      val t = Paths.get(dst).resolve(rel)
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else { Files.createDirectories(t.getParent); Files.copy(p, t) }
    }
    dst
  }

  private def fixture(): String = {
    val t = tmpDir("fscp") + "/t"
    TxLog.setProperties(t, Map("graft.stats.columns" -> "k",
      "custom.tag" -> "v1"))
    TxLog.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), t)
    TxLog.append(Seq((3L, "c"), (4L, "d")).toDF("k", "v"), t)
    TxLog.addConstraint(spark, t, "k_pos", "k > 0")
    TxLog.setProperties(t, Map("custom.tag" -> "v2")) // overwrite: LWW
    TxLog.append(Seq((5L, "e")).toDF("k", "v"), t, batchId = 3L,
      streamId = Some("streamA"))
    TxLog.deleteVectors(spark, t, col("k") === 2L) // active DV
    TxLog.append(Seq((6L, "f", 1.5)).toDF("k", "v", "w"), t,
      mergeSchema = true) // schema evolution
    TxLog.compact(t) // full-state checkpoint at the tip
    TxLog.append(Seq((7L, "g", 2.5)).toDF("k", "v", "w"), t) // tail commit
    t
  }

  test("cold folds from the state checkpoint equal the warm answers") {
    val t = fixture()
    val warm = (TxLog.activeFiles(t), TxLog.activeDvs(t),
      TxLog.properties(t), TxLog.constraints(t),
      TxLog.schemaAsOf(t), TxLog.fileSizes(t), TxLog.fileRowCounts(t))
    val cold = coldCopy(t)
    assert(TxLog.activeFiles(cold) === warm._1)
    assert(TxLog.activeDvs(cold) === warm._2)
    assert(TxLog.properties(cold) === warm._3)
    assert(TxLog.properties(cold)("custom.tag") === "v2")
    assert(TxLog.constraints(cold) === warm._4)
    assert(TxLog.schemaAsOf(cold) === warm._5)
    assert(TxLog.fileSizes(cold) === warm._6)
    assert(TxLog.fileRowCounts(cold) === warm._7)
    // the replay guard folds from checkpointed state too
    assert(TxLog.batchCommitted(cold, Some("streamA"), 3L))
    assert(!TxLog.batchCommitted(cold, Some("streamB"), 3L))
    assert(!TxLog.batchCommitted(cold, Some("streamA"), 4L))
    // reads over the cold copy see the same rows (DV applied, evolution
    // backfill NULL)
    assert(TxLog.read(spark, cold).count() === TxLog.read(spark, t).count())
    // time travel BELOW the checkpoint folds from the full history
    assert(TxLog.read(spark, cold, Some(2L)).count() === 2L)
    assert(TxLog.properties(cold, Some(1L))("custom.tag") === "v1")
  }

  test("the checkpoint is consulted: an edited marker surfaces cold") {
    val t = fixture()
    val cold = coldCopy(t)
    // plant a marker property INSIDE the newest checkpoint's state — it
    // exists nowhere in any commit, so only a state-based fold can see it
    val cp = TxLog.walkDir(Paths.get(cold, "_txlog"))
      .filter(_.getFileName.toString.endsWith(".checkpoint.json"))
      .maxBy(_.getFileName.toString)
    val json = new String(Files.readAllBytes(cp))
    assert(json.contains("\"state\""), "checkpoint must carry state")
    val edited = json.replace("\"custom.tag\":\"v2\"",
      "\"custom.tag\":\"v2\",\"cp.marker\":\"from-checkpoint\"")
    assert(edited != json, "marker injection must hit the state props")
    Files.write(cp, edited.getBytes)
    assert(TxLog.properties(cold).get("cp.marker")
      === Some("from-checkpoint"),
      "cold properties must fold from the checkpoint state, not the log")
  }

  test("a corrupt state section falls back to the full commit fold") {
    val t = fixture()
    val warmProps = TxLog.properties(t)
    val warmSchema = TxLog.schemaAsOf(t)
    val warmFiles = TxLog.activeFiles(t)
    val cold = coldCopy(t)
    val cp = TxLog.walkDir(Paths.get(cold, "_txlog"))
      .filter(_.getFileName.toString.endsWith(".checkpoint.json"))
      .maxBy(_.getFileName.toString)
    // garble the state section: truncate the file mid-JSON
    val bytes = Files.readAllBytes(cp)
    Files.write(cp, bytes.take(bytes.length / 2))
    assert(TxLog.properties(cold) === warmProps,
      "corrupt checkpoint: properties must fall back to the full fold")
    assert(TxLog.schemaAsOf(cold) === warmSchema)
    assert(TxLog.activeFiles(cold) === warmFiles)
    assert(TxLog.read(spark, cold).count() === TxLog.read(spark, t).count())
  }

  test("state checkpoints compose with log compaction") {
    val t = tmpDir("fscp_lc") + "/t"
    TxLog.setProperties(t, Map("custom.k" -> "x"))
    (1 to 40).foreach(i =>
      TxLog.append(Seq((i.toLong, s"v$i")).toDF("k", "v").coalesce(1), t))
    TxLog.compactLog(t).get // container + v6-floor STATE checkpoint
    val cold = coldCopy(t)
    assert(TxLog.properties(cold)("custom.k") === "x")
    assert(TxLog.activeFiles(cold).size === 40)
    assert(TxLog.read(spark, cold).count() === 40)
    // below-horizon time travel still folds from the container
    assert(TxLog.read(spark, cold, Some(5L)).count() === 4) // v1 = props
  }
}
