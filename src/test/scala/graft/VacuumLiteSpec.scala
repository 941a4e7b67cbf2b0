package graft

import java.nio.file.{Files, Paths}

import graft.ops.TxLog

/** `VACUUM LITE` (Delta 3.1's shape): candidates come from the log's
  * remove actions, not a recursive directory walk — O(log tail) where
  * the full sweep pays O(files on disk). Same protection rules as the
  * full sweep; the documented trade is that never-committed orphans are
  * invisible to the log and stay for a periodic FULL vacuum. */
class VacuumLiteSpec extends SparkSpec {
  import spark.implicits._

  private def seed(): String = {
    val t = tmpDir("vaclite") + "/t"
    TxLog.append(Seq((1L, "a")).toDF("k", "v"), t)     // v1
    TxLog.overwrite(Seq((2L, "b")).toDF("k", "v"), t)  // v2 retires v1 files
    TxLog.overwrite(Seq((3L, "c")).toDF("k", "v"), t)  // v3 retires v2 files
    t
  }

  test("lite sweeps exactly what the full sweep would") {
    val a = seed()
    val b = seed()
    val wantFull = TxLog.vacuum(a, retainVersions = 1, dryRun = true)
    val gotLite = TxLog.vacuum(b, retainVersions = 1, dryRun = true,
      lite = true)
    // same fixture shape → same relative candidate multiset
    assert(gotLite.map(_.split("/").length).sorted ===
      wantFull.map(_.split("/").length).sorted)
    assert(gotLite.nonEmpty)
    val swept = TxLog.vacuum(b, retainVersions = 1, lite = true)
    assert(swept.toSet === gotLite.toSet)
    assert(TxLog.read(spark, b).as[(Long, String)].collect().toSeq ===
      Seq((3L, "c")), "the live snapshot is untouched")
    // everything the log still references exists; the swept files do not
    val root = Paths.get(b)
    TxLog.activeFiles(b).foreach(f =>
      assert(Files.exists(root.resolve(f))))
    swept.foreach(f => assert(!Files.exists(root.resolve(f))))
  }

  test("lite leaves never-committed orphans for the full sweep") {
    val t = seed()
    val orphan = Paths.get(t, "d-orphan", "part-00000.parquet")
    Files.createDirectories(orphan.getParent)
    Files.write(orphan, Array[Byte](1, 2, 3))
    val lite = TxLog.vacuum(t, retainVersions = 1, dryRun = true,
      lite = true)
    assert(!lite.exists(_.contains("d-orphan")),
      "the log never heard of the orphan — LITE must not claim it")
    val full = TxLog.vacuum(t, retainVersions = 1, dryRun = true)
    assert(full.exists(_.contains("d-orphan")),
      "the full walk is the documented owner of orphans")
  }

  test("SQL: VACUUM LITE composes with RETAIN and DRY RUN") {
    val t = seed()
    val dry = spark.sql(
      s"VACUUM txlog.`$t` LITE RETAIN 1 VERSIONS DRY RUN")
      .collect().head.getLong(0)
    assert(dry > 0, "dry run reports the sweepable count")
    assert(TxLog.commits(t).size === 3, "dry run commits nothing")
    val swept = spark.sql(s"VACUUM txlog.`$t` LITE RETAIN 1 VERSIONS")
      .collect().head.getLong(0)
    assert(swept === dry)
    assert(TxLog.read(spark, t).count() === 1)
  }

  test("lite respects protected versions like the full sweep") {
    val t = seed()
    // retainVersions = 3 protects every version: nothing may go
    assert(TxLog.vacuum(t, retainVersions = 3, dryRun = true,
      lite = true).isEmpty)
    // and time travel to v1 still works afterwards
    assert(TxLog.read(spark, t, Some(1L)).count() === 1)
  }
}
