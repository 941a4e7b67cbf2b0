package graft

import graft.ops.TxLog

/** Time-based VACUUM (`RETAIN n HOURS`, VERDICT r14 item 7): the
  * retention window translates to a version horizon through the
  * strictly-monotone commit-timestamp index; versions inside the window
  * survive and stay time-travelable, and a window that would sweep past
  * the latest log checkpoint refuses. */
class VacuumRetentionSpec extends SparkSpec {
  import spark.implicits._

  private def seed(): String = {
    val t = tmpDir("vacret") + "/t"
    TxLog.append(Seq((1L, "a")).toDF("k", "v"), t)     // v1
    TxLog.overwrite(Seq((2L, "b")).toDF("k", "v"), t)  // v2 retires v1 files
    TxLog.overwrite(Seq((3L, "c")).toDF("k", "v"), t)  // v3 retires v2 files
    t
  }

  test("a wide window retains everything; time travel inside it works") {
    val t = seed()
    val swept = TxLog.vacuum(t, retainVersions = 1,
      retainHours = Some(168.0))
    assert(swept.isEmpty, "all commits are inside the 168 h window")
    assert(TxLog.read(spark, t, Some(1L)).as[(Long, String)]
      .collect().toSeq === Seq((1L, "a")),
      "every version inside the window stays time-travelable")
  }

  test("RETAIN 0 HOURS keeps only the current snapshot") {
    val t = seed()
    val v1Files = TxLog.commits(t).head.add
    val dry = TxLog.vacuum(t, retainVersions = 1, dryRun = true,
      retainHours = Some(0.0))
    assert(v1Files.forall(dry.contains),
      s"pre-horizon files must be sweepable: $dry")
    val swept = TxLog.vacuum(t, retainVersions = 1,
      retainHours = Some(0.0))
    assert(v1Files.forall(swept.contains))
    // the current snapshot is untouched
    assert(TxLog.read(spark, t).as[(Long, String)].collect().toSeq ===
      Seq((3L, "c")))
  }

  test("version retention still floors the time window (keep the most)") {
    val t = seed()
    // retainVersions = 3 protects v1..v3 even under a 0-hour window
    val swept = TxLog.vacuum(t, retainVersions = 3,
      retainHours = Some(0.0))
    assert(swept.isEmpty)
    assert(TxLog.read(spark, t, Some(1L)).count() === 1)
  }

  test("a window sweeping past the latest checkpoint refuses; compact clears it") {
    val t = tmpDir("vacret") + "/cp"
    TxLog.append(Seq((1L, "a")).toDF("k", "v"), t)     // v1
    TxLog.overwrite(Seq((2L, "b")).toDF("k", "v"), t)  // v2
    TxLog.compact(t)                                   // checkpoint @ v2
    TxLog.overwrite(Seq((3L, "c")).toDF("k", "v"), t)  // v3
    val e = intercept[IllegalArgumentException] {
      TxLog.vacuum(t, retainVersions = 1, retainHours = Some(0.0))
    }
    assert(e.getMessage.contains("checkpoint"))
    // advancing the checkpoint is the named remedy
    TxLog.compact(t)                                   // checkpoint @ v3
    val swept = TxLog.vacuum(t, retainVersions = 1,
      retainHours = Some(0.0))
    assert(swept.nonEmpty)
    assert(TxLog.read(spark, t).as[(Long, String)].collect().toSeq ===
      Seq((3L, "c")))
  }

  test("SQL VACUUM RETAIN n HOURS [DRY RUN]") {
    val t = seed()
    val dry = spark.sql(s"VACUUM txlog.`$t` RETAIN 168 HOURS DRY RUN")
      .collect().head.getLong(0)
    assert(dry === 0L, "everything is inside the window")
    // 0-hour window through SQL sweeps the retired files (the default
    // 2-version floor still protects v2's files)
    val v1Files = TxLog.commits(t).head.add
    val removed = spark.sql(s"VACUUM txlog.`$t` RETAIN 0 HOURS")
      .collect().head.getLong(0)
    assert(removed >= v1Files.size)
    assert(TxLog.read(spark, t).count() === 1)
  }
}
