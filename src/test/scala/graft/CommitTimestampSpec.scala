package graft

import graft.ops.TxLog

/** In-commit timestamps (Delta's inCommitTimestamps; VERDICT r14
  * item 2): every commit stamps `max(parent.ts + 1, clock)`, so the
  * TIMESTAMP AS OF index is strictly monotone in version order even
  * when a writer's wall clock is skewed backwards. */
class CommitTimestampSpec extends SparkSpec {
  import spark.implicits._

  test("stamps are strictly monotone even under a regressed clock") {
    val t = tmpDir("tsmono") + "/t"
    TxLog.append(Seq((1L, "a")).toDF("k", "v"), t)                  // v1
    val ts1 = TxLog.commits(t).last.ts
    assert(ts1 > 0)
    // a writer whose clock reads 1970 publishes v2: the stamp clamps
    // to parent + 1 instead of rewinding the index
    assert(TxLog.tryCommit(t, TxLog.Commit(2L, Seq.empty, Seq.empty,
      "setProperty", -1L, ts = 1000L,
      properties = Map("x" -> Some("1")))))
    val ts2 = TxLog.commits(t).last.ts
    assert(ts2 === ts1 + 1, "regressed clock must inherit parent.ts + 1")
    // a sane clock resumes: stamps keep strictly increasing
    TxLog.append(Seq((2L, "b")).toDF("k", "v"), t)                  // v3
    val all = TxLog.commits(t).map(_.ts)
    assert(all === all.sorted, "timestamp order must equal version order")
    assert(all.distinct.size === all.size, "stamps are strictly monotone")
  }

  test("TIMESTAMP AS OF resolves deterministically across a clamped stamp") {
    val t = tmpDir("tsmono") + "/t2"
    TxLog.append(Seq((1L, "a")).toDF("k", "v"), t)                  // v1
    val ts1 = TxLog.commits(t).last.ts
    assert(TxLog.tryCommit(t, TxLog.Commit(2L, Seq.empty, Seq.empty,
      "setProperty", -1L, ts = 0L, properties = Map("y" -> Some("2")))))
    val ts2 = TxLog.commits(t).last.ts // = ts1 + 1
    // the index answers by ts unambiguously: ts1 → v1, ts2 → v2
    def versionAt(ts: Long) =
      TxLog.commits(t).filter(_.ts <= ts).last.version
    assert(versionAt(ts1) === 1L)
    assert(versionAt(ts2) === 2L)
  }
}
