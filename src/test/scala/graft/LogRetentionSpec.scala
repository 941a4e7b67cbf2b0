package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.streaming.Trigger

import graft.ops.TxLog

/** Log retention ([[TxLog.expireLog]] — Delta's logRetentionDuration,
  * floored at the newest full-state checkpoint): expired log files are
  * GONE, so the contract is the same as data [[TxLog.vacuum]] — reads at
  * or above the horizon answer exactly as before (the checkpoint carries
  * the expired range's net effect), below it they refuse with the remedy
  * named, and streams positioned below fail loudly instead of silently
  * skipping. */
class LogRetentionSpec extends SparkSpec {
  import spark.implicits._

  private def logFiles(t: String): Seq[String] =
    scala.jdk.CollectionConverters.IteratorHasAsScala(
      Files.list(Paths.get(t, "_txlog")).iterator()).asScala
      .map(_.getFileName.toString).toSeq

  private def fixture(n: Int = 30): String = {
    val t = tmpDir("logret") + "/t"
    TxLog.setProperties(t, Map("custom.tag" -> "v1"))              // v1
    (1 to n).foreach(i => TxLog.append(
      Seq((i.toLong, s"v$i")).toDF("k", "v").coalesce(1), t))      // v2..
    t
  }

  test("expireLog deletes below the checkpoint floor; retained reads exact") {
    val t = fixture()
    TxLog.compact(t) // full-state checkpoint at the tip
    val h = TxLog.latestVersion(t).get
    TxLog.append(Seq((99L, "tail")).toDF("k", "v"), t) // post-cp commit
    val warmRows = TxLog.read(spark, t).count()
    val warmProps = TxLog.properties(t)
    val warmFiles = TxLog.activeFiles(t)

    assert(TxLog.expireLog(t) === Some(h))
    // the floor is the newest full-state checkpoint, honored exactly:
    // nothing at or below h survives as a commit file, everything after
    // it does
    val names = logFiles(t)
    assert(!names.exists(_.matches(f"${"%020d".format(h)}\\.json")),
      s"horizon commit must be expired: $names")
    assert(names.exists(_.matches(f"${"%020d".format(h + 1)}\\.json")),
      "post-horizon commits must survive")
    // retained reads are byte-identical to pre-expiry
    assert(TxLog.read(spark, t).count() === warmRows)
    assert(TxLog.properties(t) === warmProps)
    assert(TxLog.activeFiles(t) === warmFiles)
    assert(TxLog.read(spark, t, Some(h)).count() === warmRows - 1)
    // below the horizon: pointed refusal naming the remedy
    val e = intercept[IllegalStateException] {
      TxLog.read(spark, t, Some(h - 1)).count()
    }
    assert(e.getMessage.contains("log-retention horizon"), e.getMessage)
    assert(e.getMessage.contains("DEEP CLONE"), e.getMessage)
    // repeat expiry floors at the v7 checkpoint the first run published
    // (it is itself a full-state checkpoint) — monotone, never past tip
    assert(TxLog.expireLog(t).exists(_ >= h))
    assert(TxLog.read(spark, t).count() === warmRows)
    // version numbering continues after expiry (never restarts)
    val tip = TxLog.latestVersion(t).get
    TxLog.append(Seq((500L, "post")).toDF("k", "v"), t)
    assert(TxLog.latestVersion(t).get === tip + 1)
  }

  test("expireLog without a full-state checkpoint is a refused no-op") {
    val t = fixture(5)
    assert(TxLog.expireLog(t) === None, "no checkpoint → nothing to floor")
    assert(TxLog.read(spark, t).count() === 5)
  }

  test("expiry publishes the v7 floor as a protocol commit BEFORE deleting") {
    val t = fixture(12)
    TxLog.compact(t)
    TxLog.expireLog(t)
    // the floor is a surviving data-less `protocol` commit stamped 7 —
    // commits are the one file class every older reader generation
    // parses before answering a metadata fold, and the op is outside
    // their KnownOps, so a pre-v7 reader refuses instead of silently
    // folding the partial history
    val floor = TxLog.commits(t).find(_.op === "protocol")
    assert(floor.exists(_.minReader >= 7), s"got ${TxLog.commits(t).map(c =>
      (c.version, c.op, c.minReader))}")
    assert(floor.get.add.isEmpty && floor.get.remove.isEmpty)
    // and the next commit stamps 7 too (the marker is in force)
    TxLog.append(Seq((100L, "x")).toDF("k", "v"), t)
    assert(TxLog.commits(t).last.minReader === 7)
    // repeat expiry floors at the same checkpoint without another
    // protocol commit (the first one survives above the horizon)
    val nProto = TxLog.commits(t).count(_.op == "protocol")
    TxLog.expireLog(t)
    assert(TxLog.commits(t).count(_.op == "protocol") === nProto)
  }

  test("a stream positioned below the horizon fails loudly; above resumes") {
    val t = tmpDir("logret_stream") + "/t"
    (1 to 6).foreach(i => TxLog.append(
      Seq((i.toLong, s"v$i")).toDF("k", "v").coalesce(1), t))
    val sink = tmpDir("logret_sink"); val cp = tmpDir("logret_cp")
    def drain(cpDir: String, sinkDir: String, startAt: Option[Long]): Unit = {
      val r = spark.readStream.format("graft.sources.txlog")
        .option("path", t)
      startAt.foreach(v => r.option("startingVersion", v.toString))
      r.load().writeStream.format("parquet")
        .option("checkpointLocation", cpDir).option("path", sinkDir)
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    }
    drain(cp, sink, None) // consumes v1..v6, checkpoint at 6
    assert(spark.read.parquet(sink).count() === 6)
    TxLog.compact(t)
    (7 to 9).foreach(i => TxLog.append(
      Seq((i.toLong, s"v$i")).toDF("k", "v").coalesce(1), t))
    TxLog.expireLog(t) // horizon = 6
    // the caught-up stream sits AT the horizon — it resumes fine
    drain(cp, sink, None)
    assert(spark.read.parquet(sink).count() === 9)
    // a NEW stream starting below the horizon refuses with the remedy
    val e = intercept[Exception] {
      drain(tmpDir("logret_cp2"), tmpDir("logret_sink2"), Some(2L))
    }
    assert(e.getMessage.contains("log-retention horizon") ||
      Option(e.getCause).exists(
        _.getMessage.contains("log-retention horizon")), e.getMessage)
  }

  test("auto retention keeps a trickle writer's log bounded forever") {
    // the production steady state: graft.logRetention.auto=true rides the
    // auto-checkpoint cadence, so the log holds ~interval loose commits +
    // the floor checkpoint + the marker no matter how long the trickle
    // runs — and every retained read stays exact
    val t = tmpDir("logret_auto") + "/t"
    TxLog.setProperties(t, Map(
      "graft.checkpoint.interval" -> "5",
      "graft.logRetention.auto" -> "true"))
    (1 to 23).foreach(i => TxLog.append(
      Seq((i.toLong, s"v$i")).toDF("k", "v").coalesce(1), t))
    val names = logFiles(t)
    val loose = names.count(_.matches("""\d{20}\.json"""))
    // ~interval appends + at most one protocol-floor commit per cycle
    assert(loose <= 8, s"loose commits must stay ~interval-bounded: $names")
    // below-horizon checkpoints die stamp-notwithstanding: at most the
    // floor checkpoint plus one written since the last expiry
    assert(names.count(_.endsWith(".checkpoint.json")) <= 2,
      s"checkpoints must not accumulate across expiries: $names")
    assert(TxLog.retentionHorizon(t).exists(_ >= 15L),
      s"horizon must ride the checkpoint cadence: ${TxLog.retentionHorizon(t)}")
    assert(TxLog.read(spark, t).count() === 23)
    assert(TxLog.properties(t)("graft.logRetention.auto") === "true",
      "pre-horizon properties must fold from the checkpoint")
    // and the trickle keeps working after expiry
    TxLog.append(Seq((24L, "v24")).toDF("k", "v"), t)
    assert(TxLog.read(spark, t).count() === 24)
  }

  test("timestamp-bound consumers refuse expired ranges, answer at the horizon") {
    val t = fixture(6)                       // v1 props, v2..v7 appends
    TxLog.compact(t)                         // full-state checkpoint @ v7
    val hts = TxLog.commits(t).find(_.version == 7L).get.ts
    val preHorizonTs = TxLog.commits(t).find(_.version == 3L).get.ts
    TxLog.append(Seq((50L, "tail")).toDF("k", "v"), t)      // v8 survives
    TxLog.expireLog(t)
    assert(TxLog.retentionHorizonTs(t) === Some(hts),
      "the horizon commit's stamp must be recorded before deletion")

    // table_changes: a version range dipping below the horizon refuses
    val e1 = intercept[Exception] {
      spark.sql(s"SELECT * FROM table_changes('$t', 'k', 2)").collect()
    }
    assert(e1.getMessage.contains("log-retention horizon"), e1.getMessage)
    // above the horizon it works (v8 is the tail commit)
    assert(spark.sql(s"SELECT * FROM table_changes('$t', 'k', 8)")
      .count() === 1)
    // a start TIMESTAMP reaching into the expired range refuses — a
    // naive resolve would land on the first surviving commit and
    // silently skip the expired changes
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss")
    val e2 = intercept[Exception] {
      spark.sql(s"SELECT * FROM table_changes('$t', 'k', " +
        s"'${fmt.format(new java.util.Date(preHorizonTs))}')").collect()
    }
    assert(e2.getMessage.contains("expired log range"), e2.getMessage)

    // TIMESTAMP AS OF: at/after the horizon stamp answers (the snapshot
    // IS the horizon version, carried by the checkpoint)…
    assert(TxLog.readAsOfTimestamp(spark, t, hts).count() === 6)
    // …before it, pointed refusal
    val e3 = intercept[IllegalStateException] {
      TxLog.readAsOfTimestamp(spark, t, preHorizonTs).count()
    }
    assert(e3.getMessage.contains("log-retention horizon"), e3.getMessage)
  }

  test("streaming startingTimestamp refuses a cut inside the expired range") {
    val t = fixture(6)
    TxLog.compact(t)
    val preHorizonTs = TxLog.commits(t).find(_.version == 3L).get.ts
    TxLog.append(Seq((50L, "tail")).toDF("k", "v"), t)
    TxLog.expireLog(t)
    val e = intercept[Exception] {
      spark.readStream.format("graft.sources.txlog")
        .option("path", t).option("startingTimestamp", preHorizonTs.toString)
        .load().writeStream.format("noop")
        .option("checkpointLocation", tmpDir("logret_ts_cp"))
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    }
    def msgs(x: Throwable): Seq[String] =
      Iterator.iterate(x)(_.getCause).takeWhile(_ != null).take(8)
        .map(c => Option(c.getMessage).getOrElse("")).toSeq
    assert(msgs(e).exists(_.contains("expired log range")), msgs(e).mkString)
  }

  test("VACUUM composes with an expired log (protect clamps at the horizon)") {
    val t = fixture(6)
    TxLog.compact(t)
    TxLog.append(Seq((50L, "tail")).toDF("k", "v"), t)
    TxLog.expireLog(t)
    // retainVersions far larger than the surviving tail: versions below
    // the retention horizon are unreachable, so the protect walk must
    // clamp there instead of refusing the whole VACUUM
    val doomed = TxLog.vacuum(t, retainVersions = 100, dryRun = true)
    assert(doomed.isEmpty, s"nothing is orphaned here: $doomed")
    assert(TxLog.read(spark, t).count() === 7)
  }

  test("expiry composes with log compaction and advances with new checkpoints") {
    val t = fixture(40)
    TxLog.compactLog(t).get // container + state floor checkpoint
    val h1 = TxLog.expireLog(t).get
    assert(TxLog.read(spark, t).count() === 40)
    // more work, a newer checkpoint → the horizon advances
    (1 to 5).foreach(i => TxLog.append(
      Seq((100L + i, "x")).toDF("k", "v").coalesce(1), t))
    TxLog.compact(t)
    val h2 = TxLog.expireLog(t).get
    assert(h2 > h1, s"horizon must advance: $h1 -> $h2")
    assert(TxLog.read(spark, t).count() === 45)
    assert(TxLog.properties(t)("custom.tag") === "v1",
      "properties set before the FIRST horizon still fold (checkpointed)")
  }
}
