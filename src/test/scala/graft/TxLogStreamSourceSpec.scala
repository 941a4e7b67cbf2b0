package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}

import graft.ops.TxLog

/** The TxLog table as a native streaming SOURCE (Delta streaming-source
  * analog): version offsets, incremental add-file delivery, checkpointed
  * exactly-once resume, data-neutral OPTIMIZE skip, and the
  * ignoreChanges/ignoreDeletes refusal contract. */
class TxLogStreamSourceSpec extends SparkSpec {
  import spark.implicits._

  private def table(): String = tmpDir("txstream") + "/t"

  private def drain(t: String, cp: String, sink: String,
      opts: Map[String, String] = Map.empty): Unit = {
    val r = opts.foldLeft(
      spark.readStream.format("graft.sources.txlog").option("path", t)) {
      case (b, (k, v)) => b.option(k, v)
    }
    r.load()
      .writeStream.format("parquet")
      .option("checkpointLocation", cp).option("path", sink)
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
  }

  test("version offsets: appends deliver incrementally, resume is exactly-once, OPTIMIZE delivers nothing") {
    val t = table()
    TxLog.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), t)      // v1
    TxLog.append(Seq((3L, "c")).toDF("k", "v"), t)                 // v2
    val cp = tmpDir("txstream_cp"); val sink = tmpDir("txstream_sink")
    drain(t, cp, sink)
    assert(spark.read.parquet(sink).as[(Long, String)].collect().toSet ===
      Set((1L, "a"), (2L, "b"), (3L, "c")))
    // new data + a compaction land between runs
    TxLog.append(Seq((4L, "d")).toDF("k", "v"), t)                 // v3
    TxLog.optimize(spark, t, targetFiles = 1)                      // v4
    drain(t, cp, sink)
    // ONLY v3's rows arrive: v1/v2 are behind the checkpointed offset,
    // and the optimize rewrite is data-neutral — re-delivering its adds
    // would duplicate every row downstream
    assert(spark.read.parquet(sink).as[(Long, String)].collect()
      .groupBy(identity).forall(_._2.length == 1), "duplicate delivery")
    assert(spark.read.parquet(sink).count() === 4)
    // idle resume: nothing new → nothing delivered
    drain(t, cp, sink)
    assert(spark.read.parquet(sink).count() === 4)
  }

  test("startingVersion skips history; stream sees only future commits") {
    val t = table()
    TxLog.append(Seq((1L, "old")).toDF("k", "v"), t)               // v1
    val head = TxLog.latestVersion(t).get
    TxLog.append(Seq((2L, "new")).toDF("k", "v"), t)               // v2
    val sink = tmpDir("txstream_sv_sink")
    drain(t, tmpDir("txstream_sv_cp"), sink,
      Map("startingVersion" -> head.toString))
    assert(spark.read.parquet(sink).as[(Long, String)].collect().toSet ===
      Set((2L, "new")))
  }

  test("startingTimestamp delivers commits stamped at or after it") {
    val t = table()
    TxLog.append(Seq((1L, "old")).toDF("k", "v"), t)               // v1
    val cut = TxLog.commits(t).last.ts + 1
    TxLog.append(Seq((2L, "new")).toDF("k", "v"), t)               // v2
    TxLog.append(Seq((3L, "newer")).toDF("k", "v"), t)             // v3
    val sink = tmpDir("txstream_st_sink")
    drain(t, tmpDir("txstream_st_cp"), sink,
      Map("startingTimestamp" -> cut.toString))
    assert(spark.read.parquet(sink).as[(Long, String)].collect().toSet ===
      Set((2L, "new"), (3L, "newer")),
      "v1 predates the cut; v2/v3 are stamped at or after it")
    // a timestamp beyond the last commit starts at the tip: only future
    // commits deliver
    val late = TxLog.commits(t).last.ts + 1000
    val sink2 = tmpDir("txstream_st_sink2")
    drain(t, tmpDir("txstream_st_cp2"), sink2,
      Map("startingTimestamp" -> late.toString))
    val rows2 = scala.util.Try(spark.read.parquet(sink2).count()).getOrElse(0L)
    assert(rows2 === 0L, s"tip start must deliver nothing, got $rows2 rows")
    // and passing both starting options refuses
    val e = intercept[Exception] {
      drain(t, tmpDir("txstream_st_cp3"), tmpDir("txstream_st_sink3"),
        Map("startingTimestamp" -> cut.toString, "startingVersion" -> "0"))
    }
    assert(e.getMessage.contains("not both"), e.getMessage)
  }

  test("startingTimestamp accepts Delta's timestamp-string form") {
    val t = table()
    TxLog.append(Seq((1L, "old")).toDF("k", "v"), t)               // v1
    val cut = TxLog.commits(t).last.ts + 1
    TxLog.append(Seq((2L, "new")).toDF("k", "v"), t)               // v2
    // 'yyyy-MM-dd HH:mm:ss' — same parse as TIMESTAMP AS OF. Commit
    // stamps are strictly monotone, so formatting the cut to whole
    // seconds needs a cut safely between v1 and v2: use a string one
    // second past v1's stamp and verify it delivers v2 iff v2 is at or
    // after it (both commits land within the same run, so just assert
    // the parse path works and delivers a suffix, not an error).
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss")
    val asStr = fmt.format(new java.util.Date(cut))
    val sink = tmpDir("txstream_sts_sink")
    drain(t, tmpDir("txstream_sts_cp"), sink,
      Map("startingTimestamp" -> asStr))
    val got = scala.util.Try(
      spark.read.parquet(sink).as[(Long, String)].collect().toSet)
      .getOrElse(Set.empty[(Long, String)])
    // string parse truncates to seconds, so the cut may round below v1's
    // stamp — the suffix property is what matters: delivered commits are
    // a contiguous tail, never an error, never a middle slice
    assert(Set(Set((2L, "new")), Set((1L, "old"), (2L, "new")))
      .contains(got), s"unexpected delivery: $got")
    // garbage neither millis nor timestamp → pointed refusal
    val e = intercept[Exception] {
      drain(t, tmpDir("txstream_sts_cp2"), tmpDir("txstream_sts_sink2"),
        Map("startingTimestamp" -> "not-a-time"))
    }
    assert(e.getMessage.contains("neither epoch millis"), e.getMessage)
  }

  test("data-changing commits refuse without ignoreChanges, re-deliver with it") {
    val t = table()
    TxLog.append(spark.range(0, 10).toDF("k").coalesce(1), t)      // v1
    TxLog.delete(spark, t, col("k") === 5L)                        // v2: rewrite
    val e = intercept[StreamingQueryException] {
      drain(t, tmpDir("txstream_ic_cp1"), tmpDir("txstream_ic_s1"))
    }
    assert(e.getMessage.contains("ignoreChanges"), e.getMessage)
    // with the opt-in, the rewritten file is delivered alongside v1's —
    // the documented duplicate-tolerant contract
    val sink = tmpDir("txstream_ic_s2")
    drain(t, tmpDir("txstream_ic_cp2"), sink,
      Map("ignoreChanges" -> "true"))
    val got = spark.read.parquet(sink).as[Long].collect()
    assert(got.count(_ == 3L) === 2, "v1 file + v2 rewrite both delivered")
    assert(!got.contains(5L) || got.count(_ == 5L) == 1,
      "deleted row may appear only from the pre-rewrite delivery")
  }

  test("streaming sink: batchId-stamped commits, exactly-once across resume, complete mode overwrites") {
    val src = tmpDir("txsink_src")
    Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(src)
    val t = tmpDir("txsink") + "/t"
    val cp = tmpDir("txsink_cp")
    def drainTo(mode: String): Unit = {
      spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
        .writeStream.format("graft.sources.txlog")
        .option("checkpointLocation", cp).option("path", t)
        .outputMode(mode).trigger(Trigger.AvailableNow())
        .start().awaitTermination()
    }
    drainTo("append")
    assert(TxLog.read(spark, t).as[(Long, String)].collect().toSet ===
      Set((1L, "a"), (2L, "b")))
    // the commit carries its micro-batch id — the replay guard's key
    assert(TxLog.commits(t).exists(_.batchId >= 0L))
    // resume with no new data: no new version (idempotent, not re-append)
    val v = TxLog.latestVersion(t)
    drainTo("append")
    assert(TxLog.latestVersion(t) === v)
    // new file → exactly the delta lands as the next version
    Seq((3L, "c")).toDF("k", "v").coalesce(1).write.mode("append").parquet(src)
    drainTo("append")
    assert(TxLog.read(spark, t).as[(Long, String)].collect().toSet ===
      Set((1L, "a"), (2L, "b"), (3L, "c")))
    // complete mode: per-trigger OVERWRITE, old snapshot stays travelable
    val t2 = tmpDir("txsink2") + "/t"
    spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
      .groupBy("v").agg(count(lit(1)).alias("n"))
      .writeStream.format("graft.sources.txlog")
      .option("checkpointLocation", tmpDir("txsink2_cp")).option("path", t2)
      .outputMode("complete").trigger(Trigger.AvailableNow())
      .start().awaitTermination()
    assert(TxLog.read(spark, t2).as[(String, Long)].collect().toSet ===
      Set(("a", 1L), ("b", 1L), ("c", 1L)))
    assert(TxLog.commits(t2).last.op === "overwrite")
  }

  test("update-mode sink merges each micro-batch on mergeKeys; later batches win per key") {
    val src = tmpDir("txupd_src")
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").coalesce(1)
      .write.mode("append").parquet(src)
    val t = tmpDir("txupd") + "/t"; val cp = tmpDir("txupd_cp")
    def drainUpd(): Unit =
      spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
        .writeStream.format("graft.sources.txlog")
        .option("checkpointLocation", cp).option("path", t)
        .option("mergeKeys", "k")
        .outputMode("update").trigger(Trigger.AvailableNow())
        .start().awaitTermination()
    drainUpd()
    assert(TxLog.read(spark, t).select("k", "v").as[(Long, String)]
      .collect().toSet === Set((1L, "a"), (2L, "b")))
    // next batch updates k=1 and inserts k=3; k=2 survives untouched —
    // the synthesized _merge_version (= batch id) makes the later batch
    // win without the stream carrying a version column
    Seq((1L, "A"), (3L, "c")).toDF("k", "v").coalesce(1)
      .write.mode("append").parquet(src)
    drainUpd()
    assert(TxLog.read(spark, t).select("k", "v").as[(Long, String)]
      .collect().toSet === Set((1L, "A"), (2L, "b"), (3L, "c")))
    assert(TxLog.commits(t).last.op === "merge")
    // replay guard holds for the merge path too
    val v = TxLog.latestVersion(t)
    drainUpd()
    assert(TxLog.latestVersion(t) === v)
    // Update mode without keys is a configuration error, caught at start
    val e = intercept[Exception] {
      spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
        .writeStream.format("graft.sources.txlog")
        .option("checkpointLocation", tmpDir("txupd_cp2"))
        .option("path", tmpDir("txupd2") + "/t")
        .outputMode("update").trigger(Trigger.AvailableNow())
        .start().awaitTermination()
    }
    assert(e.getMessage.contains("mergeKeys"), e.getMessage)
  }

  test("txlog-to-txlog pipe: source streams into sink, incrementally, exactly-once") {
    val up = table(); val down = table()
    TxLog.append(Seq((1L, "a")).toDF("k", "v"), up)                 // v1
    val cp = tmpDir("txpipe_cp")
    def pipe(): Unit =
      spark.readStream.format("graft.sources.txlog").option("path", up).load()
        .writeStream.format("graft.sources.txlog")
        .option("checkpointLocation", cp).option("path", down)
        .outputMode("append").trigger(Trigger.AvailableNow())
        .start().awaitTermination()
    pipe()
    assert(TxLog.read(spark, down).as[(Long, String)].collect().toSet ===
      Set((1L, "a")))
    TxLog.append(Seq((2L, "b")).toDF("k", "v"), up)                 // v2
    pipe()
    // only the upstream delta flowed; nothing re-delivered downstream
    assert(TxLog.read(spark, down).as[(Long, String)].collect().toSet ===
      Set((1L, "a"), (2L, "b")))
    assert(TxLog.read(spark, down).count() === 2)
  }

  test("maxVersionsPerTrigger: AvailableNow drains in bounded version steps") {
    val t = table()
    TxLog.append(Seq((1L, "a")).toDF("k", "v"), t)                 // v1
    TxLog.append(Seq((2L, "b")).toDF("k", "v"), t)                 // v2
    TxLog.append(Seq((3L, "c")).toDF("k", "v"), t)                 // v3
    val cp = tmpDir("txstream_rl_cp"); val sink = tmpDir("txstream_rl_sink")
    drain(t, cp, sink, Map("maxVersionsPerTrigger" -> "1"))
    // one micro-batch per version: the checkpoint's offset log shows the
    // drain happened in three bounded steps, not one giant batch
    val batches = new java.io.File(s"$cp/offsets").listFiles()
      .count(f => f.getName.forall(_.isDigit))
    assert(batches === 3, s"expected 3 rate-limited micro-batches, got $batches")
    assert(spark.read.parquet(sink).as[(Long, String)].collect().toSet ===
      Set((1L, "a"), (2L, "b"), (3L, "c")))
    // resume respects the committed offset: nothing re-delivered
    TxLog.append(Seq((4L, "d")).toDF("k", "v"), t)                 // v4
    TxLog.append(Seq((5L, "e")).toDF("k", "v"), t)                 // v5
    drain(t, cp, sink, Map("maxVersionsPerTrigger" -> "2"))
    assert(spark.read.parquet(sink).count() === 5)
  }

  test("maxFilesPerTrigger: cumulative add-file budget; oversized versions still admitted alone") {
    val t = table()
    TxLog.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v").repartition(2), t) // v1: 2 files
    TxLog.append(Seq((3L, "c")).toDF("k", "v").coalesce(1), t)               // v2: 1 file
    TxLog.append(Seq((4L, "d"), (5L, "e"), (6L, "f")).toDF("k", "v")
      .repartition(3), t)                                                    // v3: 3 files
    val cp = tmpDir("txstream_fl_cp"); val sink = tmpDir("txstream_fl_sink")
    drain(t, cp, sink, Map("maxFilesPerTrigger" -> "3"))
    // batch 1 admits v1+v2 (2+1 files = the budget); v3 would overflow it
    // and lands alone in batch 2 — 3 files > budget is fine because the
    // version is atomic and oversized versions must not stall the stream
    val batches = new java.io.File(s"$cp/offsets").listFiles()
      .count(f => f.getName.forall(_.isDigit))
    assert(batches === 2, s"expected 2 file-budgeted micro-batches, got $batches")
    assert(spark.read.parquet(sink).as[(Long, String)].collect().toSet ===
      Set((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e"), (6L, "f")))
    // a single version over budget: admitted alone, not skipped
    TxLog.append(Seq((7L, "g"), (8L, "h"), (9L, "i"), (10L, "j"))
      .toDF("k", "v").repartition(4), t)                                     // v4: 4 files
    drain(t, cp, sink, Map("maxFilesPerTrigger" -> "3"))
    assert(spark.read.parquet(sink).count() === 10)
  }

  test("maxBytesPerTrigger: cumulative add-byte budget from commit-carried sizes") {
    val t = table()
    TxLog.append(Seq((1L, "a")).toDF("k", "v").coalesce(1), t)     // v1
    TxLog.append(Seq((2L, "b")).toDF("k", "v").coalesce(1), t)     // v2
    TxLog.append(Seq((3L, "c")).toDF("k", "v").coalesce(1), t)     // v3
    val cs = TxLog.commits(t)
    // commits record byte sizes for every add at write time — the
    // consumer budgets in bytes without re-listing the filesystem
    assert(cs.forall(c => c.add.forall(c.sizes.contains)))
    val perV = cs.map(_.sizes.values.sum)
    // budget exactly v1+v2: batch 1 admits both, v3 overflows → batch 2
    val cp = tmpDir("txstream_by_cp"); val sink = tmpDir("txstream_by_sink")
    drain(t, cp, sink,
      Map("maxBytesPerTrigger" -> (perV(0) + perV(1)).toString))
    val batches = new java.io.File(s"$cp/offsets").listFiles()
      .count(f => f.getName.forall(_.isDigit))
    assert(batches === 2, s"expected 2 byte-budgeted micro-batches, got $batches")
    assert(spark.read.parquet(sink).as[(Long, String)].collect().toSet ===
      Set((1L, "a"), (2L, "b"), (3L, "c")))
    // a 1-byte budget: every version is oversized, each admitted alone
    val cp2 = tmpDir("txstream_by_cp2"); val sink2 = tmpDir("txstream_by_sink2")
    drain(t, cp2, sink2, Map("maxBytesPerTrigger" -> "1"))
    val batches2 = new java.io.File(s"$cp2/offsets").listFiles()
      .count(f => f.getName.forall(_.isDigit))
    assert(batches2 === 3, s"expected 3 single-version micro-batches, got $batches2")
    assert(spark.read.parquet(sink2).count() === 3)
  }

  test("schema drift fails the batch; restart resumes from the checkpoint under the evolved schema") {
    val t = table()
    TxLog.append(Seq((1L, "a")).toDF("k", "v"), t)                 // v1
    val narrow = TxLog.schemaAsOf(t).get
    TxLog.append(Seq((2L, "b", 9.5)).toDF("k", "v", "w"), t,
      mergeSchema = true)                                          // v2: +w
    val cp = tmpDir("txstream_ev_cp"); val sink = tmpDir("txstream_ev_sink")
    // a stream pinned to the pre-evolution schema (the schema a
    // long-running stream fixed at ITS start) must fail at v2 — reading
    // v2's files under the narrow schema would silently drop column w —
    // but only AFTER delivering v1, whose offset commits first
    val e = intercept[StreamingQueryException] {
      spark.readStream.format("graft.sources.txlog")
        .schema(narrow).option("path", t)
        .option("maxVersionsPerTrigger", "1").load()
        .writeStream.format("parquet")
        .option("checkpointLocation", cp).option("path", sink)
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    }
    assert(e.getMessage.contains("Restart the stream"), e.getMessage)
    assert(spark.read.parquet(sink).count() === 1, "v1 delivered before the drift")
    // restart with the same checkpoint, schema re-resolved from the log:
    // resumes AT v2 (offset survived), delivers it under the evolved schema
    drain(t, cp, sink)
    val got = spark.read.option("mergeSchema", "true").parquet(sink)
      .select("k", "v", "w").as[(Long, String, Option[Double])]
      .collect().toSet
    assert(got === Set((1L, "a", None), (2L, "b", Some(9.5))))
  }

  test("streaming from genesis over a DDL-created table: the schema-only create commit is a no-op, not a refusal") {
    val t = table()
    TxLog.createTable(t, Seq((0L, "")).toDF("k", "v").schema)      // v1: empty
    TxLog.append(Seq((1L, "a")).toDF("k", "v"), t)                 // v2
    val sink = tmpDir("txstream_ddl_sink")
    drain(t, tmpDir("txstream_ddl_cp"), sink)
    assert(spark.read.parquet(sink).as[(Long, String)].collect().toSet ===
      Set((1L, "a")))
  }

  test("dvDelete commits refuse without ignoreDeletes, skip with it") {
    val t = table()
    TxLog.append(spark.range(0, 10).toDF("k").coalesce(1), t)      // v1
    TxLog.deleteVectors(spark, t, col("k") < 3)                    // v2: DV only
    val e = intercept[StreamingQueryException] {
      drain(t, tmpDir("txstream_dv_cp1"), tmpDir("txstream_dv_s1"))
    }
    assert(e.getMessage.contains("ignoreDeletes"), e.getMessage)
    val sink = tmpDir("txstream_dv_s2")
    drain(t, tmpDir("txstream_dv_cp2"), sink,
      Map("ignoreDeletes" -> "true"))
    // the DV commit adds no files: delivery is v1's raw file, unfiltered
    assert(spark.read.parquet(sink).as[Long].collect().toSet ===
      (0L until 10L).toSet)
  }

  test("a stream below the vacuum horizon fails loudly; from the horizon it resumes correctly") {
    val t = table()
    TxLog.append(Seq((1L, "a")).toDF("k", "v"), t)                 // v1
    TxLog.append(Seq((2L, "b")).toDF("k", "v"), t)                 // v2
    TxLog.optimize(spark, t, targetFiles = 1)                      // v3 rewrite
    TxLog.vacuum(t, retainVersions = 1)                            // v1/v2 files swept
    // genesis stream positioned below the horizon: the swept files CAN'T
    // be delivered — the source must refuse with a pointed error, never
    // silently skip (that would quietly lose v1/v2's rows downstream)
    val e = intercept[StreamingQueryException] {
      drain(t, tmpDir("txvac_cp1"), tmpDir("txvac_s1"))
    }
    assert(e.getMessage.contains("vacuum"), e.getMessage)
    assert(e.getMessage.contains("startingVersion"), e.getMessage)
    // positioned at the horizon (the optimize), the stream resumes
    // correctly: only post-horizon commits deliver
    TxLog.append(Seq((3L, "c")).toDF("k", "v"), t)                 // v4
    val sink = tmpDir("txvac_s2")
    drain(t, tmpDir("txvac_cp2"), sink, Map("startingVersion" -> "3"))
    assert(spark.read.parquet(sink).as[(Long, String)].collect().toSet ===
      Set((3L, "c")))
  }

  test("changeFeed composes with startingVersion and maxVersionsPerTrigger") {
    val t = table()
    TxLog.append(Seq((1L, "a", 1L)).toDF("k", "v", "ver"), t)      // v1
    TxLog.append(Seq((2L, "b", 1L)).toDF("k", "v", "ver"), t)      // v2
    TxLog.merge(spark, t, Seq((1L, "A", 2L)).toDF("k", "v", "ver"),
      Seq("k"), "ver")                                             // v3
    val sink = tmpDir("txcdfsv_sink")
    // consumer joins mid-history: v1/v2 skipped, only v3's delta streams,
    // one version per micro-batch (the admission cap applies unchanged)
    drain(t, tmpDir("txcdfsv_cp"), sink, Map(
      "changeFeed" -> "true", "keyCols" -> "k",
      "startingVersion" -> "2", "maxVersionsPerTrigger" -> "1"))
    assert(spark.read.parquet(sink)
      .select("k", "v", "ver", "change_type", "_commit_version")
      .as[(Long, String, Long, String, Long)].collect().toSet ===
      Set((1L, "A", 2L, "update", 3L)))
  }

  test("changeFeed=true streams keyed change rows across MERGE, dvDelete, and resume") {
    val t = table()
    TxLog.append(Seq((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L))
      .toDF("k", "v", "ver"), t)                                   // v1
    TxLog.merge(spark, t, Seq((2L, "B", 2L), (4L, "d", 2L))
      .toDF("k", "v", "ver"), Seq("k"), "ver")                     // v2
    val cp = tmpDir("txcdf_cp"); val sink = tmpDir("txcdf_sink")
    def drainCdf(): Unit = drain(t, cp, sink,
      Map("changeFeed" -> "true", "keyCols" -> "k"))
    drainCdf()
    def got() = spark.read.parquet(sink)
      .select("k", "v", "ver", "change_type", "_commit_version")
      .as[(Long, String, Long, String, Long)].collect().toSet
    // v1 bootstraps as inserts; v2's merge streams as its keyed delta —
    // the untouched key 1 (and the unchanged content of key 3, whose
    // file WAS rewritten) emit nothing
    assert(got() === Set(
      (1L, "a", 1L, "insert", 1L), (2L, "b", 1L, "insert", 1L),
      (3L, "c", 1L, "insert", 1L),
      (2L, "B", 2L, "update", 2L), (4L, "d", 2L, "insert", 2L)))
    // resume past the checkpoint: a dvDelete streams as delete rows (no
    // ignoreDeletes escape hatch), an OPTIMIZE streams nothing
    TxLog.deleteVectors(spark, t, col("k") === 3L)                 // v3
    TxLog.optimize(spark, t, targetFiles = 1)                      // v4
    drainCdf()
    assert(got() === Set(
      (1L, "a", 1L, "insert", 1L), (2L, "b", 1L, "insert", 1L),
      (3L, "c", 1L, "insert", 1L),
      (2L, "B", 2L, "update", 2L), (4L, "d", 2L, "insert", 2L),
      (3L, "c", 1L, "delete", 3L)))
    // idle resume delivers nothing
    drainCdf()
    assert(spark.read.parquet(sink).count() === 6)
  }

  test("cdfPreImages=true streams update pre- AND post-image rows") {
    val t = table()
    TxLog.append(Seq((1L, "a", 1L), (2L, "b", 1L))
      .toDF("k", "v", "ver"), t)                                   // v1
    TxLog.merge(spark, t, Seq((2L, "B", 2L), (3L, "c", 2L))
      .toDF("k", "v", "ver"), Seq("k"), "ver")                     // v2
    val cp = tmpDir("txcdfpre_cp"); val sink = tmpDir("txcdfpre_sink")
    drain(t, cp, sink, Map("changeFeed" -> "true", "keyCols" -> "k",
      "cdfPreImages" -> "true"))
    val got = spark.read.parquet(sink)
      .select("k", "v", "ver", "change_type", "_commit_version")
      .as[(Long, String, Long, String, Long)].collect().toSet
    // the merged key streams BOTH its images; inserts are unchanged
    assert(got === Set(
      (1L, "a", 1L, "insert", 1L), (2L, "b", 1L, "insert", 1L),
      (2L, "b", 1L, "update_preimage", 2L),
      (2L, "B", 2L, "update_postimage", 2L),
      (3L, "c", 2L, "insert", 2L)))
  }
}
