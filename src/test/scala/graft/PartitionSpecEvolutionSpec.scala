package graft

import org.apache.spark.sql.functions._

import graft.ops.TxLog

/** Partition SPEC evolution (Iceberg-style — `TxLog.alterPartitioning` /
  * `ALTER TABLE … SET PARTITIONED BY (…)`): change a live table's
  * partition layout with one metadata commit and zero data rewritten.
  * Old-era files keep their layout and stay readable; new writes land in
  * the new layout; pruning works per era; selective partition
  * replacement refuses over mixed eras until OPTIMIZE migrates. */
class PartitionSpecEvolutionSpec extends SparkSpec {
  import spark.implicits._

  test("flat table becomes partitioned: metadata-only, both eras read") {
    val t = tmpDir("pse_flat") + "/t"
    TxLog.append(Seq((1L, "a", 2020), (2L, "b", 2021)).toDF("k", "v", "y"), t)
    val before = TxLog.activeFiles(t).toSet
    val v = spark.sql(s"ALTER TABLE txlog.`$t` SET PARTITIONED BY (y)")
      .head.getLong(0)
    val c = TxLog.commits(t).last
    assert(c.version === v && c.add.isEmpty && c.remove.isEmpty,
      "partition evolution must be a metadata-only commit")
    assert(TxLog.activeFiles(t).toSet === before, "zero files rewritten")
    TxLog.append(Seq((3L, "c", 2021), (4L, "d", 2022)).toDF("k", "v", "y"), t)
    val newEra = TxLog.activeFiles(t).diff(before.toSeq)
    assert(newEra.nonEmpty && newEra.forall(_.contains("y=")),
      s"post-evolution writes must land Hive-layout: $newEra")
    assert(TxLog.read(spark, t).orderBy("k").select("k", "y")
      .as[(Long, Int)].collect().toSeq ===
      Seq((1L, 2020), (2L, 2021), (3L, 2021), (4L, 2022)))
    // pruning on y: new-era files prune by path; the old flat file is
    // kept (it may hold any y) — correct both ways
    val pruned = TxLog.readPruned(spark, t,
      Map.empty, Map.empty, eqProbes = Map("y" -> Seq(2022)))
    assert(pruned.inputFiles.length < TxLog.activeFiles(t).size)
    assert(pruned.filter(col("y") === 2022).count() === 1)
  }

  test("repartitioning a→b: eras coexist, columns reconstruct per era") {
    val t = tmpDir("pse_ab") + "/t"
    TxLog.setProperties(t, Map("graft.partition.columns" -> "a"))
    TxLog.append(Seq((1L, "x1", 10), (2L, "x2", 20)).toDF("k", "a", "b"), t)
    val eraA = TxLog.activeFiles(t)
    assert(eraA.forall(_.contains("a=")))
    TxLog.alterPartitioning(t, Seq("b"))
    TxLog.append(Seq((3L, "x1", 10), (4L, "x3", 30)).toDF("k", "a", "b"), t)
    val eraB = TxLog.activeFiles(t).diff(eraA)
    assert(eraB.forall(f => f.contains("b=") && !f.contains("a=")), eraB)
    // era-A rows reconstruct a from path + carry b in data; era-B the
    // inverse — the union is seamless
    assert(TxLog.read(spark, t).orderBy("k").select("k", "a", "b")
      .as[(Long, String, Int)].collect().toSeq ===
      Seq((1L, "x1", 10), (2L, "x2", 20), (3L, "x1", 10), (4L, "x3", 30)))
    // pruning on b keeps era-A files (no b in their paths) but cuts
    // era-B to the matching directory
    val pruned = TxLog.readPruned(spark, t,
      Map.empty, Map.empty, eqProbes = Map("b" -> Seq(30)))
    val kept = pruned.inputFiles
    assert(kept.length < TxLog.activeFiles(t).size,
      s"b=30 probe must drop the non-matching era-B directory: $kept")
    assert(pruned.filter(col("b") === 30).count() === 1)
  }

  test("SET PARTITIONED BY () unpartitions; unknown column refuses") {
    val t = tmpDir("pse_un") + "/t"
    TxLog.setProperties(t, Map("graft.partition.columns" -> "p"))
    TxLog.append(Seq((1L, "u"), (2L, "v")).toDF("k", "p"), t)
    spark.sql(s"ALTER TABLE txlog.`$t` SET PARTITIONED BY ()")
    assert(TxLog.declaredPartitionCols(t).isEmpty)
    TxLog.append(Seq((3L, "w")).toDF("k", "p").coalesce(1), t)
    val flat = TxLog.activeFiles(t).filterNot(_.contains("p="))
    assert(flat.size === 1, "post-unpartition write must land flat")
    assert(TxLog.read(spark, t).orderBy("k").select("p").as[String]
      .collect().toSeq === Seq("u", "v", "w"))
    val e = intercept[IllegalArgumentException](
      spark.sql(s"ALTER TABLE txlog.`$t` SET PARTITIONED BY (nope)"))
    assert(e.getMessage.contains("not in the table schema"), e.getMessage)
  }

  test("dynamic partition overwrite refuses over mixed eras; OPTIMIZE migrates") {
    val t = tmpDir("pse_dyn") + "/t"
    TxLog.setProperties(t, Map("graft.partition.columns" -> "a"))
    TxLog.append(Seq((1L, "x1", 10), (2L, "x2", 20)).toDF("k", "a", "b"), t)
    TxLog.alterPartitioning(t, Seq("b"))
    TxLog.append(Seq((3L, "x1", 30)).toDF("k", "a", "b"), t)
    val e = intercept[IllegalArgumentException](
      TxLog.overwritePartitions(
        Seq((9L, "x9", 10)).toDF("k", "a", "b"), t))
    assert(e.getMessage.contains("do not carry the declared partition"),
      e.getMessage)
    // migration: OPTIMIZE rewrites everything into the CURRENT layout,
    // after which selective replacement expresses again
    TxLog.optimize(spark, t, targetFiles = 1)
    assert(TxLog.activeFiles(t).forall(_.contains("b=")),
      TxLog.activeFiles(t))
    TxLog.overwritePartitions(Seq((9L, "x9", 10)).toDF("k", "a", "b"), t)
    assert(TxLog.read(spark, t).orderBy("k").select("k", "b")
      .as[(Long, Int)].collect().toSeq ===
      Seq((2L, 20), (3L, 30), (9L, 10)),
      "b=10 replaced wholesale; other partitions untouched")
  }

  test("migrateLayout rewrites only legacy-era files, then replacement works") {
    val t = tmpDir("pse_mig") + "/t"
    TxLog.setProperties(t, Map("graft.partition.columns" -> "a"))
    TxLog.append(Seq((1L, "x1", 10), (2L, "x2", 20)).toDF("k", "a", "b"), t)
    TxLog.alterPartitioning(t, Seq("b"))
    TxLog.append(Seq((3L, "x1", 30)).toDF("k", "a", "b"), t)
    val newEra = TxLog.activeFiles(t).filter(_.contains("b="))
    assert(TxLog.migrateLayout(spark, t).nonEmpty)
    val after = TxLog.activeFiles(t)
    assert(newEra.forall(after.contains),
      "current-layout files must stay byte-untouched")
    assert(after.forall(_.contains("b=")), after)
    assert(TxLog.read(spark, t).orderBy("k").select("k", "a", "b")
      .as[(Long, String, Int)].collect().toSeq ===
      Seq((1L, "x1", 10), (2L, "x2", 20), (3L, "x1", 30)))
    assert(TxLog.commits(t).last.op === "optimize",
      "migration is data-neutral: streaming readers skip it")
    assert(TxLog.migrateLayout(spark, t).isEmpty, "second call is a no-op")
    // selective replacement now expresses over the uniform layout
    TxLog.overwritePartitions(Seq((9L, "x9", 10)).toDF("k", "a", "b"), t)
    assert(TxLog.read(spark, t).select("k").as[Long].collect().sorted
      === Array(2L, 3L, 9L))
  }

  test("evolution composes with time travel and the streaming source") {
    val t = tmpDir("pse_tt") + "/t"
    TxLog.append(Seq((1L, 2020), (2L, 2021)).toDF("k", "y"), t)   // v1 flat
    val v1 = TxLog.latestVersion(t).get
    TxLog.alterPartitioning(t, Seq("y"))                          // v2
    TxLog.append(Seq((3L, 2022)).toDF("k", "y"), t)               // v3
    // pre-evolution version still reads flat-only
    assert(TxLog.read(spark, t, Some(v1)).count() === 2)
    // streaming delivery spans the eras
    val sink = tmpDir("pse_tt_sink")
    spark.readStream.format("graft.sources.txlog").option("path", t).load()
      .writeStream.format("parquet")
      .option("checkpointLocation", tmpDir("pse_tt_cp")).option("path", sink)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start().awaitTermination()
    assert(spark.read.parquet(sink).select("k").as[Long].collect().sorted
      === Array(1L, 2L, 3L))
  }
}
