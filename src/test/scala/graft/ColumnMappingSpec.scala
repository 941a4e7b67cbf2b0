package graft

import graft.ops.TxLog

/** Column mapping (the Delta `columnMapping.mode = name` analog):
  * RENAME/DROP COLUMN as metadata-only commits over frozen PHYSICAL
  * column names — no data file is ever rewritten, dropped data can
  * never resurrect, and every consumer (reads, time travel, stats
  * skipping, blooms, DML, CDC merge, streaming, clone, SQL) translates
  * logical↔physical at its boundary. */
class ColumnMappingSpec extends SparkSpec {
  import spark.implicits._

  private def table(): String = tmpDir("colmap") + "/t"

  test("rename is metadata-only: same files, new logical name, same data") {
    val t = table()
    TxLog.overwrite(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), t)
    val filesBefore = TxLog.activeFiles(t)
    TxLog.enableColumnMapping(t)
    TxLog.renameColumn(t, "v", "val")
    assert(TxLog.activeFiles(t) === filesBefore) // zero rewrite
    val df = TxLog.read(spark, t)
    assert(df.columns.toSeq === Seq("k", "val"))
    assert(df.as[(Long, String)].collect().toSet === Set((1L, "a"), (2L, "b")))
    // the files themselves keep the frozen PHYSICAL name
    val raw = spark.read.parquet(s"$t/${filesBefore.head}")
    assert(raw.columns.toSeq === Seq("k", "v"))
  }

  test("re-enabling column mapping is an idempotent no-op") {
    val t = table()
    TxLog.overwrite(Seq((1L, "a")).toDF("k", "v"), t)
    TxLog.enableColumnMapping(t)
    val v = TxLog.latestVersion(t).get
    assert(TxLog.enableColumnMapping(t) === v, "re-enable must not commit")
    assert(TxLog.latestVersion(t).get === v)
  }

  test("rename/drop refuse without column mapping; enable names the remedy") {
    val t = table()
    TxLog.overwrite(Seq((1L, "a")).toDF("k", "v"), t)
    val e = intercept[IllegalArgumentException](
      TxLog.renameColumn(t, "v", "w"))
    assert(e.getMessage.contains("enableColumnMapping"))
    assert(intercept[IllegalArgumentException](
      TxLog.dropColumn(t, "v")).getMessage.contains("column mapping"))
  }

  test("drop + re-add same logical name: old data cannot resurrect") {
    val t = table()
    TxLog.overwrite(Seq((1L, "secret"), (2L, "hidden")).toDF("k", "v"), t)
    TxLog.enableColumnMapping(t)
    TxLog.dropColumn(t, "v")
    assert(TxLog.read(spark, t).columns.toSeq === Seq("k"))
    TxLog.addColumn(t, "v", org.apache.spark.sql.types.StringType)
    // same logical name, FRESH physical name — old bytes stay invisible
    val rows = TxLog.read(spark, t).as[(Long, Option[String])].collect().toSet
    assert(rows === Set((1L, None), (2L, None)))
    // and a new write under the re-added column reads back fine
    TxLog.append(Seq((3L, Some("new"))).toDF("k", "v"), t)
    assert(TxLog.read(spark, t).as[(Long, Option[String])].collect().toSet ===
      Set((1L, None), (2L, None), (3L, Some("new"))))
  }

  test("time travel reads each era under its own mapping and schema") {
    val t = table()
    TxLog.overwrite(Seq((1L, "a")).toDF("k", "v"), t) // v1
    TxLog.enableColumnMapping(t)                      // v2
    TxLog.renameColumn(t, "v", "val")                 // v3
    TxLog.append(Seq((2L, "b")).toDF("k", "val"), t)  // v4
    assert(TxLog.read(spark, t, Some(1L)).columns.toSeq === Seq("k", "v"))
    assert(TxLog.read(spark, t, Some(3L)).columns.toSeq === Seq("k", "val"))
    assert(TxLog.read(spark, t, Some(1L)).as[(Long, String)].collect()
      .toSet === Set((1L, "a")))
    assert(TxLog.read(spark, t, Some(4L)).as[(Long, String)].collect()
      .toSet === Set((1L, "a"), (2L, "b")))
  }

  test("data-skipping stats survive a rename: pruning keys on the new logical name") {
    val t = table()
    TxLog.overwrite(Seq((1L, 10.0)).toDF("k", "m"), t, statsCols = Seq("k"))
    TxLog.setProperties(t, Map("graft.stats.columns" -> "k"))
    TxLog.append(Seq((100L, 11.0)).toDF("k", "m"), t)
    TxLog.enableColumnMapping(t)
    TxLog.renameColumn(t, "k", "key")
    TxLog.append(Seq((200L, 12.0)).toDF("key", "m"), t)
    // range pruning via the NEW logical name reaches stats recorded
    // under the frozen physical name in BOTH eras
    val keep = TxLog.filesForRange(t, "key", 90.0, 110.0)
    assert(keep.size === 1, s"expected 1 file, kept $keep")
    assert(TxLog.readRange(spark, t, "key", 90.0, 110.0)
      .select("key").as[Long].collect().toSet === Set(100L))
    // and a post-rename write records stats that prune too
    assert(TxLog.filesForRange(t, "key", 190.0, 210.0).size === 1)
  }

  test("DML and CDC merge speak logical names on a renamed table") {
    val t = table()
    TxLog.overwrite(Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("k", "v", "ver"), t)
    TxLog.enableColumnMapping(t)
    TxLog.renameColumn(t, "v", "val")
    TxLog.update(spark, t, org.apache.spark.sql.functions.col("k") === 1L,
      Map("val" -> org.apache.spark.sql.functions.lit("A")))
    TxLog.merge(spark, t, Seq((2L, "B", 2L), (3L, "c", 1L))
      .toDF("k", "val", "ver"), Seq("k"), "ver")
    TxLog.delete(spark, t, org.apache.spark.sql.functions.col("val") === "c")
    assert(TxLog.read(spark, t).as[(Long, String, Long)].collect().toSet ===
      Set((1L, "A", 1L), (2L, "B", 2L)))
  }

  test("rename/drop refuse on constraint-referenced columns") {
    val t = table()
    TxLog.overwrite(Seq((1L, 5.0)).toDF("k", "score"), t)
    TxLog.enableColumnMapping(t)
    TxLog.addConstraint(spark, t, "pos_score", "score >= 0")
    assert(intercept[IllegalArgumentException](
      TxLog.renameColumn(t, "score", "s")).getMessage.contains("pos_score"))
    assert(intercept[IllegalArgumentException](
      TxLog.dropColumn(t, "score")).getMessage.contains("pos_score"))
    // dropping the constraint unblocks the rename
    TxLog.dropConstraint(t, "pos_score")
    TxLog.renameColumn(t, "score", "s")
    assert(TxLog.read(spark, t).columns.toSeq === Seq("k", "s"))
  }

  test("mergeSchema evolution on a mapped table binds fresh physical names") {
    val t = table()
    TxLog.overwrite(Seq((1L, "a")).toDF("k", "v"), t)
    TxLog.enableColumnMapping(t)
    TxLog.append(Seq((2L, "b", 7.0)).toDF("k", "v", "extra"), t,
      mergeSchema = true)
    val m = TxLog.mappingAsOf(t).get
    assert(m("k") === "k" && m("v") === "v") // frozen at enable
    assert(m("extra").startsWith("col_"))    // fresh, never the logical
    assert(TxLog.read(spark, t).as[(Long, String, Option[Double])]
      .collect().toSet === Set((1L, "a", None), (2L, "b", Some(7.0))))
  }

  test("mapping commits stamp protocol v5") {
    val t = table()
    TxLog.overwrite(Seq((1L, "a")).toDF("k", "v"), t)
    TxLog.enableColumnMapping(t)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val vMax = TxLog.listDir(java.nio.file.Paths.get(t, "_txlog"))
      .filter(_.getFileName.toString.matches("\\d+\\.json"))
      .map(p => mapper.readTree(java.nio.file.Files.readAllBytes(p)))
      .filter(n => n.get("colMap") != null)
      .map(_.get("protocolVersion").asInt()).max
    assert(vMax === 5)
  }

  test("partitioned table: RENAME of the partition column is metadata-only") {
    val t = table()
    TxLog.setProperties(t, Map("graft.partition.columns" -> "p"))
    TxLog.overwrite(Seq((1L, 2019L), (2L, 2020L)).toDF("k", "p"), t)
    val filesBefore = TxLog.activeFiles(t)
    assert(filesBefore.forall(_.contains("p=")), "Hive layout expected")
    TxLog.enableColumnMapping(t)
    TxLog.renameColumn(t, "p", "year") // zero rewrite: paths keep `p=`
    assert(TxLog.activeFiles(t) === filesBefore)
    // the declared property followed the logical rename in the same commit
    assert(TxLog.declaredPartitionCols(t) === Seq("year"))
    val df = TxLog.read(spark, t)
    assert(df.columns.toSeq === Seq("k", "year"))
    assert(df.as[(Long, Long)].collect().toSet === Set((1L, 2019L), (2L, 2020L)))
    // partition pruning keys on the NEW logical name, exact as before
    assert(TxLog.filesForRange(t, "year", 2020.0, 2020.0).size === 1)
    assert(TxLog.readRange(spark, t, "year", 2020.0, 2020.0)
      .select("k").as[Long].collect().toSet === Set(2L))
    // new writes keep staging under the frozen PHYSICAL path segment
    TxLog.append(Seq((3L, 2021L)).toDF("k", "year"), t)
    val newFiles = TxLog.activeFiles(t).diff(filesBefore)
    assert(newFiles.nonEmpty && newFiles.forall(_.contains("p=2021")),
      s"post-rename writes must stage physical-name dirs: $newFiles")
    assert(TxLog.read(spark, t).as[(Long, Long)].collect().toSet ===
      Set((1L, 2019L), (2L, 2020L), (3L, 2021L)))
    // SHOW PARTITIONS reports the LOGICAL name
    val parts = TxLog.partitions(t).map(_._1)
    assert(parts.forall(_.keySet === Set("year")), s"got $parts")
  }

  test("declaring partition columns on an already-mapped table works") {
    val t = table()
    TxLog.overwrite(Seq((1L, "x", 1L)).toDF("k", "v", "d"), t)
    TxLog.enableColumnMapping(t)
    TxLog.renameColumn(t, "d", "day")
    TxLog.setProperties(t, Map("graft.partition.columns" -> "day"))
    // optimize rewrites pre-declaration files into the declared layout
    TxLog.optimize(spark, t)
    TxLog.append(Seq((2L, "y", 2L)).toDF("k", "v", "day"), t)
    assert(TxLog.activeFiles(t).forall(_.contains("d=")),
      "layout must use the frozen physical name")
    assert(TxLog.read(spark, t).as[(Long, String, Long)].collect().toSet ===
      Set((1L, "x", 1L), (2L, "y", 2L)))
    // dynamic partition overwrite matches tuples in the physical namespace
    TxLog.overwritePartitions(Seq((9L, "z", 2L)).toDF("k", "v", "day"), t)
    assert(TxLog.read(spark, t).as[(Long, String, Long)].collect().toSet ===
      Set((1L, "x", 1L), (9L, "z", 2L)))
  }

  test("DML on a mapped partitioned table; DROP of a partition column refuses") {
    val t = table()
    TxLog.setProperties(t, Map("graft.partition.columns" -> "p"))
    TxLog.overwrite(Seq((1L, "a", 1L), (2L, "b", 2L)).toDF("k", "v", "p"), t)
    TxLog.enableColumnMapping(t)
    TxLog.renameColumn(t, "p", "bucket")
    TxLog.renameColumn(t, "v", "val")
    TxLog.update(spark, t, org.apache.spark.sql.functions.col("k") === 1L,
      Map("val" -> org.apache.spark.sql.functions.lit("A")))
    TxLog.delete(spark, t, org.apache.spark.sql.functions.col("k") === 2L)
    assert(TxLog.read(spark, t).as[(Long, String, Long)].collect().toSet ===
      Set((1L, "A", 1L)))
    val e = intercept[IllegalArgumentException](TxLog.dropColumn(t, "bucket"))
    assert(e.getMessage.contains("partition column"))
  }

  test("rename refuses when a generation expression references the column") {
    val t = table()
    TxLog.overwrite(Seq((1L, 10L, 20L)).toDF("k", "base", "twice"), t)
    TxLog.enableColumnMapping(t)
    TxLog.declareGeneratedColumn(spark, t, "twice", "base * 2")
    assert(intercept[IllegalArgumentException](
      TxLog.renameColumn(t, "base", "b")).getMessage.contains("twice"))
    // renaming the GENERATED column itself carries its declaration
    TxLog.renameColumn(t, "twice", "doubled")
    assert(TxLog.generatedCols(t) === Map("doubled" -> "base * 2"))
    TxLog.append(Seq((2L, 20L)).toDF("k", "base"), t) // computes doubled
    assert(TxLog.read(spark, t).select("k", "doubled").as[(Long, Long)]
      .collect().toSet === Set((1L, 20L), (2L, 40L)))
  }

  test("RESTORE to a pre-mapping version retires the mapping explicitly") {
    val t = table()
    TxLog.overwrite(Seq((1L, "a")).toDF("k", "v"), t) // v1
    TxLog.enableColumnMapping(t)                      // v2
    TxLog.renameColumn(t, "v", "val")                 // v3
    TxLog.append(Seq((2L, "b")).toDF("k", "val"), t)  // v4
    TxLog.restore(spark, t, 1L)                       // v5: pre-mapping era
    assert(TxLog.mappingAsOf(t).isEmpty)
    val df = TxLog.read(spark, t)
    assert(df.columns.toSeq === Seq("k", "v"))
    assert(df.as[(Long, String)].collect().toSet === Set((1L, "a")))
  }

  test("shallow clone carries the mapping: renamed columns read correctly") {
    val dir = tmpDir("colmapclone")
    val src = s"$dir/src"; val dst = s"$dir/dst"
    TxLog.overwrite(Seq((1L, "a")).toDF("k", "v"), src)
    TxLog.enableColumnMapping(src)
    TxLog.renameColumn(src, "v", "val")
    TxLog.cloneTable(spark, src, dst)
    val df = TxLog.read(spark, dst)
    assert(df.columns.toSeq === Seq("k", "val"))
    assert(df.as[(Long, String)].collect().toSet === Set((1L, "a")))
  }

  test("SQL surface: TBLPROPERTIES enable, RENAME/DROP/ADD COLUMN, reads via the source") {
    val t = table()
    TxLog.overwrite(Seq((1L, "a", 1.0), (2L, "b", 2.0))
      .toDF("k", "v", "m"), t)
    spark.sql(s"ALTER TABLE txlog.`$t` SET TBLPROPERTIES " +
      "('graft.columnMapping.mode'='name')")
    spark.sql(s"ALTER TABLE txlog.`$t` RENAME COLUMN v TO label")
    spark.sql(s"ALTER TABLE txlog.`$t` DROP COLUMN m")
    spark.sql(s"ALTER TABLE txlog.`$t` ADD COLUMN score DOUBLE")
    val df = spark.read.format("graft.sources.txlog").option("path", t).load()
    assert(df.columns.toSeq === Seq("k", "label", "score"))
    assert(df.as[(Long, String, Option[Double])].collect().toSet ===
      Set((1L, "a", None), (2L, "b", None)))
    // DML through SQL keeps working on the renamed shape
    spark.sql(s"UPDATE txlog.`$t` SET score = 9.5 WHERE label = 'a'")
    assert(spark.read.format("graft.sources.txlog").option("path", t).load()
      .where("score = 9.5").count() === 1L)
  }

  test("streaming source on a mapped PARTITIONED table delivers logical columns") {
    val t = table()
    TxLog.setProperties(t, Map("graft.partition.columns" -> "p"))
    TxLog.append(Seq((1L, "a", 7L)).toDF("k", "v", "p"), t)
    TxLog.enableColumnMapping(t)
    TxLog.renameColumn(t, "p", "part")
    TxLog.append(Seq((2L, "b", 8L)).toDF("k", "v", "part"), t)
    val ck = tmpDir("colmappartck")
    val out = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, Long)]()
    val q = spark.readStream.format("graft.sources.txlog")
      .option("path", t).load()
      .writeStream.option("checkpointLocation", ck)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        assert(df.columns.toSeq === Seq("k", "v", "part"))
        df.collect().foreach(r =>
          out.add((r.getLong(0), r.getString(1), r.getLong(2))))
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    import scala.jdk.CollectionConverters._
    assert(out.iterator().asScala.toSet ===
      Set((1L, "a", 7L), (2L, "b", 8L)))
  }

  test("streaming source on a mapped table delivers logical columns") {
    val t = table()
    TxLog.append(Seq((1L, "a")).toDF("k", "v"), t)
    TxLog.enableColumnMapping(t)
    TxLog.renameColumn(t, "v", "val")
    TxLog.append(Seq((2L, "b")).toDF("k", "val"), t)
    val ck = tmpDir("colmapck")
    val out = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
    val q = spark.readStream.format("graft.sources.txlog")
      .option("path", t).load()
      .writeStream.option("checkpointLocation", ck)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach(r => out.add((r.getLong(0), r.getString(1))))
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    import scala.jdk.CollectionConverters._
    assert(out.iterator().asScala.toSet === Set((1L, "a"), (2L, "b")))
  }
}
