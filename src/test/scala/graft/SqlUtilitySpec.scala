package graft

import org.apache.spark.sql.functions._

import graft.ops.TxLog

/** SQL utility verbs for the txlog tier (round 14, completing the Delta
  * SQL surface next to SqlDmlSpec's DML): DESCRIBE HISTORY, SHOW
  * PARTITIONS, RESTORE … AS OF, ALTER TABLE SET/UNSET TBLPROPERTIES /
  * ADD CONSTRAINT, and zero-copy CONVERT TO TXLOG. */
class SqlUtilitySpec extends SparkSpec {
  import spark.implicits._

  test("DESCRIBE HISTORY lists one row per commit with its op") {
    val t = tmpDir("sqlhist") + "/t"
    TxLog.append(Seq((1L, "a")).toDF("k", "v"), t)
    TxLog.delete(spark, t, col("k") === 99L) // no-op: no commit
    TxLog.update(spark, t, col("k") === 1L, Map("v" -> lit("b")))
    val h = spark.sql(s"DESCRIBE HISTORY txlog.`$t`")
      .select("version", "op").as[(Long, String)].collect().toSeq
    assert(h === Seq((1L, "append"), (2L, "update")))
  }

  test("SHOW PARTITIONS reports tuples, file counts, and null partitions") {
    val t = tmpDir("sqlparts") + "/t"
    TxLog.setProperties(t, Map("graft.partition.columns" -> "y"))
    TxLog.append(Seq((1L, Some(2020)), (2L, Some(2021)), (3L, None))
      .toDF("k", "y"), t)
    val got = spark.sql(s"SHOW PARTITIONS txlog.`$t`")
      .select("partition", "n_files").as[(String, Long)].collect().toMap
    assert(got === Map("y=2020" -> 1L, "y=2021" -> 1L,
      "y=__HIVE_DEFAULT_PARTITION__" -> 1L))
  }

  test("RESTORE TO VERSION AS OF re-points the snapshot via SQL") {
    val t = tmpDir("sqlrestore") + "/t"
    TxLog.append(Seq((1L, "a")).toDF("k", "v"), t)           // v1
    TxLog.append(Seq((2L, "b")).toDF("k", "v"), t)           // v2
    val v = spark.sql(s"RESTORE TABLE txlog.`$t` TO VERSION AS OF 1")
      .head.getLong(0)
    assert(v === 3L)
    assert(TxLog.read(spark, t).select("k").as[Long].collect().toSeq
      === Seq(1L))
    // the in-between version stays travelable
    assert(TxLog.read(spark, t, asOf = Some(2L)).count() === 2)
  }

  test("RESTORE TO TIMESTAMP AS OF resolves the commit stamp") {
    val t = tmpDir("sqlrestorets") + "/t"
    TxLog.append(Seq((1L, "a")).toDF("k", "v"), t)
    val ts1 = TxLog.commits(t).last.ts
    while (System.currentTimeMillis() <= ts1) Thread.sleep(2)
    TxLog.append(Seq((2L, "b")).toDF("k", "v"), t)
    spark.sql(s"RESTORE txlog.`$t` TO TIMESTAMP AS OF $ts1")
    assert(TxLog.read(spark, t).count() === 1)
  }

  test("ALTER TABLE SET/UNSET TBLPROPERTIES lands property commits") {
    val t = tmpDir("sqlalter") + "/t"
    TxLog.append(Seq((1L, "a")).toDF("k", "v"), t)
    spark.sql(s"""ALTER TABLE txlog.`$t` SET TBLPROPERTIES
                 |(owner = 'etl', 'graft.stats.columns' = 'k')""".stripMargin)
    assert(TxLog.properties(t) ===
      Map("owner" -> "etl", "graft.stats.columns" -> "k"))
    spark.sql(s"ALTER TABLE txlog.`$t` UNSET TBLPROPERTIES (owner)")
    assert(TxLog.properties(t) === Map("graft.stats.columns" -> "k"))
    // the declared stats column indexes the NEXT append
    TxLog.append(Seq((5L, "e")).toDF("k", "v"), t)
    assert(TxLog.commits(t).last.stats.values.exists(_.contains("k")))
  }

  test("ALTER TABLE ADD CONSTRAINT CHECK refuses violating writes") {
    val t = tmpDir("sqlcheck") + "/t"
    TxLog.append(Seq((1L, 10.0)).toDF("k", "amt"), t)
    spark.sql(
      s"ALTER TABLE txlog.`$t` ADD CONSTRAINT pos CHECK (amt >= 0)")
    val e = intercept[IllegalArgumentException] {
      TxLog.append(Seq((2L, -5.0)).toDF("k", "amt"), t)
    }
    assert(e.getMessage.contains("pos"))
    // SQL DML honors it too
    intercept[IllegalArgumentException] {
      spark.sql(s"UPDATE txlog.`$t` SET amt = -1 WHERE k = 1")
    }
  }

  test("CONVERT TO TXLOG is zero-copy and the table gains full DML") {
    val dir = tmpDir("sqlconvert")
    spark.range(0, 100).select(col("id").as("k"),
      (col("id") % 7).as("m")).repartition(4)
      .write.mode("overwrite").parquet(dir)
    val origFiles = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    val v = spark.sql(s"CONVERT TO TXLOG parquet.`$dir`").head.getLong(0)
    assert(v === 1L)
    // hard links under d-conv…, originals untouched in place
    assert(TxLog.activeFiles(dir).forall(_.startsWith("d-conv")))
    assert(new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
      === origFiles)
    assert(TxLog.read(spark, dir).count() === 100)
    // converted table is a first-class txlog table: SQL DELETE works
    spark.sql(s"DELETE FROM txlog.`$dir` WHERE m = 0")
    assert(TxLog.read(spark, dir).count() === 85)
    // and the ORIGINAL files still hold all 100 rows for legacy readers
    assert(spark.read.parquet(origFiles.toSeq.map(f => s"$dir/$f"): _*)
      .count() === 100)
  }

  test("CONVERT TO TXLOG PARTITIONED BY keeps Hive values pruning") {
    val dir = tmpDir("sqlconvpart")
    Seq((1L, 2020), (2L, 2020), (3L, 2021)).toDF("k", "y")
      .write.partitionBy("y").mode("overwrite").parquet(dir)
    spark.sql(s"CONVERT TO TXLOG parquet.`$dir` PARTITIONED BY (y)")
    assert(TxLog.declaredPartitionCols(dir) === Seq("y"))
    assert(TxLog.activeFiles(dir).forall(_.contains("y=")))
    val got = TxLog.read(spark, dir).filter(col("y") === 2020)
      .select("k").as[Long].collect().toSet
    assert(got === Set(1L, 2L))
    assert(spark.sql(s"SHOW PARTITIONS txlog.`$dir`").count() === 2)
  }

  test("ALTER TABLE DROP CONSTRAINT retires the check going forward") {
    val t = tmpDir("sqldropck") + "/t"
    TxLog.append(Seq((1L, 10.0)).toDF("k", "amt"), t)
    spark.sql(
      s"ALTER TABLE txlog.`$t` ADD CONSTRAINT pos CHECK (amt >= 0)")
    intercept[IllegalArgumentException] {
      TxLog.append(Seq((2L, -5.0)).toDF("k", "amt"), t)
    }
    spark.sql(s"ALTER TABLE txlog.`$t` DROP CONSTRAINT pos")
    TxLog.append(Seq((2L, -5.0)).toDF("k", "amt"), t) // now fine
    assert(TxLog.read(spark, t).count() === 2)
    // history keeps it: the constraint was ACTIVE as of its add version
    val addV = TxLog.commits(t).find(_.op == "addConstraint").get.version
    assert(TxLog.constraints(t, asOf = Some(addV)).contains("pos"))
    assert(!TxLog.constraints(t).contains("pos"))
    // dropping a constraint that does not exist refuses with the roster
    intercept[IllegalArgumentException] {
      spark.sql(s"ALTER TABLE txlog.`$t` DROP CONSTRAINT nope")
    }
  }

  test("catalog-name DELETE/UPDATE route through the resolved relation") {
    val t = tmpDir("sqlcatdml") + "/t"
    TxLog.append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"), t)
    val id = java.util.UUID.randomUUID.toString.take(8)
    val tbl = s"catdml_$id"
    spark.sql(s"""CREATE TABLE $tbl (k BIGINT, v STRING)
                 |USING graft.sources.txlog OPTIONS (path '$t')""".stripMargin)
    try {
      spark.sql(s"DELETE FROM $tbl WHERE k = 2")
      spark.sql(s"UPDATE $tbl SET v = upper(v) WHERE k >= 3")
      val got = TxLog.read(spark, t).orderBy("k")
        .as[(Long, String)].collect().toSeq
      assert(got === Seq((1L, "a"), (3L, "C")))
      assert(TxLog.commits(t).map(_.op).takeRight(2)
        === Seq("delete", "update"))
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("DML on a time-travel view refuses") {
    val t = tmpDir("sqlttdml") + "/t"
    TxLog.append(Seq((1L, "a")).toDF("k", "v"), t)
    TxLog.append(Seq((2L, "b")).toDF("k", "v"), t)
    val id = java.util.UUID.randomUUID.toString.take(8)
    val view = s"ttdml_$id"
    spark.sql(s"""CREATE TEMPORARY VIEW $view USING graft.sources.txlog
                 |OPTIONS (path '$t', versionAsOf '1')""".stripMargin)
    val e = intercept[Exception] {
      spark.sql(s"DELETE FROM $view WHERE k = 1")
    }
    assert(e.getMessage.contains("time-travel"), e.getMessage)
    assert(TxLog.read(spark, t).count() === 2, "nothing deleted")
  }

  test("stock DESCRIBE/ALTER statements still delegate") {
    Seq((1, "x")).toDF("a", "b").createOrReplaceTempView("sqlutil_v")
    assert(spark.sql("DESCRIBE sqlutil_v").count() >= 2)
  }

  test("DESCRIBE DETAIL returns the one-row table summary") {
    import spark.implicits._
    val t = tmpDir("sqlutil") + "/t"
    TxLog.setProperties(t, Map("graft.partition.columns" -> "y"))
    TxLog.append(Seq((1L, "a", 10), (2L, "b", 20)).toDF("k", "v", "y"), t)
    val d = spark.sql(s"DESCRIBE DETAIL txlog.`$t`").collect().head
    assert(d.getString(0) === "txlog")
    assert(d.getString(1) === t)
    assert(d.getLong(2) === 2L)            // version
    assert(d.getLong(3) === TxLog.activeFiles(t).size.toLong)
    assert(d.getLong(4) > 0L)              // bytes
    assert(d.getString(5) === "y")         // partition columns
    assert(d.getAs[Long]("earliest_version") === 1L,
      "unexpired table: everything back to v1 is travelable")
    // after checkpoint + expiry the column reports the retention horizon
    TxLog.compact(t)
    TxLog.append(Seq((3L, "c", 30)).toDF("k", "v", "y"), t)
    TxLog.expireLog(t)
    val d2 = spark.sql(s"DESCRIBE DETAIL txlog.`$t`").collect().head
    assert(d2.getAs[Long]("earliest_version") === 2L, d2.toString)
  }

  test("FSCK REPAIR TABLE drops references to missing files") {
    import spark.implicits._
    val t = tmpDir("sqlutil") + "/t"
    TxLog.append(Seq((1L, "a")).toDF("k", "v").coalesce(1), t)
    TxLog.append(Seq((2L, "b")).toDF("k", "v").coalesce(1), t)
    val victim = TxLog.activeFiles(t).last
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$t/$victim"))
    // a read now fails; DRY RUN reports without repairing
    val dry = spark.sql(s"FSCK REPAIR TABLE txlog.`$t` DRY RUN").collect()
    assert(dry.map(_.getString(0)).toSeq === Seq(victim))
    assert(!dry.head.getBoolean(1))
    val fixed = spark.sql(s"FSCK REPAIR TABLE txlog.`$t`").collect()
    assert(fixed.head.getBoolean(1))
    // the table reads again, minus the lost file's rows
    assert(TxLog.read(spark, t).as[(Long, String)].collect().toSet ===
      Set((1L, "a")))
    assert(TxLog.commits(t).last.op === "fsck")
    // idempotent: nothing left to repair
    assert(spark.sql(s"FSCK REPAIR TABLE txlog.`$t`").collect().isEmpty)
  }

  test("RESTORE TIMESTAMP AS OF accepts a date-only string") {
    import spark.implicits._
    val t = tmpDir("sqlutil") + "/t"
    TxLog.append(Seq((1L, "a")).toDF("k", "v"), t)
    TxLog.append(Seq((2L, "b")).toDF("k", "v"), t)
    // all commits happened today, so restoring to tomorrow's midnight
    // resolves the latest version — the point is the date-only string
    // parses instead of NumberFormatException-ing on toLong
    val tomorrow = java.time.LocalDate.now().plusDays(1).toString
    spark.sql(s"RESTORE TABLE txlog.`$t` TO TIMESTAMP AS OF '$tomorrow'")
    assert(TxLog.read(spark, t).count() === 2)
  }

  test("SHOW TBLPROPERTIES lists the folded property map for a path target") {
    import spark.implicits._
    val t = tmpDir("sqlutil") + "/t"
    TxLog.append(Seq((1L, "a")).toDF("k", "v"), t)
    spark.sql(s"ALTER TABLE txlog.`$t` SET TBLPROPERTIES " +
      "('graft.stats.columns' = 'k', 'owner' = 'graft')")
    val props = spark.sql(s"SHOW TBLPROPERTIES txlog.`$t`")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props === Map("graft.stats.columns" -> "k", "owner" -> "graft"))
    // an UNSET disappears from the listing
    spark.sql(s"ALTER TABLE txlog.`$t` UNSET TBLPROPERTIES ('owner')")
    assert(spark.sql(s"SHOW TBLPROPERTIES txlog.`$t`")
      .collect().map(_.getString(0)).toSeq === Seq("graft.stats.columns"))
  }
}
