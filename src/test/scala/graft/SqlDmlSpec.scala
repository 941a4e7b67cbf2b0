package graft

import org.apache.spark.sql.functions._

import graft.ops.TxLog

/** SQL DML surface for the txlog tier (GraftSqlParser → TxLog API): the
  * Delta SQL verbs — MERGE INTO / UPDATE / DELETE / OPTIMIZE / VACUUM —
  * against `` txlog.`path` `` targets, plus the invariant that the SQL
  * path and the API path produce the SAME log (op vocabulary and final
  * contents), since both lower onto one implementation. */
class SqlDmlSpec extends SparkSpec {
  import spark.implicits._

  private def seed(): String = {
    val t = tmpDir("sqldml") + "/t"
    TxLog.append(Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0),
      (4L, "d", 40.0)).toDF("k", "v", "amt"), t)
    t
  }

  test("DELETE FROM txlog.`p` WHERE removes rows and commits one version") {
    val t = seed()
    val out = spark.sql(s"DELETE FROM txlog.`$t` WHERE k >= 3").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(2L))
    assert(TxLog.read(spark, t).select("k").as[Long].collect().sorted
      === Array(1L, 2L))
    assert(TxLog.commits(t).last.op === "delete")
  }

  test("DELETE honors graft.deletionVectors.enabled: data-less DV commit") {
    val t = seed()
    TxLog.setProperties(t, Map("graft.deletionVectors.enabled" -> "true"))
    spark.sql(s"DELETE FROM txlog.`$t` WHERE k = 2")
    val last = TxLog.commits(t).last
    assert(last.op === "dvDelete", "DV-enabled table must not rewrite data")
    assert(last.add.isEmpty && last.dvAdd.nonEmpty)
    assert(TxLog.read(spark, t).select("k").as[Long].collect().sorted
      === Array(1L, 3L, 4L))
  }

  test("UPDATE … SET … WHERE rewrites only matching rows") {
    val t = seed()
    spark.sql(
      s"UPDATE txlog.`$t` SET amt = amt * 2, v = upper(v) WHERE k <= 2")
    val got = TxLog.read(spark, t).orderBy("k")
      .select("v", "amt").as[(String, Double)].collect().toSeq
    assert(got === Seq(("A", 20.0), ("B", 40.0), ("c", 30.0), ("d", 40.0)))
    assert(TxLog.commits(t).last.op === "update")
  }

  test("UPDATE refuses a SET column that is not in the table") {
    val t = seed()
    val e = intercept[IllegalArgumentException](
      spark.sql(s"UPDATE txlog.`$t` SET amount = 0 WHERE k = 1"))
    assert(e.getMessage.contains("not in the table schema"))
    assert(TxLog.commits(t).last.op === "append", "no empty update commit")
  }

  test("MERGE clauses may contain CASE WHEN … THEN … END expressions") {
    val t = seed()
    Seq((2L, 5.0), (9L, 1.0)).toDF("k", "delta")
      .createOrReplaceTempView("mrg_case_src")
    spark.sql(
      s"""MERGE INTO txlog.`$t` AS t USING mrg_case_src AS s ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET
         |  amt = CASE WHEN s.delta > 2 THEN t.amt + s.delta ELSE t.amt END
         |WHEN NOT MATCHED THEN INSERT (k, v, amt)
         |  VALUES (s.k, 'new', CASE WHEN s.delta > 0 THEN s.delta ELSE 0 END)
         |""".stripMargin)
    val got = TxLog.read(spark, t).select("k", "amt")
      .as[(Long, Double)].collect().toMap
    assert(got(2L) === 25.0)  // 20 + 5 via the CASE arm
    assert(got(9L) === 1.0)   // inserted through the CASE value
  }

  test("MERGE SET column names resolve case-insensitively") {
    val t = seed()
    Seq((1L, 111.0)).toDF("k", "namt")
      .createOrReplaceTempView("mrg_ci_src")
    spark.sql(
      s"""MERGE INTO txlog.`$t` AS t USING mrg_ci_src AS s ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET AMT = s.namt""".stripMargin)
    assert(TxLog.read(spark, t).filter(col("k") === 1)
      .select("amt").as[Double].head() === 111.0)
    assert(TxLog.read(spark, t).columns.count(_.equalsIgnoreCase("amt"))
      === 1, "no duplicate column may appear")
  }

  test("UPDATE SET evaluates every expression against the OLD row") {
    val t = tmpDir("sqldml") + "/t"
    TxLog.append(Seq((1L, 100L, 200L), (2L, 7L, 8L)).toDF("k", "a", "b"), t)
    // the classic swap: both assignments must read pre-update values —
    // a sequential fold would yield a = b = 200
    spark.sql(s"UPDATE txlog.`$t` SET a = b, b = a WHERE k = 1")
    assert(TxLog.read(spark, t).as[(Long, Long, Long)].collect().toSet ===
      Set((1L, 200L, 100L), (2L, 7L, 8L)))
    // and the condition itself reads the OLD row even when a SET
    // rewrites the conditioned column
    spark.sql(s"UPDATE txlog.`$t` SET k = 10, a = a + 1 WHERE k = 1")
    assert(TxLog.read(spark, t).as[(Long, Long, Long)].collect().toSet ===
      Set((10L, 201L, 100L), (2L, 7L, 8L)))
  }

  test("SQL DML and API DML produce the same log ops and contents") {
    val tSql = seed(); val tApi = seed()
    spark.sql(s"UPDATE txlog.`$tSql` SET amt = 0 WHERE k = 1")
    spark.sql(s"DELETE FROM txlog.`$tSql` WHERE k = 4")
    TxLog.update(spark, tApi, col("k") === 1, Map("amt" -> lit(0)))
    TxLog.delete(spark, tApi, col("k") === 4)
    assert(TxLog.commits(tSql).map(_.op) === TxLog.commits(tApi).map(_.op))
    val a = TxLog.read(spark, tSql).orderBy("k").collect().toSeq
    val b = TxLog.read(spark, tApi).orderBy("k").collect().toSeq
    assert(a === b)
  }

  test("MERGE INTO with UPDATE SET * / INSERT * upserts by key") {
    val t = seed()
    Seq((2L, "B!", 200.0), (9L, "i", 90.0)).toDF("k", "v", "amt")
      .createOrReplaceTempView("mrg_src")
    val v = spark.sql(
      s"""MERGE INTO txlog.`$t` AS t USING mrg_src AS s ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      .collect().head.getLong(0)
    assert(v === 2L)
    val got = TxLog.read(spark, t).orderBy("k")
      .select("k", "v", "amt").as[(Long, String, Double)].collect().toSeq
    assert(got === Seq((1L, "a", 10.0), (2L, "B!", 200.0), (3L, "c", 30.0),
      (4L, "d", 40.0), (9L, "i", 90.0)))
    assert(TxLog.commits(t).last.op === "merge")
  }

  test("MERGE INTO: conditional update, matched delete, explicit insert") {
    val t = seed()
    Seq((1L, 5.0), (2L, -1.0), (7L, 70.0)).toDF("k", "delta")
      .createOrReplaceTempView("mrg_cdc")
    spark.sql(
      s"""MERGE INTO txlog.`$t` AS t USING mrg_cdc AS s ON t.k = s.k
         |WHEN MATCHED AND s.delta < 0 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET amt = t.amt + s.delta
         |WHEN NOT MATCHED THEN INSERT (k, v, amt) VALUES (s.k, 'new', s.delta)
         |""".stripMargin)
    val got = TxLog.read(spark, t).orderBy("k")
      .select("k", "v", "amt").as[(Long, String, Double)].collect().toSeq
    assert(got === Seq((1L, "a", 15.0), (3L, "c", 30.0), (4L, "d", 40.0),
      (7L, "new", 70.0)))
  }

  test("MERGE INTO USING (subquery) and untouched files stay in place") {
    val t = seed()
    TxLog.append(Seq((100L, "z", 1.0)).toDF("k", "v", "amt"), t) // file 2
    val before = TxLog.activeFiles(t)
    spark.sql(
      s"""MERGE INTO txlog.`$t` AS t
         |USING (SELECT 100 AS k, 'Z' AS v) AS s ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET v = s.v""".stripMargin)
    val after = TxLog.activeFiles(t)
    // only the second file (holding k=100) was rewritten
    assert(before.filter(after.contains).size === before.size - 1)
    assert(TxLog.read(spark, t).filter(col("k") === 100)
      .select("v").as[String].head() === "Z")
  }

  test("mergeInto refuses a target row matched by multiple source rows") {
    val t = seed()
    val dup = Seq((2L, "x"), (2L, "y")).toDF("k", "nv")
    val e = intercept[IllegalStateException] {
      TxLog.mergeInto(spark, t, dup, "t", "s", expr("t.k = s.k"),
        matched = Seq(TxLog.MergeUpdate(None, Map("v" -> col("s.nv")))))
    }
    assert(e.getMessage.contains("matched multiple source rows"))
  }

  test("insert-only MERGE into a table with no matches skips the join scan") {
    val t = seed()
    Seq((8L, "h", 80.0)).toDF("k", "v", "amt")
      .createOrReplaceTempView("mrg_ins")
    spark.sql(
      s"""MERGE INTO txlog.`$t` AS t USING mrg_ins AS s ON t.k = s.k
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val last = TxLog.commits(t).last
    assert(last.remove.isEmpty, "no file held a match — none may be removed")
    assert(TxLog.read(spark, t).count() === 5)
  }

  test("OPTIMIZE compacts small files; WHERE scopes to a partition") {
    val t = tmpDir("sqlopt") + "/t"
    TxLog.append(Seq((1L, 2019)).toDF("k", "y"), t)
    TxLog.setProperties(t, Map("graft.partition.columns" -> "y"))
    (2L to 5L).foreach(k =>
      TxLog.append(Seq((k, 2020)).toDF("k", "y"), t))
    val before = TxLog.activeFiles(t).count(_.contains("y=2020"))
    assert(before === 4)
    spark.sql(s"OPTIMIZE txlog.`$t` WHERE y = 2020")
    val after = TxLog.activeFiles(t).count(_.contains("y=2020"))
    assert(after === 1, "partition-scoped OPTIMIZE packs the partition")
    assert(TxLog.read(spark, t).count() === 5)
  }

  test("OPTIMIZE ZORDER BY re-clusters and contents survive byte-equal") {
    val t = tmpDir("sqlzorder") + "/t"
    val df = spark.range(0, 4000).select(
      (col("id") % 63).as("x"), (col("id") / 63).as("yv"),
      col("id").as("payload")).repartition(8)
    TxLog.append(df, t)
    TxLog.setProperties(t, Map("graft.stats.columns" -> "x,yv"))
    assert(TxLog.activeFiles(t).size === 8)
    spark.sql(s"OPTIMIZE txlog.`$t` ZORDER BY (x, yv)")
    assert(TxLog.commits(t).last.op === "optimize")
    val got = TxLog.read(spark, t)
    assert(got.count() === 4000)
    assert(got.agg(sum("payload")).head.getLong(0)
      === (0L until 4000L).sum)
    // clustered rewrite recorded stats for both dimensions — every output
    // file's x-range must now be narrower than the full domain
    val st = TxLog.commits(t).last.stats
    assert(st.nonEmpty && st.values.forall(_.contains("x")))
  }

  test("VACUUM RETAIN … VERSIONS DRY RUN reports without deleting") {
    val t = seed()
    spark.sql(s"DELETE FROM txlog.`$t` WHERE k = 1") // v2 rewrites file
    val dry = spark.sql(s"VACUUM txlog.`$t` RETAIN 1 VERSIONS DRY RUN")
      .collect().head.getLong(0)
    assert(dry >= 1, "the v1 file is no longer referenced at the horizon")
    // dry run removed nothing: time travel to v1 still reads
    assert(TxLog.read(spark, t, asOf = Some(1L)).count() === 4)
    val real = spark.sql(s"VACUUM txlog.`$t` RETAIN 1 VERSIONS")
      .collect().head.getLong(0)
    assert(real === dry)
  }

  test("SQL MERGE prunes the touched-file search via ON equi-key stats") {
    val t = tmpDir("sqlmrg_prune") + "/t"
    // three key-clustered files with recorded stats: [0,99][100,199][200,299]
    Seq(0L, 100L, 200L).foreach(lo =>
      TxLog.append(spark.range(lo, lo + 100).toDF("k")
        .withColumn("v", lit("old")).coalesce(1), t, statsCols = Seq("k")))
    Seq((150L, "new")).toDF("k", "nv").createOrReplaceTempView("mrg_prune_src")
    spark.sql(
      s"""MERGE INTO txlog.`$t` AS t USING mrg_prune_src AS s ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET v = s.nv""".stripMargin)
    assert(TxLog.lastMergeCandidateCount.get() === 1,
      "key-bounds pruning must narrow the semi-join to the one " +
        s"intersecting file, scanned ${TxLog.lastMergeCandidateCount.get()}")
    val rows = TxLog.read(spark, t).as[(Long, String)].collect().toMap
    assert(rows(150L) === "new" && rows(100L) === "old" && rows.size === 300)
  }

  test("a non-equi ON disables pruning but stays correct (soundness)") {
    val t = tmpDir("sqlmrg_or") + "/t"
    Seq(0L, 100L).foreach(lo =>
      TxLog.append(spark.range(lo, lo + 100).toDF("k")
        .withColumn("v", lit("old")).coalesce(1), t, statsCols = Seq("k")))
    Seq((150L, 5L)).toDF("ka", "kb").createOrReplaceTempView("mrg_or_src")
    // OR of two equalities: no sound single-column bound exists — the
    // extraction must yield NO keys (full candidate set), and both the
    // k=150 and k=5 rows must still be found and updated
    spark.sql(
      s"""MERGE INTO txlog.`$t` AS t USING mrg_or_src AS s
         |ON t.k = s.ka OR t.k = s.kb
         |WHEN MATCHED THEN UPDATE SET v = 'hit'""".stripMargin)
    assert(TxLog.lastMergeCandidateCount.get() === 2,
      "non-equi ON must fall back to the full candidate set")
    val rows = TxLog.read(spark, t).as[(Long, String)].collect().toMap
    assert(rows(150L) === "hit" && rows(5L) === "hit" && rows(6L) === "old")
  }

  test("bloom index refines MERGE candidates when ranges cannot prune") {
    val t = tmpDir("sqlmrg_bloom") + "/t"
    TxLog.setProperties(t, Map("graft.bloom.columns" -> "k"))
    // hash-scattered keys: every file's [min,max] spans the domain, so
    // range bounds keep everything — only the per-file blooms can cut
    Seq(0, 1, 2).foreach(r =>
      TxLog.append(spark.range(0, 300).toDF("id")
        .filter(pmod(col("id"), lit(3)) === r)
        .select((col("id") * 37 % 1000).as("k"))
        .withColumn("v", lit("old")).coalesce(1), t, statsCols = Seq("k")))
    val probe = spark.range(0, 300).select((col("id") * 37 % 1000).as("k"))
      .filter(pmod(col("id"), lit(3)) === 1).limit(1)
      .as[Long].head()
    Seq((probe, "new")).toDF("k", "nv")
      .createOrReplaceTempView("mrg_bloom_src")
    spark.sql(
      s"""MERGE INTO txlog.`$t` AS t USING mrg_bloom_src AS s ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET v = s.nv""".stripMargin)
    assert(TxLog.lastMergeCandidateCount.get() <= 2,
      s"blooms must cut the scattered-key candidates below all 3 files, " +
        s"scanned ${TxLog.lastMergeCandidateCount.get()}")
    assert(TxLog.read(spark, t).filter(col("v") === "new").count() === 1)
  }

  test("MERGE WITH SCHEMA EVOLUTION widens the table; old rows backfill NULL") {
    val t = seed()
    Seq((2L, "B2", 200.0, "eu"), (9L, "i", 90.0, "us"))
      .toDF("k", "v", "amt", "region")
      .createOrReplaceTempView("mrg_evo_src")
    spark.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO txlog.`$t` AS t
         |USING mrg_evo_src AS s ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val got = TxLog.read(spark, t).orderBy("k")
      .select("k", "region").as[(Long, Option[String])].collect().toSeq
    assert(got === Seq((1L, None), (2L, Some("eu")), (3L, None),
      (4L, None), (9L, Some("us"))))
    // the widened schema is the log's schema now: a fresh reader plans
    // with it and the untouched file's rows NULL-backfill
    assert(TxLog.schemaAsOf(t).get.fieldNames.contains("region"))
  }

  test("without WITH SCHEMA EVOLUTION an unknown assigned column refuses") {
    val t = seed()
    Seq((2L, "eu")).toDF("k", "region")
      .createOrReplaceTempView("mrg_noevo_src")
    val e = intercept[IllegalArgumentException] {
      spark.sql(
        s"""MERGE INTO txlog.`$t` AS t USING mrg_noevo_src AS s ON t.k = s.k
           |WHEN MATCHED THEN UPDATE SET region = s.region""".stripMargin)
    }
    assert(e.getMessage.contains("WITH SCHEMA EVOLUTION"), e.getMessage)
  }

  test("non-txlog statements pass through to the stock parser") {
    assert(spark.sql("SELECT 1 + 1 AS two").head.getInt(0) === 2)
    // a DELETE on a non-txlog target is NOT intercepted (stock error)
    intercept[Exception] {
      spark.sql("DELETE FROM some_missing_table WHERE x = 1").collect()
    }
  }

  test("MERGE WHEN NOT MATCHED BY SOURCE THEN DELETE is a full sync") {
    val t = seed()
    Seq((2L, "B2", 22.0), (9L, "i", 9.0)).toDF("k", "v", "amt")
      .createOrReplaceTempView("mrg_sync_src")
    spark.sql(
      s"""MERGE INTO txlog.`$t` AS t USING mrg_sync_src AS s ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *
         |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
    // the table now EQUALS the source — updated, inserted, rest deleted
    val got = TxLog.read(spark, t).orderBy("k")
      .select("k", "v", "amt").as[(Long, String, Double)].collect().toSeq
    assert(got === Seq((2L, "B2", 22.0), (9L, "i", 9.0)))
    assert(TxLog.commits(t).last.op === "merge")
  }

  test("NOT MATCHED BY SOURCE UPDATE with AND condition is selective") {
    val t = seed()
    Seq(2L).toDF("k").createOrReplaceTempView("mrg_nmbs_src")
    spark.sql(
      s"""MERGE INTO txlog.`$t` AS t USING mrg_nmbs_src AS s ON t.k = s.k
         |WHEN NOT MATCHED BY SOURCE AND t.k >= 4 THEN
         |  UPDATE SET v = 'stale', amt = 0.0""".stripMargin)
    val got = TxLog.read(spark, t).orderBy("k")
      .select("k", "v", "amt").as[(Long, String, Double)].collect().toSeq
    // k=2 matched (kept as-is: no WHEN MATCHED clause); k=1,3 unmatched
    // but fail the AND; k=4 unmatched and flagged
    assert(got === Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0),
      (4L, "stale", 0.0)))
  }

  test("NMBS UPDATE adds a NEW column typed from the assignment expression") {
    // Delta's behavior: under WITH SCHEMA EVOLUTION an assigned column
    // absent from BOTH target and source takes its type from the
    // assignment expression (an NMBS UPDATE can only reference the
    // target, so there is no same-named source column to copy from)
    val t = seed()
    Seq(2L).toDF("k").createOrReplaceTempView("mrg_nmbs_evo_src")
    spark.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO txlog.`$t` AS t
         |USING mrg_nmbs_evo_src AS s ON t.k = s.k
         |WHEN NOT MATCHED BY SOURCE AND t.k >= 3 THEN
         |  UPDATE SET stale_amt = t.amt * 2.0""".stripMargin)
    val f = TxLog.schemaAsOf(t).get.fields.find(_.name == "stale_amt")
    assert(f.map(_.dataType) ===
      Some(org.apache.spark.sql.types.DoubleType), s"got $f")
    val got = TxLog.read(spark, t).orderBy("k")
      .select("k", "stale_amt").as[(Long, Option[Double])].collect().toSeq
    // k=2 matched, k=1 unmatched but fails the AND — both NULL-backfill;
    // k=3,4 fire
    assert(got === Seq((1L, None), (2L, None),
      (3L, Some(60.0)), (4L, Some(80.0))))
  }

  test("NMBS rewrite stays bounded to files a clause actually fires on") {
    val dir = tmpDir("sqldml-nmbs") + "/t"
    TxLog.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), dir)
    TxLog.append(Seq((10L, "x"), (11L, "y")).toDF("k", "v"), dir)
    Seq(1L).toDF("k").createOrReplaceTempView("mrg_nmbs_bound_src")
    spark.sql(
      s"""MERGE INTO txlog.`$dir` AS t USING mrg_nmbs_bound_src AS s
         |ON t.k = s.k
         |WHEN NOT MATCHED BY SOURCE AND t.k = 2 THEN DELETE""".stripMargin)
    val last = TxLog.commits(dir).last
    assert(last.op === "merge")
    // file 2 (k=10,11): rows are unmatched but fail the AND — the file
    // must survive untouched (the full-snapshot scan is read-only; only
    // fired-on files rewrite)
    val file2 = TxLog.commits(dir)(1).add
    assert(file2.forall(f => !last.remove.contains(f)),
      s"untouched file rewritten: ${last.remove}")
    assert(TxLog.read(spark, dir).select("k").as[Long].collect().sorted
      === Array(1L, 10L, 11L))
  }

  test("NMBS-only merge keeps multi-matched target rows single") {
    // One file holds BOTH a target row matched by TWO source rows (k=1)
    // and an NMBS-fired row (k=3): the file rewrites, the multi-matched
    // row appears once per match in the internal FULL OUTER join with
    // action "keep" — it must collapse back to ONE row in the rewrite.
    // (No cardinality refusal here: with no WHEN MATCHED clause nothing
    // can update twice — Delta's rule.)
    val dir = tmpDir("sqldml-nmbs-dup") + "/t"
    TxLog.append(Seq((1L, "a"), (3L, "c")).toDF("k", "v"), dir)
    Seq((1L, "s1"), (1L, "s2")).toDF("k", "sv")
      .createOrReplaceTempView("mrg_nmbs_dup_src")
    spark.sql(
      s"""MERGE INTO txlog.`$dir` AS t USING mrg_nmbs_dup_src AS s
         |ON t.k = s.k
         |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = 'stale'"""
        .stripMargin)
    val got = TxLog.read(spark, dir).orderBy("k")
      .select("k", "v").as[(Long, String)].collect().toSeq
    assert(got === Seq((1L, "a"), (3L, "stale")),
      "multi-matched keep rows must not duplicate in an NMBS rewrite")
    // same shape with an INSERT clause riding along (still no WHEN
    // MATCHED): inserts flow, keeps stay single
    val dir2 = tmpDir("sqldml-nmbs-dup2") + "/t"
    TxLog.append(Seq((1L, "a"), (3L, "c")).toDF("k", "v"), dir2)
    Seq((1L, "x"), (1L, "y"), (9L, "i")).toDF("k", "v")
      .createOrReplaceTempView("mrg_nmbs_dup_src2")
    spark.sql(
      s"""MERGE INTO txlog.`$dir2` AS t USING mrg_nmbs_dup_src2 AS s
         |ON t.k = s.k
         |WHEN NOT MATCHED THEN INSERT *
         |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
    val got2 = TxLog.read(spark, dir2).orderBy("k")
      .select("k", "v").as[(Long, String)].collect().toSeq
    assert(got2 === Seq((1L, "a"), (9L, "i")))
  }

  test("NMBS-only merge with nothing fired commits no new version") {
    val t = seed()
    Seq(1L, 2L, 3L, 4L).toDF("k").createOrReplaceTempView("mrg_nmbs_all")
    val before = TxLog.latestVersion(t).get
    spark.sql(
      s"""MERGE INTO txlog.`$t` AS t USING mrg_nmbs_all AS s ON t.k = s.k
         |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
    assert(TxLog.latestVersion(t).get === before,
      "every row matched: no NMBS row, no commit")
  }

  test("row ids survive a NOT MATCHED BY SOURCE update") {
    val t = tmpDir("sqldml-nmbs-rt") + "/t"
    TxLog.enableRowTracking(t)
    TxLog.append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"), t)
    val before = TxLog.readWithRowIds(spark, t)
      .select("k", "_row_id").as[(Long, Long)].collect().toMap
    Seq(2L).toDF("k").createOrReplaceTempView("mrg_nmbs_rt_src")
    spark.sql(
      s"""MERGE INTO txlog.`$t` AS t USING mrg_nmbs_rt_src AS s ON t.k = s.k
         |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = 'z'""".stripMargin)
    val after = TxLog.readWithRowIds(spark, t)
      .select("k", "_row_id").as[(Long, Long)].collect().toMap
    assert(after === before, "NMBS update must not reassign row ids")
    assert(TxLog.read(spark, t).orderBy("k").select("v").as[String]
      .collect().toSeq === Seq("z", "b", "z"))
  }

  test("DELETE and UPDATE conditions support subqueries") {
    val t = seed()
    Seq(1L, 3L).toDF("kk").createOrReplaceTempView("dml_subq_keys")
    // IN-subquery DELETE (Delta's DELETE-with-subquery)
    spark.sql(
      s"DELETE FROM txlog.`$t` WHERE k IN (SELECT kk FROM dml_subq_keys)")
    assert(TxLog.read(spark, t).select("k").as[Long].collect().sorted
      === Array(2L, 4L))
    // scalar-subquery UPDATE condition: only rows above the cut change
    Seq(25.0).toDF("cut").createOrReplaceTempView("dml_subq_cut")
    spark.sql(
      s"""UPDATE txlog.`$t` SET v = 'big'
         |WHERE amt > (SELECT max(cut) FROM dml_subq_cut)""".stripMargin)
    assert(TxLog.read(spark, t).orderBy("k").select("v").as[String]
      .collect().toSeq === Seq("b", "big"))
  }

  test("MERGE USING a (query) source with aggregation") {
    val t = seed()
    Seq((2L, 1.0), (2L, 2.0), (9L, 5.0)).toDF("k", "d")
      .createOrReplaceTempView("mrg_q_src")
    spark.sql(
      s"""MERGE INTO txlog.`$t` AS t
         |USING (SELECT k, SUM(d) AS d FROM mrg_q_src GROUP BY k) AS s
         |ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET amt = t.amt + s.d
         |WHEN NOT MATCHED THEN INSERT (k, v, amt) VALUES (s.k, 'q', s.d)
         |""".stripMargin)
    val got = TxLog.read(spark, t).select("k", "amt")
      .as[(Long, Double)].collect().toMap
    assert(got(2L) === 23.0 && got(9L) === 5.0)
  }

  test("DESCRIBE txlog.`p` lists columns, declarations, and partitions") {
    val t = tmpDir("sqldml-desc") + "/t"
    TxLog.setProperties(t, Map(
      "graft.generated.y" -> "year(ts)",
      "graft.partition.columns" -> "y"))
    TxLog.append(
      Seq((1L, java.sql.Timestamp.valueOf("2020-01-01 00:00:00")))
        .toDF("k", "ts"), t)
    val rows = spark.sql(s"DESCRIBE txlog.`$t`").collect()
      .map(r => (r.getString(0), r.getString(1), Option(r.getString(2))))
    assert(rows.exists(r => r._1 == "k" && r._2 == "bigint"), rows.toSeq)
    assert(rows.exists(r => r._1 == "y" &&
      r._3.exists(_.contains("GENERATED ALWAYS AS (year(ts))"))), rows.toSeq)
    assert(rows.exists(_._1 == "# Partition Information"), rows.toSeq)
    // DESC TABLE form routes the same; stock DESCRIBE still delegates
    assert(spark.sql(s"DESC TABLE txlog.`$t`").collect().nonEmpty)
    spark.range(3).createOrReplaceTempView("desc_passthrough_v")
    assert(spark.sql("DESCRIBE desc_passthrough_v").collect().nonEmpty)
  }

  test("SHOW COLUMNS and ALTER TABLE CLUSTER BY") {
    val t = seed()
    assert(spark.sql(s"SHOW COLUMNS IN txlog.`$t`").collect()
      .map(_.getString(0)).toSeq === Seq("k", "v", "amt"))
    spark.sql(s"ALTER TABLE txlog.`$t` CLUSTER BY (k)")
    assert(TxLog.properties(t).get("graft.cluster.columns").contains("k"))
    // clustered writes now stats-record the declared column
    TxLog.append(Seq((7L, "x", 1.0), (8L, "y", 2.0)).toDF("k", "v", "amt"), t)
    val last = TxLog.commits(t).last
    assert(last.stats.values.exists(_.contains("k")),
      s"clustered column must be stats-recorded: ${last.stats}")
    spark.sql(s"ALTER TABLE txlog.`$t` CLUSTER BY NONE")
    assert(!TxLog.properties(t).contains("graft.cluster.columns"))
    val e = intercept[IllegalArgumentException](
      spark.sql(s"ALTER TABLE txlog.`$t` CLUSTER BY (nope)"))
    assert(e.getMessage.contains("not in the table schema"), e.getMessage)
  }

  test("TRUNCATE TABLE empties the table, keeps schema and time travel") {
    val t = seed()
    val v = spark.sql(s"TRUNCATE TABLE txlog.`$t`").head.getLong(0)
    assert(TxLog.read(spark, t).count() === 0)
    assert(TxLog.read(spark, t).columns.toSeq === Seq("k", "v", "amt"))
    assert(TxLog.read(spark, t, Some(v - 1)).count() === 4,
      "pre-truncate versions must stay time-travelable")
    // refilling after truncate works and sees only the new rows
    TxLog.append(Seq((7L, "z", 1.0)).toDF("k", "v", "amt"), t)
    assert(TxLog.read(spark, t).select("k").as[Long].collect().toSeq
      === Seq(7L))
    // stock TRUNCATE on a non-txlog catalog table keeps its stock route
    spark.sql("DROP TABLE IF EXISTS trunc_stock_t")
    spark.sql("CREATE TABLE trunc_stock_t (x INT) USING parquet")
    spark.sql("INSERT INTO trunc_stock_t VALUES (1), (2)")
    spark.sql("TRUNCATE TABLE trunc_stock_t")
    assert(spark.table("trunc_stock_t").count() === 0)
    spark.sql("DROP TABLE trunc_stock_t")
  }
}
