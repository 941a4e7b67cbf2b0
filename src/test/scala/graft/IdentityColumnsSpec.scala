package graft

import org.apache.spark.sql.functions._

import graft.ops.TxLog

/** Identity columns (Delta's `GENERATED ALWAYS AS IDENTITY`) on the
  * row-tracking substrate: the value READS as start + step * row_id —
  * commit-allocated, stable across rewrites, never reused — so fresh
  * appends store nothing, identities survive UPDATE/OPTIMIZE, deletes
  * retire their values forever, and no two rows can ever mint the same
  * value, including under concurrent writers (the id base is allocated
  * by the winning commit). */
class IdentityColumnsSpec extends SparkSpec {
  import spark.implicits._

  private def mk(start: Long = 1L, step: Long = 1L): String = {
    val t = tmpDir("identity") + "/t"
    TxLog.createTable(t, org.apache.spark.sql.types.StructType.fromDDL(
      "k BIGINT, v STRING"))
    TxLog.declareIdentityColumn(t, "id", start, step)
    t
  }

  test("values allocate densely per commit and continue across appends") {
    val t = mk(start = 100L, step = 10L)
    TxLog.append(Seq((1L, "a"), (2L, "b"), (3L, "c"))
      .toDF("k", "v").coalesce(1).sortWithinPartitions("k"), t)
    TxLog.append(Seq((4L, "d"), (5L, "e"))
      .toDF("k", "v").coalesce(1).sortWithinPartitions("k"), t)
    val rows = TxLog.read(spark, t).select("k", "id")
      .as[(Long, Long)].collect().toMap
    assert(rows === Map(1L -> 100L, 2L -> 110L, 3L -> 120L,
      4L -> 130L, 5L -> 140L))
    assert(TxLog.read(spark, t).columns.toSeq === Seq("k", "v", "id"))
  }

  test("identities survive UPDATE and OPTIMIZE; DELETE retires forever") {
    val t = mk()
    TxLog.append(Seq((1L, "a"), (2L, "b"), (3L, "c"))
      .toDF("k", "v").coalesce(1).sortWithinPartitions("k"), t)
    val before = TxLog.read(spark, t).select("k", "id")
      .as[(Long, Long)].collect().toMap
    TxLog.update(spark, t, col("k") === 2L, Map("v" -> lit("B")))
    assert(TxLog.read(spark, t).select("k", "id").as[(Long, Long)]
      .collect().toMap === before, "UPDATE must not move identities")
    TxLog.optimize(spark, t)
    assert(TxLog.read(spark, t).select("k", "id").as[(Long, Long)]
      .collect().toMap === before, "OPTIMIZE must not move identities")
    TxLog.delete(spark, t, col("k") === 2L)
    TxLog.append(Seq((9L, "z")).toDF("k", "v"), t)
    val after = TxLog.read(spark, t).select("k", "id")
      .as[(Long, Long)].collect().toMap
    assert(after(1L) === before(1L) && after(3L) === before(3L))
    assert(after(9L) > before.values.max,
      "a deleted identity must never be re-minted")
  }

  test("GENERATED ALWAYS: supplying values refuses; all-NULL column drops") {
    val t = mk()
    val e = intercept[IllegalArgumentException] {
      TxLog.append(Seq((1L, "a", 5L)).toDF("k", "v", "id"), t)
    }
    assert(e.getMessage.contains("GENERATED ALWAYS"))
    // the SQL INSERT backfill shape: present but all NULL = not supplied
    TxLog.append(Seq((1L, "a")).toDF("k", "v")
      .withColumn("id", lit(null).cast("long")), t)
    assert(TxLog.read(spark, t).select("k", "id").as[(Long, Long)]
      .collect().toSeq === Seq((1L, 1L)))
    // UPDATE cannot SET an identity column
    val e2 = intercept[IllegalArgumentException] {
      TxLog.update(spark, t, col("k") === 1L, Map("id" -> lit(99L)))
    }
    assert(e2.getMessage.contains("IDENTITY"))
  }

  test("declare refuses on a table with data; step 0 refuses") {
    val t = tmpDir("identity") + "/d"
    TxLog.append(Seq((1L, "a")).toDF("k", "v"), t)
    val e = intercept[IllegalArgumentException](
      TxLog.declareIdentityColumn(t, "id"))
    assert(e.getMessage.contains("before the first write"))
    val t2 = tmpDir("identity") + "/d2"
    TxLog.createTable(t2, org.apache.spark.sql.types.StructType.fromDDL(
      "k BIGINT"))
    assert(intercept[IllegalArgumentException](
      TxLog.declareIdentityColumn(t2, "id", step = 0L))
      .getMessage.contains("non-zero"))
  }

  test("SQL DDL + INSERT: identity is outside the positional arity") {
    val t = tmpDir("identity") + "/sql"
    TxLog.createTable(t, org.apache.spark.sql.types.StructType.fromDDL(
      "k BIGINT, v STRING"))
    spark.sql(s"ALTER TABLE txlog.`$t` ADD COLUMN id BIGINT " +
      "GENERATED ALWAYS AS IDENTITY (START WITH 5 INCREMENT BY 5)")
    assert(TxLog.identityCols(t) === Map("id" -> (5L, 5L)))
    spark.sql(s"INSERT INTO txlog.`$t` VALUES (1, 'a'), (2, 'b')")
    spark.sql(s"INSERT INTO txlog.`$t` (k) VALUES (3)")
    val rows = spark.read.format("graft.sources.txlog").option("path", t)
      .load().orderBy("id")
      .as[(Long, Option[String], Long)].collect().toSeq
    assert(rows.map(_._3) === Seq(5L, 10L, 15L))
    assert(rows.map(_._1).toSet === Set(1L, 2L, 3L))
    assert(rows.find(_._1 == 3L).get._2.isEmpty)
    // time travel derives each era's identities from its own ids
    assert(spark.read.format("graft.sources.txlog").option("path", t)
      .option("versionAsOf", "4").load().select("id")
      .as[Long].collect().toSet === Set(5L, 10L))
  }

  test("MERGE: updated rows keep their identity, inserted rows mint fresh") {
    val t = mk()
    TxLog.append(Seq((1L, "a"), (2L, "b"))
      .toDF("k", "v").coalesce(1).sortWithinPartitions("k"), t)
    val before = TxLog.read(spark, t).select("k", "id")
      .as[(Long, Long)].collect().toMap
    spark.sql(s"""MERGE INTO txlog.`$t` AS tgt
      |USING (SELECT * FROM VALUES (2L, 'B'), (3L, 'c') AS s(k, v)) AS src
      |ON tgt.k = src.k
      |WHEN MATCHED THEN UPDATE SET v = src.v
      |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (src.k, src.v)
      |""".stripMargin)
    val after = TxLog.read(spark, t).select("k", "id")
      .as[(Long, Long)].collect().toMap
    assert(after(1L) === before(1L) && after(2L) === before(2L),
      "matched rows keep their identities")
    assert(after(3L) > before.values.max, "inserts mint fresh identities")
    assert(after.values.toSeq.distinct.size === 3)
  }

  test("concurrent appends can never mint the same identity") {
    val t = mk()
    val latch = new java.util.concurrent.CountDownLatch(1)
    val threads = (0 until 4).map { i =>
      val th = new Thread(() => {
        latch.await()
        TxLog.append(Seq((i.toLong, s"w$i")).toDF("k", "v"), t)
      })
      th.start(); th
    }
    latch.countDown()
    threads.foreach(_.join(120000))
    val ids = TxLog.read(spark, t).select("id").as[Long].collect().toSeq
    assert(ids.size === 4 && ids.distinct.size === 4, s"ids: $ids")
  }

  test("COPY INTO computes absent identities and refuses supplied ones") {
    val t = mk()
    val src = tmpDir("identity_copy_src")
    Seq((1L, "a")).toDF("k", "v").write.mode("overwrite").parquet(src)
    spark.sql(s"COPY INTO txlog.`$t` FROM '$src' FILEFORMAT = PARQUET")
    assert(TxLog.read(spark, t).select("id").as[Long].collect().toSeq ===
      Seq(1L))
    val src2 = tmpDir("identity_copy_src2")
    Seq((2L, "b", 99L)).toDF("k", "v", "id")
      .write.mode("overwrite").parquet(src2)
    val e = intercept[IllegalArgumentException](spark.sql(
      s"COPY INTO txlog.`$t` FROM '$src2' FILEFORMAT = PARQUET FORCE = true"))
    assert(e.getMessage.contains("GENERATED ALWAYS"))
  }

  test("tables without identity columns pay nothing: the scan plan never touches row ids") {
    val t = tmpDir("identity") + "/plain"
    TxLog.append(Seq((1L, "a")).toDF("k", "v"), t)
    val plan = TxLog.read(spark, t).queryExecution.executedPlan.toString
    assert(!plan.contains("_graft_row_id") && !plan.contains("row_index"),
      "the identity overlay must not widen plans for plain tables")
  }

  test("SQL MERGE: updated rows keep identities, inserted rows mint fresh ones, explicit mention refuses") {
    val t = mk()
    TxLog.append(Seq((1L, "a"), (2L, "b"))
      .toDF("k", "v").coalesce(1).sortWithinPartitions("k"), t)
    val before = TxLog.read(spark, t).select("k", "id")
      .as[(Long, Long)].collect().toMap
    Seq((2L, "B"), (3L, "c")).toDF("k", "v")
      .createOrReplaceTempView("ident_merge_src")
    spark.sql(s"""MERGE INTO txlog.`$t` AS t
      |USING ident_merge_src AS s ON t.k = s.k
      |WHEN MATCHED THEN UPDATE SET v = s.v
      |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""".stripMargin)
    val after = TxLog.read(spark, t).select("k", "id")
      .as[(Long, Long)].collect().toMap
    assert(after(1L) === before(1L) && after(2L) === before(2L),
      "matched rows keep their identities through the rewrite")
    assert(after(3L) > before.values.max,
      "inserted rows mint fresh identities")
    // an explicit INSERT of the identity column refuses
    val e = intercept[IllegalArgumentException](spark.sql(
      s"""MERGE INTO txlog.`$t` AS t USING ident_merge_src AS s ON t.k = s.k
         |WHEN NOT MATCHED THEN INSERT (k, v, id)
         |VALUES (s.k, s.v, 999)""".stripMargin))
    assert(e.getMessage.contains("IDENTITY"))
    // MERGE star with a source carrying `id` skips the column silently
    Seq((4L, "d", 999L)).toDF("k", "v", "id")
      .createOrReplaceTempView("ident_merge_src2")
    spark.sql(s"""MERGE INTO txlog.`$t` AS t
      |USING ident_merge_src2 AS s ON t.k = s.k
      |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val ids = TxLog.read(spark, t).select("id").as[Long].collect()
    assert(!ids.contains(999L) && ids.distinct.length === ids.length)
  }

  private def drain(t: String, cp: String, sink: String,
      opts: Map[String, String] = Map.empty): Unit = {
    val r = opts.foldLeft(
      spark.readStream.format("graft.sources.txlog").option("path", t)) {
      case (b, (k, v)) => b.option(k, v)
    }
    r.load()
      .writeStream.format("parquet")
      .option("checkpointLocation", cp).option("path", sink)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start().awaitTermination()
  }

  test("streaming delivers derived identities: fresh appends resolve base + row_index") {
    val t = mk(start = 100L, step = 10L)
    TxLog.append(Seq((1L, "a"), (2L, "b"))
      .toDF("k", "v").coalesce(1).sortWithinPartitions("k"), t)
    val cp = tmpDir("idstream_cp"); val sink = tmpDir("idstream_sink")
    drain(t, cp, sink)
    assert(spark.read.parquet(sink).select("k", "id").as[(Long, Long)]
      .collect().toMap === Map(1L -> 100L, 2L -> 110L))
    // incremental catch-up: only the new commit's rows, ids continue
    TxLog.append(Seq((3L, "c")).toDF("k", "v"), t)
    drain(t, cp, sink)
    assert(spark.read.parquet(sink).select("k", "id").as[(Long, Long)]
      .collect().toMap ===
      Map(1L -> 100L, 2L -> 110L, 3L -> 120L))
  }

  test("streaming with ignoreChanges: a rewrite re-delivers rows with their ORIGINAL identities") {
    val t = mk()
    TxLog.append(Seq((1L, "a"), (2L, "b"))
      .toDF("k", "v").coalesce(1).sortWithinPartitions("k"), t)
    val before = TxLog.read(spark, t).select("k", "id")
      .as[(Long, Long)].collect().toMap
    TxLog.update(spark, t, col("k") === 2L, Map("v" -> lit("B")))
    val sink = tmpDir("idstream_ic_sink")
    drain(t, tmpDir("idstream_ic_cp"), sink,
      Map("ignoreChanges" -> "true"))
    // original file + rewritten file both delivered; every copy of a
    // row carries the SAME identity (materialized ids in the rewrite)
    val got = spark.read.parquet(sink).select("k", "id")
      .as[(Long, Long)].collect()
    assert(got.toSet === before.toSet,
      "identities in re-delivered rewrites must not move")
  }

  test("streaming a PARTITIONED identity table resolves ids per group") {
    val t = tmpDir("identity") + "/part"
    TxLog.createTable(t, org.apache.spark.sql.types.StructType.fromDDL(
      "k BIGINT, v STRING, p STRING"))
    TxLog.setProperties(t, Map("graft.partition.columns" -> "p"))
    TxLog.declareIdentityColumn(t, "id")
    TxLog.append(Seq((1L, "a", "x"), (2L, "b", "y"))
      .toDF("k", "v", "p").coalesce(1).sortWithinPartitions("k"), t)
    val batch = TxLog.read(spark, t).select("k", "id")
      .as[(Long, Long)].collect().toMap
    val sink = tmpDir("idstream_p_sink")
    drain(t, tmpDir("idstream_p_cp"), sink)
    assert(spark.read.parquet(sink).select("k", "id").as[(Long, Long)]
      .collect().toMap === batch,
      "streamed identities must equal the batch read's")
  }
}
