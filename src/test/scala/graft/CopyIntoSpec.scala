package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.ops.TxLog

/** COPY INTO (Delta's idempotent bulk file ingestion): each source file
  * loads exactly once by identity (path|size|mtime), re-runs are safe
  * no-ops, overwritten sources re-ingest, FORCE reloads. */
class CopyIntoSpec extends SparkSpec {
  import spark.implicits._

  private def writeSrc(dir: String, sub: String, rows: Seq[(Long, String)]): Unit =
    rows.toDF("k", "v").coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/$sub")

  test("loads once; re-run is a no-op (version unchanged, 0 loaded)") {
    val src = tmpDir("copysrc")
    val t = tmpDir("copytbl") + "/t"
    writeSrc(src, "b1", Seq((1L, "a"), (2L, "b")))
    val (v1, n1) = TxLog.copyInto(spark, t, src)
    assert(n1 >= 1 && v1 === 1L)
    assert(TxLog.read(spark, t).as[(Long, String)].collect().toSet ===
      Set((1L, "a"), (2L, "b")))
    val (v2, n2) = TxLog.copyInto(spark, t, src)
    assert((v2, n2) === ((1L, 0L)), "idempotent re-run must not commit")
    assert(TxLog.read(spark, t).count() === 2)
  }

  test("new files in the source load incrementally; ledger survives") {
    val src = tmpDir("copysrc")
    val t = tmpDir("copytbl") + "/t"
    writeSrc(src, "b1", Seq((1L, "a")))
    TxLog.copyInto(spark, t, src)
    writeSrc(src, "b2", Seq((2L, "b"), (3L, "c")))
    val (v, n) = TxLog.copyInto(spark, t, src)
    assert(v === 2L)
    assert(TxLog.read(spark, t).as[(Long, String)].collect().toSet ===
      Set((1L, "a"), (2L, "b"), (3L, "c")))
    assert(TxLog.commits(t).last.op === "copyInto")
    // only b2's files are in the new ledger entry
    assert(TxLog.commits(t).last.copySources.forall(_.contains("/b2/")))
  }

  test("an overwritten source file (new identity) re-ingests; FORCE reloads all") {
    val src = tmpDir("copysrc")
    val t = tmpDir("copytbl") + "/t"
    writeSrc(src, "b1", Seq((1L, "a")))
    TxLog.copyInto(spark, t, src)
    // same path, new contents → new size/mtime → new identity
    writeSrc(src, "b1", Seq((1L, "a2"), (9L, "z")))
    val (_, n) = TxLog.copyInto(spark, t, src)
    assert(n >= 1)
    assert(TxLog.read(spark, t).as[(Long, String)].collect().toSet ===
      Set((1L, "a"), (1L, "a2"), (9L, "z")))
    val before = TxLog.read(spark, t).count()
    val (_, nf) = TxLog.copyInto(spark, t, src, force = true)
    assert(nf >= 1)
    assert(TxLog.read(spark, t).count() === before + 2, "FORCE reloads")
  }

  test("columns match the table schema by name and cast to its types") {
    val src = tmpDir("copysrc")
    val t = tmpDir("copytbl") + "/t"
    TxLog.append(Seq((1L, 1.5)).toDF("k", "amt"), t)
    // source has reordered columns and int amt — by-name + cast aligns
    Seq((2.0, 7L)).toDF("amt", "k").coalesce(1).write.parquet(s"$src/b1")
    TxLog.copyInto(spark, t, src)
    assert(TxLog.read(spark, t).as[(Long, Double)].collect().toSet ===
      Set((1L, 1.5), (7L, 2.0)))
    // a source missing a table column refuses
    Seq(Tuple1(8L)).toDF("k").coalesce(1).write.parquet(s"$src/b2")
    val e = intercept[IllegalArgumentException](TxLog.copyInto(spark, t, src))
    assert(e.getMessage.contains("lack"))
  }

  test("CSV FILEFORMAT with FORMAT_OPTIONS through the SQL verb") {
    val src = tmpDir("copysrc")
    val t = tmpDir("copytbl") + "/t"
    Files.createDirectories(Paths.get(s"$src/b1"))
    Files.write(Paths.get(s"$src/b1/data.csv"),
      "k,v\n1,a\n2,b\n".getBytes)
    val out = spark.sql(s"COPY INTO txlog.`$t` FROM '$src' " +
      "FILEFORMAT = CSV FORMAT_OPTIONS ('header' = 'true', " +
      "'inferSchema' = 'true')").collect().head
    assert(out.getLong(0) === 1L && out.getLong(1) === 1L)
    assert(TxLog.read(spark, t).count() === 2)
    // SQL re-run: 0 files loaded
    val again = spark.sql(s"COPY INTO txlog.`$t` FROM '$src' " +
      "FILEFORMAT = CSV FORMAT_OPTIONS ('header' = 'true', " +
      "'inferSchema' = 'true')").collect().head
    assert(again.getLong(1) === 0L)
  }

  test("PATTERN globs against the source-relative path") {
    val src = tmpDir("copysrc")
    val t = tmpDir("copytbl") + "/t"
    writeSrc(src, "daily", Seq((1L, "a")))
    writeSrc(src, "hourly", Seq((2L, "b")))
    spark.sql(s"COPY INTO txlog.`$t` FROM '$src' PATTERN = 'daily/*.parquet'")
    assert(TxLog.read(spark, t).as[(Long, String)].collect().toSet ===
      Set((1L, "a")), "only the daily/ file matches")
    // widening the pattern later picks up ONLY the not-yet-loaded file
    val out = spark.sql(s"COPY INTO txlog.`$t` FROM '$src' " +
      "PATTERN = '**/*.parquet'").collect().head
    assert(out.getLong(1) === 1L)
    assert(TxLog.read(spark, t).count() === 2)
  }

  test("reserved row-id column in source files refuses") {
    val src = tmpDir("copysrc")
    val t = tmpDir("copytbl") + "/t"
    Seq((1L, "a", 7L)).toDF("k", "v", "_graft_row_id")
      .coalesce(1).write.parquet(s"$src/b1")
    val e = intercept[IllegalArgumentException](TxLog.copyInto(spark, t, src))
    assert(e.getMessage.contains("reserved"))
    // also refused against an existing row-tracking table
    val t2 = tmpDir("copytbl2") + "/t"
    TxLog.append(Seq((1L, "a")).toDF("k", "v"), t2)
    TxLog.setProperties(t2, Map("graft.rowTracking.enabled" -> "true"))
    val e2 = intercept[IllegalArgumentException](TxLog.copyInto(spark, t2, src))
    assert(e2.getMessage.contains("reserved"))
  }

  test("extra source columns refuse without mergeSchema, evolve with it") {
    val src = tmpDir("copysrc")
    val t = tmpDir("copytbl") + "/t"
    TxLog.append(Seq((1L, "a")).toDF("k", "v"), t)
    Seq((2L, "b", 3.5)).toDF("k", "v", "extra")
      .coalesce(1).write.parquet(s"$src/b1")
    val e = intercept[IllegalArgumentException](TxLog.copyInto(spark, t, src))
    assert(e.getMessage.contains("extra") &&
      e.getMessage.contains("mergeSchema"))
    assert(TxLog.read(spark, t).count() === 1, "refusal must not commit")
    // SQL COPY_OPTIONS mergeSchema: extras evolve the schema
    spark.sql(s"COPY INTO txlog.`$t` FROM '$src' " +
      "COPY_OPTIONS ('mergeSchema' = 'true')")
    val rows = TxLog.read(spark, t)
    assert(rows.columns.toSeq === Seq("k", "v", "extra"))
    assert(rows.as[(Long, String, Option[Double])].collect().toSet ===
      Set((1L, "a", None), (2L, "b", Some(3.5))))
  }

  test("SQL verb accepts a catalog table name") {
    val src = tmpDir("copysrc")
    val t = tmpDir("copytbl") + "/t"
    TxLog.append(Seq((1L, "a")).toDF("k", "v"), t)
    writeSrc(src, "b1", Seq((2L, "b")))
    val id = java.util.UUID.randomUUID.toString.take(8)
    spark.sql(s"""CREATE TABLE copyt_$id USING graft.sources.txlog
                 |OPTIONS (path '$t')""".stripMargin)
    try {
      spark.sql(s"COPY INTO copyt_$id FROM '$src'")
      assert(spark.table(s"copyt_$id").count() === 2)
    } finally spark.sql(s"DROP TABLE IF EXISTS copyt_$id")
  }
}
