package graft

import graft.ops.TxLog

/** Column DEFAULT values (Delta's column defaults): `ALTER TABLE …
  * ALTER COLUMN c SET DEFAULT <expr>` makes a SQL INSERT that OMITS the
  * column (column-list form) fill the default instead of NULL. Scope is
  * write-time only — existing rows and positional full-arity inserts
  * are untouched, matching Delta. */
class ColumnDefaultSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(): String = {
    val t = tmpDir("coldef") + "/t"
    TxLog.append(Seq((1L, "a", "legacy")).toDF("k", "v", "tag"), t)
    t
  }

  test("omitted column fills the default; existing rows untouched") {
    val t = fixture()
    spark.sql(s"ALTER TABLE txlog.`$t` ALTER COLUMN tag " +
      "SET DEFAULT 'bronze'")
    spark.sql(s"INSERT INTO txlog.`$t` (k, v) VALUES (2, 'b'), (3, 'c')")
    val rows = TxLog.read(spark, t).as[(Long, String, String)]
      .collect().toSet
    assert(rows === Set((1L, "a", "legacy"), (2L, "b", "bronze"),
      (3L, "c", "bronze")))
    // the default is a versioned property, visible to any reader
    assert(TxLog.properties(t).get("graft.default.tag")
      === Some("'bronze'"))
  }

  test("expressions work; DROP DEFAULT restores the NULL backfill") {
    val t = fixture()
    spark.sql(s"ALTER TABLE txlog.`$t` ALTER COLUMN tag " +
      "SET DEFAULT upper('x') || '1'")
    spark.sql(s"INSERT INTO txlog.`$t` (k, v) VALUES (2, 'b')")
    spark.sql(s"ALTER TABLE txlog.`$t` ALTER COLUMN tag DROP DEFAULT")
    spark.sql(s"INSERT INTO txlog.`$t` (k, v) VALUES (3, 'c')")
    val byK = TxLog.read(spark, t).as[(Long, String, String)]
      .collect().map(r => r._1 -> r._3).toMap
    assert(byK(2L) === "X1")
    assert(byK(3L) === null,
      "after DROP DEFAULT the omit-insert must NULL-backfill again")
    assert(!TxLog.properties(t).contains("graft.default.tag"))
  }

  test("UPDATE SET DEFAULT casts to the declared column type") {
    // a string-literal default on a DATE column: without the cast,
    // CASE/WHEN coercion against the old column value would widen the
    // frame to STRING and commit files whose physical type contradicts
    // the logged schema
    val t = tmpDir("coldef_date") + "/t"
    TxLog.append(Seq((1L, java.sql.Date.valueOf("2020-05-05")))
      .toDF("k", "d"), t)
    spark.sql(s"ALTER TABLE txlog.`$t` ALTER COLUMN d " +
      "SET DEFAULT '2026-01-01'")
    spark.sql(s"UPDATE txlog.`$t` SET d = DEFAULT WHERE k = 1")
    val row = TxLog.read(spark, t).as[(Long, java.sql.Date)]
      .collect().head
    assert(row._2 === java.sql.Date.valueOf("2026-01-01"))
    assert(TxLog.read(spark, t).schema("d").dataType
      === org.apache.spark.sql.types.DateType,
      "the rewrite must keep the logged column type")
  }

  test("positional full-arity inserts never consult defaults") {
    val t = fixture()
    spark.sql(s"ALTER TABLE txlog.`$t` ALTER COLUMN tag " +
      "SET DEFAULT 'bronze'")
    spark.sql(s"INSERT INTO txlog.`$t` VALUES (2, 'b', 'explicit')")
    val byK = TxLog.read(spark, t).as[(Long, String, String)]
      .collect().map(r => r._1 -> r._3).toMap
    assert(byK(2L) === "explicit")
  }

  test("MERGE partial INSERT fills the default for omitted columns") {
    val t = fixture()
    spark.sql(s"ALTER TABLE txlog.`$t` ALTER COLUMN tag " +
      "SET DEFAULT 'bronze'")
    Seq((1L, "a2"), (9L, "i")).toDF("k", "v")
      .createOrReplaceTempView("coldef_src")
    spark.sql(
      s"""MERGE INTO txlog.`$t` AS tgt USING coldef_src AS src
         |ON tgt.k = src.k
         |WHEN MATCHED THEN UPDATE SET v = src.v
         |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (src.k, src.v)
         |""".stripMargin)
    val byK = TxLog.read(spark, t).as[(Long, String, String)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(byK(1L) === (("a2", "legacy")),
      "updates must not touch unassigned columns")
    assert(byK(9L) === (("i", "bronze")),
      "a merge-inserted row omitting the column must fill the default")
  }

  test("UPDATE SET c = DEFAULT assigns the declared default (or NULL)") {
    val t = fixture()
    spark.sql(s"ALTER TABLE txlog.`$t` ALTER COLUMN tag " +
      "SET DEFAULT 'bronze'")
    // mixed-case column name — the lookup resolves the canonical name
    spark.sql(s"UPDATE txlog.`$t` SET TAG = DEFAULT WHERE k = 1")
    assert(TxLog.read(spark, t).as[(Long, String, String)]
      .collect().head._3 === "bronze")
    spark.sql(s"ALTER TABLE txlog.`$t` ALTER COLUMN tag DROP DEFAULT")
    spark.sql(s"UPDATE txlog.`$t` SET tag = DEFAULT WHERE k = 1")
    assert(TxLog.read(spark, t).as[(Long, String, String)]
      .collect().head._3 === null,
      "with no declared default, SET c = DEFAULT assigns NULL")
  }

  test("refusals: unknown column; column-referencing expression") {
    val t = fixture()
    val e1 = intercept[IllegalArgumentException] {
      spark.sql(s"ALTER TABLE txlog.`$t` ALTER COLUMN nope SET DEFAULT 1")
    }
    assert(e1.getMessage.contains("nope"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      spark.sql(s"ALTER TABLE txlog.`$t` ALTER COLUMN tag SET DEFAULT " +
        "concat(v, '!')")
    }
    assert(e2.getMessage.contains("self-contained"), e2.getMessage)
  }
}
