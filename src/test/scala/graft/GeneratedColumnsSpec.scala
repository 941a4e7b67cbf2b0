package graft

import org.apache.spark.sql.functions._

import graft.ops.TxLog

/** Generated columns (Delta's `GENERATED ALWAYS AS (expr)`): declared as
  * `graft.generated.<col>` table properties, computed when omitted,
  * equality-enforced when supplied, consistent through DML rewrites. */
class GeneratedColumnsSpec extends SparkSpec {
  import spark.implicits._

  test("append computes an omitted generated column") {
    val t = tmpDir("gencol") + "/t"
    TxLog.declareGeneratedColumn(spark, t, "k2", "k * 2")
    TxLog.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), t)
    assert(TxLog.read(spark, t).as[(Long, String, Long)].collect().toSet ===
      Set((1L, "a", 2L), (2L, "b", 4L)))
  }

  test("supplied values must match the expression exactly; wrong ones refuse") {
    val t = tmpDir("gencol") + "/t"
    TxLog.declareGeneratedColumn(spark, t, "k2", "k * 2")
    TxLog.append(Seq((1L, 2L)).toDF("k", "k2"), t) // exact: fine
    val e = intercept[IllegalArgumentException](
      TxLog.append(Seq((2L, 5L)).toDF("k", "k2"), t))
    assert(e.getMessage.contains("generated column"))
    assert(TxLog.read(spark, t).count() === 1)
  }

  test("UPDATE changing a base column without the generated one refuses") {
    val t = tmpDir("gencol") + "/t"
    TxLog.declareGeneratedColumn(spark, t, "k2", "k * 2")
    TxLog.append(Seq((1L, "a")).toDF("k", "v"), t)
    val e = intercept[IllegalArgumentException](
      spark.sql(s"UPDATE txlog.`$t` SET k = 10 WHERE k = 1"))
    assert(e.getMessage.contains("generated column"))
    // updating both consistently passes
    spark.sql(s"UPDATE txlog.`$t` SET k = 10, k2 = 20 WHERE k = 1")
    assert(TxLog.read(spark, t).as[(Long, String, Long)].collect().toSet ===
      Set((10L, "a", 20L)))
  }

  test("declare-time validation: violating or missing-column data refuses") {
    val t = tmpDir("gencol") + "/t"
    TxLog.append(Seq((1L, 99L)).toDF("k", "k2"), t) // k2 != k*2
    val e = intercept[IllegalArgumentException](
      TxLog.declareGeneratedColumn(spark, t, "k2", "k * 2"))
    assert(e.getMessage.contains("violate"))
    val t2 = tmpDir("gencol") + "/t"
    TxLog.append(Seq(Tuple1(1L)).toDF("k"), t2) // no k2 column at all
    val e2 = intercept[IllegalArgumentException](
      TxLog.declareGeneratedColumn(spark, t2, "k2", "k * 2"))
    assert(e2.getMessage.contains("backfill"))
  }

  test("generated partition column: SQL INSERT omits it, layout + pruning work") {
    val t = tmpDir("gencol") + "/t"
    TxLog.setProperties(t, Map("graft.partition.columns" -> "y"))
    TxLog.declareGeneratedColumn(spark, t, "y",
      "CAST(year(to_date(d)) AS INT)")
    TxLog.append(Seq((1L, "1995-03-01"), (2L, "1996-07-15"))
      .toDF("k", "d"), t)
    // positional SQL INSERT supplies base columns only — y is computed
    spark.sql(s"INSERT INTO txlog.`$t` VALUES (3, '1996-12-31')")
    val rows = TxLog.read(spark, t).as[(Long, String, Int)].collect().toSet
    assert(rows === Set((1L, "1995-03-01", 1995), (2L, "1996-07-15", 1996),
      (3L, "1996-12-31", 1996)))
    // Hive layout under the GENERATED value → partition pruning applies
    // (through the pushed-filter relation path, like TxLogPartitionSpec)
    assert(TxLog.activeFiles(t).forall(f => f.contains("y=")))
    val view = s"gen_${System.nanoTime()}"
    spark.sql(s"""CREATE OR REPLACE TEMP VIEW $view
                 |USING graft.sources.txlog OPTIONS (path '$t')""".stripMargin)
    val pruned = spark.sql(s"SELECT k FROM $view WHERE y = 1995")
    assert(pruned.as[Long].collect().toSeq === Seq(1L))
    assert(pruned.inputFiles.length < TxLog.activeFiles(t).size,
      "WHERE on the generated partition column must prune files")
  }

  test("REPLACE WHERE computes generated columns before the survivors union") {
    val t = tmpDir("gencol") + "/t"
    TxLog.declareGeneratedColumn(spark, t, "k2", "k * 2")
    TxLog.append(Seq((1L, "a"), (2L, "b"), (10L, "z")).toDF("k", "v"), t)
    // SQL INSERT's aligned frame omits k2; the union against surviving
    // rows (which carry k2) must compute it, not fail to resolve
    spark.sql(s"INSERT INTO txlog.`$t` REPLACE WHERE k <= 2 " +
      "VALUES (1, 'A'), (2, 'B')")
    assert(TxLog.read(spark, t).as[(Long, String, Long)].collect().toSet ===
      Set((1L, "A", 2L), (2L, "B", 4L), (10L, "z", 20L)))
  }

  test("SQL: ADD COLUMN … GENERATED ALWAYS AS declares and enforces") {
    val t = tmpDir("gencol") + "/t"
    spark.sql(s"""CREATE TABLE gencol_ddl (k BIGINT, v STRING)
                 |USING graft.sources.txlog OPTIONS (path '$t')""".stripMargin)
    try {
      spark.sql(s"ALTER TABLE txlog.`$t` ADD COLUMN k2 BIGINT " +
        "GENERATED ALWAYS AS (k * 2)")
      spark.sql(s"INSERT INTO txlog.`$t` VALUES (3, 'c')")
      assert(TxLog.read(spark, t).as[(Long, String, Long)].collect().toSet
        === Set((3L, "c", 6L)))
      // declaring over NON-matching existing data refuses (no backfill)
      val t2 = tmpDir("gencol") + "/t"
      TxLog.append(Seq((1L, "a")).toDF("k", "v"), t2)
      val e = intercept[IllegalArgumentException](
        spark.sql(s"ALTER TABLE txlog.`$t2` ADD COLUMN k2 BIGINT " +
          "GENERATED ALWAYS AS (k * 2)"))
      assert(e.getMessage.contains("backfill") ||
        e.getMessage.contains("violate"))
    } finally spark.sql("DROP TABLE IF EXISTS gencol_ddl")
  }

  test("CDC applyChanges: delete markers' null generated values pass") {
    val t = tmpDir("gencol") + "/t"
    TxLog.declareGeneratedColumn(spark, t, "k2", "k * 2")
    TxLog.append(Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("k", "v", "ver"), t)
    // full-schema feed: upsert with correct k2, delete with NULL k2
    TxLog.applyChanges(spark, t,
      Seq((1L, Some("a2"), Some(2L), 2L, "upsert"),
        (2L, None, None, 2L, "delete"))
        .toDF("k", "v", "k2", "ver", "op"),
      Seq("k"), "ver", "op")
    assert(TxLog.read(spark, t).select("k", "v", "k2")
      .as[(Long, String, Long)].collect().toSet === Set((1L, "a2", 2L)))
    // a wrong generated value on an UPSERT still refuses
    val e = intercept[IllegalArgumentException](
      TxLog.applyChanges(spark, t,
        Seq((1L, Some("x"), Some(99L), 3L, "upsert"))
          .toDF("k", "v", "k2", "ver", "op"), Seq("k"), "ver", "op"))
    assert(e.getMessage.contains("generated column"))
  }

  test("COPY INTO computes the generated column for raw source files") {
    val t = tmpDir("gencol") + "/t"
    val src = tmpDir("gencolsrc")
    TxLog.declareGeneratedColumn(spark, t, "k2", "k * 2")
    TxLog.append(Seq((1L, "a")).toDF("k", "v"), t)
    Seq((2L, "b")).toDF("k", "v").coalesce(1).write.parquet(s"$src/b1")
    TxLog.copyInto(spark, t, src)
    assert(TxLog.read(spark, t).as[(Long, String, Long)].collect().toSet ===
      Set((1L, "a", 2L), (2L, "b", 4L)))
  }
}
