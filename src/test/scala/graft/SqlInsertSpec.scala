package graft

import org.apache.spark.sql.functions._

import graft.ops.TxLog

/** SQL INSERT surface for the txlog tier (GraftSqlParser →
  * InsertIntoTxLogCommand): INSERT INTO (append), an explicit column
  * list with NULL backfill, VALUES inline tables, REPLACE WHERE
  * (Delta's targeted overwrite — one atomic commit), INSERT OVERWRITE,
  * and static/dynamic PARTITION overwrite. Path form only — catalog
  * tables insert through Spark's stock route (TxLogRelation is an
  * InsertableRelation). */
class SqlInsertSpec extends SparkSpec {
  import spark.implicits._

  private def seed(): String = {
    val t = tmpDir("sqlins") + "/t"
    TxLog.append(Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "v", "amt"), t)
    t
  }

  test("INSERT INTO … VALUES appends; types cast to the table schema") {
    val t = seed()
    val v = spark.sql(
      s"INSERT INTO txlog.`$t` VALUES (4, 'd', 40), (5, 'e', 50)")
      .collect().head.getLong(0)
    assert(v === 2L)
    assert(TxLog.commits(t).last.op === "append")
    val rows = TxLog.read(spark, t).as[(Long, String, Double)].collect().toSet
    assert(rows === Set((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0),
      (4L, "d", 40.0), (5L, "e", 50.0)))
    // INT literal 40 landed as the table's DOUBLE — schema can't diverge
    assert(TxLog.read(spark, t).schema("amt").dataType ===
      org.apache.spark.sql.types.DoubleType)
  }

  test("INSERT INTO (cols) maps by name; unnamed columns land NULL") {
    val t = seed()
    spark.sql(s"INSERT INTO txlog.`$t` (amt, k) VALUES (99.0, 9)")
    val row = TxLog.read(spark, t).filter(col("k") === 9)
      .as[(Long, Option[String], Double)].collect().toSeq
    assert(row === Seq((9L, None, 99.0)))
  }

  test("INSERT INTO … SELECT appends a derived frame positionally") {
    val t = seed()
    spark.sql(s"INSERT INTO txlog.`$t` " +
      "SELECT id + 10, concat('x', id), id * 1.5 FROM range(2)")
    val rows = TxLog.read(spark, t).filter(col("k") >= 10)
      .as[(Long, String, Double)].collect().toSet
    assert(rows === Set((10L, "x0", 0.0), (11L, "x1", 1.5)))
  }

  test("positional arity mismatch refuses with the expected column list") {
    val t = seed()
    val e = intercept[IllegalArgumentException](
      spark.sql(s"INSERT INTO txlog.`$t` VALUES (7, 'g')"))
    assert(e.getMessage.contains("3 columns") ||
      e.getMessage.contains("expects 3"))
    val u = intercept[IllegalArgumentException](
      spark.sql(s"INSERT INTO txlog.`$t` (nope) VALUES (1)"))
    assert(u.getMessage.contains("not in the table schema"))
  }

  test("REPLACE WHERE atomically swaps the matching slice in ONE commit") {
    val t = seed()
    val before = TxLog.latestVersion(t).get
    spark.sql(s"INSERT INTO txlog.`$t` REPLACE WHERE k <= 2 " +
      "VALUES (1, 'A', 11.0), (2, 'B', 22.0)")
    assert(TxLog.latestVersion(t).get === before + 1) // one commit
    assert(TxLog.commits(t).last.op === "replaceWhere")
    val rows = TxLog.read(spark, t).as[(Long, String, Double)].collect().toSet
    assert(rows === Set((1L, "A", 11.0), (2L, "B", 22.0), (3L, "c", 30.0)))
  }

  test("REPLACE WHERE refuses incoming rows that violate the predicate") {
    val t = seed()
    val e = intercept[IllegalArgumentException](
      spark.sql(s"INSERT INTO txlog.`$t` REPLACE WHERE k <= 2 " +
        "VALUES (7, 'z', 0.0)"))
    assert(e.getMessage.contains("REPLACE WHERE predicate"))
    // and the refusal left no commit behind
    assert(TxLog.read(spark, t).count() === 3)
  }

  test("REPLACE WHERE touches only files holding matching rows") {
    val t = tmpDir("sqlins") + "/t"
    // two appends: k in {1,2} then k in {10,11}
    TxLog.append(Seq((1L, 1.0), (2L, 2.0)).toDF("k", "amt").coalesce(1), t)
    val lowFiles = TxLog.activeFiles(t).toSet
    TxLog.append(Seq((10L, 10.0), (11L, 11.0)).toDF("k", "amt")
      .coalesce(1), t)
    val highFiles = TxLog.activeFiles(t).toSet -- lowFiles
    spark.sql(s"INSERT INTO txlog.`$t` REPLACE WHERE k >= 10 " +
      "VALUES (10, 100.0)")
    val after = TxLog.activeFiles(t).toSet
    // the k<=2 file survives byte-identical in place; the k>=10 file
    // (the only one holding matching rows) was retired by the rewrite
    assert(lowFiles.subsetOf(after))
    assert(highFiles.intersect(after).isEmpty)
    assert(TxLog.read(spark, t).as[(Long, Double)].collect().toSet ===
      Set((1L, 1.0), (2L, 2.0), (10L, 100.0)))
  }

  test("INSERT OVERWRITE replaces the whole table") {
    val t = seed()
    spark.sql(s"INSERT OVERWRITE txlog.`$t` VALUES (9, 'z', 90.0)")
    assert(TxLog.commits(t).last.op === "overwrite")
    assert(TxLog.read(spark, t).as[(Long, String, Double)].collect().toSet
      === Set((9L, "z", 90.0)))
    // time travel still sees the pre-overwrite contents
    assert(TxLog.read(spark, t, Some(1L)).count() === 3)
  }

  test("INSERT OVERWRITE PARTITION (static) replaces exactly that partition") {
    val t = tmpDir("sqlins") + "/t"
    TxLog.setProperties(t, Map("graft.partition.columns" -> "y"))
    TxLog.append(Seq((1L, 10.0, 1995), (2L, 20.0, 1996), (3L, 30.0, 1996))
      .toDF("k", "amt", "y"), t)
    // static: the query supplies the DATA columns, the constant rides
    spark.sql(s"INSERT OVERWRITE txlog.`$t` PARTITION (y = 1996) " +
      "VALUES (7, 70.0)")
    // fully-static spec routes through replaceWhere (unconditional
    // clear of the named partition), not dynamic overwritePartitions
    assert(TxLog.commits(t).last.op === "replaceWhere")
    val rows = TxLog.read(spark, t).as[(Long, Double, Int)].collect().toSet
    assert(rows === Set((1L, 10.0, 1995), (7L, 70.0, 1996)))
  }

  test("static PARTITION overwrite with a zero-row source clears the partition") {
    val t = tmpDir("sqlins") + "/t"
    TxLog.setProperties(t, Map("graft.partition.columns" -> "y"))
    TxLog.append(Seq((1L, 10.0, 1995), (2L, 20.0, 1996))
      .toDF("k", "amt", "y"), t)
    // Hive/Delta static semantics: the named partition empties even
    // when the query produces no rows (dynamic semantics would leave
    // its files untouched)
    spark.sql(s"INSERT OVERWRITE txlog.`$t` PARTITION (y = 1996) " +
      "SELECT k, amt FROM (SELECT 0L AS k, 0.0 AS amt) WHERE k > 0")
    val rows = TxLog.read(spark, t).as[(Long, Double, Int)].collect().toSet
    assert(rows === Set((1L, 10.0, 1995)))
  }

  test("INSERT OVERWRITE PARTITION (col) is dynamic: only present tuples replaced") {
    val t = tmpDir("sqlins") + "/t"
    TxLog.setProperties(t, Map("graft.partition.columns" -> "y"))
    TxLog.append(Seq((1L, 10.0, 1995), (2L, 20.0, 1996))
      .toDF("k", "amt", "y"), t)
    spark.sql(s"INSERT OVERWRITE txlog.`$t` PARTITION (y) " +
      "SELECT 8, 80.0, 1995")
    val rows = TxLog.read(spark, t).as[(Long, Double, Int)].collect().toSet
    assert(rows === Set((8L, 80.0, 1995), (2L, 20.0, 1996)))
  }

  test("INSERT into a nonexistent table creates it (first-write schema)") {
    val t = tmpDir("sqlins") + "/t"
    spark.sql(s"INSERT INTO txlog.`$t` " +
      "SELECT id AS k, CAST(id * 2.0 AS DOUBLE) AS amt FROM range(3)")
    assert(TxLog.read(spark, t).as[(Long, Double)].collect().toSet ===
      Set((0L, 0.0), (1L, 2.0), (2L, 4.0)))
  }

  test("DELETE keeps rows where the condition evaluates NULL (3VL)") {
    val t = tmpDir("sqlins") + "/t"
    TxLog.append(Seq((1L, Some(1.0)), (2L, None), (3L, Some(9.0)))
      .toDF("k", "amt"), t)
    // amt > 5 is NULL for k=2: SQL deletes only TRUE rows — k=2 stays
    spark.sql(s"DELETE FROM txlog.`$t` WHERE amt > 5")
    assert(TxLog.read(spark, t).select("k").as[Long].collect().sorted ===
      Array(1L, 2L))
  }

  test("stock INSERT INTO a catalog table still routes through Spark") {
    val t = tmpDir("sqlins") + "/t"
    TxLog.append(Seq((1L, "a")).toDF("k", "v"), t)
    val id = java.util.UUID.randomUUID.toString.take(8)
    spark.sql(s"""CREATE TEMPORARY VIEW ins_$id USING graft.sources.txlog
                 |OPTIONS (path '$t')""".stripMargin)
    spark.sql(s"INSERT INTO ins_$id VALUES (2, 'b')")
    assert(TxLog.read(spark, t).as[(Long, String)].collect().toSet ===
      Set((1L, "a"), (2L, "b")))
  }
}
