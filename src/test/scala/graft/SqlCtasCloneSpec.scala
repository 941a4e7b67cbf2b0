package graft

import org.apache.spark.sql.functions._

import graft.ops.TxLog

/** `CREATE [OR REPLACE] TABLE txlog.`p` … AS <query>` and
  * `… SHALLOW|DEEP CLONE src [VERSION AS OF n]` — the SQL DDL layer over
  * [[TxLog.append]]/[[TxLog.overwrite]]/[[TxLog.cloneTable]]/
  * [[TxLog.cloneTableDeep]] (VERDICT r14 item 1). */
class SqlCtasCloneSpec extends SparkSpec {
  import spark.implicits._

  private def seedSrc(): String = {
    val t = tmpDir("sqlcc") + "/src"
    TxLog.append(Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "v", "amt"),
      t)                                                              // v1
    TxLog.append(Seq((3L, "c", 30.0)).toDF("k", "v", "amt"), t)       // v2
    t
  }

  test("CTAS creates schema+contents in one statement") {
    val t = tmpDir("sqlcc") + "/ctas"
    spark.sql(s"CREATE TABLE txlog.`$t` AS " +
      "SELECT id AS k, CAST(id * 2.0 AS DOUBLE) AS amt FROM range(4)")
    assert(TxLog.read(spark, t).as[(Long, Double)].collect().toSet ===
      Set((0L, 0.0), (1L, 2.0), (2L, 4.0), (3L, 6.0)))
    // plain CREATE refuses an existing table; IF NOT EXISTS no-ops
    val e = intercept[IllegalArgumentException](
      spark.sql(s"CREATE TABLE txlog.`$t` AS SELECT 1 AS x"))
    assert(e.getMessage.contains("already exists"))
    val v = TxLog.latestVersion(t)
    spark.sql(s"CREATE TABLE IF NOT EXISTS txlog.`$t` AS SELECT 1 AS x")
    assert(TxLog.latestVersion(t) === v)
  }

  test("CTAS REPLACE may partition by a column the outgoing table lacks") {
    val t = tmpDir("sqlcc") + "/repart"
    spark.sql(s"CREATE TABLE txlog.`$t` AS SELECT id AS k FROM range(3)")
    // the new definition's partition column 'p' is not in the OLD
    // schema — validation must run against the incoming query's schema
    spark.sql(s"CREATE OR REPLACE TABLE txlog.`$t` PARTITIONED BY (p) AS " +
      "SELECT id AS k, CAST(id % 2 AS INT) AS p FROM range(4)")
    assert(TxLog.activeFiles(t).forall(_.contains("p=")),
      TxLog.activeFiles(t))
    assert(TxLog.read(spark, t).count() === 4)
    // and a typo'd partition column still refuses
    val e = intercept[IllegalArgumentException](
      spark.sql(s"CREATE OR REPLACE TABLE txlog.`$t` PARTITIONED BY (nope)" +
        " AS SELECT id AS k FROM range(2)"))
    assert(e.getMessage.contains("not in the table schema"), e.getMessage)
  }

  test("CTAS PARTITIONED BY declares the layout before the write") {
    val t = tmpDir("sqlcc") + "/part"
    spark.sql(s"CREATE TABLE txlog.`$t` PARTITIONED BY (y) " +
      "TBLPROPERTIES ('owner' = 'me') AS " +
      "SELECT id AS k, CAST(id % 2 AS INT) AS y FROM range(6)")
    assert(TxLog.properties(t).get("graft.partition.columns")
      .contains("y"))
    assert(TxLog.properties(t).get("owner").contains("me"))
    // files landed under Hive-style partition paths → pruning is live
    assert(TxLog.activeFiles(t).forall(_.contains("y=")))
    assert(TxLog.read(spark, t).count() === 6)
  }

  test("CREATE OR REPLACE TABLE AS swaps contents, schema and properties") {
    val t = tmpDir("sqlcc") + "/repl"
    spark.sql(s"CREATE TABLE txlog.`$t` TBLPROPERTIES ('a' = '1') AS " +
      "SELECT id AS k FROM range(3)")
    spark.sql(s"CREATE OR REPLACE TABLE txlog.`$t` AS " +
      "SELECT 'x' AS name, CAST(1.5 AS DOUBLE) AS score")
    assert(TxLog.read(spark, t).as[(String, Double)].collect().toSeq ===
      Seq(("x", 1.5)))
    assert(TxLog.properties(t).get("a").isEmpty,
      "REPLACE resets undeclared properties")
    // prior versions stay time-travelable
    assert(TxLog.read(spark, t, Some(2L)).columns.toSeq === Seq("k"))
  }

  test("SQL SHALLOW CLONE commits the same log content as the API clone") {
    val src = seedSrc()
    val a = tmpDir("sqlcc") + "/api"
    val b = tmpDir("sqlcc") + "/sql"
    TxLog.cloneTable(spark, src, a)
    spark.sql(s"CREATE TABLE txlog.`$b` SHALLOW CLONE txlog.`$src`")
    // identical modulo the wall-clock commit stamp: same referenced
    // files, stats, schema, protocol — the SQL verb is pure lowering
    val ca = TxLog.commits(a).map(_.copy(ts = 0L))
    val cb = TxLog.commits(b).map(_.copy(ts = 0L))
    assert(ca === cb)
    assert(TxLog.read(spark, b).count() === 3)
  }

  test("SHALLOW CLONE VERSION AS OF pins the snapshot") {
    val src = seedSrc()
    val dst = tmpDir("sqlcc") + "/v1"
    spark.sql(s"CREATE TABLE txlog.`$dst` SHALLOW CLONE txlog.`$src` " +
      "VERSION AS OF 1")
    assert(TxLog.read(spark, dst).select("k").as[Long].collect().toSet ===
      Set(1L, 2L))
    // source evolution after the clone is invisible to it
    TxLog.append(Seq((9L, "z", 90.0)).toDF("k", "v", "amt"), src)
    assert(TxLog.read(spark, dst).count() === 2)
  }

  test("CREATE OR REPLACE SHALLOW CLONE atomically replaces an existing table") {
    val src = seedSrc()
    val dst = tmpDir("sqlcc") + "/r"
    spark.sql(s"CREATE TABLE txlog.`$dst` TBLPROPERTIES ('junk' = 'y') " +
      "AS SELECT 1 AS other")
    val preV = TxLog.latestVersion(dst).get
    spark.sql(s"CREATE OR REPLACE TABLE txlog.`$dst` SHALLOW CLONE " +
      s"txlog.`$src`")
    assert(TxLog.read(spark, dst).select("k").as[Long].collect().toSet ===
      Set(1L, 2L, 3L))
    assert(TxLog.properties(dst).get("junk").isEmpty,
      "REPLACE clone resets destination-only properties")
    // pre-replace contents still time-travelable
    assert(TxLog.read(spark, dst, Some(preV)).columns.toSeq ===
      Seq("other"))
    // without OR REPLACE the same statement refuses
    val e = intercept[IllegalArgumentException](
      spark.sql(s"CREATE TABLE txlog.`$dst` SHALLOW CLONE txlog.`$src`"))
    assert(e.getMessage.contains("OR REPLACE"))
  }

  test("DEEP CLONE copies data; bare CLONE defaults to deep") {
    val src = seedSrc()
    val dst = tmpDir("sqlcc") + "/d"
    spark.sql(s"CREATE TABLE txlog.`$dst` CLONE txlog.`$src`")
    // deep = independent relative files, no absolute references
    assert(TxLog.activeFiles(dst).forall(!_.startsWith("/")),
      "deep clone must materialize its own files")
    assert(TxLog.read(spark, dst).select("k").as[Long].collect().toSet ===
      Set(1L, 2L, 3L))
    // fully independent of the source
    TxLog.delete(spark, src, lit(true))
    assert(TxLog.read(spark, dst).count() === 3)
  }

  test("DEEP CLONE OR REPLACE drops destination-only constraints") {
    val src = seedSrc()
    val dst = tmpDir("sqlcc") + "/dc"
    TxLog.append(Seq((5L, "e", -1.0)).toDF("k", "v", "amt"), dst)
    // amt on src rows is positive, but the DESTINATION's constraint
    // must not outlive the replace (src never promised it)
    TxLog.addConstraint(spark, dst, "neg_amt", "amt < 0")
    spark.sql(s"CREATE OR REPLACE TABLE txlog.`$dst` DEEP CLONE " +
      s"txlog.`$src`")
    assert(TxLog.constraints(dst).isEmpty)
    assert(TxLog.read(spark, dst).count() === 3)
  }

  test("stock CREATE TABLE forms still route to Spark") {
    // catalog-ident CREATE, temp views, etc. must be untouched by the
    // graft parser (path-form-only interception)
    val id = java.util.UUID.randomUUID.toString.take(8)
    spark.sql(s"CREATE TABLE ctas_stock_$id (k INT) USING parquet")
    try {
      assert(spark.table(s"ctas_stock_$id").columns.toSeq === Seq("k"))
    } finally spark.sql(s"DROP TABLE IF EXISTS ctas_stock_$id")
    spark.sql(s"CREATE TEMPORARY VIEW ctas_v_$id AS SELECT 1 AS one")
    try {
      assert(spark.table(s"ctas_v_$id").as[Int].head() === 1)
    } finally spark.catalog.dropTempView(s"ctas_v_$id")
  }
}
