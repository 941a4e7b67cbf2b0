package graft

import org.apache.spark.sql.types._

import graft.ops.TxLog

/** Column-list `CREATE TABLE txlog.`p` (…)` — Delta's full-schema DDL —
  * plus `SHOW CREATE TABLE` round-tripping the definition back out. */
class CreateTableSqlSpec extends SparkSpec {
  import spark.implicits._

  test("full definition in one statement: types, NOT NULL, generated, identity, check, partitioning, properties") {
    val t = tmpDir("ctable") + "/t"
    spark.sql(s"""CREATE TABLE txlog.`$t` (
      |  k BIGINT NOT NULL,
      |  v STRING,
      |  amount DECIMAL(10,2),
      |  id BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 100 INCREMENT BY 10),
      |  k2 BIGINT GENERATED ALWAYS AS (k * 2),
      |  region STRING,
      |  CONSTRAINT positive_amount CHECK (amount >= 0)
      |) USING txlog
      |PARTITIONED BY (region)
      |TBLPROPERTIES ('graft.stats.columns' = 'k')""".stripMargin)
    val schema = TxLog.schemaAsOf(t).get
    assert(schema.fieldNames.toSeq ===
      Seq("k", "v", "amount", "id", "k2", "region"))
    assert(schema("amount").dataType === DecimalType(10, 2))
    assert(TxLog.identityCols(t) === Map("id" -> (100L, 10L)))
    assert(TxLog.generatedCols(t) === Map("k2" -> "k * 2"))
    assert(TxLog.constraints(t).keySet ===
      Set("positive_amount", "k_not_null"))
    assert(TxLog.declaredPartitionCols(t) === Seq("region"))
    assert(TxLog.properties(t).get("graft.stats.columns") === Some("k"))
    // writers supply base columns only; identity + generated compute
    spark.sql(s"INSERT INTO txlog.`$t` (k, v, amount, region) VALUES " +
      "(1, 'a', 5.00, 'eu'), (2, 'b', 6.00, 'us')")
    val rows = TxLog.read(spark, t)
      .select("k", "id", "k2", "region")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(rows.map(_._3).toSeq === Seq(2L, 4L))
    assert(rows.map(_._2).toSet.subsetOf(Set(100L, 110L)))
    // NOT NULL enforces as a CHECK on every write path
    val e = intercept[IllegalArgumentException](spark.sql(
      s"INSERT INTO txlog.`$t` (v, amount, region) VALUES ('c', 1.0, 'eu')"))
    assert(e.getMessage.contains("k_not_null"))
    // positive_amount enforces too
    assert(intercept[IllegalArgumentException](spark.sql(
      s"INSERT INTO txlog.`$t` (k, v, amount, region) VALUES " +
        "(3, 'c', -1.0, 'eu')")).getMessage.contains("positive_amount"))
  }

  test("IF NOT EXISTS / duplicate refusal / OR REPLACE resets definition") {
    val t = tmpDir("ctable") + "/r"
    spark.sql(s"CREATE TABLE txlog.`$t` (k BIGINT NOT NULL, v STRING)")
    spark.sql(s"INSERT INTO txlog.`$t` VALUES (1, 'a')")
    val vData = TxLog.latestVersion(t).get
    // plain CREATE on an existing table refuses
    assert(intercept[IllegalArgumentException](spark.sql(
      s"CREATE TABLE txlog.`$t` (k BIGINT)")).getMessage
      .contains("already exists"))
    // IF NOT EXISTS is a no-op that returns the current version
    spark.sql(s"CREATE TABLE IF NOT EXISTS txlog.`$t` (other STRING)")
    assert(TxLog.read(spark, t).count() === 1)
    // OR REPLACE swaps in the new definition: data gone, old NOT NULL
    // constraint gone, new generated column active
    spark.sql(s"CREATE OR REPLACE TABLE txlog.`$t` " +
      "(a BIGINT, b BIGINT GENERATED ALWAYS AS (a + 1))")
    assert(TxLog.read(spark, t).count() === 0)
    assert(TxLog.constraints(t).isEmpty)
    assert(TxLog.generatedCols(t) === Map("b" -> "a + 1"))
    spark.sql(s"INSERT INTO txlog.`$t` (a) VALUES (7)")
    assert(TxLog.read(spark, t).select("b").as[Long].collect().toSeq ===
      Seq(8L))
    // time travel still reaches the pre-replace data
    assert(TxLog.read(spark, t, Some(vData)).count() === 1)
  }

  test("ALTER COLUMN SET/DROP NOT NULL: validates existing rows, enforces on writes") {
    val t = tmpDir("ctable") + "/nn"
    spark.sql(s"CREATE TABLE txlog.`$t` (k BIGINT, v STRING)")
    spark.sql(s"INSERT INTO txlog.`$t` VALUES (1, 'a'), (2, NULL)")
    // a NULL-holding column refuses SET NOT NULL
    assert(intercept[IllegalArgumentException](spark.sql(
      s"ALTER TABLE txlog.`$t` ALTER COLUMN v SET NOT NULL"))
      .getMessage.contains("v_not_null"))
    spark.sql(s"ALTER TABLE txlog.`$t` ALTER COLUMN k SET NOT NULL")
    assert(intercept[IllegalArgumentException](spark.sql(
      s"INSERT INTO txlog.`$t` (v) VALUES ('c')"))
      .getMessage.contains("k_not_null"))
    // renders back inline in SHOW CREATE TABLE
    assert(spark.sql(s"SHOW CREATE TABLE txlog.`$t`").collect().head
      .getString(0).contains("`k` BIGINT NOT NULL"))
    spark.sql(s"ALTER TABLE txlog.`$t` ALTER COLUMN k DROP NOT NULL")
    spark.sql(s"INSERT INTO txlog.`$t` (v) VALUES ('c')")
    assert(TxLog.read(spark, t).count() === 3)
  }

  test("SHOW CREATE TABLE round-trips the whole definition") {
    val t = tmpDir("ctable") + "/s"
    spark.sql(s"""CREATE TABLE txlog.`$t` (
      |  k BIGINT NOT NULL,
      |  amount DECIMAL(10,2),
      |  id BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 5 INCREMENT BY 5),
      |  region STRING,
      |  CONSTRAINT positive_amount CHECK (amount >= 0)
      |) USING txlog
      |PARTITIONED BY (region)
      |TBLPROPERTIES ('graft.stats.columns' = 'k')""".stripMargin)
    val ddl = spark.sql(s"SHOW CREATE TABLE txlog.`$t`")
      .collect().head.getString(0)
    assert(ddl.contains("`k` BIGINT NOT NULL"))
    assert(ddl.contains(
      "GENERATED ALWAYS AS IDENTITY (START WITH 5 INCREMENT BY 5)"))
    assert(ddl.contains("CONSTRAINT positive_amount CHECK (amount >= 0)"))
    assert(ddl.contains("PARTITIONED BY (region)"))
    // executing the emitted DDL at a fresh path re-creates an
    // equivalent table
    val t2 = tmpDir("ctable") + "/s2"
    spark.sql(ddl.replace(s"txlog.`$t`", s"txlog.`$t2`"))
    assert(TxLog.schemaAsOf(t2).get.toDDL === TxLog.schemaAsOf(t).get.toDDL)
    assert(TxLog.identityCols(t2) === TxLog.identityCols(t))
    assert(TxLog.constraints(t2) === TxLog.constraints(t))
    assert(TxLog.declaredPartitionCols(t2) ===
      TxLog.declaredPartitionCols(t))
  }
}
