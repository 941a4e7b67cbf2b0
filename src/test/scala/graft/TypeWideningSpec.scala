package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.TxLog

/** ALTER COLUMN TYPE widening (Delta's type widening): a metadata-only
  * schema commit — old files keep their narrow physical type and the
  * parquet reader up-converts at scan; new writes land wide; bloom
  * sidecars on the column retire in the same commit (int and long hash
  * differently, so a stale filter would wrongly prune). */
class TypeWideningSpec extends SparkSpec {
  import spark.implicits._

  test("int → bigint: old narrow files up-convert, no rewrite") {
    val t = tmpDir("widen") + "/t"
    TxLog.append(Seq((1, "a"), (2, "b")).toDF("k", "v"), t)
    val filesBefore = TxLog.activeFiles(t)
    spark.sql(s"ALTER TABLE txlog.`$t` ALTER COLUMN k TYPE BIGINT")
    assert(TxLog.activeFiles(t) === filesBefore, "widening must not rewrite")
    val df = TxLog.read(spark, t)
    assert(df.schema("k").dataType === LongType)
    // post-widen writes exceed int range; both eras coexist in one scan
    TxLog.append(Seq((9000000000L, "c")).toDF("k", "v"), t)
    assert(TxLog.read(spark, t).select("k").as[Long].collect().toSet ===
      Set(1L, 2L, 9000000000L))
    // time travel to the pre-widen version still reads narrow
    assert(TxLog.read(spark, t, Some(1L)).schema("k").dataType ===
      IntegerType)
  }

  test("widened column still works through DML rewrites") {
    val t = tmpDir("widen") + "/dml"
    TxLog.append(Seq((1, 10.0), (2, 20.0), (3, 30.0)).toDF("k", "x"), t)
    TxLog.widenColumnType(spark, t, "k", LongType)
    spark.sql(s"UPDATE txlog.`$t` SET x = 99.0 WHERE k = 2")
    TxLog.delete(spark, t, col("k") === 3L)
    assert(TxLog.read(spark, t).as[(Long, Double)].collect().toSet ===
      Set((1L, 10.0), (2L, 99.0)))
  }

  test("decimal / float / date widenings") {
    val t = tmpDir("widen") + "/dec"
    val df = spark.sql(
      "SELECT CAST(12.34 AS DECIMAL(5,2)) d, CAST(1.5 AS FLOAT) f, " +
        "DATE'2020-01-02' dt")
    TxLog.append(df, t)
    TxLog.widenColumnType(spark, t, "d", DecimalType(20, 4))
    TxLog.widenColumnType(spark, t, "f", DoubleType)
    TxLog.widenColumnType(spark, t, "dt", TimestampNTZType)
    val out = TxLog.read(spark, t)
    assert(out.schema("d").dataType === DecimalType(20, 4))
    assert(out.schema("f").dataType === DoubleType)
    assert(out.schema("dt").dataType === TimestampNTZType)
    val r = out.collect().head
    assert(r.getDecimal(0).toPlainString === "12.3400")
    assert(r.getDouble(1) === 1.5)
    assert(r.getAs[java.time.LocalDateTime](2) ===
      java.time.LocalDate.of(2020, 1, 2).atStartOfDay)
  }

  test("partition column widens: pruning and values survive") {
    val t = tmpDir("widen") + "/part"
    TxLog.setProperties(t, Map("graft.partition.columns" -> "p"))
    TxLog.append(Seq((1, "a", 10), (2, "b", 20)).toDF("k", "v", "p"), t)
    TxLog.widenColumnType(spark, t, "p", LongType)
    TxLog.append(Seq((3L, "c", 9000000000L)).toDF("k", "v", "p")
      .withColumn("k", col("k").cast("int")), t)
    val out = TxLog.read(spark, t)
    assert(out.schema("p").dataType === LongType)
    assert(out.filter(col("p") === 10L).select("v").as[String]
      .collect().toSeq === Seq("a"))
    assert(out.filter(col("p") === 9000000000L).count() === 1)
  }

  test("bloom sidecars on the widened column retire with the commit") {
    val t = tmpDir("widen") + "/bloom"
    TxLog.append(Seq((1, "a"), (2, "b")).toDF("k", "v"), t,
      bloomCols = Seq("k"))
    assert(TxLog.activeBlooms(t).nonEmpty)
    TxLog.widenColumnType(spark, t, "k", LongType)
    assert(TxLog.activeBlooms(t).isEmpty,
      "a pre-widen bloom would false-negative at the new hash width")
    // a column the bloom does NOT index keeps its sidecars
    val t2 = tmpDir("widen") + "/bloom2"
    TxLog.append(Seq((1, 2, "a")).toDF("k", "j", "v"), t2,
      bloomCols = Seq("v"))
    TxLog.widenColumnType(spark, t2, "k", LongType)
    assert(TxLog.activeBlooms(t2).nonEmpty)
  }

  test("refusals: narrowing, lossy, generated, identity, unknown") {
    val t = tmpDir("widen") + "/ref"
    TxLog.append(Seq((1L, 1.0f)).toDF("k", "f"), t)
    assert(intercept[IllegalArgumentException](
      TxLog.widenColumnType(spark, t, "k", IntegerType))
      .getMessage.contains("not a supported widening"))
    assert(intercept[IllegalArgumentException](
      TxLog.widenColumnType(spark, t, "k", DoubleType))
      .getMessage.contains("not a supported widening"))
    assert(intercept[IllegalArgumentException](
      TxLog.widenColumnType(spark, t, "k", DecimalType(15, 0)))
      .getMessage.contains("not a supported widening"))
    assert(intercept[IllegalArgumentException](
      TxLog.widenColumnType(spark, t, "nope", LongType))
      .getMessage.contains("no column"))
    val tg = tmpDir("widen") + "/gen"
    TxLog.createTable(tg, StructType.fromDDL("k INT, v STRING"))
    TxLog.declareGeneratedColumn(spark, tg, "k2", "k + 1")
    assert(intercept[IllegalArgumentException](
      TxLog.widenColumnType(spark, tg, "k", LongType))
      .getMessage.contains("generated column"))
    val ti = tmpDir("widen") + "/ident"
    TxLog.createTable(ti, StructType.fromDDL("k INT"))
    TxLog.declareIdentityColumn(ti, "id")
    assert(intercept[IllegalArgumentException](
      TxLog.widenColumnType(spark, ti, "id", DecimalType(25, 0)))
      .getMessage.contains("identity"))
  }

  test("a running stream refuses a mid-stream widen; a restart adopts the wide schema") {
    val t = tmpDir("widen") + "/stream"
    TxLog.append(Seq((1, "a")).toDF("k", "v"), t)
    val sink = tmpDir("widen_sink"); val cp = tmpDir("widen_cp")
    val q = spark.readStream.format("graft.sources.txlog")
      .option("path", t).load()
      .writeStream.format("parquet")
      .option("checkpointLocation", cp).option("path", sink).start()
    try {
      q.processAllAvailable()
      assert(spark.read.parquet(sink).count() === 1)
      TxLog.widenColumnType(spark, t, "k", LongType)
      TxLog.append(Seq((9000000000L, "b")).toDF("k", "v"), t)
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      def msgs(x: Throwable): Seq[String] =
        Option(x).toSeq.flatMap(e0 =>
          Option(e0.getMessage).toSeq ++ msgs(e0.getCause))
      assert(msgs(e).exists(_.contains("changed types")), msgs(e).mkString)
    } finally q.stop()
    // the restarted stream resumes from the checkpointed offset under
    // the evolved (wide) schema and delivers the refused commit into
    // the SAME sink (the file-sink metadata log tracks both batches;
    // the explicit read schema up-converts the batch-0 narrow files)
    spark.readStream.format("graft.sources.txlog")
      .option("path", t).load()
      .writeStream.format("parquet")
      .option("checkpointLocation", cp).option("path", sink)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start().awaitTermination()
    assert(spark.read.schema("k BIGINT, v STRING").parquet(sink)
      .as[(Long, String)].collect().toSet ===
      Set((1L, "a"), (9000000000L, "b")))
  }

  test("write-side stays strict: a narrow write post-widen refuses") {
    val t = tmpDir("widen") + "/strict"
    TxLog.append(Seq((1, "a")).toDF("k", "v"), t)
    TxLog.widenColumnType(spark, t, "k", LongType)
    val e = intercept[IllegalArgumentException](
      TxLog.append(Seq((2, "b")).toDF("k", "v"), t))
    assert(e.getMessage.contains("schema conflict"))
    // …while the SQL INSERT path casts to the target type and succeeds
    spark.sql(s"INSERT INTO txlog.`$t` VALUES (2, 'b')")
    assert(TxLog.read(spark, t).count() === 2)
  }
}
