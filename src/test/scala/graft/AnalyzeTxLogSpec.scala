package graft

import org.apache.spark.sql.functions._

import graft.ops.TxLog

/** `ANALYZE TABLE txlog.`p` COMPUTE STATISTICS` — table/column stats
  * persisted as `graft.analyze.*` properties in one commit: they
  * version and time-travel with the table, and any engine or operator
  * reads them through SHOW TBLPROPERTIES. Row count and null counts are
  * exact, NDV is HLL-approx (the Spark/Delta production choice at
  * scale), min/max stringified. */
class AnalyzeTxLogSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(): String = {
    val t = tmpDir("analyze") + "/t"
    TxLog.append(Seq((1L, Some("a")), (2L, Some("b")), (3L, None),
      (4L, Some("b")), (5L, Some("c"))).toDF("k", "v"), t)
    t
  }

  test("FOR ALL COLUMNS: exact rows/nulls/min/max, close NDV, one commit") {
    val t = fixture()
    val pre = TxLog.latestVersion(t).get
    val rows = spark.sql(
      s"ANALYZE TABLE txlog.`$t` COMPUTE STATISTICS FOR ALL COLUMNS")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(TxLog.latestVersion(t).get === pre + 1,
      "the stats must land as ONE properties commit")
    val p = TxLog.properties(t)
    assert(p("graft.analyze.rowCount") === "5")
    assert(p("graft.analyze.col.k.nullCount") === "0")
    assert(p("graft.analyze.col.v.nullCount") === "1")
    assert(p("graft.analyze.col.k.min") === "1")
    assert(p("graft.analyze.col.k.max") === "5")
    assert(p("graft.analyze.col.v.min") === "a")
    assert(p("graft.analyze.col.v.max") === "c")
    val ndvK = p("graft.analyze.col.k.ndv").toLong
    assert(ndvK >= 4 && ndvK <= 6, s"NDV(k) ~5, got $ndvK")
    assert(p("graft.analyze.sizeBytes").toLong ===
      TxLog.fileSizes(t).values.sum)
    // the command echoes what it recorded
    assert(rows("graft.analyze.rowCount") === "5")
    // stats ride the log: the pre-analyze version has none
    assert(!TxLog.properties(t, Some(pre)).contains("graft.analyze.rowCount"))
  }

  test("FOR COLUMNS subset; a missing column refuses by name") {
    val t = fixture()
    spark.sql(s"ANALYZE TABLE txlog.`$t` COMPUTE STATISTICS FOR COLUMNS k")
    val p = TxLog.properties(t)
    assert(p.contains("graft.analyze.col.k.ndv"))
    assert(!p.contains("graft.analyze.col.v.ndv"),
      "unrequested columns must not be scanned or recorded")
    val e = intercept[IllegalArgumentException] {
      spark.sql(
        s"ANALYZE TABLE txlog.`$t` COMPUTE STATISTICS FOR COLUMNS nope")
        .collect()
    }
    assert(e.getMessage.contains("nope"), e.getMessage)
  }

  test("equi-width histograms record exact bucket counts when declared") {
    val t = fixture()
    TxLog.setProperties(t, Map("graft.analyze.histogramBuckets" -> "4"))
    spark.sql(s"ANALYZE TABLE txlog.`$t` COMPUTE STATISTICS FOR COLUMNS k")
    // k in 1..5, lo=1 hi=5, bucket = clamp(floor((v-1)*4/4), 0, 3):
    // 1→0, 2→1, 3→2, 4→3, 5→3
    assert(TxLog.properties(t).get("graft.analyze.col.k.hist")
      === Some("1.0,5.0|1,1,1,2"))
    // string columns never get histograms
    spark.sql(s"ANALYZE TABLE txlog.`$t` COMPUTE STATISTICS FOR COLUMNS v")
    assert(!TxLog.properties(t).contains("graft.analyze.col.v.hist"))
  }

  test("NOSCAN records metadata-derived table stats only") {
    val t = fixture()
    spark.sql(s"ANALYZE TABLE txlog.`$t` COMPUTE STATISTICS NOSCAN")
    val p = TxLog.properties(t)
    assert(p.contains("graft.analyze.sizeBytes"))
    assert(!p.contains("graft.analyze.rowCount"),
      "NOSCAN must not run a data pass")
  }

  test("FOR ALL COLUMNS skips non-orderable types instead of failing") {
    val t = tmpDir("analyze_map") + "/t"
    TxLog.append(Seq((1L, Map("a" -> 1L)), (2L, Map("b" -> 2L)))
      .toDF("k", "m"), t)
    spark.sql(s"ANALYZE TABLE txlog.`$t` COMPUTE STATISTICS " +
      "FOR ALL COLUMNS")
    val p = TxLog.properties(t)
    assert(p.contains("graft.analyze.col.k.ndv"),
      "orderable columns must still analyze")
    assert(!p.keys.exists(_.startsWith("graft.analyze.col.m.")),
      "map columns are skipped, not fatal — stock ANALYZE's rule")
    assert(p("graft.analyze.rowCount") === "2")
  }

  test("re-analyze after DML overwrites the recorded stats") {
    val t = fixture()
    spark.sql(s"ANALYZE TABLE txlog.`$t` COMPUTE STATISTICS FOR COLUMNS k")
    TxLog.delete(spark, t, col("k") >= 4L)
    spark.sql(s"ANALYZE TABLE txlog.`$t` COMPUTE STATISTICS FOR COLUMNS k")
    val p = TxLog.properties(t)
    assert(p("graft.analyze.rowCount") === "3")
    assert(p("graft.analyze.col.k.max") === "3")
  }
}
