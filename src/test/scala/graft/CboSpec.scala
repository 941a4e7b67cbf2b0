package graft

import org.apache.spark.sql.functions._

/** Cost-based-optimizer surface: ANALYZE TABLE populates catalog
  * statistics (table size + row count, per-column NDV/min/max) and, with
  * CBO on, the optimizer plans from those stats instead of raw file sizes.
  * At fleet scale this is the difference between a stats-informed join
  * order/strategy and guessing from bytes on disk. */
class CboSpec extends SparkSpec {

  test("ANALYZE TABLE feeds row counts and column stats into the optimizer") {
    val prevCbo = spark.conf.get("spark.sql.cbo.enabled", "false")
    spark.sql("DROP TABLE IF EXISTS cbo_nation")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      Tables.load(spark, SF, "nation")
        .write.mode("overwrite").saveAsTable("cbo_nation")

      spark.sql("ANALYZE TABLE cbo_nation COMPUTE STATISTICS")
      spark.sql(
        "ANALYZE TABLE cbo_nation COMPUTE STATISTICS FOR COLUMNS n_nationkey, n_regionkey")

      // catalog surface: DESCRIBE EXTENDED shows the table statistics
      val desc = spark.sql("DESCRIBE EXTENDED cbo_nation").collect()
        .map(r => s"${r.getString(0)}=${r.getString(1)}").mkString("\n")
      assert(desc.contains("Statistics"), desc)

      // planner surface: the optimized plan carries the analyzed rowCount
      val stats = spark.table("cbo_nation")
        .queryExecution.optimizedPlan.stats
      assert(stats.rowCount.contains(BigInt(25)), stats)

      // column-level stats (NDV, min/max) are recorded for the analyzed cols
      val colStats = spark.sql(
        "DESCRIBE EXTENDED cbo_nation n_regionkey").collect()
        .map(r => s"${r.getString(0)}=${r.getString(1)}").mkString("\n")
      assert(colStats.contains("distinct_count"), colStats)
      assert(colStats.contains("max=4"), colStats)

      // and the stats drive strategy: a 25-row analyzed table broadcasts
      // in a join without any explicit hint
      val joined = spark.table("cbo_nation")
        .join(Tables.load(spark, SF, "customer"),
          col("n_nationkey") === col("c_nationkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), plan)
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", prevCbo)
      spark.sql("DROP TABLE IF EXISTS cbo_nation")
    }
  }

  test("txlog relation reports log-derived sizeInBytes; small dim broadcasts") {
    val t = tmpDir("cbo-txlog") + "/t"
    graft.ops.TxLog.append(Tables.load(spark, SF, "nation")
      .select("n_nationkey", "n_name", "n_regionkey"), t)
    val dim = spark.read.format("graft.sources.txlog").load(t)
    val rel = dim.queryExecution.analyzed.collectFirst {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation
    }.get
    val expected = graft.ops.TxLog.fileSizes(t).values.sum
    assert(expected > 0)
    assert(rel.sizeInBytes === expected,
      "relation must report the snapshot's logged bytes, not defaultSizeInBytes")
    // strategy surface: with a threshold only the txlog side fits under,
    // the join broadcasts the txlog dim — impossible at the default
    // (∞) relation size, where this would degrade to a sort-merge join
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
        (expected.max(1024L) * 4).toString)
      val joined = Tables.load(spark, SF, "customer")
        .join(spark.read.format("graft.sources.txlog").load(t),
          col("n_nationkey") === col("c_nationkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), plan)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }
}
