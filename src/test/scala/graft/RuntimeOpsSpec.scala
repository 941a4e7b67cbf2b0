package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Runtime/operational surface: observe() metrics, cache/persist, and
  * explicit repartitioning (the knobs a 100 TB pipeline turns). */
class RuntimeOpsSpec extends SparkSpec {

  test("observe() collects pipeline metrics without a second pass") {
    val df = Tables.load(spark, SF, "lineitem")
      .observe("li_metrics", count(lit(1)).alias("rows"),
        sum(col("l_quantity")).alias("qty"))
      .filter(col("l_returnflag") === "R")
    df.collect() // drives THIS dataset's QueryExecution (write would spawn its own)
    val m = df.queryExecution.observedMetrics("li_metrics")
    assert(m.getAs[Long]("rows") === 6000L)
    assert(m.getAs[Double]("qty") > 0)
  }

  test("cache() serves the second action from memory") {
    val df = Tables.load(spark, SF, "orders").filter(col("o_totalprice") > 1000)
    df.cache()
    try {
      val n1 = df.count()
      val plan = df.queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      assert(plan.contains("InMemoryTableScan") || plan.contains("TableCacheQueryStage"), plan)
      assert(df.count() === n1)
    } finally df.unpersist()
  }

  test("repartition strategies produce the expected exchanges") {
    val df = Tables.load(spark, SF, "lineitem")
    val hashed = df.repartition(8, col("l_orderkey"))
    assert(hashed.queryExecution.explainString(ExplainMode.fromString("simple"))
      .contains("hashpartitioning(l_orderkey"), "hash repartition")
    val ranged = df.repartitionByRange(8, col("l_shipdate"))
    assert(ranged.queryExecution.explainString(ExplainMode.fromString("simple"))
      .contains("rangepartitioning(l_shipdate"), "range repartition")
    // coalesce narrows without a shuffle
    val coalesced = df.coalesce(1)
    val cp = coalesced.queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(cp.contains("Coalesce") && !cp.contains("Exchange"), cp)
  }
}
