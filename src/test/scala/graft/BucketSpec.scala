package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Bucketing as the co-located-join strategy (the 100 TB answer to
  * repeated fact⋈fact joins on the same key: pre-shuffle once at write
  * time, then every join on the bucket key skips its Exchange). */
class BucketSpec extends SparkSpec {

  test("bucketed tables join without a shuffle") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a non-broadcast join so the Exchange (or its absence) shows
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      Tables.load(spark, SF, "orders")
        .write.mode("overwrite").format("parquet")
        .bucketBy(4, "o_custkey").sortBy("o_custkey")
        .saveAsTable("orders_bucketed")
      Tables.load(spark, SF, "customer")
        .write.mode("overwrite").format("parquet")
        .bucketBy(4, "c_custkey").sortBy("c_custkey")
        .saveAsTable("customer_bucketed")

      val joined = spark.table("orders_bucketed")
        .join(spark.table("customer_bucketed"),
          col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "c_name")
      val plan = joined.queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), plan) // co-located: no shuffle
      assert(joined.count() === 1500)

      // unbucketed control: same join DOES shuffle both sides
      val control = Tables.load(spark, SF, "orders")
        .join(Tables.load(spark, SF, "customer"),
          col("o_custkey") === col("c_custkey"))
      val controlPlan = control.queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      assert(controlPlan.contains("Exchange"), controlPlan)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS orders_bucketed")
      spark.sql("DROP TABLE IF EXISTS customer_bucketed")
    }
  }
}
