package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Partitioned layout + partition pruning (SURVEY.md §4: the reference
  * writes unpartitioned; §7.5 recommends partitioning by year — at 100 TB
  * a date-partitioned layout turns year filters into directory pruning,
  * reading a fraction of the files). */
class PartitionPruneSpec extends SparkSpec {

  test("year-partitioned write prunes partitions on filter") {
    val out = tmpDir("part_orders")
    Tables.load(spark, SF, "orders")
      .withColumn("o_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("o_year").parquet(out)

    val pruned = spark.read.parquet(out).filter(col("o_year") === 1998)
    val plan = pruned.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("PartitionFilters: [isnotnull(o_year"), plan)

    // the scan's file set is the single matching partition directory
    val scanned = pruned.queryExecution.executedPlan.collectLeaves()
      .collect { case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.selectedPartitions.partitionCount }
    assert(scanned === Seq(1), s"expected 1 selected partition, got $scanned")

    val expected = Tables.load(spark, SF, "orders")
      .filter(year(col("o_orderdate")) === 1998).count()
    assert(pruned.count() === expected)
  }
}
