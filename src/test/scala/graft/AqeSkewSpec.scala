package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** AQE runtime skew-join split: the automatic half of the skew story
  * ([[graft.ops.Skew.saltedJoin]] is the manual half for single-key
  * pathologies). A hot key dominating one partition is split by AQE into
  * parallel sub-joins at runtime. */
class AqeSkewSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits a skewed join partition at runtime") {
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "20KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "20KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 200k rows on one hot key, a sprinkle on 99 others
      val left = spark.range(200000).select(
        when(col("id") % 100 === 0, col("id") % 100).otherwise(lit(7L)).alias("k"),
        col("id").alias("payload"))
      val right = (0L until 100L).map(k => (k, s"dim$k")).toDF("k", "name")
      val joined = left.join(right, "k")
      // collect() drives joined's own QueryExecution (count() would spawn
      // a separate one and leave this plan unfinalized)
      assert(joined.collect().length === 200000)
      val exec = joined.queryExecution.executedPlan
        .collectFirst { case a: AdaptiveSparkPlanExec => a }.get
      val finalPlan = exec.executedPlan.toString
      assert(finalPlan.contains("skew=true"), finalPlan.take(1500))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
