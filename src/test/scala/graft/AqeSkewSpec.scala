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

  private def withConfs(confs: Seq[(String, String)])(body: => Unit): Unit = {
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** j9_join_skew's key distribution: 30% of rows collapse to key 0. */
  private def skewedLeft(n: Long) = spark.range(n).select(
    when(col("id") % 10 < 3, lit(0L))
      .otherwise(pmod(col("id"), lit(997))).alias("sk"),
    col("id").alias("payload"))

  test("AQE splits j9's 30%-hot key join at runtime") {
    withConfs(Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "20KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "20KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")) {
      val left = skewedLeft(200000)
      val right = spark.range(997).select(col("id").alias("dk"))
      val joined = left.join(right, col("sk") === col("dk"))
      assert(joined.collect().length === 200000)
      val exec = joined.queryExecution.executedPlan
        .collectFirst { case a: AdaptiveSparkPlanExec => a }.get
      assert(exec.executedPlan.toString.contains("skew=true"),
        exec.executedPlan.toString.take(1500))
    }
  }

  test("salted join spreads the hot key: no straggler partition > 2x median") {
    // AQE off: measure the raw hash partitioning the salt produces — this
    // is the streaming-join situation, where AQE cannot re-plan.
    withConfs(Seq(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.shuffle.partitions" -> "32",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")) {
      val left = skewedLeft(200000)
      val dim = spark.range(997).select(col("id").alias("dk"),
        concat(lit("g"), pmod(col("id"), lit(7)).cast("string")).alias("grp"))
      def partitionCounts(df: org.apache.spark.sql.DataFrame): Array[Long] =
        df.groupBy(spark_partition_id().alias("pid")).count()
          .collect().map(_.getLong(1)).sorted
      val salted = partitionCounts(
        graft.ops.Skew.saltedJoin(left, dim, "sk", "dk", saltFactor = 32))
      val saltedMedian = salted(salted.length / 2)
      assert(salted.last <= 2 * saltedMedian,
        s"salted partitions still skewed: ${salted.mkString(",")}")
      // and the unsalted join genuinely concentrates the hot key — the
      // salt is doing the work, not the data
      val plain = partitionCounts(left.join(dim, col("sk") === col("dk")))
      assert(plain.last > 2 * plain(plain.length / 2),
        s"control failed — unsalted join not skewed: ${plain.mkString(",")}")
    }
  }
}
