package graft.ops

import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending, SortOrder}

import graft.plans.{TopKPerKeyNode, TopKPerKeyStrategy}

/** Public API over the custom top-k-per-key operator. */
object TopK {

  /** Ensure the planner strategy + optimizer rule are installed on the
    * session (idempotent). */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(TopKPerKeyStrategy))
      spark.experimental.extraStrategies = cur :+ TopKPerKeyStrategy
    val rules = spark.experimental.extraOptimizations
    if (!rules.contains(graft.plans.PushFilterThroughTopK))
      spark.experimental.extraOptimizations =
        rules :+ graft.plans.PushFilterThroughTopK
  }

  /** Top `k` rows per `keyCols` group, ranked by `orderCols` (each
    * (name, ascending)); ties beyond the order spec are broken by adding a
    * unique column to `orderCols`, exactly as with window top-k.
    * `maxKeysInMemory` bounds the per-partition heap map — past it the
    * exec spills key-sorted chunks and merges them exactly (see
    * [[graft.plans.TopKPerKeyExec]]). */
  def perKey(df: DataFrame, keyCols: Seq[String],
      orderCols: Seq[(String, Boolean)], k: Int,
      maxKeysInMemory: Int = graft.plans.TopKPerKeyExec.DefaultMaxKeysInMemory)
      : DataFrame = {
    val spark = df.sparkSession
    install(spark)
    val child = df.queryExecution.analyzed
    def attr(name: String) = child.output.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(s"no column $name in ${child.output.map(_.name)}"))
    val order = orderCols.map { case (name, asc) =>
      SortOrder(attr(name), if (asc) Ascending else Descending)
    }
    GraftSqlBridge.ofRows(spark,
      TopKPerKeyNode(keyCols.map(attr), order, k, child, maxKeysInMemory))
  }
}
