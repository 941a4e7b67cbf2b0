package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed upsert ("MERGE") into a parquet table without Delta: latest row
  * per key wins, decided by a version column. Used as a `foreachBatch`
  * sink for streams that carry updates, giving the reference's Delta
  * upsert semantics on a plain file lake.
  *
  * Scale note: the rewrite is bounded by the target table size, not the
  * stream history — production deployments partition the target and
  * rewrite only partitions touched by the batch (`partitionCol`).
  */
object Upsert {

  /** Merge `updates` into the parquet table at `dir`: per `keyCols`, keep
    * the row with the highest `versionCol` (ties → incoming batch wins).
    *
    * The commit is a two-rename swap through [[SafeSwap]]: the current
    * table is renamed aside before the staged result takes its place, every
    * delete/rename return value is checked, and a missing target is only
    * treated as "first batch" when no leftover staging/backup dir says a
    * previous swap died mid-flight — a replayed streaming batch must never
    * silently rewrite the table with only its own rows. */
  def mergeIntoParquet(spark: SparkSession, dir: String, updates: DataFrame,
      keyCols: Seq[String], versionCol: String): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    val targetExists = SafeSwap.checkTarget(fs, dir)
    val existing = if (targetExists)
      spark.read.parquet(dir).withColumn("_src", lit(0)) else null
    val incoming = updates.withColumn("_src", lit(1))
    val all = if (existing == null) incoming
      else existing.unionByName(incoming)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(versionCol).desc, col("_src").desc)
    val merged = all
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn", "_src")
    merged.write.mode("overwrite").parquet(SafeSwap.staging(dir))
    SafeSwap.commit(fs, dir, targetExists)
  }

  /** foreachBatch adapter: stream of updates → continuously merged table. */
  def sink(dir: String, keyCols: Seq[String], versionCol: String)(
      batch: DataFrame, batchId: Long): Unit =
    mergeIntoParquet(batch.sparkSession, dir, batch, keyCols, versionCol)
}
