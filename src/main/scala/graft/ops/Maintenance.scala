package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Table-layout maintenance for file-based lakes (the operational half of
  * the 100 TB story: small-files compaction and clustered rewrite).
  */
object Maintenance {

  /** Compact a parquet directory to ~`targetFileMB` files: read, coalesce
    * to the computed file count, rewrite via the checked two-rename
    * [[SafeSwap]] commit. (Streaming sinks produce one file per micro-batch
    * per partition — unreadable at scale without periodic compaction.)
    */
  def compactParquet(spark: SparkSession, dir: String,
      targetFileMB: Int = 128): Long = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    val path = new org.apache.hadoop.fs.Path(dir)
    val bytes = fs.getContentSummary(path).getLength
    val nFiles = math.max(1, (bytes / (targetFileMB * 1024L * 1024L)).toInt)
    spark.read.parquet(dir).coalesce(nFiles)
      .write.mode("overwrite").parquet(SafeSwap.staging(dir))
    SafeSwap.commit(fs, dir, targetExists = true)
    nFiles.toLong
  }

  /** Clustered rewrite: partition by a coarse column and sort within
    * partitions by cluster keys (z-order-lite) so min/max row-group stats
    * prune reads on those keys. */
  def rewriteClustered(spark: SparkSession, inDir: String, outDir: String,
      partitionCol: String, clusterCols: Seq[String]): Unit =
    spark.read.parquet(inDir)
      .repartition(col(partitionCol))
      .sortWithinPartitions(clusterCols.map(col): _*)
      .write.mode("overwrite").partitionBy(partitionCol).parquet(outDir)
}
