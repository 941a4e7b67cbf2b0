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
    * partitions by cluster keys (lexicographic — prunes on the leading
    * key) so min/max row-group stats prune reads on those keys. */
  def rewriteClustered(spark: SparkSession, inDir: String, outDir: String,
      partitionCol: String, clusterCols: Seq[String]): Unit =
    spark.read.parquet(inDir)
      .repartition(col(partitionCol))
      .sortWithinPartitions(clusterCols.map(col): _*)
      .write.mode("overwrite").partitionBy(partitionCol).parquet(outDir)

  /** Z-ordered rewrite over two dimensions: range-partition + sort by the
    * Morton key of the two (bucketed) columns, so EVERY output file holds
    * a bounded rectangle of (a, b) space and parquet min/max stats prune
    * on either column — the lexicographic rewrite above only prunes on
    * the leading one. `aExpr`/`bExpr` must already be bucketed into
    * [0, 2^bits) (see [[graft.functions.ZOrder]]). */
  def rewriteZOrdered(spark: SparkSession, inDir: String, outDir: String,
      aExpr: org.apache.spark.sql.Column, bExpr: org.apache.spark.sql.Column,
      nFiles: Int, bits: Int = 16): Unit =
    spark.read.parquet(inDir)
      .withColumn("_z", graft.functions.ZOrder.interleave2(aExpr, bExpr, bits))
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(outDir)

  /** Hilbert-ordered rewrite: same shape as [[rewriteZOrdered]] but sorted
    * by the Hilbert index ([[graft.functions.HilbertKey]]), whose
    * every-step-adjacent walk gives each output file a tighter (a, b)
    * bounding box than the Morton curve's power-of-two diagonal jumps —
    * i.e. strictly better footer-stats pruning at the same file count. */
  def rewriteCurveOrdered(spark: SparkSession, inDir: String, outDir: String,
      aExpr: org.apache.spark.sql.Column, bExpr: org.apache.spark.sql.Column,
      nFiles: Int, bits: Int = 16): Unit = {
    graft.functions.GraftFunctions.register(spark)
    spark.read.parquet(inDir)
      .withColumn("_h", call_function("hilbert_key",
        aExpr.cast("long"), bExpr.cast("long"), lit(bits)))
      .repartitionByRange(nFiles, col("_h"))
      .sortWithinPartitions("_h")
      .drop("_h")
      .write.mode("overwrite").parquet(outDir)
  }
}
