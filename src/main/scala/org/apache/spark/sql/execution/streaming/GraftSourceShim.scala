package org.apache.spark.sql.execution.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.classic.{Dataset => CDataset, SparkSession => CSparkSession}
import org.apache.spark.sql.execution.datasources.{DataSource, LogicalRelation}
import org.apache.spark.sql.types.StructType

/** The one `private[sql]` doorway a v1 streaming `Source` implemented
  * outside `org.apache.spark.sql` needs: `getBatch` must return a
  * DataFrame whose logical plan carries `isStreaming = true`
  * (MicroBatchExecution asserts it), and the only constructors that set
  * the flag — `LogicalRelation(relation, isStreaming)` and
  * `SparkSession.internalCreateDataFrame` — are package-private. This
  * object lives in the Spark package namespace solely to re-export that
  * capability to [[graft.sources.txlog.TxLogStreamSource]]; it contains
  * no behavior of its own. The same shim pattern is what third-party
  * v1 streaming connectors have always used.
  */
object GraftSourceShim {

  /** The inverse doorway for a v1 streaming `Sink`: the DataFrame handed
    * to `addBatch` carries `isStreaming = true`, so batch writers refuse
    * it — re-wrap the micro-batch's physical RDD as a batch-flagged plan,
    * the same move the engine's own foreachBatch sink makes before
    * handing users a writable frame. */
  def asBatch(df: DataFrame): DataFrame = {
    val cdf = df.asInstanceOf[CDataset[org.apache.spark.sql.Row]]
    CDataset.ofRows(cdf.sparkSession,
      org.apache.spark.sql.execution.LogicalRDD.fromDataset(
        cdf.queryExecution.toRdd, cdf, isStreaming = false))
  }

  /** Streaming-flag an arbitrary computed batch plan — the change-feed
    * source's rows are a keyed diff, not a raw parquet scan, so they
    * can't go through [[streamingParquetBatch]]. Mirror of [[asBatch]]. */
  def asStreaming(df: DataFrame): DataFrame = {
    val cdf = df.asInstanceOf[CDataset[org.apache.spark.sql.Row]]
    CDataset.ofRows(cdf.sparkSession,
      org.apache.spark.sql.execution.LogicalRDD.fromDataset(
        cdf.queryExecution.toRdd, cdf, isStreaming = true))
  }

  /** A streaming-flagged batch DataFrame over exactly `paths`, read as
    * parquet with the given schema; an empty path list yields an empty
    * streaming-flagged batch. */
  def streamingParquetBatch(spark: SparkSession, schema: StructType,
      paths: Seq[String]): DataFrame = {
    val cs = spark.asInstanceOf[CSparkSession]
    if (paths.isEmpty)
      cs.internalCreateDataFrame(
        cs.sparkContext.emptyRDD[org.apache.spark.sql.catalyst.InternalRow],
        schema, isStreaming = true)
    else {
      val relation = DataSource(cs, className = "parquet", paths = paths,
        userSpecifiedSchema = Some(schema)).resolveRelation()
      CDataset.ofRows(cs, LogicalRelation(relation, isStreaming = true))
    }
  }
}
