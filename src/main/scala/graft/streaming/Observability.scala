package graft.streaming

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener.{
  QueryProgressEvent, QueryStartedEvent, QueryTerminatedEvent}

/** The ops surface a 100 TB pipeline needs on every always-on stream:
  * row-count / null-rate observations riding the data already flowing
  * through each stage (`Dataset.observe` — no extra pass, no action), and
  * a listener that collects them per micro-batch from
  * `StreamingQueryProgress.observedMetrics`.
  *
  * Count-conservation probes are the reference's de-facto test style
  * (interactive `count()` after every stage, SURVEY.md §5.1); this is the
  * same idea made continuous and free.
  */
object Observability {

  /** Decorate a stage with a named observation: total rows plus a null
    * count per listed column. Works on batch and streaming frames; on a
    * stream the metrics surface once per micro-batch (for complete-mode
    * aggregates each trigger re-reports the full result — read the LAST
    * batch, not the sum). */
  def observeQuality(df: DataFrame, name: String,
      cols: Seq[String]): DataFrame = {
    val nulls = cols.map(c =>
      sum(when(col(c).isNull, 1L).otherwise(0L)).alias(s"null_$c"))
    df.observe(name, count(lit(1)).alias("n_rows"), nulls: _*)
  }

  /** Collects every observed-metrics row, keyed by observation name.
    * Listener delivery is asynchronous — callers should poll (see
    * ObserveSpec) rather than assert immediately after awaitTermination. */
  final class MetricsListener extends StreamingQueryListener {
    private val buf = ArrayBuffer.empty[(String, Row)]

    override def onQueryStarted(event: QueryStartedEvent): Unit = ()
    override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(event: QueryProgressEvent): Unit =
      synchronized {
        event.progress.observedMetrics.forEach((name, row) =>
          buf += ((name, row)))
      }

    /** Per-micro-batch metric rows for one observation, in arrival order. */
    def batches(metric: String): Seq[Row] = synchronized {
      buf.filter(_._1 == metric).map(_._2).toSeq
    }

    /** Sum across micro-batches — the total for append-mode stages. */
    def total(metric: String, column: String): Long =
      batches(metric).map(_.getAs[Long](column)).sum

    /** Last batch's value — the current state of complete-mode stages. */
    def last(metric: String, column: String): Option[Long] =
      batches(metric).lastOption.map(_.getAs[Long](column))
  }
}
