package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, ValueState}

/** Streaming as-of enrichment: facts joined to the latest dimension update
  * at-or-before their event time, with the dimension HISTORY held in keyed
  * state — the production shape of a stream-static enrichment join
  * (st11) once the dimension itself changes over time.
  *
  * Semantics: each fact is enriched with the dimension history known at
  * processing time. Facts in later micro-batches join against the full
  * retained history (not just the latest snapshot), so an out-of-order
  * fact still gets the value that was current AT ITS OWN timestamp — the
  * thing a plain stream-static join gets wrong. A dimension update that
  * arrives after a fact has already been emitted does not retract it
  * (same no-retraction contract as st11). Over a static landing dir under
  * `Trigger.AvailableNow` all rows share one batch and the result equals
  * the batch [[graft.ops.AsofJoin.asofBackward]] exactly, which is what
  * the st13 oracle checks.
  *
  * State posture at 100 TB: one bounded, TTL-evictable history per key —
  * `maxHistory` caps depth (oldest points dropped), so state is
  * O(active keys × maxHistory), never O(stream).
  */
object StreamAsof {

  /** Tagged union row: tag 0 = dimension update (right side), 1 = fact.
    * Equal-ts ordering matches ASOF's `>=` bound (update visible to a
    * fact at the same timestamp). */
  case class Tick(key: Long, ts_us: Long, tag: Int, event_id: Long,
      value: Double)

  case class DimPoint(ts_us: Long, event_id: Long, value: Double)
  case class DimHistory(points: Seq[DimPoint])

  case class Enriched(event_id: Long, key: Long, ts_us: Long,
      asof_ts_us: Option[Long], dim_value: Option[Double])

  class AsofProcessor(maxHistory: Int, ttl: TTLConfig)
      extends StatefulProcessor[Long, Tick, Enriched] {

    @transient private var hist: ValueState[DimHistory] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      hist = getHandle.getValueState[DimHistory](
        "dim_history", Encoders.product[DimHistory], ttl)

    override def handleInputRows(key: Long, rows: Iterator[Tick],
        timerValues: TimerValues): Iterator[Enriched] = {
      // within a batch: time order, updates before facts at equal ts
      val sorted = rows.toArray.sortBy(t => (t.ts_us, t.tag, t.event_id))
      var points =
        if (hist.exists()) hist.get().points.toVector else Vector.empty[DimPoint]
      val out = Seq.newBuilder[Enriched]
      sorted.foreach { t =>
        if (t.tag == 0) {
          // keep history sorted by ts; equal-ts updates resolve to the
          // larger event_id (deterministic latest-write-wins, mirroring
          // the oracle's arg_max(value, event_id) reduction)
          val at = points.indexWhere(_.ts_us == t.ts_us)
          if (at >= 0) {
            if (t.event_id > points(at).event_id)
              points = points.updated(at, DimPoint(t.ts_us, t.event_id, t.value))
          } else {
            val ins = points.indexWhere(_.ts_us > t.ts_us)
            val p = DimPoint(t.ts_us, t.event_id, t.value)
            points =
              if (ins < 0) points :+ p
              else (points.take(ins) :+ p) ++ points.drop(ins)
            if (points.size > maxHistory) points = points.takeRight(maxHistory)
          }
        } else {
          val m = points.lastIndexWhere(_.ts_us <= t.ts_us)
          out += Enriched(t.event_id, key, t.ts_us,
            if (m < 0) None else Some(points(m).ts_us),
            if (m < 0) None else Some(points(m).value))
        }
      }
      hist.update(DimHistory(points))
      out.result().iterator
    }
  }

  /** Enrich the tagged stream; requires the RocksDB state store
    * ([[SessionizeTws.configure]]). */
  def enrich(ticks: Dataset[Tick], maxHistory: Int = 1024,
      ttl: TTLConfig = TTLConfig.NONE)(
      implicit spark: SparkSession): Dataset[Enriched] = {
    import spark.implicits._
    ticks.groupByKey(_.key)
      .transformWithState(new AsofProcessor(maxHistory, ttl),
        TimeMode.None(), OutputMode.Append())
  }
}
