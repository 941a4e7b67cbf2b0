package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, ValueState}

import Sessionize.{Event, Session, UserState}

/** Gap sessionization on the Spark 4 `transformWithState` surface — the
  * successor to `flatMapGroupsWithState` ([[Sessionize]] keeps the
  * classic implementation; both produce identical sessions, pinned
  * against each other in `SessionizeSpec`).
  *
  * Why it matters at 100 TB: the new API runs on the RocksDB state store
  * with fine-grained per-state-variable encoding, supports state TTL
  * natively (`TTLConfig` instead of hand-rolled timeout bookkeeping), and
  * lets one processor own several typed state variables. State here is
  * one small `UserState` per active user, TTL-evictable — bounded by
  * active-key cardinality exactly like the classic variant.
  */
object SessionizeTws {

  class SessionProcessor(gapUs: Long, ttl: TTLConfig)
      extends StatefulProcessor[Long, Event, Session] {

    @transient private var state: ValueState[UserState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[UserState](
        "session", Encoders.product[UserState], ttl)

    override def handleInputRows(uid: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[Session] = {
      val sorted = rows.toSeq.sortBy(e => (e.ts_us, e.event_id))
      var st = if (state.exists()) state.get() else null
      val closed = Seq.newBuilder[Session]
      sorted.foreach { e =>
        st match {
          case null =>
            st = UserState(e.ts_us, e.ts_us, 1L)
          case s if e.ts_us - s.lastTsUs > gapUs =>
            closed += Session(uid, s.sessionStartUs, s.lastTsUs, s.nEvents)
            st = UserState(e.ts_us, e.ts_us, 1L)
          case s =>
            st = s.copy(lastTsUs = e.ts_us, nEvents = s.nEvents + 1L)
        }
      }
      if (st != null) state.update(st)
      closed.result().iterator
    }
  }

  /** Closed sessions per user (same contract as [[Sessionize.sessions]]).
    * Requires the RocksDB state store provider — see [[configure]]. */
  def sessions(events: Dataset[Event], gapUs: Long,
      ttl: TTLConfig = TTLConfig.NONE)(
      implicit spark: SparkSession): Dataset[Session] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapUs, ttl),
        TimeMode.None(), OutputMode.Append())
  }

  /** transformWithState only runs on the RocksDB state store. */
  def configure(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
}
