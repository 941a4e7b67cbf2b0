package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state: gap-based sessionization via
  * `flatMapGroupsWithState` (the KeyValueGroupedDataset stateful surface,
  * SURVEY.md §2.9 T3 extension).
  *
  * State is one small record per active user — bounded by active-key
  * cardinality, evicted via processing-time timeout, so it holds at
  * cluster scale (contrast with the reference's unbounded join state).
  */
object Sessionize {

  case class Event(user_id: Long, event_id: Long, ts_us: Long)
  case class UserState(sessionStartUs: Long, lastTsUs: Long, nEvents: Long)
  case class Session(user_id: Long, session_start_us: Long,
      session_end_us: Long, n_events: Long)

  /** Closed sessions per user; a session closes when the next event is more
    * than `gapUs` after the previous one, or on state timeout.
    *
    * `timeoutMs = 0` disables the processing-time timeout (sessions then
    * close only on gap arrival). NB: with a timeout enabled the query
    * re-triggers continuously to honor pending timeouts, so
    * `processAllAvailable` never settles — always-on deployments want the
    * timeout; drain-style tests want 0.
    */
  def sessions(events: Dataset[Event], gapUs: Long,
      timeoutMs: Long = 30000L)(implicit spark: SparkSession): Dataset[Session] = {
    import spark.implicits._
    val timeoutConf = if (timeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[UserState, Session](
        OutputMode.Append, timeoutConf) {
        (uid: Long, it: Iterator[Event], state: GroupState[UserState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(st =>
              Session(uid, st.sessionStartUs, st.lastTsUs, st.nEvents))
            state.remove()
            out.iterator
          } else {
            val sorted = it.toSeq.sortBy(e => (e.ts_us, e.event_id))
            var st = state.getOption.orNull
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
            if (st != null) {
              state.update(st)
              if (timeoutMs > 0) state.setTimeoutDuration(timeoutMs)
            }
            closed.result().iterator
          }
      }
  }
}
