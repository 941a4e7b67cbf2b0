package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.{Sessionize, SessionizeTws}
import graft.streaming.Sessionize.{Event, Session}

/** Custom streaming state via flatMapGroupsWithState (SURVEY.md §2.9 T3)
  * and its Spark 4 `transformWithState` successor: gap-based
  * sessionization driven by a MemoryStream. */
class SessionizeSpec extends SparkSpec {

  test("streaming sessionization closes sessions across micro-batches") {
    implicit val s = spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[Event]
    val hourUs = 3600L * 1000000
    val sessions = Sessionize.sessions(input.toDS(),
      gapUs = 30L * 60 * 1000000, timeoutMs = 0L)
    val q = sessions.writeStream.format("memory")
      .queryName("sessions_out").outputMode("append")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      // batch 1: user 1 — two events 10 min apart (one open session)
      input.addData(Event(1L, 1L, 0L), Event(1L, 2L, 600L * 1000000))
      q.processAllAvailable()
      assert(spark.table("sessions_out").count() === 0) // still open

      // batch 2: an event 2h later closes the first session
      input.addData(Event(1L, 3L, 2 * hourUs))
      q.processAllAvailable()
      val closed = spark.table("sessions_out").as[Session].collect()
      assert(closed.length === 1)
      assert(closed.head.n_events === 2L)
      assert(closed.head.session_start_us === 0L)
      assert(closed.head.session_end_us === 600L * 1000000)
    } finally q.stop()
  }

  test("transformWithState sessionization matches the classic variant across micro-batches") {
    implicit val s = spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val prior = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    SessionizeTws.configure(spark)
    val input = MemoryStream[Event]
    val hourUs = 3600L * 1000000
    val sessions = SessionizeTws.sessions(input.toDS(),
      gapUs = 30L * 60 * 1000000)
    val q = sessions.writeStream.format("memory")
      .queryName("sessions_tws_out").outputMode("append")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData(Event(1L, 1L, 0L), Event(1L, 2L, 600L * 1000000),
        Event(2L, 3L, 0L))
      q.processAllAvailable()
      assert(spark.table("sessions_tws_out").count() === 0) // all open

      // 2h later: closes user 1's and user 2's first sessions
      input.addData(Event(1L, 4L, 2 * hourUs), Event(2L, 5L, 2 * hourUs))
      q.processAllAvailable()
      val closed = spark.table("sessions_tws_out").as[Session].collect()
        .map(ses => ses.user_id -> ses).toMap
      assert(closed.keySet === Set(1L, 2L))
      assert(closed(1L).n_events === 2L)
      assert(closed(1L).session_end_us === 600L * 1000000)
      assert(closed(2L).n_events === 1L)
    } finally {
      q.stop()
      prior match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
