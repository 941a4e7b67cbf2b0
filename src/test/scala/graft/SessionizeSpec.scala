package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.Sessionize
import graft.streaming.Sessionize.{Event, Session}

/** Custom streaming state via flatMapGroupsWithState (SURVEY.md §2.9 T3):
  * gap-based sessionization driven by a MemoryStream. */
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
}
