package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.ops.AsofJoin
import graft.streaming.{SessionizeTws, StreamAsof}
import graft.streaming.StreamAsof.{Enriched, Tick}

/** Streaming as-of enrichment (st13): batch-equivalence in a single
  * micro-batch, cross-batch dimension persistence, the documented
  * no-retraction contract for late dimension updates, and the bounded
  * history cap.
  */
class StreamAsofSpec extends SparkSpec {

  private def run(batches: Seq[Seq[Tick]], maxHistory: Int = 1024,
      name: String = "asof_out"): Seq[Enriched] = {
    implicit val s = spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    SessionizeTws.configure(spark)
    val input = MemoryStream[Tick]
    val q = StreamAsof.enrich(input.toDS(), maxHistory)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      spark.table(name).as[Enriched].collect().toSeq.sortBy(_.event_id)
    } finally q.stop()
  }

  test("single batch equals the batch as-of join") {
    import spark.implicits._
    val dims = Seq( // (key, ts, id, value)
      Tick(1L, 100L, 0, 10L, 1.0), Tick(1L, 200L, 0, 11L, 2.0),
      Tick(2L, 150L, 0, 12L, 9.0))
    val facts = Seq(
      Tick(1L, 100L, 1, 100L, 0), // exact-ts: update at same ts wins
      Tick(1L, 150L, 1, 101L, 0), // between updates → 1.0
      Tick(1L, 250L, 1, 102L, 0), // after both → 2.0
      Tick(1L, 50L, 1, 103L, 0),  // before all → unmatched
      Tick(3L, 100L, 1, 104L, 0)) // key with no dims → unmatched
    val got = run(Seq(scala.util.Random.shuffle(dims ++ facts)))

    val left = facts.toDF().select(col("event_id"), col("key"), col("ts_us"))
    val right = dims.toDF().select(col("key").alias("r_key"),
      col("ts_us").alias("r_ts"), col("value").alias("dim_value"))
    val expect = AsofJoin.asofBackward(left, "key", "ts_us",
        right, "r_key", "r_ts", Seq("dim_value"), asofTsCol = "asof_ts_us")
      .as[Enriched].collect().toSeq.sortBy(_.event_id)
    assert(got === expect)
    assert(got.map(e => e.event_id -> e.dim_value).toMap ===
      Map(100L -> Some(1.0), 101L -> Some(1.0), 102L -> Some(2.0),
        103L -> None, 104L -> None))
  }

  test("dimension history persists across micro-batches; late facts still match their own timestamp") {
    val got = run(Seq(
      // batch 1: two dimension versions, no facts
      Seq(Tick(1L, 100L, 0, 10L, 1.0), Tick(1L, 300L, 0, 11L, 3.0)),
      // batch 2: facts, one of them OLDER than the latest dim version —
      // a plain stream-static snapshot join would wrongly give it 3.0
      Seq(Tick(1L, 400L, 1, 100L, 0), Tick(1L, 150L, 1, 101L, 0))))
    assert(got.map(e => e.event_id -> (e.asof_ts_us, e.dim_value)).toMap ===
      Map(100L -> (Some(300L), Some(3.0)), 101L -> (Some(100L), Some(1.0))))
  }

  test("no retraction: a dim update arriving after a fact was emitted does not rewrite it") {
    val got = run(Seq(
      Seq(Tick(1L, 200L, 1, 100L, 0)),            // fact first → unmatched
      Seq(Tick(1L, 100L, 0, 10L, 1.0)),           // late dim update
      Seq(Tick(1L, 300L, 1, 101L, 0))))           // later fact sees it
    assert(got.map(e => e.event_id -> e.dim_value).toMap ===
      Map(100L -> None, 101L -> Some(1.0)))
  }

  test("history cap drops oldest points; state stays bounded") {
    val got = run(Seq(
      Seq(Tick(1L, 100L, 0, 10L, 1.0), Tick(1L, 200L, 0, 11L, 2.0),
        Tick(1L, 300L, 0, 12L, 3.0)),
      // cap=2 keeps ts 200/300 only: a fact at 150 no longer matches 100
      Seq(Tick(1L, 150L, 1, 100L, 0), Tick(1L, 250L, 1, 101L, 0))),
      maxHistory = 2, name = "asof_cap_out")
    assert(got.map(e => e.event_id -> e.dim_value).toMap ===
      Map(100L -> None, 101L -> Some(2.0)))
  }

  test("equal-ts dimension updates resolve latest-write-wins by event_id") {
    val got = run(Seq(Seq(
      Tick(1L, 100L, 0, 11L, 2.0), Tick(1L, 100L, 0, 10L, 1.0),
      Tick(1L, 150L, 1, 100L, 0))), name = "asof_tie_out")
    assert(got.head.dim_value === Some(2.0))
  }
}
