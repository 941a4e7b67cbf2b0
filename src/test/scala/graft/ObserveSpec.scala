package graft

import graft.etl.{DetailsClean, ReviewsClean}
import graft.medallion.Medallion
import graft.streaming.Observability

/** observe() metrics + StreamingQueryListener across a full medallion run:
  * the count-conservation probes the reference ran interactively (M:44,
  * M:83, M:137), here asserted from metrics that ride the streams for
  * free. Listener delivery is asynchronous, so assertions poll.
  */
class ObserveSpec extends SparkSpec {

  private def eventually[A](assertion: => A, timeoutMs: Long = 20000): A = {
    val deadline = System.currentTimeMillis() + timeoutMs
    var last: Either[Throwable, A] = Left(new AssertionError("never ran"))
    while (System.currentTimeMillis() < deadline) {
      try return assertion
      catch { case t: Throwable => last = Left(t); Thread.sleep(100) }
    }
    last.fold(throw _, identity)
  }

  test("medallion streams report row counts and null rates that conserve across stages") {
    val listener = new Observability.MetricsListener
    spark.streams.addListener(listener)
    try {
      val root = tmpDir("observe")
      DetailsClean.run(spark, fixture("books_data.csv"), s"$root/details_cleaned")
      ReviewsClean.run(spark, fixture("Books_rating.csv"), s"$root/ratings_cleaned")
      Medallion.runAll(spark,
        s"$root/details_cleaned", s"$root/ratings_cleaned", s"$root/out")

      val nDetails = spark.read.parquet(s"$root/details_cleaned").count()
      val nReviews = spark.read.parquet(s"$root/ratings_cleaned").count()
      val nSilver = spark.read.parquet(s"$root/out/silver").count()

      eventually {
        // bronze ingest counts match the cleaned inputs (append: sum)
        assert(listener.total("bronze_details", "n_rows") === nDetails)
        assert(listener.total("bronze_reviews", "n_rows") === nReviews)
        // silver join output matches what landed in the sink, and the
        // upstream fills mean no nulls survive in the observed columns
        assert(listener.total("silver_quality", "n_rows") === nSilver)
        assert(listener.total("silver_quality", "null_Title") === 0L)
        assert(listener.total("silver_quality", "null_User_id") === 0L)
        // gold is complete mode: LAST batch is the current state; its
        // users_count total must conserve the silver row count
        assert(listener.last("gold_quality", "sum_users") === Some(nSilver))
        assert(listener.last("gold_quality", "n_rows") === Some(3L))
      }
    } finally spark.streams.removeListener(listener)
  }
}
