package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator computing top-k (score desc, id asc) per group with a
  * bounded buffer (SURVEY.md §7.3 custom-Aggregator budget).
  *
  * Scale contrast with the window row_number() formulation: a window must
  * shuffle EVERY scored row to its group's partition before ranking;
  * this aggregator keeps at most k rows per partition per group (partial
  * aggregation map-side), so the shuffle moves O(groups × k × partitions)
  * rows instead of O(corpus). For ANN over billions of vectors that is the
  * difference between a bounded merge and a corpus-sized exchange.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Long, Double), Seq[(Long, Double)], Seq[(Long, Double)]] {

  private def best(xs: Seq[(Long, Double)]): Seq[(Long, Double)] =
    xs.sortBy { case (id, score) => (-score, id) }.take(k)

  override def zero: Seq[(Long, Double)] = Seq.empty

  override def reduce(buf: Seq[(Long, Double)], row: (Long, Double)): Seq[(Long, Double)] = {
    // cheap bound: only re-sort when the candidate can enter the top-k
    if (buf.size < k) best(buf :+ row)
    else {
      val (worstId, worstScore) = buf.last
      if (row._2 > worstScore || (row._2 == worstScore && row._1 < worstId))
        best(buf :+ row)
      else buf
    }
  }

  override def merge(a: Seq[(Long, Double)], b: Seq[(Long, Double)]): Seq[(Long, Double)] =
    best(a ++ b)

  override def finish(buf: Seq[(Long, Double)]): Seq[(Long, Double)] = buf

  override def bufferEncoder: Encoder[Seq[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Double)]]()
  override def outputEncoder: Encoder[Seq[(Long, Double)]] = bufferEncoder
}
