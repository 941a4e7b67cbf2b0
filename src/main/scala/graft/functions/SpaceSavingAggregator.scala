package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable Space-Saving heavy-hitters sketch as a typed Aggregator
  * (Metwally et al., "Efficient Computation of Frequent and Top-k Elements
  * in Data Streams", ICDT 2005) — the bounded-memory streaming top-k.
  *
  * Buffer is at most `capacity` (key → (count, err)) entries, where `err`
  * upper-bounds how much of `count` may belong to evicted keys:
  *   - true_count ≤ count, and count − err ≤ true_count (sandwich bound);
  *   - any key with true frequency > N/capacity is guaranteed present.
  * While distinct keys ≤ capacity the sketch is EXACT (err = 0 everywhere)
  * — the regime the oracled catalog entry runs in; the approximation
  * regime is pinned in SpaceSavingSpec.
  *
  * Scale shape: `reduce` is O(1) amortized per row with a bounded map, so
  * partial aggregation keeps at most `capacity` entries per partition
  * map-side; `merge` sums counts pairwise and re-truncates to `capacity`
  * (errors add — the standard mergeable-summary bound, Agarwal et al.,
  * "Mergeable Summaries", PODS 2012). The shuffle therefore moves
  * O(partitions × capacity) rows regardless of stream length — the same
  * contrast with an exact groupBy count that TopKAggregator draws with the
  * window formulation.
  */
class SpaceSavingAggregator(capacity: Int)
    extends Aggregator[Long, Map[Long, (Long, Long)], Seq[(Long, Long, Long)]] {

  override def zero: Map[Long, (Long, Long)] = Map.empty

  override def reduce(buf: Map[Long, (Long, Long)], key: Long): Map[Long, (Long, Long)] =
    buf.get(key) match {
      case Some((c, e)) => buf.updated(key, (c + 1, e))
      case None if buf.size < capacity => buf.updated(key, (1L, 0L))
      case None =>
        // evict the minimum-count entry; its count becomes the new key's
        // error floor (the Space-Saving replacement rule). Tie-break on
        // key id so the sketch is deterministic for a given input order.
        val (minKey, (minC, _)) = buf.minBy { case (k, (c, _)) => (c, k) }
        (buf - minKey).updated(key, (minC + 1, minC))
    }

  override def merge(a: Map[Long, (Long, Long)], b: Map[Long, (Long, Long)]): Map[Long, (Long, Long)] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    // pairwise sum; a key missing from one side may have been evicted
    // there, so that side's minimum count is its error contribution
    def minCount(m: Map[Long, (Long, Long)]): Long =
      if (m.size < capacity) 0L else m.valuesIterator.map(_._1).min
    val (minA, minB) = (minCount(a), minCount(b))
    val keys = a.keySet ++ b.keySet
    val summed = keys.iterator.map { k =>
      val (ca, ea) = a.getOrElse(k, (minA, minA))
      val (cb, eb) = b.getOrElse(k, (minB, minB))
      k -> (ca + cb, ea + eb)
    }.toMap
    if (summed.size <= capacity) summed
    else summed.toSeq
      .sortBy { case (k, (c, _)) => (-c, k) }
      .take(capacity).toMap
  }

  /** Sorted (key, count, err), count desc then key asc — a deterministic
    * ranking whenever counts are exact or distinct. */
  override def finish(buf: Map[Long, (Long, Long)]): Seq[(Long, Long, Long)] =
    buf.toSeq.map { case (k, (c, e)) => (k, c, e) }
      .sortBy { case (k, c, _) => (-c, k) }

  override def bufferEncoder: Encoder[Map[Long, (Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[Long, (Long, Long)]]()
  override def outputEncoder: Encoder[Seq[(Long, Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long, Long)]]()
}
