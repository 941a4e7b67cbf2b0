package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Buffer of the Space-Saving sketch: the bounded key → (count, err) map
  * plus the eviction `floor` — an upper bound on the count ANY evicted key
  * had when it left. A key missing from the map has been seen at most
  * `floor` times (or never), so re-entrants start at (floor+1, floor) and
  * the sandwich bound survives eviction. */
final case class SpaceSavingBuf(floor: Long, m: Map[Long, (Long, Long)])

/** Mergeable Space-Saving heavy-hitters sketch as a typed Aggregator
  * (Metwally et al., "Efficient Computation of Frequent and Top-k Elements
  * in Data Streams", ICDT 2005; truncation-based mergeable form after
  * Agarwal et al., "Mergeable Summaries", PODS 2012) — the bounded-memory
  * streaming top-k.
  *
  * Buffer holds at most 2×`capacity` (key → (count, err)) entries plus the
  * eviction floor, where `err` upper-bounds how much of `count` may belong
  * to evicted keys:
  *   - true_count ≤ count, and count − err ≤ true_count (sandwich bound);
  *   - any key with true frequency > N/capacity is guaranteed present.
  * While distinct keys ≤ capacity the sketch is EXACT (err = 0 everywhere)
  * — the regime the oracled catalog entry runs in; the approximation
  * regime is pinned in SpaceSavingSpec.
  *
  * Eviction is BATCHED (the r8 probe fix): entries accumulate to
  * 2×capacity, then ONE O(c log c) truncation keeps the top `capacity` by
  * count and raises the floor to the minimum kept count (≥ every evicted
  * count, so re-entrants stay upper-bounded). That makes eviction-regime
  * updates O(log c) amortized instead of the O(capacity) min-scan per
  * evicting row the single-evict form costs — at 10× data the probe
  * measured the scan as a 23× wall-clock blowup (st21), linear after this.
  *
  * Scale shape: partial aggregation keeps ≤ 2×capacity entries per
  * partition map-side; `merge` sums counts pairwise — a key missing from
  * one side contributes that side's floor as count AND error (it may have
  * been evicted there) — then re-truncates. The shuffle therefore moves
  * O(partitions × capacity) rows regardless of stream length — the same
  * contrast with an exact groupBy count that TopKAggregator draws with the
  * window formulation.
  */
class SpaceSavingAggregator(capacity: Int)
    extends Aggregator[Long, SpaceSavingBuf, Seq[(Long, Long, Long)]] {

  override def zero: SpaceSavingBuf = SpaceSavingBuf(0L, Map.empty)

  /** Keep the top `capacity` entries by (count desc, key asc); the new
    * floor dominates every evicted count, so any future re-entrant's
    * overestimate stays valid. */
  private def truncate(floor: Long, m: Map[Long, (Long, Long)]): SpaceSavingBuf = {
    if (m.size <= capacity) return SpaceSavingBuf(floor, m)
    val kept = m.toSeq.sortBy { case (k, (c, _)) => (-c, k) }.take(capacity)
    SpaceSavingBuf(math.max(floor, kept.last._2._1), kept.toMap)
  }

  override def reduce(buf: SpaceSavingBuf, key: Long): SpaceSavingBuf =
    buf.m.get(key) match {
      case Some((c, e)) => buf.copy(m = buf.m.updated(key, (c + 1, e)))
      case None =>
        // a missing key may have been evicted holding ≤ floor counts —
        // enter at (floor+1, floor), exactly the SS replacement rule with
        // the batched floor standing in for the evicted minimum
        val grown = buf.m.updated(key, (buf.floor + 1, buf.floor))
        if (grown.size < 2 * capacity) buf.copy(m = grown)
        else truncate(buf.floor, grown)
    }

  override def merge(a: SpaceSavingBuf, b: SpaceSavingBuf): SpaceSavingBuf = {
    if (a.m.isEmpty && a.floor == 0L) return b
    if (b.m.isEmpty && b.floor == 0L) return a
    // pairwise sum; a key missing from one side may have been evicted
    // there with up to that side's floor counts — floors (and errors) add,
    // the standard mergeable-summary bound
    val keys = a.m.keySet ++ b.m.keySet
    val summed = keys.iterator.map { k =>
      val (ca, ea) = a.m.getOrElse(k, (a.floor, a.floor))
      val (cb, eb) = b.m.getOrElse(k, (b.floor, b.floor))
      k -> (ca + cb, ea + eb)
    }.toMap
    truncate(a.floor + b.floor, summed)
  }

  /** Sorted (key, count, err), count desc then key asc, truncated to
    * `capacity` — a deterministic ranking whenever counts are exact or
    * distinct. */
  override def finish(buf: SpaceSavingBuf): Seq[(Long, Long, Long)] =
    buf.m.toSeq.map { case (k, (c, e)) => (k, c, e) }
      .sortBy { case (k, c, _) => (-c, k) }
      .take(capacity)

  override def bufferEncoder: Encoder[SpaceSavingBuf] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[SpaceSavingBuf]()
  override def outputEncoder: Encoder[Seq[(Long, Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long, Long)]]()
}
