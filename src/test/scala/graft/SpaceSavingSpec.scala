package graft

import org.apache.spark.sql.functions._

import graft.functions.SpaceSavingAggregator

/** Space-Saving sketch guarantees, in the approximation regime the oracled
  * st21 entry (capacity ≥ cardinality ⇒ exact) never enters:
  * over-estimation sandwich (count−err ≤ true ≤ count), guaranteed
  * presence of keys with frequency > N/capacity, bounded buffer under
  * adversarial partitioning, and exactness when capacity covers the key
  * space. */
class SpaceSavingSpec extends SparkSpec {

  import spark.implicits._

  // skewed stream: key 1 → 600 rows, key 2 → 200, keys 100…199 → 6 each
  private lazy val skewed: Seq[Long] =
    Seq.fill(600)(1L) ++ Seq.fill(200)(2L) ++
      (100L until 200L).flatMap(k => Seq.fill(6)(k))
  private lazy val trueCounts: Map[Long, Long] =
    skewed.groupBy(identity).view.mapValues(_.size.toLong).toMap

  private def sketch(capacity: Int, partitions: Int): Seq[(Long, Long, Long)] = {
    val ss = udaf(new SpaceSavingAggregator(capacity))
    skewed.toDF("k").repartition(partitions)
      .agg(ss(col("k")).alias("s"))
      .select(explode(col("s")).alias("t"))
      .select(col("t._1"), col("t._2"), col("t._3"))
      .as[(Long, Long, Long)].collect().toSeq
  }

  test("exact regime: capacity ≥ cardinality reproduces the true counts") {
    val est = sketch(capacity = 256, partitions = 7)
    assert(est.map(e => e._1 -> e._2).toMap === trueCounts)
    assert(est.forall(_._3 === 0L), "no error in the exact regime")
    // deterministic ranking: count desc, key asc
    assert(est.take(2).map(_._1) === Seq(1L, 2L))
  }

  test("approximation regime: sandwich bound and guaranteed heavy hitters") {
    val n = skewed.size.toLong
    for (partitions <- Seq(1, 8)) {
      val est = sketch(capacity = 8, partitions = partitions)
      assert(est.size <= 8, "buffer bound")
      est.foreach { case (k, c, e) =>
        val truth = trueCounts.getOrElse(k, 0L)
        assert(truth <= c, s"under-estimate for $k at p=$partitions")
        assert(c - e <= truth, s"error bound broken for $k at p=$partitions")
      }
      // any key with true frequency > N/capacity must be present —
      // keys 1 (600) and 2 (200) clear 1400/8 = 175
      val present = est.map(_._1).toSet
      trueCounts.filter(_._2 > n / 8).keys.foreach { k =>
        assert(present.contains(k), s"heavy hitter $k evicted at p=$partitions")
      }
      // and the true #1 ranks first
      assert(est.head._1 === 1L)
    }
  }

  test("merged partials stay within capacity and keep bounds under repartitioning") {
    val a = sketch(capacity = 8, partitions = 3)
    val b = sketch(capacity = 8, partitions = 13)
    // different partitionings may yield different tails, but both keep
    // the sandwich for every reported key (checked above) and agree on
    // the heavy head
    assert(a.head._1 === b.head._1)
    assert(a.size <= 8 && b.size <= 8)
  }
}
