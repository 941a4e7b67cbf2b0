package graft

import org.apache.spark.sql.functions._

/** Error-bound pins for the two legitimately rows-only catalog entries
  * (a6 approx_count_distinct, a12 HLL datasketches): a cross-engine hash
  * oracle is impossible — Spark's HLL++ and datasketches HLL registers
  * are engine-private — so the correctness claim is the published
  * estimator guarantee, asserted here per group against the EXACT
  * distinct count at gate scale (sf0.01: 10k events, ~1k users/type).
  *
  * Bound: HLL++ at rsd=0.02 and datasketches at default lgK=12 are both
  * well inside ±3·rsd with overwhelming probability; ±3·rsd (6%) is the
  * spec bar, and a regression that breaks it (wrong column, wrong rsd
  * plumbing, sketch merged across the wrong key) lands far outside. */
class SketchErrorSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.01"

  test("a6 approx_count_distinct: every group within ±3·rsd of exact") {
    val events = Tables.load(spark, sfDir, "events")
    val rows = events.groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), 0.02).alias("approx"),
        countDistinct(col("user_id")).alias("exact"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (approx, exact) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      val rel = math.abs(approx - exact) / exact
      assert(rel <= 0.06,
        s"${r.getString(0)}: approx $approx vs exact $exact (rel $rel)")
    }
  }

  test("a12 hll_sketch estimate: every group within ±3·rsd; sketches merge") {
    val events = Tables.load(spark, sfDir, "events")
    val rows = events.groupBy("event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id")))
          .alias("approx"),
        countDistinct(col("user_id")).alias("exact"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (approx, exact) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      val rel = math.abs(approx - exact) / exact
      assert(rel <= 0.06,
        s"${r.getString(0)}: approx $approx vs exact $exact (rel $rel)")
    }
    // mergeability — the property the sketch exists for: unioning
    // per-partition sketches equals sketching the union (fleet-scale
    // partial aggregation), so the two-level estimate matches global
    val twoLevel = events
      .groupBy("event_type", "user_id").agg(hll_sketch_agg(col("user_id")).alias("sk"))
      .groupBy("event_type").agg(
        hll_sketch_estimate(hll_union_agg(col("sk"))).alias("merged"))
    val direct = events.groupBy("event_type").agg(
      hll_sketch_estimate(hll_sketch_agg(col("user_id"))).alias("direct"))
    val joined = twoLevel.join(direct, "event_type").collect()
    joined.foreach { r =>
      assert(r.getLong(1) === r.getLong(2),
        s"${r.getString(0)}: merged ${r.getLong(1)} != direct ${r.getLong(2)}")
    }
  }
}
