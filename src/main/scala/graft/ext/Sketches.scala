package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode & Muthukrishnan 2005) — the bounded-memory
  * frequency estimator that complements [[graft.functions.SpaceSavingAggregator]]'s
  * top-k: Space-Saving answers "which keys are heavy", Count-Min answers
  * "how often did THIS key occur" for any key, with a one-sided error
  * (never an underestimate).
  *
  * Spark-first shape: the sketch IS a tiny DataFrame — `depth·width`
  * `(r, b, c)` counter rows, built by one codegen'd bucket expression
  * (`pmod(hash(item, r), width)`, seeded per row via `hash`'s multi-arg
  * form) and one grouped count with map-side partial aggregation.
  * Sketches of different corpus slices MERGE by unioning and re-summing
  * the counter rows — the standard CM mergeability, for free in SQL.
  * Estimation broadcasts the counter table and takes the min over the
  * key's `depth` buckets. No driver state, no custom aggregation buffer,
  * and every value is an exact integer — an external engine replaying
  * the staged occurrence buckets reproduces every counter and estimate
  * bit-for-bit. */
object CountMin {

  /** The `depth` bucket ids of an item: `pmod(hash(item, r), width)` for
    * each sketch row `r` — one hash family member per row. */
  def buckets(item: Column, depth: Int, width: Int): Column =
    array((0 until depth).map(r =>
      pmod(hash(item, lit(r)), lit(width))): _*)

  /** (item, r, b) per occurrence — the sketch's update stream, exposed
    * for staging/auditing. */
  def occurrences(items: DataFrame, itemCol: String, depth: Int,
      width: Int): DataFrame =
    items.select(col(itemCol).alias("item"),
      posexplode(buckets(col(itemCol), depth, width)).as(Seq("r", "b")))

  /** The sketch: `(r, b, c)` counters, at most `depth·width` rows. */
  def sketch(items: DataFrame, itemCol: String, depth: Int,
      width: Int): DataFrame =
    occurrences(items, itemCol, depth, width)
      .groupBy("r", "b").agg(count(lit(1)).alias("c"))

  /** Merge sketches built with the same (depth, width, hash family). */
  def merge(sketches: Seq[DataFrame]): DataFrame =
    sketches.reduce(_.unionByName(_))
      .groupBy("r", "b").agg(sum(col("c")).alias("c"))

  /** Point estimates for `keys`: `min_r counters[r][bucket_r(key)]` —
    * ≥ the true count always, = for collision-free keys. The counter
    * table is broadcast (metadata-sized by construction). */
  def estimate(keys: DataFrame, keyCol: String, sk: DataFrame,
      depth: Int, width: Int): DataFrame =
    keys.select(col(keyCol).alias("item"))
      .select(col("item"), posexplode(buckets(col("item"), depth, width))
        .as(Seq("r", "b")))
      .join(broadcast(sk), Seq("r", "b"), "left")
      .groupBy("item")
      .agg(min(coalesce(col("c"), lit(0L))).alias("cms_est"))
}
