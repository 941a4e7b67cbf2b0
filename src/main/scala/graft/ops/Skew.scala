package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (the 100 TB tool AQE's runtime skew
  * split complements): salt the skewed (large) side into `saltFactor`
  * sub-keys and replicate the other side across all salt values, turning
  * one hot partition into `saltFactor` even ones.
  *
  * Use when a key's row count dwarfs the rest (power-law user IDs, null-ish
  * defaults). AQE's `skewJoin` handles moderate skew automatically; salting
  * is the explicit fix when a single key exceeds executor memory.
  */
object Skew {

  /** Inner equi-join `large ⋈ small` on `largeKey = smallKey`, salted.
    * Result equals the unsalted join (row-for-row); only the partitioning
    * changes. */
  def saltedJoin(large: DataFrame, small: DataFrame,
      largeKey: String, smallKey: String, saltFactor: Int): DataFrame = {
    // deterministic pseudo-random salt per large row: spreads a hot key
    // across saltFactor partitions
    val salted = large.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltFactor)).cast("int"))
    val replicated = small.withColumn("_salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(replicated,
        salted(largeKey) === replicated(smallKey) &&
          salted("_salt") === replicated("_salt"))
      .drop("_salt")
  }
}
