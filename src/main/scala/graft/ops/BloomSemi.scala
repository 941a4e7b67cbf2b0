package graft.ops

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

import graft.functions.GraftFunctions

/** Bloom-prefiltered semi-join: keep fact rows whose key appears in a
  * (possibly large) dimension key set.
  *
  * Shape at 100 TB: one bounded aggregate over the dim keys builds a
  * compact bloom filter (`df.stat.bloomFilter`, the public sketch API);
  * its serialized bytes travel to every scan task as a plan literal, and
  * Spark's codegen'd `BloomFilterMightContain` probe drops the
  * overwhelming majority of fact rows INSIDE the scan stage, before any
  * shuffle. The exact left-semi join then runs only over the bloom
  * survivors, so its shuffle is sized by the true match set (plus the
  * filter's false-positive sliver), not the fact table. Output equals the
  * plain semi-join exactly — the bloom is a prefilter, never the answer —
  * which is what keeps this oracle-checkable.
  *
  * The literal is `expectedKeys`-sized (~1.2 MB per million keys at 3%
  * fpp); for dim sets big enough that the literal hurts the plan, use the
  * SQL scalar-subquery form or a plain shuffled semi-join instead.
  *
  * Key-type contract: Spark's `BloomFilterMightContain` probe accepts
  * LongType only, so `factKey`/`dimKey` must be integral (checked up
  * front with a clear message — an unchecked non-integral key surfaced as
  * an opaque AnalysisException deep in the probe). Non-integral keys
  * should use a plain left-semi join, or hash the key to a long
  * (`xxhash64`) on BOTH sides first.
  */
object BloomSemi {

  def semiJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, expectedKeys: Long = 1000000L,
      fpp: Double = 0.03): DataFrame = {
    GraftFunctions.register(fact.sparkSession)
    Seq(fact.schema(factKey) -> factKey, dim.schema(dimKey) -> dimKey)
      .foreach { case (f, name) =>
        val integral = f.dataType match {
          case ByteType | ShortType | IntegerType | LongType => true
          case _ => false
        }
        require(integral,
          s"BloomSemi.semiJoin: key '$name' is ${f.dataType.simpleString}, but " +
            "bloom_might_contain probes LongType only — use a plain left-semi " +
            "join or pre-hash the key to a long (xxhash64) on both sides")
      }
    // Alias the dim side: joining on col(factKey) === col(dimKey) throws an
    // ambiguous-reference AnalysisException whenever both tables share the
    // key column name.
    val keys = dim.select(col(dimKey).cast("long").alias("_dim_key")).distinct()
    val bloom = keys.stat.bloomFilter("_dim_key", expectedKeys, fpp)
    val bytes = {
      val os = new ByteArrayOutputStream()
      bloom.writeTo(os)
      os.toByteArray
    }
    fact
      .filter(call_function("bloom_might_contain", lit(bytes),
        col(factKey).cast("long")))
      .join(keys, col(factKey).cast("long") === col("_dim_key"), "left_semi")
  }
}
