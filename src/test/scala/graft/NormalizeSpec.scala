package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** NFC normalization cases the identity-pass oracle can't exercise:
  * composition of decomposed sequences, equality of the two encodings
  * after normalization, NULL passthrough, and interpreted-vs-codegen
  * agreement. */
class NormalizeSpec extends SparkSpec {

  GraftFunctions.register(spark)
  import spark.implicits._

  private val composed = "caf\u00e9"     // one-code-point e-acute
  private val decomposed = "cafe\u0301"  // e + combining acute accent

  test("decomposed and composed forms normalize to identical strings") {
    val rows = Seq((1L, composed), (2L, decomposed), (3L, null))
      .toDF("id", "s")
      .select(col("id"),
        call_function("nfc_normalize", col("s")).alias("n"),
        length(call_function("nfc_normalize", col("s"))).alias("len"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.getString(1)), Option(r.get(2)))).toMap
    assert(rows(1L)._1 === rows(2L)._1, "both forms compose to the same text")
    assert(rows(1L)._1 === Some(composed))
    assert(rows(1L)._2 === Some(4) && rows(2L)._2 === Some(4),
      "5 code points compose down to 4")
    assert(rows(3L) === (None, None), "NULL passes through")
  }

  test("interpreted eval matches codegen output") {
    val e = graft.functions.NfcNormalize(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(decomposed)))
    assert(e.eval(null).toString === composed)
    // the df path above runs through whole-stage codegen; dedup behavior:
    // normalized forms hash-join as duplicates
    val dedup = Seq((1L, composed), (2L, decomposed)).toDF("id", "s")
      .groupBy(call_function("nfc_normalize", col("s")).alias("k"))
      .count().collect()
    assert(dedup.length === 1 && dedup.head.getLong(1) === 2L,
      "un-normalized corpora under-deduplicate; normalized ones don't")
  }
}
