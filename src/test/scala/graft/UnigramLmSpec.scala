package graft

import org.apache.spark.sql.functions._

import graft.ext.UnigramLm

/** Unigram LM derivation invariants (the part the staged-vocab oracle
  * cannot see): micro-nat values, OOV floor, minCount, score ordering. */
class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  // 10 tokens total: "the" x6, "cat" x3, "rare" x1
  private val train = Seq(
    (1L, "the the the cat"), (2L, "the the the cat cat rare"))
    .toDF("doc_id", "text")

  test("vocab log-probs are round(ln(cnt/total) * 1e6) over the FULL mass") {
    val counts = UnigramLm.unigramCounts(train, "text")
    val total = UnigramLm.totalTokens(counts)
    assert(total === 10L)
    val v = UnigramLm.vocab(counts, total, minCount = 1)
      .as[(String, Long)].collect().toMap
    assert(v("the") === math.round(math.log(0.6) * 1e6))
    assert(v("cat") === math.round(math.log(0.3) * 1e6))
    assert(v("rare") === math.round(math.log(0.1) * 1e6))
  }

  test("minCount drops rare tokens from the vocab but not from the mass") {
    val counts = UnigramLm.unigramCounts(train, "text")
    val total = UnigramLm.totalTokens(counts)
    val v = UnigramLm.vocab(counts, total, minCount = 2)
      .as[(String, Long)].collect().toMap
    assert(v.keySet === Set("the", "cat"))
    // "the" still scores against total=10, not the surviving mass
    assert(v("the") === math.round(math.log(0.6) * 1e6))
  }

  test("OOV floor: ln(1/total), below every in-vocab token") {
    val total = 10L
    assert(UnigramLm.oovMicro(total) === math.round(math.log(0.1) * 1e6))
    assert(UnigramLm.oovMicro(total) <= math.round(math.log(0.1) * 1e6))
  }

  test("scores: common text outranks rare, OOV text floors; exact sums") {
    val docs = Seq((10L, "the the cat"), (11L, "rare rare"),
      (12L, "xyzzy plugh"), (13L, "")).toDF("doc_id", "text")
    val scored = UnigramLm.trainAndScore(docs, train, "doc_id", "text",
      minCount = 1)
      .select("doc_id", "n_tokens", "lp_sum", "avg_lp")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    val lpThe = math.round(math.log(0.6) * 1e6)
    val lpCat = math.round(math.log(0.3) * 1e6)
    val lpRare = math.round(math.log(0.1) * 1e6)
    val oov = UnigramLm.oovMicro(10L)
    assert(scored(10L) === ((10L, 3L, 2 * lpThe + lpCat,
      (2 * lpThe + lpCat).toDouble / 3e6)))
    assert(scored(11L)._3 === 2 * lpRare)
    assert(scored(12L)._3 === 2 * oov)
    assert(scored(10L)._4 > scored(11L)._4 && scored(11L)._4 >= scored(12L)._4)
    // empty doc: no tokens, absent from output by contract
    assert(!scored.contains(13L))
  }

  test("case-insensitive: tokens are lowercased on both train and score") {
    val docs = Seq((1L, "THE The the")).toDF("doc_id", "text")
    val scored = UnigramLm.trainAndScore(docs, train, "doc_id", "text",
      minCount = 1).select("lp_sum").as[Long].head()
    assert(scored === 3 * math.round(math.log(0.6) * 1e6))
  }
}
