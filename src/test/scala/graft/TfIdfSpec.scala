package graft

import org.apache.spark.sql.functions._

import graft.ext.TfIdf

/** TF-IDF derivation invariants (what the staged-IDF oracle cannot see):
  * the micro-nat values, everywhere-token zeroing, and exact ranking. */
class TfIdfSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "apple banana apple"),
    (2L, "apple cherry"),
    (3L, "apple date date date")).toDF("doc_id", "text")

  test("idf is round(ln(N/df) * 1e6); everywhere-tokens get exactly 0") {
    val idf = TfIdf.idf(TfIdf.tokenized(docs, "doc_id", "text"), 3L)
      .as[(String, Long)].collect().toMap
    assert(idf("apple") === 0L)                                   // df = 3
    assert(idf("banana") === math.round(math.log(3.0) * 1e6))     // df = 1
    assert(idf("cherry") === math.round(math.log(3.0) * 1e6))
    assert(idf("date") === math.round(math.log(3.0) * 1e6))
  }

  test("top terms rank by exact tf*idf with token tie-break") {
    val tok = TfIdf.tokenized(docs, "doc_id", "text")
    val top = TfIdf.topTerms(TfIdf.termFreq(tok), TfIdf.idf(tok, 3L), k = 1)
      .select("doc", "token", "score").as[(Long, String, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val ln3 = math.round(math.log(3.0) * 1e6)
    assert(top(1L) === (("banana", ln3)))       // apple scores 0 despite tf=2
    assert(top(2L) === (("cherry", ln3)))
    assert(top(3L) === (("date", 3 * ln3)))     // tf=3 multiplies exactly
  }

  test("ties beyond score break deterministically on the token string") {
    val d = Seq((1L, "zeta alpha"), (2L, "other")).toDF("doc_id", "text")
    val tok = TfIdf.tokenized(d, "doc_id", "text")
    val top = TfIdf.topTerms(TfIdf.termFreq(tok), TfIdf.idf(tok, 2L), k = 1)
      .filter(col("doc") === 1L).select("token").as[String].collect()
    assert(top.toSeq === Seq("alpha")) // same score, lexicographic wins
  }
}
