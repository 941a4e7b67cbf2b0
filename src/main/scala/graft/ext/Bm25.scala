package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 ranked retrieval (Robertson & Zaragoza 2009) — the scoring
  * function behind keyword search over a corpus, and the retrieval half
  * of dedup-by-query / contamination triage workflows. Layered on
  * [[TfIdf]]'s scan shapes with the same cross-engine determinism
  * discipline, extended to BM25's saturation term:
  *
  *   - IDF is staged as MICRO-NATS (`round(ln(1 + (N−df+0.5)/(df+0.5)) ·
  *     1e6)` as LONG) — the one transcendental leaves the engine as an
  *     exact integer.
  *   - The saturation `tf·(k1+1) / (tf + k1·(1−b + b·len/avgdl))` is a
  *     fixed tree of correctly-rounded IEEE ops over exact integer
  *     inputs — bit-identical in any engine that evaluates the same
  *     tree — then FLOORED TO DYADIC (2⁻²⁰) so per-document sums are
  *     association-order-free.
  *   - `k1 = 1.25`, `b = 0.75`: dyadic stand-ins for the classic
  *     1.2/0.75, so the literals parse exactly from decimal text in
  *     both engines.
  *
  * Scale shape: the query-term IDF table is |terms| rows (broadcast);
  * term frequencies restrict to query terms BEFORE the grouped count, so
  * the shuffle carries only matching occurrences; document lengths are a
  * per-doc scan-side `size(tokens)`. Nothing global but one metadata
  * aggregate (N, total tokens) for `avgdl`. */
object Bm25 {

  /** Dyadic BM25 constants (see scaladoc). */
  val K1 = 1.25
  val B = 0.75

  /** (token, idf_micro) in BM25 form over a corpus of `nDocs` docs,
    * restricted to `terms` (the query): `ln(1 + (N−df+0.5)/(df+0.5))`
    * in micro-nats. Always positive, unlike the raw Robertson idf. */
  def idf(tokenizedDf: DataFrame, nDocs: Long, terms: Seq[String]): DataFrame =
    tokenizedDf.filter(col("token").isInCollection(terms))
      .select("doc", "token").distinct()
      .groupBy("token").agg(count(lit(1)).alias("df"))
      .select(col("token"),
        round(log(lit(1d) + (lit(nDocs.toDouble) - col("df") + lit(0.5)) /
          (col("df") + lit(0.5))) * 1e6).cast("long").alias("idf_micro"))

  /** (doc, len) whitespace-token document lengths — zero-token docs kept
    * (they weight `avgdl`, even though they can never match a term). */
  def docLengths(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).alias("doc"),
      size(TextAnalysis.tokens(lower(col(textCol)))).alias("len"))

  /** One-row (n_docs, total_toks) corpus stats — `avgdl`'s exact integer
    * inputs, staged so any engine derives the identical double. */
  def stats(lens: DataFrame): DataFrame =
    lens.agg(count(lit(1)).alias("n_docs"),
      sum(col("len").cast("long")).alias("total_toks"))

  /** BM25 saturation, floored to dyadic (2⁻²⁰). `tf`/`len` integer
    * columns, `avgdl` a double column; the expression tree here is the
    * normative association order an oracle must mirror. */
  def saturation(tf: Column, len: Column, avgdl: Column): Column = {
    val raw = (tf.cast("double") * lit(K1 + 1)) /
      (tf.cast("double") + lit(K1) *
        (lit(1 - B) + lit(B) * (len.cast("double") / avgdl)))
    floor(raw * lit(1048576.0)) / lit(1048576.0)
  }

  /** Per-document BM25 score (micro-nat scale) for the query `terms`:
    * docs with at least one matching term, `Σ idf_micro·saturation`.
    * `idfDf` (token, idf_micro) and `statsDf` (n_docs, total_toks) are
    * broadcast; exact dyadic summands make the result order-free. */
  def score(tokenizedDf: DataFrame, lens: DataFrame, idfDf: DataFrame,
      statsDf: DataFrame): DataFrame = {
    val avgdl = col("total_toks").cast("double") / col("n_docs").cast("double")
    tokenizedDf
      .join(broadcast(idfDf), Seq("token"))
      .groupBy("doc", "token", "idf_micro").agg(count(lit(1)).alias("tf"))
      .join(lens, Seq("doc"))
      .crossJoin(broadcast(statsDf))
      .select(col("doc"), (col("idf_micro") *
        saturation(col("tf"), col("len"), avgdl)).alias("s"))
      .groupBy("doc").agg(sum(col("s")).alias("bm25_micro"))
  }
}
