package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram language-model scoring — the CCNet/KenLM-style perplexity
  * filter of a training-data pipeline, reduced to its Spark-shaped core:
  * train token log-probabilities on a reference slice of the corpus, then
  * score every document by its mean token log-probability. Low scores are
  * gibberish/boilerplate/wrong-language; the score column feeds the same
  * threshold gate as [[TextAnalysis.qualityScore]].
  *
  * Cross-engine determinism: log-probs are stored as MICRO-NATS
  * (`round(ln(p) · 1e6)` as LONG), so the per-document aggregation is an
  * exact integer sum — order-independent, bit-identical on any engine —
  * and the only floating-point step is one final division. A double
  * log-prob column would make the score depend on partition arrival order.
  *
  * Scale shape: training is one explode + one hash-aggregate over the
  * reference slice (partial map-side combine makes the shuffle carry
  * (token, partial_count), not tokens). Scoring joins exploded tokens
  * against the vocabulary — a few million rows even for a 100 TB corpus,
  * so it broadcasts — then partially aggregates (id, partial_sum) before
  * the per-document shuffle. Nothing wider than (token, long) moves.
  */
object UnigramLm {

  /** (token, cnt) counts over the lowercased whitespace tokens of
    * `textCol` — the trainable sufficient statistic. Persist this (not the
    * derived vocab) if the LM is re-derived with different smoothing. */
  def unigramCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextAnalysis.tokens(lower(col(textCol)))).alias("token"))
      .groupBy("token").agg(count(lit(1)).alias("cnt"))

  /** Total token mass of a counts table (one scalar — the same sanctioned
    * driver-side collect shape as the reference's mean imputation). */
  def totalTokens(counts: DataFrame): Long =
    counts.agg(sum("cnt")).first().getLong(0)

  /** (token, lp_micro) vocabulary: natural-log probability in micro-nats
    * for every token with `cnt >= minCount`. Probabilities use the FULL
    * token mass (including below-min tokens), so the distribution stays
    * proper and adding rare tokens never inflates common tokens' scores.
    * A count threshold (not top-k) keeps derivation shuffle-free — no
    * global sort at corpus scale; tune coverage with `minCount`. */
  def vocab(counts: DataFrame, total: Long, minCount: Long = 2): DataFrame =
    counts.filter(col("cnt") >= minCount)
      .select(col("token"),
        round(log(col("cnt").cast("double") / total) * 1e6).cast("long")
          .alias("lp_micro"))

  /** Out-of-vocabulary penalty in micro-nats: ln(1/total) — the floor any
    * in-vocab token beats (a single unseen-token mass, Laplace-style). */
  def oovMicro(total: Long): Long = math.round(math.log(1.0 / total) * 1e6)

  /** Score documents against a trained vocabulary:
    * (idCol, n_tokens, lp_sum, avg_lp) with `lp_sum` the exact integer sum
    * of per-token micro-nat log-probs (OOV tokens get `oov`) and
    * `avg_lp = lp_sum / (n_tokens · 1e6)` nats/token. Empty documents have
    * no tokens and are absent from the output — gate them separately on
    * token count. */
  def score(docs: DataFrame, idCol: String, textCol: String,
      vocabDf: DataFrame, oov: Long): DataFrame =
    docs.select(col(idCol),
        explode(TextAnalysis.tokens(lower(col(textCol)))).alias("token"))
      .join(broadcast(vocabDf), Seq("token"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).alias("n_tokens"),
        sum(coalesce(col("lp_micro"), lit(oov))).alias("lp_sum"))
      .withColumn("avg_lp",
        col("lp_sum").cast("double") / (col("n_tokens") * 1e6))

  /** Train-and-score in one call: fit on `trainSlice`, score `docs`. */
  def trainAndScore(docs: DataFrame, trainSlice: DataFrame, idCol: String,
      textCol: String, minCount: Long = 2): DataFrame = {
    val counts = unigramCounts(trainSlice, textCol)
    val total = totalTokens(counts)
    score(docs, idCol, textCol, vocab(counts, total, minCount),
      oovMicro(total))
  }
}
