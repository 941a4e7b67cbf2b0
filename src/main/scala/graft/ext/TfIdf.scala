package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TF-IDF keyword extraction — the per-document salient-terms operator a
  * corpus pipeline uses for topic tagging, near-dup triage, and index
  * keying. Same cross-engine determinism trick as [[UnigramLm]]: IDF is
  * stored as MICRO-NATS (`round(ln(N/df) · 1e6)` as LONG), so the score
  * `tf · idf_micro` is an exact integer product and ranking ties break on
  * the token string — no float comparison anywhere.
  *
  * Scale shape: document frequency is explode→distinct→count (partial
  * aggregation on both shuffles); the IDF table is |vocab| rows — small
  * enough to broadcast at any corpus size worth indexing; top-k per doc
  * runs on the custom [[graft.ops.TopK]] operator (bounded per-key heaps,
  * no partition sort).
  */
object TfIdf {

  /** (doc, token) occurrences — the shared scan both stages derive from.
    * Output column names are fixed: (`doc`, `token`). */
  def tokenized(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).alias("doc"),
      explode(TextAnalysis.tokens(lower(col(textCol)))).alias("token"))

  /** (token, idf_micro) over a corpus of `nDocs` documents:
    * `round(ln(nDocs / df) · 1e6)` with `df` the number of distinct
    * documents containing the token. Tokens in every document get 0. */
  def idf(tokenizedDf: DataFrame, nDocs: Long): DataFrame =
    tokenizedDf.select("doc", "token").distinct()
      .groupBy("token").agg(count(lit(1)).alias("df"))
      .select(col("token"),
        round(log(lit(nDocs.toDouble) / col("df")) * 1e6).cast("long")
          .alias("idf_micro"))

  /** (token, df) document frequencies — the persistable half of [[idf]],
    * split out so an index can be refreshed incrementally. */
  def docFreq(tokenizedDf: DataFrame): DataFrame =
    tokenizedDf.select("doc", "token").distinct()
      .groupBy("token").agg(count(lit(1)).alias("df"))

  /** Incremental IDF refresh: merge persisted per-batch `(token, df)`
    * tables (disjoint doc sets) and re-derive micro-nat IDF for the grown
    * corpus of `nDocs` documents — the base corpus text is NEVER
    * rescanned, only its |vocab|-row df table is. union → one grouped sum
    * per token (partial aggregation both engines); the finishing
    * `round(ln(N/df)·1e6)` is a single IEEE expression from exact integer
    * inputs, so the refreshed table stays bit-stable. */
  def mergeIdf(dfTables: Seq[DataFrame], nDocs: Long): DataFrame =
    dfTables.reduce(_.unionByName(_))
      .groupBy("token").agg(sum(col("df")).alias("df"))
      .select(col("token"), col("df"),
        round(log(lit(nDocs.toDouble) / col("df")) * 1e6).cast("long")
          .alias("idf_micro"))

  /** (doc, token, tf) in-document term frequencies. */
  def termFreq(tokenizedDf: DataFrame): DataFrame =
    tokenizedDf.groupBy("doc", "token").agg(count(lit(1)).alias("tf"))

  /** Top-`k` terms per document by exact integer score `tf · idf_micro`,
    * ties broken on the token string. `idfDf` is broadcast — persist it
    * once per corpus and reuse across batches. */
  def topTerms(tf: DataFrame, idfDf: DataFrame, k: Int): DataFrame =
    graft.ops.TopK.perKey(
      tf.join(broadcast(idfDf), Seq("token"))
        .select(col("doc"), col("token"), col("tf"),
          (col("tf") * col("idf_micro")).alias("score")),
      Seq("doc"), Seq(("score", false), ("token", true)), k)
}
