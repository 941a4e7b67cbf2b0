package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling"):
  * pick from a raw crawl the documents whose hashed-n-gram profile looks
  * most like a small trusted TARGET corpus. (Reference analog: the
  * source/lang slicing of Amazon-Books-Review's cleaning notebook,
  * M: details cleaning — this is its learned, distribution-matching
  * upgrade, the selection stage most open LLM data pipelines run after
  * quality filtering.)
  *
  * The recipe, re-expressed Spark-first:
  *
  *   - FEATURES: hashed bag of unigrams + bigrams, `pmod(hash(g), dim)`
  *     — the paper's n-gram feature space, built as a pure SQL
  *     expression (same `hash` discipline as [[QualityClassifier]]; no
  *     UDF, fully codegen'd).
  *   - TRAIN (driver-coordinated, bounded): two bucket histograms — the
  *     target corpus' and a sample of the raw corpus' — each ONE
  *     `groupBy(bucket).count` over at most `maxSample` docs, collected
  *     at `dim` rows (metadata-sized, like the ANN codebook trainers).
  *     Per-bucket importance weight = `log p̂_target(b) − log q̂_raw(b)`
  *     with Laplace smoothing, rounded to dyadic rationals (2⁻²⁰).
  *   - SCORE scan-side: `logw(doc) = Σ_ngrams w[bucket(g)]` as a
  *     codegen'd `aggregate` over the n-gram array with the weight
  *     table as a broadcast plan literal — no shuffle, no model object
  *     on executors; cost is linear in the corpus.
  *   - SELECT: keep the top `frac` of each SOURCE by `(logw, doc_id)` —
  *     a window PARTITIONED by source (never a single global sort), so
  *     selection parallelizes across domains at 100 TB and doubles as
  *     the domain-balancing step real pipelines want anyway. The sorted
  *     payload is two narrow columns, not the documents.
  *
  * Cross-engine exactness: dyadic weights make every per-document sum
  * order-independent and exactly representable, so an oracle engine
  * recomputing `logw` from the staged (doc, bucket) pairs × (bucket, w)
  * table matches bit-for-bit, and the rank order (logw desc, doc_id) —
  * hence the keep verdict — can never flip on a rounding knife-edge. */
object Dsir {

  /** Hashed uni+bigram feature buckets of a document, expression form.
    * Bigrams join adjacent whitespace tokens with a single space; a
    * 0/1-token document contributes its unigrams only. */
  def ngramBuckets(text: Column, dim: Int): Column = {
    val toks = TextAnalysis.tokens(text)
    val m = greatest(size(toks) - 1, lit(0))
    val bigrams = zip_with(slice(toks, lit(1), m), slice(toks, lit(2), m),
      (a, b) => concat(a, lit(" "), b))
    transform(concat(toks, bigrams), g => pmod(hash(g), lit(dim)))
  }

  /** Per-bucket dyadic log-ratio weights; `weights(b)` scores one
    * feature-bucket occurrence. */
  final case class Model(weights: Array[Double]) {
    def dim: Int = weights.length
  }

  private def dyadic(x: Double): Double = math.rint(x * 1048576.0) / 1048576.0

  /** Laplace-smoothed bucket histogram of at most `maxSample` docs,
    * collected as a dense `dim`-length array (metadata-sized). */
  private def histogram(docs: DataFrame, textCol: String, dim: Int,
      maxSample: Int): Array[Long] = {
    val h = new Array[Long](dim)
    docs.select(col(textCol).alias("text")).filter(col("text").isNotNull)
      .limit(maxSample)
      .select(explode(ngramBuckets(col("text"), dim)).alias("b"))
      .groupBy("b").count().collect()
      .foreach(r => h(r.getInt(0)) = r.getLong(1))
    h
  }

  /** Fit importance weights from a target corpus and a raw-corpus
    * sample. Both histogram passes are sample-capped, so training cost
    * is flat in corpus size; only scoring scales with the data. */
  def train(target: DataFrame, raw: DataFrame, textCol: String,
      dim: Int = 1024, maxSample: Int = 100000): Model = {
    val p = histogram(target, textCol, dim, maxSample)
    val q = histogram(raw, textCol, dim, maxSample)
    val pTot = (p.sum + dim).toDouble
    val qTot = (q.sum + dim).toDouble
    Model(Array.tabulate(dim) { b =>
      dyadic(math.log((p(b) + 1.0) / pTot) - math.log((q(b) + 1.0) / qTot))
    })
  }

  /** Scan-side importance log-weight: `Σ_ngrams w[bucket(g)]` — exact
    * dyadic arithmetic, association-order-free. */
  def logWeight(text: Column, model: Model): Column =
    aggregate(ngramBuckets(text, model.dim), lit(0d),
      (acc, b) => acc + element_at(lit(model.weights), b + 1))

  /** The model as a (bucket, w) frame for staging beside the scored
    * corpus, so an external engine can replay scoring exactly. */
  def modelFrame(spark: org.apache.spark.sql.SparkSession,
      model: Model): DataFrame = {
    import spark.implicits._
    model.weights.zipWithIndex.map { case (w, b) => (b, w) }.toSeq
      .toDF("bucket", "w")
  }
}
