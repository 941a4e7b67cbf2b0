package graft.ext

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality filtering — the classifier stage of the GPT-3 /
  * CCNet / LLaMA data pipelines (Brown et al. 2020 §A; Wenzek et al.
  * 2020): train a cheap linear model on hashed bag-of-words features to
  * distinguish reference-quality text from the rest of the crawl, then
  * score every document and keep the high scorers. (Reference analog:
  * the heuristic quality filters of Amazon-Books-Review's cleaning
  * notebook, M: details cleaning — this is their learned, corpus-tuned
  * upgrade.)
  *
  * The fasttext-shaped recipe, re-expressed Spark-first:
  *
  *   - TRAIN on a bounded sample (driver-coordinated, like the OPQ/PQ
  *     codebook trainers): MLlib `LogisticRegression` over `HashingTF`
  *     counts. Sample size is capped, so training cost is flat in corpus
  *     size — the 100 TB posture.
  *   - SCORE scan-side: `logit(doc) = bias + Σ_tokens w[pmod(hash(t), d)]`
  *     as a codegen'd `aggregate` over the token array with the weight
  *     vector as a broadcast plan literal. No shuffle, no UDF, no model
  *     object on the executors — the hot path is a pure expression.
  *
  * Feature-space consistency: training vectors are dense histograms of
  * the SAME `pmod(hash(t), d)` buckets the scorer walks — built as a
  * pure SQL expression (`transform(sequence, …)` counting matches per
  * bucket) and handed to MLlib through `array_to_vector`. One bucketing,
  * one implementation, shared by construction. (`ml.HashingTF` is
  * deliberately NOT used: its murmur3 variant — `hashUnsafeBytes2` —
  * differs from SQL `hash`'s `hashUnsafeBytes`, so a model trained in
  * HashingTF space silently mis-scores under expression bucketing;
  * QualityClassifierSpec pins the histogram/bucket agreement instead.)
  *
  * Cross-engine exactness: trained weights are rounded to dyadic
  * rationals (multiples of 2⁻²⁰) before use. Sums of such values at
  * document magnitudes are EXACT in IEEE double regardless of
  * association order, so the logit an oracle engine recomputes from the
  * staged weights matches Spark's bit-for-bit, and the keep verdict
  * (`logit >= 0` ⇔ probability ≥ 0.5) can never flip on a rounding
  * knife-edge between engines. */
object QualityClassifier {

  /** Hashed linear model: `weights(b)` is the coefficient of feature
    * bucket `b`; `logit = bias + Σ w(bucket(token))`. All values dyadic
    * (multiples of 2⁻²⁰). */
  final case class Model(weights: Array[Double], bias: Double) {
    def dim: Int = weights.length
  }

  /** Token → feature bucket, expression form: `pmod(hash(t), dim)`. */
  def buckets(text: Column, dim: Int): Column =
    transform(TextAnalysis.tokens(text), t => pmod(hash(t), lit(dim)))

  /** Dense histogram over an ALREADY-MATERIALIZED bucket array:
    * `counts[i] = |{b ∈ bkts : b = i}|`. The bucket column must be a
    * real column, not the [[buckets]] expression inline — a HOF lambda
    * body is not common-subexpression-eliminated, so an inline argument
    * would re-tokenize and re-hash the document once PER BUCKET
    * (dim× the work; the round-16 train-path regression). */
  def histogramOfBuckets(bkts: Column, dim: Int): Column =
    transform(sequence(lit(0), lit(dim - 1)),
      i => size(filter(bkts, b => b === i)).cast("double"))

  /** Dense per-document feature histogram in the scorer's own bucket
    * space. O(dim·tokens) per row ON TOP of one tokenization —
    * acceptable for the sample-capped TRAIN path only; the scoring path
    * never materializes it. Prefer materializing [[buckets]] to a
    * column and calling [[histogramOfBuckets]] in multi-row plans. */
  def bucketHistogram(text: Column, dim: Int): Column = {
    val bkts = buckets(text, dim)
    transform(sequence(lit(0), lit(dim - 1)),
      i => size(filter(bkts, b => b === i)).cast("double"))
  }

  /** Round to the nearest multiple of 2⁻²⁰ — the granularity that keeps
    * every partial sum of document-scale logits exactly representable. */
  private def dyadic(x: Double): Double = math.rint(x * 1048576.0) / 1048576.0

  private val modelCache =
    scala.collection.concurrent.TrieMap.empty[(String, Int, Int), Model]
  private val ModelCacheCap = 16

  /** Memoized [[train]] (the IvfIndex.trainCached pattern): one fit per
    * (corpusKey, dim, maxSample) per JVM — entries sharing a trained
    * filter (batch + streaming variants of the same corpus) pay the
    * bounded training cost once per bench/verify run, not per entry and
    * pass. Key on the corpus identity + label recipe, not the frame. */
  def trainCached(corpusKey: String, docs: DataFrame, textCol: String,
      labelCol: String, dim: Int = 512, maxSample: Int = 100000): Model = {
    if (modelCache.size >= ModelCacheCap) modelCache.clear()
    modelCache.getOrElseUpdate((corpusKey, dim, maxSample),
      train(docs, textCol, labelCol, dim, maxSample))
  }

  /** Fit the classifier on (text, label) rows. `maxSample` caps the
    * training set (head-capped like the ANN codebook trainers — training
    * is a driver-coordinated, bounded-cost stage; scoring is the part
    * that must scale). Weak labels come from whatever the pipeline
    * trusts: a reference corpus flag, a heuristic filter to distill, a
    * lexicon marker. */
  def train(docs: DataFrame, textCol: String, labelCol: String,
      dim: Int = 512, maxSample: Int = 100000): Model = {
    // limit() funnels to ONE partition — repartition spreads the
    // O(dim·tokens) feature build back across the cluster; buckets
    // materialize to a column FIRST so the histogram's dim lambdas
    // share one tokenize+hash pass (see histogramOfBuckets)
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val sample = docs
      .select(col(textCol).alias("text"),
        col(labelCol).cast("double").alias("label"))
      .filter(col("text").isNotNull && col("label").isNotNull)
      .limit(maxSample)
      .repartition(par)
      .withColumn("bkts", buckets(col("text"), dim))
      .select(col("label"),
        array_to_vector(histogramOfBuckets(col("bkts"), dim))
          .alias("features"))
    val lr = new LogisticRegression()
      // each LBFGS iteration is a scheduled treeAggregate job, so the
      // iteration cap is a JOB-COUNT cap: 30 converges on hashed-linear
      // features (tol still stops earlier when it can) at half the
      // fixed scheduling cost of the former 60
      .setMaxIter(30).setTol(1e-5).setRegParam(1e-3)
      .setStandardization(false).setFitIntercept(true)
    val fit = lr.fit(sample)
    Model(fit.coefficients.toArray.map(dyadic), dyadic(fit.intercept))
  }

  /** Scan-side logit: `bias + Σ_tokens w[bucket(t)]`. Exact dyadic
    * arithmetic — any engine summing the same staged weights over the
    * same tokens produces the identical double. */
  def logit(text: Column, model: Model): Column =
    aggregate(buckets(text, model.dim), lit(model.bias),
      (acc, b) => acc + element_at(lit(model.weights), b + 1))

  /** The filter verdict: probability ≥ 0.5 without evaluating the
    * sigmoid (exp differs in the last ulp across engines; the sign of
    * an exact logit cannot). */
  def keep(text: Column, model: Model): Column = logit(text, model) >= 0d

  /** The model as a (bucket, w) frame — bucket −1 carrying the bias —
    * for staging beside the scored corpus so an external engine can
    * replay scoring exactly. */
  def modelFrame(spark: org.apache.spark.sql.SparkSession,
      model: Model): DataFrame = {
    import spark.implicits._
    (model.weights.zipWithIndex
      .map { case (w, b) => (b, w) } :+ (-1, model.bias)).toSeq
      .toDF("bucket", "w")
  }
}
