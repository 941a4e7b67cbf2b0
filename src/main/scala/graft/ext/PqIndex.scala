package graft.ext

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.{dot, l2Sq}

/** Product-quantization (PQ) ANN index — the memory-density step past SQ8
  * (extension tier, SURVEY.md §7.5): the vector is split into `m`
  * subspaces, each subspace gets its own small k-means codebook, and a
  * corpus vector is stored as `m` one-byte codes. A 64-dim f32 embedding
  * (256 bytes) compresses to 8 bytes — 32× — which is what makes a
  * 100 TB-corpus shortlist scan memory-bandwidth-feasible.
  *
  * Query scoring is ADC (asymmetric distance computation): the query stays
  * exact, a per-(query, subspace, code) lookup table of partial dot
  * products is built once (|Q|·m·nCodes rows — broadcast at any sane batch
  * size), and a candidate's approximate score is the SUM of its m table
  * hits. No corpus vector is touched until the exact rerank of the
  * (k × factor)-bounded shortlist.
  *
  * Cross-engine determinism: LUT entries are stored in integer MICRO units
  * (`round(dot(q_sub, center) · 1e6)` as LONG — the [[UnigramLm]] trick),
  * so the per-candidate ADC sum is an exact integer addition of m terms —
  * order-independent, bit-identical in any engine — and the shortlist rank
  * is engine-deterministic. The only float steps (codebook training, the
  * per-entry dot) happen once per (query, code), not per candidate.
  *
  * Scale shape: encoding is scan-side (broadcast one-row codebook +
  * per-subspace argmin — no shuffle, same pattern as
  * [[IvfIndex.Model.withCell]]); scoring shuffles only
  * (q_id, n_id, partial) with map-side combine; training is m small
  * k-means fits on one bounded hash-ordered sample.
  */
object PqIndex {

  /** `entries` is the flat (sub, code, center) codebook; `center` has
    * `subDim` doubles. */
  case class Model(m: Int, subDim: Int,
      entries: Seq[(Int, Int, Seq[Double])]) {

    def nCodes: Int = entries.iterator.map(_._2).max + 1

    /** Flat (sub, code, center) DataFrame — the broadcastable join side
      * for LUT construction, and the stage-to-parquet form. */
    def codebookDf(spark: SparkSession): DataFrame = {
      import spark.implicits._
      entries.toDF("sub", "code", "center")
    }

    /** One-row array<struct<sub,code,center>> carrier for scan-side
      * encoding (same literal-constant shape as [[graft.functions.NearestCellsL2]]). */
    def codebookOneRow(spark: SparkSession): DataFrame =
      codebookDf(spark)
        .agg(collect_list(struct(col("sub"), col("code"), col("center")))
          .alias("_cb"))

    /** Attach `codesCol` = array of m nearest-code ids (one per subspace).
      * Scan-side: broadcast cross join + per-subspace argmin-L2; the
      * corpus never shuffles and never leaves whole-stage codegen. */
    def encode(df: DataFrame, vecCol: String, codesCol: String): DataFrame =
      df.crossJoin(broadcast(codebookOneRow(df.sparkSession)))
        .withColumn(codesCol,
          transform(sequence(lit(0), lit(m - 1)), sub =>
            array_min(transform(
              filter(col("_cb"), e => e.getField("sub") === sub),
              e => struct(
                l2Sq(slice(col(vecCol), sub * subDim + 1, lit(subDim)),
                  e.getField("center")).alias("d"),
                e.getField("code").alias("code")))).getField("code")))
        .drop("_cb")

    /** (q_id, sub, code, lm) ADC lookup table over a (q_id, vec) query
      * batch — see [[PqIndex.lutMicro]]. */
    def lutMicro(queries: DataFrame): DataFrame =
      PqIndex.lutMicro(queries, codebookDf(queries.sparkSession), subDim)
  }

  /** (q_id, sub, code, lm) ADC lookup table from a (q_id, vec) query batch
    * and a flat (sub, code, center) codebook (possibly staged + re-read):
    * `lm = round(dot(q_sub, center) · 1e6)` as LONG. Size is
    * |Q|·m·nCodes rows — build once per batch, broadcast into scoring. */
  def lutMicro(queries: DataFrame, codebook: DataFrame,
      subDim: Int): DataFrame =
    queries.crossJoin(broadcast(codebook))
      .select(col("q_id"), col("sub"), col("code"),
        round(dot(slice(col("vec"), col("sub") * subDim + 1, lit(subDim)),
          col("center")) * 1e6).cast("long").alias("lm"))

  /** Train per-subspace codebooks on one bounded, order-insensitive sample
    * (hash-ordered limit — see [[IvfIndex.train]] for why a bare limit
    * regresses on clustered layouts). One sample, m seeded k-means fits. */
  def train(corpus: DataFrame, vecCol: String, dim: Int, m: Int = 8,
      nCodes: Int = 16, seed: Long = 42L, maxIter: Int = 5,
      sampleCap: Int = 20000): Model = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val subDim = dim / m
    val sample = corpus
      .select(col(vecCol).cast("array<double>").alias("v"),
        xxhash64(col(vecCol).cast("array<double>")).alias("_h"))
      .orderBy("_h").limit(sampleCap).drop("_h")
      .cache()
    try {
      val entries = (0 until m).flatMap { sub =>
        val feats = sample.select(array_to_vector(
          slice(col("v"), sub * subDim + 1, subDim)).alias("features"))
        val km = new KMeans().setK(nCodes).setSeed(seed + sub)
          .setMaxIter(maxIter).fit(feats)
        km.clusterCenters.zipWithIndex.map { case (c, code) =>
          (sub, code, c.toArray.toSeq)
        }
      }
      Model(m, subDim, entries)
    } finally sample.unpersist()
  }

  private val modelCache =
    scala.collection.concurrent.TrieMap.empty[(String, Int, Int, Long), Model]
  private val ModelCacheCap = 8

  /** [[train]] memoized per (corpusKey, m, nCodes, seed) — same contract
    * and bound as [[IvfIndex.trainCached]]. */
  def trainCached(corpusKey: String, corpus: DataFrame, vecCol: String,
      dim: Int, m: Int = 8, nCodes: Int = 16, seed: Long = 42L): Model = {
    if (modelCache.size >= ModelCacheCap) modelCache.clear()
    modelCache.getOrElseUpdate((s"$corpusKey#$vecCol", m, nCodes, seed),
      train(corpus, vecCol, dim, m, nCodes, seed))
  }

  /** Integer-exact ADC scores over PRE-ENCODED codes — the stage the
    * catalog entry stages for its oracle. `codes` is (n_id, codes),
    * `lut` from [[Model.lutMicro]]. Output (q_id, n_id, adc_micro). */
  def adcScores(codes: DataFrame, lut: DataFrame): DataFrame =
    codes
      .select(col("n_id"), posexplode(col("codes")).as(Seq("sub", "code")))
      .join(broadcast(lut), Seq("sub", "code"))
      .filter(col("n_id") =!= col("q_id"))
      .groupBy("q_id", "n_id")
      .agg(sum("lm").alias("adc_micro"))

  /** ADC shortlist (k × factor per query, ties on n_id) → exact f32
    * cosine rerank → top-k. `queryVecs`/`corpusVecs` are (id, vec). */
  def topKFromCodes(codes: DataFrame, lut: DataFrame, queryVecs: DataFrame,
      corpusVecs: DataFrame, k: Int, shortlistFactor: Int = 4): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("q_id")
      .orderBy(col("adc_micro").desc, col("n_id").asc)
    val shortlist = adcScores(codes, lut)
      .withColumn("_sr", row_number().over(w))
      .filter(col("_sr") <= k * shortlistFactor)
      .select("q_id", "n_id")
    Similarity.topKFromCandidates(shortlist, queryVecs, corpusVecs, k)
  }

  /** End-to-end PQ ANN top-k: train (cached), encode, LUT, shortlist,
    * exact rerank. */
  def topK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, dim: Int, k: Int, m: Int = 8, nCodes: Int = 16,
      shortlistFactor: Int = 4, seed: Long = 42L,
      corpusKey: String = ""): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val model =
      if (corpusKey.nonEmpty)
        trainCached(corpusKey, corpus, vecCol, dim, m, nCodes, seed)
      else train(corpus, vecCol, dim, m, nCodes, seed)
    val codes = model.encode(
      corpus.select(col(idCol).alias("n_id"), col(vecCol).alias("vec")),
      "vec", "codes").select("n_id", "codes")
    val lut = model.lutMicro(
      queries.select(col(idCol).alias("q_id"), col(vecCol).alias("vec")))
    topKFromCodes(codes, lut,
      queries.select(col(idCol).alias("id"), col(vecCol).alias("vec")),
      corpus.select(col(idCol).alias("id"), col(vecCol).alias("vec")),
      k, shortlistFactor)
  }
}
