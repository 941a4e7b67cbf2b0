package graft.ext

import scala.util.Random

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.functions.VectorFunctions.{cosineNative, dot}

/** Approximate & exact nearest-neighbor search over an embedding column
  * (extension tier, SURVEY.md §7.5).
  *
  * Scale design (100 TB posture):
  *   - [[bruteForceTopK]]: the query side is broadcast (queries ≪ corpus);
  *     the corpus is scanned once, scored in whole-stage codegen, and only
  *     (n_queries × k)-bounded rows survive the final per-query top-k. The
  *     shuffle moves scored candidate rows keyed by query — no corpus
  *     replication.
  *   - [[lshTopK]]: random-hyperplane LSH. Bucket signatures are computed
  *     scan-side with literal plane vectors (no shuffle, no extra pass);
  *     candidates meet via an equi-join on (bucket), so the join is
  *     hash-partitionable and skew-bounded by bucket size. Multi-probe =
  *     OR over signatures with one bit flipped (probes ≤ nPlanes).
  */
object Similarity {

  /** Exact top-k cosine neighbors for each query vector.
    *
    * @param corpus  (idCol, vecCol) table — the big side
    * @param queries (idCol, vecCol) table — small, broadcast
    */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      excludeSelf: Boolean = true): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    val q = queries.select(
      col(idCol).alias("q_id"), col(vecCol).alias("q_vec"))
    val c = corpus.select(
      col(idCol).alias("n_id"), col(vecCol).alias("n_vec"))
    val scored = c.join(broadcast(q),
        if (excludeSelf) col("n_id") =!= col("q_id") else lit(true))
      .select(col("q_id"), col("n_id"),
        cosineNative(col("q_vec"), col("n_vec")).alias("score"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("score").desc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Deterministic pseudo-random hyperplanes (fixed seed — reproducible
    * across runs and executors; planes travel as literals, not data). */
  private[ext] def planes(nPlanes: Int, dim: Int, seed: Long): Seq[Seq[Double]] = {
    val rnd = new Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Plane count for a corpus size: buckets ≈ n / targetBucketSize, so
    * nPlanes = ⌈log2(n / targetBucketSize)⌉ — the dial that keeps per-
    * bucket candidate lists bounded as the corpus grows. */
  def planesFor(corpusSize: Long, targetBucketSize: Int = 256): Int =
    math.max(1, math.ceil(math.log(
      math.max(corpusSize.toDouble / targetBucketSize, 2.0)) / math.log(2)).toInt)

  /** Sign-bit LSH bucket signature for a vector column. */
  def lshSignature(vec: Column, planeVecs: Seq[Seq[Double]]): Column =
    planeVecs.zipWithIndex.map { case (p, i) =>
      when(dot(vec, typedlit(p)) > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Distinct (q_id, n_id) LSH candidate pairs: bucket the corpus, probe
    * each query's own bucket plus every 1-bit-flipped neighbor, equi-join
    * on bucket. This is the stage to materialize at corpus scale — it
    * carries only ids through the shuffle; vectors join back in
    * [[topKFromCandidates]] once per surviving candidate. */
  def lshCandidates(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String,
      nPlanes: Int = 12, dim: Int = 64, seed: Long = 42L): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    val pv = planes(nPlanes, dim, seed)
    val c = corpus.select(
      col(idCol).alias("n_id"),
      lshSignature(col(vecCol), pv).alias("bucket"))
    // queries probe their own bucket plus each 1-bit-flipped neighbor bucket
    val probeBuckets = array(
      (lit(-1L) +: (0 until nPlanes).map(i => lit(1L << i))): _*)
    val q = queries.select(
        col(idCol).alias("q_id"),
        lshSignature(col(vecCol), pv).alias("q_bucket"))
      .withColumn("probe", explode(probeBuckets))
      .select(col("q_id"),
        when(col("probe") === -1L, col("q_bucket"))
          .otherwise(expr("q_bucket ^ probe")).alias("bucket"))
      .dropDuplicates("q_id", "bucket")
    c.join(q, Seq("bucket"))
      .filter(col("n_id") =!= col("q_id"))
      .select("q_id", "n_id")
      .dropDuplicates("q_id", "n_id")
  }

  /** Exact-cosine scoring + bounded per-query rank over candidate pairs
    * (from [[lshCandidates]], [[graft.ext.IvfIndex]], or a staged table).
    * `queryVectors` / `corpusVectors` are (id, vec) tables — separate, so
    * a query that is NOT a corpus row keeps its own vector (collapsing
    * both to one lookup table would silently drop or mis-score
    * out-of-corpus queries). */
  def topKFromCandidates(candidates: DataFrame, queryVectors: DataFrame,
      corpusVectors: DataFrame, k: Int): DataFrame = {
    GraftFunctions.register(candidates.sparkSession)
    val qv = queryVectors.select(col("id").alias("q_id"), col("vec").alias("q_vec"))
    val nv = corpusVectors.select(col("id").alias("n_id"), col("vec").alias("n_vec"))
    val scored = candidates.join(qv, Seq("q_id")).join(nv, Seq("n_id"))
      .select(col("q_id"), col("n_id"),
        cosineNative(col("q_vec"), col("n_vec")).alias("score"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("score").desc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** ANN top-k via hyperplane LSH with 1-bit multi-probe.
    *
    * Recall/cost dial: more planes → smaller buckets (faster, lower recall);
    * multi-probe recovers recall without re-partitioning the corpus.
    */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nPlanes: Int = 12, dim: Int = 64, seed: Long = 42L): DataFrame =
    topKFromCandidates(
      lshCandidates(corpus, queries, idCol, vecCol, nPlanes, dim, seed),
      queries.select(col(idCol).alias("id"), col(vecCol).alias("vec")),
      corpus.select(col(idCol).alias("id"), col(vecCol).alias("vec")), k)

  /** Symmetric per-vector int8 quantization: each component is scaled by
    * 127 / max|vᵢ| and rounded, so the full int8 range is used and the
    * sign structure is preserved. Cosine is scale-invariant, so ranking by
    * quantized cosine needs NO dequantization — the per-vector scale
    * cancels. All-zero vectors quantize to all zeros (guarded against
    * 0-division) and are dropped by the zero-norm cosine guard downstream,
    * matching [[graft.functions.VectorFunctions.cosine]] semantics. */
  def quantizeSq8(vec: Column): Column = {
    val scale = greatest(array_max(transform(vec, x => abs(x))),
      lit(Float.MinPositiveValue)) / lit(127.0f)
    transform(vec, x => round(x / scale).cast("byte"))
  }

  /** Quantized cosine between two MATERIALIZED int8 vectors — integer
    * dots ([[graft.functions.ByteVecDot]], exact, order-independent) with
    * one f64 division at the end; NULL on zero norms. */
  def sq8Cosine(a: Column, b: Column): Column = {
    val np = sqrt(call_function("vec_dot_i8", a, a).cast("double") *
      call_function("vec_dot_i8", b, b).cast("double"))
    when(np === 0d, lit(null).cast("double"))
      .otherwise(call_function("vec_dot_i8", a, b).cast("double") / np)
  }

  /** ANN top-k via SQ8 shortlist + exact rerank — the memory-bandwidth
    * scale path (int8 is 4× smaller than f32 through cache, shuffle, and
    * broadcast): the corpus-×-queries sweep scores QUANTIZED vectors
    * only, a per-query shortlist of `k × shortlistFactor` survives, and
    * exact f32 cosine reranks just the shortlist. Recall loss is the
    * quantization error of a 1/127-step grid — tiny against typical
    * neighbor gaps (pinned in `Sq8Spec`); raise `shortlistFactor` to
    * trade compute back for recall. */
  def sq8TopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      shortlistFactor: Int = 4): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    val q = queries.select(col(idCol).alias("q_id"),
      quantizeSq8(col(vecCol)).alias("q_q"), col(vecCol).alias("q_vec"))
    val c = corpus.select(col(idCol).alias("n_id"),
      quantizeSq8(col(vecCol)).alias("n_q"), col(vecCol).alias("n_vec"))
    sq8TopKFromQuantized(c, q, k, shortlistFactor)
  }

  /** The shortlist + rerank over PRE-QUANTIZED (id, qvec, vec) tables —
    * the stage to materialize at corpus scale (and the stage the catalog
    * entry stages for its oracle: integer dots are engine-exact, so DuckDB
    * replays shortlist AND rerank bit-for-bit). */
  def sq8TopKFromQuantized(corpus: DataFrame, queries: DataFrame,
      k: Int, shortlistFactor: Int = 4): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    // the full-corpus sweep touches ONLY int8 vectors and emits only ids —
    // f32 vectors join back for the (k × factor)-bounded shortlist
    val swept = corpus.select(col("n_id"), col("n_q"))
      .join(broadcast(queries.select(col("q_id"), col("q_q"))),
        col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id"),
        sq8Cosine(col("q_q"), col("n_q")).alias("cos_q"))
    val wq = Window.partitionBy("q_id")
      .orderBy(col("cos_q").desc, col("n_id").asc)
    val shortlist = swept
      .withColumn("_sr", row_number().over(wq))
      .filter(col("_sr") <= k * shortlistFactor)
      .select("q_id", "n_id")
    val reranked = shortlist
      .join(broadcast(queries.select(col("q_id"), col("q_vec"))), Seq("q_id"))
      .join(corpus.select(col("n_id"), col("n_vec")), Seq("n_id"))
      .select(col("q_id"), col("n_id"),
        cosineNative(col("q_vec"), col("n_vec")).alias("score"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("score").desc, col("n_id").asc)
    reranked.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
