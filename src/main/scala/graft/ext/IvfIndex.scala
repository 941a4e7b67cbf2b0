package graft.ext

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.functions.VectorFunctions.l2Sq

/** IVF (inverted-file) ANN index: k-means cells over the corpus, queries
  * probe their `nProbe` nearest cells (SURVEY.md §7.5 similarity-search
  * scale path, alternative to hyperplane LSH).
  *
  * Scale design: training samples the corpus (k-means on a bounded sample,
  * no extra count pass); cell assignment is one pass over the corpus with
  * the centroid table attached via a BROADCAST single-row cross join — the
  * centroids are runtime data, so cell count is bounded by executor memory
  * (√n cells at 100 TB is 10⁵⁺ centroids), not by plan/codegen size the
  * way a literal-array argmin would be. The probe join is an equi-join on
  * cell id — hash-partitionable, per-cell candidate lists ~n/nCells.
  */
object IvfIndex {

  case class Model(centers: Seq[Seq[Double]]) {
    def nCells: Int = centers.length

    /** One-row DataFrame carrying every centroid in a single
      * array<struct<cell,center>> column — broadcast onto scans below.
      * Callers joining BOTH a corpus side and a query side should build
      * this once and pass it to both attach methods, so the two
      * broadcast exchanges share one relation (Catalyst's ReuseExchange
      * then ships the centroids once, not twice). */
    def centroidsDf(spark: SparkSession): DataFrame = {
      import spark.implicits._
      centers.zipWithIndex.map { case (c, i) => (i, c) }
        .toDF("cell", "center")
        .agg(collect_list(struct(col("cell"), col("center")))
          .alias("_centroids"))
    }

    /** Per-row argmin-L2 over the attached centroid array. */
    private def argminCell(vec: Column): Column =
      array_min(transform(col("_centroids"),
        c => struct(l2Sq(vec, c.getField("center")).alias("d"),
          c.getField("cell").alias("cell")))).getField("cell")

    /** Attach `cellCol` = nearest-centroid cell id (scan-side: broadcast
      * cross join + per-row argmin, no shuffle of the corpus). */
    def withCell(df: DataFrame, vecCol: String, cellCol: String,
        centroids: DataFrame = null): DataFrame = {
      val cdf = Option(centroids).getOrElse(centroidsDf(df.sparkSession))
      df.crossJoin(broadcast(cdf))
        .withColumn(cellCol, argminCell(col(vecCol)))
        .drop("_centroids")
    }

    /** Attach `cellsCol` = the `nProbe` nearest cell ids, as an array. */
    def withProbeCells(df: DataFrame, vecCol: String, cellsCol: String,
        nProbe: Int, centroids: DataFrame = null): DataFrame = {
      val cdf = Option(centroids).getOrElse(centroidsDf(df.sparkSession))
      df.crossJoin(broadcast(cdf))
        .withColumn(cellsCol,
          transform(
            slice(array_sort(transform(col("_centroids"),
              c => struct(l2Sq(col(vecCol), c.getField("center")).alias("d"),
                c.getField("cell").alias("cell")))), 1, nProbe),
            s => s.getField("cell")))
        .drop("_centroids")
    }
  }

  private val modelCache =
    scala.collection.concurrent.TrieMap.empty[(String, Int, Long), Model]
  private val ModelCacheCap = 8

  /** [[train]] memoized per (corpusKey, nCells, seed): an IVF index is
    * built once and served for many query batches — re-running k-means
    * per query both dominates latency and mismodels the operator. The
    * caller's key names the corpus (e.g. its data directory); same key +
    * seeded k-means ⇒ the cached model is identical to a fresh train, so
    * caching never changes results. Bounded: past [[ModelCacheCap]]
    * distinct keys the cache is cleared wholesale (a model is ~nCells×dim
    * doubles — rotating corpus keys in a long-lived driver must not
    * accumulate dead centroid tables). */
  def trainCached(corpusKey: String, corpus: DataFrame, vecCol: String,
      nCells: Int, seed: Long = 42L): Model = {
    if (modelCache.size >= ModelCacheCap) modelCache.clear()
    modelCache.getOrElseUpdate((s"$corpusKey#$vecCol", nCells, seed),
      train(corpus, vecCol, nCells, seed))
  }

  /** Train centroids with distributed k-means on a bounded sample.
    *
    * The sample is deterministic AND order-insensitive, still with no
    * count pass: rows are ranked by a content hash and the lowest
    * `sampleCap` kept (`orderBy(hash).limit(cap)` plans as
    * TakeOrderedAndProject — a bounded per-partition heap, not a full
    * sort). A bare `limit(cap)` took the first files in scan order, so a
    * clustered/sorted layout trained centroids on one region of the space
    * and recall fell off a cliff. At very large corpora pass
    * `sampleRate` (a scan-side hash-prefix pre-filter, the same trick as
    * [[PipelineOps.stratifiedSample]]) sized so ~2-5× sampleCap rows
    * survive; the ordered backstop then only ranks that sliver. */
  def train(corpus: DataFrame, vecCol: String, nCells: Int,
      seed: Long = 42L, maxIter: Int = 5, sampleCap: Int = 20000,
      sampleRate: Double = 1.0): Model = {
    val hash = xxhash64(col(vecCol).cast("array<double>"))
    val pre =
      if (sampleRate >= 1.0) corpus
      else corpus.filter(pmod(hash, lit(1000000L)) < (sampleRate * 1e6).toLong)
    val feats = pre.select(array_to_vector(
        col(vecCol).cast("array<double>")).alias("features"),
        hash.alias("_h"))
      .orderBy("_h").limit(sampleCap)
      .drop("_h")
    val model = new KMeans().setK(nCells).setSeed(seed).setMaxIter(maxIter)
      .fit(feats)
    Model(model.clusterCenters.map(_.toArray.toSeq).toSeq)
  }

  /** Distinct (q_id, n_id) candidate pairs: assign corpus rows to cells,
    * probe `nProbe` cells per query, equi-join on cell id. Only ids cross
    * the candidate shuffle; vectors join back at scoring time. */
  def candidates(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, model: Model, nProbe: Int): DataFrame = {
    // one centroid relation for both sides → one broadcast (ReuseExchange)
    val cdf = model.centroidsDf(corpus.sparkSession)
    val c = model.withCell(
        corpus.select(col(idCol).alias("n_id"), col(vecCol).alias("n_vec")),
        "n_vec", "cell", cdf)
      .select("n_id", "cell")
    val q = model.withProbeCells(
        queries.select(col(idCol).alias("q_id"), col(vecCol).alias("q_vec")),
        "q_vec", "cells", nProbe, cdf)
      .select(col("q_id"), explode(col("cells")).alias("cell"))
    c.join(q, Seq("cell"))
      .filter(col("n_id") =!= col("q_id"))
      .select("q_id", "n_id")
      .dropDuplicates("q_id", "n_id")
  }

  /** ANN top-k: assign corpus to cells, probe nProbe cells per query,
    * exact cosine + top-k on the candidates. */
  def topK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nCells: Int = 16, nProbe: Int = 4,
      seed: Long = 42L): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    val model = train(corpus, vecCol, nCells, seed)
    Similarity.topKFromCandidates(
      candidates(corpus, queries, idCol, vecCol, model, nProbe),
      queries.select(col(idCol).alias("id"), col(vecCol).alias("vec")),
      corpus.select(col(idCol).alias("id"), col(vecCol).alias("vec")), k)
  }
}
