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
  * no extra count pass); cell assignment is one scan-side pass through the
  * native codegen'd [[graft.functions.NearestCellsL2]] argmin — the
  * centroid matrix rides the expression as a constant (no join, no
  * per-row copy of the centroid array; the r8 probe measured the previous
  * broadcast-cross-join + interpreted-HOF argmin as the dominant
  * super-linear term once cells grow with the corpus). Constant-size
  * ceiling ~10⁴ cells × dim; past that (10⁵⁺ cells at fleet scale) chain
  * two coarse→fine NearestCells levels of √cells each. The probe join is
  * an equi-join on cell id — hash-partitionable, per-cell candidate lists
  * ~n/nCells.
  */
object IvfIndex {

  case class Model(centers: Seq[Seq[Double]]) {
    def nCells: Int = centers.length

    /** `k` nearest cell ids as a Column — the native codegen'd argmin
      * (see [[graft.functions.NearestCellsL2]]); ties break to the lower
      * cell id, matching the previous struct-min ordering. */
    private def nearestCells(spark: SparkSession, vec: Column, k: Int): Column = {
      GraftFunctions.register(spark)
      call_function("nearest_cells", vec,
        typedLit[Seq[Seq[Double]]](centers), lit(k))
    }

    /** Attach `cellCol` = nearest-centroid cell id (pure scan-side
      * projection — no join, the centroid matrix is an expression
      * constant). */
    def withCell(df: DataFrame, vecCol: String, cellCol: String): DataFrame =
      df.withColumn(cellCol,
        element_at(nearestCells(df.sparkSession, col(vecCol), 1), 1))

    /** Attach `cellsCol` = the `nProbe` nearest cell ids, as an array. */
    def withProbeCells(df: DataFrame, vecCol: String, cellsCol: String,
        nProbe: Int): DataFrame =
      df.withColumn(cellsCol,
        nearestCells(df.sparkSession, col(vecCol), nProbe))
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
    val c = model.withCell(
        corpus.select(col(idCol).alias("n_id"), col(vecCol).alias("n_vec")),
        "n_vec", "cell")
      .select("n_id", "cell")
    val q = model.withProbeCells(
        queries.select(col(idCol).alias("q_id"), col(vecCol).alias("q_vec")),
        "q_vec", "cells", nProbe)
      .select(col("q_id"), explode(col("cells")).alias("cell"))
    c.join(q, Seq("cell"))
      .filter(col("n_id") =!= col("q_id"))
      .select("q_id", "n_id")
      .dropDuplicates("q_id", "n_id")
  }

  /** Two-level (coarse → fine) candidate generation — the fleet-scale
    * probe shape the flat form can't reach: with 10⁵⁺ fine cells at
    * 100 TB, ranking EVERY fine centroid per query is itself a
    * cells × dim scan. Here a coarse codebook (√cells centroids, trained
    * over the fine centroid table — driver-local, it is √cells points)
    * routes each query to `nProbeCoarse` coarse groups, and only the fine
    * cells INSIDE those groups are distance-ranked (per query:
    * √cells + nProbeCoarse·√cells distances instead of cells). Corpus
    * rows keep their one-off flat assignment (index-build cost, amortized
    * over every query batch). Same candidate contract as [[candidates]]:
    * distinct (q_id, n_id), ids only through the shuffle. */
  def twoLevelCandidates(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, fine: Model, coarseCells: Int,
      nProbeCoarse: Int, nProbeFine: Int): DataFrame = {
    val spark = corpus.sparkSession
    GraftFunctions.register(spark)
    import spark.implicits._
    // coarse codebook over the fine CENTROIDS (tiny: |fine| rows)
    val centroidRows = fine.centers.zipWithIndex
      .map { case (c, i) => (i, c) }.toDF("fine_cell", "center")
    val coarse = train(centroidRows, "center", coarseCells, maxIter = 10)
    // fine-cell → coarse-group routing table (|fine| rows, broadcast)
    val routing = coarse.withCell(centroidRows, "center", "coarse_cell")
    val c = fine.withCell(
        corpus.select(col(idCol).alias("n_id"), col(vecCol).alias("n_vec")),
        "n_vec", "cell")
      .select("n_id", "cell")
    // query side: nProbeCoarse coarse groups → rank only THEIR fine cells
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("_d"), col("fine_cell"))
    val q = coarse.withProbeCells(
        queries.select(col(idCol).alias("q_id"), col(vecCol).alias("q_vec")),
        "q_vec", "ccells", nProbeCoarse)
      .select(col("q_id"), col("q_vec"), explode(col("ccells")).alias("coarse_cell"))
      .join(broadcast(routing), Seq("coarse_cell"))
      .withColumn("_d", l2Sq(col("q_vec").cast("array<double>"), col("center")))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= nProbeFine)
      .select(col("q_id"), col("fine_cell").alias("cell"))
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
