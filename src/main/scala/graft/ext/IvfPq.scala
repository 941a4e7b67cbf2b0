package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.dot

/** IVF-PQ with RESIDUAL encoding — the standard composition at fleet
  * scale (Jégou et al. 2011 "Product Quantization for Nearest Neighbor
  * Search" §V; FAISS's IndexIVFPQ): the corpus vector is assigned to its
  * IVF cell and the product quantizer encodes the RESIDUAL
  * `r = x − c_cell` instead of the absolute vector. Residuals of a
  * clustered corpus concentrate near the origin with far smaller dynamic
  * range than the vectors themselves, so the same code budget (m × one
  * byte) quantizes much finer — recall rises at equal bytes, which is
  * the whole game for a 100 TB shortlist scan
  * ([[graft.AnnClusteredRecallSpec]] gates the margin over plain PQ).
  *
  * Score decomposition keeps ADC exact-integer and cell-local:
  * `dot(q, x̂) = dot(q, c_cell) + Σ_sub dot(q_sub, rcb[sub][code_sub])`
  * — the first term is one micro-unit integer per (query, probed cell)
  * (nProbe per query, metadata-sized), the second is the SAME
  * cell-independent LUT as [[PqIndex]] built from the residual codebook
  * (dot against q decomposes subspace-wise regardless of what the
  * codebook was trained on). Both terms are integer micro units, so the
  * shortlist rank is an exact integer sum — order-independent and
  * engine-deterministic, fully replayable by the DuckDB oracle.
  *
  * Scale shape: cell assignment and residual encoding are scan-side
  * (codegen'd argmin + broadcast codebook — no shuffle); candidates come
  * from the IVF cell equi-join (never all-pairs, per-cell lists
  * ~n/nCells); ADC scoring shuffles only (q_id, n_id, partial) with
  * map-side combine; the exact rerank touches only the
  * (k × factor)-bounded shortlist.
  */
object IvfPq {

  case class Model(ivf: IvfIndex.Model, pq: PqIndex.Model) {

    /** `vec − centers[cell]` as a scan-side column — the centroid matrix
      * rides the plan as a literal constant (no join, no shuffle). */
    private def residual(vec: Column, cell: Column): Column =
      zip_with(vec,
        element_at(typedLit[Seq[Seq[Double]]](ivf.centers), cell + 1),
        (a, b) => a - b)

    /** (n_id, cell, codes): IVF cell + PQ codes of the residual. Both
      * steps scan-side; the corpus never shuffles. */
    def encode(corpus: DataFrame, idCol: String, vecCol: String): DataFrame = {
      val cells = ivf.withCell(
        corpus.select(col(idCol).alias("n_id"),
          col(vecCol).cast("array<double>").alias("vec")), "vec", "cell")
      pq.encode(cells.withColumn("rvec", residual(col("vec"), col("cell"))),
          "rvec", "codes")
        .select("n_id", "cell", "codes")
    }

    /** (q_id, cell, qcm): the query's `nProbe` nearest cells with the
      * per-cell additive ADC term `qcm = round(dot(q, c_cell)·1e6)`.
      * nProbe rows per query — metadata-sized, broadcastable. */
    def probes(queries: DataFrame, idCol: String, vecCol: String,
        nProbe: Int): DataFrame =
      ivf.withProbeCells(
          queries.select(col(idCol).alias("q_id"),
            col(vecCol).cast("array<double>").alias("vec")),
          "vec", "cells", nProbe)
        .select(col("q_id"), col("vec"), explode(col("cells")).alias("cell"))
        .select(col("q_id"), col("cell"),
          round(dot(col("vec"),
            element_at(typedLit[Seq[Seq[Double]]](ivf.centers),
              col("cell") + 1)) * 1e6).cast("long").alias("qcm"))

    /** (q_id, sub, code, lm) LUT of the RAW query against the RESIDUAL
      * codebook — cell-independent (see class doc). */
    def lutMicro(queries: DataFrame): DataFrame = pq.lutMicro(queries)
  }

  /** Train the composition: IVF cells first, then PQ codebooks on the
    * residuals of the (bounded, order-insensitive) training sample. */
  def train(corpus: DataFrame, vecCol: String, dim: Int, nCells: Int = 16,
      m: Int = 8, nCodes: Int = 16, seed: Long = 42L): Model = {
    val ivf = IvfIndex.train(corpus, vecCol, nCells, seed)
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val cells = ivf.withCell(
      corpus.select(col(vecCol).cast("array<double>").alias("vec")),
      "vec", "cell")
    val resid = cells.select(zip_with(col("vec"),
      element_at(typedLit[Seq[Seq[Double]]](ivf.centers), col("cell") + 1),
      (a, b) => a - b).alias("rvec"))
    Model(ivf, PqIndex.train(resid, "rvec", dim, m, nCodes, seed))
  }

  private val modelCache =
    scala.collection.concurrent.TrieMap.empty[(String, Int, Int, Int, Long), Model]
  private val ModelCacheCap = 8

  /** [[train]] memoized per (corpusKey, nCells, m, nCodes, seed) — same
    * contract and bound as [[IvfIndex.trainCached]]. */
  def trainCached(corpusKey: String, corpus: DataFrame, vecCol: String,
      dim: Int, nCells: Int = 16, m: Int = 8, nCodes: Int = 16,
      seed: Long = 42L): Model = {
    if (modelCache.size >= ModelCacheCap) modelCache.clear()
    modelCache.getOrElseUpdate(
      (s"$corpusKey#$vecCol", nCells, m, nCodes, seed),
      train(corpus, vecCol, dim, nCells, m, nCodes, seed))
  }

  /** Integer-exact IVF-PQ shortlist over PRE-STAGED pieces — the stage
    * the catalog entry oracles. `codes` is (n_id, cell, sub, code)
    * exploded; `probeSet` is (q_id, cell, qcm); `lut` from
    * [[Model.lutMicro]]. Candidates are bounded by the probed cells (the
    * cell equi-join — never all-pairs); the ADC sum adds the per-cell
    * term once per (q, n). */
  def shortlistFromStaged(codes: DataFrame, probeSet: DataFrame,
      lut: DataFrame, shortlist: Int): DataFrame = {
    val w = Window.partitionBy("q_id")
      .orderBy(col("adc").desc, col("n_id").asc)
    codes.join(broadcast(probeSet), Seq("cell"))
      .filter(col("n_id") =!= col("q_id"))
      .join(broadcast(lut), Seq("q_id", "sub", "code"))
      .groupBy("q_id", "n_id")
      .agg((first("qcm") + sum("lm")).alias("adc"))
      .withColumn("_sr", row_number().over(w))
      .filter(col("_sr") <= shortlist)
      .select("q_id", "n_id")
  }

  /** End-to-end IVF-PQ ANN top-k: train (cached), encode residuals,
    * probe, ADC shortlist, exact rerank. */
  def topK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, dim: Int, k: Int, nCells: Int = 16, nProbe: Int = 4,
      m: Int = 8, nCodes: Int = 16, shortlistFactor: Int = 4,
      seed: Long = 42L, corpusKey: String = ""): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val model =
      if (corpusKey.nonEmpty)
        trainCached(corpusKey, corpus, vecCol, dim, nCells, m, nCodes, seed)
      else train(corpus, vecCol, dim, nCells, m, nCodes, seed)
    val codes = model.encode(corpus, idCol, vecCol)
      .select(col("n_id"), col("cell"),
        posexplode(col("codes")).as(Seq("sub", "code")))
    val probeSet = model.probes(queries, idCol, vecCol, nProbe)
    val lut = model.lutMicro(
      queries.select(col(idCol).alias("q_id"),
        col(vecCol).cast("array<double>").alias("vec")))
    val sl = shortlistFromStaged(codes, probeSet, lut, k * shortlistFactor)
    Similarity.topKFromCandidates(sl,
      queries.select(col(idCol).alias("id"), col(vecCol).alias("vec")),
      corpus.select(col(idCol).alias("id"), col(vecCol).alias("vec")), k)
  }
}
