package graft.ext

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.functions.GraftFunctions
import graft.functions.VectorFunctions.{cosineNative, l2Sq}

/** IVF (inverted-file) ANN index: k-means cells over the corpus, queries
  * probe their `nProbe` nearest cells (SURVEY.md §7.5 similarity-search
  * scale path, alternative to hyperplane LSH).
  *
  * Scale design: training samples the corpus (k-means on a bounded sample);
  * cell assignment is one broadcast-centroid pass over the corpus
  * (scan-side, no shuffle); the probe join is an equi-join on cell id —
  * hash-partitionable, with per-cell candidate lists ~n/nCells. Cell count
  * scales as √n to balance probe cost against list length.
  */
object IvfIndex {

  case class Model(centers: Seq[Seq[Double]]) {
    def nCells: Int = centers.length

    /** Column: the cell id (argmin L2 distance to centroids). */
    def cellOf(vec: Column): Column = {
      val scored = array(centers.zipWithIndex.map { case (c, i) =>
        struct(l2Sq(vec, typedlit(c)).alias("d"), lit(i).alias("cell"))
      }: _*)
      array_min(scored).getField("cell")
    }

    /** Column: the `nProbe` nearest cell ids, as an array. */
    def probeCells(vec: Column, nProbe: Int): Column = {
      val scored = array(centers.zipWithIndex.map { case (c, i) =>
        struct(l2Sq(vec, typedlit(c)).alias("d"), lit(i).alias("cell"))
      }: _*)
      transform(slice(array_sort(scored), 1, nProbe), s => s.getField("cell"))
    }
  }

  /** Train centroids with distributed k-means (seeded; sample-bounded). */
  def train(corpus: DataFrame, vecCol: String, nCells: Int,
      seed: Long = 42L, maxIter: Int = 5, sampleCap: Int = 20000): Model = {
    val n = corpus.count()
    val sampled = if (n > sampleCap)
      corpus.sample(withReplacement = false, sampleCap.toDouble / n, seed)
    else corpus
    val feats = sampled.select(array_to_vector(
      col(vecCol).cast("array<double>")).alias("features"))
    val model = new KMeans().setK(nCells).setSeed(seed).setMaxIter(maxIter)
      .fit(feats)
    Model(model.clusterCenters.map(_.toArray.toSeq).toSeq)
  }

  /** ANN top-k: assign corpus to cells, probe nProbe cells per query,
    * exact cosine + top-k on the candidates. */
  def topK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nCells: Int = 16, nProbe: Int = 4,
      seed: Long = 42L): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    val model = train(corpus, vecCol, nCells, seed)
    val c = corpus.select(col(idCol).alias("n_id"),
      col(vecCol).alias("n_vec"), model.cellOf(col(vecCol)).alias("cell"))
    val q = queries.select(col(idCol).alias("q_id"), col(vecCol).alias("q_vec"),
        explode(model.probeCells(col(vecCol), nProbe)).alias("cell"))
    val scored = c.join(q, Seq("cell"))
      .filter(col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id"),
        cosineNative(col("q_vec"), col("n_vec")).alias("score"))
      .dropDuplicates("q_id", "n_id")
    val w = Window.partitionBy("q_id")
      .orderBy(col("score").desc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
