package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.dot

/** Rotation front-end for [[PqIndex]] — the cheap OPQ variant: apply a
  * fixed random orthonormal rotation R before product quantization.
  *
  * Why rotate at all: PQ quantizes each `subDim`-wide slice independently,
  * so it spends the same code budget on every subspace. When a few
  * dimensions carry most of the variance (or correlated dimensions land in
  * the same slice), per-subspace k-means wastes codes. A random orthonormal
  * rotation decorrelates and spreads variance roughly evenly across slices
  * — the "RR" baseline of the OPQ family (Ge et al., "Optimized Product
  * Quantization", CVPR 2013 — the full method *trains* R by alternating
  * minimization; the random rotation is its standard cheap baseline and
  * what FAISS exposes as `RandomRotationMatrix`). Cosine/L2 geometry is
  * invariant under R, so recall math is unchanged: search rotated queries
  * against rotated corpus, rerank on rotated vectors, done.
  *
  * Scale shape: R is a dim×dim driver-side constant (64×64 = 32 KiB)
  * embedded as a literal — the rotation is a scan-side `transform` over a
  * literal array (whole-stage codegen, no shuffle, no UDF). Everything
  * downstream reuses [[PqIndex]] unchanged.
  *
  * Determinism: R is Gram-Schmidt over a seeded `scala.util.Random`, so
  * the same (dim, seed) always yields the same matrix, on any driver.
  */
object OpqIndex {

  /** Deterministic random orthonormal dim×dim matrix: seeded Gaussian
    * entries, then modified Gram-Schmidt (numerically stabler than
    * classical GS at dim=64 — re-projects against already-orthogonalized
    * rows). Rows are the output basis: rotated_i = dot(row_i, v). */
  def rotationMatrix(dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    val m = Array.fill(dim, dim)(rnd.nextGaussian())
    for (i <- 0 until dim) {
      for (j <- 0 until i) {
        val proj = (0 until dim).map(k => m(i)(k) * m(j)(k)).sum
        for (k <- 0 until dim) m(i)(k) -= proj * m(j)(k)
      }
      val norm = math.sqrt((0 until dim).map(k => m(i)(k) * m(i)(k)).sum)
      require(norm > 1e-9, s"degenerate GS row $i (seed $seed)")
      for (k <- 0 until dim) m(i)(k) /= norm
    }
    m
  }

  /** Column expression rotating `vec` by `r`: element i is dot(r_i, vec).
    * Literal matrix + higher-order transform — stays in codegen, O(dim²)
    * multiplies per row, zero shuffle. Result is array<float> so staged
    * rotated vectors round-trip parquet with the same width as the
    * original embeddings (and the DuckDB oracle replays the identical
    * float values). */
  def rotate(vec: Column, r: Array[Array[Double]]): Column =
    transform(
      typedlit(r.map(_.toIndexedSeq).toIndexedSeq),
      row => dot(row, vec)).cast("array<float>")
}
