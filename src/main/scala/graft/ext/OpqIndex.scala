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

  private val rotCache =
    scala.collection.concurrent.TrieMap.empty[String, Array[Array[Double]]]
  private val RotCacheCap = 8

  /** JVM-wide lock serializing every SVD-bearing trainer. The only
    * LAPACK on this stack is netlib's F2J fallback (no native BLAS
    * installed), and f2j-translated routines keep Fortran COMMON-block
    * state in STATIC fields — two threads inside `dgesdd` at once
    * corrupt each other (observed under the concurrent bench as
    * NotConvergedException and, once, an unbounded `dlascl` scaling
    * spin; both trainers pass in isolation). Training is memoized per
    * corpus, so the serialization costs one fit per key per JVM. */
  private[graft] val svdLock = new Object

  /** Rotation memoizer (the [[PqIndex.trainCached]] pattern): both
    * trainers are seeded and fit bounded samples, so the cached matrix is
    * IDENTICAL to a fresh train — caching never changes results, it only
    * stops a served index from re-running PCA / alternating minimization
    * per query batch. Same wholesale-clear bound as the model caches. */
  def rotationCached(key: String)(
      train: => Array[Array[Double]]): Array[Array[Double]] = {
    if (rotCache.size >= RotCacheCap) rotCache.clear()
    rotCache.getOrElseUpdate(key, train)
  }

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

  /** TRAINED rotation — the parametric OPQ solution (Ge et al. 2013 §4:
    * for Gaussian data the optimal R is PCA followed by balanced
    * eigenvalue allocation): decorrelate with a full-rank PCA, then deal
    * the principal components into the m subspaces so the per-subspace
    * variance products balance (greedy: components in descending variance,
    * each to the unfilled subspace with the smallest log-variance sum).
    * Balanced subspace variance = balanced per-subspace quantization error
    * = no codebook starves while another saturates.
    *
    * Deterministic: the PCA fits on the same bounded hash-ordered sample
    * [[PqIndex.train]] uses, and the eigen-decomposition of a fixed
    * covariance is deterministic. Rows are orthonormal because principal
    * components are. Driver-side output is dim×dim — broadcast-as-literal
    * like [[rotationMatrix]]. */
  def trainedRotation(corpus: org.apache.spark.sql.DataFrame, vecCol: String,
      dim: Int, m: Int, sampleCap: Int = 20000): Array[Array[Double]] = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val subDim = dim / m
    val sample = corpus
      .select(col(vecCol).cast("array<double>").alias("v"),
        xxhash64(col(vecCol).cast("array<double>")).alias("_h"))
      .orderBy("_h").limit(sampleCap)
      .select(org.apache.spark.ml.functions.array_to_vector(col("v"))
        .alias("features"))
    val pca = svdLock.synchronized {
      new org.apache.spark.ml.feature.PCA()
        .setK(dim).setInputCol("features").setOutputCol("_p").fit(sample)
    }
    val pc = pca.pc // dim×dim; column i = i-th principal component
    val ev = pca.explainedVariance.toArray
    // Balance per-subspace Σlog(λ) by greedy LPT over SHIFTED loads: raw
    // logs are negative for λ<1, so "assign to the min-sum bin" would pile
    // everything into one subspace (each assignment makes that bin the
    // minimum again). Because every bin ends with exactly subDim items, a
    // constant shift per item moves every bin's total equally — shift
    // loads positive and the classic makespan greedy balances the true
    // log-products.
    val logs = ev.map(e => math.log(math.max(e, 1e-12)))
    val loads = logs.map(_ - logs.min + 1e-6)
    val sums = Array.fill(m)(0.0)
    val counts = Array.fill(m)(0)
    val assign = Array.fill(dim)(-1)
    for (i <- 0 until dim) { // descending variance ⇒ descending load (LPT)
      val j = (0 until m).filter(counts(_) < subDim)
        .minBy(j => (sums(j), j))
      assign(i) = j
      sums(j) += loads(i)
      counts(j) += 1
    }
    (0 until m).flatMap(j => (0 until dim).filter(assign(_) == j))
      .map(i => Array.tabulate(dim)(r => pc(r, i)))
      .toArray
  }

  /** FULL OPQ — the non-parametric trainer (Ge et al. 2013 §5):
    * alternating minimization of the joint quantization objective
    * ‖X·Rᵀ − recon(X·Rᵀ)‖²_F over the rotation AND the codebooks.
    * Each outer iteration runs (a) code assignment + Lloyd centroid
    * updates in the current rotated space, then (b) the orthogonal
    * Procrustes update R = V·Uᵀ from SVD(Σᵢ xᵢ·reconᵢᵀ) — each step is
    * individually non-increasing in the joint objective, so the error
    * sequence (recorded after (a), before (b)) is monotone
    * non-increasing; the spec pins that.
    *
    * Driver-side on the bounded hash-ordered sample: n ≤ sampleCap rows
    * of dim doubles plus dim×dim matrices — megabytes, the same budget
    * as [[PqIndex.train]]'s sampling, and the production corpus is never
    * touched (the returned R feeds [[rotate]] scan-side as usual).
    * Deterministic: seeded init, fixed iteration counts, LAPACK SVD of a
    * fixed matrix.
    *
    * Returns (R, per-iteration mean quantization errors). */
  def alternatingRotation(corpus: org.apache.spark.sql.DataFrame,
      vecCol: String, dim: Int, m: Int, nCodes: Int = 16, iters: Int = 4,
      lloydRounds: Int = 3, sampleCap: Int = 2000,
      seed: Long = 42L): (Array[Array[Double]], Seq[Double]) = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val subDim = dim / m
    val x: Array[Array[Double]] = corpus
      .select(col(vecCol).cast("array<double>").alias("v"),
        xxhash64(col(vecCol).cast("array<double>")).alias("_h"))
      .orderBy("_h").limit(sampleCap)
      .collect().map(_.getSeq[Double](0).toArray)
    val n = x.length
    require(n > nCodes, s"sample too small: $n rows for $nCodes codes")

    var r = rotationMatrix(dim, seed)
    def rotated: Array[Array[Double]] =
      x.map { v =>
        val out = new Array[Double](dim)
        var i = 0
        while (i < dim) {
          var s = 0.0; var k = 0
          while (k < dim) { s += r(i)(k) * v(k); k += 1 }
          out(i) = s; i += 1
        }
        out
      }

    // codebooks: m × nCodes × subDim, seeded spread init over the sample
    var xr = rotated
    val cb = Array.tabulate(m, nCodes)((s, c) =>
      xr(c * n / nCodes).slice(s * subDim, (s + 1) * subDim).clone())
    val errors = scala.collection.mutable.ArrayBuffer.empty[Double]

    for (_ <- 0 until iters) {
      xr = rotated
      val codes = Array.ofDim[Int](n, m)
      (0 until lloydRounds).foreach { _ =>
        // E-step: nearest centroid per subspace
        for (i <- 0 until n; s <- 0 until m) {
          var best = 0; var bestD = Double.MaxValue
          for (c <- 0 until nCodes) {
            var d = 0.0; var k = 0
            while (k < subDim) {
              val diff = xr(i)(s * subDim + k) - cb(s)(c)(k)
              d += diff * diff; k += 1
            }
            if (d < bestD) { bestD = d; best = c }
          }
          codes(i)(s) = best
        }
        // M-step: centroids ← cluster means (empty clusters keep position)
        for (s <- 0 until m; c <- 0 until nCodes) {
          val members = (0 until n).filter(codes(_)(s) == c)
          if (members.nonEmpty) {
            for (k <- 0 until subDim)
              cb(s)(c)(k) =
                members.map(i => xr(i)(s * subDim + k)).sum / members.size
          }
        }
      }
      val recon = Array.tabulate(n, dim)((i, d) =>
        cb(d / subDim)(codes(i)(d / subDim))(d % subDim))
      errors += (0 until n).map { i =>
        var e = 0.0; var d = 0
        while (d < dim) {
          val diff = xr(i)(d) - recon(i)(d); e += diff * diff; d += 1
        }
        e
      }.sum / n
      // Procrustes: A = Σ xᵢ·reconᵢᵀ; A = UΣVᵀ ⇒ Rᵀ = U·Vᵀ ⇒ R = V·Uᵀ
      val a = breeze.linalg.DenseMatrix.zeros[Double](dim, dim)
      for (i <- 0 until n; p <- 0 until dim; q <- 0 until dim)
        a(p, q) += x(i)(p) * recon(i)(q)
      val breeze.linalg.svd.SVD(u, _, vt) =
        svdLock.synchronized(breeze.linalg.svd(a))
      val vu = vt.t * u.t // X·Rᵀ ≈ recon ⇒ Rᵀ = U·Vᵀ ⇒ R = V·Uᵀ
      r = Array.tabulate(dim, dim)((i, k) => vu(i, k))
    }
    (r, errors.toSeq)
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
