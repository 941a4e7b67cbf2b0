package graft

import org.apache.spark.sql.functions._

import graft.ext.{OpqIndex, PqIndex, Similarity}
import graft.functions.{GraftFunctions, VectorFunctions}

/** OPQ rotation front-end: the rotation really is orthonormal (so geometry
  * — and therefore recall math — is preserved), rotating columns preserves
  * cosine, and the rotated-PQ pipeline holds the same recall floor as
  * unrotated PQ on the same embeddings. */
class OpqSpec extends SparkSpec {

  GraftFunctions.register(spark)

  private val Dim = 64
  private lazy val r = OpqIndex.rotationMatrix(Dim)

  test("rotation matrix is orthonormal (R·Rᵀ = I) and deterministic") {
    for (i <- 0 until Dim; j <- 0 until Dim) {
      val d = (0 until Dim).map(k => r(i)(k) * r(j)(k)).sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(d - want) < 1e-9, s"R·Rᵀ[$i][$j] = $d")
    }
    val r2 = OpqIndex.rotationMatrix(Dim)
    assert(r.map(_.toSeq).toSeq === r2.map(_.toSeq).toSeq)
    // a different seed is a different basis
    assert(r.map(_.toSeq).toSeq !==
      OpqIndex.rotationMatrix(Dim, seed = 7L).map(_.toSeq).toSeq)
  }

  test("rotation preserves pairwise cosine (to float round-trip tolerance)") {
    val emb = Tables.load(spark, SF, "embeddings").filter(col("vec_id") < 30)
    val rot = emb.select(col("vec_id"),
      col("embedding").alias("v"),
      OpqIndex.rotate(col("embedding"), r).alias("rv"))
    val pairs = rot.alias("a").join(rot.alias("b"),
        col("a.vec_id") < col("b.vec_id"))
      .select(
        VectorFunctions.cosineNative(col("a.v"), col("b.v")).alias("c0"),
        VectorFunctions.cosineNative(col("a.rv"), col("b.rv")).alias("c1"))
      .collect()
    assert(pairs.length === 30 * 29 / 2)
    pairs.foreach { row =>
      assert(math.abs(row.getDouble(0) - row.getDouble(1)) < 1e-4,
        s"cosine drifted: ${row.getDouble(0)} vs ${row.getDouble(1)}")
    }
  }

  test("trained rotation (PCA + eigenvalue allocation) is orthonormal and balances subspace variance") {
    val emb = Tables.load(spark, SF, "embeddings")
    val tr = OpqIndex.trainedRotation(emb, "embedding", Dim, m = 8)
    assert(tr.length === Dim && tr.forall(_.length === Dim))
    for (i <- 0 until Dim; j <- i until Dim) {
      val d = (0 until Dim).map(k => tr(i)(k) * tr(j)(k)).sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(d - want) < 1e-8, s"R·Rᵀ[$i][$j] = $d")
    }
    // the allocation objective: per-subspace log-variance sums of the
    // ROTATED data are near-equal (dealt greedily from sorted
    // eigenvalues), so no subspace dominates quantization error
    val rows = emb.select(OpqIndex.rotate(col("embedding"), tr).alias("rv"))
      .collect().map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val n = rows.length.toDouble
    val mean = Array.tabulate(Dim)(d => rows.map(_(d)).sum / n)
    val variance = Array.tabulate(Dim)(d =>
      rows.map(r => math.pow(r(d) - mean(d), 2)).sum / n)
    val subLogVar = (0 until 8).map(s =>
      (s * 8 until (s + 1) * 8).map(d => math.log(variance(d))).sum)
    assert(subLogVar.max - subLogVar.min < 1.0,
      s"unbalanced subspace log-variance: $subLogVar")
  }

  test("full OPQ trainer: monotone error descent, orthonormal result") {
    val emb = Tables.load(spark, SF, "embeddings")
    val (tr, errors) = OpqIndex.alternatingRotation(
      emb, "embedding", Dim, m = 8, iters = 4, sampleCap = 500)
    assert(errors.length === 4)
    // alternating minimization: every recorded error is ≤ its predecessor
    // (codebook step and Procrustes step each non-increasing)
    errors.sliding(2).foreach {
      case Seq(prev, next) =>
        assert(next <= prev + 1e-9, s"error rose: $errors")
      case _ =>
    }
    // and training actually helped vs the random-rotation start
    assert(errors.last < errors.head, errors.toString)
    // result is still a rotation
    for (i <- 0 until Dim; j <- i until Dim) {
      val d = (0 until Dim).map(k => tr(i)(k) * tr(j)(k)).sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(d - want) < 1e-8, s"R·Rᵀ[$i][$j] = $d")
    }
  }

  test("rotated-PQ top-5 recall vs exact brute force") {
    val emb = Tables.load(spark, SF, "embeddings")
    val rot = emb.select(col("vec_id"),
      OpqIndex.rotate(col("embedding"), r).alias("rvec"))
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select("q_id", "n_id").collect()
      .map(row => (row.getLong(0), row.getLong(1))).toSet
    // ground truth on the ORIGINAL embeddings — valid because cosine is
    // rotation-invariant (previous test pins the tolerance)
    val exact = pairs(Similarity.bruteForceTopK(
      emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding", k = 5))
    val opq = pairs(PqIndex.topK(rot, rot.filter(col("vec_id") < 10),
      "vec_id", "rvec", dim = Dim, k = 5, corpusKey = s"$SF#opq-spec"))
    val recall = (exact & opq).size.toDouble / exact.size
    info(f"opq measured recall@5 = $recall%.2f")
    // Measured 0.50 on this fixed seed (deterministic) — the same
    // quantization cap PqSpec documents: uniform-random vectors have no
    // variance structure for the learned rotation to concentrate, so
    // OPQ can only MATCH plain PQ here (on real corpora the rotation's
    // balanced subspace variance is where its gain comes from). The
    // invariant this pins is "rotation costs no recall", not a gain.
    assert(recall >= 0.5, s"recall@5 = $recall")
    assert(exact.size === 50)
  }
}
