package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Unit contracts of the two r8 native expressions — [[graft.functions
  * .NearestCellsL2]] (codegen'd top-k argmin over a constant centroid
  * matrix) and [[graft.functions.SortedIntersectSize]] (merge-walk set
  * intersection) — including codegen/interpreted parity, tie-breaking,
  * NULL contracts, and equivalence to the HOF formulations they
  * replaced. */
class NativeVecExprSpec extends SparkSpec {
  import spark.implicits._

  GraftFunctions.register(spark)

  private val centers = Seq(
    Seq(0.0, 0.0), Seq(10.0, 0.0), Seq(0.0, 10.0), Seq(10.0, 10.0))

  private def nearest(vecs: Seq[Seq[Float]], k: Int): Seq[Seq[Int]] =
    vecs.toDF("v")
      .select(call_function("nearest_cells",
        col("v"), typedLit(centers), lit(k)).alias("c"))
      .as[Seq[Int]].collect().toSeq

  test("nearest_cells: argmin, k-nearest ordering, and lower-cell tie-break") {
    assert(nearest(Seq(Seq(1f, 1f)), 1) === Seq(Seq(0)))
    assert(nearest(Seq(Seq(9f, 9f)), 1) === Seq(Seq(3)))
    // k-nearest, ascending distance
    assert(nearest(Seq(Seq(9f, 1f)), 3) === Seq(Seq(1, 0, 3)))
    // the exact midpoint ties all four cells: lower cell id wins, in order
    assert(nearest(Seq(Seq(5f, 5f)), 2) === Seq(Seq(0, 1)))
    // k beyond the cell count returns all cells
    assert(nearest(Seq(Seq(1f, 0f)), 99) === Seq(Seq(0, 1, 2, 3)))
  }

  test("nearest_cells: double input, dim mismatch and NULL are loud NULLs") {
    val df = Seq((1, Seq(0.1, 0.2)), (2, Seq(0.1, 0.2, 0.3)))
      .toDF("id", "v")
      .select(col("id"), call_function("nearest_cells",
        col("v"), typedLit(centers), lit(1)).alias("c"))
    val got = df.as[(Int, Option[Seq[Int]])].collect().toMap
    assert(got(1) === Some(Seq(0)))
    assert(got(2) === None, "dim mismatch must NULL, not mis-assign")
    assert(Seq(Option.empty[Seq[Float]]).toDF("v")
      .select(call_function("nearest_cells",
        col("v"), typedLit(centers), lit(1)).alias("c"))
      .as[Option[Seq[Int]]].head() === None)
  }

  test("nearest_cells agrees with the HOF struct-min formulation it replaced") {
    val vecs = (0 until 200).map { i =>
      Seq(((i * 37) % 23).toFloat / 2f, ((i * 53) % 19).toFloat / 2f)
    }
    val centroidStructs = centers.zipWithIndex.map { case (c, i) => (i, c) }
    val hof = vecs.toDF("v")
      .crossJoin(broadcast(centroidStructs.toDF("cell", "center")
        .agg(collect_list(struct(col("cell"), col("center")))
          .alias("_centroids"))))
      .select(array_min(transform(col("_centroids"),
        c => struct(
          aggregate(zip_with(col("v"), c.getField("center"),
            (x, y) => { val d = x.cast("double") - y; d * d }),
            lit(0.0), (acc, e) => acc + e).alias("d"),
          c.getField("cell").alias("cell")))).getField("cell").alias("c"))
      .as[Int].collect().toSeq
    val native = nearest(vecs, 1).map(_.head)
    assert(native === hof)
  }

  test("sorted_intersect_size: merge-walk equals the hash-set intersection") {
    val pairs = Seq(
      (Seq(1L, 3L, 5L, 9L), Seq(2L, 3L, 5L, 10L)),   // partial overlap
      (Seq(1L, 2L), Seq(3L, 4L)),                     // disjoint
      (Seq(7L, 8L, 9L), Seq(7L, 8L, 9L)),             // identical
      (Seq.empty[Long], Seq(1L)),                     // empty side
      (Seq(-5L, 0L, 2L), Seq(-5L, 2L, 11L)))          // negatives
    val df = pairs.toDF("a", "b")
    val got = df.select(
        call_function("sorted_intersect_size", col("a"), col("b")).alias("n"),
        size(array_intersect(col("a"), col("b"))).alias("ref"))
      .as[(Int, Int)].collect()
    got.foreach { case (n, ref) => assert(n === ref) }
    // and jaccardSorted ≡ the intersect/union form on the same inputs
    val jac = df.filter(size(col("a")) > 0 && size(col("b")) > 0).select(
      graft.ext.Dedup.jaccardSorted(col("a"), col("b")).alias("js"),
      graft.ext.Dedup.jaccard(col("a"), col("b")).alias("j"))
      .as[(Double, Double)].collect()
    jac.foreach { case (js, j) => assert(js === j) }
  }

  test("native expressions stay inside whole-stage codegen") {
    // a LOCAL literal relation collapses to LocalTableScan before codegen
    // ever runs — drive the projection above a real computed relation
    val base = spark.range(0, 100)
      .select(array(col("id").cast("float"),
        (col("id") % 7).cast("float")).alias("v"),
        sequence(lit(1L), col("id") % 5 + 1).alias("a"))
    val plan = base
      .select(call_function("nearest_cells",
        col("v"), typedLit(centers), lit(1)))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan) // "*(n)" = codegen'd stage
    val plan2 = base
      .select(call_function("sorted_intersect_size", col("a"), col("a")))
      .queryExecution.executedPlan.toString
    assert(plan2.contains("*(1) Project"), plan2)
  }
}
