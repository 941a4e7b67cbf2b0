package graft

import org.apache.spark.sql.functions._

import graft.functions.ZOrder
import graft.ops.Maintenance

/** Z-order layout: key correctness against a Scala model, and the
  * data-skipping property the layout exists for — every output file of a
  * z-ordered rewrite bounds BOTH dimensions, where a lexicographic sort
  * only bounds the leading one. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("interleave2 matches the bit-interleaving model") {
    def model(a: Long, b: Long, bits: Int): Long =
      (0 until bits).map { i =>
        (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
      }.sum
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(200)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"), ZOrder.interleave2(col("a"), col("b")).alias("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pairs.foreach { case (a, b) =>
      assert(got((a, b)) === model(a, b, 16), s"($a, $b)")
    }
    // locality sanity: z of equal points is 3x the coordinate in each dim
    assert(model(3, 3, 16) === 15)
  }

  test("z-ordered files bound the second dimension; lexicographic files don't") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(20000)((rnd.nextInt(256).toLong, rnd.nextInt(256).toLong))
    val src = tmpDir("zorder_src")
    rows.toDF("a", "b").write.mode("overwrite").parquet(src)

    val zDir = tmpDir("zorder_z")
    Maintenance.rewriteZOrdered(spark, src, zDir,
      col("a"), col("b"), nFiles = 8, bits = 8)
    val lexDir = tmpDir("zorder_lex")
    spark.read.parquet(src).repartitionByRange(8, col("a"), col("b"))
      .sortWithinPartitions("a", "b")
      .write.mode("overwrite").parquet(lexDir)

    def avgSpread(dir: String, c: String): Double =
      spark.read.parquet(dir)
        .groupBy(input_file_name().alias("f"))
        .agg((max(col(c)) - min(col(c))).alias("spread"))
        .agg(avg("spread")).head().getDouble(0)

    val zB = avgSpread(zDir, "b")
    val lexB = avgSpread(lexDir, "b")
    // lexicographic files span nearly the whole b domain; z-ordered files
    // hold a bounded rectangle in (a, b)
    assert(lexB > 200, s"lex b-spread $lexB")
    assert(zB < lexB * 0.6, s"z b-spread $zB vs lex $lexB")
    assert(avgSpread(zDir, "a") < 256, "a still bounded")
  }
}
