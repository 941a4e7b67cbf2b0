package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.FloatType
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the reference's scalar-function semantics
  * (SURVEY.md §5.2.2): ANSI-off cast-garbage→NULL, x/0→NULL, split/index,
  * round stability — generated corpora evaluated in one Spark job per
  * property and compared row-by-row against a Scala model.
  */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): List[A] =
    Gen.listOfN(n, g).apply(Gen.Parameters.default, Seed(42L)).get

  test("F6: cast-to-float yields NULL exactly on unparseable strings (ANSI off)") {
    Graft.referenceSemantics(spark)
    val gen = Gen.oneOf(
      Gen.alphaStr.suchThat(_.nonEmpty),                   // garbage
      Gen.chooseNum(-1e6f, 1e6f).map(_.toString),          // valid floats
      Gen.chooseNum(-99999, 99999).map(_.toString))        // valid ints
    val xs = samples(gen, 300)
    val got = xs.toDF("s")
      .select(col("s"), col("s").cast(FloatType).alias("f"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getFloat(1)))).toMap
    xs.foreach { s =>
      val model = s.toFloatOption
      assert(got(s) === model, s"cast('$s')")
    }
  }

  test("F8: x / y is NULL iff y == 0 (ANSI off), else IEEE division") {
    Graft.referenceSemantics(spark)
    val gen = for {
      x <- Gen.chooseNum(-1e6, 1e6)
      y <- Gen.frequency(1 -> Gen.const(0.0), 3 -> Gen.chooseNum(-1e3, 1e3))
    } yield (x, y)
    val xs = samples(gen, 300)
    val got = xs.toDF("x", "y")
      .select((col("x") / col("y")).alias("d"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    xs.zip(got).foreach { case ((x, y), d) =>
      if (y == 0.0) assert(d.isEmpty, s"$x/0")
      else assert(d.contains(x / y), s"$x/$y")
    }
  }

  test("F9: round(double, 2) follows shortest-repr HALF_UP (the Spark contract)") {
    val gen = Gen.chooseNum(-1e5, 1e5)
    val xs = samples(gen, 300)
    val got = xs.toDF("x").select(round(col("x"), 2).alias("r"))
      .collect().map(_.getDouble(0))
    xs.zip(got).foreach { case (x, r) =>
      val model = java.math.BigDecimal.valueOf(x)
        .setScale(2, java.math.RoundingMode.HALF_UP).doubleValue()
      assert(r === model, s"round($x, 2)")
    }
  }

  test("F5: split + getItem recovers the parts of 'a/b' strings") {
    val gen = for {
      a <- Gen.chooseNum(0, 9999)
      b <- Gen.chooseNum(0, 9999)
    } yield s"$a/$b"
    val xs = samples(gen, 200)
    val got = xs.toDF("s").select(
        split(col("s"), "/").getItem(0).alias("p0"),
        split(col("s"), "/").getItem(1).alias("p1"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    xs.zip(got).foreach { case (s, (p0, p1)) =>
      val Array(e0, e1) = s.split("/")
      assert(p0 === e0 && p1 === e1, s)
    }
  }

  test("F1/F4: regexp strip + split matches the Scala model on list-literal strings") {
    val word = Gen.nonEmptyListOf(Gen.alphaChar).map(_.mkString)
    val gen = Gen.nonEmptyListOf(word).map(_.take(4))
    val xs = samples(gen, 150).map(ws => ws.mkString("['", "', '", "']"))
    val got = xs.toDF("s").select(
        split(regexp_replace(col("s"), """[\[\]']""", ""), ",").alias("a"))
      .collect().map(_.getSeq[String](0))
    xs.zip(got).foreach { case (s, arr) =>
      val model = s.replaceAll("""[\[\]']""", "").split(",", -1).toSeq
      assert(arr === model, s)
    }
  }

  test("asof join matches the naive latest-at-or-before model on random data") {
    val gen = for {
      k <- Gen.chooseNum(0L, 5L)
      ts <- Gen.chooseNum(0L, 50L)
    } yield (k, ts)
    // right side uniqued per (key, ts) — asofBackward's documented contract;
    // every third value NULL: the matched row's NULL must surface, not an
    // older row's value
    val right = samples(gen, 120).distinct.zipWithIndex
      .map { case ((k, ts), i) =>
        (k, ts, if (i % 3 == 0) null else s"v$i")
      }
    val left = samples(gen, 150).zipWithIndex
      .map { case ((k, ts), i) => (i.toLong, k, ts) }
    val out = graft.ops.AsofJoin.asofBackward(
        left.toDF("id", "k", "ts"), "k", "ts",
        right.toDF("rk", "rts", "v"), "rk", "rts", Seq("v"))
      .collect()
      .map(r => r.getLong(0) -> Option(r.getAs[String]("v"))).toMap
    left.foreach { case (id, k, ts) =>
      val model = right.filter(r => r._1 == k && r._2 <= ts)
        .sortBy(_._2).lastOption.map(_._3).flatMap(Option(_))
      assert(out(id) === model, s"left($id, k=$k, ts=$ts)")
    }
  }

  test("asof join never matches NULL keys or NULL right timestamps (ASOF equality semantics)") {
    val left = Seq((1L, Some(7L), 10L), (2L, None, 10L)).map {
      case (id, k, ts) => (id, k.map(Long.box).orNull, ts)
    }.toDF("id", "k", "ts")
    val right = Seq(
      (Some(7L), Some(5L), "match"),     // legit: key 7 at ts 5
      (None, Some(1L), "nullkey"),       // NULL key: matches nothing
      (Some(7L), None, "nullts")         // NULL ts: can't satisfy r.ts <= l.ts
    ).map { case (k, ts, v) =>
      (k.map(Long.box).orNull, ts.map(Long.box).orNull, v)
    }.toDF("rk", "rts", "v")
    val out = graft.ops.AsofJoin.asofBackward(left, "k", "ts",
        right, "rk", "rts", Seq("v"))
      .collect().map(r => r.getLong(0) -> Option(r.getAs[String]("v"))).toMap
    assert(out(1L) === Some("match"))  // the legit row, not the NULL-ts one
    assert(out(2L) === None)           // NULL-key left row stays unmatched
  }

  test("greedy packing never overfills a multi-row pack and preserves order") {
    val gen = Gen.chooseNum(1L, 700L)
    val weights = samples(gen, 200).zipWithIndex
      .map { case (w, i) => ("g", i.toLong, w) }
    val budget = 512L
    val packs = graft.ext.PipelineOps.greedyPack(
        weights.toDF("grp", "ord", "w"), "grp", "ord", "w", budget)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    val byPack = weights.groupBy(r => packs(r._2))
    byPack.foreach { case (p, rows) =>
      val fill = rows.map(_._3).sum
      assert(fill <= budget || rows.size == 1, s"pack $p filled to $fill")
    }
    // pack ids are monotone in row order
    weights.map(r => packs(r._2)).foldLeft(0L) { (prev, p) =>
      assert(p >= prev); p
    }
  }
}
