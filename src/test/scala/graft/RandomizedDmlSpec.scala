package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.ops.TxLog

/** Seeded randomized DML equivalence: a random sequence of table
  * operations runs against both the txlog table and a driver-side model
  * map; after every step the table must equal the model, and a
  * time-travel spot-check at the end must reproduce a remembered
  * intermediate state. Maintenance ops (OPTIMIZE, checkpoint, log
  * compaction) interleave freely — they must never change contents. */
class RandomizedDmlSpec extends SparkSpec {
  import spark.implicits._

  private def runScenario(seed: Long, steps: Int): Unit = {
    val rnd = new Random(seed)
    val t = tmpDir(s"rand_dml_$seed") + "/t"
    TxLog.setProperties(t, Map("graft.logCompaction.threshold" -> "40"))
    var model = Map.empty[Long, (String, Double)]
    var nextK = 0L
    var snapshots = List.empty[(Long, Map[Long, (String, Double)])]

    def toDf(rows: Seq[(Long, String, Double)]) =
      rows.toDF("k", "v", "amt").coalesce(1)

    def check(step: Int): Unit = {
      if (TxLog.schemaAsOf(t).isEmpty) return // nothing written yet
      val got = TxLog.read(spark, t).select("k", "v", "amt")
        .as[(Long, String, Double)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      assert(got === model, s"seed=$seed step=$step diverged")
    }

    (1 to steps).foreach { step =>
      rnd.nextInt(10) match {
        case 0 | 1 | 2 => // append 1-4 fresh rows
          val rows = (0 until 1 + rnd.nextInt(4)).map { _ =>
            nextK += 1
            (nextK, s"v$nextK", rnd.nextInt(100).toDouble)
          }
          TxLog.append(toDf(rows), t)
          model ++= rows.map(r => r._1 -> (r._2, r._3))
        case 3 if nextK > 0 => // delete a random key band
          val cut = rnd.nextLong(nextK) + 1
          val width = 1 + rnd.nextInt(3)
          spark.sql(
            s"DELETE FROM txlog.`$t` WHERE k >= $cut AND k < ${cut + width}")
          model = model.filter { case (k, _) => k < cut || k >= cut + width }
        case 4 if nextK > 0 => // update a random band
          val cut = rnd.nextLong(nextK) + 1
          spark.sql(
            s"UPDATE txlog.`$t` SET amt = amt + 1000, v = concat(v, '!') " +
              s"WHERE k >= $cut AND k < ${cut + 2}")
          model = model.map { case (k, (v, a)) =>
            if (k >= cut && k < cut + 2) k -> (v + "!", a + 1000) else k -> (v, a)
          }
        case 5 => // full-sync NMBS merge against a sampled source
          if (model.nonEmpty) {
            val keep = model.keys.toSeq.sorted
              .filter(_ => rnd.nextBoolean()).toSet
            nextK += 1
            val src = keep.toSeq.map(k => (k, "merged", -1.0)) :+
              ((nextK, s"v$nextK", 7.0))
            val view = s"rand_src_${seed}_$step"
            toDf(src).createOrReplaceTempView(view)
            spark.sql(
              s"""MERGE INTO txlog.`$t` AS t USING $view AS s ON t.k = s.k
                 |WHEN MATCHED THEN UPDATE SET amt = s.amt
                 |WHEN NOT MATCHED THEN INSERT *
                 |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
            model = src.map(r => r._1 -> (
              // matched rows keep their v, take source amt; inserts take all
              model.get(r._1).map(old => (old._1, r._3)).getOrElse((r._2, r._3))))
              .toMap
          }
        case 6 => // truncate (rarely)
          if (nextK > 0 && rnd.nextInt(4) == 0) {
            spark.sql(s"TRUNCATE TABLE txlog.`$t`")
            model = Map.empty
          }
        case 7 => // maintenance: optimize
          if (nextK > 0 && model.nonEmpty)
            TxLog.optimize(spark, t, targetFiles = 2)
        case 8 => // maintenance: checkpoint + log compaction
          TxLog.compact(t)
          TxLog.compactLog(t, keepTail = 5, minFiles = 5)
        case 9 => // remember a snapshot for the time-travel check
          if (TxLog.schemaAsOf(t).nonEmpty)
            TxLog.latestVersion(t).foreach(v => snapshots ::= (v, model))
        case _ => () // a guarded case skipped before the first append
      }
      check(step)
    }
    // time travel reproduces remembered intermediate states — through
    // every optimize/compaction that happened since
    snapshots.take(3).foreach { case (v, m) =>
      val got = TxLog.read(spark, t, Some(v)).select("k", "v", "amt")
        .as[(Long, String, Double)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      assert(got === m, s"seed=$seed time travel to v$v diverged")
    }
  }

  test("randomized DML sequences match the model (seed 42)") {
    runScenario(42L, 30)
  }

  test("randomized DML sequences match the model (seed 1337)") {
    runScenario(1337L, 30)
  }
}
