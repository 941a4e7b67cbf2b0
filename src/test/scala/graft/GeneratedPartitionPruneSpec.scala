package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.TxLog

/** Generated-column partition pruning (Delta's optimization): a pushed
  * bound on the BASE column of a generated partition column implies a
  * bound on the partition column, so `WHERE ts BETWEEN …` prunes a
  * `year(ts)`/`date(ts)`-partitioned layout without the query naming the
  * partition column. */
class GeneratedPartitionPruneSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)
  private def epoch(s: String): Double = ts(s).getTime / 1000.0

  private def yearTable(): String = {
    val t = tmpDir("gpp_year") + "/t"
    TxLog.setProperties(t, Map(
      "graft.generated.y" -> "year(ts)",
      "graft.partition.columns" -> "y"))
    TxLog.append(Seq(
      (1L, ts("2019-03-01 00:00:00")), (2L, ts("2020-06-15 10:00:00")),
      (3L, ts("2021-11-30 23:00:00")), (4L, ts("2021-01-02 01:00:00")))
      .toDF("k", "ts"), t)
    t
  }

  test("year(ts) partition: a ts range derives a year range and prunes") {
    val t = yearTable()
    assert(TxLog.activeFiles(t).count(_.contains("y=")) >= 3)
    val (num, str) = TxLog.deriveGeneratedPartitionBounds(t, None,
      Map("ts" -> (epoch("2021-01-01 00:00:00"), epoch("2021-12-31 00:00:00"))),
      Map.empty)
    assert(num.contains("y"), "derived bound on the generated partition col")
    assert(num("y")._1 <= 2021.0 && num("y")._2 >= 2021.0)
    assert(num("y")._1 >= 2020.0 && num("y")._2 <= 2022.0,
      s"±14h pad keeps the range tight: ${num("y")}")
    val pruned = TxLog.readPruned(spark, t, num, str)
    assert(pruned.inputFiles.length < TxLog.activeFiles(t).size,
      "non-2021 year directories must be pruned")
    assert(pruned.filter(col("ts") >= lit(ts("2021-01-01 00:00:00")))
      .count() === 2)
  }

  test("the SQL relation derives the prune from a plain WHERE on ts") {
    val t = yearTable()
    val id = java.util.UUID.randomUUID.toString.take(8)
    spark.sql(
      s"""CREATE OR REPLACE TEMPORARY VIEW gpp_v_$id
         |USING graft.sources.txlog OPTIONS (path '$t')""".stripMargin)
    val got = spark.sql(
      s"""SELECT k FROM gpp_v_$id
         |WHERE ts BETWEEN TIMESTAMP '2021-01-01 00:00:00'
         |              AND TIMESTAMP '2021-12-31 23:59:59'""".stripMargin)
      .as[Long].collect().sorted
    assert(got === Array(3L, 4L), "derived pruning must not drop rows")
  }

  test("date(ts) partition: a ts range derives an ISO date-string range") {
    val t = tmpDir("gpp_date") + "/t"
    TxLog.setProperties(t, Map(
      "graft.generated.d" -> "to_date(ts)",
      "graft.partition.columns" -> "d"))
    TxLog.append(Seq(
      (1L, ts("2022-01-01 05:00:00")), (2L, ts("2022-01-02 06:00:00")),
      (3L, ts("2022-03-09 07:00:00"))).toDF("k", "ts"), t)
    val (num, str) = TxLog.deriveGeneratedPartitionBounds(t, None,
      Map("ts" -> (epoch("2022-01-01 00:00:00"), epoch("2022-01-02 23:00:00"))),
      Map.empty)
    assert(str.contains("d"), "derived string bound on the date partition")
    val pruned = TxLog.readPruned(spark, t, num, str)
    assert(pruned.inputFiles.length < TxLog.activeFiles(t).size,
      "the 2022-03-09 directory must be pruned")
    assert(pruned.count() >= 2)
  }

  test("substring prefix partition derives from a string range") {
    val t = tmpDir("gpp_pre") + "/t"
    TxLog.setProperties(t, Map(
      "graft.generated.p" -> "substring(code, 1, 2)",
      "graft.partition.columns" -> "p"))
    TxLog.append(Seq(
      (1L, "DE-123"), (2L, "DE-456"), (3L, "FR-789"), (4L, "US-000"))
      .toDF("k", "code"), t)
    val (_, str) = TxLog.deriveGeneratedPartitionBounds(t, None,
      Map.empty, Map("code" -> ("DE", "DF")))
    assert(str.get("p").contains(("DE", "DF")), str)
    val pruned = TxLog.readPruned(spark, t, Map.empty, str)
    assert(pruned.inputFiles.length < TxLog.activeFiles(t).size,
      "FR/US prefix directories must be pruned")
    assert(pruned.filter(col("code").startsWith("DE")).count() === 2)
  }

  test("month(ts) derives only within one year; cross-year wraps refuse") {
    val t = tmpDir("gpp_month") + "/t"
    TxLog.setProperties(t, Map(
      "graft.generated.m" -> "month(ts)",
      "graft.partition.columns" -> "m"))
    TxLog.append(Seq(
      (1L, ts("2021-01-15 00:00:00")), (2L, ts("2021-06-15 00:00:00")),
      (3L, ts("2021-12-15 00:00:00"))).toDF("k", "ts"), t)
    // intra-year window (pad-safe: bounds a day inside the months)
    val (num, _) = TxLog.deriveGeneratedPartitionBounds(t, None,
      Map("ts" -> (epoch("2021-05-02 00:00:00"), epoch("2021-07-30 00:00:00"))),
      Map.empty)
    assert(num.get("m").contains((5.0, 7.0)), num)
    val pruned = TxLog.readPruned(spark, t, num, Map.empty)
    assert(pruned.inputFiles.length < TxLog.activeFiles(t).size,
      "January and December directories must be pruned")
    assert(pruned.count() === 1)
    // a window whose padded bounds straddle a year boundary must NOT
    // derive: months wrap (Dec..Jan = {12, 1})
    val (num2, _) = TxLog.deriveGeneratedPartitionBounds(t, None,
      Map("ts" -> (epoch("2021-12-20 00:00:00"), epoch("2022-01-10 00:00:00"))),
      Map.empty)
    assert(!num2.contains("m"), num2)
  }

  test("day(ts) derives only within one month; cross-month wraps refuse") {
    val t = tmpDir("gpp_day") + "/t"
    TxLog.setProperties(t, Map(
      "graft.generated.d" -> "day(ts)",
      "graft.partition.columns" -> "d"))
    TxLog.append(Seq(
      (1L, ts("2021-06-05 12:00:00")), (2L, ts("2021-06-15 12:00:00")),
      (3L, ts("2021-06-25 12:00:00"))).toDF("k", "ts"), t)
    // intra-month window (pad-safe: bounds a day inside)
    val (num, _) = TxLog.deriveGeneratedPartitionBounds(t, None,
      Map("ts" -> (epoch("2021-06-12 00:00:00"), epoch("2021-06-18 00:00:00"))),
      Map.empty)
    assert(num.get("d").exists(r => r._1 >= 11.0 && r._2 <= 19.0), num)
    // padded bounds straddling a month boundary must NOT derive: days
    // wrap (Jun 28..Jul 2 is {28..30, 1, 2})
    val (num2, _) = TxLog.deriveGeneratedPartitionBounds(t, None,
      Map("ts" -> (epoch("2021-06-28 00:00:00"), epoch("2021-07-02 00:00:00"))),
      Map.empty)
    assert(!num2.contains("d"), num2)
  }

  test("hour(ts) never derives — the remedy is a date_format hour layout") {
    // hour's coarser unit is the DAY, and the ±14 h timezone pad alone
    // exceeds a day's guard window, so no padded bound can ever satisfy
    // a same-day condition: there is no sound hour derivation. The
    // layout that WANTS hour pruning generates the non-cyclic
    // date_format(ts, 'yyyy-MM-dd HH') instead, which derives as a
    // monotone string range. Pinning BOTH directions keeps a future
    // round from "fixing" hour by weakening the pad or the guard.
    val t = tmpDir("gpp_hour") + "/t"
    TxLog.setProperties(t, Map(
      "graft.generated.h" -> "hour(ts)",
      "graft.partition.columns" -> "h"))
    TxLog.append(Seq(
      (1L, ts("2023-05-01 03:30:00")), (2L, ts("2023-05-01 15:30:00")))
      .toDF("k", "ts"), t)
    val (num, str) = TxLog.deriveGeneratedPartitionBounds(t, None,
      Map("ts" -> (epoch("2023-05-01 15:00:00"), epoch("2023-05-01 16:00:00"))),
      Map.empty)
    assert(!num.contains("h") && !str.contains("h"),
      s"hour must never derive (no sound guard window): $num $str")
    // reads stay correct — the exact row filter does the work unpruned
    assert(TxLog.readPruned(spark, t, num, str)
      .filter(col("ts") >= lit(ts("2023-05-01 15:00:00"))).count() === 1)

    // the remedy: an hour-granular date_format layout DERIVES
    val t2 = tmpDir("gpp_hourfmt") + "/t"
    TxLog.setProperties(t2, Map(
      "graft.generated.hf" -> "date_format(ts, 'yyyy-MM-dd HH')",
      "graft.partition.columns" -> "hf"))
    TxLog.append(Seq(
      (1L, ts("2023-05-01 03:30:00")), (2L, ts("2023-05-03 15:30:00")))
      .toDF("k", "ts"), t2)
    val (_, str2) = TxLog.deriveGeneratedPartitionBounds(t2, None,
      Map("ts" -> (epoch("2023-05-03 15:00:00"), epoch("2023-05-03 16:00:00"))),
      Map.empty)
    assert(str2.contains("hf"), "date_format hour layout must derive")
    val pruned = TxLog.readPruned(spark, t2, Map.empty, str2)
    assert(pruned.inputFiles.length < TxLog.activeFiles(t2).size,
      "the padded string range must still prune far-away hour dirs")
    assert(pruned.filter(col("k") === 2L).count() === 1)
  }

  test("no derivation when the query already bounds the partition column") {
    val t = yearTable()
    val (num, _) = TxLog.deriveGeneratedPartitionBounds(t, None,
      Map("ts" -> (epoch("2021-01-01 00:00:00"), epoch("2021-12-31 00:00:00")),
        "y" -> (1999.0, 2000.0)),
      Map.empty)
    assert(num("y") === (1999.0, 2000.0), "an explicit bound wins")
  }
}
