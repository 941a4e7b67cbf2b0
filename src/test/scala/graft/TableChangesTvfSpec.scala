package graft

import graft.ops.TxLog

/** `table_changes` TVF: the txlog change feed as a SQL table. */
class TableChangesTvfSpec extends SparkSpec {
  import spark.implicits._

  test("per-commit keyed diffs with _change_type/_commit_version/_commit_timestamp") {
    val t = tmpDir("tvf") + "/t"
    TxLog.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), t)        // v1
    TxLog.append(Seq((3L, "c")).toDF("k", "v"), t)                   // v2
    spark.sql(s"UPDATE txlog.`$t` SET v = 'B' WHERE k = 2")          // v3
    spark.sql(s"DELETE FROM txlog.`$t` WHERE k = 1")                 // v4
    val all = spark.sql(
      s"SELECT k, v, _change_type, _commit_version " +
        s"FROM table_changes('$t', 'k', 1)")
      .as[(Long, String, String, Long)].collect().toSet
    assert(all === Set(
      (1L, "a", "insert", 1L), (2L, "b", "insert", 1L),
      (3L, "c", "insert", 2L),
      (2L, "B", "update", 3L),
      (1L, "a", "delete", 4L)))
    // explicit end bounds the range
    val mid = spark.sql(
      s"SELECT k, _change_type FROM table_changes('$t', 'k', 2, 3)")
      .as[(Long, String)].collect().toSet
    assert(mid === Set((3L, "insert"), (2L, "update")))
    // timestamps are monotone non-decreasing across versions
    val ts = spark.sql(
      s"SELECT _commit_version, _commit_timestamp " +
        s"FROM table_changes('$t', 'k', 1)")
      .distinct().collect().map(r => r.getLong(0) -> r.getTimestamp(1))
      .sortBy(_._1).map(_._2)
    assert(ts.zip(ts.tail).forall { case (a, b) => !a.after(b) })
  }

  test("timestamp bounds resolve against the monotone in-commit stamps") {
    val t = tmpDir("tvf") + "/ts"
    TxLog.append(Seq((1L, "a")).toDF("k", "v"), t)                   // v1
    val cut = TxLog.commits(t).last.ts + 1
    TxLog.append(Seq((2L, "b")).toDF("k", "v"), t)                   // v2
    TxLog.append(Seq((3L, "c")).toDF("k", "v"), t)                   // v3
    val endTs = TxLog.commits(t).find(_.version == 2L).get.ts
    def fmt(ms: Long): String = java.time.Instant.ofEpochMilli(ms)
      .atZone(java.time.ZoneOffset.UTC).format(java.time.format
        .DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
    // start timestamp: first commit at or after the cut → v2 onward
    val fromTs = spark.sql(
      s"SELECT k, _commit_version FROM table_changes('$t', 'k', " +
        s"TIMESTAMP '${fmt(cut)}')")
      .as[(Long, Long)].collect().toSet
    assert(fromTs === Set((2L, 2L), (3L, 3L)))
    // end timestamp: last commit at or before v2's stamp → v1..v2
    val toTs = spark.sql(
      s"SELECT k, _commit_version FROM table_changes('$t', 'k', 1, " +
        s"TIMESTAMP '${fmt(endTs)}')")
      .as[(Long, Long)].collect().toSet
    assert(toTs === Set((1L, 1L), (2L, 2L)))
    // string form works too, and a start beyond the tip refuses
    val viaStr = spark.sql(
      s"SELECT COUNT(*) FROM table_changes('$t', 'k', '${fmt(cut)}')")
      .head.getLong(0)
    assert(viaStr === 2L)
    val e = intercept[Exception](spark.sql(
      s"SELECT * FROM table_changes('$t', 'k', " +
        s"TIMESTAMP '${fmt(TxLog.commits(t).last.ts + 60000)}')").collect())
    assert(e.getMessage.contains("at or after"), e.getMessage)
  }

  test("diffs across a type-widening boundary coerce, the widen commit itself is silent") {
    val t = tmpDir("tvf") + "/w"
    TxLog.append(Seq((1, "a")).toDF("k", "v"), t)                    // v1
    TxLog.widenColumnType(spark, t, "k",
      org.apache.spark.sql.types.LongType)                           // v2
    TxLog.append(Seq((9000000000L, "b")).toDF("k", "v"), t)          // v3
    spark.sql(s"UPDATE txlog.`$t` SET v = 'A' WHERE k = 1")          // v4
    val got = spark.sql(
      s"SELECT k, v, _change_type, _commit_version " +
        s"FROM table_changes('$t', 'k', 2)")
      .as[(Long, String, String, Long)].collect().toSet
    assert(got === Set(
      (9000000000L, "b", "insert", 3L),
      (1L, "A", "update", 4L)),
      "the metadata-only widen contributes nothing; diffs spanning " +
        "narrow and wide eras coerce")
  }

  test("refusals: bad range, non-literal args, empty keys") {
    val t = tmpDir("tvf") + "/r"
    TxLog.append(Seq((1L, "a")).toDF("k", "v"), t)
    def bad(sql: String, frag: String): Unit = {
      val e = intercept[Exception](spark.sql(sql).collect())
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    bad(s"SELECT * FROM table_changes('$t', 'k', 5)", "version range")
    bad(s"SELECT * FROM table_changes('$t', 'k', 0)", "version range")
    bad(s"SELECT * FROM table_changes('$t', '', 1)", "at least one")
    bad(s"SELECT * FROM table_changes('$t', 'k', 1, 2, 3)", "expects")
  }
}
