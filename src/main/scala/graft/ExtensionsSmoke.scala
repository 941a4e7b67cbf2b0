package graft

import org.apache.spark.sql.SparkSession

import graft.functions.GraftExtensions

/** Smoke-check of the session-build extension path: a fresh session built
  * `withExtensions(new GraftExtensions)` must expose the native functions
  * in SQL and plan the custom top-k node — without any runtime
  * registration calls. (Run in its own JVM; the test suites share a
  * session and cannot exercise builder-time extensions.) */
object ExtensionsSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val d = spark.sql(
      "SELECT vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d").head().getDouble(0)
    assert(d == 11.0, s"vec_dot via SQL extensions: $d")

    val df = Seq((1L, 5.0, 1L), (1L, 9.0, 2L), (2L, 3.0, 3L))
      .toDF("key", "score", "id")
    val top = graft.ops.TopK.perKey(df, Seq("key"), Seq(("score", false)), 1)
      .select("key", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(top == Set((1L, 2L), (2L, 3L)), s"TopKPerKey via extensions: $top")

    println("[extensions-smoke] OK: vec_dot SQL + TopKPerKey planned via GraftExtensions")
    Graft.shutdown(spark)
  }
}
