package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** S5: streaming TO and FROM catalog tables (the reference's
  * `writeStream…table(...)` / `spark.readStream.table(...)` pattern,
  * M:39 + M:99-107) on OSS parquet-provider tables. */
class StreamTableSpec extends SparkSpec {

  test("writeStream.toTable then readStream.table round-trips") {
    val src = tmpDir("st_src")
    Tables.load(spark, SF, "region").write.mode("overwrite").parquet(src)

    spark.sql("DROP TABLE IF EXISTS region_stream_tbl")
    val q1 = spark.readStream
      .schema(Tables.load(spark, SF, "region").schema).parquet(src)
      .writeStream.format("parquet")
      .option("checkpointLocation", tmpDir("st_cp1"))
      .trigger(Trigger.AvailableNow())
      .toTable("region_stream_tbl")
    q1.awaitTermination()
    assert(spark.table("region_stream_tbl").count() === 5)

    val q2 = spark.readStream.table("region_stream_tbl")
      .groupBy().agg(count(lit(1)).alias("n"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("region_stream_out")
      .option("checkpointLocation", tmpDir("st_cp2"))
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    assert(spark.table("region_stream_out").head().getLong(0) === 5L)
    spark.sql("DROP TABLE IF EXISTS region_stream_tbl")
  }
}
