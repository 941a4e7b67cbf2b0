package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.streaming.SchemaEvolution

/** The Auto Loader capability the medallion substitution was missing
  * (reference M:12/M:53): a NEW COLUMN appears in the landing zone
  * mid-stream. [[SchemaEvolution]] detects the drift from the files,
  * widens the tracked schema, and the restarted stream (same checkpoint)
  * carries the new column forward; pre-drift silver rows read NULL for it.
  */
class SchemaDriftSpec extends SparkSpec {
  import spark.implicits._

  test("new column lands mid-stream; restart with evolved schema keeps old rows and surfaces the new column") {
    val src = tmpDir("drift_src")
    val silver = tmpDir("drift_silver")
    val cp = tmpDir("drift_cp")
    val schemaLoc = tmpDir("drift_schema")

    def runBronze(): Unit =
      graft.medallion.Medallion
        .bronzeStreamEvolving(spark, src, schemaLoc, silver, cp)
        .awaitTermination()

    // generation 1: (id, a)
    Seq((1L, "x"), (2L, "y")).toDF("id", "a")
      .coalesce(1).write.mode("append").parquet(src)
    runBronze()
    val v1 = SchemaEvolution.load(spark, schemaLoc).get
    assert(v1.fieldNames.toSeq === Seq("id", "a"))

    // generation 2: (id, a, score) lands in the same zone
    Seq((3L, "z", 4.2)).toDF("id", "a", "score")
      .coalesce(1).write.mode("append").parquet(src)
    val observed = spark.read.option("mergeSchema", "true").parquet(src).schema
    assert(SchemaEvolution.drifted(v1, observed))

    // restart from the SAME checkpoint: only unprocessed files are read,
    // now with the evolved schema
    runBronze()
    val v2 = SchemaEvolution.load(spark, schemaLoc).get
    assert(v2.fieldNames.toSeq === Seq("id", "a", "score"))

    val out = spark.read.option("mergeSchema", "true").parquet(silver)
    assert(out.columns.contains("score"))
    assert(out.count() === 3)
    // pre-drift rows survive with NULL for the new column
    assert(out.filter(col("id") === 1 && col("score").isNull).count() === 1)
    assert(out.filter(col("id") === 3).head().getAs[Double]("score") === 4.2)
  }

  test("auto-restart supervisor: live drift after a drain triggers an evolved restart by itself") {
    val src = tmpDir("adrift_src")
    val silver = tmpDir("adrift_silver")
    val cp = tmpDir("adrift_cp")
    val schemaLoc = tmpDir("adrift_schema")

    Seq((1L, "x"), (2L, "y")).toDF("id", "a")
      .coalesce(1).write.mode("append").parquet(src)

    // gen-2 lands while the supervisor owns the stream: after attempt 1
    // drains its AvailableNow snapshot, before the drift check
    var first = true
    val (schema, attempts) = SchemaEvolution.runAutoRestart(
      spark, src, schemaLoc) { () =>
      val q = graft.medallion.Medallion
        .bronzeStreamEvolving(spark, src, schemaLoc, silver, cp)
      if (first) {
        q.processAllAvailable() // attempt 1 finishes gen-1
        Seq((3L, "z", 4.2)).toDF("id", "a", "score")
          .coalesce(1).write.mode("append").parquet(src) // live drift
        first = false
      }
      q
    }
    assert(attempts === 2, s"expected exactly one auto-restart, got $attempts")
    assert(schema.fieldNames.toSeq === Seq("id", "a", "score"))
    val out = spark.read.option("mergeSchema", "true").parquet(silver)
    assert(out.count() === 3)
    assert(out.filter(col("id") === 1 && col("score").isNull).count() === 1)
    assert(out.filter(col("id") === 3).head().getAs[Double]("score") === 4.2)
  }

  test("evolve appends unknown fields nullable and never mutates existing types") {
    val tracked = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("a", StringType)))
    val observed = StructType(Seq(
      StructField("id", IntegerType), // type change: NOT adopted
      StructField("b", DoubleType, nullable = false)))
    val evolved = SchemaEvolution.evolve(tracked, observed)
    assert(evolved.fieldNames.toSeq === Seq("id", "a", "b"))
    assert(evolved("id").dataType === LongType)
    assert(evolved("b").nullable)
  }

  test("interrupted swap (tmp present, target missing) recovers the tmp instead of reinitializing") {
    val schemaLoc = tmpDir("drift_swap")
    SchemaEvolution.track(spark, schemaLoc,
      StructType(Seq(StructField("id", LongType), StructField("a", StringType))))
    val evolved = SchemaEvolution.track(spark, schemaLoc,
      StructType(Seq(StructField("id", LongType), StructField("a", StringType),
        StructField("b", DoubleType))))
    assert(evolved.fieldNames.toSeq === Seq("id", "a", "b"))
    // reproduce the crash window in track(): delete committed, rename not —
    // only _schema.ddl.tmp (holding the complete evolved schema) remains
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(schemaLoc),
      spark.sparkContext.hadoopConfiguration)
    val target = new org.apache.hadoop.fs.Path(schemaLoc, "_schema.ddl")
    val tmp = new org.apache.hadoop.fs.Path(schemaLoc, "_schema.ddl.tmp")
    assert(fs.rename(target, tmp))
    // load() recovers the tmp — previously it returned None here and the
    // next track() silently dropped the evolved column 'b'
    assert(SchemaEvolution.load(spark, schemaLoc).get.fieldNames.toSeq ===
      Seq("id", "a", "b"))
    // next track() (observing only the OLD landing schema) keeps 'b' and
    // completes the swap
    val recovered = SchemaEvolution.track(spark, schemaLoc,
      StructType(Seq(StructField("id", LongType), StructField("a", StringType))))
    assert(recovered.fieldNames.toSeq === Seq("id", "a", "b"))
    assert(fs.exists(target))
  }
}
