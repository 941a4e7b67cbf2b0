package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.FloatType

import graft.Graft

/** Batch cleaning of raw book-details CSV → 11-column cleaned table,
  * re-expressing Amazon-book-review_books_details.py as composable
  * DataFrame stages. Faithful to the reference's quirks (SURVEY.md §7.4):
  * fill→dropna→dropDuplicates ordering, double-explode cross product,
  * LEGACY year parsing.
  */
object DetailsClean {

  /** CSV read with header + schema inference (details.py:54). */
  def readRaw(spark: SparkSession, path: String): DataFrame =
    spark.read.format("csv")
      .option("header", "true").option("inferSchema", "true").load(path)

  /** Strip list-literal syntax and split to arrays (details.py:68-86). */
  def cleanArrayColumns(df: DataFrame): DataFrame =
    df.withColumn("authors", regexp_replace(col("authors"), """[\[\]']""", ""))
      .withColumn("authors", split(col("authors"), ","))
      .withColumn("categories", regexp_replace(col("categories"), """[\[\]']""", ""))
      .withColumn("categories", split(col("categories"), ","))

  /** ratingsCount → Float, garbage → NULL (details.py:99; needs ANSI off). */
  def castRatings(df: DataFrame): DataFrame =
    df.withColumn("Ratings_Count", col("ratingsCount").cast(FloatType))

  /** Year_of_publish from mixed `yyyy`/`yyyy-MM-dd` strings under the
    * LEGACY parser (details.py:109-113). */
  def deriveYear(spark: SparkSession, df: DataFrame): DataFrame = {
    Graft.referenceSemantics(spark)
    df.withColumn("Year_of_publish",
      year(to_date(col("publishedDate"), "yyyy")))
  }

  /** URL sanity: keep http-prefixed or null (details.py:128/135/142). */
  def filterUrls(df: DataFrame): DataFrame =
    Seq("image", "previewLink", "infoLink").foldLeft(df) { (d, c) =>
      d.filter(col(c).startsWith("http") || col(c).isNull)
    }

  /** The 11-column projection with BOTH arrays exploded — a per-row
    * authors×categories cross product (details.py:151-153). Spark allows
    * one generator per select, so the two explodes chain; the resulting
    * rows are identical to the reference's double-explode. */
  def explodeAuthorsCategories(df: DataFrame): DataFrame =
    df.select(
        col("title").alias("Title"), col("description"),
        explode(col("authors")).alias("authors"),
        col("image"), col("previewLink"), col("publisher"),
        // pin the declared contract (Schemas.detailsCleaned): inference may
        // type a date-clean corpus as timestamp, which would poison the
        // bronze stream's declared-string schema downstream
        col("publishedDate").cast("string").alias("publishedDate"),
        col("infoLink"), col("categories"),
        col("Ratings_Count"), col("Year_of_publish"))
      .select(
        col("Title"), col("description"), col("authors"),
        col("image"), col("previewLink"), col("publisher"),
        col("publishedDate"), col("infoLink"),
        explode(col("categories")).alias("categories"),
        col("Ratings_Count"), col("Year_of_publish"))

  /** Fill strings→"N.A"/counts→0 FIRST, then drop remaining nulls, then
    * exact-duplicate rows (details.py:167-177 — order matters, §7.4.5). */
  def fillDropDedup(df: DataFrame): DataFrame =
    df.na.fill(Map(
        "Title" -> "N.A", "description" -> "N.A", "authors" -> "N.A",
        "publisher" -> "N.A", "categories" -> "N.A"))
      .na.fill(Map("Ratings_Count" -> 0.0))
      .na.drop()
      .dropDuplicates()

  /** Strip stray backslashes and double quotes (details.py:189-195). */
  def stripEscapes(df: DataFrame): DataFrame =
    Seq("authors", "publisher", "categories").foldLeft(df) { (d, c) =>
      d.withColumn(c, regexp_replace(regexp_replace(col(c), "\\\\", ""), "\"", ""))
    }

  /** Full pipeline over an already-loaded raw DataFrame. */
  def pipeline(spark: SparkSession, raw: DataFrame): DataFrame = {
    Graft.referenceSemantics(spark)
    val staged = deriveYear(spark, castRatings(cleanArrayColumns(raw)))
    stripEscapes(fillDropDedup(explodeAuthorsCategories(filterUrls(staged))))
  }

  /** CSV in → cleaned parquet out (details.py:54→203). */
  def run(spark: SparkSession, inPath: String, outPath: String): Unit =
    pipeline(spark, readRaw(spark, inPath)).write.mode("overwrite").parquet(outPath)
}
