package graft.etl

import org.apache.spark.sql.types._

/** Logical schemas of the book-review domain.
  *
  * `bookDetailsDeclared` mirrors the reference's declared-but-unused
  * StructType (Amazon-book-review_books_details.py:39-49) — our engine
  * actually documents/uses it, as SURVEY.md §1.3 recommends.
  */
object Schemas {

  val bookDetailsDeclared: StructType = StructType(Seq(
    StructField("title", StringType, nullable = false),
    StructField("description", StringType, nullable = true),
    StructField("authors", ArrayType(StringType), nullable = true),
    StructField("image", StringType, nullable = true),
    StructField("previewLink", StringType, nullable = true),
    StructField("publisher", StringType, nullable = true),
    StructField("publishedDate", DateType, nullable = true),
    StructField("infoLink", StringType, nullable = true),
    StructField("categories", ArrayType(StringType), nullable = true),
    StructField("ratingsCount", FloatType, nullable = true)))

  /** Books_Details_cleaned (details.py:153/203): 11 flat columns, arrays
    * exploded to strings. */
  val detailsCleaned: StructType = StructType(Seq(
    StructField("Title", StringType), StructField("description", StringType),
    StructField("authors", StringType), StructField("image", StringType),
    StructField("previewLink", StringType), StructField("publisher", StringType),
    StructField("publishedDate", StringType), StructField("infoLink", StringType),
    StructField("categories", StringType), StructField("Ratings_Count", FloatType),
    StructField("Year_of_publish", IntegerType)))

  /** Books_ratings_cleaned (reviews.py:113/119): 10 columns. */
  val ratingsCleaned: StructType = StructType(Seq(
    StructField("Id", StringType), StructField("Title", StringType),
    StructField("User_id", StringType), StructField("profileName", StringType),
    StructField("Review_helpfulness", FloatType), StructField("review_score", FloatType),
    StructField("review_time_unix", LongType), StructField("review_Time", StringType),
    StructField("review_summary", StringType), StructField("review_text", StringType)))

  /** Silver (medallion.py:116-121): 11 columns. */
  val silver: StructType = StructType(Seq(
    StructField("Title", StringType), StructField("authors", StringType),
    StructField("publisher", StringType), StructField("Year_of_publish", IntegerType),
    StructField("categories", StringType), StructField("Ratings_Count", FloatType),
    StructField("User_id", StringType), StructField("profileName", StringType),
    StructField("Review_helpfulness", FloatType), StructField("review_score", FloatType),
    StructField("review_Time", StringType)))
}
