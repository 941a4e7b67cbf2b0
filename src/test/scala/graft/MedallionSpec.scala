package graft

import graft.etl.{DetailsClean, ReviewsClean}
import graft.medallion.Medallion

/** End-to-end bronze→silver→gold streaming medallion over the fixture
  * pipelines (the reference's full topology, SURVEY.md §3.3). */
class MedallionSpec extends SparkSpec {

  test("medallion: full streaming chain matches hand-computed gold") {
    val root = tmpDir("medallion")
    DetailsClean.run(spark, fixture("books_data.csv"), s"$root/details_cleaned")
    ReviewsClean.run(spark, fixture("Books_rating.csv"), s"$root/ratings_cleaned")

    val gold = Medallion.runAll(spark,
      s"$root/details_cleaned", s"$root/ratings_cleaned", s"$root/out")

    // Silver: reviews with YEAR>2010 are ids 1 and 5 (Book A) and id 4
    // (null Title filled "N.A" — which equi-joins the details row whose
    // null title was also filled "N.A": the fills happen upstream of the
    // join, so N.A matches N.A, faithful to the reference's ordering).
    // Book A details exploded to 4 author×category rows → 4×2 + 1 = 9.
    val silver = spark.read.parquet(s"$root/out/silver")
    assert(silver.count() === 9)
    assert(silver.columns.length === 11)

    // Gold: grouped by (title, year, categories).
    val rows = gold.collect().map(r =>
      (r.getAs[String]("title"), r.getAs[Int]("Year_of_publish"),
        r.getAs[String]("categories"), r.getAs[Long]("users_count"))).toSet
    assert(rows === Set(
      ("Book A", 1995, "Fiction", 4L), ("Book A", 1995, " Drama", 4L),
      ("N.A", 2010, "Memoir", 1L)))
  }
}
