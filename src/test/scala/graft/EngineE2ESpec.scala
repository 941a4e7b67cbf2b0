package graft

import java.nio.file.{Files, Paths}

import scala.util.Random

/** End-to-end engine run on a generated Kaggle-shaped corpus (thousands of
  * rows, dirty-data classes at realistic rates), asserting the §5.1
  * count-conservation invariants rather than golden values: cleaning
  * stages only shrink; explode expands by |authors|×|categories|; the
  * medallion chain conserves join arithmetic.
  */
class EngineE2ESpec extends SparkSpec {

  private def genCorpus(root: String, nBooks: Int, nReviews: Int): (String, String) = {
    val rnd = new Random(7)
    val detailsCsv = new StringBuilder(
      "title,description,authors,image,previewLink,publisher,publishedDate,infoLink,categories,ratingsCount\n")
    (0 until nBooks).foreach { i =>
      val authors = Seq.fill(1 + rnd.nextInt(2))(s"Author ${rnd.nextInt(500)}")
        .mkString("['", "', '", "']")
      val cats = Seq.fill(1 + rnd.nextInt(2))(s"Cat${rnd.nextInt(20)}")
        .mkString("['", "', '", "']")
      val img = if (rnd.nextInt(20) == 0) "garbage-url" else s"http://img/$i"
      val date = if (rnd.nextInt(4) == 0) s"${1960 + rnd.nextInt(60)}"
        else s"${1960 + rnd.nextInt(60)}-0${1 + rnd.nextInt(8)}-1${rnd.nextInt(9)}"
      val rc = if (rnd.nextInt(15) == 0) "notanumber" else rnd.nextInt(5000).toString
      detailsCsv ++= s"""Book $i,desc $i,"$authors",$img,http://prev/$i,Pub${i % 50},$date,http://info/$i,"$cats",$rc\n"""
    }
    val reviewsCsv = new StringBuilder(
      "Id,Title,Price,User_id,profileName,review/helpfulness,review/score,review/time,review/summary,review/text\n")
    (0 until nReviews).foreach { i =>
      val book = rnd.nextInt(nBooks)
      val help = rnd.nextInt(10) match {
        case 0 => "0/0"
        case 1 => ""
        case _ => s"${rnd.nextInt(20)}/${1 + rnd.nextInt(20)}"
      }
      val score = if (rnd.nextInt(12) == 0) "bad" else (1 + rnd.nextInt(5)).toString
      val t = 1100000000 + rnd.nextInt(500000000) // 2004..2020
      reviewsCsv ++= s"$i,Book $book,,u${rnd.nextInt(800)},Name $i,$help,$score,$t,sum $i,text $i\n"
    }
    val d = s"$root/books_data.csv"
    val r = s"$root/Books_rating.csv"
    Files.writeString(Paths.get(d), detailsCsv.toString)
    Files.writeString(Paths.get(r), reviewsCsv.toString)
    (d, r)
  }

  test("full engine run on a 2k-book / 10k-review corpus holds the §5.1 invariants") {
    val root = tmpDir("e2e")
    val (dCsv, rCsv) = genCorpus(root, nBooks = 2000, nReviews = 10000)

    val rawDetails = etl.DetailsClean.readRaw(spark, dCsv)
    val cleanDetails = BookReviewEngine.cleanDetails(spark, dCsv, s"$root/details")
    val cleanReviews = BookReviewEngine.cleanReviews(spark, rCsv, s"$root/reviews")

    // explode expands; every other details stage shrinks or preserves
    val nRaw = rawDetails.count()
    assert(nRaw === 2000)
    val nClean = cleanDetails.count()
    assert(nClean >= nRaw - 200, "URL/na filtering removed more than the dirty-rate")
    assert(nClean <= nRaw * 4, "explode bounded by |authors|×|categories| <= 4")

    // reviews: only garbage scores drop
    val nReviews = cleanReviews.count()
    assert(nReviews > 8500 && nReviews < 10000)
    // helpfulness is never null post-fill
    assert(cleanReviews.filter(cleanReviews("Review_helpfulness").isNull).count() === 0)

    // medallion: silver row count equals the join arithmetic of its inputs
    val gold = BookReviewEngine.runMedallion(
      spark, s"$root/details", s"$root/reviews", s"$root/medallion")
    val silver = spark.read.parquet(s"$root/medallion/silver")
    val expectedSilver = cleanDetails.alias("d")
      .join(cleanReviews.alias("r"), "Title")
      .filter(org.apache.spark.sql.functions.year(
        org.apache.spark.sql.functions.col("r.review_Time").cast("date")) > 2010)
      .count()
    assert(silver.count() === expectedSilver)

    // gold conserves silver rows: sum of users_count == silver rows
    val totalUsers = gold.agg(org.apache.spark.sql.functions.sum("users_count"))
      .head().getLong(0)
    assert(totalUsers === silver.count())
  }
}
