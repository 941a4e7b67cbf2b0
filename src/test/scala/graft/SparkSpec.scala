package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM-wide session — Spark
  * sessions are expensive; suites must not stop() it). */
object SparkTestSession {
  lazy val get: SparkSession = Graft.session("local[4]", shufflePartitions = 4)
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.get
  def fixture(name: String): String =
    getClass.getResource(s"/fixtures/$name").getPath
  val SF = "/root/testdata/sf0.001"
  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString
}
