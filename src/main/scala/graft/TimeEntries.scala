package graft

import org.apache.spark.sql.SparkSession

/** Dev-loop per-entry timer (args: sfDir name1 name2 …): runs the named
  * catalog entries exactly the way Bench's sequential pass does — noop
  * sink, state-store providers unloaded OUTSIDE the timed region between
  * entries, maintenance daemon parked — and prints min/median of 3 runs.
  * For attributing a single entry's cost without a 178-entry bench run.
  */
object TimeEntries {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Graft.referenceSemantics(spark)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    graft.streaming.SessionizeTws.configure(spark)
    spark.conf.set("spark.sql.streaming.stateStore.maintenanceInterval", "600s")
    def unload(): Unit = scala.util.Try(
      org.apache.spark.sql.execution.streaming.state.StateStore.stop())
    def once(name: String): Double = {
      val s0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[time] $name failed: ${e.getMessage}")
        return Double.NaN
      }
      val t = (System.nanoTime() - s0) / 1e9
      unload()
      t
    }
    // JVM/classload warmup, discarded
    once(names.head)
    unload()
    names.foreach { n =>
      val ts = (1 to 3).map(_ => once(n)).sorted
      println(f"[time] $n%-36s min=${ts.head}%6.2f s  med=${ts(1)}%6.2f s")
    }
    Graft.shutdown(spark)
  }
}
