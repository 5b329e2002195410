package graft

import org.apache.spark.sql.SparkSession

/** Scratch timing harness (test scope, not shipped): times a subset of
  * SparkEntry queries under the same session config Bench uses.
  * Usage: sbt "Test/runMain graft.ScratchTiming pipeline_curate_full pipeline_curate"
  */
object ScratchTiming {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    val names = if (args.nonEmpty) args.toSeq else Seq("pipeline_curate_full")
    for (rep <- 1 to 2; name <- names) {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.gc()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
      println(f"TIMING rep=$rep $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
