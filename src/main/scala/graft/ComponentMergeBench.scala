package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale canary for the C22i/C22k maintenance claim: a FIXED delta's
  * merge into the persisted component state costs (roughly) the same
  * whether the indexed base corpus is 1× or N×, while the batch
  * re-resolution it replaces re-pays the full pair join + min-label
  * iteration at every scale. This is THE nightly-refresh economics —
  * the merge's only corpus-sized work is linear, exchange-free scans
  * (the posting probe against the pinned index with the delta side
  * broadcast, plus two map-side state passes); the label iteration
  * runs on the contracted label graph the delta touches, never the
  * corpus.
  *
  * Fixture: the base corpus is [[ScaleCanaryBench]]'s content-VARIED
  * copies (same vowel-permutation rule, same caveats — cross-copy
  * Jaccard falls under τ so candidate mass scales with copies, not
  * copies²) of the sf docs with doc_id % 10 ≠ 0; the delta is the
  * ORIGINAL % 10 = 0 slice at every scale, so delta edge mass is held
  * constant while base/state size grows. Asset builds (signature
  * index, base C2c state) are untimed — they are the amortized
  * once-per-corpus cost the deployment already paid. Merge iterations
  * probe the SAME pinned snapshots each run (pins make repeat merges
  * deterministic; the prior iteration's patch epoch is invisible), so
  * min-of-iters is honest. Timing mirrors Bench/ScaleCanaryBench:
  * toRdd.count-equivalent full materialization (the merge and batch
  * both end in real store/actions), unpersist + gc between points,
  * the fixed two-key untimed warm-up, min of `iters`. One JSON line
  * out (the Bench convention).
  */
object ComponentMergeBench {

  def main(args: Array[String]): Unit = {
    val cpus   = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir  = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val copies = sys.env.getOrElse("SPARK_GRAFT_CANARY_COPIES", "10").toInt
    val iters  = sys.env.getOrElse("SPARK_GRAFT_CANARY_ITERS", "2").toInt
    require(copies <= ScaleCanaryBench.Perms.size,
      s"at most ${ScaleCanaryBench.Perms.size} content-varied copies")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ui.retainedExecutions", "16")
      .config("spark.ui.retainedJobs", "100")
      .config("spark.ui.retainedStages", "100")
      .config("spark.ui.retainedTasks", "1000")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val tau    = graft.operators.Dedup.JaccardTau
    val t      = graft.sources.Tables(spark, sfDir)
    val docs   = t.documents.select("doc_id", "text", "lang", "source", "n_chars")
    val docOff = docs.agg(max("doc_id")).head.getLong(0) + 1L

    /** Content-varied base corpus at `k` copies (copy 0 = the original
      * % 10 ≠ 0 slice), materialized to parquet so every timed run
      * reads the same files.
      */
    def baseAt(k: Int, dir: String): DataFrame = {
      val slice = docs.filter(col("doc_id") % 10 =!= 0)
      (0 until k).map { i =>
        if (i == 0) slice
        else slice.select(
          (col("doc_id") + lit(i * docOff)).as("doc_id"),
          ScaleCanaryBench.mutateLongWords("text", ScaleCanaryBench.Perms(i)).as("text"),
          col("lang"), col("source"), col("n_chars"))
      }.reduce(_.unionAll(_)).write.parquet(dir)
      spark.read.parquet(dir)
    }

    def gcNow(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.gc()
    }
    def timed(body: => Unit): Double = {
      (1 to iters).map { _ =>
        gcNow()
        val t0 = System.nanoTime()
        body
        (System.nanoTime() - t0) / 1e9
      }.min
    }
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

    val root = java.nio.file.Files.createTempDirectory("graft-compmerge")
    try {
      // the FIXED delta, parquet-materialized (a localCheckpoint would
      // be swept by the between-runs blanket unpersist)
      docs.filter(col("doc_id") % 10 === 0).write.parquet(s"$root/delta.parquet")
      val delta = spark.read.parquet(s"$root/delta.parquet")

      // warm-up: the Bench subset pair, untimed (cold-JIT control)
      for (n <- Seq("dedup_ngram_jaccard", "q_funnel"))
        SparkEntry.queries(n)(spark, sfDir).queryExecution.toRdd.count(): Unit
      gcNow()

      val points = Seq(1, copies).map { k =>
        val dir      = s"$root/x$k"
        val base     = baseAt(k, s"$dir/base.parquet")
        val baseRows = base.count()
        // --- untimed asset builds (the amortized once-per-corpus cost)
        val sigDir   = s"$dir/sig"
        val stateDir = s"$dir/state"
        val sigPin = Seq(
          graft.operators.Dedup.writeSignatureIndexColumnar(spark, base, sigDir))
        val statePin = Seq(graft.operators.Dedup.writeComponentState(
          graft.operators.Dedup.nearDupComponents(
            t, tau, None, Some(graft.operators.Dedup.hashedPostingsOn(base))),
          stateDir))
        // --- timed: the incremental merge (same pinned snapshots every
        // iter — earlier iters' patch epochs are invisible to the pin)
        val tMerge = timed {
          graft.operators.Dedup.mergeDeltaComponents(
            spark, delta, sigDir, sigPin, stateDir, statePin, tau): Unit
        }
        // --- timed: the batch re-resolution the merge replaces
        var batchRows = 0L
        val tBatch = timed {
          batchRows = graft.operators.Dedup.nearDupComponents(
            t, tau, None,
            Some(graft.operators.Dedup.hashedPostingsOn(base.unionAll(delta))))
            .queryExecution.toRdd.count()
        }
        println(s"[canary] x$k ($baseRows base docs): merge ${fmt(tMerge)} s, " +
          s"batch ${fmt(tBatch)} s (batch/merge ${fmt(tBatch / tMerge)})")
        s""""x$k":{"base_rows":$baseRows,"merge_s":${fmt(tMerge)},""" +
          s""""batch_s":${fmt(tBatch)},"batch_over_merge":${fmt(tBatch / tMerge)},""" +
          s""""batch_label_rows":$batchRows}"""
      }
      println(
        s"""{"metric":"component_merge_canary","copies":$copies,"iters":$iters,""" +
          s""""points":{${points.mkString(",")}},"sf":"$sfDir"}""")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
    }
  }
}
