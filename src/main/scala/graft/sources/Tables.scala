package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Typed accessors for the test corpus (TPC-H-ish star schema plus an
  * `events` stream table and `documents`/`embeddings` for the
  * LLM-pipeline operators).
  *
  * All loads are plain parquet scans so Catalyst can push filters and
  * prune columns into the file scan — operators must NOT cache or
  * materialize here; each query should present one end-to-end logical
  * plan to the optimizer.
  */
/** @param docsOverride substitute `documents` frame (same schema) — the
  *   versioned-release operators run the WHOLE curation/release chain
  *   over a simulated corpus version by overriding the one input
  *   rather than threading a frame through every stage signature;
  *   None (the default, and every gate entry point) reads the parquet
  *   corpus.
  */
final case class Tables(
    spark: SparkSession,
    dir: String,
    docsOverride: Option[DataFrame] = None
) {
  private def t(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  /** events.parquet has shipped with two ts layouts: TIMESTAMP(NANOS)
    * (which Spark 4's vectorized reader rejects — read nanos as long
    * via the legacy conf and rebuild a microsecond timestamp) and
    * plain TIMESTAMP_NTZ(MICROS). Normalize BOTH to session-local
    * TimestampType micros: the session TZ is pinned to UTC, so the
    * NTZ→LTZ cast is value-identity and every operator sees one type.
    */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = t("events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ =>
        df.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
  /** documents/embeddings feed CPU-heavy per-row pipelines (shingling,
    * minhash, simhash, vector math). The test corpus ships as ONE
    * parquet row group per table, which would pin all of that compute
    * to a single task — so when scan parallelism is degenerate
    * (fewer files than half the cores) we round-robin rebalance once
    * up front. The data is tiny relative to the per-row compute, and
    * at production scale (thousands of row groups) the condition never
    * triggers, so no shuffle is added where the scan already
    * parallelizes.
    */
  private def rebalanced(name: String): DataFrame = {
    val df    = t(name)
    val cores = spark.sparkContext.defaultParallelism
    if (df.inputFiles.length < cores / 2) df.repartition(cores) else df
  }

  def documents: DataFrame  = docsOverride.getOrElse(rebalanced("documents"))
  def embeddings: DataFrame = rebalanced("embeddings")
}
