package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (SURVEY.md §2 C6-C7). Vectors are array<float> columns; all math is
  * higher-order array functions (zip_with/aggregate) — no UDFs.
  */
object Similarity {

  /** Normalized double vectors with their ids. */
  private def vectors(t: Tables): DataFrame =
    t.embeddings
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v"))
      .withColumn("nrm", expr("sqrt(aggregate(v, 0D, (acc, x) -> acc + x * x))"))

  private def cosine: Column =
    expr("aggregate(zip_with(a.v, b.v, (x, y) -> x * y), 0D, (acc, x) -> acc + x)") /
      (col("a.nrm") * col("b.nrm"))

  /** C6: brute-force top-k cosine neighbors for a bounded query set.
    * The query side is tiny → broadcast; the corpus is scanned once
    * and never shuffled until the per-query top-k (window on the
    * broadcast key). This is the correctness baseline — exact, and
    * the right choice whenever |queries| is broadcast-sized even at
    * 100 TB corpus scale.
    */
  def knnBruteForce(t: Tables, numQueries: Int = 10, k: Int = 5): DataFrame = {
    val vecs    = vectors(t)
    val queries = vecs.filter(col("vec_id") < numQueries)
    val w       = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    broadcast(queries)
      .as("a")
      .join(vecs.as("b"), col("a.vec_id") =!= col("b.vec_id"))
      .select(
        col("a.vec_id").as("query_id"),
        col("b.vec_id").as("neighbor_id"),
        cosine.as("cos")
      )
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
      .orderBy("query_id", "rank")
  }

  /** Number of random hyperplanes = bucket bits. 2^6 = 64 buckets at
    * test SF; scale this with corpus size (bits ≈ log2(n / target
    * bucket size)).
    */
  val HyperplaneBits = 6

  /** Deterministic ±1 hyperplanes: sign from xxhash64(plane, dim)
    * parity — reproducible across runs/clusters with no RNG state.
    */
  private def bucketCol: Column = {
    val bits = (0 until HyperplaneBits).map { p =>
      val dot =
        s"aggregate(zip_with(v, sequence(0, size(v) - 1), (x, i) -> x * (cast((xxhash64($p, i) & 1) * 2 - 1 as double))), 0D, (acc, x) -> acc + x)"
      s"(case when $dot >= 0 then ${1L << p}L else 0L end)"
    }
    expr(bits.mkString(" + "))
  }

  /** C7: LSH-bucketed ANN — the scale path. Each vector lands in one
    * of 2^bits sign-pattern buckets (map-only); neighbor search is a
    * per-bucket self-join, so cost ∝ Σ bucket². Recall/latency trades
    * via bits; spec checks structural invariants + recall vs C6.
    * rows-only oracle (random-hyperplane choice isn't SQL-portable).
    */
  def knnLsh(t: Tables, numQueries: Int = 10, k: Int = 5): DataFrame = {
    val vecs    = vectors(t).withColumn("bucket", bucketCol)
    val queries = vecs.filter(col("vec_id") < numQueries)
    val w       = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    broadcast(queries)
      .as("a")
      .join(vecs.as("b"), col("a.bucket") === col("b.bucket") && col("a.vec_id") =!= col("b.vec_id"))
      .select(
        col("a.vec_id").as("query_id"),
        col("b.vec_id").as("neighbor_id"),
        cosine.as("cos")
      )
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
      .orderBy("query_id", "rank")
  }
}
