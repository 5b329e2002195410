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

  /** Vectors with precomputed norms. Kept as raw float arrays — the
    * codegen'd VecExprs kernels widen per element, so there is no
    * up-front transform(cast) pass or doubled array in the shuffle.
    */
  private[operators] def vectors(t: Tables): DataFrame = {
    graft.functions.VecExprs.register(t.spark)
    t.embeddings
      .select(col("vec_id"), col("embedding").as("v"))
      .withColumn("nrm", expr("vec_norm(v)"))
  }

  private[operators] def cosine: Column =
    expr("vec_dot(a.v, b.v)") / (col("a.nrm") * col("b.nrm"))

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

  /** Hyperplanes per table (bucket bits) and number of independent
    * hash tables. Miss probability for a pair with bucket-bit agreement
    * p is (1 - p^bits)^tables — tables is the recall lever, bits the
    * bucket-size lever (bits ≈ log2(n / target bucket size) at scale).
    */
  val HyperplaneBits: Int = graft.functions.HyperplaneExpr.Bits
  val HashTables: Int     = graft.functions.HyperplaneExpr.Tables

  /** C7 support: one row per (vector, table) with that table's bucket
    * key — shared by the ANN path here and Dedup.embeddingCosineLsh.
    * All tables×bits hyperplane dots are fused into one codegen'd
    * kernel pass (functions/HyperplaneExpr); the resulting small
    * bucket array is safe to posexplode because the generator child
    * is codegen'd, not an interpreted lambda.
    */
  private[operators] def bandedVectors(t: Tables): DataFrame = {
    graft.functions.HyperplaneExpr.register(t.spark)
    vectors(t)
      .select(
        col("vec_id"),
        col("v"),
        col("nrm"),
        posexplode(expr("lsh_buckets(v)")).as(Seq("tbl", "bucket"))
      )
  }

  def knnLsh(t: Tables, numQueries: Int = 10, k: Int = 5): DataFrame = {
    val banded = bandedVectors(t)
    val queries = banded.filter(col("vec_id") < numQueries)
    val w       = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    broadcast(queries)
      .as("a")
      .join(
        banded.as("b"),
        col("a.tbl") === col("b.tbl") && col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") =!= col("b.vec_id")
      )
      .select(
        col("a.vec_id").as("query_id"),
        col("b.vec_id").as("neighbor_id"),
        cosine.as("cos")
      )
      .distinct() // a pair colliding in several tables is one candidate
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
      .orderBy("query_id", "rank")
  }
}
