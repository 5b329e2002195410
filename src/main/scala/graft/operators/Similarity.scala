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

  /** Number of IVF cells, probed cells per query, and k-means rounds. */
  val IvfCells    = 16
  val IvfProbes   = 4
  val LloydRounds = 2

  /** Centroid-training sample size. A few thousand vectors saturate
    * `IvfCells` means statistically (≈128 samples/cell at 16 cells);
    * training on the full corpus would run the explode+groupBy
    * k-means shuffle over EVERY vector per round — at 100 TB that is
    * two full-corpus shuffles to fit 16 centroids.
    */
  val IvfTrainCap = 2048

  private def centLit(c: Array[Double]) = array(c.toIndexedSeq.map(lit): _*)

  /** Normalize to unit length (spherical k-means: with unit centroids,
    * max-dot assignment IS max-cosine, so the mean update matches the
    * assignment metric).
    */
  private def unit(c: Array[Double]): Array[Double] = {
    val n = math.sqrt(c.map(x => x * x).sum)
    if (n == 0) c else c.map(_ / n)
  }

  /** One spherical-Lloyd round: assign every vector to its max-dot
    * centroid, average per (cell, dimension) — a distributed
    * partial-agg'd groupBy — collect the cells×dims means (same tiny
    * driver footprint as the seeds) and renormalize. Means are rounded
    * to 1e-6 so float summation order can't flip run-to-run cell
    * assignments; empty cells keep their previous centroid.
    */
  private def lloydRound(vecs: DataFrame, cents: Array[Array[Double]]): Array[Array[Double]] = {
    val dots = cents.zipWithIndex.map { case (c, i) =>
      call_function("vec_dot", col("v"), centLit(c)).as(s"d$i")
    }
    val maxDot = greatest(cents.indices.map(i => col(s"d$i")): _*)
    val argmax = cents.indices
      .foldRight(lit(-1)) { case (i, acc) => when(col(s"d$i") === maxDot, lit(i)).otherwise(acc) }
    val means = vecs
      .select((col("v") +: dots.toIndexedSeq): _*)
      .withColumn("cell", argmax)
      .select(col("cell"), posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy("cell", "dim")
      .agg(avg(col("x").cast("double")).as("m"))
      .collect()
    val next = cents.map(_.clone())
    means.foreach { r =>
      next(r.getInt(0))(r.getInt(1)) = r.getDouble(2)
    }
    next.map(c => unit(c).map(x => math.rint(x * 1e6) / 1e6))
  }

  /** C7b: IVF-flat ANN — the other classical scale path. Centroids are
    * trained on a bounded deterministic sample (hash-ordered top
    * IvfTrainCap rows, materialized once): seeds are the sample's
    * lowest-hash vectors — pseudo-random, not clustering-quality luck —
    * refined with LloydRounds k-means rounds that shuffle only sample
    * rows. Every corpus vector is then assigned to its max-dot cell in
    * one codegen'd projection (centroids are driver-collected → literal
    * arrays, exactly like a broadcast); each query probes its `nprobe`
    * best cells, so search cost is corpus/cells × nprobe per query
    * instead of the full scan. rows-only oracle + recall spec vs the
    * exact C6 baseline.
    */
  def knnIvf(
      t: Tables,
      numQueries: Int = 10,
      k: Int = 5,
      cells: Int = IvfCells,
      nprobe: Int = IvfProbes
  ): DataFrame = {
    val vecs = vectors(t)
    // bounded training sample: TakeOrdered by vector-id hash is one
    // map-side top-K over the corpus (no shuffle of vector payloads),
    // checkpointed so both Lloyd rounds reuse the materialized sample
    val train = vecs
      .select(col("vec_id"), col("v"))
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(IvfTrainCap)
      .localCheckpoint()
    val seeds: Array[Array[Double]] = train
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(cells)
      .collect()
      .map(r => unit(r.getSeq[Float](1).map(_.toDouble).toArray))
    val cents = (1 to LloydRounds).foldLeft(seeds)((c, _) => lloydRound(train, c))
    val dots = cents.zipWithIndex.map { case (c, i) =>
      call_function("vec_dot", col("v"), centLit(c)).as(s"d$i")
    }
    // linear-size argmax: greatest() then a flat first-match chain —
    // a pairwise struct reduce would nest CASEs 2^cells deep
    val maxDot = greatest(cents.indices.map(i => col(s"d$i")): _*)
    val argmax = cents.indices
      .foldRight(lit(-1)) { case (i, acc) => when(col(s"d$i") === maxDot, lit(i)).otherwise(acc) }
    val celled = vecs
      .select((col("vec_id") +: col("v") +: col("nrm") +: dots.toIndexedSeq): _*)
      .withColumn("cell", argmax)
      .drop(cents.indices.map(i => s"d$i"): _*)
    // queries probe their nprobe max-dot cells
    val probeRank = Window.partitionBy("vec_id").orderBy(col("cdot").desc, col("cell"))
    val probes = vecs
      .filter(col("vec_id") < numQueries)
      .select(col("vec_id"), col("v"), col("nrm"), explode(sequence(lit(0), lit(cells - 1))).as("cell"))
      .withColumn(
        "cdot",
        cents.zipWithIndex
          .map { case (c, i) => (i, call_function("vec_dot", col("v"), centLit(c))) }
          .foldLeft(lit(Double.NegativeInfinity)) { case (acc, (i, d)) =>
            when(col("cell") === i, d).otherwise(acc)
          }
      )
      .withColumn("prb", row_number().over(probeRank))
      .filter(col("prb") <= nprobe)
      .select(col("vec_id"), col("v"), col("nrm"), col("cell"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    broadcast(probes)
      .as("a")
      .join(celled.as("b"), col("a.cell") === col("b.cell") && col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("query_id"), col("b.vec_id").as("neighbor_id"), cosine.as("cos"))
      .distinct()
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
      .orderBy("query_id", "rank")
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
