package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  def knnBruteForce(t: Tables, numQueries: Int = 10, k: Int = 5): DataFrame =
    knnOn(vectors(t).filter(col("vec_id") < numQueries), vectors(t), k)

  /** Shared exact-top-k core: broadcast the (bounded) query side
    * against the corpus, rank per query. Also the per-micro-batch
    * kernel of the CONTINUOUS similarity search (q_stream_knn), where
    * `queries` is one streamed batch of probe vectors.
    */
  private[graft] def knnOn(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    // zero-norm guard (both sides): 0/0 cosine is NaN, and Spark's
    // NaN-is-largest ordering would rank a zero vector FIRST for every
    // query — a zero vector has no direction, so it neither queries
    // nor neighbors. Uniform across the C5/C6 family.
    broadcast(queries.filter(col("nrm") > 0))
      .as("a")
      .join(corpus.filter(col("nrm") > 0).as("b"), col("a.vec_id") =!= col("b.vec_id"))
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

  /** Continuous similarity search's per-batch kernel: a streamed batch
    * of probe vectors (raw embeddings schema) ranked exactly against
    * the static corpus. Every query lives in exactly one micro-batch,
    * so the drained union over batches equals the all-queries batch
    * top-k — which is what lets the streaming path share the
    * brute-force oracle. At 100 TB the static side is served by the
    * IVF/PQ index keys; the per-batch probe side stays broadcast-sized
    * by construction (it is one micro-batch).
    */
  def streamingKnn(t: Tables, probes: DataFrame, k: Int = 5): DataFrame = {
    graft.functions.VecExprs.register(t.spark)
    val q = probes
      .select(col("vec_id"), col("embedding").as("v"))
      .withColumn("nrm", expr("vec_norm(v)"))
    knnOn(q, vectors(t), k)
  }

  /** C41: embedding-space label purity@k — for a deterministic query
    * sample, the fraction of each query's k nearest neighbors that
    * share its label, rolled up per label. THE standard embedding-QA
    * metric: a label whose members' neighborhoods are full of other
    * labels is mislabeled, drifting, or not separable — checked before
    * anyone trains on the vectors.
    *
    * Same broadcast-sample × corpus shape as [[knnBruteForce]] (exact
    * under the sample; at 100 TB the sample is what you'd audit
    * anyway), but the OUTPUT is integer hit/total counts per label —
    * the purity ratio is the consumer's one division, and integers are
    * what lets a float-free oracle hash-gate an all-pairs cosine
    * pipeline.
    */
  def knnLabelPurity(t: Tables, sampleMod: Int = 5, k: Int = 5): DataFrame = {
    graft.functions.VecExprs.register(t.spark)
    val vecs = t.embeddings
      .select(col("vec_id"), col("embedding").as("v"), col("label"))
      .withColumn("nrm", expr("vec_norm(v)"))
      .filter(col("nrm") > 0) // the knnOn zero-norm rule
    val queries = vecs.filter(col("vec_id") % sampleMod === 0)
    val w       = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    broadcast(queries)
      .as("a")
      .join(vecs.as("b"), col("a.vec_id") =!= col("b.vec_id"))
      .select(
        col("a.vec_id").as("query_id"),
        col("a.label").as("label"),
        (col("b.label") === col("a.label")).as("same"),
        cosine.as("cos"),
        col("b.vec_id").as("neighbor_id")
      )
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .groupBy("label")
      .agg(
        countDistinct(col("query_id")).as("n_queries"),
        sum(when(col("same"), 1L).otherwise(0L)).as("same_label_hits"),
        count(lit(1)).as("n_neighbors")
      )
      .orderBy("label")
  }

  /** C7d: FILTERED vector search — top-k cosine neighbors restricted
    * to a metadata predicate (here: same label as the query, the
    * tenant/class restriction every production vector store needs).
    *
    * This is a PRE-filter: the predicate enters the join condition, so
    * candidates are ranked only among survivors and the top-k is exact
    * UNDER the filter. The alternative — post-filtering a global
    * top-k — silently returns < k (or wrong) results whenever the
    * filter is selective, which is the classic filtered-ANN bug. At
    * scale the same shape composes with the IVF/LSH candidate paths:
    * the predicate rides the candidate join either way, and a
    * partition-pruned layout (label-partitioned parquet) turns it into
    * a scan-level prune.
    */
  def knnFiltered(t: Tables, numQueries: Int = 10, k: Int = 5): DataFrame = {
    graft.functions.VecExprs.register(t.spark)
    val vecs = t.embeddings
      .select(col("vec_id"), col("embedding").as("v"), col("label"))
      .withColumn("nrm", expr("vec_norm(v)"))
      .filter(col("nrm") > 0) // the knnOn zero-norm rule
    val queries = vecs.filter(col("vec_id") < numQueries)
    val w       = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    broadcast(queries)
      .as("a")
      .join(vecs.as("b"),
        col("a.vec_id") =!= col("b.vec_id") && col("a.label") === col("b.label"))
      .select(
        col("a.vec_id").as("query_id"),
        col("b.vec_id").as("neighbor_id"),
        col("a.label").as("label"),
        cosine.as("cos")
      )
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "label", "rank")
      .orderBy("query_id", "rank")
  }

  /** C40: per-label centroid accumulation — the class-prototype /
    * embedding-QA aggregate ("is label 3's cluster drifting?"). Raw
    * float summation is partial-aggregation-order dependent, so the
    * kernel QUANTIZES each component to fixed point first
    * (round(v·10⁴) — both engines round half away from zero and the
    * float→double widening is IEEE-identical) and accumulates exact
    * integers: the 100 TB shape is one posexplode (codegen'd raw-array
    * generator) + ONE (label, dim) shuffle of map-side-combined longs,
    * output = labels × dims rows at any corpus size. Emits (Σq, n) —
    * the consumer divides, the num/den convention again.
    */
  /** C43: per-label farthest-from-centroid ranking — the mislabel /
    * contamination triage list: for every label, the k vectors whose
    * squared distance to the label centroid is largest. All arithmetic
    * is EXACT fixed-point on the C40 quantization (qv = round(v·1e4)):
    * the centroid mean sum_q/n is never divided out — distances are
    * compared as d²·n² = Σ_dim (n·qv − sum_q)², an integer identity
    * that is engine-portable (float centroid math would drift in the
    * last bits and reorder equal-magnitude ties). Sums are Decimal(38)
    * so petabyte-scale n²-inflated magnitudes can't overflow.
    *
    * Plan: the (label, dim) centroid aggregate is tiny (labels × dims)
    * and broadcasts back onto one map-side explode of the vectors; the
    * per-vector reduction is one partial-agg'd shuffle on vec_id; the
    * per-label top-k runs through the bounded-heap TopKPerKey operator
    * (O(n log k), no per-label sort). Ties pin on (d2n2 desc, vec_id).
    */
  def labelOutliers(t: Tables, k: Int = 5, scale: Int = 10000): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val q = t.embeddings
      .select(col("vec_id"), col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .select(col("vec_id"), col("label"), col("dim"),
        round(col("v").cast("double") * scale).cast("long").as("qv"))
    val cent = q
      .groupBy(col("label").as("c_label"), col("dim").as("c_dim"))
      .agg(sum("qv").as("sum_q"), count(lit(1)).as("n"))
    val d2 = q
      .join(broadcast(cent), col("label") === col("c_label") && col("dim") === col("c_dim"))
      .select(col("vec_id"), col("label"),
        ((col("n") * col("qv") - col("sum_q")).cast(dec) *
          (col("n") * col("qv") - col("sum_q")).cast(dec)).as("term"))
      .groupBy("vec_id", "label")
      .agg(sum("term").cast(dec).as("d2n2"))
    graft.plans.TopK
      .perKey(d2, Seq("label"), Seq(col("d2n2").desc, col("vec_id")), k)
      // bigint output (exact to ~9e18 — covers every gate SF; the
      // decimal is only needed transiently inside the sum)
      .select(col("label"), col("vec_id"), col("d2n2").cast("long").as("d2n2"), col("rnk"))
      .orderBy("label", "rnk")
  }

  def labelCentroids(t: Tables, scale: Int = 10000): DataFrame =
    t.embeddings
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .select(col("label"), col("dim").cast("long").as("dim"),
        round(col("v").cast("double") * scale).cast("long").as("qv"))
      .groupBy("label", "dim")
      .agg(sum("qv").as("sum_q"), count(lit(1)).as("n_vecs"))
      .orderBy("label", "dim")

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
      .filter(col("nrm") > 0) // the knnOn zero-norm rule
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

  /** The whole centroid/codebook table as ONE nested-array literal for
    * the compiled `mat_dots` kernels — the per-row `centLit` column
    * form paid rows×dims Literal NODES per projection (16 cells × 32
    * dims ≈ 512 nodes, stacked 16× across the PQ subspaces), which
    * made plan analysis/codegen the dominant driver cost of the IVF
    * family at gate scale.
    */
  private def matLit(m: Array[Array[Double]]) =
    typedLit(m.toIndexedSeq.map(_.toIndexedSeq))

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
    // mat_dots row r == vec_dot(v, cents(r)) bit-for-bit, and the
    // first-max array_position equals the old first-match when-chain
    val means = vecs
      .select(col("v"), call_function("mat_dots", col("v"), matLit(cents)).as("dots"))
      .withColumn("cell", (array_position(col("dots"), array_max(col("dots"))) - 1).cast("int"))
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
  /** Bounded training sample: TakeOrdered by vector-id hash is one
    * map-side top-K over the corpus (no shuffle of vector payloads),
    * checkpointed so every Lloyd round reuses the materialized sample.
    */
  private def trainSample(vecs: DataFrame): DataFrame =
    vecs
      .select(col("vec_id"), col("v"))
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(IvfTrainCap)
      .localCheckpoint()

  private def trainCentroids(train: DataFrame, cells: Int): Array[Array[Double]] = {
    val seeds: Array[Array[Double]] = train
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(cells)
      .collect()
      .map(r => unit(r.getSeq[Float](1).map(_.toDouble).toArray))
    (1 to LloydRounds).foldLeft(seeds)((c, _) => lloydRound(train, c))
  }

  /** Corpus side: every vector assigned to its max-dot cell in one
    * codegen'd projection (centroid literals — a broadcast in spirit).
    * TRULY linear argmax: the dots land in ONE array column and the
    * cell is `array_position(dots, array_max(dots))` — first match on
    * ties, same convention as a first-match CASE chain, but the
    * expression tree is O(cells). (The previous flat chain of
    * `when(dᵢ = greatest(d₀..dₙ))` inlined the n-arg greatest into
    * each of the n branches — O(n²) generated code, and with 16
    * subspaces stacked downstream it pushed the generated class past
    * Janino's limits, silently de-codegening the whole stage.)
    */
  private[graft] def withCell(vecs: DataFrame, cents: Array[Array[Double]]): DataFrame = {
    val dotsArr = call_function("mat_dots", col("v"), matLit(cents))
    vecs
      .select(col("vec_id"), col("v"), col("nrm"), dotsArr.as("dots"))
      .withColumn(
        "cell",
        (array_position(col("dots"), array_max(col("dots"))) - 1).cast("int")
      )
      .drop("dots")
  }

  /** Corpus vectors with their max-dot k-means cell — the C51
    * candidate machinery (bounded training sample → spherical Lloyd →
    * codegen'd argmax) as ONE definition for every operator that
    * sources candidates from IVF cells: [[semanticDedup]],
    * [[semanticMissAudit]], and Dedup.paraphraseCandidatesIvf. Not
    * materialized here — each caller checkpoints per its own reuse
    * shape.
    */
  private[operators] def cellAssignments(t: Tables, cells: Int = IvfCells): DataFrame = {
    val vecs = vectors(t)
    withCell(vecs, trainCentroids(trainSample(vecs), cells))
  }

  /** Query side: each query expands to its nprobe max-dot cells. */
  private def queryProbes(
      vecs: DataFrame,
      cents: Array[Array[Double]],
      numQueries: Int,
      nprobe: Int
  ): DataFrame = {
    val probeRank = Window.partitionBy("vec_id").orderBy(col("cdot").desc, col("cell"))
    vecs
      .filter(col("vec_id") < numQueries)
      // posexplode of mat_dots: (cell, cdot) for every cell — the same
      // rows the explode(sequence) + per-cell when-chain produced
      .select(
        col("vec_id"),
        col("v"),
        col("nrm"),
        posexplode(call_function("mat_dots", col("v"), matLit(cents))).as(Seq("cell", "cdot"))
      )
      .withColumn("prb", row_number().over(probeRank))
      .filter(col("prb") <= nprobe)
      .select(col("vec_id"), col("v"), col("nrm"), col("cell"))
  }

  def knnIvf(
      t: Tables,
      numQueries: Int = 10,
      k: Int = 5,
      cells: Int = IvfCells,
      nprobe: Int = IvfProbes
  ): DataFrame = {
    val vecs   = vectors(t).filter(col("nrm") > 0) // the knnOn zero-norm rule
    val cents  = trainCentroids(trainSample(vecs), cells)
    val celled = withCell(vecs, cents)
    val probes = queryProbes(vecs, cents, numQueries, nprobe)
    val w      = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
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

  // --- C7e: the PERSISTED IVF index asset ---------------------------------
  // knnIvf trains centroids and runs the full-corpus cell-assignment
  // projection PER RUN — fine for a one-shot query, wrong for the
  // deployment shape, where the index is built nightly and served many
  // times (FAISS: train/add once, search many). Here both halves persist
  // as ParquetEpochs store assets (the C22e/f pattern applied to ANN):
  // a probe reads the PINNED index and pays neither training nor the
  // corpus projection — and never opens the embeddings table at all.

  /** C7e (build): persist the IVF index as TWO store assets (one row
    * schema per store is enforced, so centroids and assignments cannot
    * share one): `centStore` holds the cells×dims centroid table —
    * metadata-sized, the probe collects it like a broadcast — and
    * `asgStore` holds (vec_id, v, nrm, cell): the corpus vectors WITH
    * their max-dot cell, range-clustered BY CELL so the footer-derived
    * `_stats` bounds (B65b) are tight and a cell-scoped serving read
    * plans only the covering files. Returns the two manifest names to
    * pin. Maintenance is the store's own: OPTIMIZE/vacuum/pins apply,
    * and a re-build into a fresh store is the re-train cadence.
    */
  def buildIvfIndex(
      t: Tables,
      centStore: String,
      asgStore: String,
      cells: Int = IvfCells
  ): (String, String) =
    buildIvfIndexFrom(t.spark, vectors(t), centStore, asgStore, cells)

  /** [[buildIvfIndex]] over an explicit (vec_id, v, nrm) corpus slice —
    * the form the incremental story needs (train on the BASE corpus,
    * [[addToIvfIndex]] the rest against those centroids).
    */
  def buildIvfIndexFrom(
      spark: SparkSession,
      corpus: DataFrame,
      centStore: String,
      asgStore: String,
      cells: Int = IvfCells
  ): (String, String) = {
    import spark.implicits._
    val vecs  = corpus.filter(col("nrm") > 0)
    val cents = trainCentroids(trainSample(vecs), cells)
    val mc = graft.sources.ParquetEpochs.append(
      cents.zipWithIndex.toSeq.map { case (c, i) => (i, c.toSeq) }.toDF("cell", "c"),
      centStore)
    val ma = graft.sources.ParquetEpochs.append(
      withCell(vecs, cents)
        .repartitionByRange(cells, col("cell"), col("vec_id"))
        .sortWithinPartitions("cell", "vec_id"),
      asgStore)
    (mc, ma)
  }

  /** The pinned centroid table read back — bounded (cells rows), the
    * same driver-side class as the training collects.
    */
  def readIvfCentroids(
      spark: SparkSession,
      centStore: String,
      manifests: Seq[String]
  ): Array[Array[Double]] =
    graft.sources.ParquetEpochs
      .read(spark, centStore, manifests)
      .orderBy("cell")
      .collect()
      .map(_.getSeq[Double](1).toArray)

  /** C7e (probe): [[knnIvf]]'s search half over the PINNED assets —
    * centroids from the tiny store (collected, like a broadcast),
    * candidates from the assignments store with each query probing its
    * nprobe best cells. No training, no corpus projection, no
    * embeddings scan: provenance is the two stores' parquet files only
    * (spec-pinned), and with the cell-clustered layout a single cell's
    * candidates live in O(1) files (the serving read; spec pins
    * plannedFiles). Verdicts equal a fresh [[knnIvf]] run row for row
    * — centroid training is deterministic (hash-ordered sample,
    * 1e-6-rounded means), so persisting it is pure factoring.
    */
  def knnIvfPersisted(
      spark: SparkSession,
      centStore: String,
      centPin: Seq[String],
      asgStore: String,
      asgPin: Seq[String],
      numQueries: Int = 10,
      k: Int = 5,
      nprobe: Int = IvfProbes
  ): DataFrame = {
    graft.functions.VecExprs.register(spark)
    val cents  = readIvfCentroids(spark, centStore, centPin)
    val celled = graft.sources.ParquetEpochs.read(spark, asgStore, asgPin)
    ivfSearch(celled, cents, numQueries, k, nprobe)
  }

  /** The IVF search half over ANY celled (vec_id, v, nrm, cell) corpus
    * — the body [[knnIvfPersisted]] runs on the pinned store read and
    * the frozen-centroid reference the C7f equality spec pins the
    * incremental index against.
    */
  private[graft] def ivfSearch(
      celled: DataFrame,
      cents: Array[Array[Double]],
      numQueries: Int,
      k: Int,
      nprobe: Int
  ): DataFrame = {
    val probes = queryProbes(celled, cents, numQueries, nprobe)
    val w      = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
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

  /** C7f (add): the INCREMENTAL leg of the persisted index — FAISS's
    * `add()` contract applied to the store asset: NEW vectors are
    * assigned to the PINNED centroids (frozen — adding never retrains;
    * re-training is a re-build into a fresh store, the nightly cadence)
    * and appended as ONE cell-clustered epoch, so the B65b footer
    * bounds stay tight across base + delta manifests and a cell-scoped
    * serving read keeps planning O(covering files). Returns the epoch's
    * manifest name; probe with base pins plus every add pin.
    *
    * Work is ∝ the delta (one argmax projection + one range shuffle of
    * the delta rows) — the whole point: the 100 TB corpus assignment is
    * never re-paid. Zero-norm vectors are dropped exactly as the build
    * drops them (the knnOn rule), so probing base+adds equals a
    * frozen-centroid assignment of the union corpus — spec-pinned.
    */
  def addToIvfIndex(
      spark: SparkSession,
      newVecs: DataFrame,
      centStore: String,
      centPin: Seq[String],
      asgStore: String
  ): String = {
    graft.functions.VecExprs.register(spark)
    val cents = readIvfCentroids(spark, centStore, centPin)
    graft.sources.ParquetEpochs.append(
      withCell(newVecs.filter(col("nrm") > 0), cents)
        .repartitionByRange(cents.length, col("cell"), col("vec_id"))
        .sortWithinPartitions("cell", "vec_id"),
      asgStore)
  }

  private val ivfIndexDirs =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Seq[String], String, Seq[String])]()

  /** Gate entry for C7e — the index is built once per (corpus, JVM)
    * and pinned at write time (the [[Dedup.incrementalDedupPersisted]]
    * cost model); repeat runs pay only the probe.
    */
  def knnIvfPersisted(t: Tables): DataFrame = {
    val (cs, cp, as_, ap) = ivfIndexDirs.computeIfAbsent(
      t.dir,
      _ => {
        val centDir = graft.operators.Ingest.scratchDir("graft-ivfcent")
        val asgDir  = graft.operators.Ingest.scratchDir("graft-ivfasg")
        val (mc, ma) = buildIvfIndex(t, centDir, asgDir)
        (centDir, Seq(mc), asgDir, Seq(ma))
      }
    )
    knnIvfPersisted(t.spark, cs, cp, as_, ap)
  }

  /** C7g (serve): the SINGLE-QUERY read path over the persisted index
    * — the other half of the FAISS deployment (build/add nightly,
    * serve per request): the query VECTOR arrives externally, its
    * nprobe best cells are picked driver-side against the collected
    * centroid table (cells×dims — metadata-sized, same class as the
    * training collect), and candidates come from ONE
    * [[graft.sources.ParquetEpochs.readRange]] per probed cell — with
    * the cell-clustered layout (build, add, and clusterBy compaction
    * all maintain it) each opens O(covering files), so a request
    * against a 100 TB index reads O(nprobe) files, not the store. The
    * per-cell residual filter keeps covering-file overspill out;
    * `excludeId` drops the query's own row when the query vector came
    * from the corpus (the knnIvfPersisted self-exclusion rule, so
    * serve == probe restricted to that query — spec-pinned).
    */
  def knnIvfServe(
      spark: SparkSession,
      centStore: String,
      centPin: Seq[String],
      asgStore: String,
      asgPin: Seq[String],
      query: Array[Float],
      k: Int = 5,
      nprobe: Int = IvfProbes,
      excludeId: Option[Long] = None
  ): DataFrame = {
    graft.functions.VecExprs.register(spark)
    val cents = readIvfCentroids(spark, centStore, centPin)
    val qd    = query.map(_.toDouble)
    val qn    = math.sqrt(qd.map(x => x * x).sum)
    val probedCells = cents.zipWithIndex
      .map { case (c, i) => (i, c.zip(qd).map { case (a, b) => a * b }.sum) }
      .sortBy { case (i, d) => (-d, i) }
      .take(nprobe)
      .map(_._1)
    val qLit = array(query.toIndexedSeq.map(v => lit(v)): _*)
    val cand = probedCells
      .map(c =>
        graft.sources.ParquetEpochs
          .readRange(spark, asgStore, asgPin, "cell", c.toLong, c.toLong))
      .reduce(_.unionAll(_))
    val scored = excludeId.fold(cand)(id => cand.filter(col("vec_id") =!= id))
      .select(
        col("vec_id").as("neighbor_id"),
        (call_function("vec_dot", qLit, col("v")) / (col("nrm") * lit(qn))).as("cos"))
      .orderBy(col("cos").desc, col("neighbor_id"))
      .limit(k)
    scored
      .withColumn(
        "rank",
        row_number().over(Window.orderBy(col("cos").desc, col("neighbor_id"))).cast("long"))
      .select("neighbor_id", "rank")
  }

  private val ivfIncrDirs =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Seq[String], String, Seq[String])]()

  /** Gate entry for C7f — the deployment loop end to end: the index is
    * TRAINED AND BUILT on the base corpus slice (vec_id % 10 ≠ 0) once
    * per (corpus, JVM), the delta slice is ADDED against the frozen
    * centroids as its own epoch, and the probe searches the pinned
    * union (base + add manifests). Queries land on both slices, so the
    * verdicts exercise cross-epoch candidate sets; rows-only by design
    * (IVF ANN, like C7b/C7e) with the frozen-centroid equality spec as
    * the exactness bracket.
    */
  def knnIvfIncremental(t: Tables): DataFrame = {
    val (cs, cp, as_, ap) = incrementalIndex(t)
    knnIvfPersisted(t.spark, cs, cp, as_, ap)
  }

  private def incrementalIndex(t: Tables): (String, Seq[String], String, Seq[String]) =
    ivfIncrDirs.computeIfAbsent(
      t.dir,
      _ => {
        val centDir = graft.operators.Ingest.scratchDir("graft-ivficent")
        val asgDir  = graft.operators.Ingest.scratchDir("graft-ivfiasg")
        val vecs    = vectors(t)
        val (mc, ma) = buildIvfIndexFrom(
          t.spark, vecs.filter(col("vec_id") % 10 =!= 0), centDir, asgDir)
        val madd = addToIvfIndex(
          t.spark, vecs.filter(col("vec_id") % 10 === 0), centDir, Seq(mc), asgDir)
        (centDir, Seq(mc), asgDir, Seq(ma, madd))
      }
    )

  /** Gate entry for C7g — one request against the shared incremental
    * index (base build + frozen-centroid add): the query vector is
    * vec 0's embedding handed over DRIVER-side (a serving request
    * arrives externally — one bounded row read, never a corpus scan),
    * self-excluded so the verdicts equal the C7e/C7f probe restricted
    * to query 0 (spec-pinned).
    */
  def knnIvfServe(t: Tables): DataFrame = {
    val (cs, cp, as_, ap) = incrementalIndex(t)
    val q = t.embeddings
      .filter(col("vec_id") === 0L)
      .head()
      .getSeq[Float](1)
      .toArray
    knnIvfServe(t.spark, cs, cp, as_, ap, q, excludeId = Some(0L))
  }

  /** PQ geometry: m subspaces of dims/m dimensions, ksub codewords
    * each — 4 bits/subvector, 64 bits/vector at m=16, ksub=16 (32×
    * smaller than the 256-byte raw float vector). Synthetic
    * near-random unit vectors are PQ's worst case (no manifold to
    * exploit; measured: m=8 recall 0.10, m=16 0.30 even probing every
    * cell), which is why the operator re-ranks an ADC shortlist with
    * exact cosine — the standard two-stage refine. */
  val PqSubspaces = 16
  val PqCodewords = 16

  /** ADC shortlist size per query for the exact re-rank stage. */
  val PqShortlist = 32

  /** C7c: IVF-PQ ANN — the memory-bounded architecture every
    * billion-vector index runs (FAISS IVFPQ): cells prune the search
    * to nprobe shards, and candidates are ranked by ASYMMETRIC
    * distance against 4-bit product-quantized codes instead of raw
    * vectors — at query time the index reads CODES (32 bits/vector
    * here vs 2048 for the raw floats), which is what lets the index
    * live in memory at 100 TB corpus scale.
    *
    * Training is driver-side per-subspace k-means on the SAME bounded
    * sample the IVF centroids use (collect is sample×dims, the same
    * bounded class as the centroid collects); encoding is one
    * codegen'd projection (m flat argmin chains over codeword
    * literals); each query precomputes its (m × ksub) dot-product LUT
    * driver-side — numQueries×dims collect, broadcast back — and
    * candidate scoring is m `element_at` lookups + a literal-map
    * reconstruction norm. No raw corpus vector is touched after
    * encode. rows-only oracle + recall spec vs the exact C6 baseline.
    */
  def knnIvfPq(
      t: Tables,
      numQueries: Int = 10,
      k: Int = 5,
      cells: Int = IvfCells,
      nprobe: Int = IvfProbes,
      m: Int = PqSubspaces,
      ksub: Int = PqCodewords
  ): DataFrame = {
    val vecs  = vectors(t).filter(col("nrm") > 0) // the knnOn zero-norm rule
    val train = trainSample(vecs)
    val cents = trainCentroids(train, cells)
    // --- codebook training on sample RESIDUALS (v − cell centroid):
    // residuals are what PQ must represent well — quantizing raw
    // vectors wastes the codebook re-encoding the coarse structure the
    // cells already capture (the FAISS IVFPQ design). Driver-side on
    // the SAME bounded sample as the centroids (sample×dims, the
    // bounded-collect class the IVF training already uses).
    val sample: Array[Array[Double]] = train
      .select(col("v"))
      .collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val dims = sample.head.length
    val dsub = dims / m
    def sliceOf(v: Array[Double], s: Int): Array[Double] = v.slice(s * dsub, (s + 1) * dsub)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var x = 0.0; var i = 0
      while (i < a.length) { x += a(i) * b(i); i += 1 }
      x
    }
    def l2sq(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val residuals: Array[Array[Double]] = sample.map { v =>
      val cell = cents.indices.maxBy(i => dot(v, cents(i)))
      v.indices.map(i => v(i) - cents(cell)(i)).toArray
    }
    // codebooks(s)(j) = j-th residual codeword of subspace s
    val codebooks: Array[Array[Array[Double]]] = Array.tabulate(m) { s =>
      var cw = residuals.take(ksub).map(sliceOf(_, s))
      (1 to LloydRounds).foreach { _ =>
        val sums   = Array.fill(ksub, dsub)(0.0)
        val counts = Array.fill(ksub)(0)
        residuals.foreach { v =>
          val x    = sliceOf(v, s)
          val best = cw.indices.minBy(j => l2sq(x, cw(j)))
          counts(best) += 1
          var i = 0; while (i < dsub) { sums(best)(i) += x(i); i += 1 }
        }
        cw = cw.indices.toArray.map { j =>
          if (counts(j) == 0) cw(j)
          else sums(j).map(x => math.rint(x / counts(j) * 1e6) / 1e6)
        }
      }
      cw
    }
    // --- encode: residual per row (one interpreted zip_with per
    // VECTOR, not per pair — at 100 TB this pass would move into a
    // codegen kernel beside vec_dot), then per subspace a flat argmin
    // chain over codeword literals (L2 argmin == argmax of
    // dot − ||cw||²/2)
    val withResid = withCell(vecs, cents)
      .withColumn(
        "resid",
        zip_with(col("v"), element_at(matLit(cents), col("cell") + 1), (a, b) => a - b))
    // the WHOLE encode is one compiled kernel call (r21): per
    // subspace, dot the residual slice against every codeword (minus
    // ‖cw‖²/2) and keep the first argmax — bit-identical to the former
    // per-subspace score arrays + array_position(array_max) chains,
    // whose m stacked projections (and their thousands of literal
    // nodes) made plan analysis + codegen the key's dominant driver
    // cost. Codes replace the vector — the PQ memory story.
    val cbLit = typedLit(
      codebooks.toIndexedSeq.map(_.toIndexedSeq.map(_.toIndexedSeq)))
    val offLit = typedLit(
      codebooks.toIndexedSeq.map(_.toIndexedSeq.map(cw => cw.map(x => x * x).sum / 2)))
    val encoded = withResid.select(
      col("vec_id"),
      col("cell"),
      call_function("pq_codes", col("resid"), cbLit, offLit).as("codes")
    )
    // --- per-query tables, driver-built (numQueries×dims collect —
    // bounded): qcent[c] = q·centroid_c, lut[s*ksub+j] = q_s·cw(s)(j),
    // so ip(q, cent + recon) = qcent[cell] + Σ_s lut[s*ksub+code_s].
    // Unit-norm embeddings ⇒ inner-product ranking IS cosine ranking
    // (dividing by the noisy reconstruction norm would only distort it).
    val spark = t.spark
    import spark.implicits._
    val queryLuts = vecs
      .filter(col("vec_id") < numQueries)
      .select(col("vec_id"), col("v"))
      .collect()
      .map { r =>
        val q     = r.getSeq[Float](1).map(_.toDouble).toArray
        val qcent = cents.map(c => dot(q, c))
        val lut = (0 until m).flatMap { s =>
          val qs = sliceOf(q, s)
          (0 until ksub).map(j => dot(qs, codebooks(s)(j)))
        }.toArray
        (r.getLong(0), qcent, lut)
      }
      .toSeq
      .toDF("query_id", "qcent", "lut")
    val probes = queryProbes(vecs, cents, numQueries, nprobe)
      .select(col("vec_id").as("query_id"), col("cell"))
      .join(broadcast(queryLuts), "query_id")
    // pq_adc == the ascending element_at reduce it replaces, one call
    val adc = element_at(col("qcent"), col("cell") + 1) +
      call_function("pq_adc", col("lut"), col("codes"))
    // stage 1 — ADC shortlist: rank candidates on CODES only (no raw
    // vector read), keep the top PqShortlist per query
    val wAdc = Window.partitionBy("query_id").orderBy(col("score").desc, col("neighbor_id"))
    val shortlist = broadcast(probes)
      .join(encoded, Seq("cell"))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("score", adc)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("score"))
      .distinct()
      .withColumn("srank", row_number().over(wAdc))
      .filter(col("srank") <= PqShortlist)
      .select("query_id", "neighbor_id")
    // stage 2 — exact refine: fetch raw vectors for the shortlist ONLY
    // (queries × PqShortlist rows — the two-stage FAISS refine; the
    // full corpus is still touched only as codes) and re-rank by true
    // cosine
    val queries = vecs
      .filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qnrm"))
    val wExact = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    broadcast(shortlist)
      .join(vecs.withColumnRenamed("vec_id", "neighbor_id"), Seq("neighbor_id"))
      .join(broadcast(queries), Seq("query_id"))
      .withColumn("cos", call_function("vec_dot", col("qv"), col("v")) / (col("qnrm") * col("nrm")))
      .withColumn("rank", row_number().over(wExact).cast("long"))
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

  /** C51: SEMANTIC dedup (the SemDeDup architecture, Abbas et al.
    * 2023) — cluster the embedding space, then prune near-duplicates
    * WITHIN each cluster only: every vector is assigned its max-dot
    * k-means cell (the C7b IVF machinery: bounded driver-side training
    * sample, spherical Lloyd rounds, codegen'd argmax literals), and a
    * vector is dropped when a LOWER-id vector in the SAME cell sits
    * within cosine τ (the min-id keeper convention the exact-dedup
    * family uses). This is the embedding-dedup path that actually runs
    * at 100 TB: the pairwise work is Σ cell² instead of n² — the
    * cluster assignment is what makes a trillion-vector prune
    * tractable, at the price of missing cross-cell pairs (the recall
    * trade the paper measures; SimilaritySpec pins it against the
    * exact C5 pairs).
    *
    * Output: every corpus vector with its cell and keep/drop verdict.
    * rows-only in the gate (k-means centroids aren't SQL-expressible);
    * the spec replays the within-cell prune exactly from the
    * operator's own cell assignment.
    */
  def semanticDedup(t: Tables, tau: Double = 0.4, cells: Int = IvfCells): DataFrame = {
    // checkpointed: the pair join consumes the assignment twice (both
    // sides) and the verdict join a third time — one materialization,
    // the dupShingleFrac rule
    val cellv = cellAssignments(t, cells).localCheckpoint()
    // nrm > 0 on both sides: a zero vector has no direction — its
    // cosine is 0/0 = NaN, which Spark's NaN-is-largest comparison
    // would silently treat as >= tau. Zero vectors are always KEPT
    // (they still get a verdict row through the left join below).
    val dropped = cellv
      .as("a")
      .join(
        cellv.as("b").hint("shuffle_hash"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id") &&
          col("a.nrm") > 0 && col("b.nrm") > 0
      )
      .filter(cosine >= tau)
      .select(col("b.vec_id").as("vec_id"))
      .distinct()
    cellv
      .select(col("vec_id"), col("cell").cast("long").as("cell"))
      .join(dropped.withColumn("dropped", lit(true)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"), coalesce(col("dropped"), lit(false)).as("dropped"))
      .orderBy("vec_id")
  }

  /** C57: SemDeDup cross-cell MISS audit — the number a user needs
    * before choosing `cells`: [[semanticDedup]] only prunes pairs that
    * land in the SAME k-means cell, so every exact-τ pair split across
    * two cells is a duplicate the cluster prune silently keeps (the
    * recall trade Abbas et al. measure). Per cell: vector count, exact
    * pairs contained within it, and exact pairs crossing out of it
    * (a crossing pair counts once at each endpoint cell — Σ within +
    * Σ crossing / 2 = the full exact pair set, spec-asserted). A high
    * crossing share says "use fewer cells or add a neighbor-cell
    * probe"; near-zero says the cell count is safe.
    *
    * Ground truth comes from the existing exact C5 arm — one
    * corpus-scale pair join at AUDIT SF (the audit runs on a sample /
    * test slice to size `cells`; at 100 TB the exact arm is replaced
    * by the C5 LSH candidates, understating misses only by LSH's own
    * miss rate). Two keyed joins tag the pair ends with cells; all
    * counts integer. rows-only in the gate (cell ids come from the
    * k-means training — not SQL-expressible, C51's rule); the spec
    * replays the classification exactly from semanticDedup's own cell
    * output.
    */
  def semanticMissAudit(t: Tables, tau: Double = 0.4, cells: Int = IvfCells): DataFrame = {
    // checkpointed: feeds both pair-end joins and the per-cell census
    val cellv = cellAssignments(t, cells)
      .select(col("vec_id"), col("cell").cast("long").as("cell"))
      .localCheckpoint()
    val tagged = graft.operators.Dedup
      .embeddingCosine(t, tau)
      .join(cellv.select(col("vec_id").as("id_a"), col("cell").as("cell_a")), Seq("id_a"))
      .join(cellv.select(col("vec_id").as("id_b"), col("cell").as("cell_b")), Seq("id_b"))
      .localCheckpoint()
    val within = tagged
      .filter(col("cell_a") === col("cell_b"))
      .groupBy(col("cell_a").as("cell"))
      .agg(count(lit(1)).as("pairs_within"))
    val crossing = tagged
      .filter(col("cell_a") =!= col("cell_b"))
      .select(explode(array(col("cell_a"), col("cell_b"))).as("cell"))
      .groupBy("cell")
      .agg(count(lit(1)).as("pairs_crossing"))
    cellv
      .groupBy("cell")
      .agg(count(lit(1)).as("n_vectors"))
      .join(within, Seq("cell"), "left")
      .join(crossing, Seq("cell"), "left")
      .select(
        col("cell"),
        col("n_vectors"),
        coalesce(col("pairs_within"), lit(0L)).as("pairs_within"),
        coalesce(col("pairs_crossing"), lit(0L)).as("pairs_crossing")
      )
      .orderBy("cell")
  }

  /** C49: SEMANTIC decontamination — corpus vectors within cosine τ of
    * any held-out eval vector (vec_id % 41 == 0 stands in for the
    * benchmark embedding set), each with its strongest eval match.
    * The embedding-space complement of the n-gram overlap check (C19):
    * paraphrased benchmark leakage shares no 3-gram but sits right on
    * top of the eval point in embedding space, so a release pass runs
    * BOTH before training.
    *
    * Same shape as C6: the eval set is bounded → broadcast against
    * one corpus scan, τ-filter, then best-match via the per-corpus-
    * vector rank (cos desc, eval id asc pins ties) — the corpus never
    * self-joins and never shuffles before the flagged subset. Composes
    * with the IVF/LSH candidate paths when the eval set outgrows a
    * broadcast. Cosine is the C5/C6 vec_dot kernel, so the doubles
    * hash-gate cross-engine.
    */
  def semanticContamination(t: Tables, tau: Double = 0.3, evalMod: Int = 41): DataFrame = {
    val n    = vectors(t)
    val eval = n.filter(col("vec_id") % evalMod === 0)
    val rest = n.filter(col("vec_id") % evalMod =!= 0)
    val w    = Window.partitionBy("vec_id").orderBy(col("cos").desc, col("eval_vec_id"))
    // nrm > 0 both sides: a zero-norm vector's cosine is NaN, and
    // Spark's NaN-is-largest comparison would flag every pairing
    broadcast(eval)
      .as("a")
      .join(rest.as("b"), cosine >= tau && col("a.nrm") > 0 && col("b.nrm") > 0)
      .select(
        col("b.vec_id").as("vec_id"),
        col("a.vec_id").as("eval_vec_id"),
        cosine.as("cos")
      )
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("vec_id", "eval_vec_id", "cos")
      .orderBy("vec_id")
  }

  /** C50: int8 scalar quantization (the FAISS SQ8 storage path) — each
    * vector's components scaled by its own max-abs to codes in
    * [-127, 127]: code_d = round(v_d · 127 / scale). This is the
    * 4×-compression layout a 100 TB embedding table ships to the
    * serving index; the exact integer codes (plus the one float scale
    * per vector) are what make the op hash-gateable where a float
    * re-encode never would be. Zero vectors quantize to all-zero codes.
    *
    * Map-only: one codegen'd array_max projection + one posexplode —
    * no shuffle at any scale until the output sort. The multiply-then-
    * divide order and the double widening are pinned to match the
    * oracle's arithmetic bit for bit (both engines round half away
    * from zero).
    */
  def quantizeInt8(t: Tables): DataFrame =
    t.embeddings
      .select(
        col("vec_id"),
        col("embedding"),
        // abs/max over the raw floats, ONE scalar widening after — no
        // doubled per-row array (the vectors() rule); abs and max
        // commute with the exact float→double widening, so the scale
        // is bit-identical to the oracle's widen-first arithmetic
        expr("CAST(array_max(transform(embedding, x -> abs(x))) AS DOUBLE)").as("scale")
      )
      .select(
        col("vec_id"),
        col("scale"),
        posexplode(col("embedding")).as(Seq("dim", "x"))
      )
      .select(
        col("vec_id"),
        col("dim").cast("long").as("dim"),
        when(col("scale") === 0.0, 0L)
          .otherwise(round(col("x").cast("double") * lit(127.0) / col("scale")).cast("long"))
          .as("code"),
        col("scale")
      )
      .orderBy("vec_id", "dim")
}
