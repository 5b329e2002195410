package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for corpus curation. `df.sample()` is
  * seed-dependent on partitioning (a repartition changes the rows you
  * get), which is useless for a reproducible 100 TB pipeline — so both
  * operators key the sampling decision off a content hash: the sample
  * is a pure function of the ROW, not of the physical plan, and any
  * engine (here: the DuckDB oracle) draws the identical sample.
  */
object Sampling {

  /** Per-row hash bucket in [0, mod): first 8 hex digits of
    * md5(doc_id), mod `mod`. Uniform, deterministic, engine-portable —
    * THE content-stable row hash of the sampling/split/shard family
    * (Layout.shardPlan shares it), defined once so the stability
    * contract ("a doc keeps its bucket forever") cannot drift between
    * operators.
    */
  private[operators] def hashBucket(mod: Int): org.apache.spark.sql.Column =
    conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10).cast("long") % mod

  private def hashBucket: org.apache.spark.sql.Column = hashBucket(100)

  /** Stratified Bernoulli sample with per-source rates: high-value
    * sources (src0-src2) keep 50%, the rest 10%. Map-only — the filter
    * is a codegen'd projection over the scan, no shuffle at all, so at
    * 100 TB this runs at scan speed and composes with pushdown (only
    * doc_id/source/n_chars are read).
    */
  def hashSample(t: Tables): DataFrame = {
    val rate = when(col("source").isin("src0", "src1", "src2"), lit(50)).otherwise(lit(10))
    t.documents
      .select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("bucket", hashBucket)
      .filter(col("bucket") < rate)
      .orderBy("doc_id")
  }

  /** Train/val/test split assignment: hash-range 80/10/10. The split
    * is a pure row function (same md5 bucket as [[hashSample]]), so it
    * is STABLE under corpus growth — a doc keeps its split when new
    * data arrives, which is the property that prevents silent
    * train/test contamination across dataset versions. Map-only, scan
    * speed.
    */
  def splitAssign(t: Tables): DataFrame =
    t.documents
      .select(col("doc_id"), col("source"))
      .withColumn("bucket", hashBucket)
      .withColumn(
        "split",
        when(col("bucket") < 80, lit("train"))
          .when(col("bucket") < 90, lit("val"))
          .otherwise(lit("test"))
      )
      .drop("bucket")
      .orderBy("doc_id")

  /** Mixture rebalancing weights: per-source acceptance probabilities
    * that flatten the corpus to a uniform CHARACTER budget per source
    * (target = the smallest source's total chars; weight_s =
    * target / total_chars_s) — bytes/tokens are what a training
    * mixture allocates, not document counts. The standard
    * first step of training-mixture construction — the weights feed
    * [[hashSample]]-style hash thresholds, keeping the whole pipeline
    * deterministic. One partial-agg'd groupBy + a broadcast-size
    * aggregate for the target; weights are double divisions of exact
    * longs (bit-stable cross-engine).
    */
  def mixtureWeights(t: Tables): DataFrame = {
    // size by total characters, not doc count — the byte/token budget
    // is what a training mixture actually allocates
    val counts = t.documents
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars").cast("long")).as("total_chars"))
    val target = counts.agg(min("total_chars").as("target"))
    counts
      .crossJoin(broadcast(target))
      .select(
        col("source"),
        col("n_docs"),
        col("total_chars"),
        col("target"),
        (col("target").cast("double") / col("total_chars")).as("weight"),
        floor(col("target") * 100 / col("total_chars")).as("keep_pct")
      )
      .orderBy("source")
  }

  /** Exact-size stratified sample: the N lowest-hash docs per source
    * (hash order = uniform random order, but reproducible). One shuffle
    * on source; rank via row_number per stratum. At 100 TB with few
    * huge strata the window funnels a stratum through one task — for
    * that shape, swap in the TopKPerKey physical operator (plans/
    * TopKPerKey.scala) which bounds memory at O(k) per stratum; with
    * many strata (the common curation case) this plan is already right.
    */
  def stratifiedSample(t: Tables, perSource: Int = 5): DataFrame = {
    val w = Window.partitionBy("source").orderBy(col("h"), col("doc_id"))
    t.documents
      .select(col("doc_id"), col("source"))
      .withColumn("h", md5(col("doc_id").cast("string")))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= perSource)
      .select(col("doc_id"), col("source"), col("rn"))
      .orderBy("source", "rn")
  }

  /** C18c: training-order shuffle — the deterministic pseudo-random
    * GLOBAL order a training run reads the corpus in. A true global
    * sort by random key is one serial dimension at 100 TB; instead the
    * hash splits the order into `shards` independent streams (shard =
    * hash prefix) with a position within each (rank by the remaining
    * hash): readers interleave shards round-robin and the order is
    * (a) uniformly shuffled, (b) a pure function of doc_id — stable
    * under corpus growth and engine-portable, unlike orderBy(rand()).
    * One shuffle on shard; each shard's window is 1/shards of the
    * data, and `shards` scales with the cluster.
    */
  def trainingOrder(t: Tables, shards: Int = 16): DataFrame = {
    val w = Window.partitionBy("shard").orderBy(col("h"), col("doc_id"))
    t.documents
      .select(col("doc_id"), col("source"))
      .withColumn("h", md5(concat(lit("order-"), col("doc_id").cast("string"))))
      .withColumn("shard", conv(substring(col("h"), 1, 8), 16, 10).cast("long") % shards)
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("source"), col("shard"), col("pos"))
      .orderBy("shard", "pos")
  }

  /** C17d: epoch-repeat mixture — flatten the mixture UP by repeating
    * small sources instead of cutting large ones (the standard move
    * when every token is precious): source s trains for
    * `min(maxEpochs, ⌈chars_biggest / chars_s⌉)` epochs. The factor is
    * exact integer arithmetic (ceil-division on longs — no
    * float-rounding drift cross-engine); the expansion is a broadcast
    * join of the tiny factor table plus a codegen'd `sequence` explode,
    * so it runs at scan speed with zero wide shuffles.
    */
  def mixtureEpochs(t: Tables, maxEpochs: Int = 4): DataFrame = {
    val counts = t.documents
      .groupBy("source")
      .agg(sum(col("n_chars").cast("long")).as("total_chars"))
    val biggest = counts.agg(max("total_chars").as("biggest"))
    val factors = counts
      .crossJoin(broadcast(biggest))
      .select(
        col("source"),
        least(
          lit(maxEpochs.toLong),
          expr("(biggest + total_chars - 1) div total_chars")
        ).as("epochs")
      )
    t.documents
      .select(col("doc_id"), col("source"))
      .join(broadcast(factors), "source")
      .select(
        col("doc_id"),
        col("source"),
        explode(expr("sequence(1L, epochs)")).as("epoch")
      )
      .orderBy("doc_id", "epoch")
  }

  /** Per-source quota capping: keep documents in deterministic hash
    * order until each source's running char budget is spent — the
    * anti-overrepresentation lever ("no source contributes more than X
    * chars") that mixture WEIGHTS can't express when the cap must be a
    * hard byte budget, not a rate. Hash order (not doc_id order) makes
    * the kept set an unbiased sample of the source AND stable under
    * re-partitioning; the budget boundary doc is excluded (strict ≤),
    * so a source whose first-hash doc exceeds the budget contributes
    * nothing — the policy, exactly.
    *
    * Plan: ONE shuffle on source for the running prefix-sum window;
    * the serial dimension is per-source (same bound as pipeline_pack's
    * per-source prefix sum). Integer arithmetic throughout.
    */
  def sourceQuota(t: Tables, budgetChars: Long = 4000L): DataFrame = {
    val w = Window
      .partitionBy("source")
      .orderBy(col("hk"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t.documents
      .select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("hk", md5(col("doc_id").cast("string")))
      .withColumn("cum_chars", sum(col("n_chars")).over(w))
      .filter(col("cum_chars") <= budgetChars)
      .select(col("doc_id"), col("source"), col("n_chars"), col("cum_chars"))
      .orderBy("doc_id")
  }

  /** C39: class balancing — downsample every language class to the
    * SMALLEST class's size, in deterministic hash order. The classic
    * classifier-training fix for label skew (a 218:64 en:fr corpus
    * teaches the model priors, not language), and the equalize-to-min
    * policy that per-class FRACTIONS (stratified sampling, C17) cannot
    * express because the target depends on a global aggregate.
    *
    * The min class size is a two-level aggregate collapsed to ONE
    * broadcast row; per-class ranking is the sourceQuota hash-order
    * pattern (unbiased within class, repartition-stable) over one
    * shuffle on lang. Integer rank/target → exact oracle.
    */
  def classBalance(t: Tables): DataFrame = {
    val target = t.documents
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"))
      .agg(min("n_docs").as("target"))
    val w = Window.partitionBy("lang").orderBy(col("hk"), col("doc_id"))
    t.documents
      .select(col("doc_id"), col("lang"))
      .withColumn("hk", md5(concat(lit("bal:"), col("doc_id").cast("string"))))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .crossJoin(broadcast(target))
      .filter(col("rnk") <= col("target"))
      .select("doc_id", "lang", "rnk", "target")
      .orderBy("doc_id")
  }

  /** C44: size-weighted Bernoulli sampling — each doc kept with
    * probability ∝ its n_chars (expected `targetDocs` draws), the
    * importance-sampling knob (keep long docs preferentially without
    * a hard gate) that uniform hash sampling (C17) and hard quotas
    * (C28) can't express.
    *
    * The draw must stay a pure row function (repartition-stable,
    * engine-portable), so the acceptance test is INTEGER: a 60-bit
    * md5 slice `h` accepts iff h · Σchars < target · n_chars · 2⁶⁰,
    * cross-multiplied in Decimal(38,0) (≤10²⁷ here — no float, no
    * division, bit-exact in any engine; the float form `h/2⁶⁰ < p`
    * would put boundary docs on different sides per engine). Map-only
    * over the scan plus one broadcast single-row total; scan speed at
    * any corpus size. Docs with p ≥ 1 (n_chars ≥ Σ/target) are always
    * kept — the compare form needs no min().
    */
  def weightedSample(t: Tables, targetDocs: Int = 100): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec   = DecimalType(38, 0)
    val h60   = conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10).cast(dec)
    val pow60 = lit(1152921504606846976L).cast(dec) // 2^60
    val total = t.documents.agg(sum(col("n_chars")).as("total_chars"))
    t.documents
      .select(col("doc_id"), col("source"), col("n_chars"))
      .crossJoin(broadcast(total))
      .filter(
        h60 * col("total_chars").cast(dec) <
          lit(targetDocs).cast(dec) * col("n_chars").cast(dec) * pow60)
      .select("doc_id", "source", "n_chars")
      .orderBy("doc_id")
  }
}
