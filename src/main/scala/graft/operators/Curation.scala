package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end training-data curation: the composition a 100 TB corpus
  * actually runs, as ONE declarative plan —
  *
  *   quality gate (token count) →
  *   language gate (en) →
  *   exact dedup (keep the min doc of each normalized-text group) →
  *   near-dup resolution (keep only each similarity component's min).
  *
  * Every stage shares its DEFINITION with the standalone operator —
  * per-row signals as column expressions fused into one corpus scan,
  * group signals (exact-dedup keeper, bigram totals, components) as
  * one window plus doc_id-keyed joins — so the whole pipeline stays a
  * single Catalyst plan with exactly one scan per distinct corpus
  * pass. The only materializations are the two the operators
  * themselves demand — the near-dup pair list (feeds an iterative
  * fixpoint) and, in [[curateFull]], the shingle index that both
  * dedup branches share.
  */
object Curation {

  val MinTokens = 30

  /** `checkpointDir`: threaded to the iterative near-dup component
    * resolution (same contract as [[Dedup.nearDupComponents]] — `None`
    * is executor-local `localCheckpoint`, a reliable location makes
    * every round a replayable `checkpoint()`).
    */
  def curate(t: Tables, checkpointDir: Option[String] = None): DataFrame =
    curateFrom(t, Dedup.nearDupComponents(t, checkpointDir = checkpointDir))

  /** The quality/language/exact-dedup gates joined against a
    * caller-provided component labeling — shared by [[curate]] and
    * [[curateFull]] so the full pipeline can feed BOTH dedup branches
    * from one materialized shingle index.
    *
    * The per-row signals (token count, lang-ID features, exact-dedup
    * group key) are COLUMNS of one corpus scan, not joins against the
    * standalone operators' outputs: each operator exposes its defining
    * expression (TextOps.nTokensCol / hitsCol / langPredFromHits,
    * Dedup.normTextHashCol), so the gate computes all three signals in
    * a single pass. The only wide operations left are the exact-dedup
    * keeper window (one shuffle on text_hash) and the component join
    * (doc_id) — at 100 TB that's 1 corpus scan instead of the 4 the
    * equivalent join-composition pays.
    */
  private def curateFrom(t: Tables, components: DataFrame): DataFrame =
    curateFromCols(t, components).select(col("doc_id"), col("n_tokens"), col("lang_pred"))
      .orderBy("doc_id")

  /** The gate pipeline of [[curateFrom]] WITHOUT the final projection —
    * survivors with every fused per-row signal still attached, so
    * [[curateFull]] can consume the bigram totals without a second
    * corpus scan. Since r21 the repetition gate's bigram stats ride
    * the SAME fused scan as the other per-row signals (the compiled
    * `bigram_stats` kernel is per-row, so the former aggregate join on
    * doc_id — one more corpus scan plus a corpus-sized shuffle at
    * scale — is gone; values are unchanged).
    */
  private def curateFromCols(t: Tables, components: DataFrame): DataFrame = {
    graft.functions.ShingleExprs.register(t.spark)
    val comps  = components.withColumnRenamed("component", "near_dup_comp")
    val byHash = org.apache.spark.sql.expressions.Window.partitionBy("text_hash")
    t.documents
      .select(
        col("doc_id"),
        TextOps.nTokensCol.as("n_tokens"),
        TextOps.wsdLowerCol.as("wsd"),
        Dedup.normTextHashCol.as("text_hash"),
        expr("bigram_stats(split(text, ' '))").as("bs")
      )
      .select(
        col("doc_id"),
        col("n_tokens"),
        col("text_hash"),
        TextOps.hitsCol(TextOps.EnMarkers).as("en_hits"),
        TextOps.hitsCol(TextOps.EsMarkers).as("es_hits"),
        TextOps.hitsCol(TextOps.DeMarkers).as("de_hits"),
        col("bs.n_bigrams").as("n_bigrams"),
        col("bs.top_bigram_count").as("top_bigram_count")
      )
      .withColumn("lang_pred", TextOps.langPredFromHits)
      .withColumn("keep_doc_id", min("doc_id").over(byHash))
      .join(comps, Seq("doc_id"), "left")
      .filter(
        col("n_tokens") >= MinTokens &&
          col("lang_pred") === "en" &&
          col("doc_id") === col("keep_doc_id") &&
          (col("near_dup_comp").isNull || col("near_dup_comp") === col("doc_id"))
      )
  }

  /** Repetition gate for [[curateFull]]: docs whose single most
    * frequent bigram covers more than this fraction are template/spam
    * (p90 of the corpus sits near 0.07).
    */
  val MaxTopBigramFrac = 0.08

  /** The full curation a frontier-scale corpus actually runs — extends
    * [[curate]]'s quality/language/exact/near-dup gates with the two
    * round-3 operators:
    *
    *   - repetition gate: drop template/boilerplate docs by
    *     top-bigram fraction (TextOps.repetition);
    *   - decontamination: LEFT ANTI join against the benchmark-overlap
    *     set (Dedup.contamination) — eval-set n-grams never reach
    *     training data.
    *
    * Still ONE composed Catalyst plan: every stage is a DataFrame
    * function over the same doc_id key, so the joins co-partition and
    * the anti-join's right side is the (small) contaminated-doc list.
    * Fully SQL-expressible ⇒ the whole composition sits under the
    * DuckDB hash gate, like curate before it.
    *
    * Shared scan: the shingle index ([[Dedup.hashedPostings]] — corpus
    * scan + posexplode + two windows, the dominant cost of the whole
    * pipeline) is materialized exactly ONCE and feeds both the
    * near-dup pair pipeline and the decontamination branch; without
    * it each branch rebuilds the index from raw text (2-3 full
    * shingle explodes per run — at 100 TB, the flagship's dominant
    * redundant cost). `checkpointDir` follows the
    * [[Dedup.nearDupComponents]] contract: `None` materializes with
    * `localCheckpoint` (executor-local, single-node/testing), a
    * reliable location (HDFS/S3) makes the index and every component
    * round a replayable `checkpoint()`.
    *
    * Storage lifecycle: the materialized index is referenced by the
    * RETURNED (lazy) plan — the decontamination branch reads it at
    * execution time — so this operator cannot unpersist it. Superseded
    * component rounds ARE freed eagerly inside nearDupComponents; the
    * index and final round live until the caller unpersists
    * (`spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist())`,
    * as Bench does between queries) or the context cleaner collects
    * them — with a reliable `checkpointDir`, set
    * `spark.cleaner.referenceTracking.cleanCheckpoints=true` so the
    * checkpoint files follow.
    */
  def curateFull(t: Tables, checkpointDir: Option[String] = None): DataFrame = {
    checkpointDir.foreach(t.spark.sparkContext.setCheckpointDir)
    val postings0 = Dedup.hashedPostings(t)
    val postings =
      if (checkpointDir.isDefined) postings0.checkpoint() else postings0.localCheckpoint()
    val comps = Dedup.nearDupComponents(
      t,
      checkpointDir = checkpointDir,
      postings = Some(postings)
    )
    // the bigram totals are fused COLUMNS of the curation scan
    // (curateFromCols) — no aggregate join, no extra corpus scan
    val contam = Dedup.contaminationFrom(postings).select(col("doc_id"))
    curateFromCols(t, comps)
      .withColumn("top_bigram_frac", TextOps.topBigramFracCol)
      .filter(col("top_bigram_frac") < MaxTopBigramFrac)
      .join(contam, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("n_tokens"), col("lang_pred"), col("top_bigram_frac"))
      .orderBy("doc_id")
  }

  /** Split-leakage audit: near-duplicate pairs that STRADDLE a
    * train/val/test boundary — the check every dataset release runs
    * before shipping, because a test document whose near-dup sits in
    * train silently inflates every benchmark number. Composes the C2
    * near-dup pair pipeline with the hash-range split assignment
    * (both reused verbatim), so the audit inherits their scale
    * shapes: the pair pipeline is the bucketed inverted-index join,
    * and the split lookup is two joins on doc_id against a map-only
    * projection. Emitted rows are the offending pairs with both
    * splits — empty output is the release criterion.
    */
  def splitLeakage(t: Tables): DataFrame = {
    val splits = Sampling.splitAssign(t).select(col("doc_id"), col("split"))
    Dedup
      .ngramJaccard(t)
      .join(splits.select(col("doc_id").as("doc_a"), col("split").as("split_a")), "doc_a")
      .join(splits.select(col("doc_id").as("doc_b"), col("split").as("split_b")), "doc_b")
      .filter(col("split_a") =!= col("split_b"))
      .select(col("doc_a"), col("doc_b"), col("jaccard"), col("split_a"), col("split_b"))
      .orderBy("doc_a", "doc_b")
  }

  /** Corpus snapshot diff — the changelog between two corpus versions
    * (added / removed / changed documents), the operator behind
    * dataset versioning: every release pipeline diffs against the
    * previous snapshot to bound re-processing and to audit what moved.
    * One full-outer shuffle join on doc_id comparing content hashes;
    * at scale both snapshots live in the same bucketed layout
    * (q_bucketed_join's story), making the diff exchange-free.
    * Unchanged docs (the overwhelming mass) are filtered pre-sort, so
    * output ∝ churn, not corpus size.
    */
  def snapshotDiffOn(v1: DataFrame, v2: DataFrame): DataFrame =
    v1.select(col("doc_id"), md5(col("text")).as("old_hash"))
      .join(
        v2.select(col("doc_id"), md5(col("text")).as("new_hash")),
        Seq("doc_id"),
        "full_outer"
      )
      .withColumn(
        "change",
        when(col("old_hash").isNull, "added")
          .when(col("new_hash").isNull, "removed")
          .when(col("old_hash") =!= col("new_hash"), "changed")
      )
      .filter(col("change").isNotNull)
      .select(col("doc_id"), col("change"), col("old_hash"), col("new_hash"))
      .orderBy("doc_id")

  /** [[snapshotDiffOn]] over two deterministic simulated versions of
    * the corpus (the driver tables carry one snapshot): V1 lacks the
    * doc_id % 17 == 2 docs (added since), V2 lacks doc_id % 13 == 5
    * (removed since), and doc_id % 11 == 3 docs were edited (V1 holds
    * a truncated text).
    */
  def snapshotDiff(t: Tables): DataFrame = {
    val (v1, v2) = simulatedVersions(t)
    snapshotDiffOn(v1, v2)
  }

  /** The two deterministic simulated corpus versions shared by
    * [[snapshotDiff]] (row-level changelog) and [[versionDrift]]
    * (distribution-level audit): V1 lacks the %17==2 docs, V2 lacks
    * %13==5, and %11==3 docs are edited (V1 holds a truncated text).
    */
  private def simulatedVersions(t: Tables): (DataFrame, DataFrame) = {
    val (v1, v2) = simulatedVersionDocs(t)
    (v1.select(col("doc_id"), col("text")), v2.select(col("doc_id"), col("text")))
  }

  /** The same two simulated versions as FULL documents frames (every
    * column, V1's edited text substituted in place) — what
    * [[releaseDelta]] feeds the whole release chain through Tables'
    * docsOverride. One definition of the version rules; the
    * (doc_id, text) projection above derives from it.
    */
  private def simulatedVersionDocs(t: Tables): (DataFrame, DataFrame) = {
    val v1 = t.documents
      .filter(col("doc_id") % 17 =!= 2)
      .withColumn(
        "text",
        when(
          col("doc_id") % 11 === 3,
          expr("substr(text, 1, greatest(length(text) - 10, 1))")
        ).otherwise(col("text"))
      )
    val v2 = t.documents.filter(col("doc_id") % 13 =!= 5)
    (v1, v2)
  }

  /** C48: corpus-version distribution drift — the DISTRIBUTION-level
    * release audit the row-level changelog (C25) can't give: per
    * length-bucket counts for both versions, running cumulative counts,
    * and the Kolmogorov-Smirnov statistic in exact integer parts-per-
    * million: ⌊10⁶·|cum_v1·N2 − cum_v2·N1| / (N1·N2)⌋. The cross-
    * multiplication runs in Decimal(38,0) (a Long product wraps past
    * ~3·10⁹ docs; 38 digits never do at any corpus size) and the
    * floor-division is exact integer arithmetic — num − (num mod den)
    * over den, never a rounded decimal quotient — so the bounded
    * [0, 10⁶] result hash-gates. A silent shift in the document-length
    * profile between releases — the classic symptom of a broken
    * extractor or an over-aggressive new filter — shows up here as a
    * drift spike even when the changed-row count looks routine.
    *
    * Shape: two corpus scans → per-version tiny histogram (partial-
    * agg'd groupBy, output = bucket domain), full-outer merge of the
    * two histograms, then running-sum/total windows over the
    * bucket-count rows only — the corpus is never sorted or shuffled
    * beyond the two histogram aggregations at any scale.
    */
  def versionDrift(t: Tables, bucketChars: Int = 100): DataFrame = {
    val (v1, v2) = simulatedVersions(t)
    def hist(v: DataFrame, n: String): DataFrame =
      v.groupBy(floor(length(col("text")) / bucketChars).cast("long").as("bucket"))
        .agg(count(lit(1)).as(n))
    val merged = hist(v1, "n_v1")
      .join(hist(v2, "n_v2"), Seq("bucket"), "full_outer")
      .select(
        col("bucket"),
        coalesce(col("n_v1"), lit(0L)).as("n_v1"),
        coalesce(col("n_v2"), lit(0L)).as("n_v2")
      )
    val cum = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy()
    merged
      .withColumn("cum_v1", sum("n_v1").over(cum))
      .withColumn("cum_v2", sum("n_v2").over(cum))
      .withColumn("tot1", sum("n_v1").over(all))
      .withColumn("tot2", sum("n_v2").over(all))
      .select(
        col("bucket"),
        col("n_v1"),
        col("n_v2"),
        col("cum_v1"),
        col("cum_v2"),
        driftPpm.as("drift_ppm")
      )
      .orderBy("bucket")
  }

  /** ⌊10⁶·|cum_v1·tot2 − cum_v2·tot1| / (tot1·tot2)⌋ over the four
    * named columns, in exact Decimal(38,0) arithmetic. The floor
    * division is (num − num mod den)/den — the quotient is a true
    * integer, so the decimal division cannot round; a direct num/den
    * would round at the result scale. Shared by [[versionDrift]] and
    * [[driftTrajectory]].
    */
  private def driftPpm: org.apache.spark.sql.Column = {
    val dec = "decimal(38,0)"
    val num = abs(
      col("cum_v1").cast(dec) * col("tot2").cast(dec) -
        col("cum_v2").cast(dec) * col("tot1").cast(dec)
    ) * lit(1000000L).cast(dec)
    val den = col("tot1").cast(dec) * col("tot2").cast(dec)
    ((num - pmod(num, den)) / den).cast("long")
  }

  /** Per-micro-batch half of the STREAMING drift monitor (C53): the
    * arriving batch's V2 slice reduced to a partial length-histogram
    * stamped with its arrival epoch. Map-side partial agg per batch —
    * state never accumulates in the stream; the trajectory assembly
    * happens on the drained partials ([[driftTrajectory]]).
    */
  def driftPartial(batch: DataFrame, epoch: Long, bucketChars: Int = 100): DataFrame =
    batch
      .filter(col("doc_id") % 13 =!= 5)
      .groupBy(floor(length(col("text")) / bucketChars).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"))
      .withColumn("epoch", lit(epoch))

  /** Assembly half of C53: from the drained per-epoch partial
    * histograms, the drift TRAJECTORY — for every (epoch, bucket),
    * the cumulative V2 histogram of everything arrived so far against
    * the static V1 baseline, with the same integer-ppm KS statistic
    * as [[versionDrift]]. The KS ratio is scale-normalized, so a
    * half-arrived crawl compares fairly against the full baseline —
    * the monitor answers "is this crawl drifting?" per epoch, not
    * just at the end. All frames past the drained partials are
    * histogram-sized: the grid is epochs × buckets, the windows run
    * on the tiny epoch partitions.
    */
  def driftTrajectory(t: Tables, partials: DataFrame, bucketChars: Int = 100): DataFrame = {
    val (v1, _) = simulatedVersions(t)
    val h1 = v1
      .groupBy(floor(length(col("text")) / bucketChars).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_v1"))
    val buckets = h1
      .join(partials.select("bucket").distinct(), Seq("bucket"), "full_outer")
      .select(col("bucket"), coalesce(col("n_v1"), lit(0L)).as("n_v1"))
    val grid = partials.select("epoch").distinct().crossJoin(buckets)
    // equality join onto the grid, then one cumulative window over the
    // epoch axis — linear in epochs × buckets (a p.epoch <= g.epoch
    // theta join would re-sum every earlier epoch per cell)
    val wEp = Window
      .partitionBy("bucket")
      .orderBy("epoch")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cumParts = grid
      .join(partials, Seq("epoch", "bucket"), "left")
      .withColumn("n_v2_cum", sum(coalesce(col("n"), lit(0L))).over(wEp))
      .select("epoch", "bucket", "n_v1", "n_v2_cum")
    val wB = Window
      .partitionBy("epoch")
      .orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wE = Window.partitionBy("epoch")
    cumParts
      .withColumn("cum_v1", sum("n_v1").over(wB))
      .withColumn("cum_v2", sum("n_v2_cum").over(wB))
      .withColumn("tot1", sum("n_v1").over(wE))
      .withColumn("tot2", sum("n_v2_cum").over(wE))
      .select(
        col("epoch"),
        col("bucket"),
        col("n_v1"),
        col("n_v2_cum"),
        col("cum_v1"),
        col("cum_v2"),
        driftPpm.as("drift_ppm")
      )
      .orderBy("epoch", "bucket")
  }

  /** Context-window chunking: slice each document's token stream into
    * overlapping windows (`size` tokens every `stride` — the
    * train-time chunking that keeps `size - stride` tokens of context
    * across chunk boundaries). One codegen generator (`sequence` of
    * chunk starts — never a lambda-built array) + per-chunk `slice`,
    * no shuffle at all until the output sort: chunking runs at scan
    * speed over 100 TB. Each chunk carries a content hash so
    * downstream exact-dedup composes directly.
    */
  def chunkTokens(t: Tables, winSize: Int = 64, stride: Int = 48): DataFrame =
    chunksRaw(t, winSize, stride).orderBy("doc_id", "chunk_idx")

  /** Unsorted chunk build shared by [[chunkTokens]] and
    * [[passageDedup]] — shuffle-free by construction, so the
    * aggregation path gets its single shuffle without relying on the
    * optimizer to eliminate a sort.
    *
    * Start-grid bound: a start is emitted only while the PREVIOUS
    * window does not already reach the document's end
    * (`start < n - (winSize - stride)`), so every token is covered
    * exactly by the chosen windows and no doc-tail chunk is wholly
    * contained in its predecessor — tail fragments would be duplicate
    * training content, and (being as short as one token) would make
    * unrelated docs hash-collide in passage dedup.
    */
  private def chunksRaw(t: Tables, winSize: Int, stride: Int): DataFrame = {
    val overlap = winSize - stride
    t.documents
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(
        col("doc_id"),
        col("ws"),
        explode(
          sequence(lit(0), greatest(size(col("ws")) - overlap - 1, lit(0)), lit(stride))
        ).as("chunk_start")
      )
      .select(
        col("doc_id"),
        (col("chunk_start") / stride).cast("long").as("chunk_idx"),
        col("chunk_start").cast("long").as("chunk_start"),
        slice(col("ws"), col("chunk_start") + 1, lit(winSize)).as("chunk")
      )
      .select(
        col("doc_id"),
        col("chunk_idx"),
        col("chunk_start"),
        size(col("chunk")).cast("long").as("n_chunk_tokens"),
        md5(concat_ws(" ", col("chunk"))).as("chunk_hash")
      )
  }

  /** Passage-level dedup: exact dedup at CHUNK granularity — finds
    * copy-pasted passages between documents that doc-level dedup can't
    * see (two different pages quoting the same boilerplate paragraph).
    * Composes [[chunkTokens]]' content hash with one groupBy: emitted
    * rows are the duplicated chunk groups spanning more than one
    * document, each with its keeper. The chunk build is shuffle-free,
    * so the whole operator is one shuffle on chunk_hash — the same
    * shape as doc-level exact dedup, just on ~2× the row count
    * (stride < window).
    */
  def passageDedup(t: Tables): DataFrame =
    chunksRaw(t, winSize = 64, stride = 48)
      .groupBy("chunk_hash")
      .agg(
        count(lit(1)).as("n_copies"),
        countDistinct(col("doc_id")).as("n_docs"),
        min("doc_id").as("keep_doc_id")
      )
      .filter(col("n_docs") > 1)
      .orderBy("chunk_hash")

  /** Sequence packing: assign documents to fixed token-budget bins for
    * training-batch assembly. Documents are laid out in (source,
    * doc_id) order as one virtual token stream per source and cut every
    * `budget` tokens; a document belongs to the bin its FIRST token
    * falls in (documents are never split, so a bin can overflow by at
    * most one document's tail — the standard "pack then pad/truncate"
    * layout).
    *
    * The greedy formulation is a prefix sum, NOT a sequential fold, so
    * it stays declarative: one shuffle on source, a running-sum window,
    * and a partial-agg'd groupBy. At 100 TB the per-source window is
    * the only serial dimension — sources are many and balanced in a
    * real corpus layout (shard-sized groups), exactly like the
    * partitioned pagination twin in Paging.pagesScalable.
    */
  def packTokenBudget(t: Tables, budget: Int = 2048): DataFrame = {
    val bySource = org.apache.spark.sql.expressions.Window
      .partitionBy("source")
      .orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    t.documents
      .select(col("source"), col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("cum", sum("n_tokens").over(bySource))
      .withColumn("bin_id", floor((col("cum") - col("n_tokens")) / budget))
      .groupBy("source", "bin_id")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("bin_tokens"),
        min("doc_id").as("first_doc"),
        max("doc_id").as("last_doc")
      )
      .orderBy("source", "bin_id")
  }

  /** C58: padding-waste curve for length-bucketed batching — the audit
    * behind the sequence-bucketing knob: a training batch pads every
    * sequence in a bucket to the bucket's max length, so the cost of
    * choosing B equi-depth length buckets is
    * `waste(B) = Σ_b max_len(b)·n_docs(b) − Σ len` wasted pad tokens.
    * One row per candidate B with (padded, real, waste, integer-ppm
    * waste share) — the curve is provably non-increasing for doubling
    * B (the ⌊n·b/B⌋ rank boundaries NEST when B doubles, so finer
    * buckets refine coarser ones; spec-asserted).
    *
    * Scale shape: the corpus collapses to a per-length histogram in
    * ONE partial-agg'd shuffle (output = length domain — C24's
    * bounded-domain rule); everything after runs on histogram × 16
    * rows. Equi-depth WITHOUT per-doc ranks: docs of length L occupy
    * the rank interval (cum_before, cum_before + cnt], bucket b of B
    * covers ranks (⌊n·b/B⌋, ⌊n·(b+1)/B⌋], and the per-(length, bucket)
    * doc count is the integer interval overlap — no global sort, no
    * row_number, exact at any scale. The ppm share follows the C48
    * discipline: Decimal(38,0) cross-multiplication with
    * num − (num mod den) floor division (waste·10⁶ overflows a Long
    * past ~9·10¹² padded tokens).
    */
  def padAudit(t: Tables, maxBuckets: Int = 16): DataFrame = {
    val dec = "decimal(38,0)"
    // tiny: |length domain| rows; checkpointed because both the total
    // and the cumulative read it (two references would re-scan the
    // corpus — the round-6 column-pruning finding)
    val hist = t.documents
      .select(size(split(col("text"), " ")).cast("long").as("len"))
      .groupBy("len")
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val total = hist.agg(sum("cnt").as("n"))
    val wLen = Window
      .orderBy("len")
      .rowsBetween(Window.unboundedPreceding, -1)
    val exploded = hist
      .withColumn("lo", coalesce(sum("cnt").over(wLen), lit(0L)))
      .crossJoin(broadcast(total))
      // candidate bucket counts 1,2,4,8,16 × bucket index, cross-form
      // so the oracle's unnest mirrors it exactly
      .withColumn("nb", explode(typedLit(Seq.iterate(1L, 5)(_ * 2).takeWhile(_ <= maxBuckets))))
      .withColumn("b", explode(expr(s"sequence(0L, ${maxBuckets - 1}L)")))
      .filter(col("b") < col("nb"))
      .withColumn(
        "docs_in",
        greatest(
          lit(0L),
          least(col("lo") + col("cnt"), expr("n * (b + 1) div nb")) -
            greatest(col("lo"), expr("n * b div nb"))
        )
      )
      .filter(col("docs_in") > 0)
    exploded
      .groupBy("nb", "b")
      .agg(
        max("len").as("bucket_max"),
        sum("docs_in").as("n_docs"),
        sum(col("len") * col("docs_in")).as("real")
      )
      .groupBy("nb")
      .agg(
        sum(col("bucket_max") * col("n_docs")).as("padded_tokens"),
        sum("real").as("real_tokens")
      )
      .withColumn("waste_tokens", col("padded_tokens") - col("real_tokens"))
      .withColumn("num", (col("waste_tokens").cast(dec) * lit(1000000L).cast(dec)).cast(dec))
      .withColumn("den", col("padded_tokens").cast(dec))
      .select(
        col("nb").as("n_buckets"),
        col("padded_tokens"),
        col("real_tokens"),
        col("waste_tokens"),
        ((col("num") - (col("num") % col("den"))) / col("den")).cast("long").as("waste_ppm")
      )
      .orderBy("n_buckets")
  }

  /** C61: the END-TO-END release flagship — every stage of a corpus
    * release run as ONE composed pipeline, emitting the per-document
    * release manifest a training run reads:
    *
    *   [[curateFull]] (quality → language → exact dedup → near-dup
    *   components → repetition gate → n-gram decontamination) →
    *   semantic decontamination (anti-join the C49 flagged set — the
    *   embedding-space complement of the n-gram check; a release runs
    *   BOTH) → span removal over the survivors ([[Dedup.despanTextOn]]
    *   — remaining cross-doc 5-gram spans are cut, lowest doc owns) →
    *   per-source char quota on the CLEANED text (hash order, C28's
    *   policy) → hash-range train/val/test split (C17b) → token-budget
    *   packing within each (split, source) over cleaned token counts
    *   (C18's prefix-sum bins) → hash shard assignment (C31).
    *
    * One row per released doc: identity, placement (split/shard/bin)
    * and the despan accounting (n_cut, clean_hash) — the manifest plus
    * the cleaned-text hash is exactly what the downstream trainer and
    * the release audit consume. The whole chain is SQL-expressible, so
    * the COMPOSITION sits under the DuckDB hash gate — per-stage gates
    * can't see a composition regression (the round-6 lesson: it's the
    * joins BETWEEN stages where scan sharing silently breaks).
    *
    * Scale shape / scan budget (spec-asserted): the dominant cost,
    * the shingle posting index, is built ONCE inside curateFull and
    * feeds near-dup pairs AND n-gram decontamination; the curation DAG
    * runs ONCE — the surviving id list (output-sized, narrow) is
    * materialized via the [[Dedup.nearDupComponents]] checkpoint
    * contract, and every later stage joins THROUGH it rather than
    * re-running the gates. Full-text corpus scans: 1 curation signals
    * + 1 bigram + 1 postings + 2 despan (windows / token rebuild,
    * both restricted to survivors via the checkpointed id list) = 5,
    * plus one column-pruned (doc_id, source) scan for quota grouping
    * — constant, independent of stage count. Embeddings are scanned
    * for the eval broadcast + one corpus-vector pass (C49's shape).
    * At 100 TB the id-list joins key on doc_id — with the corpus in
    * the bucketed layout (B19) they are exchange-free on the corpus
    * side; the quota/pack windows are per-(source)/(split, source),
    * the same bounded serial dimension as the standalone stages.
    */
  def releaseManifest(
      t: Tables,
      checkpointDir: Option[String] = None,
      quotaChars: Long = 2000L,
      packBudget: Int = 256,
      nShards: Int = 64
  ): DataFrame = {
    val curated = curateFull(t, checkpointDir)
    val semCont = Similarity
      .semanticContamination(t)
      .select(col("vec_id").as("doc_id"))
    val ids0 = curated
      .select("doc_id")
      .join(semCont, Seq("doc_id"), "left_anti")
    // the id list is OUTPUT-sized and narrow; materializing it here is
    // what keeps the curation DAG single-run — despan's two corpus
    // scans re-join this checkpoint, not the gate pipeline
    val ids =
      if (checkpointDir.isDefined) ids0.checkpoint() else ids0.localCheckpoint()
    val clean = Dedup.despanTextOn(
      t.documents.select(col("doc_id"), col("text")).join(ids, "doc_id")
    )
    val byQuota = Window
      .partitionBy("source")
      .orderBy(col("hk"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val byPack = Window
      .partitionBy("split", "source")
      .orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clean
      .join(t.documents.select(col("doc_id"), col("source")), "doc_id")
      // quota counts Unicode CODE POINTS on both engines: Spark
      // length() = UTF8String.numChars, oracle uses DuckDB length()
      // (not strlen, which counts BYTES and diverges off-ASCII)
      .withColumn("clean_chars", length(col("clean_text")).cast("long"))
      .withColumn("hk", md5(col("doc_id").cast("string")))
      .withColumn("cum_chars", sum("clean_chars").over(byQuota))
      .filter(col("cum_chars") <= quotaChars)
      .withColumn("bucket", Sampling.hashBucket(100))
      .withColumn(
        "split",
        when(col("bucket") < 80, lit("train"))
          .when(col("bucket") < 90, lit("val"))
          .otherwise(lit("test"))
      )
      .withColumn("n_clean", (col("n_tokens") - col("n_cut")).cast("long"))
      .withColumn("cum_tokens", sum("n_clean").over(byPack))
      .withColumn("bin_id", floor((col("cum_tokens") - col("n_clean")) / packBudget))
      .withColumn("shard", Sampling.hashBucket(nShards))
      .select(
        col("doc_id"),
        col("source"),
        col("split"),
        col("shard"),
        col("bin_id"),
        col("n_tokens"),
        col("n_cut"),
        col("n_clean"),
        col("clean_chars"),
        col("cum_chars"),
        md5(col("clean_text")).as("clean_hash")
      )
      .orderBy("doc_id")
  }

  /** C62: the release DELTA manifest — the versioned-release story on
    * top of C61: run the ENTIRE release pipeline over corpus versions
    * V1 and V2 ([[simulatedVersionDocs]], the same deterministic
    * versions C25/C48 audit) and emit one row per doc in EITHER
    * release:
    *
    *   'enter' — in V2's release only (new/retained content, must be
    *             processed);
    *   'leave' — in V1's release only (deleted, displaced by quota, or
    *             newly gated — downstream must drop it);
    *   'moved' — in both but placement (split/shard/bin) or cleaned
    *             content hash changed (must be re-packed / re-tokenized);
    *   'stay'  — identical placement and content (the re-use set: the
    *             row that lets a trainer skip re-processing, which is
    *             the whole point of a delta manifest).
    *
    * This is what bounds nightly re-processing: the C25 row-level text
    * diff says what changed in the CORPUS; this says what changed in
    * the RELEASE — quota displacement and packing make those differ in
    * both directions (an untouched doc can move bins because an
    * upstream doc left; an edited doc can stay gated out).
    *
    * Scale shape: two full release runs (inherently 2× C61's corpus
    * scans — spec-bounded at exactly that) joined full-outer on doc_id;
    * each release's curation DAG runs once behind its own checkpointed
    * id list, nothing is recomputed across versions, and the join is
    * manifest-sized (released docs, not corpus).
    */
  def releaseDelta(t: Tables, checkpointDir: Option[String] = None): DataFrame = {
    val (v1, v2) = simulatedVersionDocs(t)
    // the two release runs are INDEPENDENT pipelines over different
    // corpus versions, and each one is a driver-latency-bound chain
    // (iterative component rounds materializing + counting per round)
    // — build them CONCURRENTLY (guide §2.6) so one run's driver gaps
    // back-fill with the other's jobs; the manifests are only joined
    // after both complete, so the output is unchanged
    implicit val ec: scala.concurrent.ExecutionContext = Overlap.ec
    val (m1, m2) = {
      val f1 = scala.concurrent.Future(
        releaseManifest(t.copy(docsOverride = Some(v1)), checkpointDir))
      val f2 = scala.concurrent.Future(
        releaseManifest(t.copy(docsOverride = Some(v2)), checkpointDir))
      (
        scala.concurrent.Await.result(f1, scala.concurrent.duration.Duration.Inf),
        scala.concurrent.Await.result(f2, scala.concurrent.duration.Duration.Inf)
      )
    }
    val a = m1.select(
      col("doc_id"),
      col("split").as("old_split"),
      col("shard").as("old_shard"),
      col("bin_id").as("old_bin"),
      col("clean_hash").as("old_clean_hash")
    )
    val b = m2.select(
      col("doc_id"),
      col("split").as("new_split"),
      col("shard").as("new_shard"),
      col("bin_id").as("new_bin"),
      col("clean_hash").as("new_clean_hash")
    )
    a.join(b, Seq("doc_id"), "full_outer")
      .withColumn(
        "change",
        when(col("old_clean_hash").isNull, "enter")
          .when(col("new_clean_hash").isNull, "leave")
          .when(
            col("old_split") =!= col("new_split") ||
              col("old_shard") =!= col("new_shard") ||
              col("old_bin") =!= col("new_bin") ||
              col("old_clean_hash") =!= col("new_clean_hash"),
            "moved"
          )
          .otherwise("stay")
      )
      .select(
        col("doc_id"),
        col("change"),
        col("old_split"),
        col("new_split"),
        col("old_shard"),
        col("new_shard"),
        col("old_bin"),
        col("new_bin"),
        col("old_clean_hash"),
        col("new_clean_hash")
      )
      .orderBy("doc_id")
  }
}
