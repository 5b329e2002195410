package graft

import graft.operators.Dedup
import graft.sources.ContentStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** C22e: the incremental probe against the PERSISTED signature index
  * (ContentStore epochs). Pins the three claims the gate alone can't:
  * the probe equals the in-memory exact probe row for row, its inputs
  * are ONLY the delta + the store read exactly once (the index subtree
  * scans nothing but the store, and the probe plan holds neither a
  * file scan — no full-corpus signature recompute — nor a store
  * re-read per consumer), and the epoch-append maintenance loop makes
  * tonight's admissions tomorrow's probe targets while a pinned
  * snapshot stays frozen.
  */
class SignatureIndexSpec extends SparkSpecBase {
  import spark.implicits._

  private def verdictRows(df: DataFrame) =
    df.collect().map { r =>
      (
        r.getAs[Long]("doc_id"),
        r.getAs[String]("dup_kind"),
        Option(r.getAs[Any]("match_doc_id")),
        Option(r.getAs[Any]("near_jaccard"))
      )
    }.toSeq

  private def executedPlanString(df: DataFrame): String = {
    df.collect() // materialize so AQE finalizes the plan
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p                        => p.toString
    }
  }

  // 12-word fixtures → 10 distinct trigram shingles each; appending two
  // words makes a 12-shingle variant sharing 10 → jaccard 10/12 ≈ 0.833,
  // comfortably over τ=0.5 and under exact-hash equality
  private val textA = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
  private val textB = "one two three four five six seven eight nine ten eleven twelve"
  private val textX = "red orange yellow green blue indigo violet cyan magenta umber teal pink"

  test("persisted-index probe equals the in-memory exact posting probe row for row") {
    // same discipline as the C22d spec: the band probe against the
    // STORE must reproduce the posting-index verdicts exactly on the
    // corpus (band-miss prob (1-s^4)^32 ≈ 1e-15 at the s≈0.9 corpus
    // near-dups; the pinned snapshot removes any run-order dependence)
    assert(
      verdictRows(Dedup.incrementalDedupPersisted(tables, Dedup.JaccardTau)) ==
        verdictRows(Dedup.incrementalDedup(tables))
    )
  }

  test("probe reads the store once and the plan holds zero corpus scans") {
    val storeRoot = java.nio.file.Files.createTempDirectory("graft-sigindex-spec")
    val store     = storeRoot.toString
    try {
    Dedup.writeSignatureIndex(spark, Seq((1L, textA), (2L, textB)).toDF("doc_id", "text"), store)
    val pin = ContentStore.snapshotManifests(store)
    // provenance: the index subtree reads ONLY the store — a file scan
    // there could only be a full-corpus signature recompute, the exact
    // regression the persisted index exists to prevent
    val idxPlan = executedPlanString(Dedup.readSignatureIndex(spark, store, pin))
    assert(idxPlan.contains("graft_content_store"), s"index subtree skips the store:\n$idxPlan")
    assert(!idxPlan.contains("FileScan"), s"index subtree re-scans a file source:\n$idxPlan")
    val delta = Seq((100L, textX), (101L, textA + " nu xi")).toDF("doc_id", "text")
    val probe = Dedup.incrementalDedupPersisted(spark, delta, store, pin, Dedup.JaccardTau)
    val plan  = executedPlanString(probe)
    // the delta arrives as its own input (here a LocalTableScan); the
    // base side is the MATERIALIZED index, read from the store exactly
    // once — so the probe plan itself holds neither a file scan (no
    // corpus recompute) nor a store scan (no per-consumer re-read of
    // the one asset that is big at 100 TB; it feeds three plan sites)
    assert(!plan.contains("FileScan"), s"probe plan re-scans a file source:\n$plan")
    assert(!plan.contains("graft_content_store"),
      s"probe plan re-reads the store per consumer instead of the materialized index:\n$plan")
    // exchange-free index side (r16, measured 0.595 → 0.364 s at
    // sf0.1): BOTH probe joins broadcast the delta, so the index-side
    // subtrees must carry NO shuffle — a ShuffledHashJoin here means
    // the exploded band keys (32/doc) go through the wire again
    assert(!plan.contains("ShuffledHashJoin"),
      s"probe must broadcast the delta side, not shuffle the index:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"probe joins must plan as broadcast (delta build side):\n$plan")
    assert(
      verdictRows(probe) == Seq(
        (100L, "new", None, None),
        (101L, "near", Some(1L), Some(10.0 / 12.0))
      )
    )
    } finally deleteTree(storeRoot)
  }

  test("maintenance loop: appended epoch becomes a probe target; a pinned snapshot does not") {
    val storeRoot = java.nio.file.Files.createTempDirectory("graft-sigindex-spec")
    val store     = storeRoot.toString
    try {
    Dedup.writeSignatureIndex(spark, Seq((1L, textA), (2L, textB)).toDF("doc_id", "text"), store)
    val pin1 = ContentStore.snapshotManifests(store)

    // delta 1: X is new, Y an exact copy of A (whitespace-normalized),
    // Z a near-dup of B — verdict precedence end to end
    val delta1 = Seq(
      (100L, textX),
      (101L, "alpha  beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
      (102L, textB + " thirteen fourteen")
    ).toDF("doc_id", "text")
    val v1 = Dedup.incrementalDedupPersisted(spark, delta1, store, pin1, Dedup.JaccardTau)
    val got1 = verdictRows(v1)
    assert(got1.map(r => (r._1, r._2, r._3)) == Seq(
      (100L, "new", None),
      (101L, "exact", Some(1L)),
      (102L, "near", Some(2L))
    ))
    assert(math.abs(got1(2)._4.get.asInstanceOf[Double] - 10.0 / 12.0) < 1e-12)

    // maintenance: ONLY the admitted doc (X) joins the index, as a new
    // manifest-committed epoch
    Dedup.appendAdmittedSignatures(spark, delta1, v1, store)
    val pin2 = ContentStore.snapshotManifests(store)
    assert(pin2.size > pin1.size, "append did not commit a new manifest epoch")
    assert(Dedup.readSignatureIndex(spark, store, pin2).count() == 3L)

    // delta 2: W near-dups the doc delta 1 ADMITTED — the maintained
    // snapshot matches it, the pinned pre-append snapshot cannot
    val delta2 = Seq((200L, textX + " maroon olive")).toDF("doc_id", "text")
    assert(
      verdictRows(Dedup.incrementalDedupPersisted(spark, delta2, store, pin2, Dedup.JaccardTau))
        .map(r => (r._1, r._2, r._3)) == Seq((200L, "near", Some(100L)))
    )
    assert(
      verdictRows(Dedup.incrementalDedupPersisted(spark, delta2, store, pin1, Dedup.JaccardTau)) ==
        Seq((200L, "new", None, None))
    )
    } finally deleteTree(storeRoot)
  }

  test("index compaction: verdicts and the zero-corpus-scan plan survive OPTIMIZE + VACUUM") {
    // the B78 lifecycle composed with C22e: after enough nightly
    // appends the index store compacts its epoch tail — probes through
    // the post-compaction snapshot must be indistinguishable, and the
    // plan still reads only the store (compaction cannot reintroduce a
    // corpus scan)
    val storeRoot = java.nio.file.Files.createTempDirectory("graft-sigindex-spec")
    val store     = storeRoot.toString
    try {
      Dedup.writeSignatureIndex(spark, Seq((1L, textA), (2L, textB)).toDF("doc_id", "text"), store)
      val pin0   = ContentStore.snapshotManifests(store)
      val delta1 = Seq((100L, textX)).toDF("doc_id", "text")
      val v1     = Dedup.incrementalDedupPersisted(spark, delta1, store, pin0, Dedup.JaccardTau)
      Dedup.appendAdmittedSignatures(spark, delta1, v1, store)
      val delta2 = Seq((200L, textX + " maroon olive"), (201L, textA)).toDF("doc_id", "text")
      def probe(pin: Seq[String]) =
        verdictRows(Dedup.incrementalDedupPersisted(spark, delta2, store, pin, Dedup.JaccardTau))
      val before = probe(ContentStore.snapshotManifests(store))

      assert(graft.sources.StoreLifecycle.compactEpochs(spark, store).isDefined)
      val pinC = ContentStore.snapshotManifests(store)
      assert(pinC.size == 1 && pinC.head.startsWith("compact-"),
        s"base + append epochs must fold into one manifest: $pinC")
      assert(probe(pinC) == before, "compaction changed probe verdicts")

      graft.sources.StoreLifecycle.vacuum(spark, store, 0L, spark.sessionState.newHadoopConf()): Unit
      // same plan discipline as the zero-corpus-scan test, post-lifecycle:
      // index subtree = store only; probe plan = no file scan, no store
      // re-read (the materialized index is read once)
      val idxPlan = executedPlanString(Dedup.readSignatureIndex(spark, store, pinC))
      assert(idxPlan.contains("graft_content_store"), s"post-lifecycle index skips the store:\n$idxPlan")
      assert(!idxPlan.contains("FileScan"), s"post-lifecycle index re-scans a file source:\n$idxPlan")
      val after = Dedup.incrementalDedupPersisted(spark, delta2, store, pinC, Dedup.JaccardTau)
      val plan  = executedPlanString(after)
      assert(!plan.contains("FileScan"), s"post-lifecycle probe re-scans a file source:\n$plan")
      assert(verdictRows(after) == before, "vacuum changed probe verdicts")
    } finally deleteTree(storeRoot)
  }
}
