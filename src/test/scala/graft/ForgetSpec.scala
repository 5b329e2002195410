package graft

import java.nio.file.Files

import graft.operators.Forget
import graft.sources.{ContentStore, ParquetEpochs, StoreLifecycle}
import org.apache.spark.sql.functions.col

/** B87: the cross-asset RTBF cascade — the handoff edge cases the gate
  * fixture (every label purged) does not isolate: a label that
  * SURVIVES needs no relabel, a fully-purged cluster vanishes, and the
  * cascade replays convergently.
  */
class ForgetSpec extends SparkSpecBase {

  private def tmp(): String = Files.createTempDirectory("graft-forget").toString
  private def hconf         = spark.sessionState.newHadoopConf()

  private def stateRows(dir: String): Set[(Long, Long)] =
    graft.operators.Dedup
      .readComponentState(spark, dir, ContentStore.snapshotManifests(dir))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("deleted-label handoff: orphaned labels move to the next-smallest survivor, others untouched") {
    val dir = tmp()
    import spark.implicits._
    // three clusters: {1,2,3} labeled 1; {10,11} labeled 10; {20,21}
    // labeled 20 — plus a stale pre-merge epoch for 3 (label 2) so the
    // min-over-epochs invariant is in play
    graft.operators.Dedup.writeComponentState(
      Seq((1L, 1L), (2L, 1L), (3L, 2L), (10L, 10L), (11L, 10L), (20L, 20L), (21L, 20L))
        .toDF("doc_id", "component"), dir): Unit
    graft.operators.Dedup.writeComponentState(
      Seq((3L, 1L)).toDF("doc_id", "component"), dir): Unit // merge patch: 3 joins cluster 1
    assert(stateRows(dir) ==
      Set(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L))
    // purge {1, 11, 20, 21}: cluster 1 loses its LABEL doc (handoff to
    // 2 — and doc 3's STALE (3,2) row must not resurrect label 2),
    // cluster 10 keeps its label (member purge only), cluster 20 is
    // purged entirely (label vanishes)
    val r = Forget.forgetDocs(
      spark, Seq(1L, 11L, 20L, 21L).toDF("doc_id"),
      componentStateStore = Some(dir), cascadeId = "t1")
    assert(r.stateDelete.exists(_.deletedRows == 4L))
    assert(r.stateRelabel.nonEmpty, "cluster 1's orphaned label must hand off")
    assert(stateRows(dir) == Set(2L -> 2L, 3L -> 2L, 10L -> 10L))
    // replay converges: nothing left to delete, relabel re-applies the
    // same values into its idempotent epoch
    val r2 = Forget.forgetDocs(
      spark, Seq(1L, 11L, 20L, 21L).toDF("doc_id"),
      componentStateStore = Some(dir), cascadeId = "t1")
    assert(r2.stateDelete.forall(_.deletedRows == 0L))
    assert(stateRows(dir) == Set(2L -> 2L, 3L -> 2L, 10L -> 10L))
  }

  test("a reused cascadeId with a DIFFERENT cohort still lands its relabel") {
    val dir = tmp()
    import spark.implicits._
    graft.operators.Dedup.writeComponentState(
      Seq((1L, 1L), (2L, 1L), (10L, 10L), (11L, 10L)).toDF("doc_id", "component"), dir): Unit
    // request A purges cluster 1's label doc under cascadeId "dup"
    Forget.forgetDocs(
      spark, Seq(1L).toDF("doc_id"), componentStateStore = Some(dir), cascadeId = "dup"): Unit
    assert(stateRows(dir) == Set(2L -> 2L, 10L -> 10L, 11L -> 10L))
    // request B reuses the id for a different cohort: the cohort
    // fingerprint in the relabel epoch id keeps it from losing to A's
    // idempotent epoch — cluster 10's handoff must land, not drop
    val r2 = Forget.forgetDocs(
      spark, Seq(10L).toDF("doc_id"), componentStateStore = Some(dir), cascadeId = "dup")
    assert(r2.stateRelabel.nonEmpty, "second cascade's relabel must not be lost to the first")
    assert(stateRows(dir) == Set(2L -> 2L, 11L -> 11L))
  }

  test("no orphaned label: the cascade is delete-only (no relabel epoch lands)") {
    val dir = tmp()
    import spark.implicits._
    graft.operators.Dedup.writeComponentState(
      Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("doc_id", "component"), dir): Unit
    val r = Forget.forgetDocs(
      spark, Seq(3L).toDF("doc_id"), componentStateStore = Some(dir), cascadeId = "t2")
    assert(r.stateRelabel.isEmpty)
    assert(stateRows(dir) == Set(1L -> 1L, 2L -> 1L))
  }

  test("K-V and columnar asset legs purge through the frame-valued deletes") {
    val kv = tmp(); val colStore = tmp()
    import spark.implicits._
    Seq(("sig/1", "a"), ("sig/2", "b"), ("sig/3", "c"))
      .toDF("result_key", "payload")
      .write.format("graft.sources.ContentStore").option("path", kv).mode("append").save()
    ParquetEpochs.append(Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("doc_id", "v"), colStore): Unit
    val r = Forget.forgetDocs(
      spark, Seq(2L).toDF("doc_id"),
      columnarAssets = Seq(colStore -> "doc_id"),
      kvAssets = Seq(kv -> "sig/%d"),
      cascadeId = "t3")
    assert(r.deletes.size == 2 && r.deletes.forall(_._2.deletedRows == 1L))
    val kvLeft = spark.read.format("graft.sources.ContentStore").option("path", kv).load()
      .collect().map(_.getString(0)).toSet
    assert(kvLeft == Set("sig/1", "sig/3"))
    val colLeft = ParquetEpochs.read(spark, colStore, ContentStore.snapshotManifests(colStore))
      .collect().map(_.getLong(0)).toSet
    assert(colLeft == Set(1L, 3L))
  }
}
