package graft.operators

import graft.sources.{ContentStore, ParquetEpochs, StoreLifecycle, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** B87: cross-asset RIGHT-TO-BE-FORGOTTEN cascade — one verb purging a
  * doc cohort from a corpus store AND every derived asset that still
  * carries its ids. B81's record delete removes rows from ONE store;
  * a real RTBF request must also reach the signature index the dedup
  * maintains (C22e/f), the component-label state (C22i — where a
  * purged doc's id can LIVE ON as other rows' cluster label), and the
  * ANN assignment epochs (C7e/f). Without the cascade that is N manual
  * deletes the operator must know to run; with it, release compliance
  * is one call. (Reference analog: consumer state dies with the
  * subscription row — lcount.go:206-237's DELETE cascades through the
  * demo's Postgres schema.)
  *
  * Every leg is the store's own frame-valued primitive, so the cohort
  * never lands on the driver:
  *
  *  - COLUMNAR assets (corpus, C22f index, C7e/f assignments — any
  *    store + id column): one [[ParquetEpochs.deleteWhere]] each.
  *  - K-V assets (the C22e index): ids format into the asset's key
  *    pattern (`sig/%d`) and purge via [[StoreLifecycle.deleteKeys]].
  *  - COMPONENT STATE (C22i): the one asset where delete alone is
  *    wrong. Labels are doc ids (min member of the cluster), so a
  *    purged doc that IS a label survives as a VALUE in other docs'
  *    rows. The cascade deletes the cohort's own rows AND hands each
  *    orphaned label to the next-smallest surviving member via
  *    [[ParquetEpochs.upsert]] — an upsert, not an append, because the
  *    maintained label is min(component) over epochs (the monotonicity
  *    invariant) and a handed-off label is LARGER than the purged one:
  *    only a rewrite that removes the old rows keeps min() exact.
  *    Monotonicity holds again from the rewrite on (future merge
  *    patches still only append smaller labels). A cluster whose every
  *    member is purged loses all its rows — the label vanishes with
  *    them.
  *
  * Idempotent/resumable: re-running with the same `cascadeId`
  * converges — completed deletes find nothing, the relabel upsert
  * replays into its idempotent epoch, and a crash mid-cascade resumes
  * by re-running (each leg is itself atomic). Like every delete, the
  * purge is only COMPLETE after vacuum's retention grace expires the
  * shadowed sources on each store (pinned pre-cascade snapshots read
  * the old rows until then — the B81 contract, per asset).
  */
object Forget {

  /** Per-asset outcomes of one [[forgetDocs]] cascade: `deletes` keyed
    * by store dir (columnar + K-V legs), plus the component-state
    * leg's delete and (when any label needed handing off) its relabel
    * upsert.
    */
  final case class ForgetReport(
      deletes: Seq[(String, StoreLifecycle.DeleteReport)],
      stateDelete: Option[StoreLifecycle.DeleteReport],
      stateRelabel: Option[StoreLifecycle.UpsertReport])

  /** Purge `docIds` (exactly one integral column) from every named
    * asset. `columnarAssets` = (storeDir, idColumn) pairs;
    * `kvAssets` = (storeDir, java-format key pattern, e.g. "sig/%d");
    * `componentStateStore` = the C22i (doc_id, component) store, with
    * the deleted-label handoff described above. `cascadeId` is the
    * request's identity and is REQUIRED (no default): the relabel
    * upsert's epoch id derives from it, making the cascade
    * replay-convergent. The epoch id ALSO carries a fingerprint of
    * the cohort (one tiny aggregate — count + order-independent
    * xxhash64 fold), so even a caller that reuses one cascadeId for
    * two DIFFERENT requests cannot silently lose the second relabel
    * to the first's idempotent early-return — reuse degrades to two
    * distinct epochs instead of a dropped compliance verb. (The
    * delete legs were never at risk: their manifest names already
    * hash the affected sources + key-set fingerprint.)
    */
  def forgetDocs(
      spark: SparkSession,
      docIds: DataFrame,
      columnarAssets: Seq[(String, String)] = Nil,
      kvAssets: Seq[(String, String)] = Nil,
      componentStateStore: Option[String] = None,
      cascadeId: String
  ): ForgetReport = {
    require(docIds.schema.fields.length == 1,
      s"forgetDocs: cohort frame must have exactly one column, got ${docIds.schema.catalogString}")
    val ids = docIds.toDF("doc_id")
    // The per-asset legs are independent stores, and each leg is a
    // latency-bound chain of small driver steps (stats read, match
    // count, CoW commit) — run legs CONCURRENTLY so one leg's driver
    // gaps back-fill with another's jobs (optimization guide §2.6:
    // actions are only sequential because the driver calls them
    // sequentially). Legs naming the SAME store dir stay sequential in
    // list order (a self-race on one store is not a semantics we want
    // to widen); results keep the caller's list order. Cascade wall
    // time becomes max(leg) instead of Σ(leg) — the shape that matters
    // when a real RTBF fans out over many derived assets.
    type Leg = () => (String, StoreLifecycle.DeleteReport)
    val colLegs: Seq[(String, Leg)] = columnarAssets.map { case (dir, idCol) =>
      dir -> (() => dir -> ParquetEpochs.deleteWhere(spark, dir, idCol, ids, None, Set.empty, None))
    }
    val kvLegs: Seq[(String, Leg)] = kvAssets.map { case (dir, pattern) =>
      dir -> (() => {
        val keys = ids.select(format_string(pattern, col("doc_id")).as("k"))
        dir -> StoreLifecycle.deleteKeys(spark, dir, keys, Set.empty, None)
      })
    }
    val legs = colLegs ++ kvLegs
    // the state leg runs CONCURRENTLY with every asset leg, so the
    // same-dir serialization below cannot cover it — a caller that
    // also lists the state-store dir as an asset would race two CoW
    // mutations on one store; make the precondition explicit
    componentStateStore.foreach(sd =>
      require(!legs.exists(_._1 == sd),
        s"forgetDocs: componentStateStore '$sd' also appears as a cascade asset dir — " +
          "the state leg is not covered by same-dir serialization; list the dir only " +
          "as componentStateStore"))
    val byDir: Map[String, Seq[(Int, Leg)]] =
      legs.zipWithIndex.map { case ((dir, leg), i) => (dir, i, leg) }
        .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3))).toMap
    implicit val ec: scala.concurrent.ExecutionContext = Overlap.ec
    val stateF =
      componentStateStore.map(dir => scala.concurrent.Future(stateLeg(spark, dir, ids, cascadeId)))
    // per-leg results as Try: with concurrent legs one failure no
    // longer prevents the others from mutating their stores, so ALL
    // failures must surface (first primary, rest suppressed) and the
    // legs that DID commit must stay auditable — a partially applied
    // RTBF cascade silently reduced to one exception is exactly what
    // the old sequential fail-stop never produced
    val legFs = byDir.toSeq.map { case (dir, group) =>
      scala.concurrent.Future(group.sortBy(_._1).map { case (i, leg) => i -> leg() })
        .transform(r => scala.util.Success(dir -> r))
    }
    val legResults = scala.concurrent.Await
      .result(scala.concurrent.Future.sequence(legFs), scala.concurrent.duration.Duration.Inf)
    val stateR = stateF.map(f =>
      scala.concurrent.Await.ready(f, scala.concurrent.duration.Duration.Inf).value.get)
    val failures = legResults.collect { case (_, scala.util.Failure(e)) => e } ++
      stateR.collect { case scala.util.Failure(e) => e }
    if (failures.nonEmpty) {
      val primary = failures.head
      failures.drop(1).foreach(s => if (s ne primary) primary.addSuppressed(s))
      val completed = legResults.collect { case (dir, scala.util.Success(_)) => dir } ++
        componentStateStore.filter(_ => stateR.exists(_.isSuccess))
      System.err.println(
        s"[graft] forgetDocs cascade '$cascadeId': ${failures.size} leg(s) failed; " +
          s"legs that committed anyway: ${if (completed.isEmpty) "none" else completed.mkString(", ")}")
      throw primary
    }
    val ordered = legResults.flatMap(_._2.get).sortBy(_._1).map(_._2)
    val st = stateR.map(_.get)
    ForgetReport(ordered, st.map(_._1), st.flatMap(_._2))
  }

  /** The component-state leg of one cascade (see [[forgetDocs]]): the
    * cohort's own rows are deleted, and every surviving cluster whose
    * LABEL doc was purged gets its label handed to the next-smallest
    * surviving member via an idempotent upsert.
    */
  private def stateLeg(
      spark: SparkSession,
      dir: String,
      ids: DataFrame,
      cascadeId: String
  ): (StoreLifecycle.DeleteReport, Option[StoreLifecycle.UpsertReport]) = {
    // derivation pins the PRE-cascade snapshot so the frames below
    // stay stable across the two mutations (shadowed manifests
    // remain readable until vacuum's grace)
    val pin   = ParquetEpochs.snapshot(dir)
    val state = ParquetEpochs.read(spark, dir, pin)
    // rows of clusters whose LABEL doc is purged...
    val affected = state.join(
      ids.select(col("doc_id").as("__purged")),
      state("component") === col("__purged"), "left_semi")
    // ...their surviving members...
    val remaining = affected.join(
      ids.select(col("doc_id").as("__purged")),
      affected("doc_id") === col("__purged"), "left_anti")
    // ...and the handed-off label: the next-smallest survivor
    val newLabels = remaining.groupBy("component").agg(min("doc_id").as("__new"))
    val versions = remaining.join(newLabels, "component")
      .select(col("doc_id"), col("__new").as("component"))
    val d = ParquetEpochs.deleteWhere(spark, dir, "doc_id", ids, None, Set.empty, None)
    val u =
      if (versions.isEmpty) None
      else {
        // cohort fingerprint in the epoch id: a reused cascadeId
        // with a different cohort gets a DIFFERENT epoch instead
        // of losing its relabel to writeManifest's idempotent
        // early-return (same cascadeId + same cohort still
        // replays into one epoch — the convergence contract)
        val fp = ids.agg(count(lit(1)), expr("bit_xor(xxhash64(doc_id))")).head()
        val cohortFp = java.lang.Long.toHexString(
          fp.getLong(0) ^ (if (fp.isNullAt(1)) 0L else fp.getLong(1)))
        Some(ParquetEpochs.upsert(spark, dir, versions, "doc_id",
          s"$cascadeId-relabel-$cohortFp"))
      }
    (d, u)
  }

  /** B87 gate fixture: builds a corpus store plus all four derived
    * assets with the REAL writers (C22e/C22f signature index, C22i
    * component state range-clustered for the C22j serving read, the
    * C7e IVF centroid+assignment pair), cascades the
    * `doc_id % 3 == 0` cohort through [[forgetDocs]], and reads every
    * asset back. Component state is the deterministic groups-of-3
    * clustering (label = min member id), so every group's LABEL doc is
    * in the cohort — the handoff fires for every surviving cluster and
    * the oracle recomputes the handed-off labels as a plain window
    * min over survivors. The gate frame is (asset, doc_id, component):
    * surviving ids per asset, labels only on the state rows, read
    * through the C22j serving path.
    */
  def forgetRead(t: Tables, baseDir: String): DataFrame = {
    val spark = t.spark
    val hconf = spark.sessionState.newHadoopConf()
    val dirs @ Seq(corpusDir, kvsigDir, colsigDir, stateDir, centDir, asgDir) =
      Seq("corpus", "kvsig", "colsig", "state", "ivfcent", "ivfasg").map(n => s"$baseDir/$n")
    dirs.foreach { d =>
      val (fs, p) = ContentStore.fs(d, hconf)
      fs.delete(p, true): Unit
    }
    val docs = t.documents
    // the five asset builds touch five DISTINCT stores and share no
    // state beyond the immutable docs frame — build them concurrently
    // (guide §2.6), so the fixture's wall time is the slowest build,
    // not the sum of five latency-bound write chains
    val grouped = docs.select(col("doc_id"),
      (col("doc_id") - pmod(col("doc_id"), lit(3))).as("g"))
    val labels = grouped
      .join(grouped.groupBy("g").agg(min("doc_id").as("component")), "g")
      .select("doc_id", "component")
    implicit val ec: scala.concurrent.ExecutionContext = Overlap.ec
    val builds = Seq[() => Unit](
      () => ParquetEpochs.append(
        docs.select("doc_id", "lang", "n_chars")
          .repartitionByRange(4, col("doc_id")).sortWithinPartitions("doc_id"),
        corpusDir): Unit,
      () => Dedup.writeSignatureIndex(spark, docs, kvsigDir),
      () => Dedup.writeSignatureIndexColumnar(spark, docs, colsigDir): Unit,
      () => Dedup.writeComponentState(labels, stateDir, rangeClusterParts = 4): Unit,
      () => Similarity.buildIvfIndex(t, centDir, asgDir): Unit
    ).map(b => scala.concurrent.Future(b()))
    scala.concurrent.Await
      .result(scala.concurrent.Future.sequence(builds), scala.concurrent.duration.Duration.Inf): Unit

    val cohort = docs.select("doc_id").filter(pmod(col("doc_id"), lit(3)) === 0)
    forgetDocs(
      spark,
      cohort,
      columnarAssets = Seq(corpusDir -> "doc_id", colsigDir -> "doc_id", asgDir -> "vec_id"),
      kvAssets = Seq(kvsigDir -> "sig/%d"),
      componentStateStore = Some(stateDir),
      cascadeId = "forget-gate"): Unit

    def snap(d: String) = ContentStore.snapshotManifests(d)
    val nullLabel = lit(null).cast("long").as("component")
    val corpusIds = ParquetEpochs.read(spark, corpusDir, snap(corpusDir))
      .select(lit("corpus").as("asset"), col("doc_id"), nullLabel)
    val kvIds = spark.read.format("graft.sources.ContentStore").option("path", kvsigDir).load()
      .select(lit("kvsig").as("asset"),
        expr("CAST(substring(result_key, 5) AS BIGINT)").as("doc_id"), nullLabel)
    val colIds = ParquetEpochs.read(spark, colsigDir, snap(colsigDir))
      .select(lit("colsig").as("asset"), col("doc_id"), nullLabel)
    val stateRows = Dedup
      .componentLabelsInRange(spark, stateDir, snap(stateDir), 0L, Long.MaxValue - 1)
      .select(lit("state").as("asset"), col("doc_id"), col("component"))
    val ivfIds = ParquetEpochs.read(spark, asgDir, snap(asgDir))
      .select(lit("ivf").as("asset"), col("vec_id").as("doc_id"), nullLabel)
    corpusIds.unionAll(kvIds).unionAll(colIds).unionAll(stateRows).unionAll(ivfIds)
      .orderBy("asset", "doc_id")
  }
}
