package graft.sources

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.UUID

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.util.SerializableConfiguration

/** Store maintenance — the lifecycle half every log-structured store
  * needs once appends are continuous (A18's streaming epochs, C22e's
  * nightly signature-index appends): without it manifest count and
  * dead bytes grow without bound. Two operations, the OPTIMIZE/VACUUM
  * pair of lakehouse formats (Delta/Iceberg), re-expressed on the
  * ContentStore's manifest protocol:
  *
  *  - [[compactEpochs]]: rewrite the N oldest live manifests' rows
  *    into one manifest ("compact-&lt;hash&gt;", sources recorded in a
  *    `_compacted/` sidecar committed before the manifest rename).
  *    The swap is ATOMIC at the manifest rename: readers resolve the
  *    sidecar and shadow the replaced sources out of the effective
  *    listing ([[ContentStore.effectiveManifestNames]]), so no reader
  *    ever sees sources and replacement together. The shadowed
  *    sources stay on disk — pinned pre-compaction snapshots and
  *    lagging streaming tails keep reading them by name — until
  *    [[vacuum]]'s retention grace expires them. Streaming tails stay
  *    exactly-once across the swap via the consumed-set rule on the
  *    source (StoreMicroBatchStream.effectiveStreamFiles).
  *
  *  - [[vacuum]]: age-gated garbage collection — expire shadowed
  *    source manifests once every compaction referencing them is
  *    older than the grace, then sweep unreferenced data files
  *    (crashed-executor orphans, `.staging-*` leftovers, expired
  *    sources' data) and stale `.tmp-*`/sidecar metadata. The grace
  *    horizon is the store's retention CONTRACT: it must exceed both
  *    the maximum streaming-tail lag and the lifetime of any pinned
  *    snapshot naming a shadowed manifest — vacuuming past a pin
  *    breaks that pin's time travel, exactly Delta's
  *    `deletedFileRetentionDuration` trade. `grace = 0` is the
  *    test/teardown setting; production keeps days.
  *
  * At 100 TB scale both ops are bounded by METADATA, not data:
  * compaction's rewrite job is a distributed pinned-snapshot read of
  * only the chosen sources (never the whole store), and vacuum's
  * driver footprint is O(manifest count) + O(deleted names) — the
  * referenced-file diff (manifest lines × `data/` listing) runs as a
  * Spark left-anti join, never as a driver Set (at 10⁹ blobs that Set
  * is tens of GB of strings). Concurrency: two concurrent compactions
  * over the SAME source set race benignly (deterministic manifest
  * name — the loser's rename fails idempotently and its files are
  * dropped); overlapping but UNEQUAL source sets are a CHECKED
  * invariant, not just an operational contract — every replacement
  * commit re-lists the effective set immediately before its manifest
  * rename and refuses with a retryable
  * [[StoreCommitConflictException]] when a shadowing commit landed
  * since planning (writeManifest's OCC re-list; recovery = re-run the
  * operation, which re-plans from the current snapshot). Callers
  * SHOULD still serialize maintenance per store — the check turns a
  * silent wrong-shadowing into a clean refusal, not into a merge.
  */
object StoreLifecycle {

  /** Job group the [[vacuum]] referenced-file diff runs under — specs
    * pin that GC's file diff executed as a distributed job, not a
    * driver walk.
    */
  val VacuumJobGroup = "graft-vacuum-gc"

  /** Source selection + deterministic name shared by every compaction
    * variant (the DSv2 K-V rewrite below and [[ParquetEpochs.compact]]'s
    * columnar rewrite): the all-but-`keepLast`-newest live manifests in
    * COMMIT order, or None when fewer than two would fold.
    */
  /** Live manifests in COMMIT order, which the lexical name order does
    * not give (batch manifests are UUID-named; epoch ids are
    * unpadded, so epoch-q-10 sorts before epoch-q-9): order by the
    * manifest file's modification time. Rename preserves mtime, so
    * the timestamp is the manifest WRITE, which the committer renames
    * within the same driver call — commit order for any sequential
    * committer, and within the race window for genuinely concurrent
    * ones (where no order is more correct). Coarse-granularity
    * filesystems (1 s object-store shims) tie consecutive epochs of
    * one writer, so the tie-break must NOT be plain lexical (that
    * re-inverts epoch-10 < epoch-9): break ties numerically on a
    * trailing integer when prefixes match, then by name. UUID-named
    * BATCH manifests tied within one timestamp granule stay arbitrary
    * — their names carry no order to recover; the numeric case (one
    * writer's sequential epochs, the continuous-append shape
    * compaction exists for) is the one that must hold.
    */
  private[sources] def orderedLiveManifests(path: String, conf: Configuration): Seq[String] = {
    val live = ContentStore.effectiveManifestNames(path, conf).toSet
    if (live.isEmpty) return Seq.empty
    val (filesystem, root) = ContentStore.fs(path, conf)
    filesystem
      .listStatus(new Path(root, "_manifest"))
      .filter(st => live(st.getPath.getName))
      .sortBy { st =>
        val n = st.getPath.getName
        val (prefix, num) = n.lastIndexOf('-') match {
          case i if i >= 0 =>
            n.drop(i + 1).toLongOption.filter(_ >= 0).map((n.take(i), _)).getOrElse((n, -1L))
          case _ => (n, -1L)
        }
        (st.getModificationTime, prefix, num, n)
      }
      .map(_.getPath.getName)
      .toSeq
  }

  private def compactionName(sources: Seq[String]): String = {
    val digest = MessageDigest.getInstance("SHA-256")
      .digest(sources.mkString("\n").getBytes(StandardCharsets.UTF_8))
    "compact-" + digest.take(8).map("%02x".format(_)).mkString
  }

  private[sources] def compactionPlan(
      path: String,
      keepLast: Int,
      conf: Configuration
  ): Option[(Seq[String], String)] = {
    // an empty or brand-new store (manifestNames already guards the
    // missing directory) has nothing to compact — None like every
    // other nothing-to-do path. keepLast protects the hot tail an
    // active consumer is about to read.
    val sources = orderedLiveManifests(path, conf).dropRight(keepLast)
    if (sources.size < 2) return None
    Some((sources, compactionName(sources)))
  }

  /** [[compactionPlan]] for an EXPLICIT re-layout request
    * (cluster/z-order): a single live manifest is still a valid
    * source — the post-OPTIMIZE state is exactly where a layout
    * rebuild is most wanted, and "nothing to fold" must not silently
    * skip the rebuild the caller asked for. Plain compaction keeps
    * the ≥2 rule (rewriting one right-sized manifest into itself is
    * pure write amplification).
    */
  private[sources] def relayoutPlan(
      path: String,
      keepLast: Int,
      conf: Configuration
  ): Option[(Seq[String], String)] = {
    val sources = orderedLiveManifests(path, conf).dropRight(keepLast)
    if (sources.isEmpty) None else Some((sources, compactionName(sources)))
  }

  /** Size-aware OPTIMIZE policy — the small-file binpack (what Delta's
    * OPTIMIZE actually targets): continuous streaming ingest commits
    * ONE manifest per micro-batch, so a tailed store accretes
    * thousands of tiny epochs whose per-file open/seek overhead —
    * not data volume — comes to dominate every read. The plan walks
    * live manifests oldest-first (commit order), SKIPS any manifest
    * whose data already meets `targetBytes` (rewriting a right-sized
    * epoch is pure write amplification — the flaw of the
    * oldest-N plan on a store that mixes one big backfill with small
    * epochs), and greedily accumulates consecutive small ones until
    * the bin reaches `targetBytes`; a bin of ≥ 2 manifests compacts.
    * One bin per call — loop until None for a full pass; each bin is
    * its own atomic swap, so a half-finished pass leaves a valid
    * store. Size probing is one `getFileStatus` per candidate file,
    * and stops at the first full bin — O(small-manifest files), never
    * O(store).
    */
  private[sources] def smallCompactionPlan(
      path: String,
      targetBytes: Long,
      keepLast: Int,
      conf: Configuration
  ): Option[(Seq[String], String)] = {
    require(targetBytes > 0, "smallCompactionPlan: targetBytes must be positive")
    val (filesystem, root) = ContentStore.fs(path, conf)
    def bytesOf(m: String): Long =
      ContentStore.filesInManifest(path, m, conf).map { f =>
        try filesystem.getFileStatus(new Path(root, s"data/$f")).getLen
        catch { case _: java.io.FileNotFoundException => 0L }
      }.sum
    val ordered = orderedLiveManifests(path, conf).dropRight(keepLast)
    val bin     = Seq.newBuilder[String]
    var total   = 0L
    var n       = 0
    val it      = ordered.iterator
    while (it.hasNext && total < targetBytes) {
      val m = it.next()
      val b = bytesOf(m)
      if (b >= targetBytes) {
        // right-sized epoch: never rewrite it; a non-empty small bin
        // on its left still folds (consecutive-run rule keeps commit
        // order inside the replacement)
        if (n >= 2) total = targetBytes // close the bin
        else { bin.clear(); total = 0L; n = 0 }
      } else {
        bin += m; total += b; n += 1
      }
    }
    val sources = bin.result()
    if (sources.size < 2) None else Some((sources, compactionName(sources)))
  }

  /** Rewrite all but the newest `keepLast` live manifests into one
    * compaction manifest. Returns the new manifest name, or None if
    * fewer than two manifests would be compacted (nothing to gain).
    *
    * Bucketing is a LAYOUT fact of the store, read back from the
    * `_buckets` metadata the first bucketed commit recorded
    * ([[ContentStore.recordedBuckets]]) — maintenance preserves the
    * layout without every caller having to know it (a forgotten
    * parameter would silently rewrite a bucketed store unbucketed and
    * degrade every later storage-partitioned join to exchanges). The
    * explicit `buckets` override exists only for legacy bucketed
    * stores written before the metadata; passing a value that
    * CONTRADICTS recorded metadata throws.
    */
  def compactEpochs(
      spark: SparkSession,
      path: String,
      keepLast: Int = 0,
      buckets: Int = 0,
      targetBytes: Long = 0
  ): Option[String] = {
    val conf     = ContentStore.driverHadoopConf()
    val recorded = ContentStore.recordedBuckets(path, conf)
    require(buckets == 0 || recorded == 0 || buckets == recorded,
      s"compactEpochs(buckets=$buckets) contradicts the store's recorded bucket count $recorded")
    val effBuckets = if (buckets > 0) buckets else recorded
    // targetBytes > 0 switches the source selection to the small-file
    // binpack (smallCompactionPlan — one bin per call, loop for a full
    // pass); 0 keeps the fold-all-but-keepLast plan
    val plan =
      if (targetBytes > 0) smallCompactionPlan(path, targetBytes, keepLast, conf)
      else if (buckets > 0 && recorded == 0)
        // explicit bucket ADOPTION on a legacy unbucketed store is a
        // re-layout request: a single live manifest still rewrites
        // (the columnar clusterBy/zorderBy rule) — "nothing to fold"
        // must not silently skip the migration the caller asked for
        relayoutPlan(path, keepLast, conf)
      else compactionPlan(path, keepLast, conf)
    plan.map { case (sources, name) =>
      val src = spark.read
        .format("graft.sources.ContentStore")
        .option("path", path)
        .option("manifests", sources.mkString(","))
        .load()
      val writer = src.write
        .format("graft.sources.ContentStore")
        .option("path", path)
        .option("manifestName", name)
        .option("compactSources", sources.mkString(","))
        .mode("append")
      (if (effBuckets > 0) writer.option("buckets", effBuckets) else writer).save()
      name
    }
  }

  /** K-V → COLUMNAR store migration (r17, VERDICT-r16 item 3) — the
    * conversion path B78's OPTIMIZE opened but never closed: a K-V
    * store that grew into the measured 2.5×-slower payload
    * (IndexPayloadBench, C22f row) previously had no exit except a
    * manual read/re-append. One-format-per-store enforcement is
    * UNTOUCHED: the source stays K-V (still readable, still marked),
    * the destination is a NEW columnar store — migration is a copy
    * plus an equivalence gate, never an in-place rewrite.
    *
    * Shape: the source snapshot is pinned with a LEASE for the
    * migration window (a concurrent vacuum cannot reclaim shadowed
    * manifests mid-copy; the lease is released in the finally —
    * pre-existing consumer pins are never touched), then each source
    * manifest becomes ONE columnar epoch under the deterministic name
    * `migrate-<source manifest>`: a crashed-and-rerun migration
    * replays into the idempotent already-committed path (its replayed
    * parquet parts are dropped, exactly the streaming-epoch rule) and
    * converges on the same destination state. A destination holding
    * manifests from anything OTHER than this source snapshot is
    * refused — re-running after the SOURCE was compacted would
    * otherwise double-land the rows under new names beside the old
    * (use a fresh destination after source maintenance).
    *
    * `verify = true` (the default) gates the copy before returning:
    * equal row counts and an empty multiset difference between the
    * pinned source read and the migrated epochs. Bucketing is NOT
    * carried: the columnar surface has no bucketed read, so a bucketed
    * source migrates as plain rows (document the SPJ loss at the call
    * site) — but `clusterBy = (column, parts)` hands the destination
    * the columnar surface's OWN access path instead: each migrated
    * epoch is range-clustered on the key so its recorded footer bounds
    * are tight and key-scoped reads plan O(covering files) (B65b) from
    * the first read — the migration is the one moment the whole store
    * is rewritten anyway, so clustering it costs one extra range
    * shuffle per epoch and nothing later. `dataShards` seeds the
    * destination's listing layout.
    *
    * Returns the destination manifest names in source order — the pin
    * to publish for readers of the migrated asset.
    */
  def migrateToColumnar(
      spark: SparkSession,
      sourceDir: String,
      destDir: String,
      pinTtlMs: Long = 60 * 60 * 1000L,
      verify: Boolean = true,
      dataShards: Int = 0,
      clusterBy: Option[(String, Int)] = None
  ): Seq[String] = {
    val conf = ContentStore.driverHadoopConf()
    if (ContentStore.recordedFormat(sourceDir, conf).contains("parquet"))
      throw new IllegalStateException(
        s"migrateToColumnar: $sourceDir is already a columnar store")
    val lease = acquirePin(sourceDir, s"migrate-${UUID.randomUUID()}", pinTtlMs, conf)
    try {
      val names    = lease.manifests
      val expected = names.map(m => s"migrate-$m").toSet
      val alien    = ContentStore.manifestNames(destDir, conf).filterNot(expected)
      if (alien.nonEmpty)
        throw new IllegalStateException(
          s"migrateToColumnar: destination $destDir holds manifests not from this " +
            s"source snapshot (${alien.take(3).mkString(", ")}…) — use a fresh destination")
      val out = names.map { m =>
        val epoch = spark.read
          .format("graft.sources.ContentStore")
          .option("path", sourceDir)
          .option("manifests", m)
          .load()
        val laid = clusterBy.fold(epoch) { case (c, parts) =>
          import org.apache.spark.sql.functions.col
          epoch.repartitionByRange(parts, col(c)).sortWithinPartitions(c)
        }
        ParquetEpochs.append(laid, destDir, Some(s"migrate-$m"), dataShards = dataShards)
      }
      if (verify && names.nonEmpty) {
        val src = spark.read
          .format("graft.sources.ContentStore")
          .option("path", sourceDir)
          .option("manifests", names.mkString(","))
          .load()
        val dst  = ParquetEpochs.read(spark, destDir, out)
        val srcN = src.count()
        val dstN = dst.count()
        if (srcN != dstN || !src.exceptAll(dst).isEmpty)
          throw new IllegalStateException(
            s"migrateToColumnar: equivalence check failed ($srcN source vs $dstN migrated rows)")
      }
      out
    } finally releasePin(sourceDir, lease.id, conf)
  }

  /** Outcome of one [[deleteKeys]] pass. `manifest` is the committed
    * replacement manifest (None = no live row matched — nothing
    * committed, store untouched); `deletedRows` the rows removed from
    * the live snapshot; the three file counts say how the affected
    * manifests' files fared: rewritten without their matches, dropped
    * entirely (every row matched), or carried into the replacement BY
    * NAME untouched.
    */
  final case class DeleteReport(
      manifest: Option[String],
      deletedRows: Long,
      rewrittenFiles: Int,
      droppedFiles: Int,
      carriedFiles: Int)

  /** Record-level DELETE on a K-V store — the right-to-be-forgotten
    * primitive a 100 TB training corpus needs (remove these document
    * keys everywhere) without rewriting the store: copy-on-write at
    * FILE granularity on the existing shadowing protocol, the shape of
    * Delta's DELETE.
    *
    *  1. PLAN — candidate files are pruned twice before any data read:
    *     by the `_stats` key-range sidecars (a file whose [min,max]
    *     covers no target key is skipped) and, on a bucketed store, by
    *     the key hash (file `b<i>-*` can only hold keys of bucket i).
    *     On a key-clustered store the rewrite set is O(covering
    *     files), not O(store).
    *  2. REWRITE — one distributed pass, one task per candidate file:
    *     stream the line format, drop rows whose key is in the
    *     broadcast delete set, stage + rename a replacement file
    *     (bucket prefix preserved, so KeyGroupedPartitioning and the
    *     shuffle-free bucketed join survive the delete). A candidate
    *     that held NO target key discards its staging and is carried
    *     untouched; a file whose every row matched is dropped.
    *  3. COMMIT — ONE replacement manifest (`delete-<hash>`,
    *     deterministic over affected sources + key set) lists the
    *     rewritten files plus every untouched file of the affected
    *     manifests BY NAME (writeManifest's carry path: no data moves,
    *     vacuum's survivor diff keeps carried files live), with a
    *     `_compacted/` sidecar shadowing the affected manifests —
    *     readers swap atomically at the rename, exactly the OPTIMIZE
    *     protocol. Unaffected manifests are not touched at all.
    *
    * Semantics are POINT-IN-TIME: the delete applies to the current
    * effective snapshot; a key re-appended later is live again. Pinned
    * pre-delete snapshots still read the original rows until vacuum's
    * grace expires the shadowed sources (time travel is the feature —
    * an RTBF purge is only complete after the retention grace, the
    * same contract as Delta's deletedFileRetentionDuration). A
    * streaming tail that already consumed an affected manifest is
    * unaffected (exactly-once holds: the replacement's carried names
    * emit nothing for it); a tail lagging BEHIND the delete may still
    * see deleted rows from not-yet-consumed shadowed sources, bounded
    * by the same grace.
    *
    * The delete set is BROADCAST (the deletion-vector trade: an RTBF
    * batch is ~10⁶ keys ≈ tens of MB, dwarfed by the corpus); batch a
    * larger purge into multiple calls. Crash before the manifest
    * rename leaves only unreferenced rewritten files — vacuum sweeps
    * them; a rerun converges. Maintenance ops on one store are
    * caller-serialized (the compactEpochs contract).
    *
    * `excludeManifests` scopes the delete to the effective snapshot
    * MINUS those manifests — the [[upsert]] hook: the just-appended
    * version epoch must not have its own rows purged.
    */
  def deleteKeys(
      spark: SparkSession,
      path: String,
      keys: Seq[String],
      excludeManifests: Set[String] = Set.empty
  ): DeleteReport = {
    val conf = ContentStore.driverHadoopConf()
    ContentStore.recordedFormat(path, conf).foreach { fmt =>
      throw new IllegalStateException(
        s"deleteKeys: store $path holds '$fmt'-format data files — use ParquetEpochs.deleteWhere")
    }
    val keySet = keys.toSet
    planKvPurgeSeq(spark, path, keySet, excludeManifests) match {
      case None => DeleteReport(None, 0L, 0, 0, 0)
      case Some(p) =>
        val keySorted = keySet.toArray
          .map(org.apache.spark.unsafe.types.UTF8String.fromString)
          .sortWith(_.compareTo(_) < 0)
        val digest = MessageDigest.getInstance("SHA-256")
        digest.update(p.affected.mkString("\n").getBytes(StandardCharsets.UTF_8))
        keySorted.foreach { k => digest.update(0.toByte); digest.update(k.getBytes) }
        val name = "delete-" + digest.digest().take(8).map("%02x".format(_)).mkString
        ContentStoreWrite.writeManifest(
          path,
          name,
          p.newMsgs,
          conf,
          idempotent = true,
          compactSources = Some(p.affected),
          buckets = ContentStore.recordedBuckets(path, conf),
          dataShards = ContentStore.recordedDataShards(path, conf),
          carryMessages = p.carryMsgs
        )
        DeleteReport(Some(name), p.deleted, p.rewrittenFiles, p.droppedFiles, p.carriedFiles)
    }
  }

  /** PLAN + LOCATE + REWRITE legs of the driver-Seq K-V purge — the
    * Seq twin of [[planKvPurgeFrame]], returning the same
    * staged-but-uncommitted [[KvPurgePlan]]. The key set lives on the
    * driver (bounds pruning is a binary search per candidate, zero
    * Spark jobs) and locate+rewrite fuse into ONE broadcast job over
    * the candidates — the minimum-job shape small batches want;
    * [[upsert]] picks it adaptively under
    * [[KvSeqPurgeMaxStagedBytes]]. Commits nothing. None = no live
    * row matched.
    */
  private def planKvPurgeSeq(
      spark: SparkSession,
      path: String,
      keySet: Set[String],
      excludeManifests: Set[String]
  ): Option[KvPurgePlan] = {
    val conf = ContentStore.driverHadoopConf()
    val live = ContentStore.effectiveManifestNames(path, conf).filterNot(excludeManifests)
    if (keySet.isEmpty || live.isEmpty) return None
    val buckets = ContentStore.recordedBuckets(path, conf)
    val shards  = ContentStore.recordedDataShards(path, conf)
    // candidate pruning runs in UTF8String (binary UTF-8) order — the
    // SAME total order the writers recorded the bounds in; Java
    // String's UTF-16 order would disagree on supplementary characters
    // and could prune a file that holds a target key
    val keySorted = keySet.toArray
      .map(org.apache.spark.unsafe.types.UTF8String.fromString)
      .sortWith(_.compareTo(_) < 0)
    def anyKeyIn(
        mn: org.apache.spark.unsafe.types.UTF8String,
        mx: org.apache.spark.unsafe.types.UTF8String): Boolean = {
      var lo = 0; var hi = keySorted.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (keySorted(mid).compareTo(mn) < 0) lo = mid + 1 else hi = mid
      }
      lo < keySorted.length && keySorted(lo).compareTo(mx) <= 0
    }
    val filesByManifest = live.map(m => m -> ContentStore.filesInManifest(path, m, conf))
    val statsByFile     = live.flatMap(m => ContentStore.statsForManifest(path, m, conf)).toMap
    val keyBuckets      = if (buckets > 0) keySet.map(ContentStore.bucketOf(_, buckets)) else Set.empty[Int]
    def candidate(f: String): Boolean = {
      val bucketOk = buckets <= 0 ||
        ContentStore.bucketOfFile(ContentStore.baseName(f)).forall(keyBuckets)
      bucketOk && (statsByFile.get(f) match {
        case Some((mn, mx)) => anyKeyIn(mn, mx)
        case None           => true // no recorded bounds: never skip
      })
    }
    val candidates = filesByManifest.flatMap(_._2).distinct.filter(candidate)
    if (candidates.isEmpty) return None
    val sconf  = new SerializableConfiguration(conf)
    val bcKeys = spark.sparkContext.broadcast(keySet)
    val slices = math.max(1, math.min(candidates.size, spark.sparkContext.defaultParallelism))
    val results =
      try spark.sparkContext
        .parallelize(candidates, slices)
        .map(f => rewriteWithoutKeys(path, f, shards, bcKeys.value, sconf.value, buckets))
        .collect()
      finally bcKeys.destroy()
    val byFile = results.map(r => r.file -> r).toMap
    val affected = filesByManifest.collect {
      case (m, fs) if fs.exists(f => byFile.get(f).exists(_.dropped > 0)) => m
    }
    if (affected.isEmpty) return None
    val carryMsgs  = Array.newBuilder[org.apache.spark.sql.connector.write.WriterCommitMessage]
    val newMsgs    = Array.newBuilder[org.apache.spark.sql.connector.write.WriterCommitMessage]
    var rewrittenN = 0; var droppedN = 0; var carriedN = 0
    affected.foreach { m =>
      ContentStore.filesInManifest(path, m, conf).foreach { f =>
        byFile.get(f) match {
          case Some(r) if r.dropped > 0 && r.newFile.isDefined =>
            newMsgs += StoreCommitMsg(r.newFile.get, r.kept, r.minKey.orNull, r.maxKey.orNull)
            rewrittenN += 1
          case Some(r) if r.dropped > 0 => // every row matched: file vanishes
            droppedN += 1
          case _ => // untouched: carried by NAME, old bounds re-recorded
            // (rows is a >0 marker only — carried counts are unknown
            // without reading the file, and nothing consumes the value)
            val st = statsByFile.get(f)
            carryMsgs += StoreCommitMsg(f, 1L, st.map(_._1.toString).orNull, st.map(_._2.toString).orNull)
            carriedN += 1
        }
      }
    }
    Some(KvPurgePlan(
      results.map(_.dropped).sum,
      newMsgs.result(),
      carryMsgs.result(),
      affected,
      rewrittenN, droppedN, carriedN,
      // driver twin of the frame form's fingerprint aggregate —
      // identical values (xxhash64 seed 42 over UTF-8 bytes), never
      // a Spark job; thunked like the frame form's so no caller pays
      // for a fingerprint it doesn't use
      () => {
        var x = 0L
        keySorted.foreach { k =>
          x ^= org.apache.spark.sql.catalyst.expressions.XXH64
            .hashUnsafeBytes(k.getBaseObject, k.getBaseOffset, k.numBytes, 42L)
        }
        s"${keySorted.length}:$x"
      }))
  }

  /** Convenience form of the DataFrame-valued [[deleteKeys]]: whole
    * effective snapshot, AQE-chosen join strategy.
    */
  def deleteKeys(
      spark: SparkSession,
      path: String,
      keys: org.apache.spark.sql.DataFrame
  ): DeleteReport = deleteKeys(spark, path, keys, Set.empty[String], None)

  /** DataFrame-valued DELETE on a K-V store — [[deleteKeys]] with the
    * key set as a FRAME instead of a driver Seq, for purge sets beyond
    * driver memory (the nightly re-crawl shape: 20% of a 100 TB
    * corpus's keys is tens of GB of strings — a Seq, a driver Set, or
    * a broadcast all hit the same ceiling). Same copy-on-write
    * protocol, same report, same point-in-time/pin/tail/vacuum
    * semantics as the Seq form; the three legs differ only in WHERE
    * the key set lives:
    *
    *  1. PLAN — the key frame joins against the broadcast `_stats`
    *     bounds map (one row per candidate file: [min,max] key range
    *     plus the bucket id on bucketed stores), and only matching
    *     FILE NAMES return to the driver — O(candidate files), never
    *     O(keys). Files without recorded bounds or bucket are
    *     unconditional candidates (the never-skip rule).
    *  2. LOCATE — one distributed pass over the candidates' keys,
    *     LEFT SEMI joined with the key frame, gives per-file match
    *     counts (O(matched files) to the driver); match-free
    *     candidates are carried untouched, exactly the columnar
    *     twin's locate rule.
    *  3. REWRITE — matched files' survivors drop via a LEFT ANTI join
    *     (broadcast or shuffle-hash — AQE picks; `broadcastKeys` is
    *     the explicit escape hatch, `Some(false)` forcing the
    *     shuffle path when the key set must never materialize on the
    *     driver, `Some(true)` forcing broadcast when it is known
    *     small), then hash-route BY SOURCE FILE so each file's run
    *     streams to one staged replacement with the bucket prefix
    *     preserved. The shuffle of matched files' survivors is the
    *     price of a non-broadcastable key set — bounded by the files
    *     the delete touches, not the store.
    *
    * The replacement manifest's deterministic hash covers the affected
    * sources plus an order-independent key-set fingerprint
    * (count + sum of xxhash64), computed as one tiny aggregate —
    * the Seq form's sorted-key digest without enumerating keys on the
    * driver. NULL keys in the frame are ignored; duplicate keys
    * dedupe. The frame must have exactly one string column.
    */
  def deleteKeys(
      spark: SparkSession,
      path: String,
      keys: org.apache.spark.sql.DataFrame,
      excludeManifests: Set[String],
      broadcastKeys: Option[Boolean]
  ): DeleteReport =
    planKvPurgeFrame(spark, path, keys, excludeManifests, broadcastKeys) match {
      case None => DeleteReport(None, 0L, 0, 0, 0)
      case Some(p) =>
        val conf = ContentStore.driverHadoopConf()
        // deterministic name without enumerating keys on the driver:
        // affected sources + the order-independent key-set fingerprint
        val digest = MessageDigest.getInstance("SHA-256")
        digest.update(p.affected.mkString("\n").getBytes(StandardCharsets.UTF_8))
        digest.update(0.toByte)
        digest.update(p.keyFingerprint().getBytes(StandardCharsets.UTF_8))
        val name = "delete-" + digest.digest().take(8).map("%02x".format(_)).mkString
        ContentStoreWrite.writeManifest(
          path,
          name,
          p.newMsgs,
          conf,
          idempotent = true,
          compactSources = Some(p.affected),
          buckets = ContentStore.recordedBuckets(path, conf),
          dataShards = ContentStore.recordedDataShards(path, conf),
          carryMessages = p.carryMsgs
        )
        DeleteReport(Some(name), p.deleted, p.rewrittenFiles, p.droppedFiles, p.carriedFiles)
    }

  /** One planned-and-STAGED-but-uncommitted K-V purge: the rewrite leg
    * already ran (replacement files renamed into `data/`, unreferenced
    * until some manifest lists them — vacuum sweeps them if never
    * committed), the commit has not. The caller either commits it as
    * its own `delete-<hash>` replacement ([[deleteKeys]]) or folds the
    * messages into a bigger atomic commit ([[upsert]]'s
    * single-manifest swap).
    */
  private final case class KvPurgePlan(
      deleted: Long,
      newMsgs: Array[org.apache.spark.sql.connector.write.WriterCommitMessage],
      carryMsgs: Array[org.apache.spark.sql.connector.write.WriterCommitMessage],
      affected: Seq[String],
      rewrittenFiles: Int,
      droppedFiles: Int,
      carriedFiles: Int,
      keyFingerprint: () => String)

  /** PLAN + LOCATE + REWRITE legs of the DataFrame-valued K-V purge
    * (scaladoc on the public frame [[deleteKeys]] overload). Commits
    * nothing. None = no live row matched.
    */
  private def planKvPurgeFrame(
      spark: SparkSession,
      path: String,
      keys: org.apache.spark.sql.DataFrame,
      excludeManifests: Set[String],
      broadcastKeys: Option[Boolean]
  ): Option[KvPurgePlan] = {
    import org.apache.spark.sql.functions.{broadcast, count, expr, udf}
    val conf = ContentStore.driverHadoopConf()
    ContentStore.recordedFormat(path, conf).foreach { fmt =>
      throw new IllegalStateException(
        s"deleteKeys: store $path holds '$fmt'-format data files — use ParquetEpochs.deleteWhere")
    }
    require(
      keys.schema.fields.length == 1 &&
        keys.schema.fields(0).dataType == org.apache.spark.sql.types.StringType,
      s"deleteKeys: key frame must have exactly one STRING column, got ${keys.schema.catalogString}")
    val keyFrame = keys.toDF("__graft_key").where(col("__graft_key").isNotNull).distinct()
    def hinted(df: org.apache.spark.sql.DataFrame) = broadcastKeys match {
      case Some(true)  => broadcast(df)
      case Some(false) => df.hint("shuffle_hash")
      case None        => df
    }
    val live = ContentStore.effectiveManifestNames(path, conf).filterNot(excludeManifests)
    if (live.isEmpty) return None
    val buckets         = ContentStore.recordedBuckets(path, conf)
    val shards          = ContentStore.recordedDataShards(path, conf)
    val filesByManifest = live.map(m => m -> ContentStore.filesInManifest(path, m, conf))
    val statsByFile     = live.flatMap(m => ContentStore.statsForManifest(path, m, conf)).toMap
    val fileMeta = filesByManifest.flatMap(_._2).map { f =>
      // bucket prefixes are only MEANINGFUL on stores that record
      // buckets — on a plain store a random uuid name can spell
      // `b<digits>-...` and a phantom parse here would poison the
      // prune join with a NULL bucket comparison (falsely skipping
      // the file: rows the purge then silently misses — caught by the
      // CRUD property hammer). Same rule as the Seq path's candidate().
      val b  = if (buckets > 0) ContentStore.bucketOfFile(ContentStore.baseName(f)) else None
      val st = statsByFile.get(f)
      (f, st.map(_._1.toString).orNull, st.map(_._2.toString).orNull,
        b.map(Integer.valueOf).orNull)
    }
    // files with neither bounds nor a bucket prefix can never be
    // pruned — keep them out of the join (they would match EVERY key)
    val (prunable, unconditional) = fileMeta.partition(m => m._2 != null || m._4 != null)
    val joinCandidates: Seq[String] =
      if (prunable.isEmpty) Seq.empty
      else {
        import spark.implicits._
        // Spark string comparison IS UTF8String binary order — the
        // same total order the writers recorded the bounds in, so the
        // join-side prune can never disagree with the Seq form's
        val boundsDF = prunable.toDF("__f", "__mn", "__mx", "__bkt")
        val n        = buckets
        val probe =
          if (n > 0) {
            // codegen'd bucket derivation (KvBucketExpr) — same
            // MurmurHash3 implementation the writers route with,
            // inside whole-stage codegen instead of a Scala UDF
            import org.apache.spark.sql.graft.Bridge
            keyFrame.withColumn("__kb", Bridge.column(
              graft.functions.KvBucketExpr.KvBucket(Bridge.expr(col("__graft_key")), n)))
          } else keyFrame.withColumn("__kb", lit(null).cast("int"))
        probe
          .join(
            broadcast(boundsDF),
            (col("__mn").isNull ||
              (col("__graft_key") >= col("__mn") && col("__graft_key") <= col("__mx"))) &&
              (col("__bkt").isNull || col("__bkt") === col("__kb")),
            "inner")
          .select("__f").distinct().as[String].collect().toSeq
      }
    // .distinct matches the columnar twin (ParquetEpochs.planPurgeFrame):
    // a file listed by more than one effective manifest (or duplicated
    // carry lines in one) must be read ONCE — a doubled candidate would
    // double its deleted count and stage two replacement files that
    // duplicate the surviving rows
    val candidates = (unconditional.map(_._1) ++ joinCandidates).distinct
    if (candidates.isEmpty) return None
    val matchedPerFile = storeLines(spark, path, candidates, conf)
      .select("file", "key")
      .join(hinted(keyFrame), col("key") === col("__graft_key"), "left_semi")
      .groupBy("file").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    if (matchedPerFile.isEmpty) return None
    val matchedFiles = matchedPerFile.keySet
    val sconf        = new SerializableConfiguration(conf)
    val pathCopy     = path
    val shardsCopy   = shards
    val bucketsCopy  = buckets
    val rewrites = {
      import spark.implicits._
      storeLines(spark, path, matchedFiles.toSeq.sorted, conf)
        .join(hinted(keyFrame), col("key") === col("__graft_key"), "left_anti")
        .repartition(col("file"))
        .sortWithinPartitions("file", "idx")
        .select("file", "key", "line")
        .as[(String, String, String)]
        .mapPartitions { it =>
          // consecutive runs share a file (hash partitioning keeps a
          // file whole; the sort makes its rows adjacent): stream each
          // run to one staged replacement, bucket prefix preserved
          val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long, String, String, String)]
          var cur: String                                   = null
          var os: org.apache.hadoop.fs.FSDataOutputStream   = null
          var staging: Path                                 = null
          var newName: String                               = null
          var kept                                          = 0L
          var minK: org.apache.spark.unsafe.types.UTF8String = null
          var maxK: org.apache.spark.unsafe.types.UTF8String = null
          lazy val flRoot = ContentStore.fs(pathCopy, sconf.value)
          def flush(): Unit = if (cur != null) {
            os.close()
            val (fl, root) = flRoot
            if (!fl.rename(staging, new Path(root, s"data/$newName")))
              throw new java.io.IOException(s"deleteKeys: staging rename failed for $staging")
            out += ((cur, kept, newName, minK.toString, maxK.toString))
          }
          it.foreach { case (f, key, line) =>
            if (f != cur) {
              flush()
              cur = f; kept = 0L; minK = null; maxK = null
              val (fl, root) = flRoot
              val newBase =
                (if (bucketsCopy > 0) ContentStore.bucketOfFile(ContentStore.baseName(f))
                 else None) match {
                  case Some(b) => s"b$b-${UUID.randomUUID()}"
                  case None    => UUID.randomUUID().toString
                }
              newName = ContentStore.shardedName(newBase, shardsCopy)
              staging = new Path(root,
                s"data/${newName.take(newName.lastIndexOf('/') + 1)}" +
                  s".staging-${ContentStore.baseName(newName)}")
              fl.mkdirs(staging.getParent)
              os = fl.create(staging, false)
            }
            kept += 1
            val u = org.apache.spark.unsafe.types.UTF8String.fromString(key)
            if (minK == null || u.compareTo(minK) < 0) minK = u
            if (maxK == null || u.compareTo(maxK) > 0) maxK = u
            os.write(line.getBytes("UTF-8")); os.write('\n')
          }
          flush()
          out.iterator
        }
        .collect()
    }
    val rewrittenByFile = rewrites.map(r => r._1 -> r).toMap
    val affected = filesByManifest.collect {
      case (m, fs) if fs.exists(matchedFiles) => m
    }
    val carryMsgs  = Array.newBuilder[org.apache.spark.sql.connector.write.WriterCommitMessage]
    val newMsgs    = Array.newBuilder[org.apache.spark.sql.connector.write.WriterCommitMessage]
    var rewrittenN = 0; var droppedN = 0; var carriedN = 0
    affected.foreach { m =>
      ContentStore.filesInManifest(path, m, conf).foreach { f =>
        if (matchedFiles(f)) {
          rewrittenByFile.get(f) match {
            case Some((_, kept, newFile, mn, mx)) =>
              newMsgs += StoreCommitMsg(newFile, kept, mn, mx)
              rewrittenN += 1
            case None => // every row matched: file vanishes
              droppedN += 1
          }
        } else {
          val st = statsByFile.get(f)
          carryMsgs += StoreCommitMsg(f, 1L, st.map(_._1.toString).orNull, st.map(_._2.toString).orNull)
          carriedN += 1
        }
      }
    }
    Some(KvPurgePlan(
      matchedPerFile.values.sum,
      newMsgs.result(),
      carryMsgs.result(),
      affected,
      rewrittenN, droppedN, carriedN,
      // THUNKED: the fingerprint aggregate is a whole Spark job, and
      // only the frame deleteKeys' deterministic manifest name needs
      // it — upsert folds the plan into its own named commit and
      // must not pay for it
      () => {
        val fp = keyFrame.agg(count(lit(1)), expr("bit_xor(xxhash64(__graft_key))")).head()
        s"${fp.getLong(0)}:${if (fp.isNullAt(1)) 0L else fp.getLong(1)}"
      }))
  }

  /** The K-V payload's line format as a frame — (file, idx, key, line)
    * per non-empty line of the named data files, one read task per
    * file slice. `line` is the RAW stored line (re-writable verbatim);
    * `idx` preserves each file's original line order across a shuffle.
    * Backbone of the DataFrame-valued [[deleteKeys]] legs.
    */
  private[sources] def storeLines(
      spark: SparkSession,
      path: String,
      files: Seq[String],
      conf: Configuration
  ): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val sconf  = new SerializableConfiguration(conf)
    val slices = math.max(1, math.min(files.size, spark.sparkContext.defaultParallelism))
    spark
      .createDataset(spark.sparkContext.parallelize(files, slices).flatMap { f =>
        val (fl, root) = ContentStore.fs(path, sconf.value)
        val dec        = java.util.Base64.getDecoder
        val reader = new java.io.BufferedReader(
          new java.io.InputStreamReader(fl.open(new Path(root, s"data/$f")), "UTF-8"))
        new Iterator[(String, Long, String, String)] {
          private var idx              = 0L
          private var nextLine: String = advance()
          private def advance(): String = {
            var l = reader.readLine()
            while (l != null && l.isEmpty) l = reader.readLine()
            if (l == null) reader.close()
            l
          }
          override def hasNext: Boolean = nextLine != null
          override def next(): (String, Long, String, String) = {
            val line = nextLine
            val tab  = line.indexOf('\t')
            if (tab < 0)
              throw new java.io.IOException(
                s"storeLines: corrupt K-V line (no tab separator) in store $path data file $f")
            val key = new String(dec.decode(line.substring(0, tab)), "UTF-8")
            val row = (f, idx, key, line)
            idx += 1
            nextLine = advance()
            row
          }
        }
      })
      .toDF("file", "idx", "key", "line")
  }

  /** AGE-BASED EPOCH RETENTION — the Kafka-retention / rolling-window
    * shape: retire every live epoch whose COMMIT instant (manifest
    * mtime, the compactionPlan ordering fact) is at or before
    * `cutoffMs`, in one metadata-only commit. A rolling training
    * corpus ("last 90 days of crawl") expires whole epochs by age —
    * not a compaction (nothing is rewritten) and not a row delete
    * (no predicate): the replacement manifest lists NOTHING and its
    * `_compacted/` sidecar shadows the aged sources, so readers stop
    * seeing them at the rename, pinned pre-retention snapshots keep
    * reading them until vacuum's grace (the standard retention
    * contract), lagging tails drain them under the same grace, and
    * vacuum reclaims the data files once the grace passes. Zero data
    * I/O — the op is two directory listings and one manifest commit,
    * at any store size, on EITHER payload format (the manifest layer
    * is shared).
    *
    * Returns the retire manifest name, or None when nothing is old
    * enough. A rerun finds the retired sources already shadowed and
    * converges. Maintenance op, caller-serialized per store.
    */
  def expireEpochs(path: String, cutoffMs: Long): Option[String] = {
    val conf               = ContentStore.driverHadoopConf()
    val (filesystem, root) = ContentStore.fs(path, conf)
    val live               = ContentStore.effectiveManifestNames(path, conf).toSet
    if (live.isEmpty) return None
    val expired = filesystem
      .listStatus(new Path(root, "_manifest"))
      .filter(st => live(st.getPath.getName) && st.getModificationTime <= cutoffMs)
      .map(_.getPath.getName)
      .sorted
      .toSeq
    if (expired.isEmpty) return None
    val digest = MessageDigest.getInstance("SHA-256")
      .digest(expired.mkString("\n").getBytes(StandardCharsets.UTF_8))
    val name = "retire-" + digest.take(8).map("%02x".format(_)).mkString
    ContentStoreWrite.writeManifest(
      path,
      name,
      Array.empty,
      conf,
      idempotent = true,
      compactSources = Some(expired),
      buckets = ContentStore.recordedBuckets(path, conf),
      dataShards = ContentStore.recordedDataShards(path, conf)
    )
    Some(name)
  }

  /** B96: RESTORE — Delta's `RESTORE TABLE … TO TIMESTAMP AS OF` /
    * Iceberg's `rollback_to_snapshot`, the recovery verb after a bad
    * backfill: make the LIVE view equal the effective snapshot as of
    * `asOfMs`, in ONE replacement commit. METADATA-ONLY at any store
    * size: the as-of manifests' files are re-listed BY NAME (a
    * committed manifest still on disk implies vacuum has not reclaimed
    * its files — the referenced-file diff only sweeps what no
    * surviving manifest lists), their recorded `_stats` bounds are
    * HARVESTED from the as-of sidecars rather than re-derived, and the
    * one new manifest shadows every current live file-bearing manifest
    * — zero data I/O, zero file moves.
    *
    * History is preserved, not rewritten: time travel to the bad
    * interval still shows it (the restore is a new commit on top, the
    * Delta/Iceberg semantics), pins are untouched, and a later vacuum
    * reclaims the rolled-back epochs' files after the normal grace.
    *
    * Semantics and refusals:
    *  - no committed snapshot at or before `asOfMs` → refuse (there is
    *    nothing to restore TO — distinct from "restore to empty",
    *    which is expireEpochs' job);
    *  - live view already equals the as-of view → None (converged);
    *  - OCC both directions (the replace-all contract): a concurrent
    *    maintenance commit that shadowed a live manifest since
    *    planning refuses via the replaced-file check, a concurrent
    *    append refuses via the growth re-list — retry re-plans;
    *  - CHECK constraints validate the RESTORED files like any
    *    commit's new files: a constraint added after the as-of point
    *    that the old corpus violates refuses the rollback (the
    *    induction never admits a violating live store).
    *
    * Payload-shared: the manifest layer is common, so the K-V twin
    * rides the same commit (bucket layout re-recorded verbatim; stats
    * lines harvest textually for either format). Returns the restore
    * manifest, None when already converged. Maintenance op,
    * caller-serialized per store like compact/expire.
    */
  def rollbackToEpoch(path: String, asOfMs: Long): Option[String] = {
    val conf = ContentStore.driverHadoopConf()
    val asOf = ContentStore.snapshotManifestsAsOf(path, asOfMs)
    if (asOf.isEmpty)
      throw new IllegalArgumentException(
        s"rollbackToEpoch($asOfMs): no committed snapshot at or before the timestamp in " +
          s"$path — nothing to restore to (an intentional empty store is expireEpochs)")
    val live = ContentStore.effectiveManifestNames(path, conf)
    if (live.sorted == asOf.sorted) return None
    val files    = asOf.flatMap(m => ContentStore.filesInManifest(path, m, conf)).distinct
    val replaced = live.flatMap(m => ContentStore.filesInManifest(path, m, conf)).toSet
    Some(ParquetEpochs.commitReplacement(path, files, replaced,
      namePrefix = "restore-", refuseGrowth = true, statSources = asOf))
  }

  /** Outcome of one [[upsert]]: the committed version-epoch manifest
    * and the purge's [[DeleteReport]] (`purge.manifest` None = every
    * upserted key was NEW — a pure insert, nothing to purge).
    */
  final case class UpsertReport(epoch: String, purge: DeleteReport)

  /** [[upsert]]'s adaptive-path threshold: a staged version epoch at
    * or under this many bytes (driver file-status metadata, no read)
    * has its keys parsed on the driver and purges through the Seq
    * planner — the frame planner's join pipeline costs ~3 extra Spark
    * jobs of fixed overhead that dominate small nightly batches
    * (measured 3.6 s → Seq-path ~1.2 s at the sf0.1 gate), while 16 MB
    * of K-V lines bounds the driver key set to the same class the Seq
    * [[deleteKeys]] already contracts for (~10⁵-10⁶ keys).
    */
  private val KvSeqPurgeMaxStagedBytes: Long = 16L << 20

  /** Driver-side key parse of staged-but-unreferenced K-V files (the
    * [[upsert]] small-batch path — total bytes already bounded by
    * [[KvSeqPurgeMaxStagedBytes]]). Same line format/violation errors
    * as [[storeLines]].
    */
  private def readStagedKeys(
      fl: org.apache.hadoop.fs.FileSystem,
      root: Path,
      path: String,
      files: Seq[String]
  ): Set[String] = {
    val dec = java.util.Base64.getDecoder
    val out = Set.newBuilder[String]
    files.foreach { f =>
      val reader = new java.io.BufferedReader(
        new java.io.InputStreamReader(fl.open(new Path(root, s"data/$f")), "UTF-8"))
      try {
        var line = reader.readLine()
        while (line != null) {
          if (line.nonEmpty) {
            val tab = line.indexOf('\t')
            if (tab < 0)
              throw new java.io.IOException(
                s"upsert: corrupt K-V line (no tab separator) in store $path staged file $f")
            out += new String(dec.decode(line.substring(0, tab)), "UTF-8")
          }
          line = reader.readLine()
        }
      } finally reader.close()
    }
    out.result()
  }

  /** UPSERT (MERGE) on a K-V store: after it returns, the store holds
    * EXACTLY `versions`' row for each upserted key — the re-crawl /
    * re-score shape (tonight's fresher copy replaces every older
    * version, new keys just insert). SINGLE-COMMIT ATOMIC (r18,
    * closing the two-commit visibility window the r17 decomposition
    * documented): the version epoch's K-V files STAGE unreferenced
    * ([[stageKvFiles]]), the purge of the keys' older versions plans
    * and REWRITES against the current snapshot (also staged,
    * [[planKvPurgeFrame]] — all of the frame delete's pruning,
    * carry-forward, pin, tail and vacuum semantics), and ONE manifest
    * (`upsert-<epochId>`) lists epoch + rewrites + carried names with
    * its `_compacted/` sidecar shadowing the affected manifests — a
    * concurrent unpinned reader sees the store strictly before or
    * strictly after the merge at the rename, never both versions of a
    * key.
    *
    * `epochId` is the caller's batch identity (the nightly date — the
    * streaming-epoch contract): a rerun with the SAME id after any
    * crash converges — pre-commit crashes leave only unreferenced
    * staged files (vacuum sweeps; rerun redoes the work under the same
    * name), post-commit reruns lose the idempotent rename and their
    * replayed files are dropped (the purge plan excludes the epoch
    * itself, so a replay against the committed original purges
    * nothing). Upserts are maintenance ops, caller-serialized per
    * store; a concurrent maintenance commit that shadows the purge's
    * planned sources refuses at the manifest with
    * [[StoreCommitConflictException]] (re-run to converge). On a
    * bucketed store the version epoch adopts the recorded bucket
    * layout automatically. Keys are expected UNIQUE within one
    * `versions` batch (dedupe upstream — the CDC-compaction rule):
    * duplicate keys all land in the epoch and all survive the purge.
    */
  def upsert(
      spark: SparkSession,
      path: String,
      versions: org.apache.spark.sql.DataFrame,
      epochId: String
  ): UpsertReport = {
    require(epochId.matches("[A-Za-z0-9._-]+"), s"epochId must be [A-Za-z0-9._-]+, got: $epochId")
    val conf = ContentStore.driverHadoopConf()
    ContentStore.recordedFormat(path, conf).foreach { fmt =>
      throw new IllegalStateException(
        s"upsert: store $path holds '$fmt'-format data files — use ParquetEpochs.upsert")
    }
    val name    = s"upsert-$epochId"
    val buckets = ContentStore.recordedBuckets(path, conf)
    val shards  = ContentStore.recordedDataShards(path, conf)
    // 1. STAGE the version epoch's K-V files — data lands, nothing is
    //    referenced until the single manifest below
    val epochMsgs = stageKvFiles(versions, path, buckets, shards, conf)
    val stagedFiles = epochMsgs.flatMap {
      case m: StoreCommitMsg if m.rows > 0     => Seq(m.file)
      case StoreFilesCommitMsg(fs, n) if n > 0 => fs
      case _                                   => Seq.empty
    }
    // 2. the purge set reads back from the STAGED files (the read-back
    //    rule, moved pre-commit: purge == staged by construction, so a
    //    non-deterministic `versions` frame cannot desync the legs).
    //    Excluding `name` covers the replayed-after-commit case.
    //    ADAPTIVE (r19, the B82 bench fix): a small staged epoch —
    //    by total staged BYTES, known from driver metadata — parses
    //    its keys on the driver and takes the Seq planner (zero-job
    //    bounds pruning + ONE fused locate/rewrite job); past the
    //    threshold the key set stays a FRAME all the way into the
    //    purge planner, so a re-crawl cohort at corpus scale never
    //    lands on the driver. Same plan object, same single-manifest
    //    commit either way.
    val plan =
      if (stagedFiles.isEmpty) None
      else {
        val (fl, root) = ContentStore.fs(path, conf)
        val stagedBytes = stagedFiles.map(f =>
          fl.getFileStatus(new Path(root, s"data/$f")).getLen).sum
        if (stagedBytes <= KvSeqPurgeMaxStagedBytes)
          planKvPurgeSeq(spark, path,
            readStagedKeys(fl, root, path, stagedFiles.toSeq), Set(name))
        else planKvPurgeFrame(
          spark, path,
          storeLines(spark, path, stagedFiles.toSeq, conf).select("key"),
          Set(name), None)
      }
    // 3. ONE atomic manifest: epoch files + purge rewrites + carried
    //    names, shadowing the affected manifests — a concurrent
    //    unpinned reader sees the store strictly before or strictly
    //    after the merge, never both versions of a key (closes the
    //    two-commit visibility window the r17 decomposition had)
    ContentStoreWrite.writeManifest(
      path,
      name,
      epochMsgs ++ plan.fold(
        Array.empty[org.apache.spark.sql.connector.write.WriterCommitMessage])(_.newMsgs),
      conf,
      idempotent = true,
      compactSources = plan.map(_.affected).filter(_.nonEmpty),
      buckets = buckets,
      dataShards = shards,
      carryMessages = plan.fold(
        Array.empty[org.apache.spark.sql.connector.write.WriterCommitMessage])(_.carryMsgs)
    )
    UpsertReport(
      name,
      plan.fold(DeleteReport(None, 0L, 0, 0, 0)) { p =>
        DeleteReport(Some(name), p.deleted, p.rewrittenFiles, p.droppedFiles, p.carriedFiles)
      })
  }

  /** Stage `versions` as K-V line data files WITHOUT a manifest: the
    * connector's own writer kernels ([[StoreDataWriter]] /
    * [[BucketedStoreDataWriter]] — identical format, bounds and bucket
    * routing to every committed write) run per input partition over
    * the frame's InternalRows, each renaming its staged file into
    * `data/` at task end. The files stay UNREFERENCED (invisible,
    * vacuum-swept if never committed) until some manifest lists the
    * returned commit messages — the split that lets [[upsert]] land
    * its epoch and its purge in one atomic rename.
    */
  private def stageKvFiles(
      versions: org.apache.spark.sql.DataFrame,
      path: String,
      buckets: Int,
      shards: Int,
      conf: Configuration
  ): Array[org.apache.spark.sql.connector.write.WriterCommitMessage] = {
    val projected = versions.selectExpr(
      "CAST(result_key AS STRING) AS result_key", "CAST(payload AS STRING) AS payload")
    val sconf = new SerializableConfiguration(conf)
    projected.queryExecution.toRdd
      .mapPartitions { rows =>
        val w: org.apache.spark.sql.connector.write.DataWriter[
          org.apache.spark.sql.catalyst.InternalRow] =
          if (buckets > 0) new BucketedStoreDataWriter(path, 0, 1, buckets, sconf.value, shards)
          else new StoreDataWriter(path, 0, 1, sconf.value, shards)
        try {
          rows.foreach(w.write)
          Iterator.single(w.commit())
        } catch { case e: Throwable => w.abort(); throw e }
      }
      .collect()
  }

  /** STREAMING UPSERT for the K-V payload — [[graft.sources
    * .ParquetEpochs.streamingUpsert]]'s twin (see its scaladoc for the
    * CDC-apply semantics and replay-convergence argument): each
    * micro-batch of (result_key, payload) rows MERGES via [[upsert]]
    * under the (checkpoint-derived writer id, batchId) epoch identity.
    */
  def streamingUpsert(
      stream: org.apache.spark.sql.DataFrame,
      path: String,
      checkpoint: String,
      availableNow: Boolean = false
  ): org.apache.spark.sql.streaming.StreamingQuery = {
    val qualified = {
      val (fsys, _) = ContentStore.fs(checkpoint, ContentStore.driverHadoopConf())
      fsys.makeQualified(new Path(checkpoint)).toUri.toString.stripSuffix("/")
    }
    val writerId = MessageDigest.getInstance("SHA-256")
      .digest(qualified.getBytes(StandardCharsets.UTF_8)).take(6).map("%02x".format(_)).mkString
    val base = stream.writeStream
    (if (availableNow)
       base.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
     else base)
      .option("checkpointLocation", checkpoint)
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
          upsert(batch.sparkSession, path, batch.toDF(), s"$writerId-$batchId"): Unit
      }
      .start()
  }

  /** Per-file outcome of [[deleteKeys]]'s rewrite task. */
  private[sources] final case class FileRewrite(
      file: String,
      dropped: Long,
      kept: Long,
      newFile: Option[String],
      minKey: Option[String],
      maxKey: Option[String])

  /** Executor-side kernel of [[deleteKeys]]: stream ONE data file,
    * drop rows whose key is in the delete set, stage + rename the
    * replacement under a fresh name with the source's bucket prefix
    * preserved. No-match candidates discard their staging (the file
    * will be carried by name); a retried/speculative attempt's extra
    * rename lands an unreferenced file vacuum sweeps.
    */
  private[sources] def rewriteWithoutKeys(
      path: String,
      file: String,
      dataShards: Int,
      keys: Set[String],
      conf: Configuration,
      buckets: Int = 0
  ): FileRewrite = {
    import org.apache.spark.unsafe.types.UTF8String
    val (fl, root) = ContentStore.fs(path, conf)
    val src        = new Path(root, s"data/$file")
    val base       = ContentStore.baseName(file)
    // prefix only meaningful on bucketed stores (phantom-parse rule)
    val newBase = (if (buckets > 0) ContentStore.bucketOfFile(base) else None) match {
      case Some(b) => s"b$b-${UUID.randomUUID()}"
      case None    => UUID.randomUUID().toString
    }
    val newName = ContentStore.shardedName(newBase, dataShards)
    val staging = new Path(
      root,
      s"data/${newName.take(newName.lastIndexOf('/') + 1)}.staging-${ContentStore.baseName(newName)}")
    val dec     = java.util.Base64.getDecoder
    var dropped = 0L
    var kept    = 0L
    var minK: UTF8String = null
    var maxK: UTF8String = null
    val reader = new java.io.BufferedReader(new java.io.InputStreamReader(fl.open(src), "UTF-8"))
    var out: org.apache.hadoop.fs.FSDataOutputStream = null
    try {
      var line = reader.readLine()
      while (line != null) {
        if (line.nonEmpty) {
          val tab = line.indexOf('\t')
          if (tab < 0)
            throw new java.io.IOException(
              s"deleteKeys: corrupt K-V line (no tab separator) in store $path data file $file")
          val keyBytes = dec.decode(line.substring(0, tab))
          if (keys(new String(keyBytes, "UTF-8"))) dropped += 1
          else {
            kept += 1
            val u = UTF8String.fromBytes(keyBytes)
            if (minK == null || u.compareTo(minK) < 0) minK = u
            if (maxK == null || u.compareTo(maxK) > 0) maxK = u
            if (out == null) { fl.mkdirs(staging.getParent); out = fl.create(staging, false) }
            out.write(line.getBytes("UTF-8")); out.write('\n')
          }
        }
        line = reader.readLine()
      }
    } finally {
      reader.close()
      if (out != null) out.close()
    }
    if (dropped == 0L) {
      if (out != null) fl.delete(staging, false): Unit
      FileRewrite(file, 0L, kept, None, None, None)
    } else if (kept == 0L) {
      FileRewrite(file, dropped, 0L, None, None, None)
    } else {
      if (!fl.rename(staging, new Path(root, s"data/$newName")))
        throw new java.io.IOException(s"deleteKeys: staging rename failed for $staging")
      FileRewrite(file, dropped, kept, Some(newName), Some(minK.toString), Some(maxK.toString))
    }
  }

  /** One GC action taken by [[vacuum]]: what was deleted (or, for
    * `pinned_manifest_kept`, deliberately NOT deleted) and why.
    */
  final case class VacuumAction(kind: String, name: String)

  /** A pin LEASE: the retention contract made checkable. A consumer
    * that captures a snapshot for later time travel (a training run
    * pinning its corpus) writes a lease naming the manifests and an
    * expiry; [[vacuum]] refuses to expire a shadowed manifest any
    * unexpired lease names (reporting `pinned_manifest_kept` instead)
    * and sweeps the lease file itself once past its expiry
    * (`expired_lease`). Without this, the grace horizon is a
    * documented trade the operator must remember — the same reason
    * `_buckets` made the layout recorded metadata instead of a
    * trusted parameter.
    */
  final case class PinLease(id: String, expiresAtMs: Long, manifests: Seq[String])

  /** Write a pin lease (`_pins/<id>`: expiry millis, then one manifest
    * name per line; temp + rename like every store metadata write).
    * `manifests` defaults to the store's CURRENT effective snapshot —
    * the "snapshot and lease it" publish step. An EXPLICIT manifest
    * list is validated against the store's committed manifests (one
    * listing): naming a manifest that does not exist is refused HERE,
    * where the caller can still react, instead of deferred to a
    * `broken_pin` flag at the next vacuum (a lease can still BECOME
    * broken later — a pre-lease-era vacuum's deletions — which the
    * vacuum flag continues to catch). Shadowed compaction sources are
    * valid targets: pinning a pre-compaction snapshot is the feature.
    * Returns the lease.
    */
  def acquirePin(
      path: String,
      id: String,
      ttlMs: Long,
      hadoopConf: Configuration,
      manifests: Option[Seq[String]] = None
  ): PinLease = {
    require(id.matches("[A-Za-z0-9._-]+"), s"pin id must be [A-Za-z0-9._-]+, got: $id")
    manifests.foreach { names =>
      val committed = ContentStore.manifestNames(path, hadoopConf).toSet
      val missing   = names.filterNot(committed)
      require(missing.isEmpty,
        s"acquirePin($id): manifests not committed in $path: ${missing.mkString(", ")}")
    }
    val names = manifests.getOrElse(ContentStore.effectiveManifestNames(path, hadoopConf))
    val lease = PinLease(id, System.currentTimeMillis() + ttlMs, names)
    writeLease(path, lease, hadoopConf)
    lease
  }

  /** Extend a live lease's horizon to now + `ttlMs`, keeping its
    * manifest set — the long-training-run move that previously forced
    * over-provisioned TTLs (a run outliving its lease lost its
    * snapshot at the next vacuum). The lease must exist and be
    * unexpired: renewing an expired id is refused — its manifests may
    * already be vacuumed, so silently resurrecting the lease would
    * manufacture a broken pin; re-acquire (with validation) instead.
    * Renewal is a read-modify-rename of the lease file; like acquire/
    * release it is a CONSUMER op racing vacuum at most one lease-read
    * window (see [[vacuum]]'s pre-delete re-read).
    */
  def renewPin(path: String, id: String, ttlMs: Long, hadoopConf: Configuration): PinLease = {
    val existing = pins(path, hadoopConf).find(_.id == id).getOrElse(
      throw new IllegalArgumentException(s"renewPin($id): no such lease in $path"))
    val now = System.currentTimeMillis()
    if (existing.expiresAtMs <= now)
      throw new IllegalArgumentException(
        s"renewPin($id): lease expired at ${existing.expiresAtMs} (now $now) — its manifests " +
          "may already be vacuumed; re-acquire instead")
    val renewed = existing.copy(expiresAtMs = now + ttlMs)
    writeLease(path, renewed, hadoopConf)
    renewed
  }

  /** Temp + rename lease write. Rename REPLACES an existing target on
    * POSIX/HDFS (renewal in place); on a fail-on-existing filesystem
    * the fallback is delete + rename — a one-metadata-op window where
    * no lease file exists, acceptable for a consumer op already
    * covered by vacuum's pre-delete re-read.
    */
  private def writeLease(path: String, lease: PinLease, hadoopConf: Configuration): Unit = {
    val (fsys, root) = ContentStore.fs(path, hadoopConf)
    val pinsDir      = new Path(root, "_pins")
    fsys.mkdirs(pinsDir)
    val target = new Path(pinsDir, lease.id)
    val tmp    = new Path(pinsDir, s".tmp-${lease.id}-${UUID.randomUUID()}")
    val out    = fsys.create(tmp, false)
    try out.write((lease.expiresAtMs.toString +: lease.manifests).mkString("\n").getBytes("UTF-8"))
    finally out.close()
    if (!fsys.rename(tmp, target)) {
      fsys.delete(target, false): Unit
      if (!fsys.rename(tmp, target)) {
        fsys.delete(tmp, false): Unit
        throw new java.io.IOException(s"ContentStore: pin lease rename failed for ${lease.id}")
      }
    }
  }

  /** Drop a pin lease (the consumer finished early). Idempotent. */
  def releasePin(path: String, id: String, hadoopConf: Configuration): Unit = {
    val (fsys, root) = ContentStore.fs(path, hadoopConf)
    fsys.delete(new Path(root, s"_pins/$id"), false): Unit
  }

  /** All recorded pin leases (live and expired). One listing +
    * one small read per lease — lease count, never file count.
    *
    * Unlike compaction/vacuum, acquire/release/renew are CONSUMER
    * operations outside the single-maintenance-process contract, so a
    * lease listed here may be released (deleted) before its read — a
    * vanished lease is simply skipped, exactly what a just-released
    * pin means.
    */
  def pins(path: String, hadoopConf: Configuration): Seq[PinLease] = {
    val (fsys, root) = ContentStore.fs(path, hadoopConf)
    val pinsDir      = new Path(root, "_pins")
    if (!fsys.exists(pinsDir)) return Seq.empty
    fsys.listStatus(pinsDir).toSeq.map(_.getPath.getName).filterNot(_.startsWith(".")).sorted
      .flatMap { id =>
        try {
          val reader = new java.io.BufferedReader(
            new java.io.InputStreamReader(fsys.open(new Path(pinsDir, id)), "UTF-8"))
          val lines =
            try Iterator.continually(reader.readLine()).takeWhile(_ != null).filter(_.nonEmpty).toList
            finally reader.close()
          Some(PinLease(id, lines.headOption.flatMap(_.toLongOption).getOrElse(0L), lines.drop(1)))
        } catch {
          case _: java.io.FileNotFoundException => None // released between listing and read
        }
      }
  }

  /** Age-gated store GC. Deletes, in order:
    *
    *  1. `expired_manifest` — shadowed source manifests every
    *     referencing compaction of which is at least `graceMs` old
    *     (plus their `_stats/`/`_compacted/` sidecars); a manifest an
    *     UNEXPIRED pin lease names is kept and reported
    *     (`pinned_manifest_kept`) — the lease turns the retention
    *     contract into a checked invariant;
    *  2. `expired_lease` — pin leases past their own expiry (the
    *     lease's horizon, not the grace, is its gate); a LIVE lease
    *     naming a manifest that no longer exists is flagged
    *     `broken_pin` (`<id>:<manifest>`) — nothing to delete, but
    *     the consumer learns before its next read throws;
    *  3. `stale_tmp_manifest` — `.tmp-*` manifests older than grace
    *     (a crashed driver's unrenamed commit);
    *  4. `orphan_file` / `stale_staging` — `data/` files older than
    *     grace that no surviving manifest references (crashed-task
    *     staging, aborted attempts, expired sources' data);
    *  5. `stale_sidecar` — `_compacted/`/`_stats/` entries older than
    *     grace with no matching manifest (a crash between sidecar and
    *     manifest rename).
    *
    * The grace gate makes every step safe against in-flight writers:
    * a data file renamed by a committing task is unreferenced only
    * until its driver's manifest rename, which lands well inside any
    * production grace. `graceMs = 0` assumes a quiesced store.
    *
    * The referenced-file diff (step 4) runs as a SPARK JOB, never on
    * the driver: survivor manifests' lines and the `data/` listing are
    * two DataFrames and the deletion candidates are their left-anti
    * join, deleted where they are found (Delta VACUUM's shape). At a
    * 10⁹-blob store the referenced-file set is tens of GB — a
    * driver-resident Set would be the one scale-killer in an otherwise
    * metadata-bounded operation. Driver memory here is O(manifest
    * count) + O(deleted files) — the deleted names ARE the return
    * value, sized by garbage, not by the store. The `data/` listing
    * itself streams through one task (a flat directory has no
    * parallel listing; `listStatusIterator` pages it without ever
    * holding the full array).
    *
    * `dryRun = true` computes and returns the SAME actions without
    * deleting anything (Delta's `VACUUM ... DRY RUN`) — the operator's
    * "what would a grace of X reclaim, and is anything pinned" probe
    * before committing to a destructive pass.
    *
    * `reportCap` bounds the RETURNED per-file action names (deletion
    * itself is never capped): at a store with 10⁸ orphans the name
    * list would be the new O(garbage) driver residency the
    * distributed diff just removed, so names past the cap collapse
    * into one `swept_unreported` action carrying the exact remainder
    * count.
    */
  def vacuum(
      spark: SparkSession,
      path: String,
      graceMs: Long,
      hadoopConf: Configuration,
      dryRun: Boolean = false,
      reportCap: Int = 10000
  ): Seq[VacuumAction] = {
    val (fsys, root) = ContentStore.fs(path, hadoopConf)
    val now          = System.currentTimeMillis()
    def aged(st: FileStatus): Boolean = now - st.getModificationTime >= graceMs
    val out = Seq.newBuilder[VacuumAction]

    val manifestDir = new Path(root, "_manifest")
    val rawStatus: Seq[FileStatus] =
      if (fsys.exists(manifestDir)) fsys.listStatus(manifestDir).toIndexedSeq else Seq.empty
    val committed = rawStatus.filterNot(_.getPath.getName.startsWith("."))
    val names     = committed.map(_.getPath.getName)
    val nameSet   = names.toSet
    val mtime     = committed.map(st => st.getPath.getName -> st.getModificationTime).toMap

    // shadowed source -> the compactions that replaced it (still on
    // disk). Which manifests are compactions comes from ONE listing of
    // `_compacted/` — the same no-per-manifest-exists()-probe rule as
    // ContentStore.effectiveManifestNames; only actual compactions'
    // sidecars are then read.
    val compactedDir = new Path(root, "_compacted")
    val sidecarNames: Set[String] =
      if (fsys.exists(compactedDir))
        fsys.listStatus(compactedDir).map(_.getPath.getName).filterNot(_.startsWith(".")).toSet
      else Set.empty
    val referencing: Map[String, Seq[String]] = names
      .filter(sidecarNames)
      .flatMap(c => ContentStore.compactSourcesOf(path, c, hadoopConf).getOrElse(Seq.empty).map(_ -> c))
      .groupBy(_._1)
      .map { case (src, pairs) => src -> pairs.map(_._2) }
    val allLeases = pins(path, hadoopConf)
    val (liveLeases, deadLeases) = allLeases.partition(_.expiresAtMs > now)
    val pinned: Set[String] = liveLeases.flatMap(_.manifests).toSet
    val expirable: Set[String] = referencing.collect {
      case (src, compacts)
          if nameSet(src) && compacts.forall(c => mtime.get(c).exists(t => now - t >= graceMs)) =>
        src
    }.toSet
    // acquire/renew are consumer ops allowed to race this maintenance
    // pass: a lease landing between the entry snapshot above and the
    // destructive loop below would not be honored. Re-read `_pins`
    // immediately before deleting — one extra listing + lease-count
    // reads, narrowing the unprotected window to the delete loop
    // itself (a pin acquired INSIDE that window still needs the grace
    // horizon to cover its acquire latency, the documented contract).
    val latePinned: Set[String] =
      if (expirable.isEmpty) Set.empty
      else
        pins(path, hadoopConf).filter(_.expiresAtMs > now).flatMap(_.manifests).toSet -- pinned
    val allPinned = pinned ++ latePinned
    val expired   = expirable.filterNot(allPinned)
    // report every shadowed manifest a live lease saved from expiry —
    // the operator-visible "why is my store not shrinking" answer
    (expirable & allPinned).toSeq.sorted.foreach(m => out += VacuumAction("pinned_manifest_kept", m))
    // a LIVE lease naming a manifest that no longer exists is a broken
    // pin (leased after the fact, or vacuumed by a pre-lease-era run):
    // nothing can be un-deleted, but the consumer deserves a flag
    // before its next read throws
    liveLeases.foreach { l =>
      l.manifests.filterNot(nameSet).sorted.foreach { m =>
        out += VacuumAction("broken_pin", s"${l.id}:$m")
      }
    }
    expired.toSeq.sorted.foreach { m =>
      if (!dryRun) {
        fsys.delete(new Path(manifestDir, m), false): Unit
        fsys.delete(new Path(root, s"_stats/$m"), false): Unit
        fsys.delete(new Path(root, s"_compacted/$m"), false): Unit
      }
      out += VacuumAction("expired_manifest", m)
    }
    deadLeases.foreach { l =>
      if (!dryRun) fsys.delete(new Path(root, s"_pins/${l.id}"), false): Unit
      out += VacuumAction("expired_lease", l.id)
    }

    rawStatus.filter(st => st.getPath.getName.startsWith(".tmp-") && aged(st)).foreach { st =>
      if (!dryRun) fsys.delete(st.getPath, false): Unit
      out += VacuumAction("stale_tmp_manifest", st.getPath.getName)
    }

    // a crashed evolveSchema leaves its dot-prefixed staging file at
    // the store ROOT (`._schema-tmp-*`) — the one metadata temp not
    // living in a swept subdirectory; same age gate as every temp
    if (fsys.exists(root)) fsys.listStatus(root).foreach { st =>
      if (st.getPath.getName.startsWith("._schema-tmp-") && aged(st)) {
        if (!dryRun) fsys.delete(st.getPath, false): Unit
        out += VacuumAction("stale_sidecar", st.getPath.getName)
      }
    }

    // crashed columnar appends ([[ParquetEpochs.append]]) leave whole
    // `_staging/<uuid>/` directories; a staging dir's mtime stops
    // moving the moment its writer dies, so the age gate applies as-is
    val stagingRoot = new Path(root, "_staging")
    if (fsys.exists(stagingRoot)) fsys.listStatus(stagingRoot).foreach { st =>
      if (aged(st)) {
        if (!dryRun) fsys.delete(st.getPath, true): Unit
        out += VacuumAction("stale_staging", s"_staging/${st.getPath.getName}")
      }
    }

    val survivors = names.filterNot(expired)
    val dataDir   = new Path(root, "data")
    if (fsys.exists(dataDir)) {
      // the distributed referenced-file diff (scaladoc above): names
      // this listing misses are files landing AFTER the listing — all
      // younger than any production grace, spared by the mtime gate
      // exactly like the old driver-side walk
      import spark.implicits._
      val sconf       = new SerializableConfiguration(hadoopConf)
      val dry         = dryRun // serialized into the delete closure
      val dataDirStr  = dataDir.toString
      val cutoff      = now - graceMs
      val survivorPaths = survivors.map(m => new Path(root, s"_manifest/$m").toString)
      // survivor manifest lines read through the SAME serialized
      // caller conf as the listing and the deletes (spark.read.textFile
      // would resolve them with the SESSION's Hadoop conf — on a store
      // needing conf-specific FS settings the two could diverge)
      val referenced =
        (if (survivorPaths.isEmpty) spark.emptyDataset[String]
         else {
           val slices = math.max(
             1, math.min(survivorPaths.size, spark.sparkContext.defaultParallelism))
           spark.createDataset(
             spark.sparkContext.parallelize(survivorPaths, slices).flatMap { mp =>
               val p      = new Path(mp)
               val fl     = p.getFileSystem(sconf.value)
               val reader = new java.io.BufferedReader(
                 new java.io.InputStreamReader(fl.open(p), "UTF-8"))
               try Iterator.continually(reader.readLine()).takeWhile(_ != null).toList
               finally reader.close()
             })
         })
          .filter(_.nonEmpty)
          .toDF("name")
      // SHARDED listing: one task per recorded `s<k>/` shard plus one
      // for the top level, so the last serial leg of GC parallelizes —
      // at a 10⁹-blob store a single task paging one flat directory is
      // the bottleneck; with the store's recorded shard layout each
      // task pages only its own prefix. Task -1 (top level) emits the
      // legacy flat files, skips the recorded shard directories (each
      // owned by its task), and recurses INLINE into any unrecognized
      // subdirectory — files stranded by a racing first commit that
      // lost the `_datashards` record still enter the diff. Unsharded
      // stores plan exactly the old single task.
      val nShards = ContentStore.recordedDataShards(path, hadoopConf)
      val taskIds = (-1 until nShards).toSeq
      val listing = spark
        .createDataset(spark.sparkContext.parallelize(taskIds, taskIds.size))
        .flatMap { tid =>
          val dataDir = new Path(dataDirStr)
          val fl      = dataDir.getFileSystem(sconf.value)
          def page(d: Path, prefix: String, recurse: Boolean): Iterator[(String, Long)] =
            if (!fl.exists(d)) Iterator.empty
            else {
              val it = fl.listStatusIterator(d)
              Iterator
                .continually(())
                .takeWhile(_ => it.hasNext)
                .map(_ => it.next())
                .flatMap { st =>
                  val nm = st.getPath.getName
                  if (st.isDirectory) {
                    val owned = nm.startsWith("s") &&
                      nm.drop(1).toIntOption.exists(k => k >= 0 && k < nShards)
                    if (!owned && recurse) page(st.getPath, s"$prefix$nm/", recurse = false)
                    else Iterator.empty
                  } else Iterator.single((s"$prefix$nm", st.getModificationTime))
                }
            }
          if (tid < 0) page(dataDir, "", recurse = true)
          else page(new Path(dataDir, s"s$tid"), s"s$tid/", recurse = false)
        }
        .toDF("name", "mtime")
      spark.sparkContext.setJobGroup(
        VacuumJobGroup, s"vacuum $path: referenced-file diff", interruptOnCancel = false)
      // the return value must not become the new O(garbage) driver
      // residency the diff just removed: each partition deletes ALL
      // its candidates but reports at most `reportCap` names plus its
      // exact count; the driver keeps the global first `reportCap`
      // names and one overflow summary. Deletion is always complete —
      // only the REPORT is capped (Delta VACUUM reports a count for
      // the same reason).
      val cap = reportCap
      val perPartition =
        try
          listing
            .where(col("mtime") <= lit(cutoff))
            .join(referenced, Seq("name"), "left_anti")
            .select("name")
            .as[String]
            .mapPartitions { it =>
              // delete where found: the candidate set (∝ garbage) never
              // funnels through the driver just to issue deletes
              val fl    = new Path(dataDirStr).getFileSystem(sconf.value)
              var n     = 0L
              val names = scala.collection.mutable.ArrayBuffer.empty[String]
              it.foreach { f =>
                if (!dry) fl.delete(new Path(dataDirStr, f), false): Unit
                n += 1
                if (names.size < cap) names += f
              }
              Iterator.single((n, names.toSeq))
            }
            .collect()
        finally spark.sparkContext.clearJobGroup()
      val total    = perPartition.map(_._1).sum
      val reported = perPartition.flatMap(_._2).sorted.take(cap)
      reported.foreach { n =>
        // names are data/-relative (possibly `s<k>/`-prefixed) —
        // classify on the base name
        out += VacuumAction(
          if (ContentStore.baseName(n).startsWith(".staging-")) "stale_staging"
          else "orphan_file",
          n)
      }
      if (total > reported.length)
        out += VacuumAction("swept_unreported", (total - reported.length).toString)
    }

    // sidecars for manifests that no longer exist (crashed commits or
    // just-expired sources); a LIVE manifest's sidecars are never
    // touched — `_compacted/` entries are what lagging tails resolve.
    // `_pins/` gets only its `.tmp-*` sweep: lease ids are not manifest
    // names, so the no-matching-manifest rule must not apply to them.
    // the expired(n) clause is belt-and-braces for a real run (it only
    // fires if the expired step's own sidecar delete failed); in a dry
    // run those sidecars still exist but their removal is already
    // IMPLIED by the expired_manifest actions — reporting them here
    // too would make the plan claim more actions than the real run
    for (side <- Seq("_compacted", "_stats")) {
      val dir = new Path(root, side)
      if (fsys.exists(dir)) fsys.listStatus(dir).foreach { st =>
        val n = st.getPath.getName
        if ((n.startsWith(".tmp-") || !nameSet(n) || (!dryRun && expired(n))) && aged(st)) {
          if (!dryRun) fsys.delete(st.getPath, false): Unit
          out += VacuumAction("stale_sidecar", s"$side/$n")
        }
      }
    }
    // `_pins/`, `_constraints/` and `_keys/` get only their `.tmp-*`
    // sweep (a crashed lease write / constraint or key-fact add): their
    // names are not manifest names, so the no-matching-manifest rule
    // must not apply
    for (side <- Seq("_pins", "_constraints", "_keys")) {
      val dir = new Path(root, side)
      if (fsys.exists(dir)) fsys.listStatus(dir).foreach { st =>
        val n = st.getPath.getName
        if (n.startsWith(".tmp-") && aged(st)) {
          if (!dryRun) fsys.delete(st.getPath, false): Unit
          out += VacuumAction("stale_sidecar", s"$side/$n")
        }
      }
    }
    out.result()
  }
}
