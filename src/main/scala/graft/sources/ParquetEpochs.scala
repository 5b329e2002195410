package graft.sources

import java.util.UUID

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}

/** TYPED (columnar) epochs behind the ContentStore manifest protocol —
  * the payload-format variant for store assets whose rows are WIDE and
  * probed hot, measured against the K-V JSON shape by
  * [[graft.IndexPayloadBench]]: at 90k signature-index rows the
  * parquet read is ~2.5× faster end-to-end (0.57 s vs 1.42 s), and the
  * gap is the DATA FILE format (text K-V + base64 framing costs
  * 1.35 s before any parse; `from_json` itself adds only ~5%) — so a
  * nightly probe over the one asset that IS big at 100 TB pays 2.5×
  * for protocol uniformity unless the store can hold columnar files.
  *
  * This object makes it hold them WITHOUT forking the protocol: data
  * files are ordinary parquet parts living in the same `data/`
  * directory, committed by the same atomic manifest rename
  * ([[ContentStoreWrite.writeManifest]]), snapshot-pinned by the same
  * manifest names, compacted through the same `_compacted/` sidecar
  * shadowing ([[StoreLifecycle.compactionPlan]] picks sources;
  * [[compact]] does the columnar rewrite), and GC'd by the same
  * [[StoreLifecycle.vacuum]] — manifests list file names, so the
  * distributed referenced-file diff never cares what is inside them.
  * Pin leases apply unchanged.
  *
  * What a columnar store does NOT get (deliberately): the DSv2
  * `graft.sources.ContentStore` scan/tail — that reader decodes the
  * K-V line format and would garbage-decode parquet. One payload
  * format per store is ENFORCED, not trusted: the first columnar
  * append records `_format` = "parquet" (the `_buckets` rule), the
  * K-V surface refuses a marked store at table resolution, and
  * [[append]]/[[read]] refuse the inverse misuses. Batch probe assets
  * (the C22f signature index) are exactly the consumers that never
  * needed the streaming tail.
  *
  * Crash windows, all converging to the existing GC story: a crashed
  * write leaves `_staging/<uuid>/` (swept by vacuum's age gate);
  * files moved but manifest un-renamed are unreferenced `data/`
  * orphans (swept); a replayed compaction with the deterministic name
  * loses the rename idempotently and its files are dropped
  * (writeManifest's idempotent path).
  */
object ParquetEpochs {

  /** Append `df` as ONE manifest-committed columnar epoch; returns the
    * manifest name. Parts are staged by a normal distributed parquet
    * write under `_staging/<uuid>/`, renamed into `data/` under
    * collision-free names, and become visible only at the manifest
    * rename — readers see the whole epoch or none of it.
    *
    * `dataShards` (or the store's recorded `_datashards` layout, which
    * a caller omitting the parameter adopts) spreads the moved parts
    * across `s<k>/` subdirectories so maintenance listings parallelize
    * — see [[ContentStore.recordedDataShards]]; readers are unaffected
    * (manifests record the relative names).
    *
    * `carryFiles` are existing store data files this manifest re-lists
    * BY NAME without writing them — the [[deleteWhere]] carry-forward:
    * their footer stats are re-recorded under this manifest's sidecar
    * (the shadowed sources' sidecars die with them at vacuum) and they
    * are never deleted on the idempotent already-committed path.
    */
  def append(
      df: DataFrame,
      storeDir: String,
      manifestName: Option[String] = None,
      compactSources: Option[Seq[String]] = None,
      dataShards: Int = 0,
      carryFiles: Seq[String] = Nil
  ): String = {
    val conf         = ContentStore.driverHadoopConf()
    val (fsys, root) = ContentStore.fs(storeDir, conf)
    ensureFormat(storeDir, conf)
    ensureSchema(df.schema, storeDir, conf)
    val recordedShards = ContentStore.recordedDataShards(storeDir, conf)
    if (dataShards > 0 && recordedShards > 0 && dataShards != recordedShards)
      throw new IllegalStateException(
        s"ParquetEpochs: store $storeDir shards data files $recordedShards ways; " +
          s"this append used dataShards=$dataShards")
    val shards = if (dataShards > 0) dataShards else recordedShards
    val moved  = stageParts(df, shards, fsys, root)
    val name   = manifestName.getOrElse(s"batch-pq-${UUID.randomUUID()}")
    // carried files' bounds are immutable: copy their recorded lines
    // from the shadowed sources' sidecars; footer-read only the moved
    // parts and any carried file without a line (legacy sidecars)
    val (carryLines, covered) =
      if (carryFiles.isEmpty) (Nil, Set.empty[String])
      else harvestStats(fsys, root, compactSources.getOrElse(Seq.empty), carryFiles.toSet)
    writeFileStats(fsys, root, name,
      carryFiles.filterNot(covered) ++ moved, conf, extraLines = carryLines)
    val guard = new Constraints.CommitGuard(storeDir, moved, conf)
    ContentStoreWrite.writeManifest(
      storeDir,
      name,
      Array(StoreFilesCommitMsg(moved, moved.size.toLong)),
      conf,
      idempotent = manifestName.isDefined,
      compactSources = compactSources,
      dataShards = shards,
      carryMessages =
        if (carryFiles.isEmpty) Array.empty
        else Array(StoreFilesCommitMsg(carryFiles, carryFiles.size.toLong)),
      // B90 CHECK constraints, two-sided: this commit's NEW files must
      // satisfy every recorded constraint BEFORE the manifest can land
      // (carried files were validated by the commit that introduced
      // them), and the post-rename phase catches a constraint whose
      // publish landed inside the pre→rename gap (undoing the commit
      // — see Constraints.CommitGuard for the interleaving proof).
      beforeRename = guard.pre,
      afterRename = guard.post
    )
    name
  }

  /** Driver-side precondition for the row-level (COW) write path:
    * the store is columnar and the DML's write schema matches the
    * recorded signature — checked BEFORE any task stages a file.
    */
  private[sources] def requireWritable(
      storeDir: String,
      schema: org.apache.spark.sql.types.StructType): Unit = {
    val conf = ContentStore.driverHadoopConf()
    if (!ContentStore.recordedFormat(storeDir, conf).contains("parquet"))
      throw new IllegalStateException(
        s"row-level write: store $storeDir is not a columnar store")
    ensureSchema(schema, storeDir, conf)
  }

  /** Commit half of the row-level (COW) write — [[append]]'s manifest
    * leg for files the executors ALREADY staged into `data/`: one
    * manifest lists the new files, shadows every manifest containing
    * a replaced file, and carries those manifests' untouched files
    * (stats copied, not re-read — the deleteWhere commit shape).
    * OCC at replacement granularity: a replaced file that is no
    * longer in the live effective set means a concurrent maintenance
    * commit shadowed it between the DML's scan and this commit —
    * refuse with the retryable conflict (re-running the DML re-plans
    * from the current snapshot and converges); committing anyway
    * would resurrect the concurrently-rewritten rows.
    */
  private[graft] def commitReplacement(
      storeDir: String,
      newFiles: Seq[String],
      replacedFiles: Set[String],
      namePrefix: String = "cow-",
      refuseGrowth: Boolean = false,
      statSources: Seq[String] = Nil): String = {
    val conf            = ContentStore.driverHadoopConf()
    val (fsys, root)    = ContentStore.fs(storeDir, conf)
    val live            = ContentStore.effectiveManifestNames(storeDir, conf)
    val filesByManifest = live.map(m => m -> ContentStore.filesInManifest(storeDir, m, conf))
    val liveFiles       = filesByManifest.flatMap(_._2).toSet
    val gone            = replacedFiles.filterNot(liveFiles)
    if (gone.nonEmpty)
      throw new StoreCommitConflictException(
        s"row-level replacement on $storeDir: ${gone.size} scanned file(s) were " +
          s"shadowed by a concurrent maintenance commit (e.g. ${gone.head}) — " +
          "re-run the operation to re-plan from the current snapshot")
    val affected = filesByManifest.collect { case (m, fs) if fs.exists(replacedFiles) => m }
    val carried = affected.flatMap(m =>
      filesByManifest.toMap.apply(m).filterNot(replacedFiles))
    val digest = java.security.MessageDigest.getInstance("SHA-256")
    (affected ++ newFiles).foreach { s =>
      digest.update(s.getBytes("UTF-8")); digest.update(0.toByte)
    }
    val name = namePrefix + digest.digest().take(8).map("%02x".format(_)).mkString
    // carried files' bounds harvest from the shadowed sources; a
    // restore's "new" files are RE-LISTED existing files whose bounds
    // harvest from their original (statSources) manifests — only files
    // covered by neither pay a footer read
    val harvestable = carried.toSet ++ (if (statSources.nonEmpty) newFiles.toSet else Set.empty)
    val (carryLines, covered) =
      if (harvestable.isEmpty) (Nil, Set.empty[String])
      else harvestStats(fsys, root, (affected ++ statSources).distinct, harvestable)
    writeFileStats(fsys, root, name,
      (carried ++ newFiles).filterNot(covered), conf, extraLines = carryLines)
    val guard = new Constraints.CommitGuard(storeDir, newFiles, conf)
    ContentStoreWrite.writeManifest(
      storeDir,
      name,
      Array(StoreFilesCommitMsg(newFiles, newFiles.size.toLong)),
      conf,
      idempotent = true,
      compactSources = if (affected.isEmpty) None else Some(affected),
      buckets = ContentStore.recordedBuckets(storeDir, conf),
      dataShards = ContentStore.recordedDataShards(storeDir, conf),
      carryMessages =
        if (carried.isEmpty) Array.empty
        else Array(StoreFilesCommitMsg(carried, carried.size.toLong)),
      // B90 two-sided: a DML that SET a violating value refuses like a
      // bad append — validated immediately before AND after the rename
      // (the post phase undoes the commit on a constraint that
      // published inside the gap; see Constraints.CommitGuard).
      // refuseGrowth (replace-EVERYTHING commits — overwrite/rollback):
      // the shadowed-source OCC above only catches a live manifest that
      // VANISHED since planning; a plain concurrent append GROWS the
      // effective set instead, and surviving the replacement would make
      // the read-back "replacement + concurrent rows" instead of
      // exactly the replacement corpus. Re-list at the last moment and
      // refuse (retryable) when a file-bearing manifest appeared that
      // the plan never saw — same residual as every OCC-by-listing
      // check (the re-list→rename gap).
      beforeRename = () => {
        if (refuseGrowth) {
          val affectedSet = affected.toSet
          val grown = ContentStore.effectiveManifestNames(storeDir, conf)
            .filterNot(affectedSet)
            // a manifest a concurrent expire/undo deleted mid-check
            // cannot be file-bearing growth (the Constraints delta
            // check's FileNotFoundException rule) — without the guard
            // the commit dies on an opaque IO error instead of either
            // passing or the retryable conflict
            .filter(m =>
              (try ContentStore.filesInManifest(storeDir, m, conf)
              catch { case _: java.io.FileNotFoundException => Seq.empty[String] }).nonEmpty)
          if (grown.nonEmpty)
            throw new StoreCommitConflictException(
              s"replace-all commit on $storeDir: ${grown.size} file-bearing manifest(s) " +
                s"committed since planning (e.g. ${grown.head}) — the replacement would " +
                "silently drop their rows; re-plan from the current snapshot and retry")
        }
        guard.pre()
      },
      afterRename = guard.post
    )
    name
  }

  /** B92: INSERT OVERWRITE — atomic replace-table-contents in ONE
    * manifest rename: the replacement corpus stages unreferenced
    * ([[stageParts]]), then a single replacement manifest lists the
    * new files with its `_compacted/` sidecar shadowing EVERY live
    * file-bearing manifest (the [[commitReplacement]] shape with the
    * replaced set = all live files). A concurrent unpinned reader
    * sees strictly the old corpus or strictly the new one — never a
    * mix and never an empty window (the TRUNCATE+INSERT
    * decomposition's visible gap, closed); pinned pre-overwrite
    * snapshots and time travel keep reading the old corpus until
    * vacuum's grace expires the shadowed sources (the B85/B86
    * contract). OCC, both directions: a maintenance commit SHADOWING a
    * planned source refuses via the replaced-file check, and a plain
    * concurrent append GROWING the effective set since planning
    * refuses via the last-moment grow re-list (refuseGrowth) — either
    * way the retryable conflict, never a read-back of "replacement
    * plus concurrent rows"; the residual is the re-list→rename gap
    * every OCC-by-listing commit documents.
    * CHECK constraints validate the staged corpus before visibility
    * like any commit. The backfill verb (weekly `INSERT OVERWRITE`
    * from SQL via [[GraftCatalog]]) — maintenance-class,
    * caller-serialized per store like the rest.
    */
  def overwrite(spark: SparkSession, storeDir: String, data: DataFrame): Unit = {
    val conf         = ContentStore.driverHadoopConf()
    val (fsys, root) = ContentStore.fs(storeDir, conf)
    ensureFormat(storeDir, conf)
    ensureSchema(data.schema, storeDir, conf)
    val live = ContentStore.effectiveManifestNames(storeDir, conf)
    val replaced = live.flatMap(m => ContentStore.filesInManifest(storeDir, m, conf)).toSet
    val moved = stageParts(data, ContentStore.recordedDataShards(storeDir, conf), fsys, root)
    // refuseGrowth: a concurrent append landing between the live
    // listing above and the rename must refuse, not silently vanish
    // under the replacement (the shadowed-source OCC alone only
    // catches manifests that disappeared since planning)
    commitReplacement(storeDir, moved, replaced, namePrefix = "overwrite-",
      refuseGrowth = true): Unit
  }

  /** Distributed-write + move half of [[append]] WITHOUT the manifest:
    * parquet parts land in `data/` under collision-free sharded names
    * but stay UNREFERENCED (invisible to every reader, swept by vacuum
    * if never committed) until some manifest lists them. Split out so
    * [[upsert]] can stage its version epoch and its purge survivors
    * and commit BOTH in one atomic manifest rename.
    */
  private def stageParts(
      df: DataFrame,
      shards: Int,
      fsys: org.apache.hadoop.fs.FileSystem,
      root: Path
  ): Seq[String] = {
    val uuid    = UUID.randomUUID().toString
    val staging = new Path(root, s"_staging/$uuid")
    df.write.parquet(staging.toString)
    val parts = fsys
      .listStatus(staging)
      .map(_.getPath.getName)
      .filter(n => n.startsWith("part-") && n.endsWith(".parquet"))
      .sorted
    fsys.mkdirs(new Path(root, "data"))
    val moved = parts.zipWithIndex.map { case (part, i) =>
      val dest     = ContentStore.shardedName(f"pq-$uuid-$i%05d.parquet", shards)
      val destPath = new Path(root, s"data/$dest")
      fsys.mkdirs(destPath.getParent)
      if (!fsys.rename(new Path(staging, part), destPath))
        throw new java.io.IOException(s"ParquetEpochs: staging move failed for $part")
      dest
    }.toSeq
    fsys.delete(staging, true): Unit
    moved
  }

  /** First columnar append records the store's payload format
    * (`_format` = "parquet", create-exclusive first-write-wins with
    * the `_buckets` heal for a crashed empty write); the K-V DSv2
    * surface refuses a marked store at table resolution and this
    * refuses the inverse — a columnar append into an EXISTING unmarked
    * (= K-V) store, which would mix undecodable formats in one
    * `data/`. A crash between the marker and the first manifest
    * leaves an empty store marked columnar — it was destined to be
    * one; vacuum treats it like any empty store.
    */
  private def ensureFormat(
      storeDir: String,
      conf: org.apache.hadoop.conf.Configuration
  ): Unit = {
    val (fsys, root) = ContentStore.fs(storeDir, conf)
    ContentStore.recordedFormat(storeDir, conf) match {
      case Some("parquet") => ()
      case Some(other) =>
        throw new IllegalStateException(
          s"ParquetEpochs: store $storeDir records format '$other'; cannot append parquet epochs")
      case None =>
        if (ContentStore.manifestNames(storeDir, conf).nonEmpty)
          throw new IllegalStateException(
            s"ParquetEpochs: store $storeDir is an existing K-V store; columnar append refused")
        def tryRecord(): Option[String] = {
          try {
            fsys.mkdirs(root)
            val out = fsys.create(new Path(root, "_format"), /* overwrite = */ false)
            try out.write("parquet".getBytes("UTF-8"))
            finally out.close()
          } catch {
            case _: org.apache.hadoop.fs.FileAlreadyExistsException |
                _: java.nio.file.FileAlreadyExistsException => () // racer landed first
          }
          ContentStore.recordedFormat(storeDir, conf)
        }
        var now = tryRecord()
        if (now.isEmpty) { // crashed-empty heal, the _buckets pattern (mtime-gated)
          ContentStore.healEmptyMarker(fsys, new Path(root, "_format"),
            () => ContentStore.recordedFormat(storeDir, conf).nonEmpty)
          now = tryRecord()
        }
        if (!now.contains("parquet"))
          throw new IllegalStateException(
            s"ParquetEpochs: store $storeDir raced to format '${now.orNull}'")
    }
  }

  /** CREATE TABLE support — the first-write metadata protocol WITHOUT
    * data: records `_format`/`_schema` (+ `_datashards` when sharded)
    * and the empty `_manifest` dir, so SQL can bootstrap a columnar
    * store ([[GraftCatalog.createTable]] / CTAS) that the append
    * protocol then writes into. The recorded schema is the all-
    * nullable signature a first append would have recorded; a
    * created-then-never-written store reads as an empty typed frame
    * and every later append must match the signature (the one-schema
    * rule, enforced from creation instead of first data). Refuses
    * when ANY store artifact already exists (committed manifests, a
    * format marker, a recorded schema) — creation is first-writer-
    * wins like every metadata marker.
    */
  def createStore(storeDir: String, schema: StructType, dataShards: Int = 0): Unit = {
    val conf         = ContentStore.driverHadoopConf()
    val (fsys, root) = ContentStore.fs(storeDir, conf)
    require(schema.fields.nonEmpty, s"createStore: schema must have at least one column")
    if (ContentStore.recordedFormat(storeDir, conf).nonEmpty ||
        ContentStore.manifestNames(storeDir, conf).nonEmpty ||
        recordedSchema(storeDir, conf).nonEmpty)
      throw new IllegalStateException(
        s"createStore: $storeDir is already a store — CREATE refuses to adopt or " +
          "overwrite existing store metadata")
    ensureFormat(storeDir, conf)
    ensureSchema(schema, storeDir, conf)
    if (dataShards > 0) {
      try {
        val out = fsys.create(new Path(root, "_datashards"), /* overwrite = */ false)
        try out.write(dataShards.toString.getBytes("UTF-8"))
        finally out.close()
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException |
            _: java.nio.file.FileAlreadyExistsException => ()
      }
      val now = ContentStore.recordedDataShards(storeDir, conf)
      if (now != dataShards)
        throw new IllegalStateException(
          s"createStore: $storeDir raced to dataShards=$now; this create used $dataShards")
    }
    fsys.mkdirs(new Path(root, "_manifest")): Unit
  }

  /** The store's recorded ROW SCHEMA (`_schema`, Spark schema JSON),
    * written by the first [[append]] with every field nullable — the
    * same shape `spark.read.parquet` reports — so streaming consumers
    * ([[ColumnarStore]]) can resolve the table without opening a data
    * file, and an empty pinned read can still produce a typed frame.
    * Absent only for stores written before the marker existed; the
    * next append heals it forward.
    */
  def recordedSchema(storeDir: String, conf: org.apache.hadoop.conf.Configuration): Option[StructType] = {
    val (fsys, root) = ContentStore.fs(storeDir, conf)
    def readAt(p: Path): Option[StructType] = {
      if (!fsys.exists(p)) return None
      val reader = new java.io.BufferedReader(
        new java.io.InputStreamReader(fsys.open(p), "UTF-8"))
      val json =
        try Iterator.continually(reader.readLine()).takeWhile(_ != null).mkString("\n").trim
        finally reader.close()
      if (json.isEmpty) None
      else Some(DataType.fromJson(json).asInstanceOf[StructType])
    }
    // `_schema.next` is [[evolveSchema]]'s write-ahead sidecar: it is
    // the ONLY resolution source inside the fallback window (crash
    // between the fail-on-existing delete and the rename), so the
    // evolved WIDE schema stays visible through the crash instead of
    // leaving the store marker-less for a narrow heal-forward to
    // poison. `_schema` wins whenever present (pre-rename readers keep
    // the old schema until the evolution lands — the serialized-
    // maintenance contract; post-rename the two are equal).
    readAt(new Path(root, "_schema")).orElse(readAt(new Path(root, "_schema.next")))
  }

  /** One ROW SCHEMA per store, the `_format`/`_buckets` rule applied to
    * the payload's shape: the first append records it (all-nullable,
    * matching what a parquet read-back reports); every later append
    * must match by field NAME and TYPE in order (nullability-
    * insensitive — parquet reads are nullable regardless). Mixed
    * schemas in one store would make the streaming tail's fixed
    * resolution schema silently misread older/newer epochs — refuse at
    * the writer that is wrong, before any file is staged. A store
    * written before the marker existed records on its next append
    * (heal-forward), the same lazy migration as the legacy offset.
    */
  private def ensureSchema(
      schema: StructType,
      storeDir: String,
      conf: org.apache.hadoop.conf.Configuration
  ): Unit = {
    val (fsys, root) = ContentStore.fs(storeDir, conf)
    def signature(s: StructType): Seq[(String, String)] =
      s.fields.toSeq.map(f => (f.name, f.dataType.catalogString))
    recordedSchema(storeDir, conf) match {
      case Some(rec) =>
        if (signature(rec) != signature(schema))
          throw new IllegalStateException(
            s"ParquetEpochs: store $storeDir records schema ${rec.catalogString}; " +
              s"append with ${schema.catalogString} refused (one row schema per store)")
      case None =>
        val nullable = StructType(schema.fields.map(_.copy(nullable = true)))
        // heal-forward guard (ADVICE r17 belt-and-braces behind the
        // `_schema.next` sidecar): recording a schema on a store that
        // ALREADY holds parquet files must never record one NARROWER
        // than what is on disk — recorded-schema reads would silently
        // clip evolved columns from wide files. Schemas only ever
        // widen (evolveSchema appends columns), so comparing FIELD
        // COUNTS against every live file's footer is exact; footer
        // reads are metadata-only and heals are once-per-store.
        if (ContentStore.recordedFormat(storeDir, conf).contains("parquet")) {
          val liveFiles = ContentStore.effectiveManifestNames(storeDir, conf)
            .flatMap(m => ContentStore.filesInManifest(storeDir, m, conf)).distinct
          val widest = liveFiles.iterator.map { f =>
            try {
              val in = org.apache.parquet.hadoop.util.HadoopInputFile
                .fromPath(new Path(root, s"data/$f"), conf)
              val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
              try r.getFooter.getFileMetaData.getSchema.getFieldCount
              finally r.close()
            } catch { case _: Exception => 0 } // unreadable footer: no evidence
          }.maxOption.getOrElse(0)
          if (widest > nullable.fields.length)
            throw new IllegalStateException(
              s"ParquetEpochs: refusing to record schema ${nullable.catalogString} for store " +
                s"$storeDir — live data files carry $widest columns (wider than this append's " +
                s"${nullable.fields.length}); the store's _schema marker is missing, and " +
                "recording the narrow schema would clip evolved columns — append with the " +
                "evolved (wide) schema to heal the marker forward")
        }
        def tryRecord(): Option[StructType] = {
          try {
            fsys.mkdirs(root)
            val out = fsys.create(new Path(root, "_schema"), /* overwrite = */ false)
            try out.write(nullable.json.getBytes("UTF-8"))
            finally out.close()
          } catch {
            case _: org.apache.hadoop.fs.FileAlreadyExistsException |
                _: java.nio.file.FileAlreadyExistsException => () // racer landed first
          }
          recordedSchema(storeDir, conf)
        }
        var now = tryRecord()
        if (now.isEmpty) { // crashed-empty heal, the _buckets pattern (mtime-gated)
          ContentStore.healEmptyMarker(fsys, new Path(root, "_schema"),
            () => recordedSchema(storeDir, conf).nonEmpty)
          now = tryRecord()
        }
        now match {
          case Some(won) if signature(won) != signature(nullable) =>
            throw new IllegalStateException(
              s"ParquetEpochs: store $storeDir raced to schema ${won.catalogString}; " +
                s"this append used ${nullable.catalogString}")
          case None =>
            throw new IllegalStateException(
              s"ParquetEpochs: could not record schema for store $storeDir")
          case _ => ()
        }
    }
  }

  /** Additive SCHEMA EVOLUTION: widen the store's recorded row schema
    * by appending new nullable columns at the END — the lakehouse ADD
    * COLUMN, for the corpus that accretes metadata over time (a new
    * quality score, a new provenance tag). Every existing column must
    * match the recorded schema by name and type in order (no renames,
    * drops, retypes or reorders — those change the meaning of data
    * already on disk; a rewrite via [[compact]] into a fresh store is
    * the honest path for them).
    *
    * From the rename on: appends must use the EVOLVED schema
    * ([[ensureSchema]]'s signature equality — the evolution IS the
    * writer-contract change); every read — batch [[read]]/
    * [[readRange]], the [[ColumnarStore]] streaming tail, and the
    * rewriting maintenance ops — resolves against the evolved schema,
    * and pre-evolution files surface the new columns as NULL (Spark's
    * own parquet clipping, the same mechanism mergeSchema uses,
    * without paying a footer read per file). A [[compact]] after the
    * evolution materializes the NULLs physically. Maintenance op,
    * caller-serialized per store like the rest.
    */
  def evolveSchema(storeDir: String, newSchema: StructType): Unit = {
    val conf         = ContentStore.driverHadoopConf()
    val (fsys, root) = ContentStore.fs(storeDir, conf)
    if (!ContentStore.recordedFormat(storeDir, conf).contains("parquet"))
      throw new IllegalStateException(
        s"ParquetEpochs.evolveSchema: store $storeDir is not a columnar store")
    val rec = recordedSchema(storeDir, conf).getOrElse(
      throw new IllegalStateException(
        s"ParquetEpochs.evolveSchema: store $storeDir has no recorded _schema " +
          "(written before the marker existed) — one append heals it forward first"))
    def signature(s: StructType): Seq[(String, String)] =
      s.fields.toSeq.map(f => (f.name, f.dataType.catalogString))
    require(newSchema.fields.length >= rec.fields.length &&
        signature(StructType(newSchema.fields.take(rec.fields.length))) == signature(rec),
      s"evolveSchema: ${newSchema.catalogString} must extend the recorded " +
        s"${rec.catalogString} by appending columns (no rename/drop/retype/reorder)")
    if (newSchema.fields.length == rec.fields.length) return // nothing to add
    val nullable = StructType(newSchema.fields.map(_.copy(nullable = true)))
    val target   = new Path(root, "_schema")
    val next     = new Path(root, "_schema.next")
    def stage(): Path = {
      val tmp = new Path(root, s"._schema-tmp-${UUID.randomUUID()}")
      val out = fsys.create(tmp, false)
      try out.write(nullable.json.getBytes("UTF-8"))
      finally out.close()
      tmp
    }
    def renameReplacing(tmp: Path, to: Path, what: String): Unit =
      if (!fsys.rename(tmp, to)) {
        fsys.delete(to, false): Unit
        if (!fsys.rename(tmp, to)) {
          fsys.delete(tmp, false): Unit
          throw new java.io.IOException(s"evolveSchema: $what rename failed for $storeDir")
        }
      }
    // WRITE-AHEAD sidecar first (replacing any stale one from an
    // earlier crashed evolution): from here on a crash at ANY point
    // leaves the widened schema recoverable — [[recordedSchema]] falls
    // back to `_schema.next` when `_schema` is missing, so the
    // fail-on-existing fallback below (delete then rename, the
    // writeLease pattern) no longer has a no-marker window in which a
    // pre-evolution writer's heal-forward could re-record the NARROW
    // schema and silently clip the evolved column from wide files
    // already on disk (ADVICE r17).
    renameReplacing(stage(), next, "_schema.next")
    renameReplacing(stage(), target, "_schema")
    // sidecar retired; a crash before this delete leaves an EQUAL copy
    // behind — harmless (the next evolution replaces it)
    fsys.delete(next, false): Unit
  }

  /** Read the union of the named (pinned) manifests' parquet files —
    * the same time-travel contract as the K-V store's `manifests`
    * option: commits after the pin are invisible. Manifest resolution
    * is metadata-bounded (line reads); the data read is a plain
    * parquet scan with all its pruning. A pin whose manifests list no
    * data files (an epoch that admitted nothing) reads as an EMPTY
    * frame with the store's recorded schema — the same answer the K-V
    * twin gives, not an error.
    *
    * The scan resolves against the RECORDED schema when the store has
    * one (free — no footer read): identical to footer resolution while
    * the store has a single schema (appends enforce the signature),
    * and the thing that makes [[evolveSchema]] work — pre-evolution
    * files surface appended columns as NULL instead of whichever
    * file's footer happened to win.
    */
  def read(spark: SparkSession, storeDir: String, manifests: Seq[String]): DataFrame = {
    val conf      = ContentStore.driverHadoopConf()
    val (_, root) = ContentStore.fs(storeDir, conf)
    if (!ContentStore.recordedFormat(storeDir, conf).contains("parquet"))
      throw new IllegalStateException(
        s"ParquetEpochs: store $storeDir is not a columnar store (no 'parquet' format marker)")
    val files = manifests
      .flatMap(m => ContentStore.filesInManifest(storeDir, m, conf))
      .map(f => new Path(root, s"data/$f").toString)
    val recorded = recordedSchema(storeDir, conf)
    if (files.isEmpty) {
      val schema = recorded.getOrElse(
        throw new IllegalStateException(
          s"ParquetEpochs.read: no data files under manifests $manifests and no recorded " +
            s"schema for $storeDir (pre-marker store) — cannot type an empty read"))
      return spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    }
    recorded.fold(spark.read)(s => spark.read.schema(s)).parquet(files: _*)
  }

  /** One recorded [min, max] bound for one (file, column), with the
    * comparison domain tagged: "long" bounds compare numerically,
    * "string" bounds compare unsigned byte-wise over UTF-8 — the SAME
    * total order `UTF8String.compareTo` gives Spark string predicates,
    * so a skip decision can never disagree with the residual filter.
    */
  private[graft] final case class ColumnBound(tag: String, minL: Long, maxL: Long,
      minB: Array[Byte], maxB: Array[Byte]) {
    def mayContainLong(lo: Long, hi: Long): Boolean =
      tag == "long" && maxL >= lo && minL <= hi
    def mayContainString(lo: Array[Byte], hi: Array[Byte]): Boolean =
      tag == "string" && unsignedCompare(maxB, lo) >= 0 && unsignedCompare(minB, hi) <= 0
  }

  private def unsignedCompare(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    a.length - b.length
  }

  /** COLUMNAR file-range stats (B65 parity for the parquet payload,
    * measured first — ColumnarSkipBench: at 1,024 files a key-scoped
    * point read is 3.0× faster planned-pruned than footer-pruned
    * (0.49 → 0.17 s), 2.6× on a 2% range; at 256 files the gap is
    * ~15%, so the win is file-count-proportional — exactly the shape a
    * nightly-append store grows into at 100 TB): each append records,
    * per moved part and per top-level integral/string column, the
    * parquet FOOTER's min/max into `_stats/<manifest>` (5-field lines
    * `file\tcol\ttag\tmin\tmax`; long bounds as decimal, string bounds
    * base64). Footer reads are metadata-only (no data pages) and the
    * loop is bounded by parts-per-epoch — the same driver-side cost
    * class as the manifest commit itself. Ordering mirrors the K-V
    * writer: sidecar lands BEFORE the manifest rename, so a visible
    * manifest either has its stats or readers fall back to
    * no-skipping; the rename is best-effort, first-write-wins ONLY
    * when the manifest is already visible (a replayed idempotent
    * append loses the rename and the original's stats — which
    * describe the files that actually survived — stay), and
    * replace-when-stale before visibility (a conflict-retried
    * fixed-name commit re-stages new UUID files; the aborted
    * attempt's sidecar would otherwise permanently disable skipping
    * for the files that actually commit).
    * Columns whose footer stats are absent/untrusted in ANY row group
    * are omitted for that file (conservative: omitted = never skipped).
    */
  private def writeFileStats(
      fsys: org.apache.hadoop.fs.FileSystem,
      root: Path,
      name: String,
      moved: Seq[String],
      conf: org.apache.hadoop.conf.Configuration,
      extraLines: Seq[String] = Nil
  ): Unit = {
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
    import org.apache.parquet.schema.LogicalTypeAnnotation
    import scala.jdk.CollectionConverters._
    val enc = java.util.Base64.getEncoder
    val lines = moved.flatMap { f =>
      val footer =
        try {
          val in = org.apache.parquet.hadoop.util.HadoopInputFile
            .fromPath(new Path(root, s"data/$f"), conf)
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try r.getFooter finally r.close()
        } catch { case _: Exception => null } // unreadable footer: no stats, no skip
      if (footer == null) Seq.empty
      else {
        val blocks = footer.getBlocks.asScala.toSeq
        if (blocks.isEmpty) Seq.empty
        else {
          // per-column chunks across all row groups, keyed by dotted path
          val byCol = blocks.flatMap(_.getColumns.asScala).groupBy(_.getPath.toDotString)
          byCol.toSeq.sortBy(_._1).flatMap { case (colName, chunks) =>
            if (colName.contains('.') || chunks.size != blocks.size) None
            else {
              val pt      = chunks.head.getPrimitiveType
              val logical = pt.getLogicalTypeAnnotation
              val trusted = chunks.forall { c =>
                val s: org.apache.parquet.column.statistics.Statistics[_] = c.getStatistics
                s != null && !s.isEmpty && s.hasNonNullValue
              }
              if (!trusted) None
              else pt.getPrimitiveTypeName match {
                case PrimitiveTypeName.INT64 | PrimitiveTypeName.INT32
                    if logical == null ||
                      (logical.isInstanceOf[LogicalTypeAnnotation.IntLogicalTypeAnnotation] &&
                        logical.asInstanceOf[LogicalTypeAnnotation.IntLogicalTypeAnnotation]
                          .isSigned) => // unsigned ints compare unsigned — don't record
                  val mins = chunks.map(_.getStatistics.genericGetMin.asInstanceOf[Number].longValue)
                  val maxs = chunks.map(_.getStatistics.genericGetMax.asInstanceOf[Number].longValue)
                  Some(s"$f\t$colName\tlong\t${mins.min}\t${maxs.max}")
                case PrimitiveTypeName.BINARY
                    if logical.isInstanceOf[LogicalTypeAnnotation.StringLogicalTypeAnnotation] =>
                  val mins = chunks.map(_.getStatistics.genericGetMin
                    .asInstanceOf[org.apache.parquet.io.api.Binary].getBytes)
                  val maxs = chunks.map(_.getStatistics.genericGetMax
                    .asInstanceOf[org.apache.parquet.io.api.Binary].getBytes)
                  val mn = mins.reduce((a, b) => if (unsignedCompare(a, b) <= 0) a else b)
                  val mx = maxs.reduce((a, b) => if (unsignedCompare(a, b) >= 0) a else b)
                  Some(s"$f\t$colName\tstring\t${enc.encodeToString(mn)}\t${enc.encodeToString(mx)}")
                case _ => None // decimals/timestamps/doubles: not a store key shape
              }
            }
          }
        }
      }
    }
    val allLines = extraLines ++ lines
    if (allLines.nonEmpty) {
      val statsDir = new Path(root, "_stats")
      fsys.mkdirs(statsDir)
      val tmp = new Path(statsDir, s".tmp-$name-${UUID.randomUUID()}")
      val out = fsys.create(tmp, false)
      try out.write(allLines.mkString("\n").getBytes("UTF-8"))
      finally out.close()
      val target = new Path(statsDir, name)
      if (!fsys.rename(tmp, target)) {
        // the target exists. Two cases, split by manifest visibility
        // (the same guard the `_compacted` sidecar uses):
        //  - manifest ALREADY VISIBLE: a replayed idempotent append —
        //    the original's stats describe the files that actually
        //    survived; first write wins, drop ours.
        //  - manifest NOT YET VISIBLE: a STALE sidecar from a crashed
        //    or conflict-aborted earlier attempt under this reused
        //    fixed name (a retried upsert epoch re-stages new UUID
        //    files) — keeping it would permanently record bounds for
        //    orphaned files and silently disable skipping for the
        //    files this commit actually lands. Replace it: nothing
        //    consults the sidecar until the manifest rename.
        if (fsys.exists(new Path(root, s"_manifest/$name"))) fsys.delete(tmp, false): Unit
        else {
          fsys.delete(target, false): Unit
          // a second failure only disables skipping — best-effort
          if (!fsys.rename(tmp, target)) fsys.delete(tmp, false): Unit
        }
      }
    }
  }

  /** Carried files' recorded stat lines, HARVESTED from existing
    * `_stats` sidecars instead of re-reading parquet footers: a
    * replacement manifest re-lists untouched files by name, and their
    * bounds are immutable — re-deriving them cost one footer read per
    * carried file, which made the copy-on-write verbs O(affected
    * manifest's files) in driver metadata reads (UpsertScaleBench
    * caught the derivative: the purge itself was flat, the stats
    * rewrite was not). Returns (lines to copy, files covered); files
    * without a recorded line fall through to the footer loop —
    * conservative, never wrong.
    */
  private def harvestStats(
      fsys: org.apache.hadoop.fs.FileSystem,
      root: Path,
      sourceManifests: Seq[String],
      files: Set[String]
  ): (Seq[String], Set[String]) = {
    val lines = sourceManifests.flatMap { m =>
      val p = new Path(root, s"_stats/$m")
      if (!fsys.exists(p)) Seq.empty
      else {
        val reader = new java.io.BufferedReader(
          new java.io.InputStreamReader(fsys.open(p), "UTF-8"))
        try Iterator.continually(reader.readLine()).takeWhile(_ != null)
          .filter(_.nonEmpty).toList
        finally reader.close()
      }
    }
    val kept = lines.filter { l =>
      val f = l.substring(0, math.max(l.indexOf('\t'), 0))
      f.nonEmpty && files(f)
    }
    (kept, kept.map(l => l.substring(0, l.indexOf('\t'))).toSet)
  }

  /** Per-file recorded bounds for `column` across the pinned manifests
    * — Map(file → bound); files or manifests without a usable entry
    * are simply absent (and therefore never skipped).
    */
  private[graft] def columnBounds(
      storeDir: String,
      manifests: Seq[String],
      column: String,
      conf: org.apache.hadoop.conf.Configuration
  ): Map[String, ColumnBound] = {
    val (fsys, root) = ContentStore.fs(storeDir, conf)
    val dec          = java.util.Base64.getDecoder
    manifests.flatMap { m =>
      val p = new Path(root, s"_stats/$m")
      if (!fsys.exists(p)) Seq.empty
      else {
        val reader = new java.io.BufferedReader(
          new java.io.InputStreamReader(fsys.open(p), "UTF-8"))
        try Iterator
          .continually(reader.readLine())
          .takeWhile(_ != null)
          .filter(_.nonEmpty)
          .flatMap { line =>
            line.split("\t", 5) match {
              case Array(f, c, "long", mn, mx) if c == column =>
                Some(f -> ColumnBound("long", mn.toLong, mx.toLong, null, null))
              case Array(f, c, "string", mn, mx) if c == column =>
                Some(f -> ColumnBound("string", 0L, 0L, dec.decode(mn), dec.decode(mx)))
              case _ => None // K-V 3-field lines or other columns
            }
          }
          .toList
        finally reader.close()
      }
    }.toMap
  }

  /** Every recorded bound for `column` across ALL `_stats` sidecars in
    * the store — file names are store-unique (uuid-derived), so one
    * merged map serves consumers that see files without knowing their
    * manifest (the streaming tail's partitions). One directory listing
    * plus one line-read per manifest: metadata-bounded, the offset
    * log's own cost class.
    */
  private[graft] def allColumnBounds(
      storeDir: String,
      column: String,
      conf: org.apache.hadoop.conf.Configuration
  ): Map[String, ColumnBound] = {
    val (fsys, root) = ContentStore.fs(storeDir, conf)
    val statsDir     = new Path(root, "_stats")
    if (!fsys.exists(statsDir)) return Map.empty
    val names = fsys.listStatus(statsDir).map(_.getPath.getName)
      .filterNot(_.startsWith(".tmp-")).toSeq
    columnBounds(storeDir, names, column, conf)
  }

  /** Conservative overlap test against STRING-typed range endpoints
    * (the form options arrive in): a "long" bound parses them as
    * longs — unparseable endpoints keep the file; a "string" bound
    * compares unsigned UTF-8 bytes (Spark's own string order).
    */
  private[graft] def mayOverlap(b: ColumnBound, lo: String, hi: String): Boolean =
    b.tag match {
      case "long" =>
        try b.mayContainLong(lo.trim.toLong, hi.trim.toLong)
        catch { case _: NumberFormatException => true }
      case "string" => b.mayContainString(lo.getBytes("UTF-8"), hi.getBytes("UTF-8"))
      case _        => true
    }

  /** The data files a key-scoped read actually plans: the pinned
    * manifests' files minus those whose recorded `column` range cannot
    * overlap [lo, hi]. `lo`/`hi` accept Long/Int (compared numerically
    * against "long" bounds) or String (compared unsigned byte-wise
    * over UTF-8 against "string" bounds — Spark's own string order);
    * any type/tag mismatch or missing bound keeps the file. Exposed
    * for specs; [[readRange]] is the consumer.
    */
  def plannedFiles(
      storeDir: String,
      manifests: Seq[String],
      column: String,
      lo: Any,
      hi: Any
  ): Seq[String] = {
    val conf   = ContentStore.driverHadoopConf()
    val files  = manifests.flatMap(m => ContentStore.filesInManifest(storeDir, m, conf))
    val bounds = columnBounds(storeDir, manifests, column, conf)
    def longOf(v: Any): Option[Long] = v match {
      case l: Long => Some(l)
      case i: Int  => Some(i.toLong)
      case _       => None
    }
    (longOf(lo), longOf(hi), lo, hi) match {
      case (Some(l), Some(h), _, _) =>
        files.filter(f => bounds.get(f).forall(_.mayContainLong(l, h)))
      case (_, _, l: String, h: String) =>
        val lb = l.getBytes("UTF-8"); val hb = h.getBytes("UTF-8")
        files.filter(f => bounds.get(f).forall(_.mayContainString(lb, hb)))
      case _ => files
    }
  }

  /** Key-scoped pinned read with PLANNING-time file skipping — result
    * is EXACTLY `read(...).filter(column between lo and hi)` (the
    * residual filter is always applied; stats only shrink the planned
    * file list), so legacy stores without `_stats`, lost best-effort
    * renames, and unrecorded columns all degrade to the plain scan,
    * never to wrong answers. Ships on a measurement (ColumnarSkipBench,
    * committed): planning-time skipping beats parquet footer pruning
    * 3.0×/2.6× (point/2%-range) at 1,024 files and the gap grows with
    * file count — the B65 contract, effective exactly when the writer
    * clustered the key (e.g. repartitionByRange before append).
    */
  def readRange(
      spark: SparkSession,
      storeDir: String,
      manifests: Seq[String],
      column: String,
      lo: Any,
      hi: Any
  ): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val conf      = ContentStore.driverHadoopConf()
    val (_, root) = ContentStore.fs(storeDir, conf)
    if (!ContentStore.recordedFormat(storeDir, conf).contains("parquet"))
      throw new IllegalStateException(
        s"ParquetEpochs: store $storeDir is not a columnar store (no 'parquet' format marker)")
    val kept = plannedFiles(storeDir, manifests, column, lo, hi)
      .map(f => new Path(root, s"data/$f").toString)
    val recorded = recordedSchema(storeDir, conf)
    val base =
      if (kept.nonEmpty) recorded.fold(spark.read)(s => spark.read.schema(s)).parquet(kept: _*)
      else {
        val schema = recorded.getOrElse(
          throw new IllegalStateException(
            s"ParquetEpochs.readRange: every file pruned and no recorded schema for " +
              s"$storeDir (pre-marker store) — cannot type an empty read"))
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
      }
    base.filter(col(column).between(lit(lo), lit(hi)))
  }

  /** Multi-dimension key-scoped pinned read — [[readRange]]'s box
    * variant, the read path a Z-ORDERED store ([[zcluster]]) exists
    * for: the planned file set is the INTERSECTION of each
    * dimension's `_stats`-pruned set, so a two-dim box on a z-ordered
    * layout opens ~the product of the per-dim fractions (a rectangle
    * of files, not a stripe). Result is EXACTLY
    * `read(...).filter(every box residually)` — each dimension's
    * filter is always applied, so missing bounds on ANY dimension
    * degrade that dimension to no-skipping, never to wrong answers.
    */
  def readBox(
      spark: SparkSession,
      storeDir: String,
      manifests: Seq[String],
      boxes: Seq[(String, Any, Any)]
  ): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    require(boxes.nonEmpty, "readBox: at least one (column, lo, hi) box required")
    val conf      = ContentStore.driverHadoopConf()
    val (_, root) = ContentStore.fs(storeDir, conf)
    if (!ContentStore.recordedFormat(storeDir, conf).contains("parquet"))
      throw new IllegalStateException(
        s"ParquetEpochs: store $storeDir is not a columnar store (no 'parquet' format marker)")
    val keptSet = boxes
      .map { case (c, lo, hi) => plannedFiles(storeDir, manifests, c, lo, hi).toSet }
      .reduce(_ & _)
    // stable order: re-filter the manifest-ordered file list
    val kept = manifests
      .flatMap(m => ContentStore.filesInManifest(storeDir, m, conf))
      .filter(keptSet)
      .map(f => new Path(root, s"data/$f").toString)
    val recorded = recordedSchema(storeDir, conf)
    val base =
      if (kept.nonEmpty) recorded.fold(spark.read)(s => spark.read.schema(s)).parquet(kept: _*)
      else {
        val schema = recorded.getOrElse(
          throw new IllegalStateException(
            s"ParquetEpochs.readBox: every file pruned and no recorded schema for " +
              s"$storeDir (pre-marker store) — cannot type an empty read"))
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
      }
    boxes.foldLeft(base) { case (df, (c, lo, hi)) =>
      df.filter(col(c).between(lit(lo), lit(hi)))
    }
  }

  /** Record-level DELETE on a columnar store — [[StoreLifecycle
    * .deleteKeys]]'s twin for the parquet payload, same copy-on-write
    * protocol, different rewrite kernel. Removes every row whose
    * `column` equals one of `values` from the current effective
    * snapshot:
    *
    *  1. PLAN — candidate files via the recorded `_stats` bounds
    *     (B65b): a file whose [min,max] for `column` covers no target
    *     value is never opened; missing/mismatched bounds keep the
    *     file (conservative, the plannedFiles rule). On a clustered
    *     store the read set is O(covering files).
    *  2. LOCATE — one metadata-cheap pass over the candidates finds
    *     which files actually HOLD matches (per-file match counts via
    *     the `_metadata.file_path` column); match-free candidates are
    *     carried untouched, so stats imprecision never causes write
    *     amplification.
    *  3. REWRITE + COMMIT — the matched files' surviving rows become
    *     one fresh epoch (range-clustered when `clusterBy` is given —
    *     the rewrite is the free moment to re-establish the skipping
    *     layout, the [[compact]] rule), committed as ONE replacement
    *     manifest (`delete-pq-<hash>`, deterministic) that also
    *     carries every untouched file of the affected manifests by
    *     name, with a `_compacted/` sidecar shadowing them — the
    *     atomic-swap, pin, streaming-tail and vacuum semantics are
    *     exactly [[StoreLifecycle.deleteKeys]]'s (see its scaladoc for
    *     the point-in-time and retention contract).
    *
    * Rows with a NULL `column` never match (SQL `IN` semantics).
    * Returns a [[StoreLifecycle.DeleteReport]]: `rewrittenFiles` = new
    * parts written, `droppedFiles` = matched source files replaced,
    * `carriedFiles` = re-listed untouched. `excludeManifests` scopes
    * the delete to the effective snapshot minus those manifests (the
    * [[upsert]] hook — the fresh version epoch must keep its rows).
    */
  def deleteWhere(
      spark: SparkSession,
      storeDir: String,
      column: String,
      values: Seq[Any],
      clusterBy: Option[(String, Int)] = None,
      excludeManifests: Set[String] = Set.empty
  ): StoreLifecycle.DeleteReport =
    planPurgeSeq(spark, storeDir, column, values, excludeManifests) match {
      case None => StoreLifecycle.DeleteReport(None, 0L, 0, 0, 0)
      case Some(p) =>
        import org.apache.spark.sql.functions.col
        val conf = ContentStore.driverHadoopConf()
        val laid = clusterBy.fold(p.survivors) { case (c, parts) =>
          p.survivors.repartitionByRange(parts, col(c)).sortWithinPartitions(c)
        }
        val digest = java.security.MessageDigest.getInstance("SHA-256")
        digest.update(p.affected.mkString("\n").getBytes("UTF-8"))
        values.map(String.valueOf).sorted.foreach { v =>
          digest.update(0.toByte); digest.update(v.getBytes("UTF-8"))
        }
        val name = "delete-pq-" + digest.digest().take(8).map("%02x".format(_)).mkString
        append(laid, storeDir, Some(name), Some(p.affected), carryFiles = p.carried)
        val newParts = ContentStore.filesInManifest(storeDir, name, conf).size - p.carried.size
        StoreLifecycle.DeleteReport(Some(name), p.deleted, newParts, p.matchedFiles.size,
          p.carried.size)
    }

  /** PLAN + LOCATE legs of the driver-Seq columnar purge — the Seq
    * twin of [[planPurgeFrame]], returning the same uncommitted
    * [[ColumnarPurgePlan]]. The value set lives on the driver: bounds
    * pruning is a driver loop over the recorded `_stats` (zero Spark
    * jobs) and the locate pass is one codegen'd `isin` filter — the
    * minimum-job shape small batches want; [[upsert]] picks it
    * adaptively under [[PqSeqPurgeMaxStagedBytes]]. Commits nothing.
    * None = no live row matched.
    */
  private def planPurgeSeq(
      spark: SparkSession,
      storeDir: String,
      column: String,
      values: Seq[Any],
      excludeManifests: Set[String]
  ): Option[ColumnarPurgePlan] = {
    import org.apache.spark.sql.functions.{coalesce, col, lit, not}
    val conf = ContentStore.driverHadoopConf()
    if (!ContentStore.recordedFormat(storeDir, conf).contains("parquet"))
      throw new IllegalStateException(
        s"ParquetEpochs.deleteWhere: store $storeDir is not a columnar store — " +
          "use StoreLifecycle.deleteKeys for the K-V payload")
    val live = ContentStore.effectiveManifestNames(storeDir, conf).filterNot(excludeManifests)
    if (values.isEmpty || live.isEmpty) return None
    val (_, root)       = ContentStore.fs(storeDir, conf)
    val filesByManifest = live.map(m => m -> ContentStore.filesInManifest(storeDir, m, conf))
    val bounds          = columnBounds(storeDir, live, column, conf)
    def mayHold(f: String): Boolean = bounds.get(f) match {
      case None => true
      case Some(b) =>
        values.exists {
          case l: Long if b.tag == "long" => b.mayContainLong(l, l)
          case i: Int if b.tag == "long"  => b.mayContainLong(i.toLong, i.toLong)
          case s: String if b.tag == "string" =>
            val bs = s.getBytes("UTF-8"); b.mayContainString(bs, bs)
          case _ => true // type/tag mismatch: never skip on it
        }
    }
    val candidates = filesByManifest.flatMap(_._2).distinct.filter(mayHold)
    if (candidates.isEmpty) return None
    val pathOf    = candidates.map(f => f -> new Path(root, s"data/$f").toString).toMap
    val matchPred = col(column).isin(values: _*)
    // candidate reads resolve against the recorded schema — on an
    // evolved store the candidate set can span the evolution boundary
    // (see evolveSchema), and the survivors must rewrite WIDE
    val rdr = recordedSchema(storeDir, conf).fold(spark.read)(s => spark.read.schema(s))
    // per-file match counts in one pass; file names are store-unique
    // (uuid-derived) so the hidden file path maps back by base name
    val perFile = rdr
      .parquet(candidates.map(pathOf): _*)
      .filter(matchPred)
      .groupBy(col("_metadata.file_path").as("fp"))
      .count()
      .collect()
    val deleted = perFile.map(_.getLong(1)).sum
    if (deleted == 0L) return None
    val matchedBases =
      perFile.map(r => ContentStore.baseName(r.getString(0))).toSet
    val matchedFiles = candidates.filter(f => matchedBases(ContentStore.baseName(f))).toSet
    val affected = filesByManifest.collect {
      case (m, fs) if fs.exists(matchedFiles) => m
    }
    val carried = affected.flatMap(m =>
      filesByManifest.toMap.apply(m).filterNot(matchedFiles))
    val survivors = rdr
      .parquet(matchedFiles.toSeq.sorted.map(pathOf): _*)
      .filter(not(coalesce(matchPred, lit(false)))) // NULL column never matches: keep
    Some(ColumnarPurgePlan(
      deleted, matchedFiles, affected, carried, survivors,
      // driver-resident values: fingerprint without a Spark job
      // (order-independent; only the frame deleteWhere's name path
      // ever calls it, but keep it correct)
      () => s"${values.size}:${values.map(String.valueOf).sorted.mkString("\u0000").hashCode}"))
  }

  /** Convenience form of the DataFrame-valued [[deleteWhere]]: whole
    * effective snapshot, no re-clustering, AQE-chosen join strategy.
    */
  def deleteWhere(
      spark: SparkSession,
      storeDir: String,
      column: String,
      keys: DataFrame
  ): StoreLifecycle.DeleteReport =
    deleteWhere(spark, storeDir, column, keys, None, Set.empty[String], None)

  /** DataFrame-valued DELETE on a columnar store — [[deleteWhere]]
    * with the purge values as a FRAME instead of a driver Seq, for
    * CDC/re-crawl batches beyond driver memory: the Seq form inlines
    * values into one `isin` (driver residency + an O(values)-sized
    * expression), this form never materializes them — candidates
    * prune via the key frame joined against the broadcast `_stats`
    * bounds map, per-file match counts come from a LEFT SEMI join
    * (O(matched files) to the driver), and survivors drop via a LEFT
    * ANTI join (broadcast or shuffle-hash, AQE's pick; `broadcastKeys`
    * is the explicit escape hatch — `Some(false)` forces the shuffle
    * path so the key set never lands on the driver, `Some(true)`
    * forces broadcast for a known-small set). Same copy-on-write
    * commit, carry-forward, report and NULL/IN semantics as the Seq
    * form (NULLs in the frame are dropped; NULL store values never
    * match). The frame must have exactly one column; when the store
    * records a schema, its type must equal `column`'s type (an
    * implicit cast in the join would silently change match
    * semantics).
    */
  def deleteWhere(
      spark: SparkSession,
      storeDir: String,
      column: String,
      keys: DataFrame,
      clusterBy: Option[(String, Int)],
      excludeManifests: Set[String],
      broadcastKeys: Option[Boolean]
  ): StoreLifecycle.DeleteReport =
    planPurgeFrame(spark, storeDir, column, keys, excludeManifests, broadcastKeys) match {
      case None => StoreLifecycle.DeleteReport(None, 0L, 0, 0, 0)
      case Some(p) =>
        val conf = ContentStore.driverHadoopConf()
        val laid = clusterBy.fold(p.survivors) { case (c, parts) =>
          import org.apache.spark.sql.functions.col
          p.survivors.repartitionByRange(parts, col(c)).sortWithinPartitions(c)
        }
        // deterministic name without enumerating values on the driver:
        // affected sources + an order-independent key-set fingerprint
        val digest = java.security.MessageDigest.getInstance("SHA-256")
        digest.update(p.affected.mkString("\n").getBytes("UTF-8"))
        digest.update(0.toByte)
        digest.update(p.keyFingerprint().getBytes("UTF-8"))
        val name = "delete-pq-" + digest.digest().take(8).map("%02x".format(_)).mkString
        append(laid, storeDir, Some(name), Some(p.affected), carryFiles = p.carried)
        val newParts = ContentStore.filesInManifest(storeDir, name, conf).size - p.carried.size
        StoreLifecycle.DeleteReport(Some(name), p.deleted, newParts, p.matchedFiles.size,
          p.carried.size)
    }

  /** One planned-but-uncommitted columnar purge — everything the
    * DataFrame-valued [[deleteWhere]] decides before its commit.
    * `survivors` is the lazily-evaluated frame of the matched files'
    * rows minus the purge set; the caller either commits it as its own
    * replacement manifest (deleteWhere) or folds it into a bigger
    * atomic commit ([[upsert]]'s single-manifest swap).
    */
  private final case class ColumnarPurgePlan(
      deleted: Long,
      matchedFiles: Set[String],
      affected: Seq[String],
      carried: Seq[String],
      survivors: DataFrame,
      keyFingerprint: () => String)

  /** PLAN + LOCATE legs of the DataFrame-valued purge (scaladoc on the
    * public [[deleteWhere]] overload): stats-joined candidate pruning,
    * semi-join per-file match counts, anti-join survivor frame. Reads
    * nothing beyond the candidates; commits nothing. None = no live
    * row matched.
    */
  private def planPurgeFrame(
      spark: SparkSession,
      storeDir: String,
      column: String,
      keys: DataFrame,
      excludeManifests: Set[String],
      broadcastKeys: Option[Boolean]
  ): Option[ColumnarPurgePlan] = {
    import org.apache.spark.sql.functions.{broadcast, col, count, expr, lit}
    val conf = ContentStore.driverHadoopConf()
    if (!ContentStore.recordedFormat(storeDir, conf).contains("parquet"))
      throw new IllegalStateException(
        s"ParquetEpochs.deleteWhere: store $storeDir is not a columnar store — " +
          "use StoreLifecycle.deleteKeys for the K-V payload")
    require(keys.schema.fields.length == 1,
      s"deleteWhere: key frame must have exactly one column, got ${keys.schema.catalogString}")
    val keyType = keys.schema.fields(0).dataType
    recordedSchema(storeDir, conf).flatMap(_.fields.find(_.name == column)).foreach { f =>
      require(f.dataType == keyType,
        s"deleteWhere: key frame type ${keyType.catalogString} must equal column " +
          s"'$column' type ${f.dataType.catalogString}")
    }
    val keyFrame = keys.toDF("__graft_key").where(col("__graft_key").isNotNull).distinct()
    def hinted(df: DataFrame) = broadcastKeys match {
      case Some(true)  => broadcast(df)
      case Some(false) => df.hint("shuffle_hash")
      case None        => df
    }
    val live = ContentStore.effectiveManifestNames(storeDir, conf).filterNot(excludeManifests)
    if (live.isEmpty) return None
    val (_, root)       = ContentStore.fs(storeDir, conf)
    val filesByManifest = live.map(m => m -> ContentStore.filesInManifest(storeDir, m, conf))
    val bounds          = columnBounds(storeDir, live, column, conf)
    // PLAN: bounds joined in the key's own comparison domain — "long"
    // bounds against integral keys, "string" bounds against string
    // keys (Spark string order IS the recorded unsigned-UTF-8 order);
    // any tag/type mismatch or missing bound keeps the file
    val keyIsIntegral = keyType == org.apache.spark.sql.types.LongType ||
      keyType == org.apache.spark.sql.types.IntegerType
    val keyIsString = keyType == org.apache.spark.sql.types.StringType
    val allFiles    = filesByManifest.flatMap(_._2)
    val (prunableLong, rest) = allFiles.partition(f =>
      keyIsIntegral && bounds.get(f).exists(_.tag == "long"))
    val (prunableStr, unconditional) = rest.partition(f =>
      keyIsString && bounds.get(f).exists(_.tag == "string"))
    val joinCandidates: Seq[String] = {
      import spark.implicits._
      val longPart: Seq[String] =
        if (prunableLong.isEmpty) Seq.empty
        else {
          val b = prunableLong.map { f =>
            val bd = bounds(f); (f, bd.minL, bd.maxL)
          }.toDF("__f", "__mn", "__mx")
          keyFrame
            .join(broadcast(b),
              col("__graft_key").cast("long").between(col("__mn"), col("__mx")), "inner")
            .select("__f").distinct().as[String].collect().toSeq
        }
      val strPart: Seq[String] =
        if (prunableStr.isEmpty) Seq.empty
        else {
          val b = prunableStr.map { f =>
            val bd = bounds(f)
            (f, new String(bd.minB, "UTF-8"), new String(bd.maxB, "UTF-8"))
          }.toDF("__f", "__mn", "__mx")
          keyFrame
            .join(broadcast(b), col("__graft_key").between(col("__mn"), col("__mx")), "inner")
            .select("__f").distinct().as[String].collect().toSeq
        }
      longPart ++ strPart
    }
    val candidates = (unconditional ++ joinCandidates).distinct
    if (candidates.isEmpty) return None
    val pathOf = candidates.map(f => f -> new Path(root, s"data/$f").toString).toMap
    val rdr    = recordedSchema(storeDir, conf).fold(spark.read)(s => spark.read.schema(s))
    val perFile = rdr
      .parquet(candidates.map(pathOf): _*)
      .select(col(column).as("__v"), col("_metadata.file_path").as("__fp"))
      .join(hinted(keyFrame), col("__v") === col("__graft_key"), "left_semi")
      .groupBy("__fp").count().collect()
    val deleted = perFile.map(_.getLong(1)).sum
    if (deleted == 0L) return None
    val matchedBases = perFile.map(r => ContentStore.baseName(r.getString(0))).toSet
    val matchedFiles = candidates.filter(f => matchedBases(ContentStore.baseName(f))).toSet
    val affected = filesByManifest.collect {
      case (m, fs) if fs.exists(matchedFiles) => m
    }
    val carried = affected.flatMap(m =>
      filesByManifest.toMap.apply(m).filterNot(matchedFiles))
    val survivors = rdr
      .parquet(matchedFiles.toSeq.sorted.map(pathOf): _*)
      .join(hinted(keyFrame), col(column) === col("__graft_key"), "left_anti")
    Some(ColumnarPurgePlan(
      deleted, matchedFiles, affected, carried, survivors,
      // THUNKED: a whole Spark job only the frame deleteWhere's
      // deterministic name needs — upsert commits under its own
      // epoch-derived name and must not pay for it
      () => {
        val fp = keyFrame.agg(count(lit(1)), expr("bit_xor(xxhash64(__graft_key))")).head()
        s"${fp.getLong(0)}:${if (fp.isNullAt(1)) 0L else fp.getLong(1)}"
      }))
  }

  /** [[upsert]]'s adaptive-path thresholds (the B82 bench fix): a
    * staged version epoch at or under this many bytes (driver
    * file-status metadata, no read) collects its distinct keys and
    * purges through [[planPurgeSeq]] — the frame planner's
    * join/fingerprint pipeline costs ~3 extra Spark jobs of fixed
    * overhead that dominate small nightly batches (measured 3.6 s →
    * Seq-path ~1.2 s at the sf0.1 gate). 16 MB of columnar parts
    * bounds the collected key column to the deletion-vector class
    * the Seq [[deleteWhere]] already contracts for; the key-count cap
    * keeps the isin expression sane when a small-byte epoch is
    * key-dense.
    */
  private val PqSeqPurgeMaxStagedBytes: Long = 16L << 20
  private val PqSeqPurgeMaxKeys: Int         = 100000

  /** UPSERT (MERGE) on a columnar store — [[StoreLifecycle.upsert]]'s
    * twin for the parquet payload: after it returns, the store holds
    * exactly `versions`' rows for each upserted `column` value (older
    * versions purged), new values just insert. SINGLE-COMMIT ATOMIC
    * (r18, closes the documented two-commit visibility window): the
    * version epoch's parts and the purge's survivor parts both STAGE
    * unreferenced ([[stageParts]]), then ONE manifest
    * (`upsert-pq-<epochId>`) lists epoch + survivors + carried files
    * with its `_compacted/` sidecar shadowing the affected manifests —
    * a concurrent unpinned reader sees the store strictly BEFORE or
    * strictly AFTER the merge at the manifest rename, never both
    * versions of a key.
    *
    * Convergence: the purge set derives from THIS attempt's staged
    * epoch files (the read-back rule, moved pre-commit — purge ==
    * staged by construction, so a non-deterministic `versions` frame
    * cannot desync the two legs); a crash anywhere leaves only
    * unreferenced staged parts (vacuum sweeps), and a rerun with the
    * same `epochId` after the original committed loses the idempotent
    * rename and its replayed parts are dropped. The purge plan
    * excludes `upsert-pq-<epochId>` itself, so a replay against the
    * committed original purges nothing. `clusterBy` range-clusters
    * both the version epoch and the purge survivors. Rows whose
    * `column` is NULL insert but never purge anything (IN semantics).
    * Maintenance op, caller-serialized per store; a concurrent
    * maintenance commit that shadows the purge's planned sources
    * refuses at the manifest with [[StoreCommitConflictException]]
    * (re-run to converge).
    */
  def upsert(
      spark: SparkSession,
      storeDir: String,
      versions: DataFrame,
      column: String,
      epochId: String,
      clusterBy: Option[(String, Int)] = None
  ): StoreLifecycle.UpsertReport = {
    import org.apache.spark.sql.functions.col
    require(epochId.matches("[A-Za-z0-9._-]+"), s"epochId must be [A-Za-z0-9._-]+, got: $epochId")
    val conf         = ContentStore.driverHadoopConf()
    val name         = s"upsert-pq-$epochId"
    val (fsys, root) = ContentStore.fs(storeDir, conf)
    ensureFormat(storeDir, conf)
    ensureSchema(versions.schema, storeDir, conf)
    val shards = ContentStore.recordedDataShards(storeDir, conf)
    def lay(df: DataFrame): DataFrame = clusterBy.fold(df) { case (c, parts) =>
      import org.apache.spark.sql.functions.col
      df.repartitionByRange(parts, col(c)).sortWithinPartitions(c)
    }
    // 1. STAGE the version epoch: parts land in data/ unreferenced
    val moved1 = stageParts(lay(versions), shards, fsys, root)
    // 2. purge keys read back from the STAGED parts (pre-commit
    //    read-back: purge == staged, replay-safe via the exclude).
    //    ADAPTIVE (r19, the B82 bench fix): a small staged epoch —
    //    by total staged bytes, driver metadata only — collects its
    //    distinct keys (one narrow job over the new parts' key
    //    column) and purges through the Seq planner: driver-loop
    //    bounds pruning + one codegen'd isin locate, no joins, no
    //    fingerprint job. Past the byte threshold, or past
    //    [[PqSeqPurgeMaxKeys]] distinct keys (an isin that large
    //    stops being a sane expression), the keys stay a FRAME in
    //    [[planPurgeFrame]] — corpus-scale cohorts never land on the
    //    driver. Same plan object, same single-manifest commit.
    val rdr = recordedSchema(storeDir, conf).fold(spark.read)(s => spark.read.schema(s))
    def stagedFrame = rdr.parquet(moved1.map(f => new Path(root, s"data/$f").toString): _*)
    val plan =
      if (moved1.isEmpty) None
      else {
        val stagedBytes = moved1.map(f =>
          fsys.getFileStatus(new Path(root, s"data/$f")).getLen).sum
        val smallKeys: Option[Seq[Any]] =
          if (stagedBytes > PqSeqPurgeMaxStagedBytes) None
          else {
            // RAW rows + driver-side dedupe: a distinct() here would
            // add a whole shuffle stage to collect a few hundred keys
            // (CollectLimit scans the small staged parts directly).
            // Epochs with >100k raw rows in <16 MB fall back to the
            // frame planner — slightly conservative, never wrong.
            val sample = stagedFrame.select(column).where(col(column).isNotNull)
              .limit(PqSeqPurgeMaxKeys + 1).collect()
            if (sample.length > PqSeqPurgeMaxKeys) None
            else Some(sample.map(_.get(0)).distinct.toSeq)
          }
        smallKeys match {
          case Some(vals) => planPurgeSeq(spark, storeDir, column, vals, Set(name))
          case None => planPurgeFrame(
            spark, storeDir, column, stagedFrame.select(column), Set(name), None)
        }
      }
    // 3. STAGE the purge survivors
    val moved2   = plan.fold(Seq.empty[String])(p => stageParts(lay(p.survivors), shards, fsys, root))
    val carried  = plan.fold(Seq.empty[String])(_.carried)
    val affected = plan.fold(Seq.empty[String])(_.affected)
    // 4. ONE atomic manifest: epoch + survivors + carried, shadowing
    //    the affected manifests
    val (carryLines, covered) =
      if (carried.isEmpty) (Nil, Set.empty[String])
      else harvestStats(fsys, root, affected, carried.toSet)
    writeFileStats(fsys, root, name,
      carried.filterNot(covered) ++ moved1 ++ moved2, conf, extraLines = carryLines)
    val guard = new Constraints.CommitGuard(storeDir, moved1 ++ moved2, conf)
    ContentStoreWrite.writeManifest(
      storeDir,
      name,
      Array(StoreFilesCommitMsg(moved1 ++ moved2, (moved1.size + moved2.size).toLong)),
      conf,
      idempotent = true,
      compactSources = if (affected.isEmpty) None else Some(affected),
      dataShards = shards,
      carryMessages =
        if (carried.isEmpty) Array.empty
        else Array(StoreFilesCommitMsg(carried, carried.size.toLong)),
      // B90 two-sided: the version epoch's fresh values validate like
      // any append — immediately before and after the rename
      beforeRename = guard.pre,
      afterRename = guard.post
    )
    StoreLifecycle.UpsertReport(
      name,
      plan.fold(StoreLifecycle.DeleteReport(None, 0L, 0, 0, 0)) { p =>
        StoreLifecycle.DeleteReport(Some(name), p.deleted, moved2.size, p.matchedFiles.size,
          carried.size)
      })
  }

  /** STREAMING append leg — the write-side twin of the
    * [[ColumnarStore]] tail, completing the columnar store's
    * read/write × batch/streaming matrix: each micro-batch becomes ONE
    * manifest-committed columnar epoch via `foreachBatch` + [[append]].
    *
    * Exactly-once on the engine's at-least-once replay: the manifest
    * name is keyed (writer id, batchId), and the writer id derives
    * from the CHECKPOINT location — stable across restarts of the same
    * logical query (the engine's own query id is not available before
    * `start()`), distinct for different queries sharing a store. A
    * crash-restart replays the batch, stages fresh parquet parts, and
    * loses the idempotent manifest rename — the replayed files are
    * dropped by [[ContentStoreWrite.writeManifest]]'s
    * already-committed path, exactly the K-V STREAMING_WRITE protocol.
    *
    * This is deliberately `foreachBatch`, not a DSv2 StreamingWrite:
    * the epoch commit is a driver-side manifest operation around a
    * distributed parquet stage (the [[append]] protocol), and
    * duplicating it as connector machinery would add surface without
    * capability.
    */
  def streamingAppend(
      stream: DataFrame,
      storeDir: String,
      checkpoint: String,
      availableNow: Boolean = false,
      dataShards: Int = 0
  ): org.apache.spark.sql.streaming.StreamingQuery = {
    // the writer id must be stable across RESTARTS of the same logical
    // query, and a restart may spell the same checkpoint differently
    // (relative vs absolute, trailing slash, file: scheme) — hash the
    // FS-qualified URI, not the raw string, or a replayed micro-batch
    // commits under a fresh manifest name and duplicates its rows
    // instead of hitting the idempotent already-committed path
    val qualified = {
      val (fsys, _) = ContentStore.fs(checkpoint, ContentStore.driverHadoopConf())
      fsys.makeQualified(new Path(checkpoint)).toUri.toString.stripSuffix("/")
    }
    val writerId = java.security.MessageDigest.getInstance("SHA-256")
      .digest(qualified.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString
    val base = stream.writeStream
    (if (availableNow)
       base.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
     else base)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        append(batch, storeDir,
          manifestName = Some(s"epoch-pq-$writerId-$batchId"),
          dataShards = dataShards): Unit
      }
      .start()
  }

  /** STREAMING UPSERT — CDC apply: each micro-batch MERGES into the
    * store ([[upsert]] per batch — fresh version epoch + scoped purge
    * of the keys' older versions), so the store continuously tracks
    * the LAST delivered version per key. This is the foreachBatch
    * MERGE idiom lakehouse streaming pipelines run (Delta's
    * streaming-merge pattern), on the store's own primitives.
    *
    * Exactly-once on the engine's at-least-once replay, inherited from
    * the two composed parts: the epoch id is (checkpoint-derived
    * writer id, batchId) — a replayed batch's append loses the
    * idempotent rename, and its purge re-derives from the ORIGINAL
    * committed epoch (the upsert read-back rule), converging instead
    * of double-applying. Within one batch, keys are expected unique
    * (dedupe upstream — CDC compaction); across batches, later batches
    * win, which is exactly arrival order.
    */
  def streamingUpsert(
      stream: DataFrame,
      storeDir: String,
      column: String,
      checkpoint: String,
      availableNow: Boolean = false,
      clusterBy: Option[(String, Int)] = None
  ): org.apache.spark.sql.streaming.StreamingQuery = {
    val qualified = {
      val (fsys, _) = ContentStore.fs(checkpoint, ContentStore.driverHadoopConf())
      fsys.makeQualified(new Path(checkpoint)).toUri.toString.stripSuffix("/")
    }
    val writerId = java.security.MessageDigest.getInstance("SHA-256")
      .digest(qualified.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString
    val base = stream.writeStream
    (if (availableNow)
       base.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
     else base)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        upsert(batch.sparkSession, storeDir, batch, column,
          s"$writerId-$batchId", clusterBy): Unit
      }
      .start()
  }

  /** The live snapshot to pin — identical semantics to
    * [[ContentStore.snapshotManifests]] (it IS that call; the manifest
    * layer is shared).
    */
  def snapshot(storeDir: String): Seq[String] = ContentStore.snapshotManifests(storeDir)

  /** Z-ORDER the frame for append: range-cluster on a Morton
    * interleave of two domain-normalized integral columns, so each
    * written file covers a small RECTANGLE of the (a, b) key space and
    * the recorded `_stats` bounds stay tight on BOTH columns — the
    * multi-dimension file skipping single-column clustering cannot
    * give (a `clusterBy(a)` store answers b-scoped reads by scanning
    * everything; Delta's OPTIMIZE ZORDER BY trade, re-expressed as a
    * layout projection). Each column maps to a `bits`-wide bucket by
    * linear scaling over its observed [min, max] (one tiny agg job),
    * buckets interleave via the shared Morton arithmetic
    * (codegen'd shift/mask — no UDF), and the frame range-partitions +
    * sorts on the z value WITHOUT adding a column (the append schema
    * is untouched). Use before [[append]], or through [[compact]]'s
    * `zorderBy` to re-establish the layout at OPTIMIZE time.
    *
    * The z key orders buckets, so per-file bounds on each dimension
    * are ~domain/2^(prefix/2) wide — a two-dim range read prunes
    * multiplicatively (spec-pinned: BOTH columns' plannedFiles shrink
    * on a z-ordered store). NULLs in either column sort together
    * (null z) and simply never prune. Non-integral domains: bucket
    * them yourself (dates → epoch days) before calling.
    */
  def zcluster(
      df: DataFrame,
      colA: String,
      colB: String,
      parts: Int,
      bits: Int = 16
  ): DataFrame = {
    import org.apache.spark.sql.functions.{col, floor, least, lit, max, min}
    val bounds = df
      .select(col(colA).cast("long").as("a"), col(colB).cast("long").as("b"))
      .agg(min("a"), max("a"), min("b"), max("b"))
      .head()
    if (bounds.isNullAt(0) || bounds.isNullAt(2)) return df // empty or all-null: nothing to order
    val hi = (1L << bits) - 1
    def bucket(c: String, lo: Long, width: Long) =
      least(lit(hi), floor(
        (col(c).cast("long") - lit(lo)).cast("double") / lit(width.toDouble) * lit(hi.toDouble))
        .cast("long"))
    val z = graft.operators.Layout.morton(
      bucket(colA, bounds.getLong(0), math.max(1L, bounds.getLong(1) - bounds.getLong(0))),
      bucket(colB, bounds.getLong(2), math.max(1L, bounds.getLong(3) - bounds.getLong(2))),
      bits)
    df.repartitionByRange(parts, z).sortWithinPartitions(z)
  }

  /** Columnar OPTIMIZE: fold all but the newest `keepLast` live
    * manifests into one epoch via a distributed parquet rewrite —
    * same source selection, deterministic name, sidecar shadowing and
    * race idempotence as [[StoreLifecycle.compactEpochs]], different
    * rewrite kernel.
    *
    * `clusterBy` = (column, parts): range-cluster the rewritten epoch.
    * Without it, the rewrite's arbitrary row order makes every
    * rewritten file's footer bounds span the whole key domain, so the
    * `_stats` skipping the clustered appends bought ([[readRange]],
    * the keyRange tail, C22j lookups) silently degrades to
    * read-everything after the first OPTIMIZE. Compaction is exactly
    * the moment to (re)establish clustering — it is the one pass that
    * rewrites history anyway; values cannot move either way (one
    * extra range shuffle inside the rewrite). `zorderBy` =
    * (colA, colB, parts) is the two-dimension variant ([[zcluster]]);
    * mutually exclusive with `clusterBy`.
    */
  def compact(
      spark: SparkSession,
      storeDir: String,
      keepLast: Int = 0,
      clusterBy: Option[(String, Int)] = None,
      zorderBy: Option[(String, String, Int)] = None,
      targetBytes: Long = 0
  ): Option[String] = {
    require(clusterBy.isEmpty || zorderBy.isEmpty,
      "compact: clusterBy and zorderBy are mutually exclusive")
    val conf = ContentStore.driverHadoopConf()
    // targetBytes > 0: small-file binpack selection (one bin per call)
    // instead of fold-all-but-keepLast — see smallCompactionPlan
    val plan =
      if (targetBytes > 0) StoreLifecycle.smallCompactionPlan(storeDir, targetBytes, keepLast, conf)
      else if (clusterBy.isDefined || zorderBy.isDefined)
        // explicit re-layout: a single live manifest still rewrites
        // (relayoutPlan) — "nothing to fold" must not skip the layout
        // rebuild the caller asked for
        StoreLifecycle.relayoutPlan(storeDir, keepLast, conf)
      else StoreLifecycle.compactionPlan(storeDir, keepLast, conf)
    plan.map { case (sources, name) =>
      val rows = read(spark, storeDir, sources)
      val clustered = clusterBy.fold(rows) { case (c, parts) =>
        import org.apache.spark.sql.functions.col
        rows.repartitionByRange(parts, col(c)).sortWithinPartitions(c)
      }
      val rewritten = zorderBy.fold(clustered) { case (a, b, parts) =>
        zcluster(rows, a, b, parts)
      }
      append(rewritten, storeDir, Some(name), Some(sources))
      name
    }
  }
}
