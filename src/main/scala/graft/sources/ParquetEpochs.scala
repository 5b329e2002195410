package graft.sources

import java.util.UUID

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

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
    */
  def append(
      df: DataFrame,
      storeDir: String,
      manifestName: Option[String] = None,
      compactSources: Option[Seq[String]] = None
  ): String = {
    val conf         = ContentStore.driverHadoopConf()
    val (fsys, root) = ContentStore.fs(storeDir, conf)
    ensureFormat(storeDir, conf)
    val uuid         = UUID.randomUUID().toString
    val staging      = new Path(root, s"_staging/$uuid")
    df.write.parquet(staging.toString)
    val parts = fsys
      .listStatus(staging)
      .map(_.getPath.getName)
      .filter(n => n.startsWith("part-") && n.endsWith(".parquet"))
      .sorted
    fsys.mkdirs(new Path(root, "data"))
    val moved = parts.zipWithIndex.map { case (part, i) =>
      val dest = f"pq-$uuid-$i%05d.parquet"
      if (!fsys.rename(new Path(staging, part), new Path(root, s"data/$dest")))
        throw new java.io.IOException(s"ParquetEpochs: staging move failed for $part")
      dest
    }.toSeq
    fsys.delete(staging, true): Unit
    val name = manifestName.getOrElse(s"batch-pq-$uuid")
    ContentStoreWrite.writeManifest(
      storeDir,
      name,
      Array(StoreFilesCommitMsg(moved, moved.size.toLong)),
      conf,
      idempotent = manifestName.isDefined,
      compactSources = compactSources
    )
    name
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
        if (now.isEmpty) { // crashed-empty heal, the _buckets pattern
          fsys.delete(new Path(root, "_format"), false): Unit
          now = tryRecord()
        }
        if (!now.contains("parquet"))
          throw new IllegalStateException(
            s"ParquetEpochs: store $storeDir raced to format '${now.orNull}'")
    }
  }

  /** Read the union of the named (pinned) manifests' parquet files —
    * the same time-travel contract as the K-V store's `manifests`
    * option: commits after the pin are invisible. Manifest resolution
    * is metadata-bounded (line reads); the data read is a plain
    * parquet scan with all its pruning.
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
    require(files.nonEmpty, s"ParquetEpochs.read: no data files under manifests $manifests")
    spark.read.parquet(files: _*)
  }

  /** The live snapshot to pin — identical semantics to
    * [[ContentStore.snapshotManifests]] (it IS that call; the manifest
    * layer is shared).
    */
  def snapshot(storeDir: String): Seq[String] = ContentStore.snapshotManifests(storeDir)

  /** Columnar OPTIMIZE: fold all but the newest `keepLast` live
    * manifests into one epoch via a distributed parquet rewrite —
    * same source selection, deterministic name, sidecar shadowing and
    * race idempotence as [[StoreLifecycle.compactEpochs]], different
    * rewrite kernel.
    */
  def compact(spark: SparkSession, storeDir: String, keepLast: Int = 0): Option[String] = {
    val conf = ContentStore.driverHadoopConf()
    StoreLifecycle.compactionPlan(storeDir, keepLast, conf).map { case (sources, name) =>
      append(read(spark, storeDir, sources), storeDir, Some(name), Some(sources))
      name
    }
  }
}
