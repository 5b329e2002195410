package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.{BooleanType, IntegerType, LongType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** B93: SQL-invocable store maintenance — the Iceberg
  * `CALL catalog.system.<verb>(...)` shape on Spark 4's DSv2
  * ProcedureCatalog, so table health no longer needs whoever owns a
  * JVM: compaction/binpack, z-order re-clustering, vacuum, epoch
  * retirement and the pin-lease lifecycle are each one SQL statement.
  * Every procedure resolves its `table` argument through the owning
  * [[GraftCatalog]] (same identifier rules as SELECT) and calls the
  * SAME maintenance verb the Scala API exposes — the procedure layer
  * adds invocation, never a second implementation, so the OCC /
  * atomic-swap / pinned-reader contracts are exactly the documented
  * ones. Each call returns one summary row (the committed manifest
  * name, the vacuum action count, the lease expiry) as a LocalScan —
  * driver-side metadata, consistent with maintenance verbs being
  * driver-side manifest operations around distributed stages.
  *
  * Named-argument SQL (`CALL g.system.compact(table => 'docs',
  * zorder_by => 'doc_id,n_chars')`) rides the engine's own binding;
  * optional parameters take SQL DEFAULT values, so positional calls
  * work too.
  */
private[sources] object GraftProcedures {

  val names: Seq[String] =
    Seq("compact", "vacuum", "expire_epochs", "acquire_pin", "renew_pin", "release_pin",
      "manifests", "pins", "constraints", "purge_dropped", "rollback_to_epoch")

  def load(catalog: GraftCatalog, name: String): UnboundProcedure = name match {
    case "compact"       => compactProc(catalog)
    case "vacuum"        => vacuumProc(catalog)
    case "expire_epochs" => expireProc(catalog)
    case "acquire_pin"   => pinProc(catalog, "acquire_pin")
    case "renew_pin"     => pinProc(catalog, "renew_pin")
    case "release_pin"   => releaseProc(catalog)
    case "manifests"     => manifestsProc(catalog)
    case "pins"          => pinsProc(catalog)
    case "constraints"   => constraintsProc(catalog)
    case "purge_dropped" => purgeDroppedProc(catalog)
    case "rollback_to_epoch" => rollbackProc(catalog)
    case other =>
      throw new IllegalArgumentException(
        s"GraftCatalog: no procedure system.$other — available: ${names.mkString(", ")}")
  }

  private def param(n: String, t: org.apache.spark.sql.types.DataType) =
    ProcedureParameter.in(n, t).build()
  private def paramD(n: String, t: org.apache.spark.sql.types.DataType, default: String) =
    ProcedureParameter.in(n, t).defaultValue(default).build()

  /** One-row LocalScan result (maintenance summaries are driver-side
    * metadata; values pre-converted to Catalyst form).
    */
  private def oneRow(schema: StructType, values: Any*): java.util.Iterator[Scan] = {
    val scan: Scan = new LocalScan {
      override def rows(): Array[InternalRow] = Array(InternalRow.fromSeq(values))
      override def readSchema(): StructType   = schema
    }
    java.util.List.of(scan).iterator()
  }

  private def utf8(s: String): UTF8String = if (s == null) null else UTF8String.fromString(s)

  private abstract class Proc(procName: String, ps: Array[ProcedureParameter])
      extends UnboundProcedure with BoundProcedure {
    override def name(): String                            = procName
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter]   = ps
    override def isDeterministic: Boolean                  = false
  }

  /** compact/binpack + optional re-layout: columnar stores take
    * `cluster_by` (range clustering) or `zorder_by` ('colA,colB' —
    * the B84 interleave) with `parts`; the K-V payload compacts/
    * binpacks only (its layout fact is buckets, preserved by the
    * verb itself). `target_bytes > 0` switches source selection to
    * the small-file binpack. Returns the committed replacement
    * manifest, NULL when nothing qualified.
    */
  private def compactProc(catalog: GraftCatalog) = new Proc("compact", Array(
    param("table", StringType),
    paramD("keep_last", IntegerType, "0"),
    paramD("target_bytes", LongType, "0"),
    paramD("cluster_by", StringType, "NULL"),
    paramD("zorder_by", StringType, "NULL"),
    paramD("parts", IntegerType, "4"))) {
    override def description(): String =
      "compact/binpack a store's oldest live manifests into one, optionally re-clustering"
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val spark = SparkSession.active
      val path  = catalog.resolveStorePath(input.getUTF8String(0).toString)
      val keep  = input.getInt(1)
      val bytes = input.getLong(2)
      val clusterBy = if (input.isNullAt(3)) None else Some(input.getUTF8String(3).toString)
      val zorderBy  = if (input.isNullAt(4)) None else Some(input.getUTF8String(4).toString)
      val parts     = input.getInt(5)
      val conf      = ContentStore.driverHadoopConf()
      val columnar  = ContentStore.recordedFormat(path, conf).contains("parquet")
      val committed =
        if (columnar)
          ParquetEpochs.compact(spark, path, keep,
            clusterBy = clusterBy.map(c => (c, parts)),
            zorderBy = zorderBy.map { z =>
              val cs = z.split(",").map(_.trim).filter(_.nonEmpty)
              require(cs.length == 2,
                s"compact: zorder_by wants 'colA,colB', got '$z'")
              (cs(0), cs(1), parts)
            },
            targetBytes = bytes)
        else {
          require(clusterBy.isEmpty && zorderBy.isEmpty,
            "compact: cluster_by/zorder_by apply to columnar stores — the K-V payload's " +
              "layout fact is its bucket count, preserved by compaction itself")
          StoreLifecycle.compactEpochs(spark, path, keep, targetBytes = bytes)
        }
      oneRow(new StructType().add("manifest", StringType), utf8(committed.orNull))
    }
  }

  /** vacuum(grace_ms, dry_run): sweep expired shadowed manifests and
    * unreferenced files past the retention grace. Returns the action
    * count (what WOULD happen under dry_run).
    */
  private def vacuumProc(catalog: GraftCatalog) = new Proc("vacuum", Array(
    param("table", StringType),
    param("grace_ms", LongType),
    paramD("dry_run", BooleanType, "false"))) {
    override def description(): String =
      "sweep expired shadowed manifests and unreferenced files past the retention grace"
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val spark   = SparkSession.active
      val path    = catalog.resolveStorePath(input.getUTF8String(0).toString)
      val actions = StoreLifecycle.vacuum(spark, path, input.getLong(1),
        ContentStore.driverHadoopConf(), dryRun = !input.isNullAt(2) && input.getBoolean(2))
      oneRow(new StructType().add("actions", LongType), actions.size.toLong)
    }
  }

  /** expire_epochs(cutoff_ms): retire manifests at or before the
    * cutoff in one metadata commit. `cutoff_ms` is REQUIRED and must
    * be explicit — the pre-r20 default (NULL = retire EVERYTHING)
    * made a typo'd or positional call a silent truncate of the live
    * view, the one thing a maintenance procedure's default must never
    * be (ADVICE r19). Retiring everything stays available, but only
    * behind the explicit sentinel `cutoff_ms => -1` (SQL TRUNCATE's
    * verb spelled on purpose).
    */
  private def expireProc(catalog: GraftCatalog) = new Proc("expire_epochs", Array(
    param("table", StringType),
    paramD("cutoff_ms", LongType, "NULL"))) {
    override def description(): String =
      "retire manifests at or before the cutoff mtime in one metadata-only commit " +
        "(cutoff_ms required; -1 retires everything — the explicit truncate)"
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val path = catalog.resolveStorePath(input.getUTF8String(0).toString)
      require(!input.isNullAt(1),
        "expire_epochs: cutoff_ms is required — pass an explicit mtime cutoff, or " +
          "cutoff_ms => -1 to retire EVERY live manifest (the truncate verb)")
      val raw    = input.getLong(1)
      val cutoff = if (raw == -1L) Long.MaxValue else raw
      oneRow(new StructType().add("manifest", StringType),
        utf8(StoreLifecycle.expireEpochs(path, cutoff).orNull))
    }
  }

  /** acquire_pin/renew_pin(id, ttl_ms): the vacuum-safe snapshot lease
    * (B79/B85) from SQL — the returned id is directly usable as
    * `FOR VERSION AS OF '<id>'`.
    */
  private def pinProc(catalog: GraftCatalog, which: String) = new Proc(which, Array(
    param("table", StringType),
    param("id", StringType),
    param("ttl_ms", LongType))) {
    override def description(): String =
      s"$which a vacuum-safe snapshot lease usable as FOR VERSION AS OF"
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val path  = catalog.resolveStorePath(input.getUTF8String(0).toString)
      val id    = input.getUTF8String(1).toString
      val ttl   = input.getLong(2)
      val hconf = ContentStore.driverHadoopConf()
      val lease =
        if (which == "acquire_pin") StoreLifecycle.acquirePin(path, id, ttl, hconf)
        else StoreLifecycle.renewPin(path, id, ttl, hconf)
      oneRow(
        new StructType().add("id", StringType).add("expires_at_ms", LongType)
          .add("manifests", IntegerType),
        utf8(lease.id), lease.expiresAtMs, lease.manifests.size)
    }
  }

  /** Multi-row LocalScan result (introspection procedures). */
  private def manyRows(schema: StructType, data: Seq[Seq[Any]]): java.util.Iterator[Scan] = {
    val scan: Scan = new LocalScan {
      override def rows(): Array[InternalRow] = data.map(InternalRow.fromSeq).toArray
      override def readSchema(): StructType   = schema
    }
    java.util.List.of(scan).iterator()
  }

  /** manifests(table): one row per COMMITTED manifest — the store's
    * snapshot log from SQL (name, live|shadowed, file count, mtime).
    * Shadowed rows are history readable by pin/time-travel until
    * vacuum's grace; the metadata read is manifest-listing-bounded,
    * never data I/O.
    */
  private def manifestsProc(catalog: GraftCatalog) = new Proc("manifests", Array(
    param("table", StringType))) {
    override def description(): String =
      "one row per committed manifest: name, live|shadowed, file count, mtime"
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val path  = catalog.resolveStorePath(input.getUTF8String(0).toString)
      val conf  = ContentStore.driverHadoopConf()
      val live  = ContentStore.effectiveManifestNames(path, conf).toSet
      val (fsys, root) = ContentStore.fs(path, conf)
      // ONE directory listing carries the mtimes (a per-manifest
      // getFileStatus would be O(manifests) RPCs on an object store)
      val mtimes = fsys.listStatus(new org.apache.hadoop.fs.Path(root, "_manifest"))
        .filterNot(_.getPath.getName.startsWith("."))
        .map(st => st.getPath.getName -> st.getModificationTime).toMap
      val rows = ContentStore.manifestNames(path, conf).sorted.map { m =>
        val files = ContentStore.filesInManifest(path, m, conf).size
        Seq[Any](utf8(m), utf8(if (live(m)) "live" else "shadowed"), files,
          mtimes.getOrElse(m, 0L))
      }
      manyRows(new StructType().add("name", StringType).add("state", StringType)
        .add("files", IntegerType).add("mtime_ms", LongType), rows)
    }
  }

  /** pins(table): the live pin leases (id, expiry, manifest count). */
  private def pinsProc(catalog: GraftCatalog) = new Proc("pins", Array(
    param("table", StringType))) {
    override def description(): String = "live snapshot leases: id, expiry, manifest count"
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val path = catalog.resolveStorePath(input.getUTF8String(0).toString)
      val rows = StoreLifecycle.pins(path, ContentStore.driverHadoopConf())
        .sortBy(_.id)
        .map(l => Seq[Any](utf8(l.id), l.expiresAtMs, l.manifests.size))
      manyRows(new StructType().add("id", StringType).add("expires_at_ms", LongType)
        .add("manifests", IntegerType), rows)
    }
  }

  /** constraints(table): every recorded constraint — ENFORCED CHECKs
    * and the B97 informational key facts, with kind and RELY visible.
    */
  private def constraintsProc(catalog: GraftCatalog) = new Proc("constraints", Array(
    param("table", StringType))) {
    override def description(): String =
      "recorded constraints: name, kind (check|primary|unique|foreign), definition, rely"
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val path = catalog.resolveStorePath(input.getUTF8String(0).toString)
      val conf = ContentStore.driverHadoopConf()
      val checks = Constraints.list(path, conf)
        .map { case (n, e) => Seq[Any](utf8(n), utf8("check"), utf8(e), true) }
      val keys = KeyFacts.list(path, conf).map {
        case KeyFacts.PrimaryKeyFact(n, cs, rely) =>
          Seq[Any](utf8(n), utf8("primary"), utf8(cs.mkString(",")), rely)
        case KeyFacts.UniqueFact(n, cs, rely) =>
          Seq[Any](utf8(n), utf8("unique"), utf8(cs.mkString(",")), rely)
        case KeyFacts.ForeignKeyFact(n, cs, ref, rcs, rely) =>
          Seq[Any](utf8(n), utf8("foreign"),
            utf8(s"${cs.mkString(",")} -> $ref(${rcs.mkString(",")})"), rely)
      }
      manyRows(new StructType().add("name", StringType).add("kind", StringType)
        .add("definition", StringType).add("rely", BooleanType), checks ++ keys)
    }
  }

  /** rollback_to_epoch(table, as_of_ms): the restore verb
    * ([[StoreLifecycle.rollbackToEpoch]]) — make the live view equal
    * the effective snapshot as of the timestamp, one metadata-only
    * replacement commit; history (time travel to the bad interval) is
    * preserved. Returns the restore manifest, NULL when the live view
    * already equals the as-of view.
    */
  private def rollbackProc(catalog: GraftCatalog) = new Proc("rollback_to_epoch", Array(
    param("table", StringType),
    param("as_of_ms", LongType))) {
    override def description(): String =
      "restore the live view to the effective snapshot as of the timestamp " +
        "(one metadata-only replacement commit; history preserved)"
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val path = catalog.resolveStorePath(input.getUTF8String(0).toString)
      oneRow(new StructType().add("manifest", StringType),
        utf8(StoreLifecycle.rollbackToEpoch(path, input.getLong(1)).orNull))
    }
  }

  /** purge_dropped(grace_ms, namespace): the reclamation half of DROP
    * TABLE's tombstone contract — recursively delete every store in
    * the namespace whose `_dropped` marker is at least `grace_ms` old
    * (marker mtime, vacuum's age-gate rule), skip-and-report younger
    * tombstones and any that acquired a live pin since the drop, and
    * sweep alias pointers whose target directory no longer exists.
    * Explicit grace for the same reason vacuum takes one: the grace IS
    * the undo window (remove `_dropped` to recover a mis-dropped
    * store). One row per action: (name, purged|kept_young|kept_pinned|
    * stale_alias).
    */
  private def purgeDroppedProc(catalog: GraftCatalog) = new Proc("purge_dropped", Array(
    param("grace_ms", LongType),
    paramD("namespace", StringType, "''"))) {
    override def description(): String =
      "reclaim tombstoned (dropped) stores past the retention grace; sweep stale aliases"
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val grace = input.getLong(0)
      val ns =
        if (input.isNullAt(1)) Seq.empty[String]
        else input.getUTF8String(1).toString.split("\\.").toSeq.map(_.trim).filter(_.nonEmpty)
      val base  = catalog.namespaceDir(ns)
      val conf  = ContentStore.driverHadoopConf()
      val now   = System.currentTimeMillis()
      val (fsys, bdir) = ContentStore.fs(base, conf)
      val rows = Seq.newBuilder[Seq[Any]]
      if (fsys.exists(bdir)) {
        fsys.listStatus(bdir).filter(_.isDirectory).foreach { st =>
          val marker = new org.apache.hadoop.fs.Path(st.getPath, "_dropped")
          if (fsys.exists(marker)) {
            val nm  = st.getPath.getName
            val age = now - fsys.getFileStatus(marker).getModificationTime
            val livePins = StoreLifecycle.pins(st.getPath.toString, conf)
              .exists(_.expiresAtMs > now)
            if (age < grace) rows += Seq[Any](utf8(nm), utf8("kept_young"))
            else if (livePins) rows += Seq[Any](utf8(nm), utf8("kept_pinned"))
            else {
              fsys.delete(st.getPath, true): Unit
              rows += Seq[Any](utf8(nm), utf8("purged"))
            }
          }
        }
        val aliasDir = new org.apache.hadoop.fs.Path(bdir, "_alias")
        if (fsys.exists(aliasDir)) {
          fsys.listStatus(aliasDir).filterNot(_.getPath.getName.startsWith(".")).foreach { st =>
            val target = {
              val in = fsys.open(st.getPath)
              try {
                val buf = new java.io.ByteArrayOutputStream()
                val b   = new Array[Byte](256)
                var n   = in.read(b)
                while (n >= 0) { buf.write(b, 0, n); n = in.read(b) }
                new String(buf.toByteArray, "UTF-8").trim
              } finally in.close()
            }
            if (target.isEmpty || !fsys.exists(new org.apache.hadoop.fs.Path(bdir, target))) {
              fsys.delete(st.getPath, false): Unit
              rows += Seq[Any](utf8(s"_alias/${st.getPath.getName}"), utf8("stale_alias"))
            }
          }
        }
      }
      manyRows(new StructType().add("name", StringType).add("action", StringType),
        rows.result())
    }
  }

  private def releaseProc(catalog: GraftCatalog) = new Proc("release_pin", Array(
    param("table", StringType),
    param("id", StringType))) {
    override def description(): String = "release a snapshot lease"
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val path = catalog.resolveStorePath(input.getUTF8String(0).toString)
      StoreLifecycle.releasePin(path, input.getUTF8String(1).toString,
        ContentStore.driverHadoopConf())
      oneRow(new StructType().add("released", BooleanType), true)
    }
  }
}
