package graft.sources

import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.catalog.{Identifier, SupportsRead, SupportsWrite, Table, TableCapability, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, InsertableRelation, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

/** B88: SQL/catalog addressability of stores — the resolution surface
  * every store has lacked: until now a store was reachable only
  * through the Scala API or `spark.read.format(...)` with a path
  * option, so a SQL user could not `SELECT ... FROM store` and
  * time-travel could not be expressed from SQL at all. This is the
  * Delta/Iceberg shape — a `TableCatalog` mapping identifiers to store
  * paths under one warehouse root — over the DSv2 tables that already
  * exist. (Reference analog: consumers address state by NAME — table
  * names in lcount.go:171-196 — never by filesystem path.)
  *
  * Wire-up (session conf, the standard plugin contract):
  * {{{
  *   spark.sql.catalog.graft           = graft.sources.GraftCatalog
  *   spark.sql.catalog.graft.warehouse = /path/to/stores
  * }}}
  * then `SELECT * FROM graft.my_store` resolves
  * `/path/to/stores/my_store` (namespaces map to subdirectories), and
  * payload detection is the store's own `_format` marker: columnar
  * stores load a batch table over the recorded schema, anything else
  * loads the K-V [[ContentStoreTable]] (its full batch + streaming +
  * write surface — `INSERT INTO graft.s SELECT ...` works because the
  * table already supports BATCH_WRITE).
  *
  * TIME TRAVEL from SQL, both standard forms, resolved at loadTable
  * (SQL has no scan-option channel):
  *  - `FOR TIMESTAMP AS OF <ts>` → [[ContentStore.snapshotManifestsAsOf]]
  *    (the B85 view, micros→millis);
  *  - `FOR VERSION AS OF '<v>'` → a PIN LEASE id ([[StoreLifecycle
  *    .acquirePin]] — the lease IS the named version, which also makes
  *    it vacuum-safe) or, failing that, an explicit comma-separated
  *    manifest list.
  *
  * The catalog is a RESOLUTION surface, not a second engine: columnar
  * batch scans reuse the store's vectorized per-file reader
  * ([[ColumnarStoreReaderFactory]]) with column pruning pushed to the
  * parquet reader and PLANNING-TIME file skipping from the `_stats`
  * bounds (the B65b map) for pushed comparison filters — every filter
  * stays RESIDUAL (pushedFilters reports none), so skipping is
  * I/O-only and can never change values, exactly the readRange
  * contract. DDL: CREATE TABLE / CTAS bootstrap a store through the
  * stores' own first-write metadata protocol (see [[createTable]]);
  * ALTER adds columns (schema evolution) and CHECK constraints;
  * DROP TABLE tombstones a data-bearing store (name unresolvable
  * immediately, files reclaimed by `CALL system.purge_dropped` after a
  * grace, live pins refuse — see [[dropTable]]); RENAME re-points the
  * NAME through a per-namespace `_alias/` map (physical paths never
  * move, so pins and time travel are untouched — see [[renameTable]]).
  *
  * NAME RESOLUTION (one choke point, [[resolve]]): a name is an
  * `_alias/<name>` pointer to a sibling physical directory when the
  * pointer exists, else the directory of the same name; one hop only
  * (alias targets are physical directory names, never other aliases,
  * so chains and cycles cannot be constructed); a directory carrying a
  * `_dropped` tombstone, or reached DIRECTLY while carrying a
  * `_renamed_away` marker, does not resolve. The Scala path API stays
  * the operator surface — markers gate the catalog's name resolution,
  * not the store protocol.
  */
class GraftCatalog extends TableCatalog
    with org.apache.spark.sql.connector.catalog.ProcedureCatalog {

  private var catalogName: String = _
  private var warehouse: String   = _

  /** B93: `CALL <cat>.system.<verb>(...)` — SQL-invocable maintenance
    * ([[GraftProcedures]]): compact/binpack + re-cluster, vacuum,
    * expire_epochs, and the pin-lease lifecycle, each resolving its
    * `table` argument through this catalog and calling the same
    * Scala-API maintenance verb.
    */
  override def loadProcedure(
      ident: Identifier): org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure = {
    require(ident.namespace().toSeq == Seq("system"),
      s"GraftCatalog: procedures live in the 'system' namespace — " +
        s"CALL $catalogName.system.<verb>(...), got ${ident.namespace().mkString(".")}")
    GraftProcedures.load(this, ident.name())
  }

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.toSeq == Seq("system"))
      GraftProcedures.names.map(n => Identifier.of(Array("system"), n)).toArray
    else Array.empty

  /** Procedure-side `table` argument resolution: same identifier
    * grammar as SELECT ('ns.sub.name' under this catalog's
    * warehouse), must already be a store — alias- and
    * tombstone-aware like every name lookup.
    */
  private[sources] def resolveStorePath(table: String): String = {
    val parts = table.split("\\.").toSeq.map(_.trim)
    require(parts.nonEmpty && parts.forall(_.nonEmpty),
      s"GraftCatalog: malformed table identifier '$table'")
    val ident = Identifier.of(parts.init.toArray, parts.last)
    resolve(ident).getOrElse(
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        ident.namespace().toSeq :+ ident.name()))
  }

  /** Namespace directory under the warehouse (procedure-side helper —
    * `purge_dropped` sweeps a namespace, not a table).
    */
  private[sources] def namespaceDir(ns: Seq[String]): String = {
    ns.foreach { p =>
      require(p.matches("[A-Za-z0-9._-]+") && p != "." && p != "..",
        s"GraftCatalog: illegal namespace segment '$p'")
    }
    (warehouse +: ns).mkString("/")
  }

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = options.get("warehouse")
    require(warehouse != null && warehouse.nonEmpty,
      s"GraftCatalog '$name' requires spark.sql.catalog.$name.warehouse")
  }

  override def name(): String = catalogName

  /** SQL `ALTER TABLE ... ADD CONSTRAINT name CHECK (...)` is routed
    * to [[alterTable]] only when the catalog declares support.
    */
  override def capabilities(): java.util.Set[
    org.apache.spark.sql.connector.catalog.TableCatalogCapability] =
    java.util.EnumSet.of(
      org.apache.spark.sql.connector.catalog.TableCatalogCapability.SUPPORT_TABLE_CONSTRAINT)

  /** warehouse-relative namespace directory + the table's simple name,
    * with identifier hygiene (no traversal, no metadata-prefix names
    * resolvable by accident).
    */
  private def baseAndName(ident: Identifier): (String, String) = {
    val parts = ident.namespace().toSeq :+ ident.name()
    parts.foreach { p =>
      require(p.matches("[A-Za-z0-9._-]+") && p != "." && p != "..",
        s"GraftCatalog: illegal identifier segment '$p'")
    }
    ((warehouse +: parts.init).mkString("/"), parts.last)
  }

  private def isStore(path: String): Boolean = {
    val conf         = ContentStore.driverHadoopConf()
    val (fsys, root) = ContentStore.fs(path, conf)
    fsys.exists(new Path(root, "_manifest")) || fsys.exists(new Path(root, "_format"))
  }

  private def marked(path: String, marker: String): Boolean = {
    val conf         = ContentStore.driverHadoopConf()
    val (fsys, root) = ContentStore.fs(path, conf)
    fsys.exists(new Path(root, marker))
  }

  /** The `_alias/<name>` pointer's target (a sibling physical directory
    * name), if one is recorded. Alias files are published by
    * tmp+rename, so a read never observes torn content.
    */
  private def readAlias(base: String, name: String): Option[String] = {
    val conf         = ContentStore.driverHadoopConf()
    val (fsys, root) = ContentStore.fs(base, conf)
    val p            = new Path(root, s"_alias/$name")
    if (!fsys.exists(p)) return None
    val in = fsys.open(p)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val b   = new Array[Byte](256)
      var n   = in.read(b)
      while (n >= 0) { buf.write(b, 0, n); n = in.read(b) }
      Some(new String(buf.toByteArray, "UTF-8").trim).filter(_.nonEmpty)
    } finally in.close()
  }

  /** NAME → live physical store directory; None when the name does not
    * resolve (no store, dropped tombstone, or a renamed-away directory
    * reached directly). ONE alias hop by construction: alias targets
    * are physical directory names, so chains/cycles cannot exist; an
    * alias whose target is not a live store resolves to nothing (a
    * stale pointer — [[createTable]] reclaims it).
    */
  private[sources] def resolve(ident: Identifier): Option[String] = {
    val (base, name) = baseAndName(ident)
    readAlias(base, name) match {
      case Some(target) =>
        val phys = s"$base/$target"
        // an alias-reached directory legitimately carries _renamed_away
        // (that is what a renamed physical dir looks like); _dropped
        // still kills it
        if (isStore(phys) && !marked(phys, "_dropped")) Some(phys) else None
      case None =>
        val phys = s"$base/$name"
        if (isStore(phys) && !marked(phys, "_dropped") && !marked(phys, "_renamed_away"))
          Some(phys)
        else None
    }
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val conf        = ContentStore.driverHadoopConf()
    val base        = (warehouse +: namespace.toSeq).mkString("/")
    val (fsys, dir) = ContentStore.fs(base, conf)
    if (!fsys.exists(dir)) return Array.empty
    // physical stores under their own (un-renamed, un-dropped) names…
    val direct = fsys.listStatus(dir).toSeq
      .filter { st =>
        st.isDirectory && isStore(st.getPath.toString) &&
        !marked(st.getPath.toString, "_dropped") &&
        !marked(st.getPath.toString, "_renamed_away")
      }
      .map(_.getPath.getName)
    // …plus alias names whose target is a live store
    val aliasDir = new Path(dir, "_alias")
    val aliased =
      if (!fsys.exists(aliasDir)) Seq.empty
      else fsys.listStatus(aliasDir).toSeq.map(_.getPath.getName)
        .filterNot(_.startsWith("."))
        .filter(n => resolve(Identifier.of(namespace, n)).isDefined)
    (direct ++ aliased).distinct.sorted.map(Identifier.of(namespace, _)).toArray
  }

  override def tableExists(ident: Identifier): Boolean = resolve(ident).isDefined

  override def loadTable(ident: Identifier): Table = load(ident, None)

  /** `FOR VERSION AS OF 'v'`: v names a pin lease, else lists manifests. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val path = resolvedPath(ident)
    val conf = ContentStore.driverHadoopConf()
    val pin = StoreLifecycle.pins(path, conf).find(_.id == version).map(_.manifests)
      .getOrElse {
        val names     = version.split(",").toSeq.map(_.trim).filter(_.nonEmpty)
        val committed = ContentStore.manifestNames(path, conf).toSet
        val missing   = names.filterNot(committed)
        require(names.nonEmpty && missing.isEmpty,
          s"GraftCatalog: version '$version' is neither a pin lease of $path nor a " +
            s"committed manifest list${if (missing.nonEmpty) s" (missing: ${missing.mkString(", ")})" else ""}")
        names
      }
    load(ident, Some(pin))
  }

  /** `FOR TIMESTAMP AS OF ts` (micros — the TableCatalog contract). */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table =
    load(ident,
      Some(ContentStore.snapshotManifestsAsOf(resolvedPath(ident), timestampMicros / 1000L)))

  private def resolvedPath(ident: Identifier): String =
    resolve(ident).getOrElse(
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        ident.namespace().toSeq :+ ident.name()))

  private def load(ident: Identifier, pinned: Option[Seq[String]]): Table = {
    val path = resolvedPath(ident)
    val conf = ContentStore.driverHadoopConf()
    if (ContentStore.recordedFormat(path, conf).contains("parquet")) {
      val schema = ParquetEpochs.recordedSchema(path, conf).getOrElse(
        throw new IllegalStateException(
          s"GraftCatalog: columnar store $path has no recorded _schema — " +
            "one ParquetEpochs.append heals it forward"))
      new ColumnarBatchTable(path, schema, pinned)
    } else
      new ContentStoreTable(path, bucketedRead = 0, defaultManifests = pinned)
  }

  /** `CREATE TABLE cat.t (...)` / CTAS — SQL bootstrap of a store
    * through the stores' own first-write metadata protocol
    * ([[ParquetEpochs.createStore]] / [[ContentStore.createKvStore]]):
    * the created store records `_format`/`_schema` (columnar) or the
    * `_manifest`+`_buckets` layout (K-V, selected by
    * `TBLPROPERTIES('payload'='kv')` or `USING kv`, schema fixed to
    * the put contract) and is immediately addressable — SELECT reads
    * the empty typed frame, INSERT INTO appends through the existing
    * path, so CTAS is create + insert in Spark's own non-atomic CTAS
    * sequence (an aborted CTAS drops its empty artifact via
    * [[dropTable]]'s empty-store rule). Partition transforms are
    * refused for columnar stores (layout is the store's clustering /
    * z-order maintenance, not directory partitioning); the K-V
    * payload accepts exactly `bucket(n, result_key)` — the store's
    * recorded bucket layout from SQL.
    */
  override def createTable(
      ident: Identifier,
      schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]
  ): Table = {
    val (base, name) = baseAndName(ident)
    require(!name.startsWith("_"),
      s"GraftCatalog: table names must not start with '_' ('$name') — the prefix is " +
        "reserved for catalog metadata (_alias)")
    if (resolve(ident).isDefined)
      throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(
        ident.namespace().toSeq :+ ident.name())
    val conf         = ContentStore.driverHadoopConf()
    val (fsys, bdir) = ContentStore.fs(base, conf)
    // a stale alias (its target dropped or purged) no longer resolves,
    // but left in place it would shadow the store created below —
    // reclaim it before allocating
    if (readAlias(base, name).isDefined)
      fsys.delete(new Path(bdir, s"_alias/$name"), false): Unit
    // PHYSICAL ALLOCATION: the name's own directory when it is free; a
    // suffixed sibling + an `_alias/<name>` pointer when the directory
    // is occupied (a tombstoned predecessor awaiting purge, or a
    // renamed-away shell) — this is what makes create-after-drop work
    // immediately instead of waiting out the reclamation grace
    val direct = new Path(bdir, name)
    val path =
      if (!fsys.exists(direct)) s"$base/$name"
      else {
        // millis + UUID: two creators racing in the same millisecond
        // previously picked the IDENTICAL suffix, and writeAlias's
        // convergence check read the racer's identical pointer as its
        // own success — both would bootstrap one physical directory
        val phys =
          s"${name}__r${System.currentTimeMillis()}-${java.util.UUID.randomUUID().toString.take(8)}"
        val physPath = new Path(bdir, phys)
        require(!fsys.exists(physPath),
          s"GraftCatalog: allocated physical dir $phys already exists — refusing to adopt it")
        // the directory must exist BEFORE the alias publishes:
        // purge_dropped's stale-alias sweep deletes any alias whose
        // target directory is missing, and an alias published first
        // would sit in that window until the first write
        fsys.mkdirs(physPath): Unit
        // if the alias never publishes (lost race, IO failure), the
        // just-created directory has no pointer referencing it and
        // nothing sweeps it — reap it best-effort before rethrowing
        try writeAlias(base, name, phys)
        catch {
          case t: Throwable =>
            try fsys.delete(physPath, true): Unit
            catch { case scala.util.control.NonFatal(del) => t.addSuppressed(del) }
            throw t
        }
        s"$base/$phys"
      }
    val provider = Option(properties.get("provider")).map(_.toLowerCase)
    val payload = Option(properties.get("payload")).map(_.toLowerCase)
      .orElse(provider).getOrElse("columnar")
    payload match {
      case "kv" | "contentstore" =>
        val sig = schema.fields.toSeq.map(f => (f.name, f.dataType.catalogString))
        require(sig == Seq("result_key" -> "string", "payload" -> "string"),
          s"GraftCatalog: a K-V store has the fixed put contract " +
            s"(result_key STRING, payload STRING), got ${schema.catalogString}")
        ContentStore.createKvStore(path, kvBuckets(partitions))
      case "columnar" | "parquet" | "graft" =>
        require(partitions.isEmpty,
          "GraftCatalog: columnar stores lay out by clustering / z-order maintenance " +
            "(StoreLifecycle.zorderCluster, clustered appends), not partition " +
            "transforms — CREATE refuses PARTITIONED BY/CLUSTER BY")
        val shards = Option(properties.get("datashards")).map(_.trim.toInt).getOrElse(0)
        ParquetEpochs.createStore(path, schema, shards)
      case other =>
        throw new UnsupportedOperationException(
          s"GraftCatalog: unsupported payload/provider '$other' — use columnar " +
            "(default/parquet) or kv")
    }
    loadTable(ident)
  }

  /** The K-V payload's one accepted partition transform:
    * `bucket(n, result_key)` → the store's recorded `_buckets` fact.
    */
  private def kvBuckets(partitions: Array[Transform]): Int = partitions.toSeq match {
    case Nil => 0
    case Seq(t) if t.name == "bucket" =>
      val refs = t.references().flatMap(_.fieldNames()).toSeq
      require(refs == Seq("result_key"),
        s"GraftCatalog: K-V bucketing is by result_key only, got ${refs.mkString(", ")}")
      t.arguments().collectFirst {
        case l: org.apache.spark.sql.connector.expressions.Literal[_]
            if l.value().isInstanceOf[Number] =>
          l.value().asInstanceOf[Number].intValue()
      }.getOrElse(throw new UnsupportedOperationException(
        s"GraftCatalog: bucket transform needs a literal count, got $t"))
    case other =>
      throw new UnsupportedOperationException(
        s"GraftCatalog: K-V stores accept exactly bucket(n, result_key), got " +
          other.mkString(", "))
  }

  /** `ALTER TABLE cat.t ADD COLUMNS (...)` — the store's own additive
    * schema evolution (B83, [[ParquetEpochs.evolveSchema]]) from SQL:
    * top-level nullable columns append to the recorded signature;
    * pre-evolution files read NULL for them (the evolution contract),
    * which is also why a NOT NULL evolved column is refused. Every
    * other ALTER shape (drop/rename/retype/reposition/nested) would
    * need a rewrite of live data and is refused with the maintenance
    * verbs named.
    */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val path = resolvedPath(ident)
    val conf = ContentStore.driverHadoopConf()
    // Constraints from SQL: CHECK rides B90's ENFORCED add/drop verbs
    // (whole-store validation at add, per-commit enforcement after);
    // PRIMARY KEY / UNIQUE / FOREIGN KEY are B97's INFORMATIONAL key
    // facts (KeyFacts: NOT ENFORCED only — the store has no uniqueness
    // machinery, and enforcing a PK would be a full shuffle per commit;
    // a one-shot honesty scan refuses recording a key the live data
    // visibly violates, and only RELY facts feed the optimizer).
    val conChanges = changes.collect {
      case a: TableChange.AddConstraint  => Left(a)
      case d: TableChange.DropConstraint => Right(d)
    }
    if (conChanges.nonEmpty) {
      require(conChanges.length == changes.length,
        "GraftCatalog: constraint changes cannot mix with other ALTER changes")
      import org.apache.spark.sql.connector.catalog.constraints.{Check, ForeignKey, PrimaryKey, Unique}
      def cols(refs: Array[org.apache.spark.sql.connector.expressions.NamedReference]): Seq[String] =
        refs.toSeq.map { r =>
          require(r.fieldNames().length == 1,
            s"GraftCatalog: key columns must be top-level, got ${r.fieldNames().mkString(".")}")
          r.fieldNames()(0)
        }
      conChanges.foreach {
        case Left(a) => a.constraint() match {
          case c: Check =>
            Constraints.add(org.apache.spark.sql.SparkSession.active, path,
              c.name(), c.predicateSql())
          case p: PrimaryKey =>
            require(!p.enforced(),
              "GraftCatalog: PRIMARY KEY is informational — declare it NOT ENFORCED " +
                "(enforcement would shuffle every commit; add RELY to let the " +
                "optimizer spend it)")
            KeyFacts.addKey(org.apache.spark.sql.SparkSession.active, path,
              p.name(), cols(p.columns()), unique = false, rely = p.rely())
          case u: Unique =>
            require(!u.enforced(),
              "GraftCatalog: UNIQUE is informational — declare it NOT ENFORCED")
            KeyFacts.addKey(org.apache.spark.sql.SparkSession.active, path,
              u.name(), cols(u.columns()), unique = true, rely = u.rely())
          case f: ForeignKey =>
            require(!f.enforced(),
              "GraftCatalog: FOREIGN KEY is informational — declare it NOT ENFORCED")
            KeyFacts.addForeignKey(path, f.name(), cols(f.columns()),
              (f.referencedTable().namespace().toSeq :+ f.referencedTable().name())
                .mkString("."),
              cols(f.referencedColumns()), rely = f.rely())
          case other =>
            throw new UnsupportedOperationException(
              s"GraftCatalog: unsupported constraint kind: ${other.toDDL}")
        }
        case Right(d) =>
          // the name lives in exactly one of the two registries; both
          // drops are idempotent deletes
          Constraints.drop(path, d.name())
          KeyFacts.drop(path, d.name())
      }
      return loadTable(ident)
    }
    // NOT NULL as a constraint kind, mapped onto the CHECK machinery
    // (`c IS NOT NULL` under the derived name `<col>_not_null`):
    // Spark's analyzer refuses tightening nullability from SQL
    // (CheckAnalysis: "Cannot change nullable column to
    // non-nullable"), so the SQL spelling for SET is
    // `ALTER TABLE t ADD CONSTRAINT c_not_null CHECK (c IS NOT NULL)`
    // — whole-store validation at add (the B90 induction base),
    // per-commit refusal after. `ALTER COLUMN c DROP NOT NULL` is a
    // RELAXATION the analyzer allows; it drops the derived constraint
    // and re-admits NULLs. A direct-API updateColumnNullability(false)
    // (no analyzer in the way) maps to the same Constraints.add. The
    // store's recorded schema stays all-nullable (parquet reads are
    // nullable regardless) — enforcement lives in the constraint,
    // the Delta NOT-NULL-as-invariant shape.
    val nulls = changes.collect { case n: TableChange.UpdateColumnNullability => n }
    if (nulls.nonEmpty) {
      require(nulls.length == changes.length,
        "GraftCatalog: nullability changes cannot mix with other ALTER changes")
      nulls.foreach { n =>
        require(n.fieldNames().length == 1,
          s"GraftCatalog: SET/DROP NOT NULL supports top-level columns only, got " +
            n.fieldNames().mkString("."))
        val c = n.fieldNames()(0)
        if (n.nullable()) Constraints.drop(path, s"${c}_not_null")
        else Constraints.add(org.apache.spark.sql.SparkSession.active, path,
          s"${c}_not_null", s"$c IS NOT NULL")
      }
      return loadTable(ident)
    }
    val adds = changes.collect { case a: TableChange.AddColumn => a }
    if (adds.length != changes.length || adds.isEmpty)
      throw new UnsupportedOperationException(
        "GraftCatalog: only ALTER TABLE ... ADD COLUMNS / ADD|DROP CONSTRAINT / " +
          "ALTER COLUMN SET|DROP NOT NULL is supported — use evolveSchema / store " +
          "maintenance ops for anything else")
    if (!ContentStore.recordedFormat(path, conf).contains("parquet"))
      throw new UnsupportedOperationException(
        s"GraftCatalog: K-V store $path has the fixed (result_key, payload) schema — " +
          "ADD COLUMNS applies to columnar stores")
    val recorded = ParquetEpochs.recordedSchema(path, conf).getOrElse(
      throw new IllegalStateException(
        s"GraftCatalog: columnar store $path has no recorded _schema"))
    val widened = adds.foldLeft(recorded) { (sch, a) =>
      require(a.fieldNames().length == 1,
        s"GraftCatalog: ADD COLUMNS supports top-level columns only, got " +
          a.fieldNames().mkString("."))
      require(a.position() == null,
        "GraftCatalog: column position is not supported — evolution appends at the end")
      require(a.isNullable,
        s"GraftCatalog: evolved column ${a.fieldNames()(0)} must be nullable — " +
          "pre-evolution files read NULL for it")
      sch.add(a.fieldNames()(0), a.dataType(), nullable = true)
    }
    ParquetEpochs.evolveSchema(path, widened)
    loadTable(ident)
  }

  /** DROP TABLE through the lifecycle (r20, VERDICT-r19 missing-1;
    * previously an operator refusal for any data-bearing store):
    *
    *  - a LIVE PIN LEASE refuses the drop — the lease is the
    *    engine's "someone is still reading this snapshot" fact, and
    *    dropping under it would manufacture broken pins;
    *  - a pure CTAS-abort artifact (zero committed manifests AND an
    *    empty `data/` — no in-flight first write staged anything, the
    *    ADVICE-r19 narrowing) deletes physically on the spot;
    *  - every other store TOMBSTONES: one `_dropped` marker makes the
    *    name unresolvable immediately (reads/writes by name refuse at
    *    resolution), while the files stay on disk until
    *    `CALL system.purge_dropped(grace_ms)` reclaims them past the
    *    grace — the vacuum contract applied to whole stores, so a
    *    mis-drop is recoverable (remove the marker) until the purge.
    *
    * Dropping an aliased name also removes the alias pointer; the name
    * is immediately reusable by CREATE (which allocates a suffixed
    * physical directory while the tombstoned one awaits purge).
    */
  override def dropTable(ident: Identifier): Boolean = {
    val (base, name) = baseAndName(ident)
    val conf         = ContentStore.driverHadoopConf()
    val (fsys, bdir) = ContentStore.fs(base, conf)
    resolve(ident) match {
      case None =>
        // nothing resolvable; reclaim a stale alias pointer if present
        if (readAlias(base, name).isDefined)
          fsys.delete(new Path(bdir, s"_alias/$name"), false): Unit
        false
      case Some(path) =>
        val now      = System.currentTimeMillis()
        val livePins = StoreLifecycle.pins(path, conf).filter(_.expiresAtMs > now)
        if (livePins.nonEmpty)
          throw new IllegalStateException(
            s"GraftCatalog: cannot DROP $name — ${livePins.size} live pin lease(s) still " +
              s"read it (${livePins.map(_.id).take(5).mkString(", ")}); release them or " +
              "let them expire first")
        val (sfs, root) = ContentStore.fs(path, conf)
        val dataDir     = new Path(root, "data")
        val dataEmpty   = !sfs.exists(dataDir) || !sfs.listStatusIterator(dataDir).hasNext
        if (ContentStore.manifestNames(path, conf).isEmpty && dataEmpty) {
          sfs.delete(root, true): Unit // the empty CTAS-abort artifact
        } else {
          // tombstone: create-exclusive is enough (readers only probe
          // existence; the content is introspection)
          try {
            val out = sfs.create(new Path(root, "_dropped"), /* overwrite = */ false)
            try out.write(now.toString.getBytes("UTF-8"))
            finally out.close()
          } catch {
            case _: org.apache.hadoop.fs.FileAlreadyExistsException |
                _: java.nio.file.FileAlreadyExistsException => ()
          }
        }
        if (readAlias(base, name).isDefined)
          fsys.delete(new Path(bdir, s"_alias/$name"), false): Unit
        true
    }
  }

  /** ALTER TABLE … RENAME TO (r20, VERDICT-r19 missing-3; previously
    * refused): the catalog re-points the NAME through the namespace's
    * `_alias/` map — the physical directory never moves, so pin
    * leases, time travel, streaming checkpoints and every path-keyed
    * contract are untouched (a physical move would be O(files) on an
    * object store and would break pinned readers mid-flight).
    * Sequence: publish `_alias/<new>` → physical (tmp + atomic
    * rename), then retire the old name (delete its alias pointer, or
    * mark a directly-named directory `_renamed_away`). A crash
    * between the two steps leaves both names readable; re-running the
    * same rename converges (the already-pointing alias is accepted
    * and the old-name retirement completes). Cross-namespace renames
    * refuse (alias targets are siblings); an existing target name
    * refuses; renaming onto itself refuses.
    */
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val (oldBase, oldName) = baseAndName(oldIdent)
    val (newBase, newName) = baseAndName(newIdent)
    require(!newName.startsWith("_"),
      s"GraftCatalog: table names must not start with '_' ('$newName')")
    require(oldBase == newBase,
      "GraftCatalog: RENAME cannot move a table across namespaces — alias targets are " +
        "siblings of their pointer; copy (CTAS) instead")
    require(!(oldName == newName),
      s"GraftCatalog: RENAME onto itself ('$oldName') is a no-op refusal")
    val conf = ContentStore.driverHadoopConf()
    val physOld = resolve(oldIdent).getOrElse(
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        oldIdent.namespace().toSeq :+ oldIdent.name()))
    val physSimple = physOld.substring(physOld.lastIndexOf('/') + 1)
    val converged  = readAlias(newBase, newName).contains(physSimple)
    if (!converged && resolve(newIdent).isDefined)
      throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(
        newIdent.namespace().toSeq :+ newIdent.name())
    if (!converged) writeAlias(newBase, newName, physSimple)
    // retire the old name AFTER the new one resolves (crash between
    // the two leaves both readable — re-run to converge)
    val (fsys, bdir) = ContentStore.fs(oldBase, conf)
    if (readAlias(oldBase, oldName).isDefined)
      fsys.delete(new Path(bdir, s"_alias/$oldName"), false): Unit
    else {
      val (sfs, root) = ContentStore.fs(physOld, conf)
      try {
        val out = sfs.create(new Path(root, "_renamed_away"), /* overwrite = */ false)
        try out.write(newName.getBytes("UTF-8"))
        finally out.close()
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException |
            _: java.nio.file.FileAlreadyExistsException => ()
      }
    }
  }

  /** Publish `_alias/<name>` → `target` (tmp + atomic rename, the
    * constraint-file pattern: a reader never observes torn content;
    * an existing pointer refuses — callers pre-check).
    */
  private def writeAlias(base: String, name: String, target: String): Unit = {
    val conf         = ContentStore.driverHadoopConf()
    val (fsys, bdir) = ContentStore.fs(base, conf)
    val aliasDir     = new Path(bdir, "_alias")
    fsys.mkdirs(aliasDir)
    val tmp = new Path(aliasDir, s".tmp-$name-${java.util.UUID.randomUUID()}")
    val out = fsys.create(tmp, /* overwrite = */ false)
    try out.write(target.getBytes("UTF-8"))
    finally out.close()
    val p = new Path(aliasDir, name)
    if (fsys.exists(p) || !fsys.rename(tmp, p)) {
      fsys.delete(tmp, false): Unit
      if (!readAlias(base, name).contains(target))
        throw new IllegalStateException(
          s"GraftCatalog: alias '$name' raced a concurrent DDL — re-run the statement")
    }
  }
}

/** Catalog-facing BATCH table over a columnar store — the read surface
  * [[ColumnarStoreTable]] deliberately does not carry (its batch
  * answer is "use ParquetEpochs.read", which SQL cannot). One input
  * partition per pinned data file through the store's own vectorized
  * reader; column pruning reaches the parquet reader's
  * requested-schema conf; pushed comparison filters prune FILES
  * against the `_stats` bounds at planning time and then stay fully
  * residual (pushedFilters = none), so skipping is I/O-only — the
  * readRange contract on the SQL path.
  */
private[graft] class ColumnarBatchTable(
    path: String,
    tableSchema: StructType,
    pinned: Option[Seq[String]]
) extends Table
    with SupportsRead
    with SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsDelete
    with org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations {

  override def name(): String       = s"graft_columnar_store($path)"
  override def schema(): StructType = tableSchema

  /** Recorded constraints, reported to the engine (DESCRIBE, planner
    * hints): ENFORCED CHECKs (the store's own commit-time validation,
    * validated at add time) plus B97's INFORMATIONAL key facts —
    * PK/UNIQUE/FK reported NOT ENFORCED + UNVALIDATED (the add's
    * honesty scan is one-shot, later commits are not re-checked) with
    * the recorded RELY flag, which is what gates the optimizer's
    * distinct-elimination ([[graft.plans.KeyDistinct]]).
    */
  override def constraints(): Array[org.apache.spark.sql.connector.catalog.constraints.Constraint] = {
    import org.apache.spark.sql.connector.catalog.constraints.Constraint
    val conf = ContentStore.driverHadoopConf()
    val checks = Constraints.list(path, conf).map { case (n, e) =>
      Constraint.check(n).predicateSql(e).build(): Constraint
    }
    def refs(cs: Seq[String]) =
      cs.map(org.apache.spark.sql.connector.expressions.Expressions.column).toArray
    val unval = Constraint.ValidationStatus.UNVALIDATED
    val keys = KeyFacts.list(path, conf).map {
      case KeyFacts.PrimaryKeyFact(n, cs, rely) =>
        Constraint.primaryKey(n, refs(cs)).enforced(false).rely(rely)
          .validationStatus(unval).build(): Constraint
      case KeyFacts.UniqueFact(n, cs, rely) =>
        Constraint.unique(n, refs(cs)).enforced(false).rely(rely)
          .validationStatus(unval).build(): Constraint
      case KeyFacts.ForeignKeyFact(n, cs, ref, rcs, rely) =>
        val parts = ref.split("\\.")
        Constraint.foreignKey(n, refs(cs),
            org.apache.spark.sql.connector.catalog.Identifier.of(parts.init, parts.last),
            refs(rcs))
          .enforced(false).rely(rely).validationStatus(unval).build(): Constraint
    }
    (checks ++ keys).toArray
  }
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(
      TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE)

  /** `DELETE FROM cat.name WHERE col IN (...)` — the store's own
    * row-level DELETE (the B81 copy-on-write rewrite: candidates prune
    * via `_stats` bounds, matched files rewrite, untouched files
    * carry) reached from SQL. Accepted when every conjunct is a
    * literal `=`/`IN` on ONE column — exactly the shape
    * [[ParquetEpochs.deleteWhere]] takes; any other predicate is
    * refused AT ANALYSIS (Spark reports the table cannot delete by
    * that condition) rather than silently degrading to a full-scan
    * rewrite. A bare `DELETE FROM t` / `TRUNCATE TABLE t` maps to
    * [[StoreLifecycle.expireEpochs]](∞) — the metadata-only
    * retire-everything (B86): zero data I/O at any store size, files
    * reclaimed by vacuum at grace. Time-traveled views refuse:
    * history is read-only.
    */
  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    pinned.isEmpty &&
      (ColumnarBatchTable.isTruncate(filters) ||
        ColumnarBatchTable.deletePlan(filters).isDefined)

  override def deleteWhere(filters: Array[Filter]): Unit = {
    require(pinned.isEmpty,
      s"GraftCatalog: cannot DELETE from a time-traveled view of $path")
    if (ColumnarBatchTable.isTruncate(filters)) { truncateTable(); return }
    val (column, values) = ColumnarBatchTable.deletePlan(filters).getOrElse(
      throw new UnsupportedOperationException(
        s"GraftCatalog: DELETE on store $path supports only literal =/IN " +
          "conjuncts on a single column — rewrite the predicate or use " +
          "ParquetEpochs.deleteWhere with a key DataFrame"))
    ParquetEpochs.deleteWhere(
      org.apache.spark.sql.SparkSession.active, path, column, values): Unit
  }

  override def truncateTable(): Boolean = {
    require(pinned.isEmpty,
      s"GraftCatalog: cannot TRUNCATE a time-traveled view of $path")
    StoreLifecycle.expireEpochs(path, Long.MaxValue): Unit
    true
  }

  /** `INSERT INTO cat.name SELECT ...` — the append protocol verbatim
    * (distributed parquet stage + atomic manifest rename, schema
    * signature enforced by ensureSchema), surfaced as a V1 write: the
    * epoch commit is a driver-side manifest operation AROUND a
    * distributed stage, which is exactly the shape V1Write exists for
    * — a DSv2 BatchWrite would re-implement writeManifest as
    * connector machinery (the ParquetEpochs.streamingAppend argument).
    * `INSERT OVERWRITE cat.name SELECT ...` (B92) — the builder's
    * SupportsTruncate arm — is ONE atomic replacement commit
    * ([[ParquetEpochs.overwrite]]): new corpus staged, every live
    * manifest shadowed, one rename; a concurrent reader sees old or
    * new, never the TRUNCATE+INSERT empty window, and time travel
    * keeps the pre-overwrite snapshot. Partial overwrite
    * (OVERWRITE ... WHERE / PARTITION) stays unsupported — the table
    * reports no SupportsOverwrite, so analysis refuses.
    */
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(pinned.isEmpty,
      s"GraftCatalog: cannot INSERT into a time-traveled view of $path")
    new WriteBuilder with org.apache.spark.sql.connector.write.SupportsTruncate {
      private var replaceAll = false
      override def truncate(): WriteBuilder = { replaceAll = true; this }
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          (data: org.apache.spark.sql.DataFrame, overwrite: Boolean) => {
            if (replaceAll || overwrite)
              ParquetEpochs.overwrite(org.apache.spark.sql.SparkSession.active, path, data)
            else ParquetEpochs.append(data, path): Unit
          }
      }
    }
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    ColumnarBatchTable.scanBuilder(path, tableSchema, pinned)

  /** SQL `UPDATE` / `MERGE INTO` / non-key `DELETE` — the group-based
    * copy-on-write row-level operation ([[ColumnarCowOperation]]): the
    * DML's scan prunes groups through the `_stats` bounds, the write
    * stages per-task parquet straight into `data/`, and the commit is
    * one shadowing replacement manifest with OCC. Key-shaped DELETEs
    * never land here — Spark's metadata-only optimization routes them
    * back to [[SupportsDelete]]. Time travel refuses: history is
    * read-only.
    */
  override def newRowLevelOperationBuilder(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo
  ): org.apache.spark.sql.connector.write.RowLevelOperationBuilder = {
    require(pinned.isEmpty,
      s"GraftCatalog: cannot run row-level DML on a time-traveled view of $path")
    () => new ColumnarCowOperation(path, tableSchema, info.command())
  }
}

private[graft] object ColumnarBatchTable {

  /** The columnar batch scan, shared by the table and the row-level
    * operation (which passes `onPlan` to capture the planned file set
    * — its replaced-group set at commit).
    */
  private[sources] def scanBuilder(
      path: String,
      tableSchema: StructType,
      pinned: Option[Seq[String]],
      onPlan: Seq[String] => Unit = _ => ()
  ): ScanBuilder = {
    val conf = new SerializableConfiguration(ContentStore.driverHadoopConf())
    new ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
      private var required: StructType   = tableSchema
      private var pruning: Array[Filter] = Array.empty

      override def pushFilters(filters: Array[Filter]): Array[Filter] = {
        pruning = filters.filter(prunable)
        filters // every filter stays residual — pruning is I/O-only
      }
      override def pushedFilters(): Array[Filter] = Array.empty
      override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

      override def build(): Scan = new Scan
        with Batch
        with org.apache.spark.sql.connector.read.SupportsReportStatistics {
        override def readSchema(): StructType = required
        override def toBatch: Batch           = this
        // ONE manifest+bounds listing per Scan, shared by statistics
        // and partition planning (they must agree; unlike the K-V scan
        // there is no runtime-filter mutation to invalidate it) — the
        // pin resolved at loadTable (time travel) or snapshotted at
        // first use (the live read — per-scan, like every listing)
        private lazy val plannedFiles: Seq[String] = {
          val manifests =
            pinned.getOrElse(ContentStore.effectiveManifestNames(path, conf.value))
          val files = manifests.flatMap(m => ContentStore.filesInManifest(path, m, conf.value))
          val byColumn = pruning.flatMap(f => f.references.headOption.map(_ -> f))
            .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
          val bounds = byColumn.keys.map { c =>
            c -> ParquetEpochs.columnBounds(path, manifests, c, conf.value)
          }.toMap
          val planned = files.filter { file =>
            byColumn.forall { case (c, fs) =>
              bounds(c).get(file).forall(b => fs.forall(mayMatch(b, _)))
            }
          }
          onPlan(planned)
          planned
        }
        override def planInputPartitions(): Array[InputPartition] =
          plannedFiles.map(f => StoreFilePartition(path, f): InputPartition).toArray

        /** Real size statistics over the PLANNED (post-skip) file set
          * — same contract as the K-V scan: a small or stats-pruned
          * store slice joins broadcast with no user hint instead of
          * defaulting to "huge". Parquet size understates decoded
          * width, but CBO compares compressed scan bytes uniformly.
          */
        override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics = {
          val bytes = ContentStore.sizeDataFiles(path, plannedFiles, conf.value)
          new org.apache.spark.sql.connector.read.Statistics {
            override def sizeInBytes(): java.util.OptionalLong = java.util.OptionalLong.of(bytes)
            override def numRows(): java.util.OptionalLong     = java.util.OptionalLong.empty()
          }
        }
        override def createReaderFactory(): PartitionReaderFactory =
          new ColumnarStoreReaderFactory(required, conf, ParquetConverterFlags.fromActiveSession())

        /** `spark.readStream.table("cat.name")` — the store's own tail
          * ([[ColumnarMicroBatchStream]]: offsets, admission,
          * compaction-aware exactly-once), reached by name. A
          * time-traveled table refuses: a tail follows the LIVE store
          * and would silently ignore the pin.
          */
        override def toMicroBatchStream(
            checkpointLocation: String
        ): org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
          require(pinned.isEmpty,
            s"GraftCatalog: cannot stream a time-traveled view of $path — " +
              "tail the live table and filter, or read the pin as a batch")
          new ColumnarMicroBatchStream(
            path, conf, checkpointLocation, 0, 10, tableSchema, None)
        }
      }
    }
  }

  /** Filters the planner may use for file skipping: single-column
    * comparisons whose value domain can meet a recorded bound (longs
    * against "long" bounds, strings against "string" bounds — checked
    * again per bound in [[mayMatch]]).
    */
  private[sources] def prunable(f: Filter): Boolean = f match {
    case EqualTo(_, v)            => scalar(v)
    case GreaterThan(_, v)        => scalar(v)
    case GreaterThanOrEqual(_, v) => scalar(v)
    case LessThan(_, v)           => scalar(v)
    case LessThanOrEqual(_, v)    => scalar(v)
    case In(_, vs)                => vs.nonEmpty && vs.forall(scalar)
    case _                        => false
  }

  private def scalar(v: Any): Boolean = v match {
    case _: Long | _: Int | _: String => true
    case _                            => false
  }

  /** SQL DELETE condition → the (column, values) shape the store's
    * delete verb takes: every conjunct a literal `=`/`IN` on the SAME
    * column, values intersected across conjuncts (AND semantics).
    * NULL literals drop — `col IN (NULL, ...)`/`col = NULL` never
    * match a row, the store verb's own rule. None = not expressible
    * as a key delete (range/multi-column/non-literal) — refused.
    */
  /** An unconditioned `DELETE FROM t` reaches the table as a TRUE
    * condition (an AlwaysTrue predicate), not an empty conjunct list —
    * both spell "all rows", both route to the metadata-only truncate.
    */
  private[sources] def isTruncate(filters: Array[Filter]): Boolean =
    filters.forall(_.isInstanceOf[org.apache.spark.sql.sources.AlwaysTrue])

  private[sources] def deletePlan(filters: Array[Filter]): Option[(String, Seq[Any])] = {
    if (filters.isEmpty) return None
    val parsed: Seq[Option[(String, Set[Any])]] = filters.toSeq.map {
      case EqualTo(c, v) if scalar(v) => Some(c -> Set[Any](v))
      case In(c, vs) if vs.forall(v => v == null || scalar(v)) =>
        Some(c -> vs.filter(_ != null).toSet[Any])
      case _ => None
    }
    if (parsed.exists(_.isEmpty)) return None
    val byCol = parsed.flatten
    if (byCol.map(_._1).distinct.size != 1) return None
    Some(byCol.head._1 -> byCol.map(_._2).reduce(_ intersect _).toSeq)
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

  /** max(bound) vs v, None on a domain mismatch (mismatch = keep). */
  private def cmpMax(b: ParquetEpochs.ColumnBound, v: Any): Option[Int] = (b.tag, v) match {
    case ("long", l: Long)     => Some(java.lang.Long.compare(b.maxL, l))
    case ("long", i: Int)      => Some(java.lang.Long.compare(b.maxL, i.toLong))
    case ("string", s: String) => Some(unsignedCompare(b.maxB, s.getBytes("UTF-8")))
    case _                     => None
  }

  private def cmpMin(b: ParquetEpochs.ColumnBound, v: Any): Option[Int] = (b.tag, v) match {
    case ("long", l: Long)     => Some(java.lang.Long.compare(b.minL, l))
    case ("long", i: Int)      => Some(java.lang.Long.compare(b.minL, i.toLong))
    case ("string", s: String) => Some(unsignedCompare(b.minB, s.getBytes("UTF-8")))
    case _                     => None
  }

  /** Conservative: true unless the recorded bound PROVES no row of the
    * file can satisfy the filter.
    */
  private[sources] def mayMatch(b: ParquetEpochs.ColumnBound, f: Filter): Boolean = f match {
    case EqualTo(_, v) =>
      cmpMax(b, v).forall(_ >= 0) && cmpMin(b, v).forall(_ <= 0)
    case GreaterThan(_, v)        => cmpMax(b, v).forall(_ > 0)
    case GreaterThanOrEqual(_, v) => cmpMax(b, v).forall(_ >= 0)
    case LessThan(_, v)           => cmpMin(b, v).forall(_ < 0)
    case LessThanOrEqual(_, v)    => cmpMin(b, v).forall(_ <= 0)
    case In(_, vs) =>
      vs.exists(v => cmpMax(b, v).forall(_ >= 0) && cmpMin(b, v).forall(_ <= 0))
    case _ => true
  }
}
