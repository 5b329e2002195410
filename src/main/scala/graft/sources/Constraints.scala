package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, expr, not}

/** B90: CHECK constraints on columnar stores — the Delta-constraints
  * shape: a store records boolean SQL expressions its rows must
  * satisfy, and every COMMIT validates its OWN new files before the
  * manifest rename, refusing atomically when any new row violates
  * (nothing becomes visible; staged files are unreferenced orphans
  * vacuum sweeps). The induction that makes per-commit checking
  * sufficient: [[add]] validates the WHOLE live store once at
  * constraint-add time, and every later commit validates exactly its
  * new files — carried files were validated by the commit that
  * introduced them, so the live store satisfies every recorded
  * constraint at every instant.
  *
  * Enforcement is UNIFORM because every write lands through one of
  * two commit paths that both hook [[validateNewFiles]]:
  * [[ParquetEpochs.append]] (batch appends, catalog `INSERT INTO`,
  * streaming epochs, upsert version epochs, delete/upsert survivor
  * rewrites) and [[ParquetEpochs.commitReplacement]] (SQL
  * UPDATE/MERGE/DELETE copy-on-write writes — an UPDATE that would
  * SET a violating value refuses like a bad append).
  *
  * Scale: the check reads each commit's NEW files once, pruned by
  * Catalyst to the constraint's referenced columns — cost ∝ the
  * commit's own data, never the store; constraints are opt-in per
  * store (no `_constraints/` dir = zero overhead on the hot path
  * beyond one existence probe per commit).
  *
  * Storage: one immutable `_constraints/<name>` file per constraint
  * holding the expression text (create-exclusive — first writer wins,
  * a duplicate add with different text refuses). [[drop]] deletes the
  * file; rows are re-admitted from the next commit on.
  */
object Constraints {

  private def dir(root: Path) = new Path(root, "_constraints")

  /** Recorded (name, expression) pairs, name-sorted. */
  def list(storeDir: String, conf: Configuration): Seq[(String, String)] = {
    val (fsys, root) = ContentStore.fs(storeDir, conf)
    val d            = dir(root)
    if (!fsys.exists(d)) return Seq.empty
    fsys.listStatus(d).toSeq.filterNot(_.getPath.getName.startsWith("."))
      .map { st =>
        val in = fsys.open(st.getPath)
        try {
          val buf = new java.io.ByteArrayOutputStream()
          val b   = new Array[Byte](4096)
          var n   = in.read(b)
          while (n >= 0) { buf.write(b, 0, n); n = in.read(b) }
          st.getPath.getName -> new String(buf.toByteArray, "UTF-8").trim
        } finally in.close()
      }
      .sortBy(_._1)
  }

  /** Record a CHECK constraint after validating the WHOLE live store
    * against it (the induction base) — a store already carrying a
    * violating row refuses, naming the count. The expression must be
    * a deterministic boolean over the store's columns; a row where it
    * evaluates NULL counts as a VIOLATION (`CHECK` demands true — the
    * conservative reading, spelled out so `lang IS NOT NULL` and
    * `n_chars > 0` both mean what they say on NULL-bearing rows).
    */
  def add(spark: SparkSession, storeDir: String, name: String, sqlExpr: String): Unit = {
    require(name.matches("[A-Za-z0-9._-]+"), s"constraint name must be [A-Za-z0-9._-]+: $name")
    val conf = ContentStore.driverHadoopConf()
    if (!ContentStore.recordedFormat(storeDir, conf).contains("parquet"))
      throw new IllegalStateException(
        s"Constraints.add: store $storeDir is not a columnar store")
    val schema = ParquetEpochs.recordedSchema(storeDir, conf).getOrElse(
      throw new IllegalStateException(
        s"Constraints.add: columnar store $storeDir has no recorded _schema"))
    // fail fast on an unparseable/ill-typed expression before any IO
    val parsed = expr(sqlExpr)
    require(spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
      .select(parsed).schema.fields(0).dataType ==
      org.apache.spark.sql.types.BooleanType,
      s"constraint '$name' must be a BOOLEAN expression, got: $sqlExpr")
    // name check BEFORE the full-store scan: a re-add with the same
    // text is an idempotent no-op, a different text is a name conflict
    // (not a data violation), and neither should pay the validation
    val existing = list(storeDir, conf).toMap.get(name)
    if (existing.isDefined) {
      require(existing.contains(sqlExpr),
        s"Constraints.add: '$name' already recorded on $storeDir with a different " +
          s"expression (${existing.orNull}) — drop it first to change it")
      return
    }
    val live = ContentStore.effectiveManifestNames(storeDir, conf)
    val liveFiles = live.flatMap(m => ContentStore.filesInManifest(storeDir, m, conf)).distinct
    if (liveFiles.nonEmpty) {
      val bad = violations(spark, storeDir, liveFiles, Seq(name -> sqlExpr), conf)
      if (bad.nonEmpty)
        throw new IllegalStateException(
          s"Constraints.add: store $storeDir already violates '$name' " +
            s"($sqlExpr): ${bad.head._2} row(s) — clean the store first " +
            "(deleteWhere / SQL DELETE), then add the constraint")
    }
    val (fsys, root) = ContentStore.fs(storeDir, conf)
    fsys.mkdirs(dir(root))
    val p = new Path(dir(root), name)
    try {
      val out = fsys.create(p, /* overwrite = */ false)
      try out.write(sqlExpr.getBytes("UTF-8"))
      finally out.close()
    } catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException |
          _: java.nio.file.FileAlreadyExistsException =>
        val existing = list(storeDir, conf).toMap.get(name)
        require(existing.contains(sqlExpr),
          s"Constraints.add: '$name' already recorded on $storeDir with a different " +
            s"expression (${existing.orNull}) — drop it first to change it")
        return // a racer recorded the identical constraint — its add owns the scans
    }
    // TOCTOU closure (two-sided with the commit hook): a concurrent
    // append that listed constraints BEFORE `_constraints/<name>`
    // landed validated nothing against it. Commits validate at the
    // last moment before their rename (writeManifest's beforeRename
    // hook), so any such commit that became visible before this
    // re-list is caught HERE: validate the manifests that appeared
    // since the pre-add snapshot, and roll the constraint back if
    // their rows violate — the induction ("live store satisfies every
    // recorded constraint at every instant") holds from the moment
    // the file is visible. The residual is a commit that renamed
    // within the hook→rename metadata gap AND after this re-list —
    // the same OCC-by-listing residual every commit path documents.
    val preLive = live.toSet
    val deltaFiles = ContentStore.effectiveManifestNames(storeDir, conf)
      .filterNot(preLive)
      .flatMap(m => ContentStore.filesInManifest(storeDir, m, conf)).distinct
    if (deltaFiles.nonEmpty) {
      val bad = violations(spark, storeDir, deltaFiles, Seq(name -> sqlExpr), conf)
      if (bad.nonEmpty) {
        fsys.delete(p, false): Unit
        throw new IllegalStateException(
          s"Constraints.add: a concurrent commit landed ${bad.head._2} row(s) violating " +
            s"'$name' ($sqlExpr) during the add — constraint rolled back; " +
            "clean the store and re-add")
      }
    }
  }

  /** Remove a constraint: rows are re-admitted from the next commit. */
  def drop(storeDir: String, name: String): Unit = {
    val conf         = ContentStore.driverHadoopConf()
    val (fsys, root) = ContentStore.fs(storeDir, conf)
    fsys.delete(new Path(dir(root), name), false): Unit
  }

  /** Per-constraint violation counts over the named data files (only
    * constraints with ≥1 violating row return). NULL evaluations
    * count as violations (CHECK demands true).
    */
  private def violations(
      spark: SparkSession,
      storeDir: String,
      files: Seq[String],
      checks: Seq[(String, String)],
      conf: Configuration
  ): Seq[(String, Long)] = {
    import org.apache.spark.sql.functions.{coalesce, lit, sum, when}
    val (_, root) = ContentStore.fs(storeDir, conf)
    val rdr = ParquetEpochs.recordedSchema(storeDir, conf)
      .fold(spark.read)(s => spark.read.schema(s))
    val frame = rdr.parquet(files.map(f => new Path(root, s"data/$f").toString): _*)
    // ONE aggregate pass computes every constraint's violation count
    // (a store with N constraints reads each new file once, not N
    // times); Catalyst prunes the read to the union of the
    // expressions' referenced columns. Positional aliases (`__c<i>`)
    // keep constraint names out of the analyzer.
    val aggs = checks.zipWithIndex.map { case ((_, sqlExpr), i) =>
      sum(when(not(coalesce(expr(sqlExpr), lit(false))), 1L).otherwise(0L)).as(s"__c$i")
    }
    val row = frame.agg(aggs.head, aggs.tail: _*).head()
    checks.zipWithIndex.flatMap { case ((name, _), i) =>
      // sum over zero rows is NULL — an empty file set violates nothing
      val n = if (row.isNullAt(i)) 0L else row.getLong(i)
      if (n > 0) Some(name -> n) else None
    }
  }

  /** Commit-side hook: validate a commit's NEW files against every
    * recorded constraint, BEFORE its manifest becomes visible. Refuses
    * with the full violation report; the staged files stay
    * unreferenced (vacuum sweeps). No `_constraints/` dir = one cheap
    * existence probe and out.
    */
  private[sources] def validateNewFiles(
      storeDir: String,
      newFiles: Seq[String],
      conf: Configuration
  ): Unit = {
    if (newFiles.isEmpty) return
    val checks = list(storeDir, conf)
    if (checks.isEmpty) return
    val spark = SparkSession.active
    val bad   = violations(spark, storeDir, newFiles, checks, conf)
    if (bad.nonEmpty)
      throw new StoreConstraintViolationException(
        s"commit on $storeDir refused: " + bad.map { case (n, c) =>
          s"constraint '$n' violated by $c new row(s)"
        }.mkString("; ") + " — nothing became visible; fix the batch and re-run")
  }
}

/** A commit whose new rows violate a recorded CHECK constraint. The
  * store is untouched (the manifest never landed); staged files are
  * unreferenced orphans vacuum sweeps. Not retryable as-is — fix the
  * data (or drop the constraint) and re-run.
  */
class StoreConstraintViolationException(msg: String) extends java.io.IOException(msg)
