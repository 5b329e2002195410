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
    val (_, root) = ContentStore.fs(storeDir, conf)
    val rdr = ParquetEpochs.recordedSchema(storeDir, conf)
      .fold(spark.read)(s => spark.read.schema(s))
    val frame = rdr.parquet(files.map(f => new Path(root, s"data/$f").toString): _*)
    checks.flatMap { case (name, sqlExpr) =>
      // one aggregate per constraint; Catalyst prunes the read to the
      // expression's referenced columns
      val n = frame.filter(not(org.apache.spark.sql.functions.coalesce(
        expr(sqlExpr), org.apache.spark.sql.functions.lit(false)))).count()
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
