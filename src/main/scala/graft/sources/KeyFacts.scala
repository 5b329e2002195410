package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** B97: INFORMATIONAL key constraints (PK / UNIQUE / FK) — the
  * NOT ENFORCED metadata facts every warehouse engine records because
  * the OPTIMIZER can spend them even when the writer never pays to
  * enforce them (Snowflake/Delta's `NOT ENFORCED … RELY` shape): a
  * `SELECT DISTINCT` over a RELY-keyed dimension is a no-op the
  * planner can delete (one whole exchange + aggregate gone —
  * [[graft.plans.KeyDistinct]]), and DESCRIBE/downstream tools see the
  * declared relational model.
  *
  * Deliberately SEPARATE from [[Constraints]]: CHECK constraints are
  * ENFORCED (every commit validates its new files), while key facts
  * are DECLARED — the store has no uniqueness machinery, so enforcing
  * a PK would mean a full shuffle per commit, exactly the cost the
  * NOT ENFORCED kind exists to avoid at 100 TB. What the add DOES pay,
  * once, is an honesty scan: recording a PK/UNIQUE over a live store
  * that visibly violates it refuses (the [[Constraints.add]] induction
  * base applied to keys) — but later commits are NOT checked, so the
  * fact is reported to the engine as UNVALIDATED and the optimizer
  * only spends it when the user said RELY (the standard opt-in to
  * "wrong results if you lied").
  *
  * Storage: one `_keys/<name>` file per fact (tmp + atomic rename, the
  * `_constraints` publish), tab-separated:
  * {{{
  *   primary\tc1,c2\trely|norely
  *   unique\tc1,c2\trely|norely
  *   foreign\tc1,c2\tref.table\trc1,rc2\trely|norely
  * }}}
  */
object KeyFacts {

  sealed trait Fact { def name: String; def columns: Seq[String]; def rely: Boolean }
  final case class PrimaryKeyFact(name: String, columns: Seq[String], rely: Boolean)
      extends Fact
  final case class UniqueFact(name: String, columns: Seq[String], rely: Boolean) extends Fact
  final case class ForeignKeyFact(
      name: String,
      columns: Seq[String],
      refTable: String,
      refColumns: Seq[String],
      rely: Boolean
  ) extends Fact

  private def dir(root: Path) = new Path(root, "_keys")

  /** Recorded key facts, name-sorted. Dot-prefixed staging and
    * zero-length files are skipped (the `_constraints` reader rules).
    */
  def list(storeDir: String, conf: Configuration): Seq[Fact] = {
    val (fsys, root) = ContentStore.fs(storeDir, conf)
    val d            = dir(root)
    if (!fsys.exists(d)) return Seq.empty
    fsys.listStatus(d).toSeq
      .filterNot(_.getPath.getName.startsWith("."))
      .filter(_.getLen > 0)
      .sortBy(_.getPath.getName)
      .flatMap { st =>
        val in = fsys.open(st.getPath)
        val text =
          try {
            val buf = new java.io.ByteArrayOutputStream()
            val b   = new Array[Byte](1024)
            var n   = in.read(b)
            while (n >= 0) { buf.write(b, 0, n); n = in.read(b) }
            new String(buf.toByteArray, "UTF-8").trim
          } finally in.close()
        val name = st.getPath.getName
        text.split("\t", -1).toSeq match {
          case Seq("primary", cols, rely) =>
            Some(PrimaryKeyFact(name, cols.split(",").toSeq, rely == "rely"))
          case Seq("unique", cols, rely) =>
            Some(UniqueFact(name, cols.split(",").toSeq, rely == "rely"))
          case Seq("foreign", cols, ref, refCols, rely) =>
            Some(ForeignKeyFact(name, cols.split(",").toSeq, ref,
              refCols.split(",").toSeq, rely == "rely"))
          case _ => None // unknown kind tag: ignore, never guess
        }
      }
  }

  /** Record a PK or UNIQUE fact after the one-shot honesty scan: a
    * live store holding duplicate key tuples refuses (recording a fact
    * the data visibly contradicts would hand the optimizer a wrong-
    * results lever). NULL handling mirrors SQL keys conservatively: a
    * NULL in any PK column counts as a violation (primary keys are NOT
    * NULL by definition); UNIQUE tolerates NULLs (SQL's multiple-NULLs
    * rule) by excluding NULL-bearing tuples from the duplicate scan.
    * Later commits are NOT re-checked — the fact reports UNVALIDATED
    * and only RELY facts feed the optimizer.
    */
  def addKey(
      spark: SparkSession,
      storeDir: String,
      name: String,
      columns: Seq[String],
      unique: Boolean,
      rely: Boolean
  ): Unit = {
    require(name.matches("[A-Za-z0-9._-]+"), s"key name must be [A-Za-z0-9._-]+: $name")
    require(columns.nonEmpty, s"key '$name' needs at least one column")
    val conf = ContentStore.driverHadoopConf()
    if (!ContentStore.recordedFormat(storeDir, conf).contains("parquet"))
      throw new IllegalStateException(s"KeyFacts: store $storeDir is not a columnar store")
    val schema = ParquetEpochs.recordedSchema(storeDir, conf).getOrElse(
      throw new IllegalStateException(s"KeyFacts: store $storeDir has no recorded _schema"))
    val missing = columns.filterNot(c => schema.fieldNames.exists(_.equalsIgnoreCase(c)))
    require(missing.isEmpty,
      s"KeyFacts: key '$name' names column(s) not in the store schema: ${missing.mkString(", ")}")
    val live = ContentStore.effectiveManifestNames(storeDir, conf)
    if (live.nonEmpty) {
      import org.apache.spark.sql.functions.{col, count, lit}
      val frame = ParquetEpochs.read(spark, storeDir, live)
      val keyed =
        if (unique) frame.filter(columns.map(col(_).isNotNull).reduce(_ && _))
        else frame // PK: NULL tuples participate and fail the null check below
      if (!unique) {
        val nulls = frame.filter(columns.map(col(_).isNull).reduce(_ || _)).limit(1).count()
        if (nulls > 0)
          throw new IllegalStateException(
            s"KeyFacts: store $storeDir holds NULLs in PRIMARY KEY column(s) " +
              s"(${columns.mkString(", ")}) — a PK is NOT NULL by definition; " +
              "clean the store or declare UNIQUE instead")
      }
      val dup = keyed.groupBy(columns.map(col): _*).agg(count(lit(1)).as("n"))
        .filter(col("n") > 1).limit(1).count()
      if (dup > 0)
        throw new IllegalStateException(
          s"KeyFacts: store $storeDir already holds duplicate (${columns.mkString(", ")}) " +
            s"tuples — recording ${if (unique) "UNIQUE" else "PRIMARY KEY"} '$name' would " +
            "hand the optimizer a wrong-results lever; dedupe first")
    }
    val kind = if (unique) "unique" else "primary"
    publish(storeDir, name,
      s"$kind\t${columns.mkString(",")}\t${if (rely) "rely" else "norely"}", conf)
  }

  /** Record an FK fact — pure declaration (no referential scan: the
    * referenced table may live in another catalog entirely; the FK
    * kind is documentation + a join-planning hint, reported
    * UNVALIDATED like the rest).
    */
  def addForeignKey(
      storeDir: String,
      name: String,
      columns: Seq[String],
      refTable: String,
      refColumns: Seq[String],
      rely: Boolean
  ): Unit = {
    require(name.matches("[A-Za-z0-9._-]+"), s"key name must be [A-Za-z0-9._-]+: $name")
    require(columns.nonEmpty && refColumns.size == columns.size,
      s"FK '$name' needs matching column lists")
    val conf = ContentStore.driverHadoopConf()
    publish(storeDir, name,
      s"foreign\t${columns.mkString(",")}\t$refTable\t${refColumns.mkString(",")}\t" +
        (if (rely) "rely" else "norely"), conf)
  }

  /** Remove a key fact. Idempotent. */
  def drop(storeDir: String, name: String): Unit = {
    val conf         = ContentStore.driverHadoopConf()
    val (fsys, root) = ContentStore.fs(storeDir, conf)
    fsys.delete(new Path(dir(root), name), false): Unit
  }

  /** The `_constraints` atomic publish: dot-prefixed staging + one
    * rename; an existing name with different content refuses, same
    * content is the idempotent re-add.
    */
  private def publish(storeDir: String, name: String, line: String, conf: Configuration): Unit = {
    val (fsys, root) = ContentStore.fs(storeDir, conf)
    fsys.mkdirs(dir(root))
    val p = new Path(dir(root), name)
    def existingText(): Option[String] =
      if (!fsys.exists(p)) None
      else {
        val in = fsys.open(p)
        try {
          val buf = new java.io.ByteArrayOutputStream()
          val b   = new Array[Byte](1024)
          var n   = in.read(b)
          while (n >= 0) { buf.write(b, 0, n); n = in.read(b) }
          Some(new String(buf.toByteArray, "UTF-8").trim)
        } finally in.close()
      }
    existingText() match {
      case Some(t) =>
        require(t == line,
          s"KeyFacts: '$name' already recorded on $storeDir with different content — " +
            "drop it first to change it")
      case None =>
        val tmp = new Path(dir(root), s".tmp-$name-${java.util.UUID.randomUUID()}")
        val out = fsys.create(tmp, /* overwrite = */ false)
        try out.write(line.getBytes("UTF-8"))
        finally out.close()
        if (fsys.exists(p) || !fsys.rename(tmp, p)) {
          fsys.delete(tmp, false): Unit
          require(existingText().contains(line),
            s"KeyFacts: '$name' raced a concurrent add with different content on $storeDir")
        }
    }
  }
}
