package graft

import graft.operators.Dedup
import graft.sources.{ContentStore, ParquetEpochs, StoreLifecycle}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** C22f: the incremental probe against the COLUMNAR (ParquetEpochs)
  * signature index. Pins what the gate alone can't: verdicts equal the
  * JSON-payload persisted probe AND the in-memory exact probe row for
  * row (the payload format must be invisible to semantics), the index
  * frame's provenance is exactly the index store's parquet files (no
  * corpus scan, no K-V store read), the probe plan reads the
  * materialized index once, and the full maintenance story — epoch
  * append, pinned-snapshot freezing, columnar OPTIMIZE + vacuum —
  * behaves identically to the K-V store's.
  */
class ColumnarIndexSpec extends SparkSpecBase {
  import spark.implicits._

  private def verdictRows(df: DataFrame) =
    df.collect().map { r =>
      (
        r.getAs[Long]("doc_id"),
        r.getAs[String]("dup_kind"),
        Option(r.getAs[Any]("match_doc_id")),
        Option(r.getAs[Any]("near_jaccard"))
      )
    }.toSeq

  private def executedPlanString(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p                        => p.toString
    }
  }

  private val textA = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
  private val textB = "one two three four five six seven eight nine ten eleven twelve"
  private val textX = "red orange yellow green blue indigo violet cyan magenta umber teal pink"

  test("columnar probe equals the JSON persisted probe and the in-memory probe row for row") {
    val columnar = verdictRows(Dedup.incrementalDedupColumnar(tables, Dedup.JaccardTau))
    assert(columnar == verdictRows(Dedup.incrementalDedupPersisted(tables, Dedup.JaccardTau)))
    assert(columnar == verdictRows(Dedup.incrementalDedup(tables)))
  }

  test("index provenance is the store's parquet files only; probe reads it once") {
    val storeRoot = java.nio.file.Files.createTempDirectory("graft-pqindex-spec")
    val store     = storeRoot.toString
    try {
      val m =
        Dedup.writeSignatureIndexColumnar(
          spark, Seq((1L, textA), (2L, textB)).toDF("doc_id", "text"), store)
      val idx = Dedup.readSignatureIndexColumnar(spark, store, Seq(m))
      // provenance: every input file of the index frame lives under the
      // index store's data/ — a corpus path here would be the
      // full-signature recompute the persisted asset exists to prevent
      val inputs = idx.inputFiles
      assert(inputs.nonEmpty && inputs.forall(_.contains(storeRoot.getFileName.toString)),
        s"index must read only the store's parquet files: ${inputs.mkString(",")}")
      val delta = Seq((100L, textX), (101L, textA + " nu xi")).toDF("doc_id", "text")
      val probe = Dedup.incrementalDedupColumnar(spark, delta, store, Seq(m), Dedup.JaccardTau)
      val plan  = executedPlanString(probe)
      // the columnar probe is DECLARATIVE (no checkpoint): its plan
      // scans parquet — but only the INDEX store's files (provenance:
      // a corpus path would be the signature recompute the asset
      // prevents), never a K-V store, and each of the three index
      // consumers pushes its own column pruning. The band scan's
      // ReadSchema — sig WITHOUT the wide shingle array — is the
      // pruning witness: candidate generation never reads the bytes
      // only verification needs.
      val probeInputs = probe.inputFiles
      assert(probeInputs.nonEmpty &&
        probeInputs.forall(_.contains(storeRoot.getFileName.toString)),
        s"probe may scan only the index store: ${probeInputs.mkString(",")}")
      assert(!plan.contains("graft_content_store"), s"probe plan reads a K-V store:\n$plan")
      assert(plan.contains("ReadSchema: struct<doc_id:bigint,sig:array<bigint>>"),
        s"band scan must prune to (doc_id, sig) — no shingle bytes:\n$plan")
      assert(
        verdictRows(probe) == Seq(
          (100L, "new", None, None),
          (101L, "near", Some(1L), Some(10.0 / 12.0))
        )
      )
    } finally deleteTree(storeRoot)
  }

  test("maintenance loop: columnar append becomes a probe target; a pinned snapshot stays frozen") {
    val storeRoot = java.nio.file.Files.createTempDirectory("graft-pqindex-spec")
    val store     = storeRoot.toString
    try {
      Dedup.writeSignatureIndexColumnar(
        spark, Seq((1L, textA), (2L, textB)).toDF("doc_id", "text"), store): Unit
      val pin1 = ParquetEpochs.snapshot(store)
      val delta1 = Seq(
        (100L, textX),
        (101L, "alpha  beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
        (102L, textB + " thirteen fourteen")
      ).toDF("doc_id", "text")
      val v1 = Dedup.incrementalDedupColumnar(spark, delta1, store, pin1, Dedup.JaccardTau)
      assert(verdictRows(v1).map(r => (r._1, r._2, r._3)) == Seq(
        (100L, "new", None),
        (101L, "exact", Some(1L)),
        (102L, "near", Some(2L))
      ))
      Dedup.appendAdmittedSignaturesColumnar(spark, delta1, v1, store): Unit
      val pin2 = ParquetEpochs.snapshot(store)
      assert(pin2.size > pin1.size, "append did not commit a new manifest epoch")
      assert(Dedup.readSignatureIndexColumnar(spark, store, pin2).count() == 3L)
      val delta2 = Seq((200L, textX + " maroon olive")).toDF("doc_id", "text")
      assert(
        verdictRows(Dedup.incrementalDedupColumnar(spark, delta2, store, pin2, Dedup.JaccardTau))
          .map(r => (r._1, r._2, r._3)) == Seq((200L, "near", Some(100L)))
      )
      assert(
        verdictRows(Dedup.incrementalDedupColumnar(spark, delta2, store, pin1, Dedup.JaccardTau)) ==
          Seq((200L, "new", None, None))
      )
    } finally deleteTree(storeRoot)
  }

  test("payload format is recorded store metadata: every mixed use refuses loudly") {
    val colRoot = java.nio.file.Files.createTempDirectory("graft-pqindex-spec")
    val kvRoot  = java.nio.file.Files.createTempDirectory("graft-pqindex-spec")
    try {
      val col = colRoot.toString
      val kv  = kvRoot.toString
      ParquetEpochs.append(Seq((1L, "a")).toDF("doc_id", "text"), col): Unit
      Seq(("k", "v")).toDF("result_key", "payload")
        .write.format("graft.sources.ContentStore").option("path", kv).mode("append").save()
      // K-V read of a columnar store: refused at table resolution, not
      // garbage-decoded at runtime
      val e1 = intercept[Exception] {
        spark.read.format("graft.sources.ContentStore").option("path", col).load().collect()
      }
      assert(e1.getMessage.contains("format"), e1.getMessage)
      // K-V write into a columnar store: same gate
      val e2 = intercept[Exception] {
        Seq(("k", "v")).toDF("result_key", "payload")
          .write.format("graft.sources.ContentStore").option("path", col).mode("append").save()
      }
      assert(e2.getMessage.contains("format"), e2.getMessage)
      // columnar append into an existing (unmarked = K-V) store
      val e3 = intercept[IllegalStateException] {
        ParquetEpochs.append(Seq((2L, "b")).toDF("doc_id", "text"), kv)
      }
      assert(e3.getMessage.contains("K-V"), e3.getMessage)
      // columnar read of a K-V store
      val e4 = intercept[IllegalStateException] {
        ParquetEpochs.read(spark, kv, ContentStore.snapshotManifests(kv))
      }
      assert(e4.getMessage.contains("format marker"), e4.getMessage)
      // and the non-mixed paths still work
      assert(ParquetEpochs.read(spark, col, ParquetEpochs.snapshot(col)).count() == 1L)
    } finally { deleteTree(colRoot); deleteTree(kvRoot) }
  }

  test("columnar OPTIMIZE + vacuum: verdicts survive, sources expire, staging litter sweeps") {
    val storeRoot = java.nio.file.Files.createTempDirectory("graft-pqindex-spec")
    val store     = storeRoot.toString
    val hconf     = spark.sessionState.newHadoopConf()
    try {
      Dedup.writeSignatureIndexColumnar(
        spark, Seq((1L, textA), (2L, textB)).toDF("doc_id", "text"), store): Unit
      val pin0   = ParquetEpochs.snapshot(store)
      val delta1 = Seq((100L, textX)).toDF("doc_id", "text")
      val v1     = Dedup.incrementalDedupColumnar(spark, delta1, store, pin0, Dedup.JaccardTau)
      Dedup.appendAdmittedSignaturesColumnar(spark, delta1, v1, store): Unit
      val delta2 = Seq((200L, textX + " maroon olive"), (201L, textA)).toDF("doc_id", "text")
      def probe(pin: Seq[String]) =
        verdictRows(Dedup.incrementalDedupColumnar(spark, delta2, store, pin, Dedup.JaccardTau))
      val before = probe(ParquetEpochs.snapshot(store))

      // plant a crashed columnar append: an orphaned staging dir
      val (fs, root) = ContentStore.fs(store, hconf)
      val crashed    = new org.apache.hadoop.fs.Path(root, "_staging/crashed-writer")
      fs.mkdirs(crashed)
      val of = fs.create(new org.apache.hadoop.fs.Path(crashed, "part-00000.parquet"), false)
      of.write("dead".getBytes("UTF-8")); of.close()
      fs.setTimes(crashed, 0L, -1L): Unit

      assert(ParquetEpochs.compact(spark, store).isDefined)
      val pinC = ParquetEpochs.snapshot(store)
      assert(pinC.size == 1 && pinC.head.startsWith("compact-"),
        s"base + append epochs must fold into one manifest: $pinC")
      assert(probe(pinC) == before, "columnar compaction changed probe verdicts")

      val acts = StoreLifecycle.vacuum(spark, store, 0L, hconf)
      assert(acts.count(_.kind == "expired_manifest") == 2,
        s"both shadowed source epochs must expire: $acts")
      assert(acts.exists(a => a.kind == "stale_staging" && a.name == "_staging/crashed-writer"),
        s"the crashed staging dir must sweep: $acts")
      assert(probe(pinC) == before, "vacuum changed probe verdicts")
      // racing duplicate compaction: the deterministic name loses the
      // rename idempotently and its rewritten files are dropped
      val filesAfter = fs.listStatus(new org.apache.hadoop.fs.Path(root, "data"))
        .map(_.getPath.getName).toSet
      ParquetEpochs.append(
        ParquetEpochs.read(spark, store, pinC), store, Some(pinC.head),
        Some(Seq("src-a", "src-b"))): Unit
      val filesRetry = fs.listStatus(new org.apache.hadoop.fs.Path(root, "data"))
        .map(_.getPath.getName).toSet
      assert(filesRetry == filesAfter, "a losing duplicate compaction must drop its files")
      assert(probe(pinC) == before)
    } finally deleteTree(storeRoot)
  }

  test("file skipping: a key-scoped read plans only overlapping files, values identical") {
    val storeRoot = java.nio.file.Files.createTempDirectory("graft-pqskip-spec")
    val store     = storeRoot.toString
    try {
      import org.apache.spark.sql.functions._
      // two range-clustered epochs of 8 parts each: doc_id 0..799 and
      // 800..1599 — the layout a nightly per-range append produces
      def epoch(lo: Long): DataFrame = spark
        .range(lo, lo + 800)
        .select(col("id").as("doc_id"), md5(col("id").cast("string")).as("text_hash"))
        .repartitionByRange(8, col("doc_id"))
        .sortWithinPartitions("doc_id")
      ParquetEpochs.append(epoch(0L), store): Unit
      ParquetEpochs.append(epoch(800L), store): Unit
      val pin = ParquetEpochs.snapshot(store)
      assert(ParquetEpochs.plannedFiles(store, pin, "doc_id", 0L, 1599L).size == 16)

      // LONG point: one file planned; result == unpruned read + filter
      val full = ParquetEpochs.read(spark, store, pin)
      def rows(df: DataFrame): Seq[(Long, String)] =
        df.collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text_hash")))
          .toSeq.sorted
      assert(ParquetEpochs.plannedFiles(store, pin, "doc_id", 1203L, 1203L).size == 1)
      val point = ParquetEpochs.readRange(spark, store, pin, "doc_id", 1203L, 1203L)
      assert(point.inputFiles.length == 1, "point read must PLAN one file, not filter 16")
      assert(rows(point) == rows(full.filter(col("doc_id") === 1203L)))

      // LONG range crossing the epoch boundary: both epochs' stats merge
      val range = ParquetEpochs.readRange(spark, store, pin, "doc_id", 700L, 900L)
      assert(range.inputFiles.length < 16 && range.inputFiles.length >= 2)
      assert(rows(range) == rows(full.filter(col("doc_id").between(700L, 900L))))

      // STRING bounds prune too (unsigned UTF-8 order = Spark's order);
      // md5 is uniform so a narrow hex range keeps few files at best —
      // assert only correctness + that the plumbing recorded bounds
      val h  = rows(full.filter(col("doc_id") === 42L)).head._2
      val sp = ParquetEpochs.readRange(spark, store, pin, "text_hash", h, h)
      assert(rows(sp) == rows(full.filter(col("text_hash") === h)))

      // a disjoint predicate plans ZERO files and still types the frame
      assert(ParquetEpochs.plannedFiles(store, pin, "doc_id", 5000L, 6000L).isEmpty)
      val empty = ParquetEpochs.readRange(spark, store, pin, "doc_id", 5000L, 6000L)
      assert(empty.columns.toSeq == Seq("doc_id", "text_hash") && empty.count() == 0L)

      // legacy store / lost best-effort rename: no stats = no skipping,
      // never wrong answers
      val hconf      = spark.sessionState.newHadoopConf()
      val (fs, root) = ContentStore.fs(store, hconf)
      pin.foreach(m => fs.delete(new org.apache.hadoop.fs.Path(root, s"_stats/$m"), false): Unit)
      assert(ParquetEpochs.plannedFiles(store, pin, "doc_id", 1203L, 1203L).size == 16)
      assert(rows(ParquetEpochs.readRange(spark, store, pin, "doc_id", 1203L, 1203L)) ==
        rows(full.filter(col("doc_id") === 1203L)))
    } finally deleteTree(storeRoot)
  }

  test("file skipping: compaction re-records stats for the rewritten epoch") {
    val storeRoot = java.nio.file.Files.createTempDirectory("graft-pqskip-spec")
    val store     = storeRoot.toString
    try {
      import org.apache.spark.sql.functions._
      ParquetEpochs.append(
        spark.range(0, 400).select(col("id").as("doc_id"))
          .repartitionByRange(4, col("doc_id")).sortWithinPartitions("doc_id"),
        store): Unit
      ParquetEpochs.append(
        spark.range(400, 800).select(col("id").as("doc_id"))
          .repartitionByRange(4, col("doc_id")).sortWithinPartitions("doc_id"),
        store): Unit
      val before = ParquetEpochs
        .readRange(spark, store, ParquetEpochs.snapshot(store), "doc_id", 100L, 110L)
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(ParquetEpochs.compact(spark, store).isDefined)
      val pinC = ParquetEpochs.snapshot(store)
      // the rewritten epoch carries its own footer-derived bounds: the
      // sidecar exists and a point read over the compacted store still
      // answers exactly (plan-count depends on the rewrite's row
      // clustering, so only the sidecar presence is pinned)
      assert(
        ParquetEpochs.columnBounds(
          store, pinC, "doc_id", spark.sessionState.newHadoopConf()).nonEmpty,
        "compacted manifest must have a _stats sidecar")
      assert(ParquetEpochs
        .readRange(spark, store, pinC, "doc_id", 100L, 110L)
        .collect().map(_.getLong(0)).sorted.toSeq == before)
    } finally deleteTree(storeRoot)
  }

  test("file skipping: clusterBy compaction re-establishes tight bounds") {
    val storeRoot = java.nio.file.Files.createTempDirectory("graft-pqskip-spec")
    val store     = storeRoot.toString
    try {
      import org.apache.spark.sql.functions._
      // two epochs deliberately INTERLEAVED on the key (each file spans
      // the whole domain): plain compaction would keep the wide bounds
      for (par <- Seq(0, 1))
        ParquetEpochs.append(
          spark.range(0, 800).filter(col("id") % 2 === par)
            .select(col("id").as("doc_id")).repartition(4),
          store): Unit
      val wide = ParquetEpochs
        .plannedFiles(store, ParquetEpochs.snapshot(store), "doc_id", 100L, 110L)
      assert(wide.size == 8, s"interleaved epochs must have domain-wide bounds: ${wide.size}")
      val before = ParquetEpochs
        .readRange(spark, store, ParquetEpochs.snapshot(store), "doc_id", 100L, 110L)
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(ParquetEpochs.compact(spark, store, clusterBy = Some(("doc_id", 8))).isDefined)
      val pinC = ParquetEpochs.snapshot(store)
      val tight = ParquetEpochs.plannedFiles(store, pinC, "doc_id", 100L, 110L)
      assert(tight.size < 8 && tight.nonEmpty,
        s"clusterBy compaction must restore skipping (planned ${tight.size} of 8)")
      assert(ParquetEpochs
        .readRange(spark, store, pinC, "doc_id", 100L, 110L)
        .collect().map(_.getLong(0)).sorted.toSeq == before)
    } finally deleteTree(storeRoot)
  }

  test("z-ordered store prunes planned files on BOTH dimensions; single-column clustering can't") {
    import org.apache.spark.sql.functions.col
    val storeRoot = java.nio.file.Files.createTempDirectory("graft-zorder")
    try {
      // two UNCORRELATED integral dims (Knuth-hash scramble of the id),
      // so a one-dim layout gives the other dim domain-wide bounds
      val n  = 65536L
      val df = spark.range(n).select(
        col("id").as("a"),
        ((col("id") * 2654435761L) % n).as("b"))
      val parts = 16
      val zs = s"$storeRoot/z"
      ParquetEpochs.append(ParquetEpochs.zcluster(df, "a", "b", parts), zs)
      val cs = s"$storeRoot/c"
      ParquetEpochs.append(
        df.repartitionByRange(parts, col("a")).sortWithinPartitions("a"), cs)
      val zPin = ParquetEpochs.snapshot(zs); val cPin = ParquetEpochs.snapshot(cs)
      // ~3% slices on each dim
      val lo = n / 2; val hi = lo + n / 32
      def planned(store: String, pin: Seq[String], c: String) =
        ParquetEpochs.plannedFiles(store, pin, c, lo, hi).size
      assert(planned(cs, cPin, "a") < parts, "sanity: the 1-dim store prunes its own key")
      assert(planned(cs, cPin, "b") == parts,
        "a 1-dim-clustered store cannot prune the other dim (domain-wide bounds)")
      val (za, zb) = (planned(zs, zPin, "a"), planned(zs, zPin, "b"))
      assert(za < parts && zb < parts,
        s"z-order must prune BOTH dims (planned a=$za b=$zb of $parts)")
      // values cannot move: the two-dim slice equals the layout-free answer
      val want = df.filter(col("a").between(lo, hi) && col("b").between(lo, hi))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = ParquetEpochs.readRange(spark, zs, zPin, "a", lo, hi)
        .filter(col("b").between(lo, hi))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want)
      // the BOX read plans the intersection — at most min(per-dim) and
      // values identical (both filters residual)
      val boxed = ParquetEpochs.readBox(spark, zs, zPin,
        Seq(("a", lo, hi), ("b", lo, hi)))
      assert(boxed.inputFiles.length <= math.min(za, zb),
        s"box plan must be the intersection (${boxed.inputFiles.length} vs a=$za b=$zb)")
      assert(boxed.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == want)
      // OPTIMIZE with zorderBy re-establishes the layout over
      // interleaved (bounds-wide) epochs
      val os = s"$storeRoot/o"
      (0 until 2).foreach { par =>
        ParquetEpochs.append(
          df.filter(col("a") % 2 === par).repartition(parts / 2), os): Unit
      }
      assert(ParquetEpochs.plannedFiles(os, ParquetEpochs.snapshot(os), "b", lo, hi).size == parts)
      assert(ParquetEpochs.compact(spark, os, zorderBy = Some(("a", "b", parts))).isDefined)
      val oPin = ParquetEpochs.snapshot(os)
      assert(ParquetEpochs.plannedFiles(os, oPin, "a", lo, hi).size < parts)
      assert(ParquetEpochs.plannedFiles(os, oPin, "b", lo, hi).size < parts)
      val after = ParquetEpochs.readRange(spark, os, oPin, "a", lo, hi)
        .filter(col("b").between(lo, hi))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(after == want)
      intercept[IllegalArgumentException](
        ParquetEpochs.compact(spark, os,
          clusterBy = Some(("a", 4)), zorderBy = Some(("a", "b", 4))))
    } finally deleteTree(storeRoot)
  }
}
