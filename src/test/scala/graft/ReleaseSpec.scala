package graft

import graft.operators.{Curation, Dedup, Similarity}
import org.apache.spark.sql.functions._

/** C61 pipeline_release — the end-to-end release flagship. The gate
  * hash-pins the whole composition against DuckDB; these specs pin the
  * properties the gate can't see: that the composition agrees with the
  * STANDALONE stage operators it claims to compose, that the plan
  * keeps the constant scan budget the scaladoc promises, and that the
  * manifest survives the ContentStore write a real release ends with.
  */
class ReleaseSpec extends SparkSpecBase {

  private val QuotaChars = 2000L
  private val PackBudget = 256

  private def md5hex(s: String): String =
    java.security.MessageDigest
      .getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map("%02x".format(_))
      .mkString

  test("release manifest equals the stage-by-stage composition of the standalone operators") {
    val manifest = Curation.releaseManifest(tables).collect()
    assert(manifest.nonEmpty, "release must ship documents")

    // front half via the standalone operators
    val curated = Curation.curateFull(tables).select("doc_id").collect().map(_.getLong(0)).toSet
    val semCont = Similarity
      .semanticContamination(tables)
      .collect()
      .map(_.getAs[Long]("vec_id"))
      .toSet
    val survivors = curated -- semCont
    val ids       = tables.documents.select("doc_id").filter(col("doc_id").isin(survivors.toSeq: _*))
    val clean = Dedup
      .despanTextOn(tables.documents.select("doc_id", "text").join(ids, "doc_id"))
      .collect()
      .map(r =>
        r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_cut"), r.getAs[String]("clean_text")))
      )
      .toMap
    val srcOf = tables.documents
      .select("doc_id", "source")
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("source"))
      .toMap

    // back half replayed driver-side: quota → split → pack → shard
    case class Staged(docId: Long, source: String, nTokens: Long, nCut: Long, cleanText: String)
    val staged = survivors.toSeq.sorted.map { id =>
      val (nt, nc, ct) = clean(id)
      Staged(id, srcOf(id), nt, nc, ct)
    }
    // clean_chars counts Unicode CODE POINTS (the operator/oracle
    // convention) — String.length would count UTF-16 units instead
    def nCodePoints(s: String): Long = s.codePointCount(0, s.length).toLong
    val kept = staged
      .groupBy(_.source)
      .flatMap { case (_, docs) =>
        var cum = 0L
        docs
          .sortBy(d => (md5hex(d.docId.toString), d.docId))
          .flatMap { d =>
            cum += nCodePoints(d.cleanText)
            if (cum <= QuotaChars) Some(d -> cum) else None
          }
      }
      .toSeq
    def bucket(id: Long, mod: Int): Long =
      java.lang.Long.parseLong(md5hex(id.toString).take(8), 16) % mod
    val withSplit = kept.map { case (d, cum) =>
      val b = bucket(d.docId, 100)
      val split = if (b < 80) "train" else if (b < 90) "val" else "test"
      (d, cum, split)
    }
    val expected = withSplit
      .groupBy { case (d, _, split) => (split, d.source) }
      .flatMap { case (_, docs) =>
        var cumTok = 0L
        docs.sortBy(_._1.docId).map { case (d, cum, split) =>
          val nClean = d.nTokens - d.nCut
          val binId  = cumTok / PackBudget // cum BEFORE this doc
          cumTok += nClean
          d.docId -> ((d.source, split, bucket(d.docId, 64), binId, d.nTokens, d.nCut, nClean,
            nCodePoints(d.cleanText), cum, md5hex(d.cleanText)))
        }
      }

    assert(manifest.length == expected.size, s"released ${manifest.length}, replay says ${expected.size}")
    manifest.foreach { r =>
      val id  = r.getAs[Long]("doc_id")
      val exp = expected(id)
      val got = (
        r.getAs[String]("source"),
        r.getAs[String]("split"),
        r.getAs[Long]("shard"),
        r.getAs[Long]("bin_id"),
        r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_cut"),
        r.getAs[Long]("n_clean"),
        r.getAs[Long]("clean_chars"),
        r.getAs[Long]("cum_chars"),
        r.getAs[String]("clean_hash")
      )
      assert(got == exp, s"doc $id: got $got, replay $exp")
    }
  }

  test("release plan keeps the constant scan budget: ≤4 corpus scans, all column-pruned") {
    val df = Curation.releaseManifest(tables)
    df.collect()
    val plan  = df.queryExecution.executedPlan.toString
    val scans = plan.linesIterator.filter(_.contains("FileScan")).toSeq
    // the curation/decontamination DAG sits behind the checkpointed id
    // list, so the FINAL plan holds only despan's two text scans plus
    // the pruned (doc_id, source) quota join — a re-scan of the gate
    // pipeline here is exactly the composition regression this guards
    assert(scans.size <= 4, s"corpus scan budget exceeded (${scans.size}):\n${scans.mkString("\n")}")
    scans.foreach { s =>
      assert(
        !s.contains("lang") && !s.contains("n_chars"),
        s"release scans must prune to (doc_id, text)/(doc_id, source): $s"
      )
    }
  }

  test("release delta equals two manifest runs diffed; scan budget ≤ 2× a single release") {
    // C62's claim is pure composition: the changelog IS the full-outer
    // diff of two pipeline_release runs over the simulated versions —
    // replay exactly that through the public pieces (docsOverride +
    // releaseManifest) and compare row for row
    val v1 = tables.documents
      .filter(col("doc_id") % 17 =!= 2)
      .withColumn(
        "text",
        when(
          col("doc_id") % 11 === 3,
          expr("substr(text, 1, greatest(length(text) - 10, 1))")
        ).otherwise(col("text"))
      )
    val v2 = tables.documents.filter(col("doc_id") % 13 =!= 5)
    def manifest(docs: org.apache.spark.sql.DataFrame) =
      Curation
        .releaseManifest(tables.copy(docsOverride = Some(docs)))
        .collect()
        .map(r =>
          r.getAs[Long]("doc_id") ->
            ((r.getAs[String]("split"), r.getAs[Long]("shard"), r.getAs[Long]("bin_id"),
              r.getAs[String]("clean_hash")))
        )
        .toMap
    val (m1, m2) = (manifest(v1), manifest(v2))
    val expected = (m1.keySet ++ m2.keySet).map { id =>
      val change = (m1.get(id), m2.get(id)) match {
        case (None, Some(_))                  => "enter"
        case (Some(_), None)                  => "leave"
        case (Some(a), Some(b)) if a == b     => "stay"
        case _                                => "moved"
      }
      id -> change
    }.toMap

    val df = Curation.releaseDelta(tables)
    val got = df.collect()
    assert(got.map(_.getAs[Long]("doc_id")).toSet == expected.keySet)
    got.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[String]("change") == expected(id), s"doc $id")
      assert(Option(r.getAs[String]("old_clean_hash")) == m1.get(id).map(_._4), s"doc $id old hash")
      assert(Option(r.getAs[String]("new_clean_hash")) == m2.get(id).map(_._4), s"doc $id new hash")
    }
    // all four classes genuinely occur on this corpus (sf0.001 measures
    // 80/17/16/9 stay/leave/enter/moved) — an empty class would mean
    // the version rules or the diff silently degenerated
    assert(got.map(_.getAs[String]("change")).toSet == Set("enter", "leave", "moved", "stay"))

    // two releases are inherently 2× C61's ≤4-scan budget — and not one
    // scan more: a 9th corpus scan means a version's curation DAG
    // escaped its checkpointed id list
    val plan  = df.queryExecution.executedPlan.toString
    val scans = plan.linesIterator.filter(_.contains("FileScan")).toSeq
    assert(scans.size <= 8, s"delta scan budget exceeded (${scans.size}):\n${scans.mkString("\n")}")
  }

  test("release quota, packing and placement invariants hold per group") {
    val rows = Curation.releaseManifest(tables).collect()
    // quota: the running budget never exceeds the cap, per source
    rows.groupBy(_.getAs[String]("source")).foreach { case (src, docs) =>
      assert(docs.map(_.getAs[Long]("cum_chars")).max <= QuotaChars, s"$src exceeds quota")
    }
    // packing: bins start at 0, are contiguous, and a bin overflows by
    // at most one document's tail (the pack-then-pad contract)
    rows.groupBy(r => (r.getAs[String]("split"), r.getAs[String]("source"))).foreach {
      case (grp, docs) =>
        val sorted = docs.sortBy(_.getAs[Long]("doc_id"))
        val bins   = sorted.map(_.getAs[Long]("bin_id"))
        assert(bins.head == 0, s"$grp first bin must be 0")
        bins.sliding(2).foreach(w => if (w.length == 2) assert(w(1) - w(0) <= 1, s"$grp bin gap"))
        sorted.groupBy(_.getAs[Long]("bin_id")).foreach { case (bin, inBin) =>
          val toks = inBin.map(_.getAs[Long]("n_clean")).sum
          val last = inBin.map(_.getAs[Long]("n_clean")).last
          assert(toks - last < PackBudget, s"$grp bin $bin overfilled before its last doc")
        }
    }
    val splits = rows.map(_.getAs[String]("split")).toSet
    assert(splits.subsetOf(Set("train", "val", "test")))
    assert(rows.forall(r => (0 until 64).contains(r.getAs[Long]("shard").toInt)))
  }

  test("released set is near-dup free: no text-tau pair survives with both endpoints released") {
    // the invariant the whole front half exists to establish — and the
    // release criterion behind the split-leakage audit: a near-dup
    // pair with both ends in the release would leak train→test however
    // the split falls, and exact-dedup/near-dup-component gates are
    // supposed to have made that impossible
    val released = Curation.releaseManifest(tables).collect().map(_.getAs[Long]("doc_id")).toSet
    val pairs = Dedup.ngramJaccard(tables).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => released(a) && released(b) }
    assert(pairs.isEmpty, s"near-dup pairs fully inside the release: ${pairs.take(5).toSeq}")
  }

  test("release with a reliable checkpoint dir equals the localCheckpoint result") {
    // the deployment path: the survivor-id list and the shingle index
    // checkpoint to a reliable location (HDFS/S3) instead of
    // executor-local blocks — same result, real files written
    val dirP = java.nio.file.Files.createTempDirectory("release-ckpt")
    try {
      val local    = Curation.releaseManifest(tables).collect().map(_.toSeq)
      val reliable = Curation
        .releaseManifest(tables, checkpointDir = Some(dirP.toString))
        .collect()
        .map(_.toSeq)
      assert(reliable.toSeq == local.toSeq)
      assert(dirP.toFile.listFiles().nonEmpty, "no reliable checkpoint written")
    } finally deleteTree(dirP)
  }

  test("release manifest round-trips the content store (the write a release ends with)") {
    val manifest = Curation
      .releaseManifest(tables)
      .selectExpr(
        "concat('rel-', doc_id) AS result_key",
        "concat_ws('|', source, split, shard, bin_id, n_clean, clean_hash) AS payload"
      )
    val dirP = java.nio.file.Files.createTempDirectory("release-store")
    try {
      val dir = dirP.toString
      manifest.write.format("graft.sources.ContentStore").option("path", dir).mode("append").save()
      val back = spark.read
        .format("graft.sources.ContentStore")
        .option("path", dir)
        .load()
        .collect()
        .map(r => r.getString(0) -> r.getString(1))
        .toMap
      val direct = manifest.collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(back == direct, "content-store round trip altered the release manifest")
    } finally deleteTree(dirP)
  }
}
