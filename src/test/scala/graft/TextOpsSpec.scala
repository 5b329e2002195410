package graft

import graft.operators.TextOps

/** Spot-checks TextOps against independently hand-computed values on
  * real corpus rows (the oracle checks cross-engine equality; this
  * checks the semantics are the intended ones at all).
  */
class TextOpsSpec extends SparkSpecBase {

  private lazy val doc0: String =
    tables.documents.filter("doc_id = 0").collect().head.getAs[String]("text")

  test("token counts match a JVM recount on doc 0") {
    val row = TextOps.tokenCounts(tables).filter("doc_id = 0").collect().head
    val ws  = doc0.split(" ", -1)
    assert(row.getLong(1) == ws.length.toLong)
    assert(row.getLong(3) == ws.distinct.length.toLong)
    val re = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]".r.findAllIn(doc0).length
    assert(row.getLong(2) == re.toLong)
  }

  test("quality scores match a JVM recount on doc 0") {
    val row    = TextOps.qualityScores(tables).filter("doc_id = 0").collect().head
    val ws     = doc0.split(" ", -1)
    val nPunct = doc0.count(c => !c.isLetterOrDigit && !c.isWhitespace)
    assert(row.getAs[Long]("n_chars") == doc0.length.toLong)
    assert(row.getAs[Long]("n_tokens") == ws.length.toLong)
    assert(row.getAs[Long]("n_punct") == nPunct.toLong)
    val stop = ws.distinct.count(TextOps.EnMarkers.contains)
    assert(row.getAs[Long]("n_stopwords") == stop.toLong)
    assert(row.getAs[Double]("punct_ratio") == nPunct.toDouble / doc0.length)
  }

  test("langid picks a language iff a marker hits, with en precedence") {
    val rows = TextOps.langId(tables).collect()
    rows.foreach { r =>
      val (en, es, de, pred) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))
      if (en + es + de == 0) assert(pred == "und")
      else if (pred == "en") assert(en >= es && en >= de && en > 0)
      else if (pred == "es") assert(es >= de && es > 0 && en < es)
      else assert(de > 0)
    }
    assert(rows.count(_.getString(4) == "en") > 0, "corpus should contain english docs")
  }

  test("winnowing fingerprints survive prepend edits (local similarity)") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog and then runs far away into the woods " * 4
    val docs = Seq((1L, base), (2L, "PREFIX EDIT " + base), (3L, base)).toDF("doc_id", "text")
    graft.functions.WinnowExpr.register(spark)
    val fps = docs
      .selectExpr("doc_id", "winnow_fp(text) AS fp")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet)
      .toMap
    assert(fps(1) == fps(3), "identical docs must have identical fingerprint sets")
    val overlap = (fps(1) & fps(2)).size.toDouble / fps(1).size
    info(f"winnow overlap under prepend edit: $overlap%.2f")
    assert(overlap >= 0.6, f"local fingerprints collapsed under edit: $overlap%.2f")
    assert(fps(1) != fps(2), "edited doc must differ somewhere")
  }

  test("langid classifies real multilingual sentences correctly") {
    import spark.implicits._
    // corpus lang labels are random metadata (text is the same synthetic
    // vocabulary for every label), so validate on real sentences instead
    val docs = Seq(
      (1L, "the quick brown fox jumped over a fence and is gone", "en"),
      (2L, "el perro corre por la calle y los gatos duermen", "es"),
      (3L, "der Hund läuft und die Katze schläft mit das Kind", "de"),
      (4L, "xyzzy plugh qwerty asdf", "und")
    ).toDF("doc_id", "text", "expected")
    val preds = TextOps.langIdOn(docs.select("doc_id", "text")).collect()
      .map(r => r.getLong(0) -> r.getString(4)).toMap
    docs.select("doc_id", "expected").collect().foreach { r =>
      assert(preds(r.getLong(0)) == r.getString(1), s"doc ${r.getLong(0)}")
    }
  }

  test("PII redaction finds and replaces emails, IPs, and phone numbers on crafted docs") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val crafted = Seq(
      (1L, "contact alice.smith+spam@example-corp.co.uk or bob@ex.io today"),
      (2L, "server at 192.168.0.1 and 10.0.255.254 responded"),
      (3L, "call 555-123-4567 or +1 555 987 6543 now"), // second: country code digits join
      (4L, "no pii here at all"),
      (5L, "mixed: carol@web.de from 8.8.8.8 dials 555 867 5309")
    ).toDF("doc_id", "text")
    val rows = TextOps.piiRedactOn(crafted).collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(1).getAs[Long]("n_emails") == 2 && rows(1).getAs[Long]("n_ips") == 0)
    assert(rows(2).getAs[Long]("n_ips") == 2 && rows(2).getAs[Long]("n_emails") == 0)
    assert(rows(3).getAs[Long]("n_phones") == 2)
    assert(
      rows(4).getAs[String]("redacted_hash") ==
        crafted.filter("doc_id = 4").select(md5(col("text"))).collect().head.getString(0),
      "pii-free text must hash unchanged"
    )
    assert(rows(5).getAs[Long]("n_emails") == 1 && rows(5).getAs[Long]("n_ips") == 1
      && rows(5).getAs[Long]("n_phones") == 1)
    // the redacted text itself carries no residual matches
    val redacted = crafted.select(
      col("doc_id"),
      regexp_replace(
        regexp_replace(
          regexp_replace(col("text"), TextOps.EmailPat, "<EMAIL>"),
          TextOps.Ipv4Pat,
          "<IP>"
        ),
        TextOps.PhonePat,
        "<PHONE>"
      ).as("r")
    ).as[(Long, String)].collect().toMap
    assert(redacted(1) == "contact <EMAIL> or <EMAIL> today")
    assert(redacted(2) == "server at <IP> and <IP> responded")
    assert(redacted(5) == "mixed: <EMAIL> from <IP> dials <PHONE>")
    redacted.values.foreach { t =>
      assert(TextOps.EmailPat.r.findFirstIn(t).isEmpty && TextOps.Ipv4Pat.r.findFirstIn(t).isEmpty)
    }
  }

  test("commonWordFrac agrees with a naive recount against the derived vocabulary") {
    val texts = tables.documents
      .select("doc_id", "text")
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
      .toMap
    // reference vocabulary: top-100 by (count desc, word asc), computed naively
    val vocab = texts.values.toSeq
      .flatMap(_.split(" ", -1))
      .groupBy(identity)
      .view
      .mapValues(_.size)
      .toSeq
      .sortBy { case (w, c) => (-c, w) }
      .take(graft.operators.TextOps.CommonVocab)
      .map(_._1)
      .toSet
    val got = TextOps.commonWordFrac(tables).collect()
    assert(got.length == texts.size)
    got.foreach { r =>
      val ws = texts(r.getAs[Long]("doc_id")).split(" ", -1)
      assert(r.getAs[Long]("n_tokens") == ws.length.toLong)
      assert(r.getAs[Long]("n_common") == ws.count(vocab).toLong)
      assert(r.getAs[Double]("common_frac") >= 0.0 && r.getAs[Double]("common_frac") <= 1.0)
    }
  }

  test("repetition flags agree with a naive per-doc recount") {
    val texts = tables.documents
      .select("doc_id", "text")
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
      .toMap
    val got = TextOps.repetition(tables).collect()
    assert(got.length == texts.size)
    got.foreach { r =>
      val ws      = texts(r.getAs[Long]("doc_id")).split(" ", -1)
      val bigrams = ws.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
      assert(r.getAs[Long]("n_words") == ws.length.toLong)
      assert(r.getAs[Long]("n_distinct") == ws.distinct.length.toLong)
      assert(r.getAs[Long]("n_bigrams") == bigrams.length.toLong)
      val top = if (bigrams.isEmpty) 0L else bigrams.groupBy(identity).values.map(_.size).max.toLong
      assert(r.getAs[Long]("top_bigram_count") == top)
    }
  }

  test("BPE merge candidates equal a naive vocab-weighted pair count") {
    val words = tables.documents
      .select("text")
      .collect()
      .flatMap(_.getAs[String]("text").split(" ", -1))
    val vocab = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val naive = vocab.toSeq
      .filter(_._1.length >= 2)
      .flatMap { case (w, c) => w.sliding(2).map(_ -> c) }
      .groupBy(_._1)
      .view
      .mapValues(_.map(_._2).sum)
      .toSeq
      .sortBy { case (p, c) => (-c, p) }
      .take(TextOps.BpeTopK)
    val got = TextOps.bpeMergeCandidates(tables).collect()
      .map(r => r.getAs[String]("pair") -> r.getAs[Long]("pair_count"))
    assert(got.toSeq.sortBy { case (p, c) => (-c, p) } == naive)
    assert(got.length == TextOps.BpeTopK)
  }

  test("corpus canary: the BPE wrap separator (0x1F) never occurs in corpus text, at any SF") {
    // bpeApply/vocabCoverage encode tokens with 0x1F delimiters; a
    // corpus containing that byte would corrupt the encoding in BOTH
    // the operator and its oracle — not necessarily identically. No SF
    // carries it today; if regenerated testdata ever does, THIS names
    // the cause (the exact-session-gap canary's pattern).
    import org.apache.spark.sql.functions.col
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val n = graft.sources.Tables(spark, s"/root/testdata/$sf").documents
        .filter(col("text").contains("\u001f"))
        .count()
      assert(n == 0L, s"$sf has $n docs containing 0x1F — the BPE wrap encoding is unsafe")
    }
  }

  test("BPE apply equals a token-level driver replay; compression monotone in merge budget") {
    // independent validation of the wrapped-separator replace trick:
    // replay merge application at the TOKEN level (leftmost
    // non-overlapping pair merge per rank) and demand identical counts
    val merges = TextOps.bpeMergeCandidates(tables).collect().map(_.getString(0)).toSeq
    val words = tables.documents.selectExpr("explode(split(text, ' ')) AS w").collect()
      .map(_.getString(0)).filter(_.nonEmpty)
    def tokensAfter(w: String, k: Int): Int = {
      var toks = w.map(_.toString).toVector
      merges.take(k).foreach { pair =>
        val (a, b) = (pair.substring(0, 1), pair.substring(1, 2))
        val out    = Vector.newBuilder[String]
        var i      = 0
        while (i < toks.length) {
          if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) { out += pair; i += 2 }
          else { out += toks(i); i += 1 }
        }
        toks = out.result()
      }
      toks.length
    }
    val chars = words.map(_.length.toLong).sum
    val expected = Seq(0, 10, 25, 50)
      .map(k => k.toLong -> words.map(w => tokensAfter(w, k).toLong).sum).toMap
    val got = TextOps.bpeApply(tables).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (k, (tok, ch)) =>
      assert(ch == chars, s"K=$k chars $ch vs $chars")
      assert(tok == expected(k), s"K=$k tokens $tok vs ${expected(k)}")
    }
    assert(got(0L)._1 == chars, "zero merges must be char-level")
    Seq(0L -> 10L, 10L -> 25L, 25L -> 50L).foreach { case (a, b) =>
      assert(got(b)._1 <= got(a)._1, s"token count grew from K=$a to K=$b")
    }
  }

  test("vocab coverage equals a token-level replay; total matches the K=50 apply count") {
    val merges = TextOps.bpeMergeCandidates(tables).collect().map(_.getString(0)).toSeq
    val words = tables.documents.selectExpr("explode(split(text, ' ')) AS w").collect()
      .map(_.getString(0)).filter(_.nonEmpty)
    def tokensOf(w: String): Vector[String] = {
      var toks = w.map(_.toString).toVector
      merges.foreach { pair =>
        val (a, b) = (pair.substring(0, 1), pair.substring(1, 2))
        val out    = Vector.newBuilder[String]
        var i      = 0
        while (i < toks.length) {
          if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) { out += pair; i += 2 }
          else { out += toks(i); i += 1 }
        }
        toks = out.result()
      }
      toks
    }
    val inv = words.flatMap(tokensOf).groupBy(identity).view.mapValues(_.size.toLong).toMap
    // structural bound: every merge adds at most one token kind
    val alphabet = words.flatMap(_.toSeq).toSet.size
    assert(inv.size <= alphabet + merges.length,
      s"inventory ${inv.size} exceeds alphabet $alphabet + ${merges.length} merges")
    val ranked = inv.toSeq.sortBy { case (tok, c) => (-c, tok) }
    val total  = inv.values.sum
    val expected = Seq(4, 16, 64, 256).map { v =>
      val covered = ranked.take(v).map(_._2).sum
      v.toLong -> ((covered, total, BigInt(total - covered) * 1000000 / BigInt(total)))
    }.toMap
    val got = TextOps.vocabCoverage(tables).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), BigInt(r.getLong(3))))).toMap
    assert(got == expected, s"got=$got expected=$expected")
    // cross-op consistency: the coverage total IS bpeApply's K=50 count
    val applyK50 = TextOps.bpeApply(tables).collect()
      .collectFirst { case r if r.getLong(0) == 50L => r.getLong(1) }.get
    assert(applyK50 == total, s"apply K=50 $applyK50 vs coverage total $total")
  }

  test("vocab coverage on a corpus with fewer pairs than BpeTopK still emits the full curve") {
    // the oracle selects its final recursion level dynamically
    // (max(r), not a fixed BpeTopK) so a short merge table can't
    // zero the gate — pin the OPERATOR's matching behavior on a
    // two-letter corpus (≤4 distinct pairs ≪ 50 merges)
    import org.apache.spark.sql.functions._
    val tmp  = java.nio.file.Files.createTempDirectory("graft-few-pairs")
    try {
      val texts = Seq("aa ab aa ba", "ab aa bb", "aa aa ab")
      val base  = tables.documents.limit(1)
      texts.zipWithIndex
        .map { case (txt, i) =>
          base.withColumn("doc_id", lit(i.toLong)).withColumn("text", lit(txt))
        }
        .reduce(_ unionAll _)
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val tt     = graft.sources.Tables(spark, tmp.toString)
      val merges = TextOps.bpeMergeCandidates(tt).collect().map(_.getString(0)).toSeq
      assert(merges.length < TextOps.BpeTopK, "fixture must under-fill the merge table")
      val rows = TextOps.vocabCoverage(tt).collect()
      assert(rows.length == 4, s"curve must keep all 4 vocab sizes, got ${rows.length}")
      // replay the SHORT merge table driver-side — the whole point of
      // the dynamic final level is that all |merges| merges apply
      def tokensOf(w: String): Vector[String] = {
        var toks = w.map(_.toString).toVector
        merges.foreach { pair =>
          val (a, b) = (pair.substring(0, 1), pair.substring(1, 2))
          val out    = Vector.newBuilder[String]
          var i      = 0
          while (i < toks.length) {
            if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) { out += pair; i += 2 }
            else { out += toks(i); i += 1 }
          }
          toks = out.result()
        }
        toks
      }
      val inv = texts.flatMap(_.split(" ")).filter(_.nonEmpty).flatMap(tokensOf)
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val ranked = inv.toSeq.sortBy { case (tok, c) => (-c, tok) }
      val total  = inv.values.sum
      val expected = Seq(4L, 16L, 64L, 256L).map { v =>
        v -> ((ranked.take(v.toInt).map(_._2).sum, total))
      }.toMap
      val got = rows.map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(got == expected, s"got=$got expected=$expected")
    } finally deleteTree(tmp)
  }

  test("length percentile gate keeps exactly the docs at/above the exact p75 of n_chars") {
    val lens = tables.documents.select("doc_id", "n_chars").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Number]("n_chars").longValue())
    val sorted    = lens.map(_._2).sorted
    val pos       = math.ceil(0.75 * sorted.length).toInt
    val threshold = sorted(pos - 1)
    val expected  = lens.filter(_._2 >= threshold).map(_._1).toSet
    val got = TextOps.lengthPercentileGate(tables).collect()
    assert(got.forall(_.getAs[Long]("len_threshold") == threshold))
    assert(got.map(_.getAs[Long]("doc_id")).toSet == expected)
  }

  test("collocations equal the brute-force integer-lift filter") {
    val docs = tables.documents.select("text").collect().map(_.getString(0).split(" ", -1).toSeq)
    val uni  = docs.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n    = docs.map(_.size).sum.toLong
    val big  = docs.flatMap(ws => ws.zip(ws.drop(1)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expected = big.collect {
      case ((w1, w2), c)
          if c >= 5 &&
            BigInt(c) * n * 10 >= BigInt(14) * uni(w1) * uni(w2) =>
        (w1, w2, c, uni(w1), uni(w2))
    }.toSet
    val got = TextOps.collocations(tables).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSet == expected, s"${got.length} vs expected ${expected.size}")
    // output ordering contract: support-descending, then lexicographic
    assert(got.sortBy(x => (-x._3, x._1, x._2)).toSeq == got.toSeq)
  }

  test("lm coverage equals the brute-force bigram membership count") {
    import org.apache.spark.sql.functions.col
    val trusted = (0 to 4).map("src" + _).toSet
    val docs = tables.documents.select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def bigrams(text: String): Seq[(String, String)] = {
      val ws = text.split(" ", -1)
      ws.zip(ws.drop(1)).toSeq
    }
    val vocab = docs.filter(d => trusted(d._2)).flatMap(d => bigrams(d._3)).toSet
    val expected = docs.filterNot(d => trusted(d._2)).flatMap { case (id, _, text) =>
      val bs = bigrams(text)
      if (bs.isEmpty) None
      else {
        val hit = bs.count(vocab)
        Some(id -> ((bs.size.toLong, hit.toLong, hit.toLong * 10 / bs.size)))
      }
    }.toMap
    val got = TextOps.lmCoverage(tables).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected, s"${got.size} docs vs expected ${expected.size}")
    assert(got.nonEmpty && got.valuesIterator.forall { case (n, h, d) => h <= n && d <= 10 })
  }
}
