package graft

import graft.operators.{Dedup, TextOps}

/** Cross-validation of the approximate dedup paths against their exact
  * counterparts — the checks the SQL oracle can't express.
  */
class DedupSpec extends SparkSpecBase {

  test("MinHash-LSH verified pairs equal exact n-gram Jaccard pairs") {
    val exact = Dedup.ngramJaccard(tables).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh   = Dedup.minhashLsh(tables).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact, s"missed=${exact -- lsh} extra=${lsh -- exact}")
    assert(exact.nonEmpty, "test corpus has no near-dup pairs — spec is vacuous")
  }

  test("prefix-filtered join: identical pairs to the full index from strictly fewer candidates") {
    val full = Dedup.ngramJaccard(tables).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val pref = Dedup.ngramJaccardPrefix(tables).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pref == full, s"prefix filter lost/invented pairs: ${pref.size} vs ${full.size}")
    assert(pref.nonEmpty)
    // the point of the prefix guarantee: the candidate set it verifies
    // is a strict subset of the full inverted-index candidate set, and
    // the PPJoin positional bound prunes it strictly further — while
    // still covering every true pair (the equality assert above)
    val (posCands, prefCands, fullCands) = Dedup.prefixCandidateCounts(tables)
    assert(prefCands < fullCands, s"no prefix pruning: $prefCands vs $fullCands")
    assert(posCands < prefCands, s"no positional pruning: $posCands vs $prefCands")
    assert(posCands >= pref.size.toLong, "candidates must cover every true pair")
  }

  test("exact-dup groups partition the corpus") {
    val rows  = Dedup.exact(tables).collect()
    val total = tables.documents.count()
    assert(rows.length == total)
    // every group's keeper is a member of the group
    val byHash = rows.groupBy(_.getString(1))
    byHash.foreach { case (_, g) =>
      val keeper = g.head.getLong(2)
      assert(g.map(_.getLong(0)).min == keeper)
      assert(g.forall(_.getLong(3) == g.length))
    }
  }

  test("SimHash pairs: hamming bound holds and exact dups are found (hamming 0)") {
    val pairs = Dedup.simhashPairs(tables).collect()
    assert(pairs.forall(_.getLong(2) <= 3))
    // docs with identical normalized text have identical word sets →
    // identical simhash → must appear as hamming-0 pairs
    val exactGroups = Dedup.exact(tables).collect().groupBy(_.getString(1)).values
    val exactPairs = exactGroups.flatMap { g =>
      val ids = g.map(_.getLong(0)).sorted.toSeq
      for (a <- ids; b <- ids if a < b) yield (a, b)
    }.toSet
    val simPairs = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exactPairs.subsetOf(simPairs), s"missed exact dups: ${exactPairs -- simPairs}")
  }

  test("fingerprint groups are a superset of exact-dup groups") {
    val exact = Dedup.exact(tables).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val fp    = TextOps.fingerprints(tables).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // same normalized text ⇒ same bag-of-words fingerprint
    exact.groupBy(_._2).values.filter(_.size > 1).foreach { g =>
      val fps = g.keys.map(fp).toSet
      assert(fps.size == 1, s"exact dups split across fingerprints: $g")
    }
  }

  test("embedding-LSH scale path: no false positives, usable recall vs exact pairs") {
    val exact = Dedup.embeddingCosine(tables).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh   = Dedup.embeddingCosineLsh(tables).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((lsh -- exact).isEmpty, s"cosine-verified candidates can't exceed exact: ${lsh -- exact}")
    val recall = if (exact.isEmpty) 1.0 else (exact & lsh).size.toDouble / exact.size
    info(f"embedding-LSH recall vs exact τ≥0.4 pairs: $recall%.2f")
    assert(recall >= 0.4, f"recall collapsed: $recall%.2f")
  }

  test("near-dup components: endpoints of every pair share a component; labels are component minima") {
    val pairs = Dedup.ngramJaccard(tables).collect().map(r => (r.getLong(0), r.getLong(1)))
    val comp  = Dedup.nearDupComponents(tables).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    pairs.foreach { case (a, b) => assert(comp(a) == comp(b), s"pair ($a,$b) split across components") }
    comp.groupBy(_._2).foreach { case (label, members) =>
      assert(members.keys.min == label, s"component $label label isn't its min member")
    }
  }

  test("winnow pairs agree with the word-level family on exact duplicates") {
    val winnow = Dedup.winnowPairs(tables).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact duplicates (identical normalized text) must be found by the
    // byte-level fingerprints too
    val exactGroups = Dedup.exact(tables).collect().groupBy(_.getString(1)).values
    val exactPairs = exactGroups.flatMap { g =>
      val ids = g.map(_.getLong(0)).sorted.toSeq
      for (a <- ids; b <- ids if a < b) yield (a, b)
    }.toSet
    assert(exactPairs.subsetOf(winnow), s"missed exact dups: ${exactPairs -- winnow}")
    winnow.foreach { case (a, b) => assert(a < b) }
  }

  test("source-slice MinHash union estimates the gated exact slice Jaccard within sketch error") {
    val est = Dedup.sourceSimilarity(tables).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    // the exact twin is itself hash-gated (dedup_source_sim_exact), so
    // the sketch's error band is pinned against a verified number —
    // and the operator must agree with a naive driver-side computation
    val exactRows = Dedup.sourceSimilarityExact(tables).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Double]("jaccard")).toMap
    val docs = tables.documents.select("source", "text").collect()
      .groupBy(_.getString(0))
      .map { case (src, rows) =>
        src -> rows.flatMap { r =>
          val ws = r.getString(1).split(" ", -1)
          (0 until math.max(ws.length - 2, 1)).map(i => ws.slice(i, i + 3).mkString(" "))
        }.toSet
      }
    assert(est.keySet == exactRows.keySet, "sketch and exact twin must cover the same pair matrix")
    exactRows.foreach { case ((a, b), exact) =>
      val naive = (docs(a) & docs(b)).size.toDouble / (docs(a) | docs(b)).size
      assert(exact == naive, f"($a,$b): operator $exact%.6f vs naive $naive%.6f")
      // 128-hash sketch: std error ~ sqrt(j(1-j)/128) <= 0.045; allow 4 sigma
      assert(math.abs(est((a, b)) - exact) <= 0.18, f"($a,$b): est ${est((a, b))}%.3f vs exact $exact%.3f")
    }
    assert(est.nonEmpty)
  }

  test("frequency-capped ngram pairs are a subset of exact pairs") {
    val exact  = Dedup.ngramJaccard(tables).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = Dedup.ngramJaccardCapped(tables, cap = 50).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.subsetOf(exact), s"cap invented pairs: ${capped -- exact}")
    // on this near-dup-heavy corpus a 50-doc cap should keep most pairs
    assert(capped.size.toDouble / exact.size >= 0.5, s"cap too destructive: ${capped.size}/${exact.size}")
  }

  test("components with a reliable checkpoint dir equal the localCheckpoint result") {
    val dir = java.nio.file.Files.createTempDirectory("graft-reliable-ckpt").toString
    val local = Dedup.nearDupComponents(tables).collect().map(r => (r.getLong(0), r.getLong(1)))
    val reliable = Dedup
      .nearDupComponents(tables, checkpointDir = Some(dir))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(reliable.toSeq == local.toSeq)
    // reliable mode must actually have written RDD checkpoints
    assert(new java.io.File(dir).listFiles().nonEmpty, "no reliable checkpoint written")
  }

  test("shingle paths survive documents shorter than one trigram (ANSI element_at)") {
    // Spark 4 defaults to ANSI mode, where out-of-bounds element_at
    // throws — the test corpus (min 10 words/doc) never exercises the
    // short-doc branch, so build one that does: 0/1/2-word documents
    // must flow through every shingle-based operator without error.
    import org.apache.spark.sql.functions._
    val tmp  = java.nio.file.Files.createTempDirectory("graft-short-docs").toString
    val base = tables.documents.limit(6)
    val shorts = Seq("", "one", "two words", "three word doc").zipWithIndex
      .map { case (txt, i) =>
        base.limit(1).withColumn("doc_id", lit(900000L + i)).withColumn("text", lit(txt))
      }
      .reduce(_ unionAll _)
    base.unionAll(shorts).coalesce(1).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val tt = graft.sources.Tables(spark, tmp)
    // must not throw, and every doc must keep at least one shingle
    val lsh = Dedup.minhashLsh(tt).collect()
    lsh.foreach(r => assert(r.getLong(0) < r.getLong(1)))
    val sim = Dedup.sourceSimilarity(tt).collect()
    assert(sim.forall(r => r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0))
    assert(Dedup.ngramJaccard(tt).collect() != null)
  }

  test("split leakage is exactly the cross-split subset of the near-dup pairs") {
    val splits = graft.operators.Sampling
      .splitAssign(tables)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split"))
      .toMap
    val expected = Dedup
      .ngramJaccard(tables)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => splits(a) != splits(b) }
      .toSet
    val got = graft.operators.Curation.splitLeakage(tables).collect()
    got.foreach { r =>
      assert(r.getAs[String]("split_a") != r.getAs[String]("split_b"))
      assert(r.getAs[String]("split_a") == splits(r.getLong(0)))
      assert(r.getAs[String]("split_b") == splits(r.getLong(1)))
    }
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSet == expected)
  }

  test("embedding cosine pairs are ordered and self-free") {
    val pairs = Dedup.embeddingCosine(tables).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.forall { case (a, b) => a < b })
    assert(pairs.distinct.length == pairs.length)
  }

  private def naiveShingles(s: String): Set[String] =
    s.split(" ").sliding(3).map(_.mkString(" ")).toSet

  test("dup-shingle fraction matches a naive per-doc recount") {
    val docs = tables.documents.select("doc_id", "text").collect()
    val sets = docs.map(d => d.getAs[Long]("doc_id") -> naiveShingles(d.getAs[String]("text"))).toMap
    val df   = sets.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val got  = Dedup.dupShingleFrac(tables).collect()
    assert(got.length == docs.length)
    got.foreach { r =>
      val id   = r.getAs[Long]("doc_id")
      val dups = sets(id).count(sh => df(sh) >= 2)
      assert(r.getAs[Long]("n_sh") == sets(id).size.toLong, s"doc $id n_sh")
      assert(r.getAs[Long]("n_dup_sh") == dups.toLong, s"doc $id n_dup_sh")
    }
  }

  test("corpus canary: near-dup pairs stay far above the LSH band-miss cliff, at any SF") {
    // dedup_minhash_lsh and dedup_incremental_lsh share their EXACT
    // oracles on a whp argument: band-miss prob (1-s^4)^32 is ~5e-8 at
    // the s ≥ 0.8 every generated near-dup sits at today (measured
    // min: 0.89/0.90/0.80 across SFs). A pair at s ≈ 0.5-0.6 would
    // make misses material (~13% at 0.5) and those keys would start
    // hash-mismatching nondeterministically — if regenerated testdata
    // ever introduces tau-marginal pairs, THIS names the cause instead
    // of leaving flaky gate failures on the LSH-shared-oracle keys.
    for (sf <- availableSfDirs) {
      val t   = graft.sources.Tables(spark, s"/root/testdata/$sf")
      val row = Dedup.ngramJaccard(t).agg(org.apache.spark.sql.functions.min("jaccard"))
        .collect().head
      // zero pairs = zero band-miss risk: the canary passes (min over
      // an empty set is null, and getDouble on null would NPE)
      if (!row.isNullAt(0)) {
        val minJ = row.getDouble(0)
        assert(minJ >= 0.7,
          f"$sf has a near-dup pair at jaccard $minJ%.3f — LSH band-miss is no longer " +
            "negligible; expect flaky hash mismatches on dedup_minhash_lsh / dedup_incremental_lsh")
      }
    }
  }

  test("incremental LSH probe equals the exact posting probe row for row") {
    // the C3/C2 relationship applied to the C22 probe: band candidates
    // + exact verification must reproduce the posting-index result
    // exactly on this corpus (band-miss prob (1-s^4)^32 is ~1e-15 at
    // the s≈0.9 the generated near-dups sit at), and the plan must
    // probe BANDS, not postings — the whole point of the variant
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map { r =>
      (r.getAs[Long]("doc_id"), r.getAs[String]("dup_kind"),
        Option(r.getAs[Any]("match_doc_id")),
        Option(r.getAs[Any]("near_jaccard")))
    }.toSeq
    assert(rows(Dedup.incrementalDedupLsh(tables)) == rows(Dedup.incrementalDedup(tables)))
  }

  test("incremental dedup: verdict precedence and matches agree with a naive base-vs-delta pass") {
    val docs = tables.documents.select("doc_id", "text").collect()
    def norm(s: String)  = s.trim.replaceAll("\\s+", " ")
    val byId             = docs.map(d => d.getAs[Long]("doc_id") -> d.getAs[String]("text")).toMap
    val (delta, base)    = byId.keys.toSeq.partition(_ % 10 == 0)
    val baseByNorm       = base.groupBy(id => norm(byId(id)))
    def jac(a: Long, b: Long): Double = {
      val (sa, sb) = (naiveShingles(byId(a)), naiveShingles(byId(b)))
      val i        = (sa & sb).size
      i.toDouble / (sa.size + sb.size - i)
    }
    val got = Dedup.incrementalDedup(tables).collect()
    assert(got.map(_.getAs[Long]("doc_id")).toSet == delta.toSet)
    got.foreach { r =>
      val id      = r.getAs[Long]("doc_id")
      val exactM  = baseByNorm.get(norm(byId(id))).map(_.min)
      val nearCands = base.map(b => (b, jac(id, b))).filter(_._2 >= Dedup.JaccardTau)
      val nearM   = if (nearCands.isEmpty) None
                    else Some(nearCands.minBy { case (b, j) => (-j, b) })
      (r.getAs[String]("dup_kind"), exactM, nearM) match {
        case ("exact", Some(e), _) => assert(r.getAs[Long]("match_doc_id") == e)
        case ("near", None, Some((b, j))) =>
          assert(r.getAs[Long]("match_doc_id") == b)
          assert(math.abs(r.getAs[Double]("near_jaccard") - j) < 1e-12)
        case ("new", None, None) => assert(r.isNullAt(r.fieldIndex("match_doc_id")))
        case other               => fail(s"doc $id: inconsistent verdict $other")
      }
    }
    // the corpus has no exact whole-doc duplicate (verified: dedup_exact
    // groups are all singletons), so only near/new occur here — the
    // exact arm is exercised on crafted inputs below
    assert(got.map(_.getAs[String]("dup_kind")).toSet == Set("near", "new"))
  }

  test("containment pairs: quotes link back to sources; high-jaccard pairs are excluded") {
    import spark.implicits._
    val longA = (1 to 20).map(i => s"w$i").mkString(" ")          // 18 shingles
    val quoteB = (1 to 5).map(i => s"w$i").mkString(" ")          // 3 shingles, all in A
    val nearC  = (1 to 19).map(i => s"w$i").mkString(" ") + " zz" // jaccard ~0.89 vs A
    val docs = Seq((1L, longA), (2L, quoteB), (3L, nearC), (4L, "totally unrelated text lives here"))
      .toDF("doc_id", "text")
    val got = Dedup
      .containmentPairsOn(docs)
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Double]("containment"), r.getAs[Double]("jaccard")))
    // the quote (2 in 1) and the quote-in-near-dup (2 in 3) pass; the
    // same-length near-dup (1,3) is jaccard territory and must NOT
    // appear here
    assert(got.map(p => (p._1, p._2)).toSet == Set((1L, 2L), (2L, 3L)), s"got ${got.toSeq}")
    got.filter(p => (p._1, p._2) == (1L, 2L)).foreach { p =>
      assert(p._3 == 1.0 && p._4 < 0.5)
    }
    // corpus fixture: every excerpt doc (negated id) links back to its
    // source; excerpts sort first so pairs arrive as (excerpt, source)
    val corpus = Dedup.containmentPairs(tables).collect()
    assert(corpus.nonEmpty)
    val links = corpus.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    assert(links.exists { case (a, b) => a == -b - 1L },
      s"no excerpt→source link in ${links.toSeq.take(10)}")
  }

  test("snapshot diff classifies exactly the simulated added/removed/changed docs") {
    val ids = tables.documents.select("doc_id").collect().map(_.getLong(0)).toSet
    val got = graft.operators.Curation.snapshotDiff(tables).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("change"))
      .toMap
    // a doc matching BOTH class predicates is in neither snapshot and
    // yields no changelog row (e.g. doc 70: %17==2 and %13==5)
    val added   = ids.filter(i => i % 17 == 2 && i % 13 != 5)
    val removed = ids.filter(i => i % 13 == 5 && i % 17 != 2)
    val changed = ids.filter(i => i % 11 == 3 && i % 17 != 2 && i % 13 != 5)
    assert(got.filter(_._2 == "added").keySet == added)
    assert(got.filter(_._2 == "removed").keySet == removed)
    assert(got.filter(_._2 == "changed").keySet == changed)
    assert(got.size == added.size + removed.size + changed.size, "unchanged docs leaked into the changelog")
  }

  test("incremental dedup on crafted inputs: exact beats near, near picks best base match") {
    import spark.implicits._
    val base  = "alpha beta gamma delta epsilon zeta eta theta"
    val near  = "alpha beta gamma delta epsilon zeta eta iota"
    val docs = Seq(
      (3L, base),                      // base corpus
      (7L, near),                      // base: near variant of doc 3
      (9L, "completely different words live here today"),
      // delta slice (% 10 == 0):
      (10L, "  alpha beta   gamma delta epsilon zeta eta theta "), // exact after normalization (also near-dups 3/7)
      (20L, near),                                                 // exact copy of base doc 7
      (30L, "alpha beta gamma delta epsilon zeta xi omicron"),     // near only
      (40L, "nothing in common with anything else at all")         // new
    ).toDF("doc_id", "text")
    val got = Dedup
      .incrementalDedupOn(docs)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("dup_kind"), Option(r.getAs[java.lang.Long]("match_doc_id")).map(_.toLong)))
      .toMap
    // 10 normalizes to doc 3's text → exact wins over its near matches
    assert(got(10L) == ("exact", Some(3L)))
    assert(got(20L) == ("exact", Some(7L)))
    // 30 near-matches 3 and 7; best = highest jaccard (tie) → smallest base id
    assert(got(30L)._1 == "near" && got(30L)._2.contains(3L))
    assert(got(40L) == ("new", None))
  }

  test("bloom admission: zero false negatives vs the exact twin, bounded false positives") {
    import spark.implicits._
    // crafted mix on the C22 split (delta = doc_id % 10 == 0): 20 and
    // 30 duplicate base docs 3 and 7 exactly; 10 and 40 are new
    val docs = Seq(
      (3L, "alpha beta gamma delta"),
      (7L, "epsilon zeta eta theta"),
      (8L, "iota kappa lambda mu"),
      (10L, "totally novel text one"),
      (20L, "alpha  beta\tgamma delta"), // normalizes to doc 3's text
      (30L, "epsilon zeta eta theta"),
      (40L, "totally novel text two")
    ).toDF("doc_id", "text")
    val got = Dedup.bloomAdmissionOn(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.keySet == Set(10L, 20L, 30L, 40L), "delta slice is doc_id % 10 == 0")
    // no false negatives: every true duplicate must be flagged
    assert(got(20L) == "seen_maybe", "exact dup of base doc 3 missed — bloom broke its contract")
    assert(got(30L) == "seen_maybe", "exact dup of base doc 7 missed")
    // fixture-scale FP check on the real corpus: the synthetic corpus
    // has no exact whole-doc duplicates, so every seen_maybe is a
    // false positive — with 1M estimated items and ~450 base docs the
    // sketch is effectively empty and FPs should be zero-ish
    val corpus = Dedup.bloomAdmission(tables).collect()
    assert(corpus.nonEmpty)
    val fps = corpus.count(_.getString(1) == "seen_maybe")
    assert(fps <= math.max(1, corpus.length / 20),
      s"$fps false positives in ${corpus.length} probes — sketch undersized")
  }

  test("top-k similar docs: contiguous ranks, non-increasing jaccard, TopKPerKey plan") {
    val df   = Dedup.topKSimilarDocs(tables)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      val byRank = rs.sortBy(_.getAs[Long]("rnk"))
      assert(byRank.map(_.getAs[Long]("rnk")).toSeq == (1L to byRank.length).toSeq,
        s"query $q ranks not contiguous")
      val js = byRank.map(_.getAs[Double]("jaccard"))
      assert(js.zip(js.drop(1)).forall { case (a, b) => a >= b }, s"query $q not sorted")
    }
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), s"ranking must use the bounded-heap exec:\n$plan")
  }

  test("substring spans: island merge, abutting coverage, boundaries, within-doc repeats") {
    import spark.implicits._
    val docs = Seq(
      // doc1/doc2 share a 6-token run (two overlapping 5-windows) AND a
      // tail 5-token run — two islands per doc, one starting mid-doc
      (1L, "a1 a2 a3 a4 a5 a6 x1 x2 x3 x4 x5 x6 c1 c2 c3 c4 c5"),
      (2L, "y1 y2 y3 a1 a2 a3 a4 a5 a6 y4 y5 y6 y7 y8 y9 c1 c2 c3 c4 c5"),
      (3L, "z1 z2 z3 z4"), // shorter than k: no windows at all
      // the same 5-run twice in ONE doc — within-doc multiplicity counts
      (4L, "r1 r2 r3 r4 r5 q1 r1 r2 r3 r4 r5"),
      // doc5's windows at pos 0 and 5 duplicate (via doc6/doc7) but
      // 1-4 don't: coverage [0,4]+[5,9] ABUTS -> must merge to [0,9]
      (5L, "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10"),
      (6L, "m1 b1 b2 b3 b4 b5 m2 m3 m4 m5 m6"),
      (7L, "n1 n2 b6 b7 b8 b9 b10 n3 n4 n5")
    ).toDF("doc_id", "text")
    val got = Dedup.substringSpansOn(docs, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val expected = Set(
      (1L, 0L, 5L, 6L), (1L, 12L, 16L, 5L),
      (2L, 3L, 8L, 6L), (2L, 15L, 19L, 5L),
      (4L, 0L, 4L, 5L), (4L, 6L, 10L, 5L),
      (5L, 0L, 9L, 10L),
      (6L, 1L, 5L, 5L), (7L, 2L, 6L, 5L)
    )
    assert(got == expected, s"missing=${expected -- got} extra=${got -- expected}")
  }

  test("substring spans on the corpus + splice fixture equal a driver-side brute-force replay") {
    val k = 5
    val base = tables.documents.selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq).toMap
    val fixture = base.collect {
      case (id, ws) if id % 31 == 1 && ws.size >= 30 =>
        (-id - 1) -> (ws.slice(0, 10) ++ ('a' to 'f').map(s => s"uq$id$s") ++ ws.slice(20, 30))
    }
    val docs = base ++ fixture
    val grams = docs.toSeq.flatMap { case (id, ws) =>
      (0 to ws.size - k).map(p => (id, p.toLong, ws.slice(p, p + k).mkString(" ")))
    }
    val counts = grams.groupBy(_._3).view.mapValues(_.size).toMap
    val expected = grams.filter(g => counts(g._3) >= 2).groupBy(_._1).flatMap { case (id, gs) =>
      val ps = gs.map(_._2).sorted
      // islands: break when the next window starts past prev coverage + 1
      val islands = ps.tail.foldLeft(List(List(ps.head))) {
        case (acc @ cur :: rest, p) => if (p > cur.head + k) List(p) :: acc else (p :: cur) :: rest
        case (Nil, p)               => List(List(p))
      }
      islands.map(isl => (id, isl.min, isl.max + k - 1, isl.max + k - isl.min))
    }.toSet
    val got = Dedup.substringSpans(tables).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected, s"missing=${expected -- got} extra=${got -- expected}")
    assert(got.nonEmpty)
    // the splice fixture must land in the output with TWO islands — the
    // break path proven on the gate's own corpus, not just crafted docs
    val fixtureSpans = got.filter(_._1 < 0).groupBy(_._1)
    assert(fixtureSpans.nonEmpty, "splice fixture produced no spans")
    assert(fixtureSpans.exists(_._2.size >= 2),
      "no fixture doc carries two islands — the break path is untested on the gate")
  }

  test("df profile equals a BigInt replay; cumulative mass is the exact cap-savings curve") {
    def trigrams(text: String): Set[String] = {
      val ws = text.split(" ", -1)
      // the shingledPostings rule: sub-3-word docs yield ONE shortened
      // shingle (concat_ws skips the null leads at the tail)
      if (ws.length < 3) Set(ws.mkString(" "))
      else (0 to ws.length - 3).map(p => ws.slice(p, p + 3).mkString(" ")).toSet
    }
    val dfByShingle = tables.documents.selectExpr("doc_id", "text").collect()
      .flatMap(r => trigrams(r.getString(1)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val hist = dfByShingle.valuesIterator.toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expected = hist.toSeq.sortBy(-_._1).foldLeft((BigInt(0), List.empty[(Long, Long, Long, Long)])) {
      case ((cum, acc), (df, n)) =>
        val mass = BigInt(n) * (BigInt(df) * (df - 1) / 2)
        (cum + mass, acc :+ ((df, n, mass.toLong, (cum + mass).toLong)))
    }._2
    val got = Dedup.dfProfile(tables).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toList
    assert(got == expected, s"got=$got\nexpected=$expected")
    // the profile's totals must account for every posting exactly
    val totalPostings = got.map { case (df, n, _, _) => df * n }.sum
    assert(totalPostings == dfByShingle.valuesIterator.sum, "posting mass lost in the histogram")
  }

  test("modality agreement covers every embeddable near-dup pair with replayed cosines") {
    val vecs = tables.embeddings.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val pairs = Dedup.ngramJaccard(tables).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // the full row replays: jaccard passthrough, the cosine VALUE
    // (sequential fold — bitwise vs vec_dot), and the tau flag
    val expected = pairs.collect {
      case (a, b, j) if vecs.contains(a) && vecs.contains(b) =>
        val c = cos(vecs(a), vecs(b))
        (a, b) -> ((j, c, c >= 0.3))
    }.toMap
    assert(expected.nonEmpty, "no embeddable near-dup pairs — spec is vacuous")
    val got = Dedup.modalityAgreement(tables).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getDouble(2), r.getDouble(3), r.getBoolean(4))))
      .toMap
    assert(got == expected,
      s"missing=${expected.keySet -- got.keySet} diff=${
        got.collect { case (k, v) if expected.get(k).exists(_ != v) => (k, v, expected(k)) }.take(3)}")
  }

  test("paraphrase candidates partition the embedding pairs against the text tau set") {
    val emb  = Dedup.embeddingCosine(tables).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val text = Dedup.ngramJaccard(tables).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val para = Dedup.paraphraseCandidates(tables).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2), r.getDouble(3)))
    assert(para.nonEmpty)
    // exactly the embedding pairs NOT in the text set — no leaks, no losses
    assert(para.map(_._1).toSet == emb -- text,
      s"para=${para.map(_._1).toSet} expected=${emb -- text}")
    // every survivor is below the text threshold by construction
    assert(para.forall(_._3 < Dedup.JaccardTau), "a tau-passing text pair leaked through")
    assert(para.forall(_._2 >= 0.4), "a sub-tauE cosine leaked through")
  }

  test("paraphrase LSH arm: subset of exact with identical scores; clustered-fixture recall") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getDouble(2), r.getDouble(3)))).toMap
    val exact = rows(Dedup.paraphraseCandidates(tables))
    val lsh   = rows(Dedup.paraphraseCandidatesLsh(tables))
    // cosine is verified exactly per candidate and the downstream
    // pipeline is shared, so LSH output ⊆ exact with equal scores
    assert((lsh.keySet -- exact.keySet).isEmpty, s"non-exact pairs: ${lsh.keySet -- exact.keySet}")
    lsh.foreach { case (k, v) => assert(exact(k) == v, s"scores diverge on $k: ${exact(k)} vs $v") }
    val corpusRecall =
      if (exact.isEmpty) 1.0 else (exact.keySet & lsh.keySet).size.toDouble / exact.size
    info(f"paraphrase LSH recall vs exact on the corpus: $corpusRecall%.2f (${exact.size} pairs)")
    // measured 0.68 on the near-random sf0.001 corpus (r12); floor at
    // 0.55 (ADVICE r12 asked for a bound close enough to the measured
    // value that a real recall regression — not band-count noise —
    // fails the spec instead of hiding under a 0.4 floor)
    assert(corpusRecall >= 0.55, f"corpus recall regressed: $corpusRecall%.2f (measured 0.68)")

    // IVF-cell arm: same subset/score contract as the LSH arm (shared
    // back half; candidates from the C51 within-cell pairs)
    val ivf = rows(Dedup.paraphraseCandidatesIvf(tables))
    assert((ivf.keySet -- exact.keySet).isEmpty, s"non-exact IVF pairs: ${ivf.keySet -- exact.keySet}")
    ivf.foreach { case (k, v) => assert(exact(k) == v, s"IVF scores diverge on $k: ${exact(k)} vs $v") }
    val ivfRecall =
      if (exact.isEmpty) 1.0 else (exact.keySet & ivf.keySet).size.toDouble / exact.size
    info(f"paraphrase IVF recall vs exact on the corpus: $ivfRecall%.2f (${exact.size} pairs)")
    // measured 0.33: a near-random corpus is the IVF worst case (close
    // pairs straddle cell boundaries as often as not — exactly the
    // cross-cell miss mass the C57 audit measures; the LSH arm is the
    // scale path for this regime, at 0.68 above)
    assert(ivfRecall >= 0.25, f"IVF corpus recall collapsed: $ivfRecall%.2f (measured 0.33)")

    // production-shaped fixture: 10 tight embedding clusters (real
    // paraphrase/translation pairs sit on top of each other) over
    // unique-vocabulary texts (zero shared shingles → every emb pair
    // is a paraphrase candidate). Here LSH recall must be near-total.
    import spark.implicits._
    val rng     = new scala.util.Random(7)
    val dim     = 64
    val centers = Array.fill(10)(Array.fill(dim)(rng.nextGaussian()))
    val embRows = (0 until 300).map { i =>
      (i.toLong, centers(i % 10).map(x => (x + 0.15 * rng.nextGaussian()).toFloat).toSeq, i % 10)
    }
    val docRows = (0 until 300).map { i =>
      val text = (0 until 12).map(j => s"w${i}x$j").mkString(" ")
      (i.toLong, text, "en", "synthetic", text.length.toLong)
    }
    val tmp = java.nio.file.Files.createTempDirectory("paraphrase_clustered")
    try {
      embRows.toDF("vec_id", "embedding", "label").write.mode("overwrite")
        .parquet(s"$tmp/embeddings.parquet")
      docRows.toDF("doc_id", "text", "lang", "source", "n_chars").write.mode("overwrite")
        .parquet(s"$tmp/documents.parquet")
      val tc      = graft.sources.Tables(spark, tmp.toString)
      val cEx     = rows(Dedup.paraphraseCandidates(tc))
      val cLsh    = rows(Dedup.paraphraseCandidatesLsh(tc))
      assert(cEx.nonEmpty, "clustered fixture produced no paraphrase pairs")
      assert((cLsh.keySet -- cEx.keySet).isEmpty)
      val cRecall = (cEx.keySet & cLsh.keySet).size.toDouble / cEx.size
      info(f"paraphrase LSH recall on the clustered fixture: $cRecall%.2f (${cEx.size} pairs)")
      assert(cRecall >= 0.9, f"clustered recall too low: $cRecall%.2f")
      // IVF-cell arm on the same fixture: tight clusters mostly land
      // whole in a cell, but 16 k-means cells over 10 true clusters
      // split some of them — measured 0.77, the exact trade Abbas et
      // al. document and the C57 audit turns into a sizing number
      // (the LSH arm above is the near-total-recall path at 1.00)
      val cIvf = rows(Dedup.paraphraseCandidatesIvf(tc))
      assert((cIvf.keySet -- cEx.keySet).isEmpty)
      val cIvfRecall = (cEx.keySet & cIvf.keySet).size.toDouble / cEx.size
      info(f"paraphrase IVF recall on the clustered fixture: $cIvfRecall%.2f (${cEx.size} pairs)")
      assert(cIvfRecall >= 0.7, f"clustered IVF recall too low: $cIvfRecall%.2f (measured 0.77)")
    } finally deleteTree(tmp)
  }

  test("despan fixed point: cleaned corpus round-trips the content store with zero cross-doc spans") {
    // the property a user of span removal actually relies on: after
    // cutting, no k-gram appears in two different documents — running
    // the substring dedup again finds nothing cross-doc to remove.
    // (Within-doc repeats in OWNER docs legitimately survive: the
    // lowest doc keeps its text intact by policy.)
    val k = 5
    val cleaned = Dedup
      .despanTextOn(tables.documents.select("doc_id", "text"), k)
      .selectExpr("concat('doc-', doc_id) AS result_key", "clean_text AS payload")
    val dirP = java.nio.file.Files.createTempDirectory("despan-store")
    try {
      val dir = dirP.toString
      cleaned.write.format("graft.sources.ContentStore").option("path", dir).mode("append").save()
      def byDoc(rows: Array[org.apache.spark.sql.Row]): Map[Long, String] = rows
        .map(r => r.getAs[String]("result_key").stripPrefix("doc-").toLong
          -> r.getAs[String]("payload")).toMap
      val back   = byDoc(spark.read.format("graft.sources.ContentStore").option("path", dir).load().collect())
      val direct = byDoc(cleaned.collect())
      assert(back == direct, "content-store round trip altered the cleaned corpus")
      // driver-side cross-doc gram census over the round-tripped corpus
      val docsPerGram = scala.collection.mutable.Map.empty[String, scala.collection.mutable.Set[Long]]
      back.foreach { case (id, text) =>
        val ws = text.split(" ", -1)
        if (ws.length >= k)
          (0 to ws.length - k).foreach { p =>
            docsPerGram.getOrElseUpdate(ws.slice(p, p + k).mkString(" "), scala.collection.mutable.Set.empty) += id
          }
      }
      val crossDoc = docsPerGram.filter(_._2.size >= 2)
      assert(crossDoc.isEmpty,
        s"cross-doc duplicated $k-grams survive despan: ${crossDoc.take(3).map { case (g, d) => (g, d.toSeq.sorted) }}")
    } finally deleteTree(dirP)
  }

  test("despan equals a driver-side replay; cuts stay inside reported spans; owners keep all") {
    val k = 5
    val docs = tables.documents.selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq).toMap
    val grams = docs.toSeq.flatMap { case (id, ws) =>
      (0 to ws.size - k).map(p => (id, p, ws.slice(p, p + k).mkString(" ")))
    }
    val byGram = grams.groupBy(_._3)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    // one pass over the gram list: per-doc foreign-cut positions
    val cutsByDoc: Map[Long, Set[Int]] = grams
      .collect {
        case (d, p, g) if byGram(g).size >= 2 && byGram(g).map(_._1).min != d =>
          d -> (p until p + k)
      }
      .groupBy(_._1).view.mapValues(_.flatMap(_._2).toSet).toMap
    val expected = docs.map { case (id, ws) =>
      val cutPos = cutsByDoc.getOrElse(id, Set.empty)
      val kept   = ws.zipWithIndex.collect { case (w, p) if !cutPos.contains(p) => w }
      id -> ((ws.size.toLong, cutPos.size.toLong, md5hex(kept.mkString(" "))))
    }
    val got = Dedup.despan(tables).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got == expected,
      s"mismatched docs: ${expected.collect { case (id, e) if got.get(id) != Some(e) => id }.take(5)}")
    // cross-op consistency: every cut position lies inside a reported
    // span of that doc (foreign dup coverage is a subset of ALL dup
    // coverage, which is exactly what substringSpans reports)
    val spans = Dedup.substringSpansOn(tables.documents.selectExpr("doc_id", "text")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(s => (s._2, s._3))).toMap
    expected.foreach { case (id, (n, nCut, _)) =>
      if (nCut > 0) {
        val ss = spans.getOrElse(id, Array.empty[(Long, Long)])
        assert(cutsByDoc(id).forall(p => ss.exists { case (s, e) => p >= s && p <= e }),
          s"doc $id cut outside its spans")
      }
      assert(nCut <= n)
    }
  }
}
