package graft

import graft.operators.{Curation, Dedup, Sampling, Temporal}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Semantics + plan-shape checks for the temporal joins and the
  * curation utilities added in round 3 (as-of join, interval join,
  * sampling, packing, decontamination).
  */
class TemporalSpec extends SparkSpecBase {

  private def executedPlanString(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p                        => p.toString
    }
  }

  // microsecond epoch — Timestamp.getTime alone is millis and would
  // break sub-millisecond tie ordering
  private def us(t: java.sql.Timestamp): Long = t.getTime * 1000 + (t.getNanos / 1000) % 1000

  test("as-of join picks the latest at-or-before click, per purchase") {
    val rows = Temporal.asofPriorClick(tables).collect()
    assert(rows.nonEmpty)
    // every carried click is at-or-before its purchase
    assert(rows.forall(r => r.getAs[Long]("gap_us") >= 0L))
    // cross-check one purchase against a direct computation
    val e = tables.events.select("event_id", "ts", "user_id", "event_type").collect()
    val sample = rows.take(20)
    sample.foreach { r =>
      val pUs  = us(r.getAs[java.sql.Timestamp]("ts"))
      val user = r.getAs[Long]("user_id")
      val best = e
        .filter(x => x.getAs[String]("event_type") == "click")
        .filter(x => x.getAs[Long]("user_id") == user)
        .filter(x => us(x.getAs[java.sql.Timestamp]("ts")) <= pUs)
        .maxBy(x => (us(x.getAs[java.sql.Timestamp]("ts")), x.getAs[Long]("event_id")))
      assert(r.getAs[Long]("click_event_id") == best.getAs[Long]("event_id"))
    }
  }

  test("as-of tie-breaks: equal timestamps resolve to the click, then the largest id") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def at(s: Int) = new java.sql.Timestamp(t0.getTime + s * 1000L)
    // user 1: two clicks at the SAME instant as the purchase → the
    //   at-or-before rule must include them, largest click id wins
    // user 2: click strictly after the purchase only → unmatched
    // user 3: ties between clicks before the purchase
    val events = Seq(
      (10L, at(5), 1L, "click"),
      (11L, at(5), 1L, "click"),
      (12L, at(5), 1L, "purchase"),
      (20L, at(9), 2L, "click"),
      (21L, at(8), 2L, "purchase"),
      (30L, at(1), 3L, "click"),
      (31L, at(1), 3L, "click"),
      (32L, at(2), 3L, "purchase")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val inner = Temporal
      .asofOn(events, keepUnmatched = false)
      .collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("click_event_id"))
      .toMap
    assert(inner == Map(12L -> 11L, 32L -> 31L), s"got $inner")
    val left = Temporal
      .asofOn(events, keepUnmatched = true)
      .collect()
      .map(r => r.getAs[Long]("event_id") -> Option(r.getAs[java.lang.Long]("click_event_id")))
      .toMap
    assert(left == Map(12L -> Some(11L), 21L -> None, 32L -> Some(31L)), s"got $left")
  }

  test("as-of join is one user shuffle — no nested-loop, no extra exchange") {
    val plan = executedPlanString(Temporal.asofPriorClick(tables))
    assert(!plan.contains("NestedLoop"), s"as-of degenerated to a nested loop:\n$plan")
    assert(!plan.contains("Join"), s"as-of should be join-free (union+window):\n$plan")
    // exactly one hash exchange (user_id) before the final sort
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, s"extra shuffles:\n$plan")
  }

  test("forward as-of picks the earliest at-or-after click; same join-free one-shuffle plan") {
    val rows = Temporal.asofNextClick(tables).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("gap_us") >= 0L))
    val e = tables.events.select("event_id", "ts", "user_id", "event_type").collect()
    rows.take(20).foreach { r =>
      val pUs  = us(r.getAs[java.sql.Timestamp]("ts"))
      val user = r.getAs[Long]("user_id")
      val best = e
        .filter(x => x.getAs[String]("event_type") == "click")
        .filter(x => x.getAs[Long]("user_id") == user)
        .filter(x => us(x.getAs[java.sql.Timestamp]("ts")) >= pUs)
        .minBy(x => (us(x.getAs[java.sql.Timestamp]("ts")), x.getAs[Long]("event_id")))
      assert(r.getAs[Long]("click_event_id") == best.getAs[Long]("event_id"))
    }
    val plan = executedPlanString(Temporal.asofNextClick(tables))
    assert(!plan.contains("Join"), s"forward as-of should be join-free (union+window):\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, s"extra shuffles:\n$plan")
  }

  test("hopping windows: every event lands in exactly 4 slide-aligned windows") {
    val win   = graft.operators.EventOps.hoppingWindow(tables).collect()
    val total = tables.events.count()
    assert(win.map(_.getAs[Long]("n_events")).sum == 4L * total)
    // spot-check one window against a naive recount
    val e = tables.events.select("ts", "event_type").collect()
    val sample = win.head
    val ws = us(sample.getAs[java.sql.Timestamp]("window_start"))
    val naive = e.count { x =>
      val t = us(x.getAs[java.sql.Timestamp]("ts"))
      t >= ws && t < ws + 3600L * 1000000L &&
        x.getAs[String]("event_type") == sample.getAs[String]("event_type")
    }
    assert(sample.getAs[Long]("n_events") == naive.toLong)
    // window starts are 15-minute aligned
    assert(win.forall(r => us(r.getAs[java.sql.Timestamp]("window_start")) % (900L * 1000000L) == 0L))
  }

  test("funnel counts ordered steps only, in one user shuffle") {
    val e = tables.events.select("event_id", "ts", "user_id", "event_type").collect()
    val byUser = e.groupBy(_.getAs[Long]("user_id"))
    def tOf(r: org.apache.spark.sql.Row) = us(r.getAs[java.sql.Timestamp]("ts"))
    val dayUs = 24L * 3600L * 1000000L
    var (nSignup, nClick, nPurchase) = (0L, 0L, 0L)
    byUser.values.foreach { rs =>
      val signups = rs.filter(_.getAs[String]("event_type") == "signup").map(tOf)
      if (signups.nonEmpty) {
        nSignup += 1
        val clicks = rs
          .filter(r => r.getAs[String]("event_type") == "click" &&
            tOf(r) >= signups.min && tOf(r) < signups.min + dayUs)
          .map(tOf)
        if (clicks.nonEmpty) {
          nClick += 1
          if (rs.exists(r => r.getAs[String]("event_type") == "purchase" &&
              tOf(r) >= clicks.min && tOf(r) < clicks.min + dayUs))
            nPurchase += 1
        }
      }
    }
    val row = graft.operators.Analytics.funnel(tables).collect().head
    assert(row.getAs[Long]("n_users") == byUser.size.toLong)
    assert(row.getAs[Long]("n_signup") == nSignup)
    assert(row.getAs[Long]("n_click_after_signup") == nClick)
    assert(row.getAs[Long]("n_purchase_after_click") == nPurchase)
    // funnel is monotone by construction; make sure the corpus exercises a strict drop
    assert(nSignup >= nClick && nClick >= nPurchase)
    assert(nPurchase < byUser.size, "no funnel attrition — spec is vacuous")
    // one user shuffle: chained windows + per-user rollup share the partitioning
    val plan = executedPlanString(graft.operators.Analytics.funnel(tables))
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, s"extra shuffles:\n$plan")
  }

  test("gap fill emits a dense hourly grid with explicit zeros from one events scan") {
    val rows = graft.operators.EventOps.gapFillHourly(tables).collect()
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    byType.values.foreach { rs =>
      val hours = rs.map(r => us(r.getAs[java.sql.Timestamp]("window_start"))).sorted
      // contiguous hourly grid between bounds
      hours.sliding(2).foreach {
        case Array(a, b) => assert(b - a == 3600L * 1000000L, "gap in the dense grid")
        case _           => ()
      }
      assert(rs.length.toLong == (hours.last - hours.head) / (3600L * 1000000L) + 1)
    }
    // the corpus must actually have empty hours or the op is vacuous
    assert(rows.exists(_.getAs[Long]("n_events") == 0L), "no zero rows — gap fill untested")
    // per-type count maps replace the join-back — a single scan of events
    val plan = executedPlanString(graft.operators.EventOps.gapFillHourly(tables))
    assert("Scan parquet .*events".r.findAllIn(plan).length == 1, s"events re-scanned:\n$plan")
    assert(!plan.contains("Join"), s"gap fill must be join-free:\n$plan")
  }

  test("interval join matches a naive per-row filter and never plans BNLJ") {
    val got = Temporal
      .signupActivity(tables)
      .collect()
      .map(r => (r.getAs[Long]("signup_id"), r.getAs[Long]("n_events")))
      .toMap
    val e = tables.events.select("event_id", "ts", "user_id", "event_type").collect()
    val hourUs = 3600L * 1000000L
    val naive = e
      .filter(_.getAs[String]("event_type") == "signup")
      .map { s =>
        val sUs = us(s.getAs[java.sql.Timestamp]("ts"))
        val n = e.count { x =>
          x.getAs[Long]("user_id") == s.getAs[Long]("user_id") && {
            val xUs = us(x.getAs[java.sql.Timestamp]("ts"))
            xUs >= sUs && xUs < sUs + hourUs
          }
        }
        s.getAs[Long]("event_id") -> n.toLong
      }
      .toMap
    assert(got == naive)
    val plan = executedPlanString(Temporal.signupActivity(tables))
    assert(!plan.contains("NestedLoop"), s"range join degenerated to BNLJ:\n$plan")
  }

  test("hash sample is a map-only plan and stratified sample is exact-size") {
    val plan = Sampling.hashSample(tables).queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).isEmpty, s"sample shuffled:\n$plan")
    val strat = Sampling.stratifiedSample(tables, perSource = 5)
    val sizes = strat.groupBy("source").count().collect().map(_.getAs[Long]("count"))
    assert(sizes.nonEmpty && sizes.forall(_ == 5L))
    // determinism: two runs draw the identical sample
    assert(
      Sampling.hashSample(tables).collect().toSeq ==
        Sampling.hashSample(tables).collect().toSeq
    )
  }

  test("training order is a uniform deterministic shuffle; epoch mixture upsamples by exact factors") {
    val order = Sampling.trainingOrder(tables).collect()
    assert(order.length == tables.documents.count().toInt)
    // per-shard positions are contiguous 1..n (an interleaving reader
    // never sees a gap), and the whole order is replay-identical
    order.groupBy(_.getAs[Long]("shard")).foreach { case (s, rows) =>
      val pos = rows.map(_.getAs[Long]("pos")).sorted.toSeq
      assert(pos == (1L to rows.length).toSeq, s"shard $s positions: $pos")
    }
    assert(order.toSeq == Sampling.trainingOrder(tables).collect().toSeq)
    // hash sharding must actually spread the corpus (no empty shard at
    // 500 docs / 16 shards except with astronomically bad luck)
    assert(order.map(_.getAs[Long]("shard")).distinct.length == 16)

    val epochs  = Sampling.mixtureEpochs(tables).collect()
    val factors = epochs.groupBy(_.getAs[String]("source")).map { case (s, rows) =>
      val perDoc = rows.groupBy(_.getAs[Long]("doc_id")).values.map(_.length).toSet
      assert(perDoc.size == 1, s"source $s docs repeat unevenly: $perDoc")
      s -> perDoc.head
    }
    // factors follow the exact integer ceil-division of char budgets
    val chars = tables.documents
      .groupBy("source")
      .agg(org.apache.spark.sql.functions.sum("n_chars").as("c"))
      .collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("c"))
      .toMap
    val biggest = chars.values.max
    factors.foreach { case (s, f) =>
      assert(f == math.min(4L, (biggest + chars(s) - 1) / chars(s)), s"factor of $s")
    }
    // the biggest source trains exactly once; some smaller source more
    assert(factors(chars.maxBy(_._2)._1) == 1)
    assert(factors.values.max > 1, "corpus is skewed enough that some source must repeat")
  }

  test("chunking covers every token with no chunk contained in its predecessor") {
    val chunks = graft.operators.Curation.chunkTokens(tables).collect()
    val nTokens = tables.documents
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.size(
          org.apache.spark.sql.functions.split(org.apache.spark.sql.functions.col("text"), " ")
        ).cast("long").as("n"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n"))
      .toMap
    chunks.groupBy(_.getAs[Long]("doc_id")).foreach { case (doc, cs) =>
      val sorted = cs.sortBy(_.getAs[Long]("chunk_start"))
      val ends   = sorted.map(c => c.getAs[Long]("chunk_start") + c.getAs[Long]("n_chunk_tokens"))
      // the final window reaches the doc's end → full coverage
      assert(ends.last == nTokens(doc), s"doc $doc: last end ${ends.last} != ${nTokens(doc)}")
      // strictly increasing ends → no chunk is contained in its
      // predecessor (no duplicate doc-tail fragments)
      ends.sliding(2).foreach {
        case Array(a, b) => assert(a < b, s"doc $doc: chunk contained in predecessor")
        case _           => ()
      }
    }
  }

  test("packing never splits a document and bins overflow by at most one doc tail") {
    val budget = 2048
    val bins   = Curation.packTokenBudget(tables, budget).collect()
    assert(bins.nonEmpty)
    val bySource = bins.groupBy(_.getAs[String]("source"))
    bySource.values.foreach { bs =>
      val sorted = bs.sortBy(_.getAs[Long]("bin_id"))
      // doc ranges of consecutive bins are contiguous and disjoint
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("last_doc") < b.getAs[Long]("first_doc"))
        case _ => ()
      }
      // every bin except possibly the last STARTS within budget of its
      // floor: bin_id equals floor(start_offset/budget) by construction,
      // so cumulative bin_tokens of preceding bins lands in the bin's span
      val cums = sorted.scanLeft(0L)(_ + _.getAs[Long]("bin_tokens")).init
      sorted.zip(cums).foreach { case (r, startOffset) =>
        assert(r.getAs[Long]("bin_id") == startOffset / budget)
      }
    }
  }

  test("pad audit equals a BigInt replay; doubling buckets never increases waste") {
    val lens = tables.documents.selectExpr("size(split(text, ' ')) AS n").collect()
      .map(_.getInt(0).toLong).sorted
    val n = BigInt(lens.length)
    def replay(nb: Long): (BigInt, BigInt) = {
      // bucket b covers sorted ranks (⌊n·b/nb⌋, ⌊n·(b+1)/nb⌋]
      val buckets = (0L until nb).map { b =>
        val lo = (n * b / nb).toInt
        val hi = (n * (b + 1) / nb).toInt
        lens.slice(lo, hi)
      }.filter(_.nonEmpty)
      val padded = buckets.map(bs => BigInt(bs.max) * bs.length).sum
      val real   = buckets.map(bs => bs.map(BigInt(_)).sum).sum
      (padded, real)
    }
    val got = Curation.padAudit(tables).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.keySet == Set(1L, 2L, 4L, 8L, 16L))
    got.foreach { case (nb, (padded, real, waste, ppm)) =>
      val (ep, er) = replay(nb)
      assert(BigInt(padded) == ep && BigInt(real) == er, s"B=$nb: ($padded,$real) vs ($ep,$er)")
      assert(waste == padded - real)
      assert(BigInt(ppm) == BigInt(waste) * 1000000 / BigInt(padded), s"B=$nb ppm")
    }
    // the ⌊n·b/B⌋ boundaries NEST when B doubles, so finer buckets
    // refine coarser ones — waste is non-increasing along the curve
    Seq(1L, 2L, 4L, 8L).foreach { nb =>
      assert(got(nb * 2)._3 <= got(nb)._3, s"waste grew doubling B=$nb")
    }
    // conservation: every doc padded exactly once
    got.values.foreach { case (_, real, _, _) => assert(BigInt(real) == lens.map(BigInt(_)).sum) }
  }

  test("z-order files bound BOTH dimensions (the skipping guarantee a 1-D sort can't give)") {
    val df    = graft.operators.Layout.zorderLayout(tables)
    val files = df.collect()
    assert(files.nonEmpty)
    // an 8-bit z-prefix fixes the high nibble of each 8-bit dimension,
    // so every logical file spans at most 16 values of ub AND of hb —
    // a filter on either column prunes ~15/16 of files
    files.foreach { f =>
      assert(f.getAs[Long]("max_ub") - f.getAs[Long]("min_ub") <= 15, s"ub span too wide: $f")
      assert(f.getAs[Long]("max_hb") - f.getAs[Long]("min_hb") <= 15, s"hb span too wide: $f")
    }
    // plan: pure projection + one shuffle on file_id (no global sort/window)
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p                        => p.toString
    }
    assert(!plan.contains("Window"), s"layout used a window:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, s"extra shuffles:\n$plan")
  }

  test("decontamination flags exactly the docs sharing a trigram with the benchmark") {
    val flagged = Dedup.contamination(tables).collect().map(_.getAs[Long]("doc_id")).toSet
    val docs = tables.documents.select("doc_id", "text").collect()
    def shingles(s: String): Set[String] =
      s.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val bench = docs
      .filter(_.getAs[Long]("doc_id") % 97 == 0)
      .flatMap(d => shingles(d.getAs[String]("text")))
      .toSet
    val expected = docs
      .filter(d => d.getAs[Long]("doc_id") % 97 != 0)
      .filter(d => shingles(d.getAs[String]("text")).exists(bench.contains))
      .map(_.getAs[Long]("doc_id"))
      .toSet
    assert(flagged == expected)
    // the benchmark shingle side must broadcast (corpus never shuffles into the join)
    val plan = executedPlanString(Dedup.contamination(tables))
    assert(plan.contains("BroadcastHashJoin"), s"benchmark set not broadcast:\n$plan")
  }

  test("class balance equalizes every lang to the min class size, unbiased-by-hash") {
    val rows = Sampling.classBalance(tables).collect()
    val perLang = rows.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    val counts = tables.documents.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val minCount = counts.values.min
    assert(perLang.keySet == counts.keySet, "a class disappeared")
    assert(perLang.values.forall(_ == minCount), s"classes unequal: $perLang (target $minCount)")
    // the smallest class is kept whole — balancing only ever removes
    val smallest = counts.minBy(_._2)._1
    assert(perLang(smallest) == counts(smallest))
  }

  test("label centroids: quantized sums recover the per-label mean within half an ulp of 1e-4") {
    val got = graft.operators.Similarity.labelCentroids(tables).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    val raw = tables.embeddings.collect().flatMap { r =>
      val label = r.getAs[Int]("label")
      r.getSeq[Float](r.fieldIndex("embedding")).zipWithIndex.map { case (v, i) =>
        (label, i.toLong) -> v.toDouble
      }
    }
    val byKey = raw.groupBy(_._1).view.mapValues(vs => (vs.map(_._2).sum, vs.length)).toMap
    assert(got.keySet == byKey.keySet)
    got.foreach { case (k, (sumQ, n)) =>
      val (exactSum, exactN) = byKey(k)
      assert(n == exactN)
      // each component quantizes within 5e-5, so the mean of the
      // quantized sum is within 5e-5 of the float mean
      val meanQ = sumQ.toDouble / 10000.0 / n
      assert(math.abs(meanQ - exactSum / exactN) <= 5.1e-5, s"$k: $meanQ vs ${exactSum / exactN}")
    }
  }

  test("nearest as-of: prior wins ties, side conventions hold, one user exchange") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def at(s: Int) = new java.sql.Timestamp(t0.getTime + s * 1000L)
    val events = Seq(
      // user 1: clicks AT the purchase instant → gap 0 both sides →
      //   prior side wins, and the prior convention takes the LARGEST id
      (100L, at(10), 1L, "click"),
      (101L, at(10), 1L, "click"),
      (200L, at(10), 1L, "purchase"),
      // user 2: equidistant clicks (±5s) → tie → prior
      (110L, at(5), 2L, "click"),
      (111L, at(15), 2L, "click"),
      (201L, at(10), 2L, "purchase"),
      // user 3: only future clicks, two at the same instant → next
      //   side takes the SMALLEST id
      (120L, at(20), 3L, "click"),
      (121L, at(20), 3L, "click"),
      (202L, at(10), 3L, "purchase"),
      // user 4: no clicks at all → dropped (inner)
      (203L, at(10), 4L, "purchase")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val got = Temporal.asofNearestOn(events).collect()
      .map(r => r.getAs[Long]("event_id") ->
        ((r.getAs[Long]("click_event_id"), r.getAs[String]("direction"), r.getAs[Long]("gap_us"))))
      .toMap
    assert(got == Map(
      200L -> ((101L, "prior", 0L)),
      201L -> ((110L, "prior", 5000000L)),
      202L -> ((120L, "next", 10000000L))
    ), s"got $got")
    // both carries must share ONE user_id exchange (two local sorts)
    val plan = executedPlanString(Temporal.asofNearestClick(tables))
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(plan).size == 1,
      s"expected one user exchange:\n$plan")
    assert(!plan.contains("NestedLoop"), s"nearest as-of degenerated:\n$plan")
  }

  test("capped sessions refine gap sessions: conserved events, bounded duration") {
    val capped = graft.operators.EventOps.cappedSessions(tables).collect()
    // every event lands in exactly one session
    assert(capped.map(_.getAs[Long]("n_events")).sum == tables.events.count())
    // no session spans more than the 2h cap (boundary events at exactly
    // start+2h open a NEW sub-session, so span is strictly < cap... plus
    // the end event itself can sit at start + cap - 1µs)
    capped.foreach { r =>
      val span = r.getAs[java.sql.Timestamp]("session_end").getTime -
        r.getAs[java.sql.Timestamp]("session_start").getTime
      assert(span < 120 * 60 * 1000L, s"session spans ${span}ms >= 2h cap")
    }
    // the cap only ever SPLITS gap sessions: session count >= gap-only count,
    // and total value is conserved against the gap-only operator
    val gap = graft.operators.EventOps.sessionWindows(tables).collect()
    assert(capped.length >= gap.length)
    val cappedValue = capped.map(r => BigDecimal(r.getAs[Double]("sum_value"))).sum
    val gapValue    = gap.map(r => BigDecimal(r.getAs[Double]("sum_value"))).sum
    assert((cappedValue - gapValue).abs < BigDecimal("0.0001"), s"$cappedValue vs $gapValue")
  }

  test("chargram profile ranks are contiguous, counts non-increasing, through TopKPerKeyExec") {
    val rows = graft.operators.TextOps.chargramLangProfile(tables).collect()
    val byLang = rows.groupBy(_.getString(0))
    assert(byLang.nonEmpty)
    byLang.foreach { case (lang, rs) =>
      val ranks = rs.map(_.getAs[Long]("rnk")).sorted
      assert(ranks.toSeq == (1L to ranks.length).toSeq, s"$lang ranks not contiguous")
      val counts = rs.sortBy(_.getAs[Long]("rnk")).map(_.getAs[Long]("cnt"))
      assert(counts.zip(counts.drop(1)).forall { case (a, b) => a >= b }, s"$lang not sorted")
    }
    val plan = executedPlanString(graft.operators.TextOps.chargramLangProfile(tables))
    assert(plan.contains("TopKPerKey"), s"top-k must use the bounded-heap operator:\n$plan")
    assert(!plan.contains("Window"), s"no per-group sort window expected:\n$plan")
  }

  test("next-word model: local bigram replay agrees; head totals join back, top-k through TopKPerKeyExec") {
    val rows = graft.operators.TextOps.nextWordModel(tables).collect()
    // local replay: adjacent pairs per doc, successor-slot head counts
    val docs = tables.documents.select("text").collect().map(_.getString(0))
    val pairCounts = docs
      .flatMap { t => val ws = t.split(" ", -1); ws.dropRight(1).zip(ws.drop(1)) }
      .groupBy(identity).map { case (p, a) => (p, a.length.toLong) }
    val headCounts = pairCounts.groupBy(_._1._1).map { case (h, m) => (h, m.values.sum) }
    val expected = pairCounts.toSeq
      .groupBy(_._1._1)
      .filter { case (h, _) => headCounts(h) >= 20L }
      .flatMap { case (h, ps) =>
        ps.sortBy { case ((_, w2), c) => (-c, w2) }.take(3).zipWithIndex.map {
          case (((_, w2), c), i) => (h, (i + 1).toLong, w2, c, headCounts(h))
        }
      }
      .toSet
    val got = rows.map(r =>
      (r.getString(0), r.getAs[Long]("rnk"), r.getString(2),
        r.getAs[Long]("n_pair"), r.getAs[Long]("n_head"))).toSet
    assert(got == expected, s"got ${got.size} rows vs expected ${expected.size}")
    val plan = executedPlanString(graft.operators.TextOps.nextWordModel(tables))
    assert(plan.contains("TopKPerKey"), s"top-k must use the bounded-heap operator:\n$plan")
    assert(!plan.contains("Window"), s"no per-group sort window expected:\n$plan")
    assert(plan.contains("ShuffledHashJoin"), s"head totals must join back shuffle-hash:\n$plan")
  }

  test("watermark skew matches a local replay of the interleave, bounded by the hour") {
    val rows = graft.operators.EventOps.watermarkSkew(tables).collect()
    assert(rows.nonEmpty)
    val byType = tables.events.select("event_type", "event_id", "ts").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getTimestamp(2)))
      .groupBy(_._1)
    rows.foreach { r =>
      val (et, n, nOoo, maxLate, nBeyond) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      val evs = byType(et).sortBy { case (_, id, ts) =>
        val hourMs = ts.getTime - java.util.concurrent.TimeUnit.MILLISECONDS
          .toMillis(ts.getTime % 3600000L)
        (hourMs, id % 7, id)
      }
      assert(n == evs.length.toLong)
      var wm = Long.MinValue
      var ooo = 0L; var beyond = 0L; var worst = 0L
      evs.foreach { case (_, _, ts) =>
        val us = ts.getTime * 1000L + (ts.getNanos % 1000000) / 1000
        if (wm > us) {
          ooo += 1
          val late = wm - us
          worst = math.max(worst, late)
          if (late > 600000000L) beyond += 1
        }
        wm = math.max(wm, us)
      }
      assert(nOoo == ooo, s"$et out-of-order $nOoo vs $ooo")
      assert(maxLate == worst, s"$et max lateness $maxLate vs $worst")
      assert(nBeyond == beyond, s"$et beyond-watermark $nBeyond vs $beyond")
      // the interleave scrambles WITHIN hours, so disorder is bounded
      assert(maxLate < 3600000000L, s"$et lateness exceeds the hour bound")
      assert(nOoo > 0, s"$et: vacuous — interleave produced no disorder")
    }
  }

  test("top supplier equals the brute-force argmax over per-supplier revenue") {
    val perSupp = tables.lineitem
      .groupBy("l_suppkey")
      .agg(graft.operators.Num
        .moneySum4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    val best     = perSupp.map(_._2).max
    val expected = perSupp.filter(_._2 == best).map(_._1).toSet
    val got      = graft.operators.Analytics.topSupplier(tables).collect()
    assert(got.map(_.getAs[Long]("s_suppkey")).toSet == expected)
    assert(got.forall(_.getAs[Double]("revenue") == best))
  }

  test("audience overlap equals brute-force set intersections, one reused exchange") {
    val byUser = tables.events
      .select(col("user_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .distinct
    val byType = byUser.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val types  = byType.keys.toSeq.sorted
    val expected = (for {
      i <- types.indices
      j <- i + 1 until types.length
      n = (byType(types(i)) & byType(types(j))).size if n > 0
    } yield (types(i), types(j)) -> n.toLong).toMap
    val df  = graft.operators.EventOps.audienceOverlap(tables)
    val got = df.collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == expected, s"${got.size} pairs vs ${expected.size}")
    assert(got.nonEmpty)
    // both legs of the self-join come from ONE distinct (user, type) exchange
    assert(executedPlanString(df).contains("ReusedExchange"), "postings exchange not reused")
  }

  test("scd2 intervals are contiguous, change at every boundary, and cover every event") {
    def us(t: java.sql.Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000
    val ivs = graft.operators.EventOps.scd2History(tables)
      .collect()
      .map(r =>
        (r.getLong(0), r.getString(1), us(r.getTimestamp(2)),
          if (r.isNullAt(3)) Long.MaxValue else r.getLong(3)))
      .groupBy(_._1)
    val evts = tables.events
      .select(col("user_id"), col("ts"), col("event_type"), col("event_id"))
      .collect()
      .map(r => (r.getLong(0), us(r.getTimestamp(1)), r.getString(2), r.getLong(3)))
    assert(ivs.nonEmpty)
    for ((_, rows) <- ivs) {
      val sorted = rows.sortBy(_._3)
      // contiguous: each interval closes exactly where the next opens; last open
      for (Array(a, b) <- sorted.sliding(2).map(_.toArray)) {
        assert(a._4 == b._3, "gap or overlap between consecutive intervals")
        assert(a._2 != b._2, "consecutive intervals with unchanged attribute")
      }
      assert(sorted.last._4 == Long.MaxValue, "newest interval must be open")
    }
    // point-in-time correctness: each event's type equals its covering interval's attr
    for ((u, ts, tpe, _) <- evts) {
      val cover = ivs(u).filter(iv => iv._3 <= ts && ts < iv._4)
      assert(cover.length == 1, s"event at $ts covered by ${cover.length} intervals")
      assert(cover.head._2 == tpe)
    }
    // first interval opens at the user's first event
    val firstEvt = evts.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    for ((u, rows) <- ivs) assert(rows.map(_._3).min == firstEvt(u))
  }

  test("graph reach equals brute-force BFS per hop over the trading graph") {
    val pairs = tables.lineitem
      .join(tables.orders, col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = (pairs ++ pairs.map { case (a, b) => (b, a) })
      .groupBy(_._1)
      .view
      .mapValues(_.map(_._2).toSet)
      .toMap
    val seeds = tables.supplier
      .filter(col("s_suppkey") % 7 === 0)
      .collect()
      .map(r => r.getLong(0) * 2 + 1)
      .toSet
    var dist     = seeds.map(_ -> 0).toMap
    var frontier = seeds
    for (h <- 1 to 3) {
      frontier = frontier.flatMap(n => adj.getOrElse(n, Set.empty)).diff(dist.keySet)
      dist ++= frontier.map(_ -> h)
    }
    val expected = dist.groupBy(_._2).view.mapValues { m =>
      (m.keys.count(_ % 2 == 0).toLong, m.keys.count(_ % 2 == 1).toLong)
    }.toMap
    val got = graft.operators.Graph.graphReach(tables)
      .collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got == expected, s"hops $got vs $expected")
    assert(got.contains(0) && got.size > 1, "BFS never left the seed set")
  }

  test("pareto frontier: exactly the non-dominated (size, price) points, counts and witnesses exact") {
    val parts = tables.part
      .select(col("p_partkey"), col("p_size"), col("p_retailprice"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    def dominated(s: Int, p: Double): Boolean =
      parts.exists { case (_, s2, p2) => s2 >= s && p2 <= p && (s2 > s || p2 < p) }
    val got = graft.operators.Analytics.paretoParts(tables)
      .collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    for ((s, p, n, w) <- got) {
      assert(!dominated(s, p), s"frontier point ($s, $p) is dominated")
      val at = parts.filter { case (_, s2, p2) => s2 == s && p2 == p }
      assert(n == at.length.toLong && w == at.map(_._1).min)
    }
    val nonDominated = parts.collect { case (_, s, p) if !dominated(s, p) => (s, p) }.toSet
    assert(got.map(t => (t._1, t._2)).toSet == nonDominated, "frontier incomplete")
  }

  test("session paths equal a local replay of gap-split ordered journeys") {
    def us(t: java.sql.Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000
    val gapUs = 30L * 60 * 1000000
    val evts = tables.events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), us(r.getTimestamp(1)), r.getLong(2), r.getString(3)))
    val paths = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    for ((_, grp) <- evts.groupBy(_._1)) {
      val sorted   = grp.sortBy(e => (e._2, e._3))
      val sessions = scala.collection.mutable.ArrayBuffer(scala.collection.mutable.ArrayBuffer(sorted.head))
      for (Array(prev, cur) <- sorted.sliding(2).map(_.toArray)) {
        if (cur._2 - prev._2 >= gapUs) sessions += scala.collection.mutable.ArrayBuffer(cur)
        else sessions.last += cur
      }
      for (s <- sessions) paths(s.take(5).map(_._4).mkString(">")) += 1L
    }
    val got = graft.operators.EventOps.sessionPaths(tables)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    assert(got == paths.toMap, s"${got.size} paths vs ${paths.size} expected")
    assert(got.nonEmpty && got.keysIterator.exists(_.contains(">")))
  }

  test("sketch rolling actives: same day grid as exact, each estimate within HLL error") {
    val exact = graft.operators.EventOps.rollingActives(tables)
      .collect().map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    val est = graft.operators.EventOps.rollingActivesSketch(tables)
      .collect().map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet, "report-day grids differ")
    for ((d, e) <- est) {
      val x = exact(d)
      // lgConfigK=12 → ~1.6% RSE; small counts run in HLL sparse mode
      // (near-exact). 5% + small absolute floor is a stable bound.
      assert(math.abs(e - x) <= math.max(3L, x * 5 / 100), s"$d: est $e vs exact $x")
    }
  }

  test("peak concurrency equals a brute-force global sweep per day") {
    import org.apache.spark.sql.functions.col
    val gapUs = 30L * 60 * 1000000
    val evts = tables.events.select(col("user_id"), col("ts")).collect()
      .map { r =>
        val t = r.getTimestamp(1)
        (r.getLong(0), Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000)
      }
    // sessions: per-user gap split, half-open [start, last + gap)
    val sessions = evts.groupBy(_._1).values.flatMap { grp =>
      val ts  = grp.map(_._2).sorted
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var start = ts.head
      for (i <- 1 until ts.length) {
        if (ts(i) - ts(i - 1) >= gapUs) { out += ((start, ts(i - 1) + gapUs)); start = ts(i) }
      }
      out += ((start, ts.last + gapUs))
      out
    }.toSeq
    // global sweep: -1 strictly before +1 at equal instants (half-open)
    val deltas   = sessions.flatMap { case (s, e) => Seq((s, 1), (e, -1)) }.sorted
    val usPerDay = 86400L * 1000000
    val dayPeaks = scala.collection.mutable.Map.empty[Long, Long]
    var cur      = 0L
    var lastDay  = Math.floorDiv(deltas.head._1, usPerDay)
    for ((ts, d) <- deltas) {
      val day = Math.floorDiv(ts, usPerDay)
      // the level is flat between deltas: every day crossed (including
      // this one, before its first delta) peaks at least at `cur`
      for (dd <- (lastDay + 1) to day) dayPeaks(dd) = math.max(dayPeaks.getOrElse(dd, 0L), cur)
      lastDay = day
      cur += d
      dayPeaks(day) = math.max(dayPeaks.getOrElse(day, 0L), cur)
    }
    val expected = dayPeaks.toSeq
      .filter(_._2 > 0)
      .map { case (day, pk) => java.time.LocalDate.ofEpochDay(day).toString -> pk }
      .toMap
    val got = graft.operators.EventOps.peakConcurrency(tables).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected, s"got ${got.size} days vs expected ${expected.size}")
    assert(got.nonEmpty && got.valuesIterator.forall(_ >= 1))
  }

  test("event dedup keeps exactly the openers of 90s gap chains per (user, type)") {
    val events = tables.events
      .select("user_id", "event_id", "ts", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime * 1000L, r.getString(3)))
    // local replay: within each (user, type) stream ordered by (ts,
    // id), a row survives iff it opens a burst — no predecessor within
    // the 90 s tolerance
    val expected = events
      .groupBy(e => (e._1, e._4))
      .valuesIterator
      .flatMap { run =>
        val sorted = run.sortBy(e => (e._3, e._2))
        sorted.zipWithIndex.collect {
          case (e, 0)                                      => e._2
          case (e, i) if e._3 - sorted(i - 1)._3 >= 90000000L => e._2
        }
      }
      .toSet
    val got = graft.operators.EventOps.eventDedup(tables).collect().map(_.getLong(1)).toSet
    assert(got == expected, s"got ${got.size} openers vs expected ${expected.size}")
    // the corpus may contain no sub-90s bursts at this SF, so the
    // "followers actually drop" guarantee runs on a synthetic burst
    // fixture: user 1 fires a 3-event click burst (0s, 30s, 80s apart
    // → one chain, opener id 10), then a 95s-later click reopens
    // (id 13); user 2's view at +30s is a different (user, type) run
    import spark.implicits._
    val tmp  = java.nio.file.Files.createTempDirectory("dedup_fixture").toString
    val t0   = 1700000000000000L
    Seq(
      (10L, t0, 1L, "click", 1.0, "{}"),
      (11L, t0 + 30000000L, 1L, "click", 1.0, "{}"),
      (12L, t0 + 80000000L, 1L, "click", 1.0, "{}"),
      (13L, t0 + 80000000L + 95000000L, 1L, "click", 1.0, "{}"),
      (20L, t0 + 30000000L, 2L, "view", 1.0, "{}")
    ).toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val burst = graft.operators.EventOps
      .eventDedup(graft.sources.Tables(spark, tmp))
      .collect().map(_.getLong(1)).toSet
    assert(burst == Set(10L, 13L, 20L), s"burst fixture openers: $burst")
    // scale shape: ONE events exchange — the (user, type) grouping
    // rides the user_id partitioning via in-partition sort
    val plan = executedPlanString(graft.operators.EventOps.eventDedup(tables))
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1, s"extra shuffles:\n$plan")
  }
}
