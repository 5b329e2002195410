package graft

import graft.operators.{Analytics, Num, Temporal}
import org.apache.spark.sql.functions._

/** Operator-level checks for the analytics family that the SQL gate
  * can't express: approximate twins pinned against their exact
  * hash-gated counterparts, and compositions checked for internal
  * consistency.
  */
class AnalyticsSpec extends SparkSpecBase {

  test("approx percentiles land inside the exact neighboring-quantile bracket") {
    val exact = Analytics.valuePercentiles(tables).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    // widest brackets from the exact operator's own outputs: p50 must
    // fall in [p25, p75], p90 in [p75, p99], p99 in [p90, max]
    val brackets = tables.events
      .groupBy("event_type")
      .agg(
        expr("percentile(value, 0.25)").as("p25"),
        expr("percentile(value, 0.75)").as("p75"),
        max("value").as("vmax")
      )
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val approx = Analytics.valuePercentilesApprox(tables).collect()
    assert(approx.nonEmpty)
    approx.foreach { r =>
      val et            = r.getString(0)
      val (a50, a90, a99) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      val (e50, e90, e99) = exact(et)
      val (p25, p75, vmax) = brackets(et)
      assert(a50 >= p25 && a50 <= p75, s"$et p50 approx $a50 outside [$p25,$p75] (exact $e50)")
      assert(a90 >= p75 && a90 <= e99, s"$et p90 approx $a90 outside [$p75,$e99] (exact $e90)")
      assert(a99 >= e90 && a99 <= vmax, s"$et p99 approx $a99 outside [$e90,$vmax] (exact $e99)")
    }
  }

  test("attribution totals equal the asof pair view aggregated by hand") {
    // the attribution rollup must conserve money: summing the hash-
    // gated asof pair output joined back to purchase values gives the
    // same per-hour totals the one-pass operator reports
    val pairs = Temporal.asofPriorClick(tables)
      .select(col("event_id"), date_trunc("hour", col("click_ts")).as("click_hour"))
    val byHand = pairs
      .join(
        tables.events.filter(col("event_type") === "purchase").select("event_id", "value"),
        "event_id"
      )
      .groupBy("click_hour")
      .agg(
        count(lit(1)).as("n_purchases"),
        graft.operators.Num.moneySum(col("value")).as("attributed_value")
      )
      .collect()
      .map(r => r.getTimestamp(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val op = Analytics.attribution(tables).collect()
      .map(r => r.getTimestamp(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(op == byHand, s"attribution diverged from the pair view: ${op.size} vs ${byHand.size} hours")
  }

  test("order-count histogram conserves both customers and orders") {
    val rows = Analytics.customerOrderDist(tables).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val nCustomers = rows.map(_._2).sum
    val nOrders    = rows.map { case (k, v) => k * v }.sum
    assert(nCustomers == tables.customer.count(), "histogram must cover every customer once")
    assert(nOrders == tables.orders.count(), "sum(n_orders * n_customers) must equal |orders|")
    assert(rows.exists(_._1 == 0L) || nCustomers == rows.filter(_._1 > 0).map(_._2).sum)
  }

  test("ship-priority matrix partitions the joined lineitem count exactly") {
    val rows  = Analytics.shipPriorityMatrix(tables).collect()
    val total = rows.map(r => r.getLong(1) + r.getLong(2)).sum
    // inner join on a foreign key that always resolves: every lineitem counted once
    assert(total == tables.lineitem.count(), s"critical+routine must cover all lineitems ($total)")
  }

  test("large orders are exactly the aggregate rows above the threshold") {
    val got = Analytics.largeOrders(tables).collect()
    assert(got.nonEmpty && got.forall(_.getAs[Double]("total_qty") > 200.0))
    val expected = tables.lineitem.groupBy("l_orderkey")
      .agg(Num.moneySum(col("l_quantity")).as("q"))
      .filter(col("q") > 200.0).count()
    assert(got.length == expected, "join-back must neither drop nor duplicate qualifying orders")
  }

  test("promo revenue is bounded by and sums to the unconditional revenue") {
    val rows = Analytics.promoRevenueByMonth(tables).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (promo, total) = (r.getAs[Double]("promo_revenue"), r.getAs[Double]("total_revenue"))
      assert(promo >= 0.0 && promo <= total, s"promo $promo outside [0, $total]")
    }
    val overall = tables.lineitem.agg(
      Num.moneySum4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev")
    ).head().getDouble(0)
    val summed = BigDecimal(rows.map(r => BigDecimal(r.getAs[Double]("total_revenue"))).sum.toDouble)
    // month partition must conserve total revenue (decimal-exact sums)
    assert((summed - BigDecimal(overall)).abs < BigDecimal("0.0001"), s"$summed vs $overall")
  }

  test("bracket revenue equals the sum of its three disjoint brackets") {
    val combined = Analytics.bracketRevenue(tables).collect()(0)
    def one(ptype: String, qlo: Int, qhi: Int, shi: Int): (BigDecimal, Long) = {
      val r = tables.lineitem
        .join(tables.part.select("p_partkey", "p_type", "p_size"),
          col("l_partkey") === col("p_partkey"))
        .filter(col("p_type") === ptype && col("l_quantity").between(qlo, qhi) &&
          col("p_size").between(1, shi))
        .agg(
          Num.moneySum4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"),
          count(lit(1)).as("n"))
        .collect()(0)
      (BigDecimal(r.getDouble(0)), r.getLong(1))
    }
    val parts = Seq(one("PROMO", 1, 11, 15), one("SMALL", 10, 20, 25), one("LARGE", 20, 30, 35))
    // p_type values are mutually exclusive, so the disjunction must
    // partition: revenue and count both add up exactly
    assert(combined.getLong(1) == parts.map(_._2).sum)
    assert((BigDecimal(combined.getDouble(0)) - parts.map(_._1).sum).abs < BigDecimal("0.0001"))
  }

  test("rich-idle customers match the brute-force segment-average + anti-join filter") {
    val custs = tables.customer.select("c_custkey", "c_mktsegment", "c_acctbal").collect()
      .map(r => (r.getLong(0), r.getString(1), BigDecimal(r.getDouble(2)).setScale(2)))
    val urgent = tables.orders.filter(col("o_orderpriority") === "1-URGENT")
      .select("o_custkey").collect().map(_.getLong(0)).toSet
    val bySeg = custs.groupBy(_._2)
    val expected = bySeg.toSeq.flatMap { case (seg, cs) =>
      val total = cs.map(_._3).sum
      val n     = cs.length
      cs.filter(c => c._3 * n > total && !urgent.contains(c._1)).map(c => (seg, c._1, c._3))
    }
    val expBySeg = expected.groupBy(_._1).view
      .mapValues(v => (v.size.toLong, v.map(_._3).sum)).toMap
    val got = Analytics.richIdleCustomers(tables).collect()
      .map(r => r.getString(0) -> (r.getLong(1), BigDecimal(r.getDouble(2)).setScale(2))).toMap
    assert(got == expBySeg, s"$got vs $expBySeg")
  }

  test("profit matrix partitions the product family's lineitems exactly") {
    val rows = Analytics.profitMatrix(tables).collect()
    assert(rows.nonEmpty)
    val expected = tables.lineitem
      .join(
        broadcast(tables.part.filter(col("p_name").like("%gear%")).select("p_partkey")),
        col("l_partkey") === col("p_partkey")
      )
      .count()
    // every matching lineitem lands in exactly one (nation, year) cell
    assert(rows.map(_.getLong(3)).sum == expected)
    // and the cells conserve money: their sum equals the unpartitioned
    // decimal revenue of the same fact slice
    val cellTotal = rows.map(r => BigDecimal(r.getDouble(2))).sum
    val grandTotal = BigDecimal(
      tables.lineitem
        .join(
          broadcast(tables.part.filter(col("p_name").like("%gear%")).select("p_partkey")),
          col("l_partkey") === col("p_partkey")
        )
        .agg(Num.moneySum4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
        .collect()(0).getDouble(0)
    )
    assert((cellTotal - grandTotal).abs < BigDecimal("0.01"), s"$cellTotal vs $grandTotal")
  }

  test("important parts are exactly the per-part values above 1.1x the mean") {
    val perPart = tables.lineitem
      .join(
        broadcast(
          tables.supplier
            .join(tables.nation, col("s_nationkey") === col("n_nationkey"))
            .filter(col("n_name") === "NATION_12")
            .select("s_suppkey")
        ),
        col("l_suppkey") === col("s_suppkey")
      )
      .groupBy("l_partkey")
      .agg(Num.moneySum(col("l_extendedprice")).as("part_value"))
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    assert(perPart.nonEmpty, "fixture must have NATION_12 supplier lines at sf0.001")
    val threshold = perPart.map { case (_, v) => BigDecimal(v) }.sum / perPart.length * 1.1
    // brute-force filter against the collected per-part values; the
    // BigDecimal threshold differs from the operator's double one by
    // <1 ulp, and no fixture value sits that close to the boundary
    val expected = perPart.filter { case (_, v) => BigDecimal(v) > threshold }.toMap
    val got = Analytics.importantParts(tables).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == expected, s"${got.size} vs ${expected.size} above $threshold")
    assert(got.nonEmpty, "threshold filtered everything — fixture too small")
  }

  test("small-quantity revenue matches the brute-force per-part 20% bracket") {
    val lines = tables.lineitem.select("l_partkey", "l_quantity", "l_extendedprice").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val brandOf = tables.part.select("p_partkey", "p_brand").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val avgQty = lines.groupBy(_._1).view.mapValues { ls =>
      (ls.map(l => BigDecimal(l._2).setScale(2)).sum / ls.length).toDouble
    }.toMap
    val expected = lines
      .filter { case (pk, q, _) => q < 0.2 * avgQty(pk) }
      .groupBy { case (pk, _, _) => brandOf(pk) }
      .view
      .mapValues(ls => (ls.map(l => BigDecimal(l._3).setScale(2)).sum, ls.length.toLong))
      .toMap
    val got = Analytics.smallQtyRevenue(tables).collect()
      .map(r => r.getString(0) -> (BigDecimal(r.getDouble(1)).setScale(2), r.getLong(2))).toMap
    assert(got == expected, s"$got vs $expected")
    assert(got.nonEmpty)
  }

  test("waiting suppliers match the brute-force exists/not-exists scan") {
    val lines = tables.lineitem.select("l_orderkey", "l_suppkey", "l_returnflag").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val finalized = tables.orders.filter(col("o_orderstatus") === "F")
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    val suppName = tables.supplier.select("s_suppkey", "s_name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = lines.groupBy(_._1).toSeq
      .filter { case (ok, _) => finalized.contains(ok) }
      .flatMap { case (_, ls) =>
        val supps    = ls.map(_._2).distinct
        val returned = ls.filter(_._3 == "R").map(_._2).distinct
        if (supps.length > 1 && returned.length == 1) Some(returned.head) else None
      }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
      .map { case (sk, n) => suppName(sk) -> n }
    val got = Analytics.waitingSuppliers(tables).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got == expected, s"$got vs $expected")
    assert(got.nonEmpty)
  }

  test("merge upsert: actions partition the merged keyspace by the modular rule") {
    val ids = tables.events.select("event_id").collect().map(_.getLong(0))
    val expInsert = ids.count(id => id % 3 == 0 && id % 5 == 0).toLong // delta-only keys
    val expUpdate = ids.count(id => id % 3 == 0 && id % 5 != 0).toLong // overlap keys
    val expKeep   = ids.count(id => id % 3 != 0 && id % 5 != 0).toLong // base-only keys
    val rows = graft.operators.Ingest.mergeUpsert(tables).collect()
    assert(rows.map(_.getLong(3)).sum == expInsert, "insert arm")
    assert(rows.map(_.getLong(4)).sum == expUpdate, "update arm")
    assert(rows.map(_.getLong(5)).sum == expKeep, "keep arm")
    assert(rows.map(_.getLong(1)).sum == expInsert + expUpdate + expKeep)
    assert(expInsert > 0 && expUpdate > 0 && expKeep > 0, "fixture must exercise all three arms")
  }

  test("integrity audit: clean FKs audit to zero, domain rule counts match a recount") {
    val rows = graft.operators.Ingest.integrityAudit(tables).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.size == 8)
    Seq("lineitem_orphan_order", "lineitem_orphan_part", "orders_orphan_customer").foreach { c =>
      assert(rows(c) == 0L, s"$c should be clean in the fixture, got ${rows(c)}")
    }
    val highQty = tables.lineitem.filter(col("l_quantity") > 45.0).count()
    assert(rows("lineitem_high_quantity") == highQty)
    assert(highQty > 0, "domain rule must be non-vacuous")
  }

  test("unpivot emits one row per (flag, metric) carrying the wide aggregate's value") {
    val long = Analytics.unpivotMetrics(tables).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val wide = tables.lineitem.groupBy("l_returnflag")
      .agg(Num.moneySum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
      .collect()
    assert(long.size == wide.length * 3)
    wide.foreach { r =>
      val flag = r.getString(0)
      assert(long((flag, "sum_qty")) == r.getDouble(1), s"$flag sum_qty")
      assert(long((flag, "n_lines")) == r.getLong(2).toDouble, s"$flag n_lines")
    }
  }

  test("incremental agg state-merge equals the direct aggregate for any disjoint slicing") {
    val direct = tables.events.groupBy("event_type")
      .agg(count(lit(1)).as("n"), Num.moneySum(col("value")).as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val merged = Analytics.incrementalAgg(tables).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(merged == direct, "state merge must be lossless")
  }

  test("winsorized sums are bounded by raw sums and clip counts match a recount") {
    val rows = Analytics.winsorized(tables).collect()
    assert(rows.nonEmpty)
    val byType = tables.events.select("event_type", "value", "event_id").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .groupBy(_._1)
    rows.foreach { r =>
      val (et, n, raw, win, clipped) =
        (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))
      val vals = byType(et).map(_._2).sorted
      assert(n == vals.length.toLong)
      val lo = vals(math.ceil(vals.length * 0.01).toInt - 1)
      val hi = vals(math.ceil(vals.length * 0.99).toInt - 1)
      val expClipped = vals.count(v => v < lo || v > hi).toLong
      assert(clipped == expClipped, s"$et clip count $clipped vs $expClipped")
      assert(clipped > 0, s"$et: vacuous — no rows clipped")
      // clipping pulls the tails toward the band; with a symmetric-ish
      // fixture the invariant that MUST hold is per-row boundedness
      val expWin = BigDecimal(vals.map(v => BigDecimal(math.min(math.max(v, lo), hi)).setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble)
      assert((BigDecimal(win) - expWin).abs < BigDecimal("0.01"), s"$et $win vs $expWin")
      assert(raw != win, s"$et: clipping changed nothing — vacuous")
    }
  }

  test("min-cost supplier is the brute-force per-part argmin over region offers") {
    val rows = Analytics.minCostSupplier(tables).collect()
    assert(rows.nonEmpty)
    // brute-force: collect the region-constrained offers and argmin locally
    val regionSupp = tables.supplier
      .join(tables.nation, col("s_nationkey") === col("n_nationkey"))
      .join(tables.region.filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select("s_suppkey").collect().map(_.getLong(0)).toSet
    val offers = tables.lineitem
      .join(tables.part.filter(col("p_size").isin(15, 25, 35)),
        col("l_partkey") === col("p_partkey"))
      .filter(col("l_suppkey").isInCollection(regionSupp))
      .groupBy("p_partkey", "l_suppkey")
      .agg(min(col("l_extendedprice").cast("decimal(18,2)")).as("offer"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDecimal(2)))
    val best = offers.groupBy(_._1).map { case (pk, os) =>
      pk -> os.minBy(o => (o._3, o._2))
    }
    assert(rows.length == best.size, "one row per part with any region offer")
    rows.foreach { r =>
      val (pk, offer) = (r.getLong(0), r.getDouble(5))
      val (_, _, expOffer) = best(pk)
      assert(offer == expOffer.doubleValue, s"part $pk offer $offer vs $expOffer")
    }
  }

  test("supplier variety excludes complaint suppliers and the brand, counts recount") {
    val rows = Analytics.supplierVariety(tables).collect()
    assert(rows.nonEmpty)
    val local = tables.lineitem
      .join(tables.part, col("l_partkey") === col("p_partkey"))
      .filter(col("p_brand") =!= "Brand#7" && col("l_suppkey") % 7 =!= 0)
      .select("p_brand", "p_size", "l_suppkey").distinct().collect()
      .map(r => (r.getString(0), r.getInt(1)))
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    assert(rows.length == local.size)
    rows.foreach { r =>
      assert(r.getString(0) != "Brand#7", "excluded brand must not appear")
      assert(r.getLong(2) == local((r.getString(0), r.getInt(1))))
    }
  }

  test("excess shippers exceed the 15% share threshold on some family part") {
    val rows = Analytics.excessShippers(tables).collect()
    assert(rows.nonEmpty, "fixture must produce at least one dominant supplier")
    val pairs = tables.lineitem
      .join(tables.part.filter(col("p_name").like("%bolt%")),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_partkey", "l_suppkey")
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("qty"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDecimal(2)))
    val totals = pairs.groupBy(_._1).map { case (pk, ps) =>
      pk -> ps.map(p => BigDecimal(p._3)).sum
    }
    val domCounts = pairs
      .filter(p => BigDecimal(p._3) * 20 > totals(p._1) * 3)
      .groupBy(_._2).map { case (sk, ps) => sk -> ps.length.toLong }
    val names = tables.supplier.select("s_suppkey", "s_name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = domCounts.map { case (sk, n) => names(sk) -> n }
    assert(rows.map(r => r.getString(0) -> r.getLong(2)).toMap == expected)
  }

  test("snapshot diff classifies every key by the modular rules and nets the +1 adjustments") {
    val diff = graft.operators.Ingest.snapshotDiff(tables).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(diff.nonEmpty)
    val orders = tables.orders.select("o_orderkey", "o_orderpriority", "o_totalprice")
      .collect().map(r => (r.getLong(0), r.getString(1), BigDecimal(r.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_EVEN)))
    val expected = orders.flatMap { case (k, prio, v) =>
      val inA = k % 11 != 0
      val inB = k % 13 != 0
      val vb  = if (k % 3 == 0) v + 1 else v
      if (!inA && !inB) None
      else if (!inA) Some((prio, "added", vb))
      else if (!inB) Some((prio, "removed", -v))
      else if (v != vb) Some((prio, "changed", vb - v))
      else Some((prio, "unchanged", BigDecimal(0)))
    }.groupBy(p => (p._1, p._2)).map { case (key, ps) =>
      key -> (ps.length.toLong, ps.map(_._3).sum.toDouble)
    }
    assert(diff.keySet == expected.keySet, "every class per priority must appear")
    // counts are exact; deltas compare through the double cast
    expected.foreach { case (key, (n, d)) =>
      assert(diff(key)._1 == n, s"$key count ${diff(key)._1} vs $n")
      assert(math.abs(diff(key)._2 - d) < 0.5, s"$key delta ${diff(key)._2} vs $d")
    }
    Seq("added", "removed", "changed", "unchanged").foreach { ct =>
      assert(diff.keys.exists(_._2 == ct), s"class $ct must be populated by construction")
    }
  }

  test("compaction plan conserves rows, bounds bin counts, and keeps bins day-contiguous") {
    val plan = graft.operators.Layout.compactionPlan(tables).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getTimestamp(4), r.getTimestamp(5)))
    assert(plan.nonEmpty)
    val totalEvents = tables.events.count()
    assert(plan.map(_._4).sum == totalEvents, "bins must conserve every row")
    plan.groupBy(_._1).foreach { case (et, bins) =>
      val sorted = bins.sortBy(_._2)
      assert(sorted.length <= 9, s"$et: at most binsPerType+1 bins")
      assert(sorted.map(_._2).distinct.length == sorted.length)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._6.before(b._5), s"$et: bin ${a._2} days must precede bin ${b._2}")
        case _ =>
      }
    }
  }

  test("heavy hitters are exactly the users above the lift threshold") {
    val hh = Analytics.heavyHitters(tables).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(hh.nonEmpty, "fixture has above-lift users at every SF")
    val counts = tables.events.select("event_type", "user_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val byType = counts.groupBy(_._1._1)
    val expected = byType.flatMap { case (_, cs) =>
      val total  = cs.values.sum
      val nUsers = cs.size.toLong
      cs.filter { case (_, n) => n * nUsers * 10 > total * 13 }
    }
    assert(hh == expected)
  }

  test("multi-touch attribution conserves every attributed purchase to the cent") {
    val rows = Analytics.attributionMultiTouch(tables).collect()
    assert(rows.nonEmpty)
    val totalCredited = rows.map(_.getLong(2)).sum
    // recompute locally: cents of purchases with >=1 prior-24h click
    val evs = tables.events.select("user_id", "event_type", "ts", "event_id", "value").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2).getTime * 1000L + (r.getTimestamp(2).getNanos % 1000000) / 1000,
        r.getLong(3), r.getDouble(4)))
    val clicksByUser = evs.filter(_._2 == "click").groupBy(_._1)
    val winUs = 24L * 3600L * 1000000L
    var expected = 0L
    var nCredits = 0L
    evs.filter(_._2 == "purchase").foreach { case (u, _, pus, _, v) =>
      val k = clicksByUser.getOrElse(u, Array.empty)
        .count(c => c._3 < pus && c._3 >= pus - winUs)
      if (k > 0) {
        expected += math.round(v * 100)
        nCredits += k
      }
    }
    assert(totalCredited == expected,
      s"credited $totalCredited cents vs attributed purchases' $expected")
    assert(rows.map(_.getLong(1)).sum == nCredits)
  }

  test("supplier rank matches a local fixed-point PageRank on the collected graph") {
    val pairs = tables.lineitem
      .join(tables.orders, col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = pairs ++ pairs.map { case (a, b) => (b, a) }
    val deg   = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    var r     = deg.keys.map(_ -> 1000000L).toMap
    for (_ <- 1 to 3) {
      val s = edges.groupBy(_._2).view.mapValues(_.map { case (u, _) => r(u) / deg(u) }.sum).toMap
      r = s.map { case (n, sum) => n -> (150000L + sum * 85 / 100) }
    }
    val expected = r.collect { case (n, v) if n % 2 == 1 => (n - 1) / 2 -> v }
    val got = graft.operators.Graph.supplierRank(tables).collect()
      .map(row => row.getLong(0) -> row.getLong(1)).toMap
    assert(got == expected, s"${got.size} suppliers vs ${expected.size}")
    assert(got.nonEmpty && got.valuesIterator.forall(_ >= 150000L))
  }

  test("join forecast equals the actual self-join output size") {
    import org.apache.spark.sql.functions._
    val e = tables.events.select(col("user_id"), col("event_id"))
    val actualPairs = e.as("a")
      .join(e.as("b"), col("a.user_id") === col("b.user_id"))
      .count()
    val row = graft.operators.Layout.joinForecast(tables).collect().head
    assert(row.getAs[Long]("forecast_pairs") == actualPairs,
      "forecast must equal the real join's output size")
    val counts = e.groupBy("user_id").count().collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(row.getAs[Long]("n_keys") == counts.length.toLong)
    assert(row.getAs[Long]("max_pairs") == counts.map(c => c._2 * c._2).max)
    val maxN = counts.map(_._2).max
    assert(row.getAs[Long]("witness_key") == counts.filter(_._2 == maxN).map(_._1).min)
  }

  test("rfm segments equal a local replay; no window in the plan") {
    import org.apache.spark.sql.functions._
    def us(t: java.sql.Timestamp): Long = Math.floorDiv(t.getTime, 1000L)
    val purchases = tables.events
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), BigDecimal(r.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_UP)))
    val perUser = purchases.groupBy(_._1).map { case (u, rows) =>
      val last = rows.map(_._2).maxBy(t => (us(t), t.getNanos))
      (u, last, rows.length.toLong, rows.map(_._3).sum.toDouble)
    }.toSeq
    val maxDay = perUser.map(_._2).maxBy(t => (us(t), t.getNanos)).toLocalDateTime.toLocalDate
    val users = perUser.map { case (u, last, f, m) =>
      (u, java.time.temporal.ChronoUnit.DAYS.between(last.toLocalDateTime.toLocalDate, maxDay), f, m)
    }
    def quart(vs: Seq[Double]): Seq[Double] = {
      val s = vs.sorted
      Seq(0.25, 0.5, 0.75).map { q =>
        val pos  = q * (s.length - 1)
        val lo   = pos.toInt
        val frac = pos - lo
        // mirror the engines' interpolation form: lo + (hi - lo) * frac
        if (lo + 1 < s.length) s(lo) + (s(lo + 1) - s(lo)) * frac else s(lo)
      }
    }
    val rc = quart(users.map(_._2.toDouble))
    val fc = quart(users.map(_._3.toDouble))
    val mc = quart(users.map(_._4))
    def sc(v: Double, c: Seq[Double]) = 1 + c.count(v > _)
    val expected = users
      .groupBy { case (_, r, f, m) =>
        s"R${sc(r.toDouble, rc)}F${sc(f.toDouble, fc)}M${sc(m, mc)}"
      }
      .map { case (seg, rows) =>
        seg -> (rows.length.toLong,
          rows.map(r => BigDecimal(r._4).setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble)
      }
    val df  = graft.operators.Analytics.rfmSegments(tables)
    val got = df.collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got == expected, s"${got.size} segments vs ${expected.size}")
    assert(got.keysIterator.forall(_.matches("R[1-4]F[1-4]M[1-4]")))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "RFM must not plan a window")
  }

  test("link prediction equals brute force; hub cap bounds wedge centers") {
    import org.apache.spark.sql.functions._
    val li = tables.lineitem
      .filter(col("l_quantity") >= 45)
      .select(col("l_orderkey"), col("l_partkey"))
      .distinct()
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = li
      .groupBy(_._1)
      .values
      .flatMap { grp =>
        val ps = grp.map(_._2).distinct.sorted
        for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
      }
      .toSet
    val adjAll = (edges.toSeq ++ edges.toSeq.map { case (a, b) => (b, a) })
      .groupBy(_._1)
      .view
      .mapValues(_.map(_._2).toSet)
      .toMap
    def expectedTop(maxDeg: Int, topN: Int): Seq[(Long, Long, Long)] = {
      val scores = scala.collection.mutable.Map.empty[(Long, Long), Long].withDefaultValue(0L)
      for ((c, nbrs) <- adjAll if nbrs.size <= maxDeg; s <- nbrs.toSeq.sorted) {
        for (t2 <- nbrs.toSeq.sorted if s < t2) scores((s, t2)) += 1
      }
      scores.toSeq
        .collect { case ((a, b), n) if !edges((a, b)) => (a, b, n) }
        .sortBy { case (a, b, n) => (-n, a, b) }
        .take(topN)
    }
    for (cap <- Seq(64, 2)) {
      val got = graft.operators.Graph.linkPrediction(tables, maxDeg = cap)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSeq
      assert(got == expectedTop(cap, 20), s"cap $cap mismatch")
    }
    assert(graft.operators.Graph.linkPrediction(tables).collect().nonEmpty)
  }

  test("weighted sample equals exact integer acceptance, and prefers long docs") {
    import org.apache.spark.sql.functions._
    val docs = tables.documents
      .select(col("doc_id"), col("n_chars"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val total = docs.map(_._2).sum
    val md    = java.security.MessageDigest.getInstance("MD5")
    def h60(id: Long): BigInt = {
      val hex = md.digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      BigInt(hex.substring(0, 15), 16)
    }
    val expected = docs.collect {
      case (id, n) if h60(id) * BigInt(total) < BigInt(100) * BigInt(n) * BigInt(2).pow(60) => id
    }.toSet
    val got = graft.operators.Sampling.weightedSample(tables)
      .collect()
      .map(_.getLong(0))
      .toSet
    assert(got == expected, s"${got.size} kept vs ${expected.size} expected")
    assert(got.nonEmpty && got.size < docs.length, "sample should be a proper subset")
    // weighting bias: mean length of kept docs exceeds the corpus mean
    val byId = docs.toMap
    assert(got.map(byId).sum * docs.length > total * got.size, "no length bias — weighting broken")
  }

  test("triangle counts equal the brute-force enumeration (degree orientation exact)") {
    import org.apache.spark.sql.functions._
    // brute-force ground truth from the same heavy co-purchase edges
    val li = tables.lineitem
      .filter(col("l_quantity") >= 45)
      .select(col("l_orderkey"), col("l_partkey"))
      .distinct()
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = li
      .groupBy(_._1)
      .values
      .flatMap { grp =>
        val ps = grp.map(_._2).distinct.sorted
        for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
      }
      .toSet
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val triCorners = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for ((a, b) <- edges; c <- adj.getOrElse(a, Set.empty) if c > b && edges((b, c))) {
      triCorners(a) += 1; triCorners(b) += 1; triCorners(c) += 1
    }
    val got = graft.operators.Graph.triangleCounts(tables).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == triCorners.toMap, s"${got.size} nodes vs ${triCorners.size} expected")
    assert(got.nonEmpty, "fixture produced no triangles — threshold too high")
    // the per-corner totals triple-count each triangle
    assert(got.valuesIterator.sum % 3 == 0)
  }

  test("version drift: buckets, cumulatives, and the ppm KS stat match a driver-side replay") {
    val docs = tables.documents.selectExpr("doc_id", "length(text) AS n").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val v1 = docs.collect {
      // substr on an empty text yields length 0, not max(n-10, 1)
      case (id, n) if id % 17 != 2 => if (id % 11 == 3) { if (n == 0) 0L else math.max(n - 10, 1) } else n
    }.toSeq
    val v2 = docs.collect { case (id, n) if id % 13 != 5 => n }.toSeq
    val h1 = v1.groupBy(_ / 100).view.mapValues(_.size.toLong).toMap
    val h2 = v2.groupBy(_ / 100).view.mapValues(_.size.toLong).toMap
    val buckets = (h1.keySet ++ h2.keySet).toSeq.sorted
    val (tot1, tot2) = (v1.size.toLong, v2.size.toLong)
    var (c1, c2) = (0L, 0L)
    val expected = buckets.map { b =>
      c1 += h1.getOrElse(b, 0L); c2 += h2.getOrElse(b, 0L)
      val ppm = (BigInt(c1) * tot2 - BigInt(c2) * tot1).abs * 1000000 / (BigInt(tot1) * tot2)
      (b, h1.getOrElse(b, 0L), h2.getOrElse(b, 0L), c1, c2, ppm.toLong)
    }
    val got = graft.operators.Curation.versionDrift(tables).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq == expected, s"got=${got.toSeq}\nexpected=$expected")
    assert(got.forall(_._6 <= 1000000L), "ppm stat out of [0, 1e6]")
    assert(got.map(_._2).sum == tot1 && got.map(_._3).sum == tot2, "histogram mass lost")
  }
}
