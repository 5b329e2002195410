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
}
