package graft

import graft.operators.{Analytics, Temporal}
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
}
