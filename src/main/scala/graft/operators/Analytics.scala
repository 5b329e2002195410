package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** General analytics over the star schema — the engine-breadth queries
  * (SURVEY.md §2B). All plans: broadcast the dimension side, shuffle
  * facts once on the join/group key, rely on partial aggregation.
  */
object Analytics {

  /** B1: TPC-H Q1-style pricing summary. One scan, one shuffle on the
    * (returnflag, linestatus) group key, everything partial-aggregated
    * map-side. At 100 TB this is scan-bound — exactly what we want.
    */
  def pricingSummary(t: Tables): DataFrame = {
    val l = t.lineitem
    l.groupBy("l_returnflag", "l_linestatus")
      .agg(
        Num.moneySum(col("l_quantity")).as("sum_qty"),
        Num.moneySum(col("l_extendedprice")).as("sum_base_price"),
        Num.moneySum4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        Num.moneySum6(
          col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))
        ).as("sum_charge"),
        Num.moneyAvg(col("l_quantity")).as("avg_qty"),
        Num.moneyAvg(col("l_extendedprice")).as("avg_price"),
        count(lit(1)).as("count_order")
      )
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** B2: top-10 orders by discounted revenue for one market segment.
    * customer is the small side → broadcast hash join, no shuffle of
    * lineitem except the final group on l_orderkey.
    */
  def topOrders(t: Tables): DataFrame = {
    val cust = t.customer.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val o    = t.orders.select("o_orderkey", "o_custkey", "o_orderdate")
    val l    = t.lineitem.select("l_orderkey", "l_extendedprice", "l_discount")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy("o_orderkey")
      .agg(Num.moneySum4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  /** B3: revenue per region — five-way join where every dimension
    * (region, nation, customer at test SF; on a cluster customer stays
    * a shuffle join and AQE decides) is broadcast, so the only wide
    * exchange is lineitem⋈orders on the order key.
    */
  def regionVolume(t: Tables): DataFrame = {
    val dims = t.customer
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("r_name"))
    val o = t.orders.select("o_orderkey", "o_custkey")
    val l = t.lineitem.select("l_orderkey", "l_extendedprice", "l_discount")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(dims), col("o_custkey") === col("c_custkey"))
      .groupBy("r_name")
      .agg(Num.moneySum4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy("r_name")
  }

  /** B4: top-3 events per user by value — partitioned window, shuffles
    * once on user_id; no global sort.
    */
  def topEventsPerUser(t: Tables): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("value").desc, col("event_id"))
    t.events
      .select("user_id", "event_id", "event_type", "value")
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .orderBy("user_id", "rnk")
  }

  /** B4 scale twin: same result through the custom bounded-heap
    * TopKPerKey operator (graft.plans.TopK) — O(n log k) single pass
    * instead of a full per-group sort. Shares B4's oracle, so the
    * custom physical operator is value-verified by the gate.
    */
  def topEventsPerUserFast(t: Tables): DataFrame =
    graft.plans.TopK
      .perKey(
        t.events.select("user_id", "event_id", "event_type", "value"),
        Seq("user_id"),
        Seq(col("value").desc, col("event_id")),
        k = 3
      )
      .orderBy("user_id", "rnk")

  /** B5: exact distinct users per event type. (The HLL twin,
    * approxDistinctUsers, is the 100 TB path.)
    */
  def distinctUsers(t: Tables): DataFrame =
    t.events
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_users"), count(lit(1)).as("n_events"))
      .orderBy("event_type")

  /** B5 skew-safe exact twin: two-phase distinct. `countDistinct` per
    * group plans an Expand that funnels each group's whole value set
    * through that group's reducer — with 5 event types and 10⁹ users a
    * single task owns ~2×10⁸ values. Re-keying phase 1 on the COMPOSITE
    * (event_type, user_id) spreads the dedup over all partitions (the
    * user_id component is the salt — high-cardinality and
    * hash-uniform); phase 2 then counts survivors per type, a
    * partial-agg'd count over pre-deduped rows. Two balanced shuffles
    * instead of one skewed one — identical output, gate-shared oracle.
    */
  def distinctUsersTwoPhase(t: Tables): DataFrame =
    t.events
      .groupBy("event_type", "user_id")
      .agg(count(lit(1)).as("n"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_users"), sum("n").as("n_events"))
      .orderBy("event_type")

  /** B5 scale twin: HLL sketch — one pass, no exact distinct shuffle
    * explosion. rows-only checked (approximate by construction).
    */
  def approxDistinctUsers(t: Tables): DataFrame =
    t.events
      .groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), 0.01).as("n_users_approx"))
      .orderBy("event_type")

  /** B17: fixed-width histogram of event values per type — the core
    * OLAP distribution profile. Bin assignment is a codegen'd floor
    * projection; one partial-agg'd shuffle on (type, bin). At 100 TB
    * the output stays tiny (types × bins) regardless of input size —
    * the shape that makes histogramming the cheap first look at any
    * new column.
    */
  val HistBinWidth = 50

  def valueHistogram(t: Tables, binWidth: Int = HistBinWidth): DataFrame =
    t.events
      .select(col("event_type"), floor(col("value") / binWidth).cast("long").as("bin"))
      .groupBy("event_type", "bin")
      .agg(count(lit(1)).as("n"))
      .orderBy("event_type", "bin")

  /** B6: TPC-H Q6-style selective revenue delta — every predicate
    * (date range, discount band, quantity cap) reaches the parquet
    * scan as a pushed filter; the aggregation is a scan-bound
    * single-group partial agg. The pushdown showcase.
    */
  def selectiveRevenue(t: Tables): DataFrame =
    t.lineitem
      .filter(
        col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1997-01-01" &&
          col("l_discount").between(0.03, 0.07) && col("l_quantity") < 24
      )
      .agg(
        Num.moneySum4(col("l_extendedprice") * col("l_discount")).as("revenue"),
        count(lit(1)).as("n_items")
      )

  /** B7: orders having at least one returned line — LEFT SEMI join
    * (builds only the distinct key set, never materializes the match).
    */
  def prioritySemi(t: Tables): DataFrame = {
    val returned = t.lineitem.filter(col("l_returnflag") === "R").select("l_orderkey")
    t.orders
      .join(returned, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")
  }

  /** B8: customers with no recent orders — LEFT ANTI join against a
    * filtered fact (the filter pushes into the orders scan before the
    * anti-join builds its key set).
    */
  def customersWithoutOrders(t: Tables): DataFrame =
    t.customer
      .join(
        t.orders.filter(col("o_orderdate") >= "2000-01-01"),
        col("c_custkey") === col("o_custkey"),
        "left_anti"
      )
      .select("c_custkey", "c_mktsegment")
      .orderBy("c_custkey")

  /** B9: volume per part brand — fact ⋈ broadcast(part) + partial agg. */
  def brandVolume(t: Tables): DataFrame =
    t.lineitem
      .join(broadcast(t.part), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(
        Num.moneySum(col("l_quantity")).as("sum_qty"),
        Num.moneySum4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue")
      )
      .orderBy("p_brand")

  /** B11: hierarchical rollup — revenue at (region, nation), per
    * region, and grand total in ONE pass (partial-agg'd grouping
    * sets; no re-scan per level).
    */
  def rollupVolume(t: Tables): DataFrame = {
    val dims = t.customer
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("r_name").as("region"), col("n_name").as("nation"))
    t.orders
      .join(broadcast(dims), col("o_custkey") === col("c_custkey"))
      .select(col("region"), col("nation"), col("o_totalprice"))
      // rollup(String*) resolves dataset-tagged columns that Expand then
      // duplicates, tripping the ambiguous-self-join detector; untagged
      // expr() columns sidestep it
      .rollup(expr("region"), expr("nation"))
      .agg(Num.moneySum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
      .orderBy(col("region").asc_nulls_first, col("nation").asc_nulls_first)
  }

  /** B11b: full cube — revenue by (region, segment), each margin, and
    * the grand total in ONE pass. Same Expand-based partial-agg shape
    * as [[rollupVolume]] (2ᵈ grouping sets from one scan — never d
    * re-scans); the fact side shuffles once on the expanded keys.
    */
  def cubeVolume(t: Tables): DataFrame = {
    val dims = t.customer
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("r_name").as("region"), col("c_mktsegment").as("segment"))
    t.orders
      .join(broadcast(dims), col("o_custkey") === col("c_custkey"))
      .select(col("region"), col("segment"), col("o_totalprice"))
      // untagged expr() columns for the same ambiguous-self-join reason
      // as rollupVolume
      .cube(expr("region"), expr("segment"))
      .agg(Num.moneySum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
      .orderBy(col("region").asc_nulls_first, col("segment").asc_nulls_first)
  }

  /** B11c: explicit GROUPING SETS — the ASYMMETRIC margin report
    * ((region), (segment), ()) that rollup/cube can't express without
    * overcomputing: cube would also build the (region, segment) pair
    * nobody asked for, paying 4/3 the Expand width. Same one-scan
    * Expand shape as B11/B11b; `grouping_id` disambiguates a margin
    * row from a genuine NULL dimension value — the reason SQL gave
    * grouping sets their own function instead of leaving consumers to
    * guess from NULLs.
    */
  def groupingSetsVolume(t: Tables): DataFrame = {
    val dims = t.customer
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("r_name").as("region"), col("c_mktsegment").as("segment"))
    t.orders
      .join(broadcast(dims), col("o_custkey") === col("c_custkey"))
      .select(col("region"), col("segment"), col("o_totalprice"))
      .groupingSets(
        Seq(Seq(expr("region")), Seq(expr("segment")), Seq.empty[org.apache.spark.sql.Column]),
        expr("region"),
        expr("segment")
      )
      .agg(
        grouping_id().as("gid"),
        Num.moneySum(col("o_totalprice")).as("revenue"),
        count(lit(1)).as("n_orders")
      )
      .orderBy(col("gid"), col("region").asc_nulls_first, col("segment").asc_nulls_first)
  }

  /** B12: pivot — events per user as one column per event type.
    * Types are enumerated (the scalable form: an un-enumerated pivot
    * needs a driver-side distinct pass first).
    */
  val EventTypes: Seq[String] = Seq("click", "view", "purchase", "signup", "error")

  def eventTypePivot(t: Tables): DataFrame =
    t.events
      .groupBy("user_id")
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
      .na
      .fill(0, EventTypes)
      .orderBy("user_id")

  /** B13: exact percentiles per event type — `percentile` is an exact
    * sort-based aggregate (the approx twin at 100 TB is
    * percentile_approx; both partial-aggregate).
    */
  def valuePercentiles(t: Tables): DataFrame =
    t.events
      .groupBy("event_type")
      .agg(
        expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.9)").as("p90"),
        expr("percentile(value, 0.99)").as("p99")
      )
      .orderBy("event_type")

  /** B22: ordered conversion funnel with a 1-day conversion window per
    * step — signup → first click within [signup, +1d) → first purchase
    * within [that click, +1d). The step ORDERING + WINDOW is the whole
    * operator: per-type counts can't express "after the previous step,
    * and soon enough" (unwindowed, every test-corpus user completes —
    * vacuous; the 1-day window gives 150 → 65 → 29 at sf0.01). One
    * shuffle on user_id: the three step times are CHAINED
    * conditional-min windows over the same partitioning (each step's
    * predicate references the previous step's column — Spark stacks
    * the Window operators without re-exchanging), the per-user rollup
    * reuses the partitioning, and the funnel report is a partial-agg'd
    * global count of non-null steps.
    */
  def funnel(t: Tables): DataFrame = {
    val byUser = Window.partitionBy("user_id")
    val day    = expr("INTERVAL 1 DAY")
    t.events
      .select(col("user_id"), col("ts"), col("event_type"))
      .withColumn(
        "t_signup",
        min(when(col("event_type") === "signup", col("ts"))).over(byUser)
      )
      .withColumn(
        "t_click",
        min(
          when(
            col("event_type") === "click" &&
              col("ts") >= col("t_signup") && col("ts") < col("t_signup") + day,
            col("ts")
          )
        ).over(byUser)
      )
      .withColumn(
        "t_purchase",
        min(
          when(
            col("event_type") === "purchase" &&
              col("ts") >= col("t_click") && col("ts") < col("t_click") + day,
            col("ts")
          )
        ).over(byUser)
      )
      .groupBy("user_id")
      .agg(
        max("t_signup").as("t_signup"),
        max("t_click").as("t_click"),
        max("t_purchase").as("t_purchase")
      )
      .agg(
        count(lit(1)).as("n_users"),
        count(col("t_signup")).as("n_signup"),
        count(col("t_click")).as("n_click_after_signup"),
        count(col("t_purchase")).as("n_purchase_after_click")
      )
  }

  /** B10: revenue per supplier nation — two broadcast dims chained. */
  def supplierNationVolume(t: Tables): DataFrame =
    t.lineitem
      .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(Num.moneySum4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy("n_name")

  /** B23: robust per-type outliers — |value − median| > 3 × MAD
    * (median absolute deviation). Mean/stddev outlier rules break on
    * the very rows they hunt (the outliers drag the mean); the MAD
    * rule has a 50% breakdown point, which is why monitoring pipelines
    * use it for anomaly gating.
    *
    * Plan: two TINY per-type aggregates (median, then MAD over the
    * median-joined scan) broadcast back against the fact — the fact is
    * never globally sorted and never shuffles on anything but the
    * 5-value type key inside `percentile`'s partial aggregation.
    * Double arithmetic is filter-only + passthrough (no float
    * accumulation), so the gate hash is stable cross-engine — the
    * interpolated medians match because both engines compute
    * lower + (upper − lower) × frac (the q_value_percentiles
    * precedent).
    */
  def valueOutliers(t: Tables): DataFrame = {
    val e   = t.events.select("event_id", "event_type", "value")
    val med = e.groupBy("event_type").agg(expr("percentile(value, 0.5)").as("med"))
    val mad = e
      .join(broadcast(med), "event_type")
      .groupBy("event_type")
      .agg(expr("percentile(abs(value - med), 0.5)").as("mad"))
    e.join(broadcast(med), "event_type")
      .join(broadcast(mad), "event_type")
      .filter(abs(col("value") - col("med")) > lit(3.0) * col("mad"))
      .select(col("event_id"), col("event_type"), col("value"), col("med"), col("mad"))
      .orderBy("event_id")
  }

  /** B24: cohort retention matrix — users bucketed by FIRST-seen day,
    * counted per (cohort, days-since-first-seen). The classic
    * activation/retention triangle: row = acquisition cohort, column =
    * age, cell = distinct active users. Per-type counts can't express
    * it because the cohort is a property of the USER's history, not of
    * any single event.
    *
    * Plan: one shuffle on user_id computes first-seen day; the
    * distinct (user, day) activity set partitions on the same key so
    * the join is co-shuffled; the final matrix aggregate is tiny
    * (cohorts × ages). Counting rows of the pre-distinct'd activity
    * set IS count(DISTINCT user) without an Expand.
    */
  def cohortRetention(t: Tables): DataFrame = {
    val e       = t.events.select(col("user_id"), date_trunc("day", col("ts")).as("day"))
    val cohorts = e.groupBy("user_id").agg(min("day").as("cohort_day"))
    e.distinct()
      .join(cohorts, "user_id")
      .withColumn("day_offset", datediff(col("day"), col("cohort_day")).cast("long"))
      .groupBy("cohort_day", "day_offset")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_day", "day_offset")
  }

  /** B27b: multi-touch (linear) attribution — each purchase's value
    * splits EQUALLY across all the user's clicks in the prior 24 h,
    * rolled up per click hour: the fairness counterpart of B27's
    * last-touch rule. Division is where engines diverge (value/k is a
    * repeating binary fraction), so credits are INTEGER CENTS: each
    * pair gets `cents div k`, and the `cents mod k` remainder goes one
    * cent each to the EARLIEST clicks — deterministic, and every
    * purchase's value is conserved to the cent by construction.
    *
    * Pairs come from B15's bucketized interval join (clicks keyed by
    * their 24 h bucket, each purchase probes its two covering buckets
    * — candidates bounded by per-bucket co-occurrence, never a time
    * self-join); the credit rank is a window over PAIRS per purchase,
    * bounded by the window's click count, not the corpus. All-integer
    * output (hour sequence, counts, cents) — nothing to round.
    */
  def attributionMultiTouch(t: Tables, windowHours: Long = 24): DataFrame = {
    val winUs = windowHours * 3600L * 1000000L
    // FLOOR division, not `div`: div truncates toward zero, so near
    // the epoch (x < w) the two purchase probes would collapse into
    // the same bucket 0 and double-credit every qualifying click.
    // floor(x/w) = (x − pmod(x, w)) div w is exact for any sign, and
    // floor((x−w)/w) = floor(x/w) − 1 holds unconditionally.
    def fdiv(x: String): Column = expr(s"($x - pmod($x, $winUs)) div $winUs")
    val clicks = t.events
      .filter(col("event_type") === "click")
      .select(
        col("user_id").as("c_user"),
        unix_micros(col("ts")).as("c_us"),
        col("event_id").as("c_id")
      )
      .withColumn("c_bucket", fdiv("c_us"))
    val purchases = t.events
      .filter(col("event_type") === "purchase")
      .select(
        col("user_id").as("p_user"),
        unix_micros(col("ts")).as("p_us"),
        col("event_id").as("p_id"),
        round(col("value") * 100).cast("long").as("cents")
      )
      .withColumn("p_bucket", explode(array(fdiv("p_us"), fdiv("p_us") - 1)))
    val pairs = purchases
      .join(
        clicks.hint("shuffle_hash"),
        col("p_user") === col("c_user") && col("p_bucket") === col("c_bucket") &&
          col("c_us") < col("p_us") && col("c_us") >= col("p_us") - winUs
      )
    val wk = Window.partitionBy("p_id")
    val wr = Window.partitionBy("p_id").orderBy(col("c_us"), col("c_id"))
    pairs
      .withColumn("k", count(lit(1)).over(wk))
      .withColumn("rn", row_number().over(wr))
      .withColumn(
        "credit_cents",
        expr("cents div k") + when(col("rn") <= expr("cents % k"), 1L).otherwise(0L)
      )
      .groupBy(expr("c_us div 3600000000").as("click_hour_seq"))
      .agg(count(lit(1)).as("n_credits"), sum(col("credit_cents")).as("attributed_cents"))
      .orderBy("click_hour_seq")
  }

  /** B27: last-touch revenue attribution — every purchase's value is
    * credited to the latest at-or-before click by the same user, then
    * rolled up to the click HOUR: "which engagement cohort drove the
    * money", the attribution report behind every campaign dashboard.
    * This composes the as-of carry with an aggregate, so the join
    * never materializes per-pair rows beyond the purchase count.
    *
    * Plan: the union-tag running-window as-of kernel (ONE shuffle on
    * user_id, no inequality join — Temporal.asofOn's shape, carrying
    * the purchase value through the union) + a tiny partial-agg'd
    * rollup on the attributed hour. Decimal money sum, as everywhere.
    */
  def attribution(t: Tables): DataFrame = {
    val e = t.events.select("event_id", "ts", "user_id", "event_type", "value")
    val clicks = e
      .filter(col("event_type") === "click")
      .select(
        col("user_id"),
        col("ts"),
        col("event_id"),
        lit(0).as("tag"),
        struct(col("ts").as("c_ts"), col("event_id").as("c_id")).as("c"),
        lit(null).cast("double").as("pval")
      )
    val purchases = e
      .filter(col("event_type") === "purchase")
      .select(
        col("user_id"),
        col("ts"),
        col("event_id"),
        lit(1).as("tag"),
        lit(null).cast("struct<c_ts:timestamp,c_id:bigint>").as("c"),
        col("value").as("pval")
      )
    val w = Window
      .partitionBy("user_id")
      .orderBy(col("ts"), col("tag"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clicks
      .unionByName(purchases)
      .withColumn("last_click", last("c", ignoreNulls = true).over(w))
      .filter(col("tag") === 1 && col("last_click").isNotNull)
      .groupBy(date_trunc("hour", col("last_click.c_ts")).as("click_hour"))
      .agg(count(lit(1)).as("n_purchases"), Num.moneySum(col("pval")).as("attributed_value"))
      .orderBy("click_hour")
  }

  /** B13b: the approximate twin of [[valuePercentiles]] —
    * `percentile_approx` (KLL-style quantile summary, mergeable and
    * partial-aggregated) is the 100 TB path where the exact sort-based
    * `percentile` would buffer each group's values. Rows-only in the
    * gate (the summary's outputs are accuracy-bounded, not portable);
    * AnalyticsSpec pins each approximate quantile inside the exact
    * neighboring-quantile bracket, so the twin is spec-verified
    * against the hash-gated exact operator.
    */
  def valuePercentilesApprox(t: Tables, accuracy: Int = 1000): DataFrame =
    t.events
      .groupBy("event_type")
      .agg(
        expr(s"percentile_approx(value, 0.5, $accuracy)").as("p50"),
        expr(s"percentile_approx(value, 0.9, $accuracy)").as("p90"),
        expr(s"percentile_approx(value, 0.99, $accuracy)").as("p99")
      )
      .orderBy("event_type")

  /** B28: per-user lifetime-value deciles WITHOUT a global sort — the
    * equi-depth bucketing problem at scale. `ntile(10)` over all users
    * is a single-partition window (the serial dimension a billion-user
    * table cannot pay); instead the nine exact decile CUTPOINTS come
    * from one tiny aggregate, broadcast back, and each user's decile
    * is `1 + #(cutpoints below)` via a 9-element fold — map-side,
    * embarrassingly parallel, same answer. The length-gate pattern
    * generalized from one threshold to an equi-depth histogram.
    */
  def userValueDeciles(t: Tables): DataFrame = {
    val perUser = t.events
      .filter(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(Num.moneySum(col("value")).as("total_value"))
    val cuts = perUser.agg(
      expr("percentile(total_value, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))").as("cuts")
    )
    perUser
      .crossJoin(broadcast(cuts))
      .withColumn(
        "decile",
        (lit(1) + expr(
          "aggregate(cuts, 0, (acc, c) -> acc + CASE WHEN total_value > c THEN 1 ELSE 0 END)"
        )).cast("long")
      )
      .groupBy("decile")
      .agg(count(lit(1)).as("n_users"), Num.moneySum(col("total_value")).as("decile_value"))
      .orderBy("decile")
  }

  /** B73: RFM segmentation — each purchasing user scored into
    * quartiles on Recency (days since last purchase, against the
    * corpus's last day), Frequency (purchase count) and Monetary
    * (decimal-summed value), concatenated to the classic "R2F4M3"
    * segment label and histogrammed — the marketing-segmentation
    * report, three B28 equi-depth scorings composed in ONE pass.
    *
    * Same scale shape as B28: one keyed shuffle to the per-user
    * aggregate, cutpoints from one tiny aggregate broadcast back,
    * quartile = 1 + #(cutpoints strictly below) via a 3-element fold
    * (no window, no global sort anywhere — PlanSpec's B28 guarantee
    * holds here too). All three dimensions score high-value-high by
    * the same rule (recency is days-since, so R4 = longest idle);
    * the final rollup is ≤ 4³ rows at any scale.
    */
  def rfmSegments(t: Tables): DataFrame = {
    val perUser = t.events
      .filter(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(
        max(col("ts")).as("last_ts"),
        count(lit(1)).as("freq"),
        Num.moneySum(col("value")).as("mon"))
    val corpusEnd = perUser.agg(max("last_ts").as("mts"))
    val u = perUser
      .crossJoin(broadcast(corpusEnd))
      .select(
        col("user_id"),
        datediff(col("mts").cast("date"), col("last_ts").cast("date")).cast("long").as("rec_days"),
        col("freq"),
        col("mon"))
    val cuts = u.agg(
      expr("percentile(rec_days, array(0.25,0.5,0.75))").as("rc"),
      expr("percentile(freq, array(0.25,0.5,0.75))").as("fc"),
      expr("percentile(mon, array(0.25,0.5,0.75))").as("mc"))
    def score(v: String, c: String) =
      expr(s"1 + aggregate($c, 0, (acc, x) -> acc + CASE WHEN $v > x THEN 1 ELSE 0 END)")
    u.crossJoin(broadcast(cuts))
      .select(
        concat(
          lit("R"), score("rec_days", "rc"),
          lit("F"), score("freq", "fc"),
          lit("M"), score("mon", "mc")).as("segment"),
        col("mon"))
      .groupBy("segment")
      .agg(count(lit(1)).as("n_users"), Num.moneySum(col("mon")).as("segment_value"))
      .orderBy("segment")
  }

  /** B26: daily revenue with a running cumulative per type — the
    * window-on-aggregate pattern: the raw fact collapses to a tiny
    * (days × types) grid FIRST (partial-agg'd shuffle), and only the
    * grid pays the ordered window — a running window over raw events
    * would serialize per-type scans. The cumulative sum runs in
    * DECIMAL: windowed double addition is evaluated in different
    * orders by different engines (segment trees vs running frames),
    * so an exact-decimal carry is what keeps the gate hash stable —
    * and is the right call at scale anyway (the grid is tiny; the
    * decimal cost is nothing).
    */
  def dailyCumulative(t: Tables): DataFrame = {
    val daily = t.events
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(Num.moneySum(col("value")).as("day_value"), count(lit(1)).as("n_events"))
    val w = Window
      .partitionBy("event_type")
      .orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn(
        "cum_value",
        sum(col("day_value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .over(w)
          .cast("double")
      )
      .withColumn("cum_events", sum("n_events").over(w))
      .orderBy("event_type", "day")
  }

  /** B25: per-type value rank percentiles — `percent_rank` (share of
    * peers strictly below) and `cume_dist` (share at-or-below) for
    * every event, filtered to the top decile. The per-group rank
    * normalization is how heterogeneous quality scores become
    * comparable across groups (rank-normalize per source, gate on the
    * percentile) — here expressed on the events table where the oracle
    * is exact.
    *
    * ONE shuffle on event_type; the rank doubles are integer ratios
    * ((rank−1)/(n−1), rank/n) so they are bit-identical cross-engine.
    * The (value, event_id) ordering makes ranks unique under ties —
    * without the id tie-break the frame would be nondeterministic.
    */
  def valueCumeDist(t: Tables): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy(col("value"), col("event_id"))
    t.events
      .select(col("event_id"), col("event_type"), col("value"))
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("cume", cume_dist().over(w))
      .filter(col("pct_rank") >= 0.9)
      .orderBy("event_id")
  }

  /** B31: TPC-H Q12-style shipping/priority matrix — per line status,
    * how many lineitems belong to critical (urgent/high) vs. other
    * orders. Conditional-count aggregation pushed into ONE partial agg
    * after the fact-fact join; the only wide exchange is
    * lineitem⋈orders on the order key (AQE free to pick the side).
    * Counts are integers → bit-exact cross-engine.
    */
  def shipPriorityMatrix(t: Tables): DataFrame = {
    val o = t.orders.select(col("o_orderkey"), col("o_orderpriority"))
    val l = t.lineitem.select("l_orderkey", "l_linestatus")
    val critical = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_linestatus")
      .agg(
        sum(when(critical, 1L).otherwise(0L)).as("n_critical"),
        sum(when(critical, 0L).otherwise(1L)).as("n_routine")
      )
      .orderBy("l_linestatus")
  }

  /** B32: TPC-H Q13-style customer order-count distribution. Orders
    * are pre-aggregated to one row per customer BEFORE the customer
    * join — the join then moves |customers| rows instead of |orders|,
    * and the second aggregation (histogram over n_orders) groups a
    * tiny domain. Left join keeps zero-order customers (count 0).
    * Two shuffles total (custkey, then n_orders); all-integer output.
    */
  def customerOrderDist(t: Tables): DataFrame = {
    val perCust = t.orders.groupBy("o_custkey").agg(count(lit(1)).as("cnt"))
    t.customer
      .select("c_custkey")
      .join(perCust, col("c_custkey") === col("o_custkey"), "left")
      .select(coalesce(col("cnt"), lit(0L)).as("n_orders"))
      .groupBy("n_orders")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("n_customers").desc, col("n_orders").desc)
  }

  /** B33: TPC-H Q18-style large-volume orders — orders whose total
    * line quantity exceeds a threshold, joined back to the customer.
    * The quantity rollup happens FIRST (one shuffle on l_orderkey,
    * map-side combined), the selective filter (>threshold keeps a few
    * percent) runs on the aggregate, and only then do the survivors
    * join orders/customer — at which point the left side is small
    * enough that AQE converts both joins to broadcasts at any SF.
    * Decimal quantity sum → order-independent, bit-exact.
    */
  def largeOrders(t: Tables, minQty: Double = 200.0): DataFrame = {
    val big = t.lineitem
      .groupBy("l_orderkey")
      .agg(Num.moneySum(col("l_quantity")).as("total_qty"))
      .filter(col("total_qty") > minQty)
    big
      .join(t.orders.select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"),
        col("l_orderkey") === col("o_orderkey"))
      .join(t.customer.select("c_custkey", "c_name"), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_name"), col("o_orderdate"), col("total_qty"),
        col("o_totalprice"))
      .orderBy(col("total_qty").desc, col("o_orderkey"))
  }

  /** B34: TPC-H Q14-style promotion revenue by ship month. The
    * float-ratio form (promo/total * 100) is NOT portable across
    * engines, so the operator emits both decimal sums and leaves the
    * division to the consumer — same numerator/denominator convention
    * as [[graft.operators.Sampling]]'s mixture weights. Part is the
    * broadcast dimension; lineitem aggregates in one shuffle on the
    * ship month.
    */
  /** B37: TPC-H Q10-style returned-item report — revenue lost to
    * returned lineitems per customer, top 20. The selective fact
    * filter (returnflag = 'R') runs AT THE SCAN (pushed to parquet),
    * the per-order rollup happens on the filtered fact before any
    * dimension join, and the final top-N is a TakeOrdered — no global
    * sort. Decimal revenue → bit-exact.
    */
  def returnedItemReport(t: Tables, topN: Int = 20): DataFrame = {
    val lost = t.lineitem
      .filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount")
      .join(t.orders.select("o_orderkey", "o_custkey"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey")
      .agg(
        Num.moneySum4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("lost_revenue"),
        count(lit(1)).as("n_returned_items")
      )
    lost
      .join(t.customer.select("c_custkey", "c_name", "c_mktsegment"),
        col("o_custkey") === col("c_custkey"))
      .select("c_custkey", "c_name", "c_mktsegment", "lost_revenue", "n_returned_items")
      .orderBy(col("lost_revenue").desc, col("c_custkey"))
      .limit(topN)
  }

  /** B38: TPC-H Q15-style top supplier — the supplier(s) whose revenue
    * EQUALS the global maximum, without a window over the whole
    * aggregate: the per-supplier rollup (one keyed shuffle) feeds a
    * single-row max that joins back BROADCAST, so the argmax costs one
    * tiny extra aggregation instead of a global sort or a
    * single-partition window. Ties all surface (deterministic order by
    * suppkey). Decimal revenue keeps the equality test exact — the
    * pattern float revenue would break.
    */
  def topSupplier(t: Tables): DataFrame = {
    val perSupp = t.lineitem
      .groupBy("l_suppkey")
      .agg(Num.moneySum4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
    val best = perSupp.agg(max(col("revenue")).as("best_revenue"))
    perSupp
      .join(broadcast(best), col("revenue") === col("best_revenue"))
      .join(broadcast(t.supplier.select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select("s_suppkey", "s_name", "revenue")
      .orderBy("s_suppkey")
  }

  /** B39: TPC-H Q19-style bracketed revenue — disjunction of
    * conjunctive (type, quantity-bracket, size-bracket) predicates
    * across the lineitem⋈part join. The OR-of-ANDs is the optimizer
    * workout: Catalyst extracts the common `p_size >= 1` / quantity
    * bounds where it can, the part side broadcasts, and the residual
    * disjunction evaluates codegen'd inside the join — one fact scan,
    * zero shuffles before the single-row aggregate.
    */
  def bracketRevenue(t: Tables): DataFrame = {
    val p = t.part.select("p_partkey", "p_type", "p_size")
    val bracket =
      (col("p_type") === "PROMO" && col("l_quantity").between(1, 11) &&
        col("p_size").between(1, 15)) ||
        (col("p_type") === "SMALL" && col("l_quantity").between(10, 20) &&
          col("p_size").between(1, 25)) ||
        (col("p_type") === "LARGE" && col("l_quantity").between(20, 30) &&
          col("p_size").between(1, 35))
    t.lineitem
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .filter(bracket)
      .agg(
        Num.moneySum4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_items")
      )
  }

  /** B40: TPC-H Q22-style rich-but-idle customers — above their
    * SEGMENT's average balance, but never placed an URGENT order (the
    * sf fixture gives every customer SOME order, so the idle predicate
    * targets the priority slice — same anti-join shape as Q22's
    * "no orders in 7 years"). The "compare to a group aggregate"
    * predicate is evaluated EXACTLY with a cross-multiplied decimal
    * comparison (bal·n > Σbal) — an avg-double comparison would put
    * boundary customers on different sides in different engines. Tiny
    * per-segment aggregate broadcast back (the length-gate pattern),
    * LEFT ANTI against the filtered orders — at scale the anti join
    * shuffles on custkey once (filter pushed to the orders scan) and
    * the report re-aggregates map-side.
    */
  def richIdleCustomers(t: Tables): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(18, 2)
    val segStats = t.customer
      .groupBy("c_mktsegment")
      .agg(sum(col("c_acctbal").cast(dec)).as("seg_sum"), count(lit(1)).as("seg_n"))
    val urgent = t.orders.filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
    t.customer
      .join(broadcast(segStats), "c_mktsegment")
      .filter(col("c_acctbal").cast(dec) * col("seg_n") > col("seg_sum"))
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(
        count(lit(1)).as("n_customers"),
        sum(col("c_acctbal").cast(dec)).cast("double").as("total_bal")
      )
      .orderBy("c_mktsegment")
  }

  /** B42: TPC-H Q7-style bilateral trade matrix — volume between every
    * (supplier nation, customer nation) pair. The join TOPOLOGY is the
    * new thing: the fact reaches `nation` along two different paths
    * (lineitem→supplier→nation and lineitem→orders→customer→nation),
    * so the same broadcast dimension is aliased twice and the pair key
    * only exists after both legs resolve. Supplier/nation legs
    * broadcast at any SF; orders⋈lineitem on the order key is the one
    * wide exchange, the (nation × nation) rollup is tiny.
    */
  def tradeMatrix(t: Tables): DataFrame = {
    val suppNation = t.supplier
      .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val custNation = t.customer
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    t.lineitem
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(t.orders.select("o_orderkey", "o_custkey"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(custNation), col("o_custkey") === col("c_custkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy("supp_nation", "cust_nation")
      .agg(
        Num.moneySum4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("volume"),
        count(lit(1)).as("n_items")
      )
      .orderBy("supp_nation", "cust_nation")
  }

  /** B43: TPC-H Q8-style market share — one nation's supplier revenue
    * vs everyone's, per order year, inside one region's customer
    * market. Emits the num/den decimal pair (B34's convention) instead
    * of the non-portable float share. Same two-path topology as
    * [[tradeMatrix]] plus the region restriction on the CUSTOMER side
    * and a conditional numerator on the SUPPLIER side.
    */
  def marketShare(t: Tables, nation: String = "NATION_3", region: String = "AMERICA"): DataFrame = {
    val suppNation = t.supplier
      .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val regionCust = t.customer
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === region)
      .select(col("c_custkey"))
    val revenue = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    t.lineitem
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(t.orders.select("o_orderkey", "o_custkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(regionCust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).as("order_year"))
      .agg(
        Num.moneySum4(when(col("supp_nation") === nation, revenue).otherwise(lit(0.0)))
          .as("nation_revenue"),
        Num.moneySum4(revenue).as("total_revenue"),
        count(lit(1)).as("n_items")
      )
      .orderBy("order_year")
  }

  /** B45: per-group argmax — each brand's single highest-revenue part
    * (ties → smallest part key), through the bounded-heap TopKPerKey
    * operator with k=1: the per-group argmax is just top-k's degenerate
    * case, and the custom exec gives it without a per-group sort or a
    * max_by (whose tie behavior is engine-defined — the struct-max
    * trick is deterministic but not portable across engines either;
    * the (revenue desc, key) rank IS). Decimal revenue keeps the
    * ordering exact.
    */
  def topPartPerBrand(t: Tables): DataFrame = {
    val perPart = t.lineitem
      .join(broadcast(t.part.select("p_partkey", "p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_partkey")
      .agg(Num.moneySum4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
    graft.plans.TopK
      .perKey(perPart, Seq("p_brand"), Seq(col("revenue").desc, col("p_partkey")), 1)
      .select("p_brand", "p_partkey", "revenue")
      .orderBy("p_brand")
  }

  /** B44: trailing 7-day revenue per day and type — the RANGE-frame
    * window (every other frame in the codebase is ROWS/running): the
    * frame is defined by a VALUE interval over the ordered day, so
    * missing days shorten the window instead of silently widening it
    * to 7 physical rows (the classic rows-frame bug on sparse series).
    * Window-on-aggregate again: only the (days × types) grid pays the
    * frame, and the range sum is decimal → order-independent.
    */
  def trailingRevenue(t: Tables, days: Int = 7): DataFrame = {
    val daily = t.events
      .filter(col("event_type") === "purchase" || col("event_type") === "view")
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(Num.moneySum(col("value")).as("day_value"))
    val w = Window
      .partitionBy("event_type")
      .orderBy(col("day").cast("long"))
      .rangeBetween(-(days - 1).toLong * 86400L, 0L)
    daily
      .withColumn(
        "trailing_value",
        sum(col("day_value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .over(w)
          .cast("double")
      )
      .orderBy("event_type", "day")
  }

  /** B41: week-over-week traffic — each (type, week)'s count beside
    * the previous week's, the growth-dashboard staple. The
    * window-on-aggregate pattern again (B26): the fact collapses to
    * the tiny (weeks × types) grid FIRST, only the grid pays the lag
    * window; the ratio is left to the consumer (integer cur/prev
    * columns are bit-exact, a growth-percent double is not).
    */
  def weeklyGrowth(t: Tables): DataFrame = {
    val weekly = t.events
      .groupBy(date_trunc("week", col("ts")).as("week"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    val w = Window.partitionBy("event_type").orderBy("week")
    weekly
      .withColumn("prev_events", lag("n_events", 1).over(w))
      .filter(col("prev_events").isNotNull)
      .select("event_type", "week", "n_events", "prev_events")
      .orderBy("event_type", "week")
  }

  def promoRevenueByMonth(t: Tables): DataFrame = {
    val p       = t.part.select(col("p_partkey"), (col("p_type") === "PROMO").as("is_promo"))
    val revenue = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    t.lineitem
      .select("l_partkey", "l_extendedprice", "l_discount", "l_shipdate")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(date_trunc("month", col("l_shipdate")).as("ship_month"))
      .agg(
        Num.moneySum4(when(col("is_promo"), revenue).otherwise(lit(0.0))).as("promo_revenue"),
        Num.moneySum4(revenue).as("total_revenue"),
        count(lit(1)).as("n_items")
      )
      .orderBy("ship_month")
  }

  /** B52: unpivot/melt — the wide→long inverse of [[eventTypePivot]],
    * completing the reshape pair: per-flag metric COLUMNS become
    * (metric, value) ROWS. Spark's native `unpivot` plans an Expand
    * (one pass, rows × metrics output, no shuffle beyond the feeding
    * aggregate) — the same operator class the rollup/cube family uses,
    * and the shape every metrics-export/long-format-ML step needs.
    * Everything lands in one double value column, so the decimal sums
    * are cast once and the count rides along as a double.
    */
  def unpivotMetrics(t: Tables): DataFrame = {
    val wide = t.lineitem
      .groupBy("l_returnflag")
      .agg(
        Num.moneySum(col("l_quantity")).as("sum_qty"),
        Num.moneySum(col("l_extendedprice")).as("sum_price"),
        count(lit(1)).cast("double").as("n_lines")
      )
    wide
      .unpivot(
        Array(col("l_returnflag")),
        Array(col("sum_qty"), col("sum_price"), col("n_lines")),
        "metric",
        "metric_value"
      )
      .orderBy("l_returnflag", "metric")
  }

  /** B53: incremental view maintenance — merge a DELTA's aggregation
    * state into a BASE's without rescanning base rows (the refresh
    * path of every materialized rollup: keep (count, decimal sum) per
    * group, combine states, finalize). At 100 TB the base state is
    * group-cardinality-sized while the base TABLE is petabytes — the
    * merge touches only the former. The gate proves state-merge =
    * full recompute: the oracle aggregates the whole table directly,
    * so equality shows the decomposition is lossless (decimal sums
    * and counts are the canonical commutative-monoid pair; avg/float
    * would NOT merge losslessly, which is why the state carries
    * sum+count, never avg).
    */
  def incrementalAgg(t: Tables): DataFrame = {
    def state(df: DataFrame): DataFrame = df
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2))).as("s")
      )
    val base  = t.events.filter(col("event_id") % 5 =!= 0)
    val delta = t.events.filter(col("event_id") % 5 === 0)
    state(base)
      .unionByName(state(delta))
      .groupBy("event_type")
      .agg(sum(col("n")).as("n_events"), sum(col("s")).cast("double").as("sum_value"))
      .orderBy("event_type")
  }

  /** B54: winsorization — clip each type's values into its own
    * [p1, p99] band before summing, the standard heavy-tail tamer for
    * ML feature pipelines (drop-the-outlier distorts counts; clipping
    * keeps every row but bounds its leverage). The cutpoints are
    * DISCRETE (the value at rank ⌈q·n⌉, a real data point), not
    * interpolated percentiles: clipped rows carry the cutpoint itself
    * into the decimal sum, and an interpolated cut is an arithmetic
    * double whose last ulp differs across engines — measured flipping
    * the 2-decimal rounding of ~200 clipped rows at sf0.1. A rank-
    * selected value is bit-identical everywhere. Cutpoints come from
    * two-pass histogram selection (no fact-wide sort — see the inline
    * note), broadcast back, and the rollup partial-aggregates.
    */
  def winsorized(t: Tables): DataFrame = {
    // Rank-discrete cutpoint selection WITHOUT sorting the fact: the
    // obvious row_number window shuffles and sorts every row through a
    // per-type reducer (the serial dimension at corpus scale). Instead,
    // classic two-pass selection: (1) a map-side unit-bucket histogram
    // (types × value-range rows — tiny) locates each target rank's
    // boundary bucket by cumulative count; (2) only the boundary
    // bucket's rows — a broadcast-pruned sliver of the fact — get
    // ranked for the residual offset. Three fact SCANS, zero fact
    // shuffles or sorts; bucket-local (value, event_id) order restricted
    // to one bucket equals the global order there, so the selected
    // values are IDENTICAL to the windowed form (same oracle).
    val ev   = t.events.select(col("event_type"), col("value"), col("event_id"))
    val hist = ev
      .groupBy(col("event_type").as("h_type"), floor(col("value")).as("bucket"))
      .agg(count(lit(1)).as("c"))
    val wb = Window
      .partitionBy("h_type")
      .orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum    = hist.withColumn("cum_before", coalesce(sum(col("c")).over(wb), lit(0L)))
    val totals = hist.groupBy(col("h_type").as("n_type")).agg(sum(col("c")).as("n"))
    val targets = totals
      .select(
        col("n_type"),
        explode(
          array(
            struct(lit("lo").as("which"), ceil(col("n") * 0.01).cast("long").as("r")),
            struct(lit("hi").as("which"), ceil(col("n") * 0.99).cast("long").as("r"))
          )
        ).as("t")
      )
      .select(col("n_type"), col("t.which").as("which"), col("t.r").as("r"))
    val bounds = targets
      .join(
        cum,
        col("n_type") === col("h_type") &&
          col("cum_before") < col("r") && col("r") <= col("cum_before") + col("c")
      )
      .select(col("n_type"), col("which"), col("bucket"), (col("r") - col("cum_before")).as("residual"))
    val slice = ev.join(
      broadcast(bounds),
      col("event_type") === col("n_type") && floor(col("value")) === col("bucket")
    )
    val ws = Window.partitionBy("event_type", "which").orderBy(col("value"), col("event_id"))
    val cuts = slice
      .withColumn("rn", row_number().over(ws))
      .filter(col("rn") === col("residual"))
      .groupBy(col("event_type").as("c_type"))
      .agg(
        max(when(col("which") === "lo", col("value"))).as("lo"),
        max(when(col("which") === "hi", col("value"))).as("hi")
      )
    t.events
      .join(broadcast(cuts), col("event_type") === col("c_type"))
      .select(
        col("event_type"),
        col("value"),
        when(col("value") < col("lo"), col("lo"))
          .when(col("value") > col("hi"), col("hi"))
          .otherwise(col("value"))
          .as("wv"),
        (col("value") < col("lo") || col("value") > col("hi")).as("clipped")
      )
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        Num.moneySum(col("value")).as("sum_raw"),
        Num.moneySum(col("wv")).as("sum_winsorized"),
        sum(when(col("clipped"), 1L).otherwise(0L)).as("n_clipped")
      )
      .orderBy("event_type")
  }

  /** B47: TPC-H Q9-style profit matrix — revenue by (supplier nation,
    * order year) restricted to one product family (name-substring
    * filter; the reference schema has no partsupp/supplycost, so the
    * analog keeps Q9's four-way star topology and drops the cost
    * subtraction). The part filter lands BEFORE the join as a
    * broadcast of the ~1/6 matching keys, so the lineitem scan is
    * pruned by the dimension predicate — the only wide exchange is
    * lineitem⋈orders on the order key; supplier/nation broadcast.
    */
  def profitMatrix(t: Tables, namePattern: String = "%gear%"): DataFrame = {
    val gearParts = t.part.filter(col("p_name").like(namePattern)).select("p_partkey")
    val suppNation = t.supplier
      .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    t.lineitem
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(broadcast(gearParts), col("l_partkey") === col("p_partkey"))
      .join(t.orders.select("o_orderkey", "o_orderdate"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("supp_nation"), year(col("o_orderdate")).as("order_year"))
      .agg(
        Num.moneySum4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("profit"),
        count(lit(1)).as("n_items")
      )
      .orderBy("supp_nation", "order_year")
  }

  /** B48: TPC-H Q11-style important parts — each part's shipped value
    * from one nation's suppliers, kept only when it exceeds a multiple
    * of the MEAN part value (Q11's global-threshold scalar subquery;
    * the mean-relative threshold keeps selectivity stable across SFs
    * where Q11's fixed fraction would pass everything at small SF and
    * nothing at large). The per-part aggregate is computed ONCE and
    * the single-row global reduction of it is broadcast back — the
    * fact is scanned once, the threshold join is a BroadcastNestedLoop
    * over one row, and both engines derive the double threshold from
    * the identical exact-decimal total, so the boundary compare is
    * bit-reproducible.
    */
  def importantParts(t: Tables, nation: String = "NATION_12", mult: Double = 1.1): DataFrame = {
    val nationSupp = t.supplier
      .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
      .filter(col("n_name") === nation)
      .select("s_suppkey")
    val perPart = t.lineitem
      .select("l_partkey", "l_suppkey", "l_extendedprice")
      .join(broadcast(nationSupp), col("l_suppkey") === col("s_suppkey"))
      .groupBy("l_partkey")
      .agg(Num.moneySum(col("l_extendedprice")).as("part_value"))
    val threshold = perPart.agg(
      (Num.moneySum(col("part_value")) / count(lit(1)) * lit(mult)).as("threshold")
    )
    perPart
      .join(broadcast(threshold))
      .filter(col("part_value") > col("threshold"))
      .select("l_partkey", "part_value")
      .orderBy("l_partkey")
  }

  /** B49: TPC-H Q17-style small-quantity revenue — per brand, the
    * revenue locked in lineitems whose quantity is below 20% of that
    * PART's average quantity (the "small orders below reorder volume"
    * report). The per-part average is an aggregate joined BACK by
    * broadcast — that re-reads the pruned 3-column fact, which at scale
    * is cheaper than the single-scan alternative (a partkey window
    * shuffles the ENTIRE fact; the agg path shuffles only map-side
    * partials and broadcasts the part-sized result). The average is the
    * exact decimal sum over an int count → the 0.2× boundary compare
    * reproduces bit-identically in the oracle.
    */
  def smallQtyRevenue(t: Tables): DataFrame = {
    val brandOf = t.part.select("p_partkey", "p_brand")
    val fact = t.lineitem
      .select("l_partkey", "l_quantity", "l_extendedprice")
      .join(broadcast(brandOf), col("l_partkey") === col("p_partkey"))
    val perPartAvg = fact
      .groupBy(col("p_partkey").as("a_partkey"))
      .agg((Num.moneySum(col("l_quantity")) / count(lit(1))).as("avg_qty"))
    fact
      .join(broadcast(perPartAvg), col("p_partkey") === col("a_partkey"))
      .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .groupBy("p_brand")
      .agg(
        Num.moneySum(col("l_extendedprice")).as("small_qty_revenue"),
        count(lit(1)).as("n_small_lines")
      )
      .orderBy("p_brand")
  }

  /** B50: TPC-H Q21-style waiting-suppliers — per supplier, the count
    * of finalized orders where that supplier was the ONLY one with a
    * returned line while other suppliers also shipped on the order
    * (returnflag stands in for the missing commit/receipt dates; the
    * exists / not-exists correlation is intact). Q21's two correlated
    * self-joins collapse into ONE shuffle of lineitem on the order key:
    * the per-order supplier set and returned-supplier set are
    * collect_set aggregates, and "exists another ∧ not exists another
    * failing" is just size(returned)=1 ∧ size(all)>1 — order-set
    * membership is commutative, so the nondeterministic collect order
    * never leaks. The orders join lands on the same orderkey
    * partitioning; supplier/nation broadcast at the end.
    */
  def waitingSuppliers(t: Tables): DataFrame = {
    val perOrder = t.lineitem
      .select("l_orderkey", "l_suppkey", "l_returnflag")
      .groupBy("l_orderkey")
      .agg(
        collect_set(col("l_suppkey")).as("supps"),
        collect_set(when(col("l_returnflag") === "R", col("l_suppkey"))).as("returned")
      )
      .filter(size(col("returned")) === 1 && size(col("supps")) > 1)
      .select(col("l_orderkey"), col("returned").getItem(0).as("s_key"))
    val finalized = t.orders.filter(col("o_orderstatus") === "F").select("o_orderkey")
    val suppName = t.supplier
      .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
    perOrder
      .join(finalized, col("l_orderkey") === col("o_orderkey"))
      .groupBy("s_key")
      .agg(count(lit(1)).as("numwait"))
      .join(broadcast(suppName), col("s_key") === col("s_suppkey"))
      .select(col("s_name"), col("n_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
  }

  /** B55: TPC-H Q2-style min-cost supplier — for each part in a size
    * bracket, the cheapest offer from any supplier in ONE region
    * (the schema has no partsupp/ps_supplycost, so the supplier's
    * minimum extended price for the part stands in as the offer; the
    * region-constrained correlated-argmin topology is intact). Ties →
    * smallest supplier key, Q2's deterministic tiebreak.
    *
    * The (part, supplier) offer table is ONE lineitem shuffle (both
    * dims broadcast-pruned BEFORE it, so the fact scan only keeps
    * region-supplier × sized-part rows); the per-part argmin runs
    * through the bounded-heap TopKPerKey exec (k = 1, no per-group
    * sort); the name join-back broadcasts. Decimal offers end to end —
    * the argmin compare and the output hash are both exact.
    */
  def minCostSupplier(
      t: Tables,
      region: String = "ASIA",
      sizes: Seq[Int] = Seq(15, 25, 35)
  ): DataFrame = {
    val regionSupp = t.supplier
      .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
      .join(
        broadcast(t.region.filter(col("r_name") === region)),
        col("n_regionkey") === col("r_regionkey")
      )
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
    val sizedParts =
      t.part.filter(col("p_size").isin(sizes: _*)).select("p_partkey", "p_brand", "p_size")
    val offers = t.lineitem
      .select("l_partkey", "l_suppkey", "l_extendedprice")
      .join(broadcast(sizedParts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(regionSupp.select("s_suppkey")), col("l_suppkey") === col("s_suppkey"))
      // ONE exchange for aggregate + argmin: hash-partitioning on
      // p_partkey alone satisfies the aggregate's clustering on the
      // full (part, brand, size, supplier) key (subset rule) AND
      // TopKPerKey's per-part distribution — grouping directly would
      // shuffle on all four keys and force a second exchange for the
      // argmin. Partial aggregation still combines map-side first.
      .repartition(col("p_partkey"))
      .groupBy("p_partkey", "p_brand", "p_size", "l_suppkey")
      .agg(
        min(col("l_extendedprice").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .as("offer")
      )
    graft.plans.TopK
      .perKey(offers, Seq("p_partkey"), Seq(col("offer").asc, col("l_suppkey").asc), 1)
      .join(broadcast(regionSupp), col("l_suppkey") === col("s_suppkey"))
      .select(
        col("p_partkey"),
        col("p_brand"),
        col("p_size"),
        col("s_name"),
        col("n_name"),
        col("offer").cast("double").as("best_offer")
      )
      .orderBy("p_partkey")
  }

  /** B56: TPC-H Q16-style supplier variety — distinct suppliers able
    * to supply each (brand, size), excluding one brand and the
    * "complaint" suppliers (suppkey % 7 = 0 stands in for Q16's
    * `LIKE '%%Customer%%Complaints%%'` subquery; the NOT-IN shape is a
    * LEFT ANTI join, never a collected driver-side list — at scale the
    * complaint set is a table, not an IN-list).
    *
    * Two-phase distinct (B5b's pattern): the (brand, size, supplier)
    * triple pre-dedupes on its full composite key spreading work over
    * all partitions, then the count stage is a plain partial-agg'd
    * count — no Expand, no per-group distinct state.
    */
  def supplierVariety(t: Tables, excludeBrand: String = "Brand#7"): DataFrame = {
    val complaints = t.supplier.filter(col("s_suppkey") % 7 === 0).select("s_suppkey")
    val parts = t.part
      .filter(col("p_brand") =!= excludeBrand)
      .select("p_partkey", "p_brand", "p_size")
    t.lineitem
      .select("l_partkey", "l_suppkey")
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(complaints), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .select("p_brand", "p_size", "l_suppkey")
      .distinct()
      .groupBy("p_brand", "p_size")
      .agg(count(lit(1)).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_size"))
  }

  /** B57: TPC-H Q20-style excess shippers — suppliers who DOMINATE
    * some part in a product family: their shipped quantity exceeds
    * 15% of the part's total across all suppliers, >15× the fair
    * share of this fixture's ~100-supplier spread (Q20's
    * `availqty > ½·Σshipped` re-expressed on the shipped side; the
    * aggregate-then-semi-join chain is intact — dominance is a
    * property of the per-(part, supplier) AGGREGATE, not any row).
    * The fraction compare is cross-multiplied decimals
    * (20·qty > 3·total) — no division, exact at the boundary.
    *
    * ONE lineitem shuffle builds the (part, supplier) quantity table;
    * the per-part total is a RE-AGGREGATION of that same aggregate, so
    * the second branch reuses the first's exchange (ReusedExchange —
    * the fact is scanned once); totals broadcast back; supplier/nation
    * names broadcast onto the tiny qualifying set.
    */
  def excessShippers(t: Tables, namePattern: String = "%bolt%"): DataFrame = {
    val famParts = t.part.filter(col("p_name").like(namePattern)).select("p_partkey")
    val pairs = t.lineitem
      .select("l_partkey", "l_suppkey", "l_quantity")
      // explicit null guard: the final supplier join infers
      // isnotnull(l_suppkey) into ONE branch's scan, desyncing the two
      // exchange subtrees and silencing ReusedExchange — pinning the
      // constraint at the shared source keeps both branches canonical
      .filter(col("l_partkey").isNotNull && col("l_suppkey").isNotNull)
      .join(broadcast(famParts), col("l_partkey") === col("p_partkey"))
      .groupBy("p_partkey", "l_suppkey")
      .agg(
        sum(col("l_quantity").cast(org.apache.spark.sql.types.DecimalType(18, 2))).as("qty")
      )
    val totals = pairs
      .groupBy(col("p_partkey").as("t_partkey"))
      .agg(sum(col("qty")).as("total_qty"))
    val dominant = pairs
      .join(broadcast(totals), col("p_partkey") === col("t_partkey"))
      .filter(col("qty") * 20 > col("total_qty") * 3)
      .groupBy("l_suppkey")
      .agg(count(lit(1)).as("n_parts_dominated"))
    val suppName = t.supplier
      .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_name", "n_name")
    dominant
      .join(broadcast(suppName), col("l_suppkey") === col("s_suppkey"))
      .select("s_name", "n_name", "n_parts_dominated")
      .orderBy("s_name")
  }

  /** B59: per-group heavy hitters — users whose event count within
    * their type exceeds `liftNum/liftDen` × the type's mean
    * (count·n_users > lift·total, cross-multiplied integers — a
    * share-of-group double would put boundary users on different
    * sides per engine). The RELATIVE threshold is what makes this a
    * heavy-hitter detector rather than a top-k: the qualifying set is
    * empty when the group is uniform and grows exactly with skew.
    *
    * One keyed shuffle builds the (type, user) counts; the per-type
    * totals RE-AGGREGATE that aggregate (ReusedExchange — the fact is
    * scanned once) and broadcast back. Complements the Misra-Gries
    * sketch path (C29's frequent words): this is the exact form for
    * when the group-key cardinality is shuffle-able; the sketch is for
    * when it isn't.
    */
  def heavyHitters(t: Tables, liftNum: Int = 13, liftDen: Int = 10): DataFrame = {
    val counts = t.events
      .groupBy("event_type", "user_id")
      .agg(count(lit(1)).as("n_events"))
    val totals = counts
      .groupBy(col("event_type").as("tt"))
      .agg(sum(col("n_events")).as("total"), count(lit(1)).as("n_users"))
    counts
      .join(broadcast(totals), col("event_type") === col("tt"))
      .filter(col("n_events") * col("n_users") * liftDen > col("total") * liftNum)
      .select("event_type", "user_id", "n_events")
      .orderBy("event_type", "user_id")
  }

  /** B66: behavioral-signature histogram — each user's DISTINCT event
    * types collapse to one canonical string (sorted, '|'-joined) and
    * the corpus reduces to signature → (user-days, events); the unit is the user-DAY (whole-history signatures saturate to the full type set). Grouped
    * concatenation is the classic determinism trap: a bare
    * listagg/collect_list is partition-order-dependent and can never
    * hash-gate (or reproduce between two runs of the same job) — the
    * order-safe form is collect_SET + array_sort + array_join, which
    * stays partial-aggregable (sets merge map-side) and yields one
    * canonical value on any cluster. Two keyed shuffles, both on
    * shrinking data (users, then signatures ≤ 2^|types|).
    */
  def userSignatures(t: Tables): DataFrame =
    t.events
      .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .agg(
        array_join(array_sort(collect_set(col("event_type"))), "|").as("type_signature"),
        count(lit(1)).as("n_events"))
      .groupBy("type_signature")
      .agg(count(lit(1)).as("n_user_days"), sum("n_events").as("n_events"))
      .orderBy("type_signature")

  /** B68: Pareto frontier (2D skyline) of parts on (price ↓, size ↑) —
    * "no other part is at least as big AND cheaper": the
    * multi-objective shortlist (cost vs capability) a plain ORDER BY
    * cannot express, and whose textbook form is an O(n²) NOT EXISTS
    * self-join.
    *
    * The scale hinge is that ONE dimension is domain-bounded (sizes —
    * like C24's value-domain histogram): any non-min-price part at a
    * given size is dominated by that size's min-price part, so the
    * frontier is a subset of the per-size argmin rows. That collapses
    * the corpus to ≤ |size domain| candidates in one partial-agg'd
    * shuffle; the cross-size dominance test is a running strict-min
    * window over the TINY candidate set (never a window over the
    * fact), and the membership join back for counts/witness is a
    * broadcast. Price doubles are min/filter-only passthroughs —
    * engine-stable to hash (B23's rule).
    */
  def paretoParts(t: Tables): DataFrame = {
    val perSize = t.part.groupBy("p_size").agg(min("p_retailprice").as("best_price"))
    val largerSizes = Window.orderBy(col("p_size").desc).rowsBetween(Window.unboundedPreceding, -1)
    val frontier = perSize
      .withColumn("min_larger", min("best_price").over(largerSizes))
      .filter(col("min_larger").isNull || col("best_price") < col("min_larger"))
      .select(col("p_size").as("f_size"), col("best_price"))
    t.part
      .join(
        broadcast(frontier),
        col("p_size") === col("f_size") && col("p_retailprice") === col("best_price"))
      .groupBy(col("p_size"), col("p_retailprice").as("frontier_price"))
      .agg(count(lit(1)).as("n_parts"), min("p_partkey").as("witness_partkey"))
      .orderBy("p_size")
  }
}
