package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch twins of the streaming consumption model (the Kinesis side of
  * the reference). The streaming versions live in graft.streaming.
  */
object EventOps {

  /** A10: tumbling 1-hour window counts/sums per event type — the
    * batch twin of the watermarked streaming aggregation. One shuffle
    * on (hour, type), partial-agg'd.
    */
  def hourlyWindow(t: Tables): DataFrame =
    t.events
      .groupBy(date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        Num.moneySum(col("value")).as("sum_value")
      )
      .orderBy("window_start", "event_type")

  /** A10c: HOPPING (sliding) windows — 1-hour windows advancing every
    * 15 minutes, so each event lands in 4 overlapping windows. The
    * batch twin of `window(ts, '1 hour', '15 minutes')` in a streaming
    * agg, and the moving-average shape every monitoring query uses.
    * Spark's `window()` generator emits the (at most size/slide)
    * windows per event map-side; the aggregation stays one partial-
    * agg'd shuffle on (window_start, type) — input inflation is the
    * constant overlap factor, never a self-join on time.
    */
  def hoppingWindow(t: Tables): DataFrame =
    t.events
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), Num.moneySum(col("value")).as("sum_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"),
        col("n_events"),
        col("sum_value")
      )
      .orderBy("window_start", "event_type")

  /** Session windows per user (gap-based): the batch twin of
    * `session_window` in a streaming agg. One shuffle on user_id;
    * Spark merges events into a session while each event starts
    * strictly before the previous event's ts+gap (end-exclusive).
    */
  /** B64: peak session concurrency per day — the max number of user
    * sessions simultaneously open (capacity planning's load curve, and
    * the textbook sweep-line aggregation). A naive sweep is a GLOBAL
    * sort — inherently serial; the scalable decomposition buckets the
    * timeline and splits concurrency into carry_in(bucket) + a
    * running-delta max WITHIN the bucket:
    *
    *  - sessions (A10b semantics: 30-min gap, end = last event + gap,
    *    half-open [start, end)) come from ONE user_id shuffle;
    *  - each session emits (+1 at start, −1 at end) into its DAY
    *    bucket; the within-day running sum needs only a per-day
    *    window — partition size is the day's session count, and at
    *    higher density the bucket narrows to hours with the SAME
    *    carry decomposition (the bucket width is the knob; there is
    *    never a global sort);
    *  - carry_in(D) = sessions spanning D's start — a bounded
    *    `sequence` explode over (start_day, end_day] (multi-day
    *    sessions only), one tiny per-day count;
    *  - peak(D) = carry_in + max(0, max running delta). Exact: at any
    *    instant t in D, concurrency = carry_in + starts≤t − ends≤t,
    *    and tie groups at one timestamp (−1 before +1: half-open
    *    intervals — a session ending exactly when another starts is
    *    NOT concurrent with it) leave the prefix max invariant under
    *    any permutation within equal (ts, delta).
    */
  def peakConcurrency(t: Tables, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts")
    val runW   = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sess = t.events
      .select(col("user_id"), col("ts"))
      .withColumn(
        "new_sess",
        when(lag("ts", 1).over(byUser).isNull ||
          unix_micros(col("ts")) - unix_micros(lag("ts", 1).over(byUser)) >=
            gapMinutes * 60L * 1000000L, 1).otherwise(0))
      .withColumn("sid", sum("new_sess").over(runW))
      .groupBy("user_id", "sid")
      .agg(min("ts").as("start"),
        (max("ts") + expr(s"INTERVAL $gapMinutes MINUTES")).as("end"))
      // session-count-sized, but referenced THREE times below (both
      // delta projections + the carry explode) — materialize once so
      // the events window runs once, not per branch
      .localCheckpoint()
    val deltas = sess
      .select(to_date(col("start")).as("day"), col("start").as("ts"), lit(1).as("delta"))
      .unionAll(sess.select(to_date(col("end")).as("day"), col("end").as("ts"), lit(-1).as("delta")))
    val wDay = Window
      .partitionBy("day")
      .orderBy(col("ts"), col("delta"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dayMax = deltas
      .withColumn("run", sum("delta").over(wDay))
      .groupBy("day")
      .agg(max("run").as("max_run"))
    val carry = sess
      .filter(to_date(col("end")) > to_date(col("start")))
      .select(explode(expr("sequence(date_add(to_date(start), 1), to_date(end))")).as("day"))
      .groupBy("day")
      .agg(count(lit(1)).as("carry"))
    dayMax
      .join(carry, Seq("day"), "full_outer")
      .select(
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        (coalesce(col("carry"), lit(0L)) +
          greatest(lit(0L), coalesce(col("max_run"), lit(0L)))).as("peak_concurrent"))
      .orderBy("day")
  }

  def sessionWindows(t: Tables, gap: String = "30 minutes"): DataFrame =
    t.events
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), Num.moneySum(col("value")).as("sum_value"))
      .select(
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"),
        col("n_events"),
        col("sum_value")
      )
      .orderBy("user_id", "session_start")

  /** A10d: time-series gap filling — the dense hourly series per event
    * type, with missing hours emitted as explicit zero rows (monitoring
    * dashboards, anomaly detectors and window models all need the
    * dense grid; a groupBy alone silently drops empty buckets — the
    * sf0.01 corpus is missing ~34-53 hours per type).
    *
    * ONE events scan, genuinely: referencing the sparse hourly
    * aggregate twice (bounds branch + join-back) re-scans the fact,
    * because column pruning makes the two aggregate subtrees differ
    * and defeats exchange reuse (measured). Instead each type's sparse
    * counts collapse into a per-type map (`map_from_entries`) alongside
    * its bounds in one more tiny aggregation, and the dense grid
    * explodes a codegen `sequence` with an `element_at` lookup — no
    * join back at all. The map is bounded by the TIME SPAN (hours per
    * type), not the corpus size, so carrying it through the explode is
    * O(span²) bytes per type — constant with respect to input scale.
    */
  def gapFillHourly(t: Tables): DataFrame =
    t.events
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n"))
      .groupBy("event_type")
      .agg(
        min("h").as("lo"),
        max("h").as("hi"),
        map_from_entries(collect_list(struct(col("h"), col("n")))).as("counts")
      )
      .select(
        col("event_type"),
        explode(sequence(col("lo"), col("hi"), expr("INTERVAL 1 HOUR"))).as("window_start"),
        col("counts")
      )
      .select(
        col("event_type"),
        col("window_start"),
        coalesce(element_at(col("counts"), col("window_start")), lit(0L)).as("n_events")
      )
      .orderBy("event_type", "window_start")

  /** JSON props extraction (events.props is a JSON string — the
    * Kinesis record payload analog): typed get_json_object, grouped
    * stats on the extracted key.
    */
  def propsExtract(t: Tables): DataFrame =
    t.events
      .select(col("event_type"), get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"), max(col("k")).as("max_k"))
      .orderBy("event_type")

  /** Rolling 7-day active users per day — the WAU curve. Sliding
    * DISTINCT is the hard case: distinct doesn't partial-aggregate
    * across overlapping windows, and the naive form is a range join of
    * every report day against the whole activity table. Instead: (1)
    * pre-distinct to (user, day) — corpus collapses to user-day
    * granularity; (2) each active day covers at most `windowDays`
    * report days, so EXPLODE that constant-size cover (the hopping-
    * window trick applied to distinct), bounded to the data's last
    * day; (3) distinct (user, report_day), then count = distinct
    * users, Expand-free. Inflation is the constant window factor —
    * never |days| × |activity|.
    */
  def rollingActives(t: Tables, windowDays: Int = 7): DataFrame = {
    val userDays = t.events
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .distinct()
    val bounds = userDays.agg(max("day").as("max_day"))
    userDays
      .crossJoin(broadcast(bounds))
      .select(
        col("user_id"),
        explode(
          expr(
            s"sequence(day, least(day + interval ${windowDays - 1} days, max_day), interval 1 day)"
          )
        ).as("report_day")
      )
      .distinct()
      .groupBy("report_day")
      .agg(count(lit(1)).as("active_users"))
      .orderBy("report_day")
  }

  /** B76: ingest burst dedup — collapse retry/replay bursts (same
    * user + type within `toleranceSec`) to their EARLIEST event: the
    * batch cleanup for at-least-once delivery where replays carry
    * fresh event ids and slightly-shifted timestamps, so exact-key
    * dedup (C1) and the streaming content-key dedup (C15) both miss
    * them. A burst is a gap-based micro-session CHAIN (each kept
    * event absorbs everything within the tolerance of its
    * predecessor), which is exactly the sessionization kernel at a
    * seconds-scale gap.
    *
    * ONE shuffle on user_id (the (user, type) grouping rides the
    * same exchange via in-partition sort — partitionBy(user_id)
    * alone, order by (type, ts, id)): lag gap-break per (user, type)
    * run, keep burst openers only. Map-side after the one exchange;
    * output = distinct-burst-sized.
    */
  def eventDedup(t: Tables, toleranceSec: Int = 90): DataFrame = {
    val w     = Window.partitionBy("user_id").orderBy(col("event_type"), col("ts"), col("event_id"))
    val tolUs = toleranceSec * 1000000L
    t.events
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"), col("value"))
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("prev_type", lag("event_type", 1).over(w))
      .withColumn("prev_us", lag("us", 1).over(w))
      .filter(
        col("prev_type").isNull || col("prev_type") =!= col("event_type") ||
          col("us") - col("prev_us") >= tolUs)
      .select("user_id", "event_id", "ts", "event_type", "value")
      .orderBy("event_id")
  }

  /** B72: session journey paths — the ordered event-type path of each
    * gap session (first `maxLen` steps, '>'-joined) histogrammed over
    * the corpus: the clickstream "top user journeys" report, the
    * ORDERED counterpart of both the transition matrix (B29, first-
    * order only) and the signature histogram (B66, order-blind).
    *
    * Ordered grouped concatenation IS hash-gateable when the order is
    * a total one: collect_list gathers structs in ANY partition order
    * (partial-aggregable), `array_sort` imposes the (ts, event_id)
    * total order exactly once per group, and the projection joins the
    * sorted field — the order-safe form of DuckDB's
    * `string_agg(... ORDER BY)`. Sessionization and the in-session
    * rank both run as running frames over the SAME user_id
    * partitioning (cappedSessions' carry trick: rank-in-session =
    * row_number − row_number-at-session-start, no composite-key
    * re-shuffle), so the whole operator is ONE wide shuffle plus two
    * shrinking rollups (sessions, then distinct paths ≤ typesᵐᵃˣᴸᵉⁿ).
    */
  def sessionPaths(t: Tables, gapMinutes: Int = 30, maxLen: Int = 5): DataFrame = {
    val byUser  = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val running = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gapUs   = gapMinutes * 60L * 1000000L
    t.events
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("brk",
        when(lag("us", 1).over(byUser).isNull || col("us") - lag("us", 1).over(byUser) >= gapUs,
          lit(1L)).otherwise(lit(0L)))
      .withColumn("gsid", sum("brk").over(running))
      .withColumn("rn", row_number().over(byUser))
      .withColumn("start_rn",
        last(when(col("brk") === 1L, col("rn")), ignoreNulls = true).over(running))
      .filter(col("rn") - col("start_rn") < maxLen)
      .groupBy("user_id", "gsid")
      .agg(
        array_join(
          expr("transform(array_sort(collect_list(struct(us, event_id, event_type))), x -> x.event_type)"),
          ">").as("path"))
      .groupBy("path")
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy("path")
  }

  /** B30b: sketch-state rolling actives — the 100 TB architecture for
    * B30's curve: one HLL sketch per DAY (Spark's DataSketches
    * `hll_sketch_agg`, a mergeable TypedImperativeAggregate that
    * partial-aggregates map-side), then each report day UNIONS its ≤
    * `windowDays` daily sketches. The exact form explodes every
    * (user, day) row into its 7-day cover — input × window-factor
    * rows through two wide shuffles; here the corpus is touched once
    * (the daily-sketch build) and everything after runs on the
    * DAYS-sized sketch table (KBs per row at any corpus size). This
    * is the Druid/Pinot-style sketch-rollup pattern: store mergeable
    * state at ingest granularity, answer any window by merging.
    * Rows-only in the gate (sketch estimates are library-versioned,
    * not portable SQL); spec pins each estimate against the exact
    * operator's value within HLL error.
    */
  def rollingActivesSketch(t: Tables, windowDays: Int = 7, lgConfigK: Int = 12): DataFrame = {
    val daily = t.events
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id"), lgConfigK).as("sk"))
    val bounds = daily.agg(max("day").as("max_day"))
    daily
      .crossJoin(broadcast(bounds))
      .select(
        col("sk"),
        explode(
          expr(
            s"sequence(day, least(day + interval ${windowDays - 1} days, max_day), interval 1 day)"
          )
        ).as("report_day")
      )
      .groupBy("report_day")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("active_users_est"))
      .orderBy("report_day")
  }

  /** Per-user event-type transition matrix (first-order Markov
    * counts): how often does `prev → next` occur consecutively in a
    * user's history? The behavioral-sequence statistic behind
    * session-flow dashboards and next-action models; per-type COUNTS
    * can't see ordering at all.
    *
    * ONE shuffle on user_id for the lag window (the (ts, event_id)
    * ordering pins ties), then a tiny partial-agg'd rollup — output ≤
    * types², at any input scale.
    */
  /** A10e: capped sessionization — sessions close on a 30-minute
    * inactivity gap OR a 2-hour maximum duration, whichever first.
    * `session_window` (A10b) only has the gap rule; the cap is what
    * keeps a bot that fires every minute for a week from producing one
    * week-long session (analytics convention: GA-style duration cap).
    *
    * ONE shuffle on user_id does all the per-event work as running
    * frames over the same partitioning: lag for the gap break, running
    * sum for the gap-session ordinal, running last(ignoreNulls) to
    * carry the gap-session START (the composite-key window
    * partitionBy(user, gsid) would re-shuffle; the carry does not) —
    * then the cap is a pure map: sub-session = ⌊(ts − start)/cap⌋ in
    * integer microseconds. The final per-session rollup is one
    * partial-agg'd shuffle on the (user, gsid, sub) key. All
    * boundaries are integer-µs arithmetic → bit-exact vs the oracle.
    */
  def cappedSessions(t: Tables, gapMinutes: Int = 30, capMinutes: Int = 120): DataFrame = {
    val byUser  = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val running = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gapUs   = gapMinutes * 60L * 1000000L
    val capUs   = capMinutes * 60L * 1000000L
    t.events
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("brk",
        when(lag("us", 1).over(byUser).isNull || col("us") - lag("us", 1).over(byUser) > gapUs,
          lit(1L)).otherwise(lit(0L)))
      .withColumn("gsid", sum("brk").over(running))
      .withColumn("gstart",
        last(when(col("brk") === 1L, col("us")), ignoreNulls = true).over(running))
      .withColumn("sub", ((col("us") - col("gstart")) / capUs).cast("long"))
      .groupBy("user_id", "gsid", "sub")
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        Num.moneySum(col("value")).as("sum_value")
      )
      .select("user_id", "session_start", "session_end", "n_events", "sum_value")
      .orderBy("user_id", "session_start")
  }

  /** B67: audience-overlap matrix — for every unordered pair of event
    * types, how many distinct users did BOTH (the cross-sell /
    * co-engagement report behind "viewers who also purchase"). A
    * per-type distinct count can't see the intersection; the exact
    * answer needs user-level set intersection.
    *
    * Shape: collapse to distinct (user, type) FIRST (one partial-agg'd
    * shuffle — the postings table), then self-join on user_id with
    * `type_a < type_b`. Both sides are the same subtree hinted
    * shuffle_hash, so they canonicalize to ONE exchange
    * (ReusedExchange — the C2 inverted-index discipline), and per-user
    * inflation is bounded by C(|types|, 2) — a constant, never n².
    * The pair rollup is tiny (≤ types² rows) at any corpus size.
    */
  def audienceOverlap(t: Tables): DataFrame = {
    val ut = t.events.select(col("user_id"), col("event_type")).distinct()
    ut.as("a")
      .join(
        ut.as("b").hint("shuffle_hash"),
        col("a.user_id") === col("b.user_id") && col("a.event_type") < col("b.event_type"))
      .select(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"))
      .groupBy("type_a", "type_b")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("type_a", "type_b")
  }

  /** B69: SCD Type-2 history build — compress each user's event-type
    * stream into validity intervals [valid_from, valid_to), one row
    * per CHANGE of the tracked attribute (consecutive duplicates
    * collapse into the open interval; the newest interval's valid_to
    * is NULL = current). This is the slowly-changing-dimension build
    * every warehouse runs to turn a change feed into a point-in-time
    * joinable dimension.
    *
    * ONE shuffle on user_id: the change detector (lag) and the
    * interval close (lead over the filtered change rows) share the
    * same (user_id, ts, event_id) sort, so Catalyst plans one exchange
    * and the filter between the two Window nodes preserves both the
    * partitioning and the order. Output is change-count-sized — at
    * 100 TB the interval table is as small as the attribute churn.
    * The nullable close edge is emitted as epoch-µs (`valid_to_us`,
    * NULL = current) — the gate convention for nullable instants
    * (asofPriorClickLeft's `click_ts_us`).
    */
  def scd2History(t: Tables): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    t.events
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("prev_type", lag("event_type", 1).over(w))
      .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
      .withColumn("valid_to_us", unix_micros(lead("ts", 1).over(w)))
      .select(
        col("user_id"),
        col("event_type").as("attr_value"),
        col("ts").as("valid_from"),
        col("valid_to_us"))
      .orderBy("user_id", "valid_from")
  }

  def eventTransitions(t: Tables): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
    t.events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag("event_type", 1).over(w))
      .filter(col("prev_type").isNotNull)
      .select(col("prev_type"), col("event_type").as("next_type"))
      .groupBy("prev_type", "next_type")
      .agg(count(lit(1)).as("n_transitions"))
      .orderBy("prev_type", "next_type")
  }

  /** B60: watermark-skew profile — the event-time disorder analysis
    * that SIZES a streaming watermark: per type, how many records
    * arrive after a later-timestamped record has already been seen,
    * the worst observed lateness, and how many would be dropped by a
    * candidate delay. `withWatermark` is a blind guess without exactly
    * this batch profile of the corpus.
    *
    * Arrival order is a deterministic multi-substream interleave (7
    * sub-streams scrambled within each hour — the multi-shard ingest
    * model where each shard is ordered but the merge is not, disorder
    * bounded by the hour): running max event-time over that order is
    * the watermark the stream would carry, lateness = watermark −
    * event-time. ONE shuffle on event_type for the running window,
    * tiny rollup on the same partitioning; all-integer µs so the
    * profile is engine-exact.
    */
  def watermarkSkew(t: Tables, lateThresholdMin: Int = 10): DataFrame = {
    val arrival = Window
      .partitionBy("event_type")
      .orderBy(date_trunc("hour", col("ts")), col("event_id") % 7, col("event_id"))
    val thresholdUs = lateThresholdMin * 60L * 1000000L
    t.events
      .select(col("event_type"), col("event_id"), col("ts"))
      .withColumn("late_us", max(unix_micros(col("ts"))).over(arrival) - unix_micros(col("ts")))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("late_us") > 0, 1L).otherwise(0L)).as("n_out_of_order"),
        max(col("late_us")).as("max_late_us"),
        sum(when(col("late_us") > thresholdUs, 1L).otherwise(0L)).as("n_beyond_watermark")
      )
      .orderBy("event_type")
  }
}
