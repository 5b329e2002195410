package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark has no built-in form of: as-of join
  * and interval (range) join. Both are re-expressed as ONE equi-join
  * shuffle so they survive 100 TB — never a broadcast-nested-loop,
  * which is what a naive `a.join(b, rangePredicate)` plans to.
  *
  * Reference tie-in: the Kinesis demo correlates records by user and
  * arrival order (lambda_count/lcount.go keys pages off the latest
  * settings row per topic); these operators are the general forms of
  * "latest prior fact per key" and "facts within a key'd time window".
  */
object Temporal {

  private val HourUs = 3600L * 1000000L

  /** LEFT as-of: like [[asofPriorClick]] but purchases with NO prior
    * click survive with null click columns (the outer-join form a
    * feature-backfill pipeline wants: every fact row keeps its latest
    * dimension state, present or not). Same single-shuffle plan — the
    * outer semantics fall out of simply not filtering the null carry.
    * The nullable click time is emitted as epoch MICROS (bigint), not
    * a timestamp: nullable timestamps hit engine-dependent NaT unit
    * representations in the comparison harness.
    */
  def asofPriorClickLeft(t: Tables): DataFrame =
    asofImpl(t, keepUnmatched = true)

  /** As-of join (inner): for every purchase event, the most recent
    * click by the same user at-or-before the purchase timestamp; see
    * [[asofImpl]] for the plan and tie-break analysis.
    */
  def asofPriorClick(t: Tables): DataFrame =
    asofImpl(t, keepUnmatched = false)

  /** Spark-first realization of an operator the engine lacks: instead
    * of a per-row subquery or an inequality join (BNLJ — n² per user),
    * union-tag both sides and carry the latest click forward with one
    * running `last(_, ignoreNulls)` window:
    *
    *   - clicks sort BEFORE purchases at equal ts (tag 0 < 1), so
    *     "at-or-before" is exact;
    *   - within equal (ts, tag) the window order ends on the largest
    *     event_id, making the carried struct deterministic;
    *   - cost: ONE shuffle on user_id + a linear scan per user — the
    *     optimal distributed as-of plan. Skewed users stream through a
    *     running window (no per-row buffering; rowsBetween is a
    *     constant-memory frame).
    */
  private def asofImpl(t: Tables, keepUnmatched: Boolean): DataFrame =
    asofOn(t.events, keepUnmatched)

  /** The as-of kernel over any frame with (event_id, ts, user_id,
    * event_type) — exposed so specs can drive tie-heavy crafted inputs
    * (the corpus has no equal timestamps, which is exactly where the
    * tag/event_id tie-break must be exercised).
    */
  def asofOn(events: DataFrame, keepUnmatched: Boolean): DataFrame = {
    val e = events.select("event_id", "ts", "user_id", "event_type")
    val clicks = e
      .filter(col("event_type") === "click")
      .select(
        col("user_id"),
        col("ts"),
        col("event_id"),
        lit(0).as("tag"),
        struct(col("ts").as("c_ts"), col("event_id").as("c_id")).as("c")
      )
    val purchases = e
      .filter(col("event_type") === "purchase")
      .select(
        col("user_id"),
        col("ts"),
        col("event_id"),
        lit(1).as("tag"),
        lit(null).cast("struct<c_ts:timestamp,c_id:bigint>").as("c")
      )
    val w = Window
      .partitionBy("user_id")
      .orderBy(col("ts"), col("tag"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched =
      if (keepUnmatched) col("tag") === 1
      else col("tag") === 1 && col("last_click").isNotNull
    clicks
      .unionByName(purchases)
      .withColumn("last_click", last("c", ignoreNulls = true).over(w))
      .filter(matched)
      .select(
        col("event_id"),
        col("user_id"),
        col("ts"),
        col("last_click.c_id").as("click_event_id"),
        (if (keepUnmatched) unix_micros(col("last_click.c_ts")).as("click_ts_us")
         else col("last_click.c_ts").as("click_ts")),
        (unix_micros(col("ts")) - unix_micros(col("last_click.c_ts"))).as("gap_us")
      )
      .orderBy("event_id")
  }

  /** Bounded-staleness as-of (inner): like [[asofPriorClick]] but the
    * carried click must be FRESH — at most `maxGapHours` old at
    * purchase time. This is the feature-freshness contract of every
    * online feature store ("use the latest value, unless it is too
    * stale to trust"). Because the as-of carry picks the CLOSEST prior
    * click, filtering the carried gap is exact: if the latest click is
    * stale, every earlier one is staler. Same single-shuffle kernel +
    * a codegen'd filter — no second window, no join.
    */
  def asofPriorClickFresh(t: Tables, maxGapHours: Long = 24L): DataFrame =
    asofOn(t.events, keepUnmatched = false)
      .filter(col("gap_us") <= maxGapHours * HourUs)

  /** FORWARD as-of (inner): for every purchase, the EARLIEST click by
    * the same user at-or-after the purchase timestamp — the funnel
    * direction ("next action after X") of the backward kernel above.
    * Same single-shuffle union-tag plan, mirrored by REVERSING the sort
    * (ts desc, tag desc, event_id desc) so the forward carry becomes a
    * running `last(_, ignoreNulls)` over unboundedPreceding → currentRow
    * — Spark executes that frame with a constant-memory running
    * accumulator (O(k) per partition), whereas a currentRow →
    * unboundedFollowing frame re-evaluates the aggregate from each row
    * to partition end (O(k²) per user). In the reversed order a click at
    * equal ts sorts BEFORE the purchase (tag 1 desc ahead of 0), so
    * "at-or-after" stays exact, and the running last() lands on the
    * smallest (ts, event_id) click ≥ the purchase — ties at equal click
    * ts still resolve to the smallest click event_id.
    */
  def asofNextClick(t: Tables): DataFrame = {
    val e = t.events.select("event_id", "ts", "user_id", "event_type")
    val clicks = e
      .filter(col("event_type") === "click")
      .select(
        col("user_id"),
        col("ts"),
        col("event_id"),
        lit(1).as("tag"),
        struct(col("ts").as("c_ts"), col("event_id").as("c_id")).as("c")
      )
    val purchases = e
      .filter(col("event_type") === "purchase")
      .select(
        col("user_id"),
        col("ts"),
        col("event_id"),
        lit(0).as("tag"),
        lit(null).cast("struct<c_ts:timestamp,c_id:bigint>").as("c")
      )
    val w = Window
      .partitionBy("user_id")
      .orderBy(col("ts").desc, col("tag").desc, col("event_id").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    purchases
      .unionByName(clicks)
      .withColumn("next_click", last("c", ignoreNulls = true).over(w))
      .filter(col("tag") === 0 && col("next_click").isNotNull)
      .select(
        col("event_id"),
        col("user_id"),
        col("ts"),
        col("next_click.c_id").as("click_event_id"),
        col("next_click.c_ts").as("click_ts"),
        (unix_micros(col("next_click.c_ts")) - unix_micros(col("ts"))).as("gap_us")
      )
      .orderBy("event_id")
  }

  /** B14d: NEAREST as-of (inner): for every purchase, the closest
    * click in EITHER direction — the "nearest observation" join of
    * sensor/feature alignment, where backward-only (B14) biases
    * toward stale state and forward-only (B14b) toward lookahead.
    * Ties (equal gap, including a click AT the purchase instant)
    * resolve to the PRIOR side.
    *
    * Composes the two carries in ONE user_id exchange: both windows
    * share the hash partitioning (only the in-partition sort order
    * differs — Spark re-sorts locally, it does not re-shuffle), the
    * backward carry under (ts, clickFirst, id) and the forward carry
    * under the reversed order, then a codegen'd projection picks the
    * smaller integer-µs gap. Tie conventions inherited from the
    * kernels: equal-ts clicks resolve to the largest id on the prior
    * side, smallest on the next side — both pinned by the oracle.
    */
  def asofNearestClick(t: Tables): DataFrame = asofNearestOn(t.events)

  /** The nearest-as-of kernel over any events-shaped frame — exposed
    * (like [[asofOn]]) so specs can drive tie-heavy crafted inputs.
    */
  def asofNearestOn(events: DataFrame): DataFrame = {
    val e = events.select("event_id", "ts", "user_id", "event_type")
    val clicks = e
      .filter(col("event_type") === "click")
      .select(
        col("user_id"),
        col("ts"),
        col("event_id"),
        lit(0).as("clickFirst"),
        struct(col("ts").as("c_ts"), col("event_id").as("c_id")).as("c")
      )
    val purchases = e
      .filter(col("event_type") === "purchase")
      .select(
        col("user_id"),
        col("ts"),
        col("event_id"),
        lit(1).as("clickFirst"),
        lit(null).cast("struct<c_ts:timestamp,c_id:bigint>").as("c")
      )
    val bw = Window
      .partitionBy("user_id")
      .orderBy(col("ts"), col("clickFirst"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fw = Window
      .partitionBy("user_id")
      .orderBy(col("ts").desc, col("clickFirst"), col("event_id").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gapPrev = unix_micros(col("ts")) - unix_micros(col("prev_c.c_ts"))
    val gapNext = unix_micros(col("next_c.c_ts")) - unix_micros(col("ts"))
    val usePrev = col("next_c").isNull || (col("prev_c").isNotNull && gapPrev <= gapNext)
    purchases
      .unionByName(clicks)
      .withColumn("prev_c", last("c", ignoreNulls = true).over(bw))
      .withColumn("next_c", last("c", ignoreNulls = true).over(fw))
      .filter(col("clickFirst") === 1 && (col("prev_c").isNotNull || col("next_c").isNotNull))
      .select(
        col("event_id"),
        col("user_id"),
        col("ts"),
        when(usePrev, col("prev_c.c_id")).otherwise(col("next_c.c_id")).as("click_event_id"),
        when(usePrev, col("prev_c.c_ts")).otherwise(col("next_c.c_ts")).as("click_ts"),
        when(usePrev, gapPrev).otherwise(gapNext).as("gap_us"),
        when(usePrev, lit("prior")).otherwise(lit("next")).as("direction")
      )
      .orderBy("event_id")
  }

  /** Interval (range) join: per signup event, activity of the same user
    * inside [signup_ts, signup_ts + 1h). A naive `ts BETWEEN` join has
    * no equi-key and Spark plans BroadcastNestedLoop — quadratic and
    * driver-bound. Instead, bucketize time at the interval width: each
    * signup claims the (at most two) 1-hour epoch buckets its window
    * overlaps, events land in exactly one bucket, and the join becomes
    * an equi-join on (user_id, bucket) with the exact range residual as
    * a cheap post-filter. Candidate pairs are bounded by 2× the true
    * per-bucket co-occurrence — linear in data, never n²; AQE handles
    * hot (user, hour) buckets.
    */
  def signupActivity(t: Tables): DataFrame = {
    val ev = t.events
      .select(col("user_id"), col("ts"), col("value"))
      .withColumn("bucket", floor(unix_micros(col("ts")) / HourUs))
    val signups = t.events
      .filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("user_id").as("s_user"), col("ts").as("s_ts"))
      .withColumn(
        "bucket",
        explode(
          sequence(
            floor(unix_micros(col("s_ts")) / HourUs),
            floor((unix_micros(col("s_ts")) + HourUs) / HourUs)
          )
        )
      )
    signups
      .join(
        ev,
        col("s_user") === col("user_id") && signups("bucket") === ev("bucket") &&
          unix_micros(col("ts")) >= unix_micros(col("s_ts")) &&
          unix_micros(col("ts")) < unix_micros(col("s_ts")) + HourUs
      )
      .groupBy(col("signup_id"), col("user_id"), col("s_ts"))
      .agg(count(lit(1)).as("n_events"), Num.moneySum(col("value")).as("sum_value"))
      .orderBy("signup_id")
  }
}
