package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.DataFrame
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
}
