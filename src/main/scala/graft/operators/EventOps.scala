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
