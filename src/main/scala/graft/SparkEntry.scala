package graft

import graft.operators._
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  * Every query key has an `oracleSql` twin in DuckDB dialect unless the
  * operator is approximate/non-SQL-expressible (rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.pricingSummary(Tables(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary"   -> ((s, d) => Analytics.pricingSummary(Tables(s, d))),
    "q3_top_orders"        -> ((s, d) => Analytics.topOrders(Tables(s, d))),
    "q5_region_volume"     -> ((s, d) => Analytics.regionVolume(Tables(s, d))),
    "q_top_events_per_user" -> ((s, d) => Analytics.topEventsPerUser(Tables(s, d))),
    "q_distinct_users"     -> ((s, d) => Analytics.distinctUsers(Tables(s, d))),
    "q_approx_distinct_users" -> ((s, d) => Analytics.approxDistinctUsers(Tables(s, d))),
    "q_adder"              -> ((s, d) => MathOps.adder(Tables(s, d))),
    "q_multiplier"         -> ((s, d) => MathOps.multiplier(Tables(s, d))),
    "q_kinesis_decode"     -> ((s, d) => MathOps.kinesisDecode(Tables(s, d))),
    "q_topic_pagecount"    -> ((s, d) => Paging.topicPageCounts(Tables(s, d))),
    "q_settings_override"  -> ((s, d) => Paging.settingsOverride(Tables(s, d))),
    "q_page_arns"          -> ((s, d) => Paging.pageArns(Tables(s, d), topicId = 1, pageNum = 2)),
    "q_pages_scalable"     -> ((s, d) => Paging.pagesScalable(Tables(s, d))),
    "q_sqs_batches"        -> ((s, d) => Paging.sqsBatches(Tables(s, d), topicId = 1)),
    "q_fanout_payload"     -> ((s, d) => Paging.fanoutPayloads(Tables(s, d), topicId = 1, message = TopicMessage)),
    "q_first_last_page"    -> ((s, d) => Paging.firstLastPageNotifications(Tables(s, d))),
    "q_topic_fanout_count" -> ((s, d) => Paging.topicFanoutCounts(Tables(s, d))),
    "q_hourly_window"      -> ((s, d) => EventOps.hourlyWindow(Tables(s, d))),
    "q_props_extract"      -> ((s, d) => EventOps.propsExtract(Tables(s, d))),
    "q_csv_roundtrip"      -> ((s, d) => Ingest.csvRoundtrip(Tables(s, d))),
    "q_device_gen"         -> ((s, d) => Ingest.deviceGen(Tables(s, d)))
  )

  /** kinesis_topic/main.go:23 — the demo topic payload. */
  val TopicMessage = "THIS IS THIS MESSAGE PAYLOAD THAT WILL GO TO THE USER!!!!!"

  /** DuckDB-dialect oracle for each SQL-expressible query. Column names
    * and row ordering match the Spark plans exactly.
    */
  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(22,4))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_extendedprice*(1.0-l_discount)*(1.0+l_tax) AS DECIMAL(24,6))) AS DOUBLE) AS sum_charge,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)/count(*) AS avg_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)/count(*) AS avg_price,
        |  count(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_top_orders" ->
      """SELECT o.o_orderkey,
        |  CAST(sum(CAST(l.l_extendedprice*(1.0-l.l_discount) AS DECIMAL(22,4))) AS DOUBLE) AS revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |GROUP BY o.o_orderkey
        |ORDER BY revenue DESC, o_orderkey
        |LIMIT 10""".stripMargin,
    "q5_region_volume" ->
      """SELECT r.r_name,
        |  CAST(sum(CAST(l.l_extendedprice*(1.0-l.l_discount) AS DECIMAL(22,4))) AS DOUBLE) AS revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY r.r_name
        |ORDER BY r.r_name""".stripMargin,
    "q_top_events_per_user" ->
      """SELECT user_id, event_id, event_type, value, rnk FROM (
        |  SELECT user_id, event_id, event_type, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rnk
        |  FROM events) t
        |WHERE rnk <= 3
        |ORDER BY user_id, rnk""".stripMargin,
    "q_distinct_users" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    "q_adder" ->
      """SELECT event_id, event_id % 100 AS num1, user_id % 100 AS num2,
        |  concat(event_id % 100, ' + ', user_id % 100, ' = ', event_id % 100 + user_id % 100) AS answer,
        |  concat('add-', md5(concat('add-', CAST(event_id AS VARCHAR)))) AS result_key
        |FROM events ORDER BY event_id""".stripMargin,
    "q_multiplier" ->
      """SELECT event_id, event_id % 100 AS num1, user_id % 100 AS num2,
        |  concat(event_id % 100, ' * ', user_id % 100, ' = ', (event_id % 100) * (user_id % 100)) AS answer,
        |  concat('multi-', md5(concat('multi-', CAST(event_id AS VARCHAR)))) AS result_key
        |FROM events ORDER BY event_id""".stripMargin,
    "q_kinesis_decode" ->
      """SELECT event_id, CAST(user_id AS VARCHAR) AS partition_key,
        |  event_id % 100 AS num1, user_id % 100 AS num2,
        |  event_id % 100 + user_id % 100 AS num_sum
        |FROM events ORDER BY event_id""".stripMargin,
    "q_topic_pagecount" ->
      """SELECT CAST(c.c_nationkey AS BIGINT) AS topic_id, count(*) AS n_devices,
        |  CAST(floor(count(*)/100)+1 AS BIGINT) AS page_count
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_settings_override" ->
      """WITH computed AS (
        |  SELECT o_custkey, CAST(floor(count(*)/100)+1 AS BIGINT) AS computed_pages
        |  FROM orders GROUP BY 1),
        |overrides AS (
        |  SELECT user_id, CAST(floor(min(value)) AS BIGINT) AS override_pages
        |  FROM events WHERE event_type = 'signup' GROUP BY 1)
        |SELECT c.c_custkey,
        |  coalesce(o2.override_pages, c2.computed_pages, 1) AS page_count
        |FROM customer c
        |LEFT JOIN computed c2 ON c.c_custkey = c2.o_custkey
        |LEFT JOIN overrides o2 ON c.c_custkey = o2.user_id
        |ORDER BY c.c_custkey""".stripMargin,
    "q_page_arns" ->
      """WITH d AS (
        |  SELECT o.o_custkey AS user_id, concat('arn:', o.o_orderkey) AS endpoint_arn,
        |         o.o_orderkey AS device_id
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  WHERE c.c_nationkey = 1),
        |r AS (SELECT *, row_number() OVER (ORDER BY user_id, device_id) AS rn FROM d)
        |SELECT rn, user_id, endpoint_arn FROM r
        |WHERE rn > 100 AND rn <= 200 ORDER BY rn""".stripMargin,
    "q_pages_scalable" ->
      """WITH d AS (
        |  SELECT CAST(c.c_nationkey AS BIGINT) AS topic_id, o.o_custkey AS user_id,
        |         o.o_orderkey AS device_id
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        |r AS (SELECT topic_id,
        |        row_number() OVER (PARTITION BY topic_id ORDER BY user_id, device_id) AS rn
        |      FROM d)
        |SELECT topic_id, CAST(floor((rn-1)/100)+1 AS BIGINT) AS page_num, count(*) AS page_rows
        |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_sqs_batches" ->
      """WITH d AS (
        |  SELECT o.o_custkey AS user_id, o.o_orderkey AS device_id
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  WHERE c.c_nationkey = 1),
        |r AS (SELECT *, row_number() OVER (ORDER BY user_id, device_id) AS rn FROM d)
        |SELECT CAST(floor((rn-1)/10) AS BIGINT) AS batch_id, count(*) AS batch_size,
        |  CAST(min(rn) AS BIGINT) AS first_rn, CAST(max(rn) AS BIGINT) AS last_rn
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_fanout_payload" ->
      """WITH d AS (
        |  SELECT o.o_custkey AS user_id, concat('arn:', o.o_orderkey) AS endpoint_arn,
        |         o.o_orderkey AS device_id
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  WHERE c.c_nationkey = 1),
        |r AS (SELECT *, row_number() OVER (ORDER BY user_id, device_id) AS rn FROM d)
        |SELECT rn, endpoint_arn,
        |  base64(encode(concat('arn:', endpoint_arn, '|',
        |    'THIS IS THIS MESSAGE PAYLOAD THAT WILL GO TO THE USER!!!!!'))) AS payload_b64
        |FROM r WHERE rn <= 100 ORDER BY rn""".stripMargin,
    "q_first_last_page" ->
      """WITH pc AS (
        |  SELECT CAST(c.c_nationkey AS BIGINT) AS topic_id,
        |         CAST(floor(count(*)/100)+1 AS BIGINT) AS page_count
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  GROUP BY 1)
        |SELECT topic_id, CAST(1 AS BIGINT) AS page_num, 'Count: 1st page sent' AS message FROM pc
        |UNION ALL
        |SELECT topic_id, page_count AS page_num,
        |  concat('Count: Last Page Sent: ', page_count) AS message FROM pc
        |ORDER BY topic_id, page_num, message""".stripMargin,
    "q_topic_fanout_count" ->
      """SELECT CAST(c.c_nationkey AS BIGINT) AS topic_id, count(*) AS n_devices,
        |  CAST(floor(count(*)/100)+1 AS BIGINT) AS n_pages,
        |  CAST(ceil(count(*)/10.0) AS BIGINT) AS n_batches
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_hourly_window" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_props_extract" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_csv_roundtrip" ->
      """SELECT event_type, count(*) AS n, CAST(sum(event_id) AS BIGINT) AS sum_ids
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_device_gen" ->
      """SELECT c_custkey, CAST(d AS BIGINT) AS device_num,
        |  concat('arn:', substr(md5(concat(c_custkey, '-', d)), 1, 16)) AS endpoint_arn
        |FROM customer, unnest(generate_series(1, (c_custkey % 3) + 1)) AS t(d)
        |ORDER BY c_custkey, device_num""".stripMargin
  )
}
