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
    "q_approx_distinct_users" -> ((s, d) => Analytics.approxDistinctUsers(Tables(s, d)))
  )

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
        |ORDER BY event_type""".stripMargin
  )
}
