package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.DataFrame
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

  /** B5: exact distinct users per event type. (The HLL twin,
    * approxDistinctUsers, is the 100 TB path.)
    */
  def distinctUsers(t: Tables): DataFrame =
    t.events
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_users"), count(lit(1)).as("n_events"))
      .orderBy("event_type")

  /** B5 scale twin: HLL sketch — one pass, no exact distinct shuffle
    * explosion. rows-only checked (approximate by construction).
    */
  def approxDistinctUsers(t: Tables): DataFrame =
    t.events
      .groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), 0.01).as("n_users_approx"))
      .orderBy("event_type")
}
