package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join-shape operators for hostile key distributions and shuffle-free
  * layouts — the two levers that decide whether a 100 TB join finishes.
  *
  * [[saltedJoin]] is the MANUAL skew mitigation (salt the fact side,
  * replicate the dimension) for engines/situations where AQE's
  * skew-join split can't act: the dimension is too big to broadcast but
  * small enough to replicate R×, and the skew is in the JOIN itself
  * (one hot key's probe rows all land in one reducer). AQE splits skewed
  * partitions at MAPPER granularity after the fact; salting spreads a
  * single hot KEY across R reducers by construction, before any
  * runtime statistics exist — the belt to AQE's suspenders
  * (PlanSpec demonstrates the AQE path; this operator is the
  * deterministic twin whose RESULT is provably identical to the
  * unsalted join, which is exactly what the DuckDB gate checks).
  *
  * [[bucketedJoin]] is the layout lever: both join sides pre-hashed
  * into the same bucket count on the join key at WRITE time, so every
  * subsequent join on that key is co-located — zero exchange on either
  * side, at any scale, for every query that reuses the layout. This is
  * how a 100 TB fact table joins its 10 TB sibling nightly without
  * re-shuffling either: pay the shuffle once in the writer, amortize it
  * over every reader (Spark's native bucketing, SPARK-19256 lineage).
  */
object Joins {

  /** Salt factor: hot keys spread across this many reducers. */
  val SaltBuckets = 8

  /** Events ⋈ customer with an R-way salt: the (potentially skewed)
    * fact side gets a deterministic per-row salt, the dimension side is
    * exploded R× (one copy per salt value), and the join keys on
    * (key, salt) — so one hot user's rows land in R different reducers
    * instead of one. The output aggregate is per market segment, which
    * re-collapses the salt: identical values to the unsalted join by
    * construction.
    *
    * Scale notes: the dimension replication is R× |customer| — bounded
    * and explicit (vs broadcast, which needs |customer| on EVERY
    * executor). The salt is a pure row function (xxhash64 of the event
    * id), so the plan stays deterministic and partitioning-independent;
    * `value` sums through the decimal cast (order-independent).
    */
  def saltedJoin(t: Tables, salts: Int = SaltBuckets): DataFrame = {
    val fact = t.events
      .select(col("user_id"), col("value"), pmod(xxhash64(col("event_id")), lit(salts)).as("salt"))
    val dim = t.customer
      .select(col("c_custkey"), col("c_mktsegment"))
      .withColumn("salt", explode(sequence(lit(0), lit(salts - 1))))
    fact
      .join(dim, fact("user_id") === dim("c_custkey") && fact("salt") === dim("salt"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_events"), Num.moneySum(col("value")).as("sum_value"))
      .orderBy("c_mktsegment")
  }

  /** Number of buckets both sides of [[bucketedJoin]] hash into —
    * matching counts are what lets the planner drop both exchanges.
    */
  val JoinBuckets = 8

  /** Write orders + lineitem bucketed (and sorted) by order key, then
    * join the bucketed tables and aggregate per order priority. The
    * join plans with NO exchange on either side (PlanSpec asserts it):
    * bucket n of orders only ever meets bucket n of lineitem, and the
    * write-time sort lets sort-merge-join skip its sorts too.
    *
    * The writes model the nightly layout job a real warehouse runs
    * once; every downstream join on the bucket key then rides the
    * layout for free. `warehouseDir` keeps the side effect in an
    * explicit caller-owned location (the session catalog's default
    * warehouse is never touched).
    */
  def bucketedJoin(t: Tables, warehouseDir: String, buckets: Int = JoinBuckets): DataFrame = {
    val spark = t.spark
    def layOut(df: DataFrame, table: String, sortCol: String): Unit = {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      df.write
        .mode("overwrite")
        .option("path", s"$warehouseDir/$table")
        .bucketBy(buckets, sortCol)
        .sortBy(sortCol)
        .format("parquet")
        .saveAsTable(table)
    }
    layOut(t.orders.select("o_orderkey", "o_orderpriority", "o_totalprice"), "graft_orders_b", "o_orderkey")
    layOut(t.lineitem.select("l_orderkey", "l_quantity"), "graft_lineitem_b", "l_orderkey")
    spark
      .table("graft_orders_b")
      .join(spark.table("graft_lineitem_b"), col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("n_lines"),
        Num.moneySum(col("l_quantity")).as("sum_qty"),
        Num.moneySum(col("o_totalprice")).as("sum_price")
      )
      .orderBy("o_orderpriority")
  }
}
