package graft

import graft.operators.{Joins, Num}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Salted + bucketed join twins: result equivalence to the plain join
  * (the property the DuckDB gate re-checks at sf0.01) and the plan
  * shapes that are the operators' whole point at scale.
  */
class JoinsSpec extends SparkSpecBase {

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p                        => p.toString
    }
  }

  test("salted join values are identical to the unsalted join") {
    val t = tables
    val plain = t.events
      .join(t.customer, col("user_id") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_events"), Num.moneySum(col("value")).as("sum_value"))
      .orderBy("c_mktsegment")
      .collect()
    val salted = Joins.saltedJoin(t).collect()
    assert(salted.toSeq == plain.toSeq)
  }

  test("salted join keys on (key, salt) so a hot key spans SaltBuckets reducers") {
    val plan = finalPlan(Joins.saltedJoin(tables))
    // the equi-join must include the salt column on both sides — that
    // is the mechanism that splits one hot key's probe rows
    assert(plan.contains("salt"), s"salt not in the join keys:\n$plan")
  }

  test("bucketed join plans with zero exchanges under the join") {
    // at spec SF the lineitem side fits the broadcast threshold and AQE
    // never plans a shuffled join at all — disable broadcast so the
    // plan under test is the co-located SMJ the layout exists for
    val conf = spark.conf
    val prev = conf.get("spark.sql.autoBroadcastJoinThreshold")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val wh   = java.nio.file.Files.createTempDirectory("graft-wh-spec").toString
      val plan = finalPlan(Joins.bucketedJoin(tables, wh))
      // the join runs on the bucketed layout...
      assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join:\n$plan")
      assert(plan.contains("Bucketed: true"), s"scans not bucketed:\n$plan")
      // ...and neither side re-shuffles on the join key — the only
      // exchanges left are the aggregate's (o_orderpriority) and the
      // output sort's range partitioning
      assert(
        !plan.contains("Exchange hashpartitioning(o_orderkey") &&
          !plan.contains("Exchange hashpartitioning(l_orderkey"),
        s"bucketed sides must not re-shuffle on the join key:\n$plan"
      )
    } finally conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketed join values are identical to the plain join") {
    val t  = tables
    val wh = java.nio.file.Files.createTempDirectory("graft-wh-spec2").toString
    val plain = t.orders
      .join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("n_lines"),
        Num.moneySum(col("l_quantity")).as("sum_qty"),
        Num.moneySum(col("o_totalprice")).as("sum_price")
      )
      .orderBy("o_orderpriority")
      .collect()
    assert(Joins.bucketedJoin(t, wh).collect().toSeq == plain.toSeq)
  }
}
