package graft

import graft.operators.Analytics
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Physical-plan assertions — the scale properties SURVEY.md §5
  * promises: dims broadcast, filters pushed to the parquet scan,
  * columns pruned, hot maps fully codegen'd.
  */
class PlanSpec extends SparkSpecBase {

  private def executedPlanString(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // materialize so AQE finalizes the plan
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p                        => p.toString
    }
  }

  test("q5 region volume broadcasts every dimension (single fact shuffle)") {
    val plan = executedPlanString(Analytics.regionVolume(tables))
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast joins in:\n$plan")
    // customer/nation/region/orders all fit the 64MB threshold at test
    // SF — lineitem must be the only shuffled input.
    assert(!plan.contains("SortMergeJoin"), s"unexpected sort-merge join in:\n$plan")
  }

  test("q3 pushes the mktsegment filter into the customer parquet scan") {
    val scans = Analytics
      .topOrders(tables)
      .queryExecution
      .executedPlan
      .toString
    assert(scans.contains("EqualTo(c_mktsegment,BUILDING)"), s"filter not pushed:\n$scans")
  }

  test("q1 prunes lineitem scan to the 7 referenced columns") {
    val plan = Analytics.pricingSummary(tables).queryExecution.executedPlan.toString
    val read = "ReadSchema:.*".r.findFirstIn(plan).getOrElse("")
    assert(read.contains("l_returnflag") && !read.contains("l_orderkey"), s"not pruned: $read")
  }

  test("ngram-jaccard self-join reuses one posting exchange (shuffled hash join)") {
    val plan = executedPlanString(graft.operators.Dedup.ngramJaccard(tables))
    assert(plan.contains("ShuffledHashJoin"), s"expected shuffle-hash self-join:\n$plan")
    assert(plan.contains("ReusedExchange"), s"posting list computed twice:\n$plan")
  }

  test("minhash-lsh band self-join reuses one signature exchange (no recompute)") {
    val plan = executedPlanString(graft.operators.Dedup.minhashLsh(tables))
    assert(plan.contains("ShuffledHashJoin"), s"expected shuffle-hash band join:\n$plan")
    assert(plan.contains("ReusedExchange"), s"band table computed twice:\n$plan")
    // the signature pipeline must be cut off behind the checkpoint:
    // at most one minhash_sig evaluation site in the executed plan
    assert(!plan.contains("minhash_sig"), s"signatures recomputed past the checkpoint:\n$plan")
  }

  test("q6 pushes date/discount/quantity predicates into the lineitem scan") {
    // formatted mode prints untruncated PushedFilters
    val pushed = Analytics
      .selectiveRevenue(tables)
      .queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(pushed.contains("GreaterThanOrEqual(l_shipdate"), s"date not pushed: $pushed")
    assert(pushed.contains("LessThan(l_quantity,24"), s"quantity not pushed: $pushed")
    assert(pushed.contains("GreaterThanOrEqual(l_discount,0.03"), s"discount not pushed: $pushed")
  }

  test("simhash is a pure map plan — no exchange before the sort") {
    val df   = graft.operators.Dedup.simhashes(tables)
    val plan = df.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).isEmpty, s"unexpected shuffle:\n$plan")
  }

  test("DSv2 problem source prunes unrequested columns into the scan") {
    val df = spark.read
      .format("graft.sources.ProblemSource")
      .option("numRows", 100)
      .load()
      .select("seq")
    val scan = df.queryExecution.executedPlan.toString
    assert("graft_problems\\[seq#\\d+L\\]".r.findFirstIn(scan).isDefined, s"not pruned:\n$scan")
    assert(df.collect().map(_.getLong(0)).sorted.toSeq == (0L until 100L))
  }

  test("DSv2 problem source pushes seq-range filters into the planned partitions") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    import org.apache.spark.sql.functions.col
    def scanOf(df: org.apache.spark.sql.DataFrame): BatchScanExec =
      df.queryExecution.executedPlan.collectLeaves().collectFirst { case b: BatchScanExec => b }.get
    val full = spark.read
      .format("graft.sources.ProblemSource")
      .option("numRows", 1000)
      .option("numPartitions", 8)
      .load()
    assert(scanOf(full).inputRDD.getNumPartitions == 8)
    val filtered = full.filter(col("seq") >= 900)
    // the filter narrows the generated range itself — 1 planned range
    // instead of 8 (the DSv2 analog of partition pruning)
    assert(scanOf(filtered).inputRDD.getNumPartitions == 1, s"range not pruned:\n${filtered.queryExecution}")
    assert(filtered.count() == 100)
    assert(filtered.agg(org.apache.spark.sql.functions.min("seq")).head().getLong(0) == 900L)
  }

  test("topk operator plans as TopKPerKeyExec — no Window, no per-group sort") {
    val df   = Analytics.topEventsPerUserFast(tables)
    val plan = executedPlanString(df)
    assert(plan.contains("TopKPerKey"), s"custom operator not planned:\n$plan")
    assert(!plan.contains("Window"), s"fell back to a window:\n$plan")
    // result must equal the window-based B4 exactly
    val fast = df.collect().map(_.toSeq)
    val ref  = Analytics.topEventsPerUser(tables).collect().map(_.toSeq)
    assert(fast.toSeq == ref.toSeq)
  }

  test("adder map stage is whole-stage codegen with no shuffle before the sort") {
    val df   = graft.operators.MathOps.adder(tables)
    val plan = executedPlanString(df)
    // AQE toString marks whole-stage-codegen stages with "*(n)"
    assert("""\*\(\d+\) Project""".r.findFirstIn(plan).isDefined, s"no codegen span:\n$plan")
    // the only exchange allowed is the final order-by range partitioning
    assert("Exchange hashpartitioning".r.findAllIn(plan).isEmpty, s"unexpected shuffle:\n$plan")
  }
}
