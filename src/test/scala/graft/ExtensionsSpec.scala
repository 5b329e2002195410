package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The kernels must be reachable as plain SQL functions in a session
  * configured with spark.sql.extensions=graft.GraftExtensions (how a
  * cluster deployment would wire them).
  *
  * `spark.sql.extensions` is a STATIC conf read from the SparkContext,
  * so exercising it genuinely requires a fresh context — build.sbt
  * runs this suite in its own forked JVM (Test / testGrouping), where
  * creating and stopping the context can't race the shared-session
  * suites or return someone else's session from getOrCreate.
  */
class ExtensionsSpec extends AnyFunSuite {

  test("extension-injected functions evaluate in plain SQL") {
    val spark = SparkSession
      .builder()
      .master("local[2]")
      .appName("graft-ext-spec")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      // prove injection happened (nothing self-registered temp functions
      // in this JVM — the registry can only have been fed by the
      // extensions hook)
      assert(
        spark.sessionState.functionRegistry.functionExists(
          org.apache.spark.sql.catalyst.FunctionIdentifier("vec_dot")
        ),
        "spark.sql.extensions did not inject vec_dot"
      )
      val row = spark
        .sql(
          """SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
            |       vec_norm(array(3.0D, 4.0D)) AS n,
            |       size(minhash_sig(array(7L, 11L))) AS m,
            |       simhash64(array(0L)) AS s,
            |       size(winnow_fp('the quick brown fox jumps over the lazy dog and runs away')) AS w,
            |       size(lsh_buckets(array(1.0D, -2.0D, 0.5D))) AS b""".stripMargin
        )
        .collect()
        .head
      assert(row.getDouble(0) == 11.0)
      assert(row.getDouble(1) == 5.0)
      assert(row.getInt(2) == graft.functions.MinHashExpr.NumHashes)
      // all 64 bit-sums are -1 for feature hash 0 except none ≥ 0 → 0
      assert(row.getLong(3) == 0L)
      assert(row.getInt(4) > 0, "winnow_fp produced no fingerprints")
      assert(row.getInt(5) == graft.functions.HyperplaneExpr.Tables)
      // the aggregate path: an injected TypedImperativeAggregate
      val agg = spark
        .sql(
          """SELECT size(minhash_union(sig)) AS u
            |FROM (SELECT minhash_sig(array(7L, 11L)) AS sig
            |      UNION ALL SELECT minhash_sig(array(13L)))""".stripMargin
        )
        .collect()
        .head
      assert(agg.getInt(0) == graft.functions.MinHashExpr.NumHashes)
      // the MG candidate summary: frequent item must survive via SQL
      val mg = spark
        .sql(
          """SELECT mg_candidates(w) AS cand
            |FROM (SELECT explode(array('hot','hot','hot','rare','hot')) AS w)""".stripMargin
        )
        .collect()
        .head
      assert(mg.getSeq[String](0).contains("hot"), "mg_candidates lost the frequent item")
    } finally spark.stop() // own JVM, own context — safe to stop
  }

  test("gate session plans the row_number idiom through TopKPerKeyExec; conf-off clone keeps the window") {
    // mirror of the Verify/Bench session: extensions injected via conf
    val spark = SparkSession
      .builder()
      .master("local[2]")
      .appName("graft-ext-gate-spec")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val t = graft.sources.Tables(spark, "/root/testdata/sf0.001")
      val grafted = graft.operators.Analytics.topEventsPerUser(t)
      val graftedPlan = grafted.queryExecution.executedPlan.toString
      assert(graftedPlan.contains("TopKPerKey"), s"gate session did not graft the idiom:\n$graftedPlan")
      // the conf-off control (exactly what q_top_events_window_ctl does)
      val ctl = spark.newSession()
      ctl.conf.set("spark.graft.topk.autoRewrite", "false")
      val windowed = graft.operators.Analytics.topEventsPerUser(graft.sources.Tables(ctl, "/root/testdata/sf0.001"))
      val ctlPlan = windowed.queryExecution.executedPlan.toString
      assert(!ctlPlan.contains("TopKPerKey"), s"kill switch ignored:\n$ctlPlan")
      assert(ctlPlan.contains("Window"), s"expected the window baseline:\n$ctlPlan")
      // same rows either way — the rewrite is invisible to results
      assert(
        grafted.collect().map(_.toSeq).toSeq == windowed.collect().map(_.toSeq).toSeq,
        "grafted and window plans disagree"
      )
      // the stratified sampler (the other row_number-idiom gate key)
      // also runs through the graft in this session
      val strat = graft.operators.Sampling.stratifiedSample(t)
      val stratPlan = strat.queryExecution.executedPlan.toString
      assert(stratPlan.contains("TopKPerKey"), s"stratified sample not grafted:\n$stratPlan")
    } finally spark.stop()
  }

  test("rewrite generalizes: a hand-written SQL row_number idiom on a fresh shape grafts") {
    // a user authoring the chargram-profile idiom in raw SQL — a query
    // shape the rule was never written against — must land on the
    // bounded-heap operator and produce the operator's exact rows
    val spark = SparkSession
      .builder()
      .master("local[2]")
      .appName("graft-ext-sql-graft-spec")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val t = graft.sources.Tables(spark, "/root/testdata/sf0.001")
      t.documents.createOrReplaceTempView("documents")
      val sql = spark.sql(
        """WITH g AS (
          |  SELECT lang, gram FROM (
          |    SELECT lang, explode(
          |      IF(length(text) >= 3,
          |         transform(sequence(1, length(text) - 2), i -> substring(text, i, 3)),
          |         array())) AS gram
          |    FROM documents)),
          |c AS (SELECT lang, gram, count(*) AS cnt FROM g GROUP BY 1, 2),
          |r AS (
          |  SELECT lang, gram, cnt,
          |    CAST(row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, gram) AS BIGINT)
          |      AS rnk
          |  FROM c)
          |SELECT lang, gram, cnt, rnk FROM r WHERE rnk <= 10
          |ORDER BY lang, rnk""".stripMargin
      )
      val plan = sql.queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerKey"), s"SQL idiom not grafted:\n$plan")
      val viaOperator = graft.operators.TextOps.chargramLangProfile(t).collect().map(_.toSeq).toSeq
      assert(sql.collect().map(_.toSeq).toSeq == viaOperator,
        "grafted SQL disagrees with the operator")
    } finally spark.stop()
  }
}
