package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.{HyperplaneExpr, MinHashExpr, MinHashUnion, MisraGriesCandidates, ShingleExprs, SimHashExpr, VecExprs, WinnowExpr}

/** SparkSessionExtensions entry point: makes the engine's native
  * kernels first-class SQL functions in any session built with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` —
  * no per-operator registration call needed.
  *
  * (The operators also self-register defensively via the per-session
  * `register` helpers, so they work on vanilla sessions too.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // whole-operator extension: the row_number-top-k idiom is rewritten
    // to the bounded-heap TopKPerKey operator planner-wide
    ext.injectOptimizerRule(_ => graft.plans.TopK.RewriteRowNumberTopK)
    ext.injectPlannerStrategy(_ => graft.plans.TopK.TopKStrategy)
    // B97: SELECT DISTINCT over a RELY-keyed table deletes its
    // aggregate (and the exchange the planner would wrap around it)
    ext.injectOptimizerRule(_ => graft.plans.KeyDistinct.EliminateDistinctOnKey)
    ext.injectFunction(
      (
        FunctionIdentifier("vec_dot"),
        new ExpressionInfo(VecExprs.VecDot.getClass.getCanonicalName, "vec_dot"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          VecExprs.VecDot(exprs(0), exprs(1))
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("vec_norm"),
        new ExpressionInfo(VecExprs.VecNorm.getClass.getCanonicalName, "vec_norm"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          VecExprs.VecNorm(exprs.head)
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("minhash_sig"),
        new ExpressionInfo(MinHashExpr.MinHashSig.getClass.getCanonicalName, "minhash_sig"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          MinHashExpr.MinHashSig(exprs.head)
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("shingles"),
        new ExpressionInfo(ShingleExprs.Shingles.getClass.getCanonicalName, "shingles"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          ShingleExprs.Shingles(exprs.head)
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("minhash_sig_str"),
        new ExpressionInfo(ShingleExprs.MinHashSigStr.getClass.getCanonicalName, "minhash_sig_str"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          ShingleExprs.MinHashSigStr(exprs.head)
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("kgram_hashes"),
        new ExpressionInfo(ShingleExprs.KgramHashes.getClass.getCanonicalName, "kgram_hashes"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          ShingleExprs.KgramHashes(exprs(0), exprs(1))
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("bigram_stats"),
        new ExpressionInfo(ShingleExprs.BigramStats.getClass.getCanonicalName, "bigram_stats"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          ShingleExprs.BigramStats(exprs.head)
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("simhash64"),
        new ExpressionInfo(SimHashExpr.SimHash64.getClass.getCanonicalName, "simhash64"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          SimHashExpr.SimHash64(exprs.head)
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("winnow_fp"),
        new ExpressionInfo(WinnowExpr.WinnowFingerprint.getClass.getCanonicalName, "winnow_fp"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          WinnowExpr.WinnowFingerprint(exprs.head)
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("lsh_buckets"),
        new ExpressionInfo(HyperplaneExpr.LshBuckets.getClass.getCanonicalName, "lsh_buckets"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          HyperplaneExpr.LshBuckets(exprs.head)
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("minhash_union"),
        new ExpressionInfo(classOf[MinHashUnion].getCanonicalName, "minhash_union"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          MinHashUnion(exprs.head)
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("mg_candidates"),
        new ExpressionInfo(classOf[MisraGriesCandidates].getCanonicalName, "mg_candidates"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          MisraGriesCandidates(exprs.head)
      )
    )
  }
}
