package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.{MinHashExpr, SimHashExpr, VecExprs}

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
        FunctionIdentifier("simhash64"),
        new ExpressionInfo(SimHashExpr.SimHash64.getClass.getCanonicalName, "simhash64"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          SimHashExpr.SimHash64(exprs.head)
      )
    )
  }
}
