package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd twin of [[graft.sources.ContentStore.bucketOf]] — the
  * K-V store's bucket-routing hash (Scala MurmurHash3.stringHash mod
  * n, deliberately NOT Spark's UTF-8 Murmur3: the layout fact was
  * recorded with the writer's hash and every consumer must match it
  * bit-for-bit). Exists so plan-side bucket derivation (the frame
  * purge planner's candidate prune) stays inside whole-stage codegen
  * instead of dropping to a Scala UDF; both eval paths delegate to
  * the ONE implementation in ContentStore, so writer and planner can
  * never disagree.
  */
object KvBucketExpr {

  case class KvBucket(child: Expression, n: Int) extends UnaryExpression {
    require(n > 0, s"KvBucket: bucket count must be positive, got $n")
    override def dataType: DataType      = IntegerType
    override def nullIntolerant: Boolean = true

    override protected def nullSafeEval(input: Any): Any =
      graft.sources.ContentStore.bucketOf(input.asInstanceOf[UTF8String].toString, n)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.sources.ContentStore.bucketOf($c.toString(), $n)")

    override protected def withNewChildInternal(newChild: Expression): KvBucket =
      copy(child = newChild)
  }
}
