package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Attribute,
  AttributeReference,
  AttributeSet,
  Expression,
  GenericInternalRow,
  JoinedRow,
  SortOrder,
  UnsafeProjection,
  UnsafeRow
}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.LongType

/** Whole-operator extension: per-key top-k with bounded heaps.
  *
  * `row_number().over(Window.partitionBy(key).orderBy(o)) <= k` sorts
  * EVERY key group in full — O(n log n) per group and the whole group
  * buffered — to keep only k rows. This operator keeps a k-bounded
  * heap per key in one pass: O(n log k), memory O(keys × k) per
  * partition. At 100 TB with heavy keys that is the difference
  * between a spilling sort and a streaming pass.
  *
  * Wiring is the standard custom-operator stack: a resolved logical
  * node, a planner [[Strategy]] mapping it to [[TopKPerKeyExec]], and
  * a DataFrame-level API ([[TopK.perKey]]) that injects the strategy
  * idempotently via `spark.experimental.extraStrategies`.
  */
object TopK {

  /** Logical node. Constructed already-resolved (expressions are bound
    * to `child.output` by [[perKey]]), so the analyzer passes it
    * through and only the planner needs to know it.
    */
  case class TopKPerKey(
      key: Seq[Expression],
      order: Seq[SortOrder],
      k: Int,
      rankAttr: Attribute,
      child: LogicalPlan
  ) extends UnaryNode {
    override def output: Seq[Attribute]                = child.output :+ rankAttr
    override def producedAttributes: AttributeSet      = AttributeSet(rankAttr)
    override protected def withNewChildInternal(c: LogicalPlan): TopKPerKey = copy(child = c)
  }

  /** Physical operator: hash of bounded heaps after a hash shuffle on
    * the key. Rows stream through once; output is each key's top k
    * with a 1-based rank column.
    */
  case class TopKPerKeyExec(
      key: Seq[Expression],
      order: Seq[SortOrder],
      k: Int,
      rankAttr: Attribute,
      child: SparkPlan
  ) extends UnaryExecNode {
    override def output: Seq[Attribute]           = child.output :+ rankAttr
    override def outputPartitioning: Partitioning = child.outputPartitioning
    override def requiredChildDistribution: Seq[Distribution] =
      ClusteredDistribution(key) :: Nil

    override protected def doExecute(): RDD[InternalRow] = {
      val kLocal      = k
      val keyExprs    = key
      val orderLocal  = order
      val childOutput = child.output
      val outAttrs    = output
      child.execute().mapPartitions { iter =>
        val keyProj  = UnsafeProjection.create(keyExprs, childOutput)
        val ordering = GenerateOrdering.generate(orderLocal, childOutput)
        val outProj  = UnsafeProjection.create(outAttrs, outAttrs)
        val heaps    = new java.util.LinkedHashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
        while (iter.hasNext) {
          val row = iter.next()
          val kr  = keyProj(row)
          var pq  = heaps.get(kr)
          if (pq == null) {
            // PQ head = the WORST kept row (reverse ordering) so
            // replacement is an O(log k) peek/poll
            pq = new java.util.PriorityQueue[InternalRow](kLocal + 1, ordering.reverse)
            heaps.put(kr.copy(), pq)
          }
          if (pq.size < kLocal) pq.add(row.copy())
          else if (ordering.compare(row, pq.peek()) < 0) {
            pq.poll(); pq.add(row.copy())
          }
        }
        import scala.jdk.CollectionConverters._
        val joined = new JoinedRow
        heaps.values().asScala.iterator.flatMap { pq =>
          val arr = pq.toArray(new Array[InternalRow](pq.size())).sorted(ordering)
          arr.iterator.zipWithIndex.map { case (r, i) =>
            outProj(joined(r, new GenericInternalRow(Array[Any]((i + 1).toLong))))
          }
        }
      }
    }

    override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec = copy(child = c)
  }

  object TopKStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case TopKPerKey(key, order, k, rank, child) =>
        TopKPerKeyExec(key, order, k, rank, planLater(child)) :: Nil
      case _ => Nil
    }
  }

  /** DataFrame API: top `k` rows per `keyCols` group in the order of
    * `orderCols`, with a `rnk` column (1-based). Injects the planner
    * strategy on first use.
    */
  def perKey(df: DataFrame, keyCols: Seq[String], orderCols: Seq[Column], k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy)) {
      spark.experimental.extraStrategies = spark.experimental.extraStrategies :+ TopKStrategy
    }
    val child = df.queryExecution.analyzed
    val key = keyCols.map(n =>
      child.output
        .find(_.name == n)
        .getOrElse(throw new IllegalArgumentException(s"no column $n in ${child.output.map(_.name)}"))
    )
    val order = orderCols.map { c =>
      org.apache.spark.sql.graft.Bridge.expr(c) match {
        case so: SortOrder => bindByName(so, child.output).asInstanceOf[SortOrder]
        case e             => SortOrder(bindByName(e, child.output), org.apache.spark.sql.catalyst.expressions.Ascending)
      }
    }
    val rank = AttributeReference("rnk", LongType, nullable = false)()
    org.apache.spark.sql.graft.Bridge.ofRows(spark, TopKPerKey(key, order, k, rank, child))
  }

  /** Resolve UnresolvedAttributes in a driver-built expression against
    * the child's output by name.
    */
  private def bindByName(e: Expression, output: Seq[Attribute]): Expression =
    e.transformUp {
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
        output
          .find(_.name == u.name)
          .getOrElse(throw new IllegalArgumentException(s"no column ${u.name}"))
    }
}
