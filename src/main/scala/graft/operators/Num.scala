package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Numeric helpers that make aggregates bit-deterministic across
  * engines and partitionings.
  *
  * Summing IEEE doubles is order-dependent, and Spark's partial
  * aggregation order varies run-to-run — so money-style columns are
  * cast to DECIMAL per row (exact, order-independent sum) and the
  * final result cast back to double. This is also the right call at
  * 100 TB: decimal partial aggregation is still map-side combined and
  * whole-stage codegen'd.
  */
object Num {

  /** Order-independent sum of a 2-decimal money column, as double. */
  def moneySum(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast(DoubleType)

  /** Sum of a per-row product of two 2-decimal factors (exactly 4
    * decimals), as double. The decimal scale must cover the product's
    * exact decimal width: a double within 2e-11 of an exactly-4-decimal
    * value rounds to it under both Spark's shortest-string rounding and
    * DuckDB's binary rounding. A NARROWER scale would diverge between
    * engines (seen empirically with scale 4 on 6-decimal products).
    */
  def moneySum4(c: Column): Column =
    sum(c.cast(DecimalType(22, 4))).cast(DoubleType)

  /** Same for a product of three 2-decimal factors (exactly 6 decimals). */
  def moneySum6(c: Column): Column =
    sum(c.cast(DecimalType(24, 6))).cast(DoubleType)

  /** Deterministic average: exact decimal sum, then one double divide. */
  def moneyAvg(c: Column): Column =
    (sum(c.cast(DecimalType(18, 2))).cast(DoubleType) / count(lit(1))).cast(DoubleType)
}
