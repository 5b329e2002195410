package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd trigram-shingle kernels.
  *
  * The SQL form — `array_distinct(transform(sequence(1, n-2), i ->
  * concat_ws(' ', try_element_at(ws,i), …)))` — evaluates an
  * INTERPRETED lambda per element (HigherOrderFunction bodies never
  * compile), which made the shingle build the hottest per-row cost of
  * the whole dedup/curation family, and the `transform(sh, v ->
  * crc32(v) % P)` that feeds `minhash_sig` paid the same interpreted
  * tax again. These expressions run the identical math as one compiled
  * loop (a static JVM method the generated code calls directly, so the
  * surrounding projection stays whole-stage-codegen).
  *
  * Semantics are pinned to the SQL forms they replace, element for
  * element:
  *  - `shingles(ws)`: for i in 1..greatest(size-2, 1), the trigram is
  *    `concat_ws(' ', ws[i], ws[i+1], ws[i+2])` with out-of-bounds
  *    elements skipped (try_element_at's NULL + concat_ws's
  *    null-skipping), deduplicated keeping FIRST occurrence order
  *    (array_distinct's rule) — so even stored `sh` payloads are
  *    byte-identical to the interpreted build's.
  *  - `minhash_sig_str(sh)`: x = crc32(utf8 bytes) % P per shingle
  *    (java.util.zip.CRC32 — exactly Spark's crc32), then the
  *    [[MinHashExpr]] permutation minima over the x values. Equals
  *    `minhash_sig(transform(sh, v -> crc32(v) % P))` exactly; empty
  *    input yields the array-of-P neutral, like MinHashSig.
  */
object ShingleExprs {

  private val Space = UTF8String.fromString(" ")

  // the MinHashExpr hash family, pre-tabulated once (coefA/coefB do
  // modular arithmetic — not something for the inner loop)
  private val A: Array[Long] = Array.tabulate(MinHashExpr.NumHashes)(MinHashExpr.coefA)
  private val B: Array[Long] = Array.tabulate(MinHashExpr.NumHashes)(MinHashExpr.coefB)

  /** Distinct trigram shingles of a word array — the compiled twin of
    * Dedup's ShingleArrayExpr (called from generated code).
    */
  def shinglesOf(ws: ArrayData): ArrayData = {
    val n   = ws.numElements()
    val end = math.max(n - 2, 1) // sequence(1, greatest(n-2, 1))
    val seen = new java.util.LinkedHashSet[UTF8String](math.max(8, end * 2))
    var i = 0
    while (i < end) {
      // 0-based window [i, i+2]; elements past the end are skipped
      // (try_element_at -> NULL, concat_ws skips NULLs)
      val parts = new java.util.ArrayList[UTF8String](3)
      var j = i
      val hi = math.min(i + 2, n - 1)
      while (j <= hi) {
        val e = if (ws.isNullAt(j)) null else ws.getUTF8String(j)
        if (e != null) parts.add(e)
        j += 1
      }
      seen.add(UTF8String.concatWs(Space, parts.toArray(new Array[UTF8String](parts.size)): _*))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }

  /** crc32 % P per shingle, then the MinHashExpr permutation minima —
    * one fused loop (called from generated code).
    */
  def minhashOf(sh: ArrayData): ArrayData = {
    val P    = MinHashExpr.P
    val nh   = MinHashExpr.NumHashes
    val n    = sh.numElements()
    val mins = Array.fill(nh)(P)
    val crc  = new java.util.zip.CRC32
    var j    = 0
    while (j < n) {
      val b = sh.getUTF8String(j).getBytes
      crc.reset()
      crc.update(b, 0, b.length)
      val x = crc.getValue % P
      var i = 0
      while (i < nh) {
        val h = (A(i) * x + B(i)) % P
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  case class Shingles(child: Expression) extends UnaryExpression {
    override def dataType: DataType      = ArrayType(StringType, containsNull = false)
    override def nullIntolerant: Boolean = true

    override protected def nullSafeEval(input: Any): Any =
      shinglesOf(input.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, xs => s"${ev.value} = graft.functions.ShingleExprs.shinglesOf($xs);")

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  case class MinHashSigStr(child: Expression) extends UnaryExpression {
    override def dataType: DataType      = ArrayType(LongType, containsNull = false)
    override def nullIntolerant: Boolean = true

    override protected def nullSafeEval(input: Any): Any =
      minhashOf(input.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, xs => s"${ev.value} = graft.functions.ShingleExprs.minhashOf($xs);")

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("shingles", exprs => Shingles(exprs.head), "built-in")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("minhash_sig_str", exprs => MinHashSigStr(exprs.head), "built-in")
  }
}
