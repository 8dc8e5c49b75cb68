package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftshim

/** Single-pass character-entropy statistics: distinct-character count
  * and the Shannon fold Σ (k/n)·log₂(k/n), accumulated over distinct
  * characters in ASCENDING CODEPOINT ORDER — the same fold order as
  * the sorted-distinct-chars SQL formulation, so the double result is
  * bit-identical to the declarative twin it replaces (the q_char_
  * entropy oracle's `list_sort(list_distinct(...))` fold).
  *
  * Why an Expression: the HOF form materializes `array_sort(split(
  * text, ''))` plus a run-starts array per row — O(len log len) time
  * and three array allocations. This is one O(len) histogram pass
  * (sorted TreeMap over ~dozens of distinct codepoints) with zero
  * per-row array churn, inside whole-stage codegen via the same
  * static-forwarder seam as [[Fingerprint64]] / [[Geohash]].
  *
  * log₂ is computed as `Math.log(x) / Math.log(2.0)` — the exact
  * arithmetic of Spark's own `log2` builtin the declarative twin
  * used, so the swap is hash-invariant under the oracle. */
case class CharEntropyStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_unique", IntegerType, nullable = false),
    StructField("entropy_sum", DoubleType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_entropy_stats requires a string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    CharEntropyStats.stats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharEntropyStats.stats($c);")

  override protected def withNewChildInternal(
      newChild: Expression): CharEntropyStats = copy(child = newChild)
}

object CharEntropyStats {

  /** One histogram pass over codepoints; fold ascending. */
  def stats(s: UTF8String): InternalRow = {
    val str = s.toString
    val counts = new java.util.TreeMap[Integer, Integer]()
    var i = 0
    var n = 0L
    while (i < str.length) {
      val cp = str.codePointAt(i)
      val prev = counts.get(cp)
      counts.put(cp, if (prev == null) 1 else prev + 1)
      i += Character.charCount(cp)
      n += 1
    }
    var acc = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val p = it.next().toDouble / n
      acc += p * (Math.log(p) / Math.log(2.0))
    }
    new GenericInternalRow(Array[Any](counts.size(), acc))
  }

  /** Column entry point. */
  def charEntropyStats(text: Column): Column =
    graftshim.toColumn(CharEntropyStats(graftshim.toExpression(text)))
}
