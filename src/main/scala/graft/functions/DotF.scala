package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.sql.graftshim

/** Dot product of two float-array columns in double precision, as a
  * native codegen expression.
  *
  * The embedding family originally computed this as
  * `aggregate(zip_with(x, y, (p, q) -> double(p) * double(q)), 0d, +)`
  * — but Spark's higher-order functions evaluate their lambda
  * INTERPRETED per element, and the pairwise dedup queries run the dot
  * over every candidate pair. This expression is the same arithmetic
  * (per-index double(x_i) * double(y_i), accumulated left-to-right in
  * a double — bit-identical to the HOF fold, which the oracle parity
  * depends on) in one compiled loop per row.
  *
  * Null semantics also mirror the HOF fold: `zip_with` null-pads the
  * shorter array and the `+` fold poisons on any null product, so the
  * HOF yields NULL whenever the lengths differ or either array holds a
  * null element. dot_f returns NULL in exactly those cases — a corrupt
  * or short embedding surfaces as NULL, never as a plausible partial
  * dot product.
  */
case class DotF(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType

  // NULL is produced on length mismatch / null elements even when both
  // inputs are non-nullable columns
  override def nullable: Boolean = true

  private def isFloatArray(t: DataType) = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isFloatArray(left.dataType) && isFloatArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"dot_f requires two array<float> inputs, got ${left.dataType} / ${right.dataType}")

  override def nullSafeEval(l: Any, r: Any): Any =
    DotF.dot(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val tmp = ctx.freshName("dotRes")
      s"""
      java.lang.Double $tmp = graft.functions.DotF.dot($l, $r);
      if ($tmp == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $tmp.doubleValue(); }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotF =
    copy(left = newLeft, right = newRight)
}

object DotF {
  /** Boxed so codegen/eval can signal NULL (HOF parity) on length
    * mismatch or a null element in either array. */
  def dot(x: ArrayData, y: ArrayData): java.lang.Double = {
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** Column-level entry point: `dotF($"a", $"b")`. */
  def dotF(a: Column, b: Column): Column =
    graftshim.toColumn(DotF(graftshim.toExpression(a), graftshim.toExpression(b)))

  /** SQL registration: `SELECT dot_f(a, b) FROM ...`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    graftshim.registerExpression(spark, "dot_f", 2,
      exprs => DotF(exprs(0), exprs(1)))
}
