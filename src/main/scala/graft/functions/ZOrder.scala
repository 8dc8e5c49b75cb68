package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DataTypes, IntegerType, LongType}
import org.apache.spark.sql.graftshim

/** Z-order (Morton) interleave of two 16-bit dimensions — the layout
  * key for multi-dimensional data clustering.
  *
  * Why it matters at 100 TB: parquet row-group and file pruning works
  * off min/max statistics per column. Sorting by one column gives
  * perfect pruning on that column and none on any other; sorting by
  * the Morton code of two quantized columns gives every file a COMPACT
  * BOUNDING BOX in both dimensions, so a 2-D range predicate prunes on
  * both (the technique behind Delta/Iceberg Z-ORDER clustering —
  * implemented here from the public bit-interleaving construction, the
  * "Interleave bits by Binary Magic Numbers" method of the public
  * Stanford Bit Twiddling Hacks page).
  *
  * Inputs are masked to their low 16 bits (callers quantize real
  * domains to 0..65535 first); output is the 32-bit interleave as a
  * non-null LONG: x occupies even bit positions, y odd. A native
  * codegen `BinaryExpression` (same static-forwarder seam as
  * [[DotF]] / [[JaroWinkler]]) so layout keys compute inside the
  * write job's generated projection.
  */
case class ZOrder(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(e =>
        e.dataType == IntegerType || e.dataType == LongType ||
          e.dataType == DataTypes.ShortType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"z_value requires integral inputs, got " +
          s"(${left.dataType}, ${right.dataType})")

  override def nullSafeEval(l: Any, r: Any): Any =
    ZOrder.interleave16(
      l.asInstanceOf[Number].longValue(),
      r.asInstanceOf[Number].longValue())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      s"${ev.value} = graft.functions.ZOrder.interleave16((long) $l, (long) $r);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder =
    copy(left = newLeft, right = newRight)
}

object ZOrder {
  /** Spread the low 16 bits of v across the even bit positions of a
    * 32-bit word (binary-magic-numbers construction). */
  private def spread16(v: Long): Long = {
    var x = v & 0xFFFFL
    x = (x | (x << 8)) & 0x00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0FL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  /** Morton code of (x, y), 16 bits each: x on even, y on odd bits. */
  def interleave16(x: Long, y: Long): Long =
    spread16(x) | (spread16(y) << 1)

  /** Column entry point: `zValue($"x", $"y")`. */
  def zValue(x: Column, y: Column): Column =
    graftshim.toColumn(
      ZOrder(graftshim.toExpression(x), graftshim.toExpression(y)))

  /** SQL registration: `SELECT z_value(x, y) FROM ...`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    graftshim.registerExpression(spark, "z_value", 2,
      exprs => ZOrder(exprs.head, exprs(1)))
}
