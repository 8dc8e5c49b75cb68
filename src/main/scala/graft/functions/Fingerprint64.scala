package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftshim

/** 64-bit FNV-1a document fingerprint as a native Catalyst expression.
  *
  * The reference's closest analogue is its ad-hoc row hashing absent —
  * this is the engine-extension "document fingerprinting (rolling hash)"
  * operator. Implemented as a codegen-capable UnaryExpression rather
  * than a Scala UDF so it fuses into whole-stage codegen: at 100 TB the
  * fingerprint runs inside the same generated loop as the scan and
  * filter, with no serialization boundary or closure dispatch per row.
  *
  * FNV-1a over UTF-8 bytes: h = 0xcbf29ce484222325; per byte:
  * h = (h ^ b) * 0x100000001b3.
  */
case class Fingerprint64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"fingerprint64 requires a string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    Fingerprint64.hash(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
        byte[] $bytes = $c.getBytes();
        long $h = 0xcbf29ce484222325L;
        for (int $i = 0; $i < $bytes.length; $i++) {
          $h = ($h ^ ($bytes[$i] & 0xffL)) * 0x100000001b3L;
        }
        ${ev.value} = $h;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Fingerprint64 =
    copy(child = newChild)
}

object Fingerprint64 {
  def hash(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h = (h ^ (bytes(i) & 0xffL)) * 0x100000001b3L
      i += 1
    }
    h
  }

  /** Column-level entry point: `fingerprint64($"text")`. */
  def fingerprint64(c: Column): Column =
    graftshim.toColumn(Fingerprint64(graftshim.toExpression(c)))

  /** SQL registration: `SELECT fingerprint64(text) FROM ...`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    graftshim.registerExpression(spark, "fingerprint64", 1,
      exprs => Fingerprint64(exprs.head))
}
