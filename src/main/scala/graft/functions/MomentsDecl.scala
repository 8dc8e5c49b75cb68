package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Codegen-friendly twin of [[MomentsAgg]] (SURVEY.md §2.12.3).
  *
  * The typed `Aggregator` form demonstrates the user-facing UDAF API but
  * exits whole-stage codegen: `groupByKey.mapValues.agg` deserializes
  * every row into Scala objects. This `DeclarativeAggregate` expresses
  * the same one-pass Welford update / Chan merge purely as Catalyst
  * expressions over three primitive doubles, so it runs inside
  * HashAggregateExec's generated code with mergeable map-side partials —
  * the form you'd actually deploy against 100 TB.
  *
  * Buffer: (n, avg, m2) as doubles (n as double keeps every buffer slot
  * primitive-mutable for the codegen'd hash map). Output: a named struct
  * `{n: long, mean: double, m2: double}` matching the typed twin.
  */
case class MomentsDecl(child: Expression)
    extends DeclarativeAggregate with UnaryLike[Expression] {

  // Input is coerced to double at the Column wrapper ([[MomentsDecl.moments]]);
  // `AbstractDataType` (needed for ImplicitCastInputTypes) is private[sql].
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("mean", DoubleType, nullable = false),
    StructField("m2", DoubleType, nullable = false)))
  override def prettyName: String = "moments"

  private lazy val n = AttributeReference("n", DoubleType, nullable = false)()
  private lazy val avg = AttributeReference("avg", DoubleType, nullable = false)()
  private lazy val m2 = AttributeReference("m2", DoubleType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(n, avg, m2)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0.0), Literal(0.0), Literal(0.0))

  // Welford single-value update; null inputs leave the buffer unchanged
  // (matching built-in agg null semantics).
  override lazy val updateExpressions: Seq[Expression] = {
    val newN = Add(n, Literal(1.0))
    val delta = Subtract(child, avg)
    val newAvg = Add(avg, Divide(delta, newN))
    val newM2 = Add(m2, Multiply(delta, Subtract(child, newAvg)))
    val isNull = IsNull(child)
    Seq(
      If(isNull, n, newN),
      If(isNull, avg, newAvg),
      If(isNull, m2, newM2))
  }

  // Chan's parallel merge: numerically stable combination of partials.
  override lazy val mergeExpressions: Seq[Expression] = {
    val newN = Add(n.left, n.right)
    val delta = Subtract(avg.right, avg.left)
    val deltaN = If(EqualTo(newN, Literal(0.0)), Literal(0.0), Divide(delta, newN))
    val newAvg = Add(avg.left, Multiply(deltaN, n.right))
    val newM2 = Add(Add(m2.left, m2.right),
      Multiply(Multiply(delta, deltaN), Multiply(n.left, n.right)))
    Seq(newN, newAvg, newM2)
  }

  override lazy val evaluateExpression: Expression = CreateNamedStruct(Seq(
    Literal("n"), Cast(n, LongType),
    Literal("mean"), avg,
    Literal("m2"), m2))

  override protected def withNewChildInternal(newChild: Expression): MomentsDecl =
    copy(child = newChild)
}

object MomentsDecl {
  /** Column-API entry point: `df.groupBy(...).agg(MomentsDecl.moments($"x"))`. */
  def moments(c: Column): Column =
    graftshim.toColumn(MomentsDecl(graftshim.toExpression(c.cast("double"))).toAggregateExpression())
}
