package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Catalyst twin of [[TopKAgg]] (SURVEY.md §2.12): bounded per-key top-k
  * as a `TypedImperativeAggregate`.
  *
  * Same bounded-heap semantics as the typed Aggregator — at most k
  * (value, id) pairs per key cross the shuffle as map-side partials —
  * but the buffer lives as a compact byte array inside
  * ObjectHashAggregateExec instead of Kryo-serialized Scala lists
  * shuffled through `groupByKey`, and input rows are never deserialized
  * to Scala tuples. This is the form that holds up when one key has a
  * billion rows: state stays O(k), and there is no per-partition full
  * sort (unlike the ranking-window formulation).
  *
  * Ordering: value descending, id ascending on ties — identical to the
  * typed twin and the ROW_NUMBER() oracle.
  *
  * Input: a struct column `(v: double, id: long)`.
  * Output: `array<struct<v: double, id: long>>`, best-first.
  */
case class TopKDecl(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[(Double, Long)]]
  with UnaryLike[Expression] {

  require(k > 0, "topk requires k > 0")

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("v", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "topk"

  override def createAggregationBuffer(): mutable.ArrayBuffer[(Double, Long)] =
    mutable.ArrayBuffer.empty

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  /** Insert keeping the buffer sorted best-first and bounded at k. */
  private def insert(
      buf: mutable.ArrayBuffer[(Double, Long)], x: (Double, Long)): Unit = {
    if (buf.length == k && !better(x, buf.last)) return
    var i = 0
    while (i < buf.length && better(buf(i), x)) i += 1
    buf.insert(i, x)
    if (buf.length > k) buf.remove(buf.length - 1)
  }

  override def update(
      buf: mutable.ArrayBuffer[(Double, Long)],
      input: InternalRow): mutable.ArrayBuffer[(Double, Long)] = {
    val row = child.eval(input)
    if (row != null) {
      val s = row.asInstanceOf[InternalRow]
      if (!s.isNullAt(0) && !s.isNullAt(1)) insert(buf, (s.getDouble(0), s.getLong(1)))
    }
    buf
  }

  override def merge(
      buf: mutable.ArrayBuffer[(Double, Long)],
      other: mutable.ArrayBuffer[(Double, Long)]): mutable.ArrayBuffer[(Double, Long)] = {
    other.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: mutable.ArrayBuffer[(Double, Long)]): Any =
    new GenericArrayData(buf.map { case (v, id) =>
      new GenericInternalRow(Array[Any](v, id))
    }.toArray[Any])

  override def serialize(buf: mutable.ArrayBuffer[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.length)
    bb.putInt(buf.length)
    buf.foreach { case (v, id) => bb.putDouble(v); bb.putLong(id) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new mutable.ArrayBuffer[(Double, Long)](n)
    var i = 0
    while (i < n) { buf += ((bb.getDouble(), bb.getLong())); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKDecl =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKDecl =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopKDecl =
    copy(child = newChild)
}

object TopKDecl {
  /** Column-API entry point: `agg(TopKDecl.topk(struct($"v", $"id"), 3))`. */
  def topk(c: Column, k: Int): Column =
    graftshim.toColumn(TopKDecl(graftshim.toExpression(c), k).toAggregateExpression())
}
