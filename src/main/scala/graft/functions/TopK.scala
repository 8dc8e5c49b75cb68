package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Per-key top-k as a typed Aggregator (SURVEY.md §2.12 UDAF surface;
  * O5's grouped generalization).
  *
  * The built-in way to get "top 3 orders per customer" is a ranking
  * window, which sorts every partition's entire history; this
  * aggregator keeps a bounded k-element buffer per key instead, and
  * the buffers merge associatively — partial aggregation ships at most
  * k tuples per key per partition through the shuffle. At 100 TB with
  * billions of rows per key, that's the difference between a bounded
  * state pass and a full sort.
  *
  * Ordering: value descending, id ascending on ties — matches the
  * ROW_NUMBER() OVER (ORDER BY v DESC, id ASC) oracle exactly.
  */
class TopKAgg(k: Int) extends Aggregator[(Double, Long), List[(Double, Long)], Seq[(Double, Long)]] {

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  /** Insert keeping the buffer sorted best-first and bounded at k. */
  private def insert(buf: List[(Double, Long)], x: (Double, Long)): List[(Double, Long)] = {
    val (front, back) = buf.span(better(_, x))
    val merged = front ::: x :: back
    if (merged.length > k) merged.take(k) else merged
  }

  override def zero: List[(Double, Long)] = Nil
  override def reduce(buf: List[(Double, Long)], x: (Double, Long)): List[(Double, Long)] =
    insert(buf, x)
  override def merge(a: List[(Double, Long)], b: List[(Double, Long)]): List[(Double, Long)] =
    b.foldLeft(a)(insert)
  override def finish(buf: List[(Double, Long)]): Seq[(Double, Long)] = buf
  override def bufferEncoder: Encoder[List[(Double, Long)]] = Encoders.kryo
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
