package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** 64-bit SimHash as a typed Aggregator (SURVEY.md §2.12's custom-UDAF
  * surface): input = one 64-bit token hash per row, buffer = 64 signed
  * bit votes, output = the simhash.
  *
  * An Aggregator gets partial aggregation for free — each partition
  * folds its token hashes into a 64-int buffer and only buffers cross
  * the shuffle, which is what makes document-level simhash viable on a
  * 100 TB corpus (the alternative, collecting token lists per doc, ships
  * the whole corpus through the shuffle).
  */
object SimHashAgg extends Aggregator[Long, Array[Int], Long] {
  override def zero: Array[Int] = new Array[Int](64)

  override def reduce(buf: Array[Int], tokenHash: Long): Array[Int] = {
    var i = 0
    while (i < 64) {
      if (((tokenHash >>> i) & 1L) == 1L) buf(i) += 1 else buf(i) -= 1
      i += 1
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < 64) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Int]): Long = {
    var h = 0L
    var i = 0
    while (i < 64) {
      if (buf(i) > 0) h |= (1L << i)
      i += 1
    }
    h
  }

  override def bufferEncoder: Encoder[Array[Int]] = Encoders.kryo[Array[Int]]
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
