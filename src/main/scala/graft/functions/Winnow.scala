package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftshim

/** Winnowing fingerprint statistics (Schleimer et al., SIGMOD 2003) as
  * a native Catalyst expression: rolling xxhash64 of character
  * `gram`-grams, minimum per sliding window of `window`, then the
  * DISTINCT-minima count and xor — the two scalars q_doc_winnow emits.
  *
  * Semantics are exactly the higher-order-function formulation the
  * query originally used (xxhash64(substring(text,i,gram)) → 4-way
  * least → array_distinct), and WinnowSpec pins that parity. The
  * rewrite exists because HOF lambdas run INTERPRETED per array
  * element: a 1,000-char doc paid ~2,000 Catalyst expression-tree
  * evaluations plus a substring allocation per position. Here the
  * whole pass is one compiled loop per row inside whole-stage codegen
  * — no per-position allocation, no closure dispatch — which is the
  * difference between a scan-speed fingerprint pass and a bottleneck
  * at 100 TB.
  */
case class WinnowStats(child: Expression, gram: Int, window: Int)
    extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_fingerprints", IntegerType, nullable = false),
    StructField("fp_xor", LongType, nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"winnow_stats requires a string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    Winnow.stats(input.asInstanceOf[UTF8String], gram, window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Winnow.stats($c, $gram, $window);")

  override protected def withNewChildInternal(newChild: Expression): WinnowStats =
    copy(child = newChild)
}

object Winnow {
  private val Seed = 42L // xxhash64 SQL function's fixed seed

  /** One compiled pass: gram hashes → sliding minima → distinct
    * (count, xor). Byte-level char boundaries (a UTF-8 char starts at
    * every non-continuation byte) reproduce Spark's character-counted
    * `length`/`substring` semantics without per-position substrings. */
  def stats(s: UTF8String, gram: Int, window: Int): InternalRow = {
    val bytes = s.getBytes
    val nBytes = bytes.length
    // char-start byte offsets (code points == non-continuation bytes)
    var nChars = 0
    var b = 0
    while (b < nBytes) {
      if ((bytes(b) & 0xc0) != 0x80) nChars += 1
      b += 1
    }
    val starts = new Array[Int](nChars + 1)
    var ci = 0
    b = 0
    while (b < nBytes) {
      if ((bytes(b) & 0xc0) != 0x80) { starts(ci) = b; ci += 1 }
      b += 1
    }
    starts(nChars) = nBytes

    val grams: Array[Long] =
      if (nChars >= gram) {
        val out = new Array[Long](nChars - gram + 1)
        var i = 0
        while (i < out.length) {
          val s0 = starts(i)
          out(i) = XXH64.hashUnsafeBytes(
            bytes, Platform.BYTE_ARRAY_OFFSET + s0, starts(i + gram) - s0, Seed)
          i += 1
        }
        out
      } else Array(XXH64.hashUTF8String(s, Seed))

    val minima: Array[Long] =
      if (grams.length >= window) {
        val out = new Array[Long](grams.length - window + 1)
        var j = 0
        while (j < out.length) {
          var m = grams(j)
          var k = 1
          while (k < window) {
            if (grams(j + k) < m) m = grams(j + k)
            k += 1
          }
          out(j) = m
          j += 1
        }
        out
      } else {
        var m = grams(0)
        var k = 1
        while (k < grams.length) { if (grams(k) < m) m = grams(k); k += 1 }
        Array(m)
      }

    // count + xor are order-independent, so distinct via a primitive
    // sort — no boxed HashSet allocation on the per-row hot path
    java.util.Arrays.sort(minima)
    var xor = 0L
    var n = 0
    var j = 0
    while (j < minima.length) {
      if (j == 0 || minima(j) != minima(j - 1)) { xor ^= minima(j); n += 1 }
      j += 1
    }
    InternalRow(n, xor)
  }

  /** Column-level entry point: `winnowStats($"text")`. */
  def winnowStats(c: Column, gram: Int = 8, window: Int = 4): Column =
    graftshim.toColumn(WinnowStats(graftshim.toExpression(c), gram, window))

  /** SQL registration: `winnow_stats(text[, gram, window])` — the 1-arg
    * form uses the q_doc_winnow defaults (gram=8, window=4); the 3-arg
    * form takes integer literals for both. Any other arity is an
    * analysis-time error (extras used to be silently ignored). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    graftshim.registerExpression(spark, "winnow_stats", exprs => {
      def intLit(e: Expression, what: String): Int = e match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
        case other => throw new IllegalArgumentException(
          s"winnow_stats: $what must be an integer literal, got $other")
      }
      exprs match {
        case Seq(text) => WinnowStats(text, 8, 4)
        case Seq(text, g, w) =>
          WinnowStats(text, intLit(g, "gram"), intLit(w, "window"))
        case _ => throw new IllegalArgumentException(
          "Invalid number of arguments for function winnow_stats: " +
            s"expected 1 or 3, got ${exprs.length}")
      }
    })
}
