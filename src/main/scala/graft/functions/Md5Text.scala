package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftshim

/** Compiled single-pass twins of the md5-family per-row pipelines.
  *
  * Three oracle-gated queries (q_doc_winnow_oracle, q_dedup_simhash,
  * q_dedup_simhash_oracle) derived a per-document scalar through an
  * interpreted path — `transform(sequence(...), i -> md5(...))` HOF
  * lambdas evaluated per character position, or an `explode(split())`
  * row blow-up feeding a 32-sum groupBy whose only job was to undo the
  * explode. Both shapes pay per-element Catalyst dispatch plus
  * allocation (a substring + hex string + decimal-parse per element)
  * for what is a pure function of one row. Each expression here is the
  * SAME integer-exact computation as one compiled loop inside
  * whole-stage codegen: no per-position allocation beyond the digest,
  * no shuffle, no explode. Parity with the original formulations is
  * pinned by Md5TextSpec against the literal HOF/groupBy chains.
  *
  * The md5-derived 32-bit hash (`first 8 md5 hex chars as an unsigned
  * int`) is the suite's cross-engine idiom: DuckDB replays it
  * bit-identically, which is the whole reason these queries exist
  * beside their xxhash64 scale twins.
  */
object Md5Text {

  /** Per-thread digest: MessageDigest.getInstance per row would
    * dominate the loop; digests are stateful, hence thread-local. */
  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** First 4 md5 digest bytes of bytes[off, off+len) as an unsigned
    * 32-bit value in a long — exactly
    * `CAST(conv(substring(md5(s), 1, 8), 16, 10) AS LONG)`. */
  private def md5u32(md: MessageDigest, out: Array[Byte],
      bytes: Array[Byte], off: Int, len: Int): Long = {
    md.reset()
    md.update(bytes, off, len)
    try md.digest(out, 0, 16) catch {
      case e: java.security.DigestException => throw new RuntimeException(e)
    }
    ((out(0) & 0xffL) << 24) | ((out(1) & 0xffL) << 16) |
      ((out(2) & 0xffL) << 8) | (out(3) & 0xffL)
  }

  /** Winnowing stats with the md5-u32 gram hash — the compiled form of
    * q_doc_winnow_oracle's HOF chain (grams of `gram` chars, sliding
    * minima of `window`, distinct count + xor). Character boundaries
    * are non-continuation UTF-8 bytes, the [[Winnow.stats]] device. */
  def winnowMd5(s: UTF8String, gram: Int, window: Int): InternalRow = {
    val md = md5Local.get()
    val digest = new Array[Byte](16)
    val bytes = s.getBytes
    val nBytes = bytes.length
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
          out(i) = md5u32(md, digest, bytes, s0, starts(i + gram) - s0)
          i += 1
        }
        out
      } else Array(md5u32(md, digest, bytes, 0, nBytes))

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

    // count + xor are order-independent → distinct via primitive sort
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

  private val XxSeed = 42L // the SQL xxhash64 fixed seed

  /** SimHash over space-split tokens. `bits` is 64 (token hash =
    * xxhash64, the scale path) or 32 (token hash = md5-u32, the DuckDB
    * twin). Tokenization replicates `explode(split(text, ' '))` with
    * Spark's limit=-1 semantics exactly: a token boundary at EVERY
    * space byte, empty tokens (leading / trailing / between doubled
    * spaces) kept and hashed — so the vote count nw = nSpaces + 1.
    * Bit b of the result is set iff 2·ones_b > nw (ties → 0), the
    * majority-vote rule both replaced groupBy formulations encode. */
  def simhash(s: UTF8String, bits: Int): Long = {
    val md = if (bits <= 32) md5Local.get() else null
    val digest = if (bits <= 32) new Array[Byte](16) else null
    val bytes = s.getBytes
    val nBytes = bytes.length
    val ones = new Array[Int](bits)
    var nw = 0
    var start = 0
    var i = 0
    while (i <= nBytes) {
      // a 0x20 byte is always a real space in UTF-8 (continuation
      // bytes have the high bit set), so byte scanning is exact
      if (i == nBytes || bytes(i) == 0x20) {
        val wh =
          if (bits <= 32) md5u32(md, digest, bytes, start, i - start)
          else XXH64.hashUnsafeBytes(
            bytes, Platform.BYTE_ARRAY_OFFSET + start, i - start, XxSeed)
        var b = 0
        while (b < bits) {
          if (((wh >>> b) & 1L) != 0L) ones(b) += 1
          b += 1
        }
        nw += 1
        start = i + 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < bits) {
      if (2 * ones(b) > nw) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** Column entry points. */
  def winnowMd5Stats(c: Column, gram: Int = 8, window: Int = 4): Column =
    graftshim.toColumn(Md5WinnowStats(graftshim.toExpression(c), gram, window))
  def simhash64(c: Column): Column =
    graftshim.toColumn(SimHashText(graftshim.toExpression(c), 64))
  def simhashMd5_32(c: Column): Column =
    graftshim.toColumn(SimHashText(graftshim.toExpression(c), 32))
}

/** q_doc_winnow_oracle's per-row pipeline as one codegen expression —
  * the [[WinnowStats]] template with the md5-u32 gram hash. */
case class Md5WinnowStats(child: Expression, gram: Int, window: Int)
    extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_fingerprints", IntegerType, nullable = false),
    StructField("fp_xor", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"md5_winnow_stats requires a string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    Md5Text.winnowMd5(input.asInstanceOf[UTF8String], gram, window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Md5Text.winnowMd5($c, $gram, $window);")

  override protected def withNewChildInternal(newChild: Expression): Md5WinnowStats =
    copy(child = newChild)
}

/** Per-document SimHash signature as one codegen expression — replaces
  * the explode(split) → 32-sum groupBy round trip (a corpus-sized
  * shuffle whose only purpose was to undo the explode) with per-row
  * expression work: zero exchanges before the band join. */
case class SimHashText(child: Expression, bits: Int)
    extends UnaryExpression {
  require(bits == 32 || bits == 64, s"simhash bits must be 32 or 64, got $bits")
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash requires a string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    Md5Text.simhash(input.asInstanceOf[UTF8String], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Md5Text.simhash($c, $bits);")

  override protected def withNewChildInternal(newChild: Expression): SimHashText =
    copy(child = newChild)
}
