package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftshim

/** Sliding w-token window hashes for the exact-substring dedup family —
  * the compiled form of q_dedup_substr's per-position
  * `md5(concat_ws(" ", slice(split(text, ' '), p, w)))` chain.
  *
  * The interpreted original paid, per token position: an array slice, a
  * concat allocation, an md5 digest and a 32-char hex string — and the
  * exploded relation then shuffled that string. One compiled pass per
  * row replaces all of it: token boundaries are the 0x20 bytes (a space
  * byte can never be a UTF-8 continuation byte, so byte scanning is
  * exact, and `split(text, ' ')` keeps empty tokens — every gap between
  * adjacent token starts is exactly one space byte). That makes the
  * joined w-token slice IDENTICAL to the raw byte span from token p's
  * first byte to token (p+w−1)'s last byte, so hashing the span in
  * place needs no slice, no concat, no digest object. The hash is
  * xxhash64 (the scaladoc'd 100 TB swap: 8 bytes on the wire instead of
  * a 32-char md5 string — guide §2.3 "narrower types"); `h` is
  * internal-only (compared for equality, never emitted), so the
  * query's RESULT — the merged overlap extents — is unchanged, which
  * the DuckDB oracle (still md5-based) gates at both SFs.
  *
  * Emits struct(nw: long = token count, hs: array<long> of the
  * nw−w+1 window hashes; empty when nw < w — the caller's
  * `size(ws) >= w` filter falls out of the empty explode).
  */
object TokenWindows {

  private val XxSeed = 42L // the SQL xxhash64 fixed seed

  def windowHashes(s: UTF8String, w: Int): InternalRow = {
    val bytes = s.getBytes
    val n = bytes.length
    var nTok = 1
    var i = 0
    while (i < n) { if (bytes(i) == 0x20) nTok += 1; i += 1 }
    val starts = new Array[Int](nTok + 1)
    starts(0) = 0
    var t = 1
    i = 0
    while (i < n) { if (bytes(i) == 0x20) { starts(t) = i + 1; t += 1 }; i += 1 }
    // sentinel: token j ends at starts(j+1) − 1 (the byte before its
    // trailing space); the last token ends at n
    starts(nTok) = n + 1
    val nWin = nTok - w + 1
    val hs =
      if (nWin <= 0) Array.emptyLongArray
      else {
        val out = new Array[Long](nWin)
        var j = 0
        while (j < nWin) {
          val st = starts(j)
          val en = starts(j + w) - 1
          out(j) = XXH64.hashUnsafeBytes(
            bytes, Platform.BYTE_ARRAY_OFFSET + st, en - st, XxSeed)
          j += 1
        }
        out
      }
    InternalRow(nTok.toLong, ArrayData.toArrayData(hs))
  }

  /** Column entry point. */
  def tokenWindowHashes(c: Column, w: Int): Column =
    graftshim.toColumn(TokenWindowHashes(graftshim.toExpression(c), w))
}

case class TokenWindowHashes(child: Expression, w: Int)
    extends UnaryExpression {
  require(w >= 1, s"window must be >= 1 token, got $w")

  override def dataType: DataType = StructType(Seq(
    StructField("nw", LongType, nullable = false),
    StructField("hs", ArrayType(LongType, containsNull = false),
      nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"token_window_hashes requires a string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    TokenWindows.windowHashes(input.asInstanceOf[UTF8String], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenWindows.windowHashes($c, $w);")

  override protected def withNewChildInternal(newChild: Expression): TokenWindowHashes =
    copy(child = newChild)
}
