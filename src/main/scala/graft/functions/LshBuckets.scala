package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}
import org.apache.spark.sql.graftshim

/** Random-hyperplane LSH bucket ids for a float embedding, as a native
  * codegen expression: one bucket per hash table, bucket = the packed
  * sign bits of the vector's projections onto that table's hyperplanes.
  *
  * Replaces the `transform(planes, p -> CASE WHEN aggregate(zip_with(
  * ...)) >= 0 ...)` chain in q_knn_lsh — HOF lambdas evaluate
  * interpreted per element, so every row paid tables × bits × dims
  * interpreted multiplies. Arithmetic is identical (per-index
  * double(x_i) * h_i accumulated left-to-right, sign at >= 0, bit b
  * weighted 2^b), so bucket assignments — and the recall tests pinned
  * to them — are bit-for-bit unchanged. The hyperplanes ride along as
  * a plan-serialized reference object (a few KB, broadcast once with
  * the plan, exactly like the typedLit they replace).
  */
case class LshBuckets(child: Expression, planes: IndexedSeq[Double],
    nTables: Int, bitsPerTable: Int) extends UnaryExpression {
  require(planes.length % (nTables * bitsPerTable) == 0,
    s"planes length ${planes.length} not divisible by ${nTables * bitsPerTable} hyperplanes")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"lsh_buckets requires an array<float> input, got $t")
  }

  private lazy val planesArr: Array[Double] = planes.toArray

  override def nullSafeEval(input: Any): Any =
    LshBuckets.buckets(input.asInstanceOf[ArrayData], planesArr, nTables, bitsPerTable)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planesArr, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.LshBuckets.buckets($c, $planesRef, $nTables, $bitsPerTable);")
  }

  override protected def withNewChildInternal(newChild: Expression): LshBuckets =
    copy(child = newChild)
}

object LshBuckets {
  /** Projections of `emb` onto table `table`'s hyperplanes — THE single
    * definition of the projection arithmetic (index-ascending
    * accumulation, double math): shared by the codegen bucket
    * expression and the driver-side multi-probe planner
    * (SimilarityQueries.lshCandidates), so probe buckets can never
    * silently desync from corpus buckets if the plane layout or
    * accumulation order ever changes. */
  def tableProjection(emb: Array[Double], planes: Array[Double],
      table: Int, bitsPerTable: Int): Array[Double] = {
    val dims = emb.length
    val out = new Array[Double](bitsPerTable)
    var b = 0
    while (b < bitsPerTable) {
      val off = (table * bitsPerTable + b) * dims
      var acc = 0.0
      var i = 0
      while (i < dims) { acc += emb(i) * planes(off + i); i += 1 }
      out(b) = acc
      b += 1
    }
    out
  }

  /** Packed sign bits of a projection vector: bit b set iff
    * projection b is >= 0 — the other half of the shared bucket rule. */
  def packSigns(proj: Array[Double]): Long = {
    var bucket = 0L
    var b = 0
    while (b < proj.length) {
      if (proj(b) >= 0.0) bucket += 1L << b
      b += 1
    }
    bucket
  }

  def buckets(emb: ArrayData, planes: Array[Double], nTables: Int,
      bitsPerTable: Int): ArrayData = {
    val dims = planes.length / (nTables * bitsPerTable)
    // fail loudly on a short/long embedding rather than silently
    // projecting a truncated prefix: a truncated projection yields a
    // PLAUSIBLE but wrong bucket id, which would quietly break recall;
    // the HOF formulation this replaced degraded differently (null-
    // poisoned aggregate → all sign bits 0), so there is no silent
    // behavior worth preserving — corrupt input is an error.
    val n = emb.numElements()
    if (n != dims) throw new IllegalArgumentException(
      s"lsh_buckets: embedding has $n dims, hyperplanes expect $dims")
    val arr = new Array[Double](n)
    var i = 0
    while (i < n) { arr(i) = emb.getFloat(i).toDouble; i += 1 }
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      out(t) = packSigns(tableProjection(arr, planes, t, bitsPerTable))
      t += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Column-level entry point. `planes` is flattened row-major:
    * hyperplane k occupies indices [k*dims, (k+1)*dims). */
  def lshBuckets(c: Column, planes: IndexedSeq[Double], nTables: Int,
      bitsPerTable: Int): Column =
    graftshim.toColumn(
      LshBuckets(graftshim.toExpression(c), planes, nTables, bitsPerTable))
}
