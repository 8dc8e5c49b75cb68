package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftshim

/** Geohash encoding (the public base-32 bisection construction,
  * geohash.org / Niemeyer 2008): interleave longitude/latitude
  * bisection bits starting with longitude, emit 5 bits per base-32
  * character.
  *
  * Why it matters at 100 TB: a geohash PREFIX is a spatial container —
  * rows sharing a k-char prefix sit in one lat/lon rectangle — so
  * geohash strings make spatial data range-partitionable, prefix-
  * prunable (parquet min/max on the string column bounds a box, the
  * same mechanism [[ZOrder]] gives integer dimensions), and joinable
  * at a chosen resolution by `substring`. Native codegen
  * `TernaryExpression` (same static-forwarder seam as [[ZOrder]] /
  * [[JaroWinkler]]) so grid keys compute inside the scan projection.
  *
  * Precision is clamped to 1..12 (12 chars = 60 bits, past double
  * resolution); null on null input via nullSafeEval.
  */
case class Geohash(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == DoubleType && second.dataType == DoubleType &&
        third.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"geohash requires (double lat, double lon, int precision), got " +
          s"(${first.dataType}, ${second.dataType}, ${third.dataType})")

  override def nullSafeEval(lat: Any, lon: Any, p: Any): Any =
    UTF8String.fromString(Geohash.encode(
      lat.asInstanceOf[Double], lon.asInstanceOf[Double],
      p.asInstanceOf[Int]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (la, lo, p) =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.functions.Geohash.encode((double) $la, (double) $lo, (int) $p));
         |""".stripMargin)

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Geohash =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object Geohash {
  private val B32 = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** Standard geohash of (lat, lon) at `precision` chars: alternating
    * longitude-first interval bisection, `>= mid` goes to the upper
    * half (the convention every published implementation shares). */
  def encode(lat: Double, lon: Double, precision: Int): String = {
    val p = math.max(1, math.min(12, precision))
    var latLo = -90.0; var latHi = 90.0
    var lonLo = -180.0; var lonHi = 180.0
    val sb = new java.lang.StringBuilder(p)
    var isLon = true
    var bits = 0
    var ch = 0
    while (sb.length < p) {
      if (isLon) {
        val mid = (lonLo + lonHi) / 2
        if (lon >= mid) { ch = (ch << 1) | 1; lonLo = mid }
        else { ch = ch << 1; lonHi = mid }
      } else {
        val mid = (latLo + latHi) / 2
        if (lat >= mid) { ch = (ch << 1) | 1; latLo = mid }
        else { ch = ch << 1; latHi = mid }
      }
      isLon = !isLon
      bits += 1
      if (bits == 5) { sb.append(B32.charAt(ch)); bits = 0; ch = 0 }
    }
    sb.toString
  }

  /** Column entry point: `geohashOf($"lat", $"lon", lit(5))`. */
  def geohashOf(lat: Column, lon: Column, precision: Column): Column =
    graftshim.toColumn(Geohash(
      graftshim.toExpression(lat), graftshim.toExpression(lon),
      graftshim.toExpression(precision)))

  /** SQL registration: `SELECT geohash(lat, lon, 5) FROM ...`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    graftshim.registerExpression(spark, "geohash", 3,
      exprs => Geohash(exprs.head, exprs(1), exprs(2)))
}
