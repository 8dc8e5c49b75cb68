package graft

import org.apache.spark.sql.functions._
import graft.functions.Geohash

/** Geohash codegen expression: published encoding vectors, the
  * decode-containment property on random coordinates, SQL
  * registration, and null/precision edge handling. */
class GeohashSpec extends SparkSpec {

  test("published vectors encode correctly") {
    // the geohash.org canonical example and the Wikipedia article's
    assert(Geohash.encode(57.64911, 10.40744, 11) == "u4pruydqqvj")
    assert(Geohash.encode(42.605, -5.603, 5) == "ezs42")
    // prefix property: lower precision is a strict prefix
    assert(Geohash.encode(57.64911, 10.40744, 5) == "u4pru")
    assert(Geohash.encode(42.605, -5.603, 3) == "ezs")
  }

  test("decode-containment: every random point lies in its cell box") {
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val lat = rnd.nextDouble() * 180 - 90
      val lon = rnd.nextDouble() * 360 - 180
      val p = 1 + rnd.nextInt(9)
      val cell = Geohash.encode(lat, lon, p)
      assert(cell.length == p)
      // independent decode: walk the cell string back to its box
      val b32 = "0123456789bcdefghjkmnpqrstuvwxyz"
      var latLo = -90.0; var latHi = 90.0
      var lonLo = -180.0; var lonHi = 180.0
      var isLon = true
      cell.foreach { c =>
        val v = b32.indexOf(c)
        assert(v >= 0, s"invalid geohash char $c")
        (4 to 0 by -1).foreach { i =>
          val bit = (v >> i) & 1
          if (isLon) {
            val mid = (lonLo + lonHi) / 2
            if (bit == 1) lonLo = mid else lonHi = mid
          } else {
            val mid = (latLo + latHi) / 2
            if (bit == 1) latLo = mid else latHi = mid
          }
          isLon = !isLon
        }
      }
      assert(lat >= latLo && lat < latHi, s"lat $lat outside [$latLo,$latHi) of $cell")
      assert(lon >= lonLo && lon < lonHi, s"lon $lon outside [$lonLo,$lonHi) of $cell")
    }
  }

  test("column and SQL paths agree with the static encoder") {
    val s = spark
    import s.implicits._
    Geohash.register(spark)
    val df = Seq((57.64911, 10.40744), (42.605, -5.603), (0.0, 0.0))
      .toDF("lat", "lon")
    val viaCol = df.select(
      Geohash.geohashOf(col("lat"), col("lon"), lit(6)).as("g"))
      .collect().map(_.getString(0)).toSeq
    df.createOrReplaceTempView("pts")
    val viaSql = spark.sql("SELECT geohash(lat, lon, 6) AS g FROM pts")
      .collect().map(_.getString(0)).toSeq
    val want = Seq((57.64911, 10.40744), (42.605, -5.603), (0.0, 0.0))
      .map { case (la, lo) => Geohash.encode(la, lo, 6) }
    assert(viaCol == want && viaSql == want)
  }

  test("null inputs yield null; precision clamps to 1..12") {
    val s = spark
    import s.implicits._
    val df = Seq((Some(1.0), Some(2.0)), (None, Some(2.0)))
      .toDF("lat", "lon")
    val out = df.select(
      Geohash.geohashOf(col("lat"), col("lon"), lit(5)).as("g"))
      .collect()
    assert(out(0).getString(0) == Geohash.encode(1.0, 2.0, 5))
    assert(out(1).isNullAt(0))
    assert(Geohash.encode(1.0, 2.0, 99).length == 12)
    assert(Geohash.encode(1.0, 2.0, -3).length == 1)
  }
}
