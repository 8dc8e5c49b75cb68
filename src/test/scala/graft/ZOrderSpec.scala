package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.ZOrder
import graft.functions.ZOrder.zValue

/** Morton-code semantics + the layout property that justifies the
  * expression: sorting by z-value gives every bucket a compact 2-D
  * bounding box, where a single-column sort leaves the other dimension
  * unconstrained. */
class ZOrderSpec extends SparkSpec {

  test("pinned interleave values") {
    assert(ZOrder.interleave16(0, 0) == 0L)
    assert(ZOrder.interleave16(1, 0) == 1L)
    assert(ZOrder.interleave16(0, 1) == 2L)
    assert(ZOrder.interleave16(1, 1) == 3L)
    assert(ZOrder.interleave16(3, 0) == 5L)   // x bits land on even positions
    assert(ZOrder.interleave16(0, 3) == 10L)  // y bits land on odd positions
    assert(ZOrder.interleave16(0xFFFF, 0xFFFF) == 0xFFFFFFFFL)
    assert(ZOrder.interleave16(0x10000 + 7, 0) == 21L,
      "inputs must be masked to 16 bits (7 = 0b111 -> even bits 0,2,4)")
  }

  test("monotone-block property: quadrant bits dominate the code") {
    // if both coords < 2^k the code < 4^k; if either coord >= 2^k the
    // code >= 4^k — this is exactly why z-ranges map to aligned boxes.
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 500; k <- Seq(2, 5, 9, 13)) {
      val lim = 1 << k
      val (xs, ys) = (rnd.nextInt(lim), rnd.nextInt(lim))
      assert(ZOrder.interleave16(xs, ys) < (1L << (2 * k)))
      val big = lim + rnd.nextInt(65536 - lim)
      assert(ZOrder.interleave16(big, ys) >= (1L << (2 * k)))
      assert(ZOrder.interleave16(xs, big) >= (1L << (2 * k)))
    }
  }

  test("expression matches the scala scorer through codegen, and from SQL") {
    val s = spark
    import s.implicits._
    val df = Seq((3, 0), (0, 3), (12345, 54321), (65535, 1))
      .toDF("x", "y")
    df.select(col("x"), col("y"), zValue(col("x"), col("y")).as("z"))
      .collect().foreach { r =>
        assert(r.getLong(2) == ZOrder.interleave16(r.getInt(0), r.getInt(1)))
      }
    ZOrder.register(spark)
    assert(spark.sql("SELECT z_value(3, 0)").head().getLong(0) == 5L)
    val e = intercept[Exception](spark.sql("SELECT z_value(1)").collect())
    assert(e.getMessage.contains("z_value"), e.getMessage)
  }

  test("a 2-D range query touches far fewer z-sorted buckets than " +
      "single-column-sorted buckets") {
    // Uniform 64×64 grid split into 64 buckets of 64 rows. Under an
    // x-sort every bucket is a (1 × 64) stripe; under a z-sort every
    // bucket is an 8×8 block. An 8×8 range query therefore intersects
    // ≤4 z-buckets but ~8-9 x-stripes — this IS the file-pruning win:
    // bucket bboxes model parquet file min/max stats.
    val s = spark
    import s.implicits._
    val side = 64
    val pts = (0 until side * side).map(i => (i % side, i / side))
      .toDF("x", "y")
      .select(col("x"), col("y"), zValue(col("x"), col("y")).as("z"))

    def boxes(ordered: org.apache.spark.sql.DataFrame): Array[(Int, Int, Int, Int)] = {
      val w = Window.orderBy("ord")
      ordered
        .withColumn("bucket",
          ((row_number().over(w) - 1) / 64).cast("int"))
        .groupBy("bucket")
        .agg(min("x").as("x0"), max("x").as("x1"),
          min("y").as("y0"), max("y").as("y1"))
        .collect() // 64 bbox rows — stats-sized, like a file manifest
        .map(r => (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
    }

    val zBoxes = boxes(pts.withColumn("ord", col("z")))
    val xBoxes = boxes(pts.withColumn("ord", col("x") * 100000L + col("y")))

    val rnd = new scala.util.Random(11)
    var zTouched = 0L
    var xTouched = 0L
    for (_ <- 1 to 50) {
      val (qx, qy) = (rnd.nextInt(side - 8), rnd.nextInt(side - 8))
      def hits(bs: Array[(Int, Int, Int, Int)]): Int = bs.count {
        case (x0, x1, y0, y1) =>
          x0 <= qx + 7 && x1 >= qx && y0 <= qy + 7 && y1 >= qy
      }
      zTouched += hits(zBoxes)
      xTouched += hits(xBoxes)
    }
    assert(zTouched * 2 <= xTouched,
      s"z-order should touch ≤half the buckets: z=$zTouched x=$xTouched")
  }
}
