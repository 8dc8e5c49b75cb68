package graft

import org.apache.spark.sql.functions._
import graft.queries.RelationalQueries

/** One-level skew-recursion evidence for the two-pass histogram
  * narrowing (VERDICT round-15 task #5). The driver SFs are too
  * uniform for the recursion to fire, so this spec synthesizes the
  * hostile shapes — a column that is 99% one VALUE (the hot bucket
  * short-circuits from its bounds, zero pass-2 rows) and a column 99%
  * concentrated in one bucket's WIDTH but distinct inside it (the
  * bucket re-histograms; the SkewSpec key-grain argument shows the
  * pass-2 window partitions shrink to O(n_hot/nBuckets)) — and proves
  * both stay EXACTLY equal to the sorted-array order statistics, i.e.
  * the oracle hash could not change. */
class HistogramQuantilesSpec extends SparkSpec {

  // 0.001 lands in the 1%-outlier tail (normal-bucket path); the rest
  // land in the hot bucket (direct / sub-narrowed paths)
  private val ps = Seq(0.001, 0.5, 0.9, 0.99)

  private def model(values: Array[Double], p: Double): Double = {
    val sorted = values.sorted
    val pos = p * (sorted.length - 1)
    val lo = sorted(math.floor(pos).toInt)
    val hi = sorted(math.ceil(pos).toInt)
    lo + (hi - lo) * (pos - math.floor(pos))
  }

  test("99%-one-value column: hot bucket short-circuits, result exact") {
    val ss = spark
    import ss.implicits._
    val rnd = new scala.util.Random(15)
    // outliers live in [0, 20) — strictly OUTSIDE the hot bucket's
    // width, so the hot bucket's actual min == max == 42.0 and every
    // rank in it resolves from the bounds pass alone
    val vals = Array.fill(200000)(
      if (rnd.nextInt(100) == 0) rnd.nextDouble() * 20.0 else 42.0)
    val got = RelationalQueries
      .histogramQuantiles(vals.toSeq.toDF("x"), "x", ps).get
    ps.zip(got).foreach { case (p, g) =>
      assert(g == model(vals, p), s"p=$p: $g vs ${model(vals, p)}")
    }
    // the fixture must actually exceed the recursion cutoff
    val n = vals.length
    val hot = vals.count(_ == 42.0)
    assert(hot > math.max(4096L, 16L * (n / 2048 + 1)),
      s"fixture not hot enough: $hot of $n")
  }

  test("dense-narrow bucket re-histograms: pass-2 grain is O(n/nBuckets)") {
    val ss = spark
    import ss.implicits._
    val rnd = new scala.util.Random(16)
    // outliers avoid the hot bucket's width entirely ([0,40) and
    // (60,100]) so the re-histogram's [min,max] is the dense span
    // itself — the pure form of the recursion's grain claim (an
    // in-bucket outlier would stretch the sub-range and dilute the
    // shrink to the spread ratio, still a ~60x win, just noisier)
    val vals = Array.fill(200000)(
      if (rnd.nextInt(100) == 0) {
        val u = rnd.nextDouble()
        if (u < 0.5) u * 80.0 else 60.0 + (u - 0.5) * 80.0
      } else 50.0 + rnd.nextDouble() * 0.001)
    val got = RelationalQueries
      .histogramQuantiles(vals.toSeq.toDF("x"), "x", ps).get
    ps.zip(got).foreach { case (p, g) =>
      assert(g == model(vals, p), s"p=$p: $g vs ${model(vals, p)}")
    }
    // key-grain evidence (the SkewSpec technique: a window partition
    // receives ALL rows of its key): the plain bucket key concentrates
    // ~99% of rows in one partition; the (bucket, sub-bucket) key the
    // recursion ranks on bounds every cell far below that
    val nB = 2048
    val mn = vals.min; val mx = vals.max; val w = (mx - mn) / nB
    def bucket(x: Double) =
      math.min(math.max(math.floor((x - mn) / w).toInt, 0), nB - 1)
    val hotB = vals.groupBy(bucket).maxBy(_._2.length)._1
    val hotRows = vals.filter(v => bucket(v) == hotB)
    assert(hotRows.length > vals.length * 9 / 10,
      s"fixture: one bucket must be hot, got ${hotRows.length}")
    val bmn = hotRows.min; val bmx = hotRows.max; val ws = (bmx - bmn) / nB
    val subMax = hotRows.groupBy(v =>
        math.min(math.max(math.floor((v - bmn) / ws).toInt, 0), nB - 1))
      .values.map(_.length).max
    assert(subMax <= hotRows.length / 512,
      s"sub-bucket grain $subMax of ${hotRows.length} — re-histogram " +
        "did not shrink the hot bucket's rank-window input")
  }

  test("grouped narrowing: a skewed group beside a uniform one, both exact") {
    val ss = spark
    import ss.implicits._
    val rnd = new scala.util.Random(17)
    val rows =
      Array.fill(120000)(("hot",
        if (rnd.nextInt(100) == 0) rnd.nextDouble() * 20.0 else 42.0)) ++
        Array.fill(20000)(("uni", rnd.nextDouble() * 100.0))
    val out = RelationalQueries.histogramQuantilesGrouped(
        rows.toSeq.toDF("g", "x"), "g", "x",
        Seq(0.25, 0.5, 0.9), Seq("p25", "p50", "p90"))
      .collect()
      .map(r => r.getString(0)
        -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    def m(g: String, p: Double): Double = {
      val vs = rows.filter(_._1 == g).map(_._2)
      BigDecimal(model(vs, p))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    Seq("hot", "uni").foreach { g =>
      assert(out(g)._1 == m(g, 0.25), s"$g p25: ${out(g)._1} vs ${m(g, 0.25)}")
      assert(out(g)._2 == m(g, 0.5), s"$g p50: ${out(g)._2} vs ${m(g, 0.5)}")
      assert(out(g)._3 == m(g, 0.9), s"$g p90: ${out(g)._3} vs ${m(g, 0.9)}")
    }
  }
}
