package graft

import org.apache.spark.sql.functions._

/** The hash-seeded Poisson(1) draw behind q_bootstrap_poisson: the
  * oracle proves both engines draw IDENTICAL weights, but identical
  * constants could still encode the wrong distribution — this spec
  * pins the distribution itself against Poisson(1) theory.
  */
class PoissonBootstrapSpec extends SparkSpec {

  private val thresholds = Seq(1580030168L, 3160060337L, 3950075421L,
    4213413783L, 4279248373L, 4292415291L, 4294609777L, 4294923276L,
    4294962463L, 4294966817L)

  test("integer thresholds are floor(cdf_Poisson(1) * 2^32)") {
    var cum = 0.0
    var fact = 1.0
    val e1 = math.exp(-1.0)
    thresholds.zipWithIndex.foreach { case (t, k) =>
      if (k > 0) fact *= k
      cum += e1 / fact
      assert(t == math.floor(cum * 4294967296.0).toLong,
        s"threshold k=$k")
    }
  }

  test("hash-derived weights follow Poisson(1): mean ~1, pmf head matches") {
    val h = conv(substring(md5(concat(col("b"), lit(":"), col("id"))),
      1, 8), 16, 10).cast("long")
    val w = thresholds.zipWithIndex.foldRight(lit(10L)
        : org.apache.spark.sql.Column) {
      case ((t, k), tail) => when(h < t, k.toLong).otherwise(tail)
    }
    val n = 20000
    val stats = spark.range(0, n)
      .withColumn("b", explode(sequence(lit(1), lit(10))))
      .withColumn("w", w)
      .agg(avg("w").as("mean"),
        avg(when(col("w") === 0, 1.0).otherwise(0.0)).as("p0"),
        avg(when(col("w") === 1, 1.0).otherwise(0.0)).as("p1"),
        max("w").as("wmax"))
      .head()
    assert(math.abs(stats.getDouble(0) - 1.0) < 0.02, s"mean ${stats.getDouble(0)}")
    assert(math.abs(stats.getDouble(1) - math.exp(-1.0)) < 0.01, s"p0 ${stats.getDouble(1)}")
    assert(math.abs(stats.getDouble(2) - math.exp(-1.0)) < 0.01, s"p1 ${stats.getDouble(2)}")
    assert(stats.getLong(3) <= 10L)
  }

  test("poisson CI brackets the point estimate and the anchor's CI class") {
    val a = SparkEntry.queries("q_bootstrap_ci")(spark, sf).head()
    val p = SparkEntry.queries("q_bootstrap_poisson")(spark, sf).head()
    // same data, same statistic: identical n/point, CIs overlap
    assert(a.getLong(0) == p.getLong(0))
    assert(a.getDouble(1) == p.getDouble(1))
    val (lo, hi, pt) = (p.getDouble(2), p.getDouble(3), p.getDouble(1))
    assert(lo <= pt && pt <= hi, s"CI [$lo,$hi] must bracket $pt")
    // the two bootstraps' intervals must overlap (same target, B=200)
    assert(lo <= a.getDouble(3) && a.getDouble(2) <= hi,
      s"poisson [$lo,$hi] vs index [${a.getDouble(2)},${a.getDouble(3)}]")
  }
}
