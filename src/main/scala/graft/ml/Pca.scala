package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.DotF.dotF

/** Distributed PCA for embedding columns.
  *
  * Scale shape (the MlpRegressor recipe — see MlpRegressor.scala:33):
  * ONE pass over the data accumulates the d-vector sum and the d×d Gram
  * matrix per partition, merged by `treeAggregate` — the shuffle payload
  * is d + d² doubles per partition (d = 64 → 33 KB), independent of row
  * count, and no row ever reaches the driver. The eigendecomposition is
  * driver-side cyclic Jacobi on the d×d covariance (d³ ≈ 260k flops —
  * free), which is the correct split at 100 TB: data-sized work
  * distributed, model-sized work local.
  *
  * Projection is expression-level: centering commutes with the dot
  * product (pc_j(x) = ⟨x, c_j⟩ − ⟨μ, c_j⟩), so transform() is one
  * codegen [[graft.functions.DotF]] per component against a literal —
  * zero shuffle, no UDF.
  *
  * Sign convention: each component's largest-|entry| coordinate is made
  * positive, so fitted axes are deterministic (eigenvectors are defined
  * only up to sign).
  */
object Pca {

  final case class PcaModel(
      mean: Array[Double],
      components: Array[Array[Double]],   // k rows, each a unit d-vector
      variances: Array[Double]) {         // descending eigenvalues, all d

    /** Explained-variance ratio of the kept components. */
    def explainedRatio: Double = {
      val tot = variances.sum
      if (tot <= 0) 0.0 else variances.take(components.length).sum / tot
    }

    /** Append pc1..pck columns (centered projections) to `df`. */
    def transform(df: DataFrame, embedCol: String): DataFrame =
      components.zipWithIndex.foldLeft(df) { case (acc, (c, j)) =>
        val litC: Column = lit(c.map(_.toFloat))
        val offset = c.zip(mean).map { case (ci, mi) => ci * mi }.sum
        acc.withColumn(s"pc${j + 1}",
          dotF(col(embedCol).cast("array<float>"), litC) - lit(offset))
      }
  }

  /** Fit a k-component PCA on `embedCol` (array<float> or array<double>). */
  def fit(df: DataFrame, embedCol: String, k: Int): PcaModel = {
    val rows = df.select(col(embedCol).cast("array<double>")).rdd
      .map(_.getSeq[Double](0).toArray)
    val d = rows.first().length
    require(k >= 1 && k <= d, s"pca: k must be in [1, $d], got $k")

    // (sum[d], gram[d*d] lower triangle packed row-major, n)
    val zero = (new Array[Double](d), new Array[Double](d * (d + 1) / 2), 0L)
    val (sum, tri, n) = rows.treeAggregate(zero)(
      seqOp = { case ((s, g, c), x) =>
        require(x.length == d, s"pca: ragged embedding (${x.length} vs $d)")
        var i = 0
        var p = 0
        while (i < d) {
          s(i) += x(i)
          var j = 0
          while (j <= i) { g(p) += x(i) * x(j); j += 1; p += 1 }
          i += 1
        }
        (s, g, c + 1)
      },
      combOp = { case ((s1, g1, c1), (s2, g2, c2)) =>
        var i = 0
        while (i < s1.length) { s1(i) += s2(i); i += 1 }
        var p = 0
        while (p < g1.length) { g1(p) += g2(p); p += 1 }
        (s1, g1, c1 + c2)
      })
    require(n >= 2, s"pca: need at least 2 rows, got $n")

    val mean = sum.map(_ / n)
    // sample covariance: (Σxxᵀ − n·μμᵀ) / (n − 1), unpacked symmetric
    val cov = Array.ofDim[Double](d, d)
    var i = 0
    var p = 0
    while (i < d) {
      var j = 0
      while (j <= i) {
        val v = (tri(p) - n * mean(i) * mean(j)) / (n - 1)
        cov(i)(j) = v
        cov(j)(i) = v
        j += 1
        p += 1
      }
      i += 1
    }

    val (values, vectors) = jacobiEigSym(cov)
    val order = values.indices.sortBy(idx => -values(idx))
    val comps = order.take(k).map { idx =>
      val v = Array.tabulate(d)(r => vectors(r)(idx))
      // deterministic sign: largest-|entry| coordinate positive
      val m = v.indices.maxBy(a => math.abs(v(a)))
      if (v(m) < 0) v.map(-_) else v
    }.toArray
    PcaModel(mean, comps, order.map(values).toArray)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
    * (eigenvalues, eigenvector matrix with vectors in COLUMNS). The
    * classical O(d³)-per-sweep rotation scheme (Golub & Van Loan §8.5);
    * converges quadratically, 6-10 sweeps at d = 64. */
  private[graft] def jacobiEigSym(m: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = m.map(_.clone())
    val v = Array.tabulate(d, d)((r, c) => if (r == c) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    val tol = 1e-11 * (1.0 + a.map(r => r.map(math.abs).max).max)
    while (off > tol && sweep < 50) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            // sgn(0) must be +1 (θ = 0 is the 45° rotation, not identity)
            val sg = if (theta >= 0) 1.0 else -1.0
            val t = sg / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var r = 0
            while (r < d) {
              val arp = a(r)(p); val arq = a(r)(q)
              a(r)(p) = c * arp - s * arq
              a(r)(q) = s * arp + c * arq
              r += 1
            }
            r = 0
            while (r < d) {
              val apr = a(p)(r); val aqr = a(q)(r)
              a(p)(r) = c * apr - s * aqr
              a(q)(r) = s * apr + c * aqr
              val vrp = v(r)(p); val vrq = v(r)(q)
              v(r)(p) = c * vrp - s * vrq
              v(r)(q) = s * vrp + c * vrq
              r += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    (Array.tabulate(d)(idx => a(idx)(idx)), v)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = 0
      while (j < a.length) {
        if (i != j) s += a(i)(j) * a(i)(j)
        j += 1
      }
      i += 1
    }
    math.sqrt(s)
  }
}
