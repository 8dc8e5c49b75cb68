package graft

import graft.ml.Pca
import graft.queries.CorpusStatsQueries

/** Closed-form pins for the distributed PCA: a constructed anisotropic
  * cloud with known principal axes, plus orthonormality and
  * explained-variance properties, plus the q_pca_project surface on the
  * real embeddings table. */
class PcaSpec extends SparkSpec {

  test("jacobi solves a known 2x2 eigenproblem exactly") {
    // [[2,1],[1,2]] → eigenvalues 3 (along (1,1)/√2) and 1
    val (vals, vecs) = Pca.jacobiEigSym(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    val sorted = vals.sorted.reverse
    assert(math.abs(sorted(0) - 3.0) < 1e-12 && math.abs(sorted(1) - 1.0) < 1e-12)
    val top = if (vals(0) > vals(1)) 0 else 1
    val v = Array(vecs(0)(top), vecs(1)(top))
    assert(math.abs(math.abs(v(0)) - math.sqrt(0.5)) < 1e-12)
    assert(math.abs(v(0) - v(1)) < 1e-12, "eigenvector of 3 is along (1,1)")
  }

  test("fit recovers planted axes in variance order, sign-deterministic") {
    // points t·v1 + u·v2 with var(t) ≫ var(u); v1 = (0.6, 0, 0.8),
    // v2 = (0, 1, 0) — orthonormal by construction. u must be an EVEN
    // function of i so the in-sample cross-covariance Σ t·u vanishes by
    // symmetry — any t-u correlation tilts the true sample principal
    // axis off the planted v1 and the 1e-6 recovery pin becomes wrong.
    val ts = (-10 to 10).map(_.toDouble)
    val us = (-10 to 10).map(i => ((i * i) % 5).toDouble * 0.1)
    val rows = ts.zip(us).zipWithIndex.map { case ((t, u), i) =>
      (i.toLong, Array((0.6 * t).toFloat, u.toFloat, (0.8 * t).toFloat))
    }
    val df = spark.createDataFrame(rows).toDF("vec_id", "embedding")
    val m = Pca.fit(df, "embedding", 2)
    // component 1 = ±v1 with the largest-|entry| (index 2, 0.8) positive
    assert(math.abs(m.components(0)(0) - 0.6) < 1e-6)
    assert(math.abs(m.components(0)(1)) < 1e-6)
    assert(math.abs(m.components(0)(2) - 0.8) < 1e-6)
    // component 2 = v2 (sign convention makes its entry +1)
    assert(math.abs(m.components(1)(1) - 1.0) < 1e-6)
    assert(m.variances(0) > m.variances(1) && m.variances(1) > m.variances(2) - 1e-12)
    assert(m.explainedRatio > 0.999, s"two axes carry all variance: ${m.explainedRatio}")
    // projection values: pc1(x) = ⟨x − μ, v1⟩ = 0.6·x0 + 0.8·x2 (μ = 0 here)
    val pcs = m.transform(df, "embedding").select("vec_id", "pc1")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    ts.zipWithIndex.foreach { case (t, i) =>
      assert(math.abs(pcs(i.toLong) - t) < 1e-4, s"pc1 of t=$t read ${pcs(i.toLong)}")
    }
  }

  test("components are orthonormal on real embeddings; ratios descend") {
    val m = Pca.fit(Tables.embeddings(spark, sf), "embedding", 4)
    for (a <- 0 until 4; b <- a until 4) {
      val dot = m.components(a).zip(m.components(b)).map { case (x, y) => x * y }.sum
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-8, s"⟨c$a, c$b⟩ = $dot")
    }
    assert(m.variances.take(4).zip(m.variances.slice(1, 5)).forall { case (x, y) => x >= y })
  }

  test("q_pca_project emits one 4-pc row per vector, deterministic") {
    val q = CorpusStatsQueries.queries("q_pca_project")
    val r1 = q(spark, sf).collect()
    assert(r1.length == Tables.embeddings(spark, sf).count())
    assert(r1.forall(r => !r.isNullAt(1) && !r.isNullAt(4)))
    val r2 = q(spark, sf).collect()
    assert(r1.map(_.toString).mkString == r2.map(_.toString).mkString,
      "repeated fits must be bit-identical")
  }
}
