package graft.ml

import org.apache.spark.ml.regression.GBTRegressor
import org.apache.spark.sql.DataFrame
import scala.util.Random

/** M4: the Bayesian-optimization analogue of the reference's
  * bayesian_optimization_model (keras-tuner BayesianOptimization over
  * an FCFF architecture; tuner artifacts absent from the repo — only
  * the winning SavedModel remains).
  *
  * This is real sequential model-based optimization, not just
  * explore/exploit: after `nWarmup` seeded random trials, a Gaussian-
  * process surrogate (RBF kernel over the unit-normalized params,
  * observations standardized) is fit to every completed trial, and the
  * next point maximizes EXPECTED IMPROVEMENT over a seeded candidate
  * pool — keras-tuner's own acquisition. All surrogate math is tiny
  * driver-side linear algebra (|trials| ≤ tens: an n×n solve per
  * round); each TRIAL is a full distributed MLlib fit, so the cluster
  * does the expensive part and the driver only holds scalars.
  * Deterministic under a fixed seed.
  */
object BayesianSearch {

  case class Params(maxDepth: Int, maxIter: Int, stepSize: Double)
  case class Trial(params: Params, mae: Double)

  private val depthRange = 2 to 6
  private val iterRange = 5 to 25
  private val stepRange = (0.05, 0.5)

  private def randomParams(rnd: Random): Params = Params(
    depthRange(rnd.nextInt(depthRange.length)),
    iterRange(rnd.nextInt(iterRange.length)),
    stepRange._1 + rnd.nextDouble() * (stepRange._2 - stepRange._1))

  /** Unit-cube embedding of the search space — the GP's input scale. */
  private def toUnit(p: Params): Array[Double] = Array(
    (p.maxDepth - depthRange.head).toDouble / (depthRange.last - depthRange.head),
    (p.maxIter - iterRange.head).toDouble / (iterRange.last - iterRange.head),
    (p.stepSize - stepRange._1) / (stepRange._2 - stepRange._1))

  // ---- tiny GP-with-RBF surrogate (driver-side, n = #trials) ----

  private val lengthScale = 0.3
  private val noise = 1e-6

  private def rbf(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    math.exp(-s / (2 * lengthScale * lengthScale))
  }

  /** Gaussian elimination with partial pivoting; n is tiny. */
  private def solve(a0: Array[Array[Double]], b0: Array[Double]): Array[Double] = {
    val n = b0.length
    val a = a0.map(_.clone())
    val b = b0.clone()
    var col = 0
    while (col < n) {
      var p = col
      var r = col + 1
      while (r < n) { if (math.abs(a(r)(col)) > math.abs(a(p)(col))) p = r; r += 1 }
      val t = a(col); a(col) = a(p); a(p) = t
      val tb = b(col); b(col) = b(p); b(p) = tb
      val piv = a(col)(col)
      r = col + 1
      while (r < n) {
        val f = a(r)(col) / piv
        if (f != 0.0) {
          var c = col
          while (c < n) { a(r)(c) -= f * a(col)(c); c += 1 }
          b(r) -= f * b(col)
        }
        r += 1
      }
      col += 1
    }
    val x = new Array[Double](n)
    var r = n - 1
    while (r >= 0) {
      var s = b(r)
      var c = r + 1
      while (c < n) { s -= a(r)(c) * x(c); c += 1 }
      x(r) = s / a(r)(r)
      r -= 1
    }
    x
  }

  /** GP posterior (mean, std) at x given observations (xs, ys). */
  private def gpPosterior(xs: Array[Array[Double]], ys: Array[Double],
      alpha: Array[Double], kInv: Array[Array[Double]],
      x: Array[Double]): (Double, Double) = {
    val n = xs.length
    val k = xs.map(rbf(_, x))
    var mu = 0.0
    var i = 0
    while (i < n) { mu += k(i) * alpha(i); i += 1 }
    // var = k(x,x) - kᵀ K⁻¹ k
    var quad = 0.0
    i = 0
    while (i < n) {
      var s = 0.0
      var j = 0
      while (j < n) { s += kInv(i)(j) * k(j); j += 1 }
      quad += k(i) * s
      i += 1
    }
    (mu, math.sqrt(math.max(1e-12, 1.0 + noise - quad)))
  }

  /** Standard-normal CDF via the Abramowitz–Stegun erf approximation
    * (max abs error ~1.5e-7 — orders below what acquisition ranking
    * needs). */
  private def phiCdf(z: Double): Double = {
    val t = 1.0 / (1.0 + 0.3275911 * math.abs(z) / math.sqrt(2.0))
    val erf = 1.0 - (((((1.061405429 * t - 1.453152027) * t) + 1.421413741) * t
      - 0.284496736) * t + 0.254829592) * t * math.exp(-z * z / 2.0)
    if (z >= 0) 0.5 * (1 + erf) else 0.5 * (1 - erf)
  }

  private def phiPdf(z: Double): Double =
    math.exp(-z * z / 2.0) / math.sqrt(2 * math.Pi)

  /** Expected improvement (minimization): (best-μ)Φ(z) + σφ(z). */
  private def expectedImprovement(mu: Double, sigma: Double, best: Double): Double = {
    if (sigma <= 0) return math.max(0.0, best - mu)
    val z = (best - mu) / sigma
    (best - mu) * phiCdf(z) + sigma * phiPdf(z)
  }

  /** Local candidates around a point — the refinement half of the
    * acquisition pool (a purely random pool almost never contains a
    * near-optimal point in a 3-d box, so EI could explore but not
    * polish; keras-tuner's acquisition optimizer does the same local
    * descent around seeds). */
  private def perturb(p: Params, rnd: Random): Params = Params(
    math.max(depthRange.head, math.min(depthRange.last,
      p.maxDepth + rnd.nextInt(3) - 1)),
    math.max(iterRange.head, math.min(iterRange.last,
      p.maxIter + rnd.nextInt(7) - 3)),
    math.max(stepRange._1, math.min(stepRange._2,
      p.stepSize + rnd.nextGaussian() * 0.05)))

  /** Pick the next params: fit the GP to all trials (ys standardized),
    * score a seeded candidate pool (half random exploration, half
    * perturbations of the incumbent) by EI, take the argmax. */
  private def nextByEi(trials: Seq[Trial], rnd: Random, poolSize: Int = 400): Params = {
    // REPEATED trial points (perturb clipping at the box bounds can
    // re-propose an evaluated Params) would make K exactly singular:
    // dedupe to one observation per distinct unit-cube point, keeping
    // the best (GP interpolates observations; for a deterministic
    // objective duplicates carry no extra information anyway)
    val deduped = trials.groupBy(t => toUnit(t.params).toSeq)
      .values.map(_.minBy(_.mae)).toSeq
      .sortBy(t => toUnit(t.params).toSeq.toString) // deterministic order
    val xs = deduped.map(t => toUnit(t.params)).toArray
    val raw = deduped.map(_.mae).toArray
    val mean = raw.sum / raw.length
    val sd0 = math.sqrt(raw.map(y => (y - mean) * (y - mean)).sum / raw.length)
    val sd = if (sd0 > 0) sd0 else 1.0
    val ys = raw.map(y => (y - mean) / sd)
    val n = xs.length
    // adaptive jitter: NEAR-duplicate rows (two points within ~ulps in
    // the unit cube) leave K ill-conditioned even after the exact-dup
    // dedupe; a non-finite solve raises the nugget 100× (up to 1e-2)
    // and refits rather than ranking EI on a garbage posterior
    var jitter = noise
    var alpha: Array[Double] = null
    var kInv: Array[Array[Double]] = null
    var done = false
    while (!done) {
      val kMat = Array.tabulate(n, n)((i, j) =>
        rbf(xs(i), xs(j)) + (if (i == j) jitter else 0.0))
      val a = solve(kMat, ys)
      // K⁻¹ column by column (n tiny; clarity over an O(n³)-once factor)
      val kI = Array.tabulate(n)(i =>
        solve(kMat, Array.tabulate(n)(j => if (j == i) 1.0 else 0.0)))
      // kI rows as computed are columns of K⁻¹, but K is symmetric
      val finite = a.forall(java.lang.Double.isFinite) &&
        kI.forall(_.forall(java.lang.Double.isFinite))
      if (finite || jitter >= 1e-2) { alpha = a; kInv = kI; done = true }
      else jitter *= 100
    }
    val best = ys.min
    val incumbent = deduped.minBy(_.mae).params
    val rawPool = Seq.fill(poolSize / 2)(randomParams(rnd)) ++
      Seq.fill(poolSize / 2)(perturb(incumbent, rnd))
    // never re-propose an evaluated point: its EI is ~0 but float noise
    // can still rank it above genuinely new candidates
    val seen = xs.map(_.toSeq).toSet
    val fresh = rawPool.filterNot(p => seen.contains(toUnit(p).toSeq))
    val pool = if (fresh.nonEmpty) fresh else rawPool
    pool.maxBy { p =>
      val (mu, sigma) = gpPosterior(xs, ys, alpha, kInv, toUnit(p))
      expectedImprovement(mu, sigma, best)
    }
  }

  /** Core SMBO loop over an arbitrary objective — the seam the
    * synthetic-objective optimizer tests drive (no cluster needed).
    * Returns trials in EVALUATION ORDER. */
  def searchFn(objective: Params => Double, n: Int = 8, nWarmup: Int = 4,
      seed: Long = 42L): Seq[Trial] = {
    val rnd = new Random(seed)
    val trials = scala.collection.mutable.ArrayBuffer.empty[Trial]
    (0 until n).foreach { i =>
      val p =
        if (i < nWarmup || trials.isEmpty) randomParams(rnd)
        else nextByEi(trials.toSeq, rnd)
      trials += Trial(p, objective(p))
    }
    trials.toSeq
  }

  /** Pure random search twin — the baseline the GP must beat. */
  def randomSearchFn(objective: Params => Double, n: Int,
      seed: Long = 42L): Seq[Trial] = {
    val rnd = new Random(seed)
    Seq.fill(n) { val p = randomParams(rnd); Trial(p, objective(p)) }
  }

  def evalOnce(train: DataFrame, valid: DataFrame, featureCols: Seq[String],
      p: Params, seed: Long): Trial = {
    val pipe = PricePipeline.pipeline(featureCols, "gbt", seed)
    val gbt = pipe.getStages(2).asInstanceOf[GBTRegressor]
    gbt.setMaxDepth(p.maxDepth).setMaxIter(p.maxIter).setStepSize(p.stepSize)
    val model = pipe.fit(train)
    Trial(p, PricePipeline.evaluator("mae").evaluate(model.transform(valid)))
  }

  /** Run nWarmup random trials then (n - nWarmup) GP-EI trials, each a
    * full distributed MLlib fit; returns all trials, best first.
    * Deterministic under a fixed seed. */
  def search(df: DataFrame, featureCols: Seq[String], n: Int = 8,
      nWarmup: Int = 4, seed: Long = 42L): Seq[Trial] = {
    val Array(train, valid) = df.randomSplit(Array(0.8, 0.2), seed)
    train.cache(); valid.cache()
    val trials = searchFn(
      p => evalOnce(train, valid, featureCols, p, seed).mae, n, nWarmup, seed)
    train.unpersist(); valid.unpersist()
    trials.sortBy(_.mae)
  }
}
