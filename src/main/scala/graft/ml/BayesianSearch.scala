package graft.ml

import org.apache.spark.ml.regression.GBTRegressor
import org.apache.spark.sql.DataFrame
import scala.util.Random

/** M4: the Bayesian-optimization analogue of the reference's
  * bayesian_optimization_model (keras-tuner BayesianOptimization over
  * an FCFF architecture; tuner artifacts absent from the repo — only
  * the winning SavedModel remains).
  *
  * MLlib ships no Bayesian optimizer, so this is a small sequential
  * model-based search in plain Scala (SURVEY.md §7.3): seeded random
  * exploration, then exploitation by Gaussian perturbation around the
  * incumbent — the explore/exploit skeleton of SMBO without a surrogate
  * model. Each trial is a full distributed MLlib fit; only scalar
  * params and scores live on the driver.
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

  private def perturb(p: Params, rnd: Random): Params = Params(
    math.max(depthRange.head, math.min(depthRange.last, p.maxDepth + rnd.nextInt(3) - 1)),
    math.max(iterRange.head, math.min(iterRange.last, p.maxIter + rnd.nextInt(7) - 3)),
    math.max(stepRange._1, math.min(stepRange._2, p.stepSize + rnd.nextGaussian() * 0.05)))

  def evalOnce(train: DataFrame, valid: DataFrame, featureCols: Seq[String],
      p: Params, seed: Long): Trial = {
    val pipe = PricePipeline.pipeline(featureCols, "gbt", seed)
    val gbt = pipe.getStages(2).asInstanceOf[GBTRegressor]
    gbt.setMaxDepth(p.maxDepth).setMaxIter(p.maxIter).setStepSize(p.stepSize)
    val model = pipe.fit(train)
    Trial(p, PricePipeline.evaluator("mae").evaluate(model.transform(valid)))
  }

  /** Run nWarmup random trials then (n - nWarmup) exploit trials around
    * the incumbent; returns all trials, best first. Deterministic under
    * a fixed seed. */
  def search(df: DataFrame, featureCols: Seq[String], n: Int = 8,
      nWarmup: Int = 4, seed: Long = 42L): Seq[Trial] = {
    val rnd = new Random(seed)
    val Array(train, valid) = df.randomSplit(Array(0.8, 0.2), seed)
    train.cache(); valid.cache()
    val trials = scala.collection.mutable.ArrayBuffer.empty[Trial]
    (0 until n).foreach { i =>
      val p =
        if (i < nWarmup || trials.isEmpty) randomParams(rnd)
        else perturb(trials.minBy(_.mae).params, rnd)
      trials += evalOnce(train, valid, featureCols, p, seed)
    }
    train.unpersist(); valid.unpersist()
    trials.sortBy(_.mae).toSeq
  }
}
