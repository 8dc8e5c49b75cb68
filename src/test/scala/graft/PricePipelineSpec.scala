package graft

import org.apache.spark.ml.tuning.TrainValidationSplitModel
import graft.ml.{BayesianSearch, PricePipeline}
import graft.pipeline.{CleanPipeline, Listings}

class PricePipelineSpec extends SparkSpec {

  private lazy val clean = {
    val (train, test) = ListingsFixture.trainTest(spark)
    CleanPipeline.run(train, test).cache()
  }
  private val features = Listings.featureCols

  test("gbt pipeline trains and beats the naive-mean baseline") {
    val Array(tr, va) = clean.randomSplit(Array(0.8, 0.2), 42L)
    val model = PricePipeline.pipeline(features, "gbt").fit(tr)
    val mae = PricePipeline.evaluator("mae").evaluate(model.transform(va))
    val baseline = PricePipeline.baselineMae(va)
    assert(mae.isFinite && mae > 0)
    assert(mae < baseline, s"model mae $mae should beat baseline $baseline")
  }

  test("linear baseline trains and evaluates with mae/rmse/mse") {
    val model = PricePipeline.pipeline(features, "linear").fit(clean)
    val pred = model.transform(clean)
    Seq("mae", "rmse", "mse").foreach { m =>
      val v = PricePipeline.evaluator(m).evaluate(pred)
      assert(v.isFinite && v >= 0, s"$m = $v")
    }
  }

  test("grid search evaluates the full grid and picks the best map (M5)") {
    // ParamGridBuilder emits the grid in Param-hash order, which varies
    // per estimator instance — so compare params→metric as a map, not
    // positionally.
    def metricByParams(m: TrainValidationSplitModel): Map[String, Double] =
      m.getEstimatorParamMaps.zip(m.validationMetrics).map { case (pm, v) =>
        pm.toSeq.map(p => s"${p.param.name}=${p.value}").sorted.mkString(";") -> v
      }.toMap
    val m1 = metricByParams(PricePipeline.gridSearch(clean, features))
    val m2 = metricByParams(PricePipeline.gridSearch(clean, features))
    assert(m1.size == 8) // 2 depths × 2 iters × 2 steps
    assert(m1.values.forall(m => m.isFinite && m > 0))
    assert(m1 == m2, "same seed must reproduce the same grid evaluation")
    assert(m1.minBy(_._2)._1 == m2.minBy(_._2)._1)
  }

  test("k-fold cross-validation scores every candidate and beats baseline") {
    val cv = PricePipeline.crossValidate(clean, features, numFolds = 3)
    // 3x2 grid -> 6 candidates, each with a finite CV-mean mae
    assert(cv.avgMetrics.length == 6)
    cv.avgMetrics.foreach(m => assert(m.isFinite && m > 0))
    // the selected model is the argmin (mae: smaller is better)
    val best = cv.avgMetrics.min
    val mae = PricePipeline.evaluator("mae").evaluate(cv.transform(clean))
    assert(mae <= best * 1.05, s"refit mae $mae should track best CV mean $best")
    assert(best < PricePipeline.baselineMae(clean),
      "best CV candidate must beat the naive-mean baseline")
  }

  test("GP-EI search beats pure random on a synthetic objective (M4)") {
    import graft.ml.BayesianSearch.Params
    // quadratic bowl with its optimum inside the search box at
    // (depth 4, iter 15, step 0.3) — a known ground truth no MLlib fit
    // can provide; the cluster-backed `search` wraps the same loop
    def objective(p: Params): Double =
      math.pow(p.maxDepth - 4, 2) +
        math.pow((p.maxIter - 15) / 10.0, 2) +
        math.pow((p.stepSize - 0.3) * 5, 2)
    val n = 14
    val ei = BayesianSearch.searchFn(objective, n = n, nWarmup = 4, seed = 7L)
    val rnd = BayesianSearch.randomSearchFn(objective, n = n, seed = 7L)
    assert(ei.length == n && rnd.length == n)
    val bestEi = ei.map(_.mae).min
    val bestRnd = rnd.map(_.mae).min
    assert(bestEi <= bestRnd,
      s"GP-EI best $bestEi should be <= random best $bestRnd")
    // the surrogate reaches near-optimum in fewer evaluations
    val eps = 0.05
    val eiHit = ei.indexWhere(_.mae <= eps)
    val rndHit = rnd.indexWhere(_.mae <= eps)
    assert(eiHit >= 0, s"GP-EI never got within $eps of the optimum: ${ei.map(_.mae)}")
    assert(rndHit < 0 || eiHit < rndHit,
      s"GP-EI hit at $eiHit, random at $rndHit")
    // deterministic under the fixed seed
    val again = BayesianSearch.searchFn(objective, n = n, nWarmup = 4, seed = 7L)
    assert(again.map(_.params) == ei.map(_.params))
  }

  test("bayesian-style search improves over its own warmup (M4)") {
    val trials = BayesianSearch.search(clean, features, n = 6, nWarmup = 3)
    assert(trials.length == 6)
    val best = trials.head.mae
    assert(trials.forall(_.mae >= best))
    // deterministic under fixed seed
    val again = BayesianSearch.search(clean, features, n = 6, nWarmup = 3)
    assert(again.map(_.params) == trials.map(_.params))
  }

  private lazy val mlpPrep = {
    import org.apache.spark.ml.Pipeline
    import org.apache.spark.ml.feature.{StandardScaler, VectorAssembler}
    val Array(tr, va) = clean.randomSplit(Array(0.8, 0.2), 42L)
    val prep = new Pipeline().setStages(Array(
      new VectorAssembler().setInputCols(features.toArray)
        .setOutputCol("features_raw"),
      new StandardScaler().setInputCol("features_raw").setOutputCol("features")
        .setWithMean(true).setWithStd(true))).fit(tr)
    (prep.transform(tr).cache(), prep.transform(va).cache())
  }
  private lazy val mlpModel = {
    val (tr, _) = mlpPrep
    graft.ml.MlpRegressor.fit(tr, "features", "price",
      hidden = Seq(16, 8), maxIter = 200, lr = 0.02)
  }

  test("distributed MLP beats the naive-mean baseline (M1/M2 literal form)") {
    val (_, va) = mlpPrep
    val mae = PricePipeline.evaluator("mae").evaluate(mlpModel.transform(va))
    val baseline = PricePipeline.baselineMae(va)
    assert(mae.isFinite && mae > 0)
    assert(mae < baseline, s"mlp mae $mae should beat baseline $baseline")
  }

  test("MLP training is deterministic under a fixed seed") {
    val (tr, _) = mlpPrep
    val again = graft.ml.MlpRegressor.fit(tr, "features", "price",
      hidden = Seq(16, 8), maxIter = 200, lr = 0.02)
    assert(again.weights.sameElements(mlpModel.weights))
  }

  test("MLP kernel instantiates the reference's literal architectures") {
    import graft.ml.MlpRegressor
    // the two saved models' exact layer stacks over the 15 features:
    // bayesian_optimization_model/keras_metadata.pb (1450-900-600-300-50-1)
    // brute_force_grid_search_model/keras_metadata.pb (992-544-288-640-832-1)
    val rnd = new scala.util.Random(1L)
    Seq(
      Array(15, 1450, 900, 600, 300, 50, 1),
      Array(15, 992, 544, 288, 640, 832, 1)).foreach { layers =>
      val nW = MlpRegressor.weightCount(layers)
      assert(nW > 1000000 || layers(1) == 992 && nW > 900000,
        s"weight count $nW implausibly small for ${layers.mkString("-")}")
      val w = Array.fill(nW)(rnd.nextGaussian() * 0.01)
      val out = MlpRegressor.forward(layers, w, Array.fill(15)(0.5))
      assert(out.isFinite, s"${layers.mkString("-")} forward produced $out")
    }
  }

  test("MLP backprop agrees with finite-difference gradients") {
    import graft.ml.MlpRegressor
    // pure driver math: a tiny net, one (x, y) example, every weight's
    // analytic gradient vs central finite differences
    val layers = Array(3, 4, 2, 1)
    val rnd = new scala.util.Random(3L)
    val nW = MlpRegressor.weightCount(layers)
    val w = Array.fill(nW)(rnd.nextGaussian() * 0.5)
    val x = Array(0.3, -1.2, 0.7)
    val y = 0.42
    val grad = new Array[Double](nW)
    MlpRegressor.accumulateGradient(layers, w, x, y, grad)
    val eps = 1e-6
    def loss(wi: Array[Double]): Double = {
      val out = MlpRegressor.forward(layers, wi, x)
      (out - y) * (out - y)
    }
    (0 until nW).foreach { i =>
      val wp = w.clone(); wp(i) += eps
      val wm = w.clone(); wm(i) -= eps
      val numeric = (loss(wp) - loss(wm)) / (2 * eps)
      assert(math.abs(grad(i) - numeric) <= 1e-4 * math.max(1.0, math.abs(numeric)),
        s"weight $i: backprop ${grad(i)} vs numeric $numeric")
    }
  }

  test("MLP elu/relu heads backprop agrees with finite differences") {
    import graft.ml.MlpRegressor
    val layers = Array(3, 4, 2, 1)
    val nW = MlpRegressor.weightCount(layers)
    val x = Array(0.3, -1.2, 0.7)
    Seq("elu", "relu").foreach { head =>
      val rnd = new scala.util.Random(7L)
      val w = Array.fill(nW)(rnd.nextGaussian() * 0.5)
      // probe a target on EACH side of the head's kink so both branch
      // derivatives get pinned (bias shift moves the pre-activation)
      Seq(0.42, -0.35).foreach { y =>
        val grad = new Array[Double](nW)
        MlpRegressor.accumulateGradient(layers, w, x, y, grad, head)
        val eps = 1e-6
        def loss(wi: Array[Double]): Double = {
          val out = MlpRegressor.forward(layers, wi, x, head)
          (out - y) * (out - y)
        }
        (0 until nW).foreach { i =>
          val wp = w.clone(); wp(i) += eps
          val wm = w.clone(); wm(i) -= eps
          val numeric = (loss(wp) - loss(wm)) / (2 * eps)
          assert(math.abs(grad(i) - numeric) <=
            1e-4 * math.max(1.0, math.abs(numeric)),
            s"$head y=$y weight $i: backprop ${grad(i)} vs numeric $numeric")
        }
      }
    }
  }

  test("MLP dropout masks are inverted, rate-respecting, deterministic") {
    import graft.ml.MlpRegressor
    // one wide hidden layer, identity-ish weights: with inverted
    // dropout the EXPECTED gradient equals the no-dropout gradient, the
    // keep rate shows up in the bias-gradient zero pattern, and the
    // same dropSeed reproduces the identical mask
    val layers = Array(2, 400, 1)
    val nW = MlpRegressor.weightCount(layers)
    val rnd = new scala.util.Random(11L)
    val w = Array.fill(nW)(math.abs(rnd.nextGaussian()) * 0.1)
    val x = Array(0.8, 0.6) // positive inputs + positive weights → all units active
    val y = -1.0
    val rates = Array(0.3)
    val g1 = new Array[Double](nW)
    val se1 = MlpRegressor.accumulateGradient(layers, w, x, y, g1, "linear", rates, 99L)
    val g2 = new Array[Double](nW)
    MlpRegressor.accumulateGradient(layers, w, x, y, g2, "linear", rates, 99L)
    assert(g1.sameElements(g2), "same dropSeed must reproduce the mask")
    val g3 = new Array[Double](nW)
    MlpRegressor.accumulateGradient(layers, w, x, y, g3, "linear", rates, 100L)
    assert(!g3.sameElements(g1), "a different dropSeed must redraw the mask")
    // hidden-bias gradients: dropped units contribute exactly 0; kept
    // units carry the 1/(1-p) inverted scale. Count the zero pattern.
    val biasOff = 400 * 2
    val biasGrads = (0 until 400).map(j => g1(biasOff + j))
    val dropped = biasGrads.count(_ == 0.0)
    assert(dropped > 400 * 0.3 - 60 && dropped < 400 * 0.3 + 60,
      s"$dropped/400 dropped at rate 0.3")
    // inverted scaling: a kept unit's bias grad is 2·err·w2_j·(1/0.7)
    // vs the clean 2·err0·w2_j — the per-unit backward factor is 1/0.7
    // exactly, times the GLOBAL error ratio err/err0 (the forward mask
    // perturbs the output once for all units). Both errors are returned
    // as squared error; the output is above y=-1 in both runs, so the
    // signed ratio is the positive root.
    val g0 = new Array[Double](nW)
    val se0 = MlpRegressor.accumulateGradient(layers, w, x, y, g0, "linear")
    val errRatio = math.sqrt(se1 / se0)
    val ratios = (0 until 400).collect {
      case j if g1(biasOff + j) != 0.0 && g0(biasOff + j) != 0.0 =>
        g1(biasOff + j) / g0(biasOff + j)
    }
    assert(ratios.nonEmpty)
    val expected = errRatio / 0.7
    ratios.foreach { r =>
      assert(math.abs(r - expected) < 1e-9,
        s"kept-unit gradient scale $r, want $expected")
    }
  }

  test("MLP reference-config heads train end-to-end (narrow twin)") {
    // the bayesian model's config shape — elu head, .5/.3 dropout, raw
    // (unstandardized) label — at test width; the full 1450-900-600-300-50
    // stack is the same code path with bigger arrays
    val (tr, va) = mlpPrep
    val m = graft.ml.MlpRegressor.fit(tr, "features", "price",
      hidden = Seq(16, 8), maxIter = 300, lr = 0.05,
      outputActivation = graft.ml.MlpRegressor.referenceBayesianHead,
      dropout = Seq(0.5, 0.3), standardizeLabel = false)
    assert(m.outputActivation == "elu")
    assert(m.yMean == 0.0 && m.yStd == 1.0, "raw-label mode must not shift")
    val mae = PricePipeline.evaluator("mae").evaluate(m.transform(va))
    val baseline = PricePipeline.baselineMae(va)
    assert(mae.isFinite && mae < baseline,
      s"reference-config mlp mae $mae should beat naive-mean $baseline")
    // seed-determinism holds with dropout on (masks are seeded)
    val again = graft.ml.MlpRegressor.fit(tr, "features", "price",
      hidden = Seq(16, 8), maxIter = 300, lr = 0.05,
      outputActivation = "elu", dropout = Seq(0.5, 0.3),
      standardizeLabel = false)
    assert(again.weights.sameElements(m.weights))
  }

  test("MLP save/load round-trips the output head") {
    val (tr, va) = mlpPrep
    val m = graft.ml.MlpRegressor.fit(tr, "features", "price",
      hidden = Seq(8), maxIter = 50, lr = 0.05,
      outputActivation = "elu", standardizeLabel = false)
    val path = java.nio.file.Files.createTempDirectory("graft-mlp-head")
      .resolve("mlp_elu.txt").toString
    m.save(path)
    val loaded = graft.ml.MlpModel.load(path)
    assert(loaded.outputActivation == "elu")
    import org.apache.spark.ml.linalg.Vector
    va.select("features").limit(20).collect().foreach { r =>
      val x = r.getAs[Vector](0).toArray
      assert(loaded.predict(x) == m.predict(x))
    }
  }

  test("MLP save/load round-trips predictions exactly") {
    import org.apache.spark.ml.linalg.Vector
    val (_, va) = mlpPrep
    val path = java.nio.file.Files.createTempDirectory("graft-mlp")
      .resolve("mlp.txt").toString
    mlpModel.save(path)
    val loaded = graft.ml.MlpModel.load(path)
    assert(loaded.layers.sameElements(mlpModel.layers))
    va.select("features").limit(50).collect().foreach { r =>
      val x = r.getAs[Vector](0).toArray
      assert(loaded.predict(x) == mlpModel.predict(x))
    }
  }

  test("mini-batch MLP converges near full-batch MAE, seed-deterministic (r5 item #6)") {
    val (tr, va) = mlpPrep
    val mini = graft.ml.MlpRegressor.fit(tr, "features", "price",
      hidden = Seq(16, 8), maxIter = 200, lr = 0.02, batchFraction = 0.25)
    val maeMini = PricePipeline.evaluator("mae").evaluate(mini.transform(va))
    val maeFull = PricePipeline.evaluator("mae").evaluate(mlpModel.transform(va))
    val baseline = PricePipeline.baselineMae(va)
    assert(maeMini.isFinite && maeMini > 0)
    assert(maeMini < baseline,
      s"mini-batch mae $maeMini should beat naive-mean $baseline")
    assert(maeMini <= maeFull * 1.25,
      s"mini-batch mae $maeMini should be comparable to full-batch $maeFull")
    // a different iteration budget but the same seed draws the same
    // batches: the whole run is reproducible
    val again = graft.ml.MlpRegressor.fit(tr, "features", "price",
      hidden = Seq(16, 8), maxIter = 200, lr = 0.02, batchFraction = 0.25)
    assert(again.weights.sameElements(mini.weights),
      "mini-batch training must be seed-deterministic")
    // full-batch default is bit-identical to the pre-minibatch code path
    assert(!mini.weights.sameElements(mlpModel.weights),
      "fraction 0.25 must actually subsample (different weights)")
  }

  test("MLP empty training set fails with the intended message") {
    val (tr, _) = mlpPrep
    val e = intercept[IllegalArgumentException] {
      graft.ml.MlpRegressor.fit(tr.limit(0), "features", "price")
    }
    assert(e.getMessage.contains("empty training set"))
  }

  test("MLP artifact survives comma/newline column names (ADVICE r5)") {
    import graft.ml.MlpModel
    val weird = mlpModel.copy(
      featuresCol = "feat,ures col", predictionCol = "pred,iction\nx")
    val path = java.nio.file.Files.createTempDirectory("graft-mlp-weird")
      .resolve("mlp.txt").toString
    weird.save(path)
    val loaded = MlpModel.load(path)
    assert(loaded.featuresCol == weird.featuresCol)
    assert(loaded.predictionCol == weird.predictionCol)
    assert(loaded.weights.sameElements(weird.weights))
    // and a malformed meta line still fails loud
    val bad = java.nio.file.Files.createTempDirectory("graft-mlp-bad")
      .resolve("bad.txt")
    java.nio.file.Files.write(bad, "1,1\n0.0,1.0,only_three\n0.0,0.0\n".getBytes)
    val err = intercept[IllegalArgumentException](MlpModel.load(bad.toString))
    assert(err.getMessage.contains("meta line malformed"))
  }

  test("Bayesian EI survives duplicate trial points (ADVICE r5)") {
    import graft.ml.BayesianSearch.Params
    // an objective pinned to a corner of the box: perturb clipping will
    // re-propose the incumbent repeatedly, producing duplicate xs that
    // made K singular before the dedupe/adaptive-jitter fix
    def objective(p: Params): Double =
      math.abs(p.maxDepth - 2) + math.abs(p.maxIter - 5) + p.stepSize
    val trials = BayesianSearch.searchFn(objective, n = 14, nWarmup = 3, seed = 11L)
    assert(trials.length == 14)
    assert(trials.forall(t => t.mae.isFinite),
      s"every trial's objective must stay finite, got $trials")
    // the search still converges toward the pinned corner
    val best = trials.minBy(_.mae)
    assert(best.params.maxDepth <= 3 && best.params.maxIter <= 12,
      s"EI should approach the corner optimum, best was $best")
  }

  test("model save/load round-trips predictions (M7)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-model").toString
    val model = PricePipeline.pipeline(features, "gbt").fit(clean)
    model.write.overwrite().save(dir)
    val loaded = org.apache.spark.ml.PipelineModel.load(dir)
    val a = model.transform(clean).select("prediction").collect().map(_.getDouble(0))
    val b = loaded.transform(clean).select("prediction").collect().map(_.getDouble(0))
    assert(a.sameElements(b))
  }
}
