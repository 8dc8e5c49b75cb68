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
