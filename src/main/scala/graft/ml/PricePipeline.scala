package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.evaluation.RegressionEvaluator
import org.apache.spark.ml.feature.{StandardScaler, VectorAssembler}
import org.apache.spark.ml.regression.{GBTRegressor, LinearRegression}
import org.apache.spark.ml.tuning.{CrossValidator, CrossValidatorModel, ParamGridBuilder, TrainValidationSplit, TrainValidationSplitModel}
import org.apache.spark.sql.DataFrame

/** The reference's modeling surface (SURVEY.md §2.11) on MLlib.
  *
  * Reference: two Keras FCFF nets predicting price from the 15 encoded
  * features (input shape [·,15], both keras_metadata.pb), Adam lr=0.001,
  * loss=mse, metric=mae; one tuned by brute-force grid search, one by
  * Bayesian optimization. MLlib has no MLP regressor, so capability
  * parity (nonlinear regression + HPO + mae/mse eval + save/load) is
  * provided with GBTRegressor (primary) and LinearRegression
  * (baseline) — SURVEY.md §7.4 risk 1 documents the mapping.
  *
  * Scale: training is MLlib's distributed fit; inference is
  * model.transform — a per-row map with no shuffle. Feature assembly
  * (VectorAssembler → StandardScaler) mirrors the reference's
  * "standardized and normalized versions" preprocessing (NB cell 62).
  */
object PricePipeline {

  val labelCol = "price"

  /** VectorAssembler(15 features) → StandardScaler → regressor. */
  def pipeline(featureCols: Seq[String], regressor: String = "gbt",
      seed: Long = 42L): Pipeline = {
    val assembler = new VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("features_raw")
    val scaler = new StandardScaler()
      .setInputCol("features_raw").setOutputCol("features")
      .setWithMean(true).setWithStd(true)
    val reg = regressor match {
      case "gbt" => new GBTRegressor()
        .setFeaturesCol("features").setLabelCol(labelCol)
        .setPredictionCol("prediction").setSeed(seed)
      case "linear" => new LinearRegression()
        .setFeaturesCol("features").setLabelCol(labelCol)
        .setPredictionCol("prediction")
      case other => throw new IllegalArgumentException(s"unknown regressor: $other")
    }
    new Pipeline().setStages(Array(assembler, scaler, reg))
  }

  /** M3/M6: mae (the reference's metric), also rmse/mse. */
  def evaluator(metric: String = "mae"): RegressionEvaluator =
    new RegressionEvaluator()
      .setLabelCol(labelCol).setPredictionCol("prediction")
      .setMetricName(metric)

  /** M5: brute-force grid search — ParamGridBuilder exhaustive grid +
    * TrainValidationSplit, the exact analogue of the reference's
    * brute_force_grid_search_model. */
  def gridSearch(df: DataFrame, featureCols: Seq[String],
      seed: Long = 42L): TrainValidationSplitModel = {
    val pipe = pipeline(featureCols, "gbt", seed)
    val gbt = pipe.getStages(2).asInstanceOf[GBTRegressor]
    val grid = new ParamGridBuilder()
      .addGrid(gbt.maxDepth, Array(2, 4))
      .addGrid(gbt.maxIter, Array(5, 10))
      .addGrid(gbt.stepSize, Array(0.1, 0.3))
      .build()
    new TrainValidationSplit()
      .setEstimator(pipe)
      .setEvaluator(evaluator("mae"))
      .setEstimatorParamMaps(grid)
      .setTrainRatio(0.8)
      .setSeed(seed)
      .setParallelism(4)
      .fit(df)
  }

  /** M5 companion: k-fold cross-validation over the same grid — the
    * variance-reducing form of model selection TrainValidationSplit
    * approximates with one split. Folds train in parallel
    * (setParallelism); avgMetrics exposes the per-candidate CV mean the
    * way the reference's grid search logged per-config scores. */
  def crossValidate(df: DataFrame, featureCols: Seq[String],
      numFolds: Int = 3, seed: Long = 42L): CrossValidatorModel = {
    val pipe = pipeline(featureCols, "linear", seed)
    val lr = pipe.getStages(2).asInstanceOf[LinearRegression]
    val grid = new ParamGridBuilder()
      .addGrid(lr.regParam, Array(0.0, 0.1, 1.0))
      .addGrid(lr.elasticNetParam, Array(0.0, 0.5))
      .build()
    new CrossValidator()
      .setEstimator(pipe)
      .setEvaluator(evaluator("mae"))
      .setEstimatorParamMaps(grid)
      .setNumFolds(numFolds)
      .setSeed(seed)
      .setParallelism(4)
      .fit(df)
  }

  /** Naive-mean baseline MAE — the bar every model must beat. */
  def baselineMae(df: DataFrame): Double = {
    import org.apache.spark.sql.functions._
    val mean = df.agg(avg(labelCol)).head().getDouble(0)
    df.agg(avg(abs(col(labelCol) - lit(mean)))).head().getDouble(0)
  }
}
