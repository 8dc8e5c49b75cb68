package graft.ml

import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{avg, col, count, lit, stddev_pop, udf}
import org.apache.spark.storage.StorageLevel

/** M1/M2 literal form: a distributed fully-connected feed-forward
  * (FCFF) regression net trained by synchronous full-batch gradient
  * descent with an Adam update.
  *
  * The reference's end product is two Keras FCFF nets predicting price
  * from the 15 encoded features: bayesian_optimization_model/
  * keras_metadata.pb (Dense 1450→900→600→300→50→1, dropout .5/.3,
  * elu output, build_input_shape [null,15], Adam lr=0.001, loss=mse,
  * metric=mae) and brute_force_grid_search_model/keras_metadata.pb
  * (Dense 992→544→288→640→832→1). PricePipeline ships the documented
  * capability-parity estimators (GBT/linear, SURVEY.md §7.4); this
  * class closes the literal gap — the same estimator FAMILY (FCFF net,
  * mse loss, Adam) at a width that fits the problem. The reference's
  * regularizer and head are available config-for-config: `dropout`
  * applies the SavedModels' inverted-dropout rates (.5 after the first
  * hidden layer, .3 after the rest — identity at inference, masks
  * seed-deterministic), and `outputActivation` supports the bayesian
  * model's "elu" head and the grid model's "relu" head
  * (keras_metadata.pb dense_15/"elu", dense_9/"relu" — both applied by
  * the reference to a raw positive log-price, where elu is the
  * identity on the attained range and relu a soft non-negativity
  * floor; pair them with `standardizeLabel=false` for the literal
  * raw-label form). Defaults (no dropout, linear head, standardized
  * label) keep the round-5 training semantics unchanged. Weights blobs
  * are absent from the SavedModels, so there is nothing to reproduce
  * numerically — parity is config-level by construction.
  *
  * Distribution model — the part that matters at 100 TB: each
  * iteration broadcasts the (small) flat weight vector, every
  * partition accumulates the EXACT batch gradient over its rows in one
  * imperative pass (this is the genuine per-partition-loop case where
  * an RDD beats any DataFrame formulation), and `treeAggregate`
  * reduces (gradient, loss) partials tree-wise so the driver merges
  * O(log partitions) arrays, not one per task — the same pattern
  * MLlib's own LinearRegression/LBFGS use. No row ever reaches the
  * driver; per-iteration driver state is the weight/Adam vectors
  * (O(|w|), independent of data size).
  */
object MlpRegressor {

  /** Flat weight layout: for each layer l, the (layers(l+1) ×
    * layers(l)) matrix row-major, then the layers(l+1) bias vector. */
  private[graft] def weightCount(layers: Array[Int]): Int =
    (0 until layers.length - 1).map(l => layers(l + 1) * (layers(l) + 1)).sum

  /** Output-head activation (the reference heads: linear default, the
    * bayesian model's elu, the grid model's relu). */
  private[graft] def outAct(kind: String, s: Double): Double = kind match {
    case "linear" => s
    case "elu"    => if (s > 0) s else math.exp(s) - 1.0
    case "relu"   => math.max(0.0, s)
    case other => throw new IllegalArgumentException(
      s"mlp: unsupported outputActivation '$other' (linear|elu|relu)")
  }

  /** d(outAct)/ds expressed in terms of the ACTIVATED value (both elu
    * and relu are invertible enough for this: elu(s) > 0 ⟺ s > 0, and
    * for s <= 0, f'(s) = e^s = f(s) + 1). */
  private[graft] def outActDeriv(kind: String, activated: Double): Double =
    kind match {
      case "linear" => 1.0
      case "elu"    => if (activated > 0) 1.0 else activated + 1.0
      case "relu"   => if (activated > 0) 1.0 else 0.0
      case other => throw new IllegalArgumentException(
        s"mlp: unsupported outputActivation '$other' (linear|elu|relu)")
    }

  /** Forward pass: ReLU hidden activations, configurable output head
    * (dropout is a TRAINING regularizer — inverted scaling makes
    * inference the identity, so this path never masks). */
  private[graft] def forward(layers: Array[Int], w: Array[Double],
      x: Array[Double], outputActivation: String = "linear"): Double = {
    var a = x
    var off = 0
    var l = 0
    while (l < layers.length - 1) {
      val nIn = layers(l)
      val nOut = layers(l + 1)
      val out = new Array[Double](nOut)
      var j = 0
      while (j < nOut) {
        var s = w(off + nOut * nIn + j) // bias
        var i = 0
        while (i < nIn) { s += w(off + j * nIn + i) * a(i); i += 1 }
        out(j) =
          if (l == layers.length - 2) outAct(outputActivation, s)
          else math.max(0.0, s) // ReLU hidden
        j += 1
      }
      off += nOut * (nIn + 1)
      a = out
      l += 1
    }
    a(0)
  }

  /** One row's contribution: accumulates d(se)/dw into `grad` (in
    * place) and returns the squared error. Standard backprop through
    * the ReLU hidden stack and the configurable output head; all
    * buffers per-call (rows within a partition reuse nothing, keeping
    * the seqOp associative-safe).
    *
    * `dropRates(l)` masks hidden layer l+1's POST-ReLU activations with
    * INVERTED dropout (kept units scale by 1/(1-p), so inference needs
    * no correction — the Keras convention). The mask is drawn from a
    * Random seeded with `dropSeed`, a pure function of (training seed,
    * iteration, row) supplied by the caller: the same row gets the same
    * mask wherever it lands, so the treeAggregate stays deterministic
    * under any partitioning. Empty dropRates = the exact no-dropout
    * path (no RNG constructed). */
  private[graft] def accumulateGradient(layers: Array[Int], w: Array[Double],
      x: Array[Double], y: Double, grad: Array[Double],
      outputActivation: String = "linear",
      dropRates: Array[Double] = Array.emptyDoubleArray,
      dropSeed: Long = 0L): Double = {
    val nLayers = layers.length
    val rng =
      if (dropRates.nonEmpty) new java.util.Random(dropSeed) else null
    // per-hidden-layer mask factors (0 dropped, 1/(1-p) kept); null row
    // means that layer is unmasked
    val masks = new Array[Array[Double]](nLayers)
    // forward, keeping activations and layer offsets
    val acts = new Array[Array[Double]](nLayers)
    acts(0) = x
    val offs = new Array[Int](nLayers - 1)
    var off = 0
    var l = 0
    while (l < nLayers - 1) {
      offs(l) = off
      val nIn = layers(l)
      val nOut = layers(l + 1)
      val out = new Array[Double](nOut)
      val isOut = l == nLayers - 2
      val rate =
        if (!isOut && l < dropRates.length) dropRates(l) else 0.0
      val mask =
        if (rate > 0.0) new Array[Double](nOut) else null
      var j = 0
      while (j < nOut) {
        var s = w(off + nOut * nIn + j)
        var i = 0
        while (i < nIn) { s += w(off + j * nIn + i) * acts(l)(i); i += 1 }
        var a = if (isOut) outAct(outputActivation, s) else math.max(0.0, s)
        if (mask != null) {
          // draw per unit in index order — deterministic given dropSeed
          val keep = rng.nextDouble() >= rate
          val factor = if (keep) 1.0 / (1.0 - rate) else 0.0
          mask(j) = factor
          a *= factor
        }
        out(j) = a
        j += 1
      }
      if (mask != null) masks(l + 1) = mask
      off += nOut * (nIn + 1)
      acts(l + 1) = out
      l += 1
    }
    val yHat = acts(nLayers - 1)(0)
    val err = yHat - y
    // backward: delta starts as d(se)/d(head input) = 2·err · head'
    var delta = Array(2.0 * err * outActDeriv(outputActivation, yHat))
    l = nLayers - 2
    while (l >= 0) {
      val nIn = layers(l)
      val nOut = layers(l + 1)
      val o = offs(l)
      val prevDelta = new Array[Double](nIn)
      var j = 0
      while (j < nOut) {
        val dj = delta(j)
        if (dj != 0.0) {
          grad(o + nOut * nIn + j) += dj
          var i = 0
          while (i < nIn) {
            grad(o + j * nIn + i) += dj * acts(l)(i)
            prevDelta(i) += dj * w(o + j * nIn + i)
            i += 1
          }
        }
        j += 1
      }
      if (l > 0) {
        // dropout factor then ReLU derivative of the layer-l activation
        // (a dropped unit has acts = 0 → both rules zero its delta)
        val m = masks(l)
        var i = 0
        while (i < nIn) {
          if (acts(l)(i) <= 0.0) prevDelta(i) = 0.0
          else if (m != null) prevDelta(i) *= m(i)
          i += 1
        }
      }
      delta = prevDelta
      l -= 1
    }
    err * err
  }

  /** Train on a DataFrame with an assembled+scaled `featuresCol`
    * (compose with PricePipeline's VectorAssembler → StandardScaler
    * stages) and a double label. Full-batch GD + Adam (the reference's
    * optimizer, lr default 0.001), seeded Xavier init, label
    * standardized internally so the net trains near unit scale.
    *
    * `batchFraction` < 1 switches to MINI-BATCH GD — the 100 TB form:
    * nobody full-batches a corpus-scale training set, and the reference
    * itself trains Keras minibatch. Each iteration draws a seeded
    * per-partition Bernoulli sample (seed ⊕ iteration → a fresh but
    * DETERMINISTIC batch every step, reproducible across runs), the
    * gradient is normalized by the batch's actual row count (carried
    * through the same treeAggregate — no extra count job), and the
    * treeAggregate pattern is unchanged: broadcast weights, exact
    * per-partition gradients, O(log partitions) merges. Default 1.0
    * keeps the exact full-batch semantics (and artifacts) of round 5. */
  def fit(df: DataFrame, featuresCol: String, labelCol: String,
      hidden: Seq[Int] = Seq(32, 16), maxIter: Int = 200,
      lr: Double = 0.001, seed: Long = 42L,
      batchFraction: Double = 1.0,
      outputActivation: String = "linear",
      dropout: Seq[Double] = Nil,
      standardizeLabel: Boolean = true): MlpModel = {
    require(batchFraction > 0 && batchFraction <= 1.0,
      s"mlp: batchFraction must be in (0, 1], got $batchFraction")
    outAct(outputActivation, 0.0) // validate the head name up front
    require(dropout.isEmpty || dropout.length <= hidden.length,
      s"mlp: ${dropout.length} dropout rates for ${hidden.length} hidden layers")
    require(dropout.forall(p => p >= 0 && p < 1),
      s"mlp: dropout rates must be in [0, 1), got $dropout")
    val dropRates = dropout.toArray
    // count folded into the stats aggregate: an empty input fails the
    // require below with the intended message, not an NPE reading the
    // null avg/stddev aggregates
    val stats = df.agg(
      count(lit(1)).as("n"),
      avg(col(labelCol)).as("m"),
      stddev_pop(col(labelCol)).as("s")).head()
    require(stats.getLong(0) > 0, "mlp: empty training set")
    // standardizeLabel=false is the reference-literal form: elu/relu
    // heads are applied by the Keras models to the RAW positive label,
    // where their range constraint is meaningful (yMean=0, yStd=1 makes
    // the inverse transform the identity)
    val yMean = if (standardizeLabel) stats.getDouble(1) else 0.0
    val yStdRaw = if (standardizeLabel) stats.getDouble(2) else 1.0
    val yStd = if (yStdRaw > 0) yStdRaw else 1.0
    val data = df.select(col(featuresCol), col(labelCol)).rdd
      .map(r => (r.getAs[Vector](0).toArray, (r.getDouble(1) - yMean) / yStd))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val dIn = data.first()._1.length
    val layers = (dIn +: hidden :+ 1).toArray
    val nW = weightCount(layers)
    // Xavier/Glorot uniform init, seeded → deterministic
    val rnd = new scala.util.Random(seed)
    val w = new Array[Double](nW)
    var off = 0
    for (l <- 0 until layers.length - 1) {
      val nIn = layers(l)
      val nOut = layers(l + 1)
      val bound = math.sqrt(6.0 / (nIn + nOut))
      for (k <- 0 until nOut * nIn) w(off + k) = (rnd.nextDouble() * 2 - 1) * bound
      off += nOut * (nIn + 1) // biases stay 0
    }
    // Adam state (driver-side, O(|w|))
    val mAdam = new Array[Double](nW)
    val vAdam = new Array[Double](nW)
    val (b1, b2, eps) = (0.9, 0.999, 1e-8)
    val sc = df.sparkSession.sparkContext
    var it = 1
    while (it <= maxIter) {
      // mini-batch: a fresh seeded Bernoulli sample per iteration (the
      // sample is lazy — it evaluates inside the same aggregate job,
      // never a separate pass); full-batch skips the sample entirely
      val batch =
        if (batchFraction >= 1.0) data
        else data.sample(withReplacement = false, batchFraction, seed ^ it)
      val bc = sc.broadcast(w.clone())
      // (gradient, loss, rowCount): the batch size rides the aggregate,
      // so normalization needs no extra count job. Dropout masks are
      // seeded per (seed, iteration, row content) — fresh each step,
      // identical wherever the row lands, reproducible across runs.
      val itSalt = seed ^ (it.toLong * 0x9E3779B97F4A7C15L)
      val (grad, _, cnt) = batch.treeAggregate(
        (new Array[Double](nW), 0.0, 0L))(
        seqOp = { case ((g, loss, c), (x, y)) =>
          val rowSeed =
            if (dropRates.isEmpty) 0L
            else itSalt ^ (java.util.Arrays.hashCode(x).toLong * 31L +
              java.lang.Double.doubleToLongBits(y))
          (g, loss + accumulateGradient(layers, bc.value, x, y, g,
            outputActivation, dropRates, rowSeed), c + 1)
        },
        combOp = { case ((g1, l1, c1), (g2, l2, c2)) =>
          var i = 0
          while (i < g1.length) { g1(i) += g2(i); i += 1 }
          (g1, l1 + l2, c1 + c2)
        })
      bc.destroy()
      // a pathologically small fraction can draw zero rows: skip the
      // step (an Adam update from a 0/0 gradient would NaN the weights)
      if (cnt > 0) {
        var i = 0
        while (i < nW) {
          val gi = grad(i) / cnt
          mAdam(i) = b1 * mAdam(i) + (1 - b1) * gi
          vAdam(i) = b2 * vAdam(i) + (1 - b2) * gi * gi
          val mHat = mAdam(i) / (1 - math.pow(b1, it))
          val vHat = vAdam(i) / (1 - math.pow(b2, it))
          w(i) -= lr * mHat / (math.sqrt(vHat) + eps)
          i += 1
        }
      }
      it += 1
    }
    data.unpersist()
    MlpModel(layers, w, yMean, yStd, featuresCol, "prediction",
      outputActivation)
  }

  /** The bayesian_optimization_model's architecture config, verbatim
    * (keras_metadata.pb: Dense 1450→900→600→300→50→1, dropout .5 then
    * .3×4, elu head, Adam lr=0.001): pass these to [[fit]] with
    * `standardizeLabel=false` for the config-literal reproduction.
    * Width this large is a cluster-scale training run — tests pin the
    * MECHANISMS (dropout masks, elu gradient) on a narrow net. */
  val referenceBayesianHidden: Seq[Int] = Seq(1450, 900, 600, 300, 50)
  val referenceBayesianDropout: Seq[Double] = Seq(0.5, 0.3, 0.3, 0.3, 0.3)
  val referenceBayesianHead: String = "elu"

  /** brute_force_grid_search_model twin (Dense 992→544→288→640→832→1,
    * same dropout schedule, relu head). */
  val referenceGridHidden: Seq[Int] = Seq(992, 544, 288, 640, 832)
  val referenceGridDropout: Seq[Double] = Seq(0.5, 0.3, 0.3, 0.3, 0.3)
  val referenceGridHead: String = "relu"
}

/** Fitted FCFF net: immutable weights + the label's inverse transform.
  * Inference is a per-row map (no shuffle) in the label's scale. */
final case class MlpModel(
    layers: Array[Int],
    weights: Array[Double],
    yMean: Double,
    yStd: Double,
    featuresCol: String,
    predictionCol: String,
    outputActivation: String = "linear") {

  def predict(x: Array[Double]): Double =
    MlpRegressor.forward(layers, weights, x, outputActivation) * yStd + yMean

  def transform(df: DataFrame): DataFrame = {
    val (l, w, m, s) = (layers, weights, yMean, yStd)
    val oa = outputActivation
    val f = udf((v: Vector) =>
      MlpRegressor.forward(l, w, v.toArray, oa) * s + m)
    df.withColumn(predictionCol, f(col(featuresCol)))
  }

  /** M7 save: one small text artifact (layers / label stats / weights),
    * deterministic and engine-independent. Local-path persistence (the
    * weight vector is driver-side by construction); a deployment on a
    * shared store writes the same bytes through its FS client.
    *
    * Column names are URL-encoded in the meta line: a comma (the field
    * separator) or newline in a user-supplied column name would
    * otherwise silently corrupt the artifact. Typical identifiers
    * encode to themselves, so artifacts for sane names are byte-
    * identical to the pre-encoding format. */
  def save(path: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
    val sb = new StringBuilder
    sb.append(layers.mkString(",")).append('\n')
    // 5th meta field (the output head) appended in round 9; load still
    // accepts the older 4-field line as a linear head
    sb.append(s"$yMean,$yStd,${enc(featuresCol)},${enc(predictionCol)}," +
      enc(outputActivation)).append('\n')
    sb.append(weights.mkString(",")).append('\n')
    java.nio.file.Files.write(p, sb.toString.getBytes("UTF-8"))
  }
}

object MlpModel {
  def load(path: String): MlpModel = {
    val lines = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(path)).toArray(Array.empty[String])
    require(lines.length >= 3, s"mlp model artifact malformed: $path")
    val layers = lines(0).split(",").map(_.toInt)
    val meta = lines(1).split(",", -1)
    require(meta.length == 4 || meta.length == 5,
      s"mlp model artifact meta line malformed (${meta.length} fields, want 4-5): $path")
    val weights = lines(2).split(",").map(_.toDouble)
    require(weights.length == MlpRegressor.weightCount(layers),
      s"mlp model artifact weight count mismatch: $path")
    def dec(s: String) = java.net.URLDecoder.decode(s, "UTF-8")
    val head = if (meta.length == 5) dec(meta(4)) else "linear"
    MlpRegressor.outAct(head, 0.0) // reject a corrupt head name at load
    MlpModel(layers, weights, meta(0).toDouble, meta(1).toDouble,
      dec(meta(2)), dec(meta(3)), head)
  }
}
