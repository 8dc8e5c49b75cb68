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
  * mse loss, Adam) at a width that fits the problem. Deliberate
  * deviations, each inference-equivalent or a standard substitution:
  * dropout is omitted (a regularizer that is the identity at inference;
  * the saved models' weights blobs are absent so there is nothing to
  * reproduce numerically), and the output is linear over a STANDARDIZED
  * label rather than elu over a raw positive price — the same role
  * (keep predictions in the label's scale) without constraining the
  * output range.
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

  /** Forward pass: ReLU hidden activations, linear output (on the
    * standardized label — see class doc). Returns the raw output. */
  private[graft] def forward(layers: Array[Int], w: Array[Double],
      x: Array[Double]): Double = {
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
        out(j) = if (l == layers.length - 2) s else math.max(0.0, s) // ReLU hidden
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
    * the ReLU/linear stack; all buffers per-call (rows within a
    * partition reuse nothing, keeping the seqOp associative-safe). */
  private[graft] def accumulateGradient(layers: Array[Int], w: Array[Double],
      x: Array[Double], y: Double, grad: Array[Double]): Double = {
    val nLayers = layers.length
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
      var j = 0
      while (j < nOut) {
        var s = w(off + nOut * nIn + j)
        var i = 0
        while (i < nIn) { s += w(off + j * nIn + i) * acts(l)(i); i += 1 }
        out(j) = if (l == nLayers - 2) s else math.max(0.0, s)
        j += 1
      }
      off += nOut * (nIn + 1)
      acts(l + 1) = out
      l += 1
    }
    val err = acts(nLayers - 1)(0) - y
    // backward: delta starts as d(se)/d(out) = 2·err
    var delta = Array(2.0 * err)
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
        // ReLU derivative of the layer-l activation
        var i = 0
        while (i < nIn) {
          if (acts(l)(i) <= 0.0) prevDelta(i) = 0.0
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
      batchFraction: Double = 1.0): MlpModel = {
    require(batchFraction > 0 && batchFraction <= 1.0,
      s"mlp: batchFraction must be in (0, 1], got $batchFraction")
    // count folded into the stats aggregate: an empty input fails the
    // require below with the intended message, not an NPE reading the
    // null avg/stddev aggregates
    val stats = df.agg(
      count(lit(1)).as("n"),
      avg(col(labelCol)).as("m"),
      stddev_pop(col(labelCol)).as("s")).head()
    require(stats.getLong(0) > 0, "mlp: empty training set")
    val yMean = stats.getDouble(1)
    val yStdRaw = stats.getDouble(2)
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
      // so normalization needs no extra count job
      val (grad, _, cnt) = batch.treeAggregate(
        (new Array[Double](nW), 0.0, 0L))(
        seqOp = { case ((g, loss, c), (x, y)) =>
          (g, loss + accumulateGradient(layers, bc.value, x, y, g), c + 1)
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
    MlpModel(layers, w, yMean, yStd, featuresCol, "prediction")
  }
}

/** Fitted FCFF net: immutable weights + the label's inverse transform.
  * Inference is a per-row map (no shuffle) in the label's scale. */
final case class MlpModel(
    layers: Array[Int],
    weights: Array[Double],
    yMean: Double,
    yStd: Double,
    featuresCol: String,
    predictionCol: String) {

  def predict(x: Array[Double]): Double =
    MlpRegressor.forward(layers, weights, x) * yStd + yMean

  def transform(df: DataFrame): DataFrame = {
    val (l, w, m, s) = (layers, weights, yMean, yStd)
    val f = udf((v: Vector) => MlpRegressor.forward(l, w, v.toArray) * s + m)
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
    sb.append(s"$yMean,$yStd,${enc(featuresCol)},${enc(predictionCol)}").append('\n')
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
    require(meta.length == 4,
      s"mlp model artifact meta line malformed (${meta.length} fields, want 4): $path")
    val weights = lines(2).split(",").map(_.toDouble)
    require(weights.length == MlpRegressor.weightCount(layers),
      s"mlp model artifact weight count mismatch: $path")
    def dec(s: String) = java.net.URLDecoder.decode(s, "UTF-8")
    MlpModel(layers, weights, meta(0).toDouble, meta(1).toDouble,
      dec(meta(2)), dec(meta(3)))
  }
}
