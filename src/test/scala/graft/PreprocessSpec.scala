package graft

import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.functions._
import graft.ml.Preprocess
import graft.pipeline.{CleanPipeline, Listings}

class PreprocessSpec extends SparkSpec {

  private lazy val clean = {
    val (train, test) = ListingsFixture.trainTest(spark)
    CleanPipeline.run(train, test).cache()
  }

  test("standard scaler yields mean≈0, std≈1 per feature (E3)") {
    val scaled = Preprocess.standardize(clean, Listings.featureCols)
    val vecs = scaled.select("features").collect().map(_.getAs[Vector](0))
    val dim = vecs.head.size
    (0 until dim).foreach { i =>
      val xs = vecs.map(_(i))
      val mean = xs.sum / xs.length
      val std = math.sqrt(xs.map(x => (x - mean) * (x - mean)).sum / (xs.length - 1))
      assert(math.abs(mean) < 1e-9, s"feature $i mean $mean")
      // constant columns scale to std 0; anything else must hit 1
      assert(std < 1e-9 || math.abs(std - 1.0) < 1e-9, s"feature $i std $std")
    }
  }

  test("normalizer produces unit L2 rows (E3)") {
    val assembled = Preprocess.assembler(Listings.featureCols).transform(clean)
    val normed = Preprocess.normalizer().transform(assembled)
    val norms = normed.select("features_norm").collect()
      .map(_.getAs[Vector](0).toArray.map(x => x * x).sum)
    norms.foreach(n => assert(math.abs(n - 1.0) < 1e-9))
  }

  test("binarizer thresholds a numeric column (E3)") {
    val bin = Preprocess.binarizer("price", "expensive", 100.0)
      .transform(clean.withColumn("price", col("price").cast("double")))
    val rows = bin.select("price", "expensive").collect()
    rows.foreach { r =>
      val expect = if (r.getDouble(0) > 100.0) 1.0 else 0.0
      assert(r.getDouble(1) == expect)
    }
  }

  test("one-hot expands a label-encoded column to k indicator slots (E2)") {
    val k = clean.select("city").distinct().count().toInt
    val ohe = Preprocess.oneHot("city", "city_oh")
      .fit(clean.withColumn("city", col("city").cast("double")))
      .transform(clean.withColumn("city", col("city").cast("double")))
    val vecs = ohe.select("city", "city_oh").collect()
    vecs.foreach { r =>
      val v = r.getAs[Vector](1)
      assert(v.size == k)
      assert(v.toArray.sum == 1.0)
      assert(v(r.getDouble(0).toInt) == 1.0)
    }
  }
}
