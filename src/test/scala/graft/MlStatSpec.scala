package graft

import org.apache.spark.ml.linalg.Matrix
import org.apache.spark.ml.stat.{Correlation, Summarizer}
import org.apache.spark.sql.functions._
import graft.ml.Preprocess
import graft.pipeline.{CleanPipeline, Listings}

/** MLlib distributed statistics (SURVEY.md A5/A6's matrix forms): the
  * full Pearson correlation matrix (the reference's df.corr(), NB cell
  * 21, computed on all features at once) and vector-column summary
  * statistics — both single treeAggregate passes, the scale form of
  * describe().
  */
class MlStatSpec extends SparkSpec {

  private lazy val clean = {
    val (trainDf, testDf) = ListingsFixture.trainTest(spark)
    CleanPipeline.run(trainDf, testDf).cache()
  }

  test("Correlation.corr matrix agrees with pairwise corr() (A6)") {
    val cols = Seq("accommodates", "bedrooms", "beds", "price")
    val assembled = Preprocess.assembler(cols, "v")
      .transform(clean.select(cols.map(c => col(c).cast("double")): _*))
    val m = Correlation.corr(assembled, "v").head().getAs[Matrix](0)
    for (i <- cols.indices; j <- cols.indices if i < j) {
      val pair = clean.agg(corr(cols(i), cols(j))).head().getDouble(0)
      assert(math.abs(m(i, j) - pair) < 1e-9,
        s"corr(${cols(i)},${cols(j)}): matrix ${m(i, j)} vs pairwise $pair")
    }
    cols.indices.foreach(i => assert(math.abs(m(i, i) - 1.0) < 1e-12))
  }

  test("Summarizer vector stats equal column-wise aggregates (A5 at scale)") {
    val cols = Listings.featureCols
    val assembled = Preprocess.assembler(cols, "v").transform(clean)
    val row = assembled.select(
      Summarizer.metrics("mean", "max", "count").summary(col("v")).as("s"))
      .select("s.mean", "s.max", "s.count").head()
    val means = row.getAs[org.apache.spark.ml.linalg.Vector](0)
    val maxes = row.getAs[org.apache.spark.ml.linalg.Vector](1)
    assert(row.getLong(2) == clean.count())
    cols.zipWithIndex.foreach { case (c, i) =>
      val (m, mx) = clean.agg(avg(c), max(col(c).cast("double"))).head() match {
        case r => (r.getDouble(0), r.getDouble(1))
      }
      assert(math.abs(means(i) - m) < 1e-9, s"$c mean")
      assert(maxes(i) == mx, s"$c max")
    }
  }
}
