package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{CleanPipeline, Listings}

class CleanPipelineSpec extends SparkSpec {

  private lazy val (trainDf, testDf) = ListingsFixture.trainTest(spark)
  private lazy val clean = CleanPipeline.run(trainDf, testDf).cache()

  test("union keeps concat semantics: count = train + test") {
    val unioned = CleanPipeline.unionTrainTest(trainDf, testDf)
    assert(unioned.count() == trainDf.count() + testDf.count())
  }

  test("final schema matches the reference's 17-column clean schema") {
    assert(clean.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      Listings.cleanSchema.fields.map(f => (f.name, f.dataType)).toSeq)
  }

  test("dropna + dirty-row deletion shrink the row count as expected") {
    val raw = CleanPipeline.unionTrainTest(trainDf, testDf)
    val afterNa = CleanPipeline.dropNulls(raw)
    assert(afterNa.count() < raw.count(), "fixture must contain nulls")
    // dirty zipcodes all survive dropna (they have no nulls) and are
    // then deleted: 3 fewer rows, mirroring 38,502 -> 38,499.
    assert(clean.count() == afterNa.count() - CleanPipeline.dirtyZipcodes.length)
  }

  test("no nulls remain in any feature column") {
    val nullCounts = clean.select(
      clean.columns.map(c => sum(col(c).isNull.cast("long")).as(c)): _*).head()
    clean.columns.zipWithIndex.foreach { case (c, i) =>
      assert(nullCounts.getLong(i) == 0L, s"column $c has nulls")
    }
  }

  test("price is round(exp(log_price), 2) — reference cell 18 round-trip") {
    val raw = CleanPipeline.unionTrainTest(trainDf, testDf)
    val expected = CleanPipeline.dropNulls(raw)
      .filter(!col("zipcode").isin(CleanPipeline.dirtyZipcodes: _*))
      .select(round(exp(col("log_price")), 2).as("p"))
      .collect().map(_.getDouble(0)).sorted
    val got = clean.select("price").collect().map(_.getDouble(0)).sorted
    assert(got.sameElements(expected))
  }

  test("label codes are lexicographic (sklearn LabelEncoder parity)") {
    import SparkSpec.spark.implicits._
    // alphabetAsc must reproduce sklearn's sorted-order codes exactly
    val df = Seq("House", "Apartment", "Condominium", "Apartment", "Other")
      .toDF("property_type")
      .withColumn("room_type", lit("Private room"))
      .withColumn("bed_type", lit("Futon"))
      .withColumn("cancellation_policy", lit("strict"))
      .withColumn("city", lit("NYC"))
    val encoded = CleanPipeline.labelEncodeCategoricals(df)
      .select("property_type").collect().map(_.getInt(0)).toSeq
    // sorted distinct: Apartment=0, Condominium=1, House=2, Other=3
    assert(encoded == Seq(2, 0, 1, 0, 3))
    // and each encoded column in the full pipeline is dense 0..k-1
    Listings.categoricalCols.foreach { c =>
      val codes = clean.select(col(c)).distinct()
        .collect().map(_.getInt(0)).sorted.toSeq
      assert(codes == codes.indices.map(identity), s"$c codes not dense: $codes")
    }
  }

  test("boolean flags are 0/1") {
    Seq("cleaning_fee", "instant_bookable", "host_identity_verified").foreach { c =>
      val vals = clean.select(c).distinct().collect().map(_.getInt(0)).toSet
      assert(vals.subsetOf(Set(0, 1)), s"$c: $vals")
    }
  }

  test("host_since matches the reference's UTC epoch-days example") {
    // datetime_to_UTC_days("2021-06-22") == 18800 (NB cells 81-83)
    import SparkSpec.spark.implicits._
    val df = Seq("2021-06-22").toDF("host_since")
    val days = CleanPipeline.hostSinceToEpochDays(df).head().getInt(0)
    assert(days == 18800)
  }

  test("zipcode cleaning recovers the first numeric token") {
    import SparkSpec.spark.implicits._
    val df = Seq("94025-12", "11240.0", "02108").toDF("zipcode")
    val got = CleanPipeline.cleanZipcodes(df).collect().map(_.getInt(0))
    assert(got.sameElements(Array(94025, 11240, 2108)))
  }

  test("distinct zipcode count shrinks across cleaning (653->559 behavior)") {
    val raw = CleanPipeline.dropNulls(CleanPipeline.unionTrainTest(trainDf, testDf))
      .filter(!col("zipcode").isin(CleanPipeline.dirtyZipcodes: _*))
    val before = raw.select("zipcode").distinct().count()
    val after = clean.select("zipcode").distinct().count()
    assert(after < before, s"cleaning should merge zipcode variants ($before -> $after)")
  }

  test("whole chain stays one pruned scan: plan reads only needed columns") {
    val plan = clean.queryExecution.executedPlan.toString
    assert(!plan.contains("thumbnail_url") || plan.contains("ReadSchema"),
      "dropped columns should be pruned from the scan")
  }
}
