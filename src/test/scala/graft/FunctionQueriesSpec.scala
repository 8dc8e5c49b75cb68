package graft

import org.apache.spark.sql.functions._
import graft.queries.FunctionQueries

class FunctionQueriesSpec extends SparkSpec {

  test("parseAmenities turns the brace-set string into a clean array (F9)") {
    import SparkSpec.spark.implicits._
    val df = Seq(
      """{"Wireless Internet","Air conditioning",Kitchen}""",
      """{TV,"Smoke detector"}""",
      "{}",
      """{Heating}""").toDF("amenities")
    val got = df.select(FunctionQueries.parseAmenities(col("amenities")).as("a"))
      .collect().map(_.getSeq[String](0).toList)
    assert(got(0) == List("Wireless Internet", "Air conditioning", "Kitchen"))
    assert(got(1) == List("TV", "Smoke detector"))
    assert(got(2) == Nil)
    assert(got(3) == List("Heating"))
  }

  test("amenity token count matches the reference's size-of-split idea (F5)") {
    import SparkSpec.spark.implicits._
    val (trainDf, testDf) = ListingsFixture.trainTest(spark)
    val counts = trainDf.unionByName(testDf)
      .select(size(FunctionQueries.parseAmenities(col("amenities"))).as("n"))
      .distinct().collect().map(_.getInt(0))
    assert(counts.sameElements(Array(3))) // fixture always has 3 amenities
  }

  test("cleanData handles the reference's dirty zipcode shapes") {
    import SparkSpec.spark.implicits._
    val df = Seq(
      "95202\r\r\r\r\r\r\n\r\r\r\r\r\r\n\r\r\r\r\r\r\n94158",
      "11249\r\r\r\r\r\r\n11249",
      "02108").toDF("z")
    val got = df.select(FunctionQueries.cleanData(col("z"))).collect().map(_.getString(0))
    assert(got.sameElements(Array("95202", "11249", "02108")))
  }
}
