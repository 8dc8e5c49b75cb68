package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import graft.pipeline.Listings
import scala.util.Random

/** Deterministic synthetic raw-listings fixture (FIXTURES.md §4):
  * exercises every CleanPipeline stage — the three literal dirty
  * zipcodes the reference deletes (NB cell 42), regex-dirty but
  * salvageable zipcodes, nulls in nullable columns, bool + 't'/'f'
  * encodings, the five categoricals, host_since dates spanning the
  * epoch-days conversion, and prices via log_price round-trip.
  */
object ListingsFixture {

  val propertyTypes = Seq("Apartment", "Condominium", "Guesthouse", "House", "Other")
  val roomTypes = Seq("Entire home/apt", "Private room", "Shared room")
  val bedTypes = Seq("Airbed", "Couch", "Futon", "Pull-out Sofa", "Real Bed")
  val policies = Seq("flexible", "moderate", "strict", "super_strict_30", "super_strict_60")
  val cities = Seq("Boston", "Chicago", "DC", "LA", "NYC", "SF")

  def raw(spark: SparkSession, n: Int = 600, seed: Long = 42L): DataFrame = {
    val rnd = new Random(seed)
    val dirtyRows = graft.pipeline.CleanPipeline.dirtyZipcodes
    val rows = (0 until n).map { i =>
      val dirty = i < dirtyRows.length
      val hasNull = !dirty && rnd.nextDouble() < 0.3
      val nullSlot = if (hasNull) rnd.nextInt(4) else -1
      val zip =
        if (dirty) dirtyRows(i)
        else rnd.nextInt(4) match {
          case 0 => "0210" + rnd.nextInt(10)
          // dirty variants share stems with the plain forms, so the
          // regex clean merges them (the reference's 653→559 behavior)
          case 1 => s"0210${rnd.nextInt(10)}-12"   // hyphen form → regex clean
          case 2 => s"6061${rnd.nextInt(10)}.0"    // decimal form → regex clean
          case _ => s"6061${rnd.nextInt(10)}"
        }
      val propertyType = propertyTypes(rnd.nextInt(propertyTypes.length))
      val roomType = roomTypes(rnd.nextInt(roomTypes.length))
      val accommodates = 1 + rnd.nextInt(8)
      val bedroomsV = 1.0 + rnd.nextInt(4)
      // price carries real feature signal (so models can beat the mean
      // baseline, as the reference's do): capacity + room type + noise
      val logPrice = 3.0 + 0.18 * accommodates + 0.15 * bedroomsV +
        (if (roomType == "Entire home/apt") 0.5 else 0.0) +
        (if (propertyType == "House") 0.2 else 0.0) +
        rnd.nextGaussian() * 0.25
      Row(
        i.toLong,                                            // id
        logPrice,                                            // log_price
        propertyType,                                        // property_type
        roomType,                                            // room_type
        """{"Wireless Internet","Air conditioning",Kitchen}""", // amenities
        accommodates.toLong,                                 // accommodates
        if (nullSlot == 0) null else 1.0 + rnd.nextInt(3),   // bathrooms
        bedTypes(rnd.nextInt(bedTypes.length)),              // bed_type
        policies(rnd.nextInt(policies.length)),              // cancellation_policy
        rnd.nextBoolean(),                                   // cleaning_fee
        cities(rnd.nextInt(cities.length)),                  // city
        s"desc $i some text",                                // description
        "2017-01-01",                                        // first_review
        if (rnd.nextBoolean()) "t" else "f",                 // host_has_profile_pic
        if (rnd.nextBoolean()) "t" else "f",                 // host_identity_verified
        if (nullSlot == 1) null else s"${50 + rnd.nextInt(51)}%", // host_response_rate
        f"20${10 + rnd.nextInt(12)}%02d-${1 + rnd.nextInt(12)}%02d-${1 + rnd.nextInt(28)}%02d", // host_since
        if (rnd.nextBoolean()) "t" else "f",                 // instant_bookable
        "2021-01-01",                                        // last_review
        34.0 + rnd.nextDouble(),                             // latitude
        -118.0 - rnd.nextDouble(),                           // longitude
        s"listing $i",                                       // name
        if (nullSlot == 2) null else s"hood_${rnd.nextInt(40)}", // neighbourhood
        rnd.nextInt(300).toLong,                             // number_of_reviews
        if (nullSlot == 3) null else 60.0 + rnd.nextInt(41), // review_scores_rating
        s"http://img/$i.jpg",                                // thumbnail_url
        zip,                                                 // zipcode
        bedroomsV,                                           // bedrooms
        1.0 + rnd.nextInt(5),                                // beds
      )
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), Listings.rawSchema)
  }

  /** Split like the reference's train.csv/test.csv (NB cell 4). */
  def trainTest(spark: SparkSession, n: Int = 600, seed: Long = 42L): (DataFrame, DataFrame) = {
    val all = raw(spark, n, seed)
    (all.filter(org.apache.spark.sql.functions.col("id") % 4 =!= 0),
      all.filter(org.apache.spark.sql.functions.col("id") % 4 === 0))
  }
}
