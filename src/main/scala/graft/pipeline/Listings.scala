package graft.pipeline

import org.apache.spark.sql.types._

/** Schemas for the listings entity (SURVEY.md §1, FIXTURES.md).
  *
  * The raw schema transliterates the 29-column Kaggle CSV shape the
  * reference reads (EDA Notebook.ipynb cell 4/11); the clean schema is
  * the 17-column encoded table it persists (row_id + 15 features + price, cell 100's Final_EDA.csv,
  * pipeline.py:14's SQLite air_b, db_queries.py:4-23's PostgreSQL DDL).
  * Explicit StructTypes are the declared contract — schema inference
  * (`inferSchema`) stays available through Ingest.readRawCsv but is not
  * the default: at 100 TB an inference pass is a full extra scan.
  */
object Listings {

  /** Raw Kaggle listing schema: 29 columns, dtypes per NB cell 11. */
  val rawSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("log_price", DoubleType),
    StructField("property_type", StringType),
    StructField("room_type", StringType),
    StructField("amenities", StringType),
    StructField("accommodates", LongType),
    StructField("bathrooms", DoubleType),
    StructField("bed_type", StringType),
    StructField("cancellation_policy", StringType),
    StructField("cleaning_fee", BooleanType),
    StructField("city", StringType),
    StructField("description", StringType),
    StructField("first_review", StringType),
    StructField("host_has_profile_pic", StringType),
    StructField("host_identity_verified", StringType),
    StructField("host_response_rate", StringType),
    StructField("host_since", StringType),
    StructField("instant_bookable", StringType),
    StructField("last_review", StringType),
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType),
    StructField("name", StringType),
    StructField("neighbourhood", StringType),
    StructField("number_of_reviews", LongType),
    StructField("review_scores_rating", DoubleType),
    StructField("thumbnail_url", StringType),
    StructField("zipcode", StringType),
    StructField("bedrooms", DoubleType),
    StructField("beds", DoubleType),
  ))

  /** The five categorical columns label-encoded by NB cell 76. */
  val categoricalCols: Seq[String] =
    Seq("property_type", "room_type", "bed_type", "cancellation_policy", "city")

  /** The 15 feature columns of the final matrix (models' input shape
    * [·,15]; FIXTURES.md §2's Reordered Feature Matrix order). */
  val featureCols: Seq[String] = Seq(
    "host_since", "host_identity_verified", "property_type", "room_type",
    "accommodates", "bathrooms", "bed_type", "cancellation_policy",
    "cleaning_fee", "city", "beds", "instant_bookable",
    "review_scores_rating", "zipcode", "bedrooms")

  /** Clean/encoded schema: row_id + 15 int features + double price
    * (Final_EDA.csv / air_b, db_queries.py:4-23). */
  val cleanSchema: StructType = StructType(
    StructField("row_id", LongType, nullable = false) +:
      (Seq("property_type", "room_type", "accommodates", "bathrooms",
        "bed_type", "cancellation_policy", "cleaning_fee", "city",
        "host_identity_verified", "host_since", "instant_bookable",
        "review_scores_rating", "zipcode", "bedrooms", "beds")
        .map(StructField(_, IntegerType)) :+
        StructField("price", DoubleType)))
}
