package graft.pipeline

import org.apache.spark.ml.feature.StringIndexer
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's feature-engineering flow (EDA Notebook top-to-bottom,
  * SURVEY.md §3.2) as composable `DataFrame => DataFrame` stages.
  *
  * In the reference each step executes eagerly in pandas, materializing
  * every intermediate. Here the whole chain stays one lazy DataFrame
  * lineage: Catalyst collapses the withColumn/drop/filter steps into a
  * single optimized plan (CollapseProject + ColumnPruning mean the
  * parquet/CSV scan only ever reads the 16 surviving columns, and the
  * row filters push down to the scan) — the property that turns a
  * 14-pass pandas script into a one-pass distributed job.
  */
object CleanPipeline {
  type Stage = DataFrame => DataFrame

  /** NB cell 6: pd.concat([train, test]) — UNION ALL semantics. */
  def unionTrainTest(train: DataFrame, test: DataFrame): DataFrame =
    train.unionByName(test)

  /** NB cell 16: dropna(axis=0) — drop rows with any null. */
  val dropNulls: Stage = _.na.drop("any")

  /** NB cell 17: bool / 't'/'f' flags → 0/1 ints. */
  val boolsToBinary: Stage = df => df
    .withColumn("cleaning_fee", when(col("cleaning_fee") === true, 1).otherwise(0))
    .withColumn("instant_bookable", when(col("instant_bookable") === "t", 1).otherwise(0))
    .withColumn("host_identity_verified",
      when(col("host_identity_verified") === "t", 1).otherwise(0))

  /** NB cells 18-19: price = round(exp(log_price), 2) — invert the
    * natural log back to USD. */
  val recoverPrice: Stage =
    _.withColumn("price", round(exp(col("log_price")), 2))

  /** NB cell 42: drop the three literally-dirty zipcode rows. */
  val dirtyZipcodes: Seq[String] = Seq(
    "1m",
    "95202\r\r\r\r\r\r\n\r\r\r\r\r\r\n\r\r\r\r\r\r\n94158",
    "11249\r\r\r\r\r\r\n11249")
  val dropDirtyZipcodeRows: Stage =
    _.filter(!col("zipcode").isin(dirtyZipcodes: _*))

  /** NB cells 41/43/44: clean_data regex + first token, then cast int.
    * Spark 4 runs ANSI mode by default, where a bare CAST on a
    * non-numeric leftover (e.g. "m") would abort the job — so the cast
    * is guarded by a digits-only match and anything else becomes null
    * (what the reference's astype(int) path would have rejected). */
  val cleanZipcodes: Stage = df => {
    val cleaned = graft.queries.FunctionQueries.cleanData(col("zipcode"))
    df.withColumn("zipcode",
      when(cleaned.rlike("^[0-9]+$"), cleaned.cast("int")))
  }

  /** NB cell 50: drop the 10 non-features (incl. log_price: leakage). */
  val dropUnusedColumns: Stage = _.drop(
    "host_has_profile_pic", "host_response_rate", "number_of_reviews",
    "log_price", "description", "first_review", "last_review",
    "thumbnail_url", "id", "amenities")

  /** NB cell 55: drop name/lat/long/neighbourhood after the map EDA. */
  val dropGeoColumns: Stage =
    _.drop("name", "latitude", "longitude", "neighbourhood")

  /** NB cell 76: sklearn LabelEncoder loop over the 5 categoricals.
    * LabelEncoder assigns codes in sorted order, so the StringIndexer
    * MUST use alphabetAsc (frequencyDesc — the default — silently
    * yields different codes). Fit+transform in one stage, like the
    * reference's fit_transform. */
  val labelEncodeCategoricals: Stage = df => {
    val indexer = new StringIndexer()
      .setInputCols(Listings.categoricalCols.toArray)
      .setOutputCols(Listings.categoricalCols.map(_ + "_idx").toArray)
      .setStringOrderType("alphabetAsc")
    val indexed = indexer.fit(df).transform(df)
    Listings.categoricalCols.foldLeft(indexed) { (d, c) =>
      d.withColumn(c, col(c + "_idx").cast("int")).drop(c + "_idx")
    }
  }

  /** NB cell 79: cast the 8 numeric/boolean-coded features to int. */
  val castFeatureInts: Stage = df =>
    Seq("cleaning_fee", "host_identity_verified", "instant_bookable",
      "bathrooms", "review_scores_rating", "bedrooms", "beds", "accommodates")
      .foldLeft(df)((d, c) => d.withColumn(c, col(c).cast("int")))

  /** NB cells 87/89: host_since "yyyy-MM-dd" → UTC epoch days
    * (datetime_to_UTC_days; 2021-06-22 → 18800). try_to_date so a
    * malformed date becomes null instead of an ANSI-mode job abort. */
  val hostSinceToEpochDays: Stage = df => df
    .withColumn("host_since",
      datediff(expr("try_to_date(host_since, 'yyyy-MM-dd')"), lit("1970-01-01")))

  /** NB cell 100: the persisted pandas index becomes an explicit
    * row_id. zipWithIndex-free: a window-less monotonic id is fine for
    * identity (the reference's index carries no semantics). */
  val addRowId: Stage =
    _.withColumn("row_id", monotonically_increasing_id())

  /** Project to the canonical 17-column clean schema order. */
  val selectCleanColumns: Stage =
    _.select("row_id", "property_type", "room_type", "accommodates",
      "bathrooms", "bed_type", "cancellation_policy", "cleaning_fee",
      "city", "host_identity_verified", "host_since", "instant_bookable",
      "review_scores_rating", "zipcode", "bedrooms", "beds", "price")

  /** The full chain on an already-unioned raw frame. */
  val stages: Seq[Stage] = Seq(
    dropNulls, boolsToBinary, recoverPrice, dropDirtyZipcodeRows,
    cleanZipcodes, dropUnusedColumns, dropGeoColumns,
    labelEncodeCategoricals, castFeatureInts, hostSinceToEpochDays,
    addRowId, selectCleanColumns)

  def clean(raw: DataFrame): DataFrame =
    stages.foldLeft(raw)((df, stage) => stage(df))

  /** Entry point matching the reference end-to-end: two raw frames in,
    * clean feature table out. */
  def run(train: DataFrame, test: DataFrame): DataFrame =
    clean(unionTrainTest(train, test))
}
