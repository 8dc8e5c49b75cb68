package graft.scale

import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row}
import org.apache.spark.sql.functions._

/** Scale mechanics the 100 TB deployment leans on (SURVEY.md §4.2,
  * BASELINE north-star): skew-salted joins and bucketed co-located
  * joins. Kept as a small library so every operator module uses the
  * same patterns instead of re-deriving them.
  */
object Scale {

  /** Salted equi-join for skew: a hot fact key (the classic "one user
    * is 10% of events" failure) lands in `salts` shuffle partitions
    * instead of one. The fact side gets a uniform salt; the dim side is
    * replicated once per salt value via a tiny literal explode — dim
    * rows grow ×salts, fact rows don't move twice. Semantically
    * identical to fact.join(dim, key) (inner), verified by test.
    *
    * AQE's skew-join handles sort-merge skew automatically at runtime;
    * explicit salting remains the tool for aggregation skew and for
    * deterministic layouts (and pre-AQE engines). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      salts: Int): DataFrame = {
    val saltedFact = fact.withColumn("_salt",
      (rand(42) * salts).cast("int"))
    val saltedDim = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(saltedDim, Seq(key, "_salt")).drop("_salt")
  }

  /** Salted aggregation: two-phase group-by for skewed group keys —
    * partial aggregate on (key, salt), final on key. For algebraic
    * aggregates Spark's partial aggregation already does this per
    * partition; explicit salting is for the holistic cases (e.g.
    * collect-style or exact-distinct per key). */
  def saltedDistinctCount(df: DataFrame, groupKey: String,
      distinctCol: String, salts: Int): DataFrame =
    df.withColumn("_salt", pmod(hash(col(distinctCol)), lit(salts)))
      .groupBy(col(groupKey), col("_salt"))
      .agg(countDistinct(col(distinctCol)).as("_partial"))
      .groupBy(groupKey)
      .agg(sum("_partial").as("n_distinct"))

  /** Bucketed writer: pre-shuffles once at write time so every later
    * equi-join/aggregation on the bucket key runs shuffle-free (plan
    * shows SortMergeJoin with no Exchange). At 100 TB this converts
    * the dominant recurring join shuffle into a one-time layout cost. */
  def bucketedWriter(df: DataFrame, key: String, buckets: Int): DataFrameWriter[Row] =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .mode("overwrite")
}
