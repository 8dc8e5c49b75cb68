package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed physical layout for co-located fact-fact joins.
  *
  * Directory partitioning (CorpusLayout) prunes SCANS; bucketing
  * pre-partitions DATA so the join itself needs no exchange. A
  * fact-fact equi-join (lineitem ⋈ orders on orderkey) normally
  * shuffles BOTH sides on the key every time it runs — at 100 TB that
  * is the single largest recurring network cost in a warehouse. Landing
  * both tables bucketed on the join key into the same number of buckets
  * makes the shuffle a WRITE-TIME cost paid once: every future join
  * reads bucket i of each side on one executor and merges locally
  * (plan-asserted shuffle-free in BucketedJoinSpec), and `sortBy` inside
  * the bucket files lets sort-merge-join skip its sort. Point lookups on
  * the bucket key prune to a single bucket file
  * (`SelectedBucketsCount: 1 out of N` in the scan).
  *
  * Bucket-count choice at scale: buckets × file-size ≈ table size with
  * files in the 128 MB–1 GB band; both join sides MUST agree on count
  * (or differ by an integer factor with
  * spark.sql.bucketing.coalesceBucketsInJoin.enabled).
  */
object BucketedLayout {

  /** Land `df` as a bucketed, in-bucket-sorted managed parquet table.
    * Buckets are hash(key) % n — the same hashPartitioning contract the
    * join exchange would apply, which is exactly why the planner can
    * elide it. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Read a bucketed table back (the catalog carries the bucket spec —
    * a plain `spark.read.parquet` of the same files would lose it). */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
