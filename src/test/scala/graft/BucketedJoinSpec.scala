package graft

import org.apache.spark.sql.functions._
import graft.pipeline.BucketedLayout

/** Bucketed layout: the co-located fact-fact join must plan with NO
  * hash-partition exchange (the write-time bucket layout replaces the
  * per-query shuffle), bucket pruning must fire on key lookups, and
  * results must equal the plain-parquet join. */
class BucketedJoinSpec extends SparkSpec {

  private val nBuckets = 8

  private lazy val tables: Unit = {
    BucketedLayout.writeBucketed(
      Tables.lineitem(spark, sf), "li_bucketed", "l_orderkey", nBuckets)
    BucketedLayout.writeBucketed(
      Tables.orders(spark, sf), "ord_bucketed", "o_orderkey", nBuckets)
  }

  private def bucketedJoin = {
    tables
    BucketedLayout.readBucketed(spark, "li_bucketed")
      .join(BucketedLayout.readBucketed(spark, "ord_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("l_quantity")), 1).as("qty"))
  }

  test("bucketed fact-fact join plans without a hash-partition exchange") {
    // force the join path a 100 TB fact-fact join takes (no broadcast)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = bucketedJoin.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("Bucketed: true"),
        s"scan did not use the bucket layout:\n$plan")

      // sanity: the SAME join over plain parquet does shuffle both sides
      val flat = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf),
          col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("n"))
      assert(flat.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning"),
        "control query unexpectedly shuffle-free; assertion is vacuous")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("bucketed join result equals the plain-parquet join") {
    val got = bucketedJoin.collect().head
    val want = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 1).as("qty"))
      .collect().head
    assert(got == want)
  }

  test("point lookup on the bucket key prunes to a single bucket") {
    tables
    // autoBucketedScan only keeps the bucketed layout when a JOIN/AGG
    // exploits the distribution; a point lookup must opt in explicitly
    // to get bucket pruning instead of a full scan
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      val probe = Tables.orders(spark, sf).select("o_orderkey").head().getLong(0)
      val q = BucketedLayout.readBucketed(spark, "li_bucketed")
        .filter(col("l_orderkey") === probe)
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains(s"SelectedBucketsCount: 1 out of $nBuckets"),
        s"no bucket pruning in:\n$plan")
      val want = Tables.lineitem(spark, sf)
        .filter(col("l_orderkey") === probe).count()
      assert(q.count() == want)
    } finally
      spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
  }
}
