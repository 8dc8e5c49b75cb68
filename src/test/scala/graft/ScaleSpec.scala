package graft

import org.apache.spark.sql.functions._
import graft.scale.Scale

class ScaleSpec extends SparkSpec {

  test("salted join equals the plain join") {
    val fact = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    def dim = Tables.orders(spark, sf)
      .withColumnRenamed("o_orderkey", "l_orderkey")
      .select("l_orderkey", "o_totalprice")
    val plain = fact.join(dim, Seq("l_orderkey"))
    val salted = Scale.saltedJoin(fact, dim, "l_orderkey", salts = 8)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0 && plain.exceptAll(salted).count() == 0)
  }

  test("salted distinct count equals exact distinct count per group") {
    val exact = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(countDistinct("l_partkey").as("n_distinct"))
    val salted = Scale.saltedDistinctCount(
      Tables.lineitem(spark, sf), "l_returnflag", "l_partkey", salts = 8)
    assert(salted.collect().map(_.toSeq).toSet == exact.collect().map(_.toSeq).toSet)
  }

  test("dynamic partition pruning fires on a partitioned fact star-join") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dpp").toString
    // fact partitioned by priority; tiny dim carries a selective filter
    Tables.orders(spark, sf)
      .write.partitionBy("o_orderpriority").mode("overwrite").parquet(dir)
    // the dim must be a real datasource: a LocalRelation's filter gets
    // constant-folded away by ConvertToLocalRelation, leaving no
    // selective predicate for the DPP rule to key on
    val dimDir = java.nio.file.Files.createTempDirectory("graft-dpp-dim").toString
    spark.createDataFrame(Seq(
      ("1-URGENT", "hot"), ("2-HIGH", "hot"), ("3-MEDIUM", "warm"),
      ("4-NOT SPECIFIED", "cold"), ("5-LOW", "cold")))
      .toDF("prio", "tier").write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    val fact = spark.read.parquet(dir)
    val joined = fact
      .join(dim.filter(col("tier") === "hot"), fact("o_orderpriority") === dim("prio"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected a dynamic partition pruning subquery in:\n$plan")
    // and the result is correct: only the two hot priorities survive
    val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = Tables.orders(spark, sf)
      .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      .groupBy("o_orderpriority").agg(count(lit(1)))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("ANALYZE TABLE statistics reach the optimizer (CBO surface)") {
    Tables.customer(spark, sf).write.mode("overwrite").saveAsTable("customer_stats")
    spark.sql("ANALYZE TABLE customer_stats COMPUTE STATISTICS FOR ALL COLUMNS")
    val prev = spark.conf.get("spark.sql.cbo.enabled", "false")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      val stats = spark.table("customer_stats")
        .queryExecution.optimizedPlan.stats
      assert(stats.rowCount.contains(BigInt(Tables.customer(spark, sf).count())),
        s"expected exact rowCount stat, got $stats")
      assert(stats.attributeStats.nonEmpty, "expected per-column stats")
      // a filter estimate should shrink the row count, not echo the table's
      val filtered = spark.table("customer_stats")
        .filter(org.apache.spark.sql.functions.col("c_mktsegment") === "BUILDING")
        .queryExecution.optimizedPlan.stats
      assert(filtered.rowCount.exists(_ < stats.rowCount.get))
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", prev)
      spark.sql("DROP TABLE customer_stats")
    }
  }

  test("bucketed tables join without a shuffle exchange") {
    Scale.bucketedWriter(
      Tables.orders(spark, sf).select("o_orderkey", "o_totalprice"),
      "o_orderkey", buckets = 4).saveAsTable("orders_b")
    Scale.bucketedWriter(
      Tables.lineitem(spark, sf)
        .select(col("l_orderkey").as("o_orderkey"), col("l_quantity")),
      "o_orderkey", buckets = 4).saveAsTable("lineitem_b")
    val joined = spark.table("lineitem_b").hint("merge")
      .join(spark.table("orders_b"), "o_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    assert(!plan.contains("Exchange"),
      s"bucketed join must not shuffle:\n$plan")
    // and it is still correct
    val expect = Tables.lineitem(spark, sf).count()
    assert(joined.count() == expect)
  }
}
