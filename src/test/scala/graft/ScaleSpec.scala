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
