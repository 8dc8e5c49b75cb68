package graft

import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning (Catalyst's
  * InjectRuntimeFilter): when a fact-fact join's build side carries a
  * selective filter, the optimizer plants a bloom filter built from the
  * build side's join keys as an extra predicate on the probe side —
  * probe rows that cannot match are dropped BEFORE the join's shuffle.
  * At 100 TB this is the difference between shuffling the whole fact
  * table and shuffling the ~matching slice; the engine relies on it, so
  * this spec pins that the injection actually fires on our join shapes
  * (it is config-gated and silently skips when thresholds don't match —
  * exactly the kind of regression a plan assertion catches). */
class RuntimeFilterSpec extends SparkSpec {

  test("selective build side injects a bloom filter on the probe scan") {
    def joined = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf)
        .filter(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey"))
      .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 1).as("qty"))
    // expected row under default planning (no injected filter)
    val want = joined.collect().head
    // force the shuffle-join path a 100 TB fact-fact join takes, and
    // drop the size thresholds to test scale (defaults: 10MB build /
    // 10GB probe)
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1KB")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val q = joined
      val plan = q.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain") && plan.contains("bloom_filter_agg"),
        s"no runtime bloom filter injected:\n$plan")
      // and the bloom-pruned plan returns exactly the default-plan result
      assert(q.collect().head == want)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
