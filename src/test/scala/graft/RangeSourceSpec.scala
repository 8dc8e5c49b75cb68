package graft

import org.apache.spark.sql.functions._

/** The custom DataSource V2 connector (sources/RangeSource): values,
  * declared parallelism, and column-pruning pushdown. */
class RangeSourceSpec extends SparkSpec {

  private def ranged(start: Long, end: Long, slices: Int) =
    spark.read.format("graft.sources.RangeSource")
      .option("start", start.toString)
      .option("end", end.toString)
      .option("slices", slices.toString)
      .load()

  test("values are the declared pure functions of id") {
    val df = ranged(0, 1000, 8)
    assert(df.count() == 1000)
    val agg = df.agg(
      sum("id").as("sid"), sum("val").as("sval"),
      countDistinct("tag").as("ntag")).head()
    assert(agg.getLong(0) == 499500L)
    assert(agg.getDouble(1) == 249750.0)
    assert(agg.getLong(2) == 10L)
    // spot row
    val r = df.filter(col("id") === 17).head()
    assert(r.getDouble(1) == 8.5 && r.getString(2) == "t7")
  }

  test("the connector declares the partitioning (slices -> tasks)") {
    assert(ranged(0, 100, 7).rdd.getNumPartitions == 7)
    // empty and single-slice edges
    assert(ranged(5, 5, 3).count() == 0)
    assert(ranged(0, 10, 1).rdd.getNumPartitions == 1)
  }

  test("projection is pushed INTO the connector (pruned ReadSchema)") {
    val exec = ranged(0, 100, 2).select("id").queryExecution.executedPlan
    val scans = exec.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.nonEmpty, s"no BatchScan in:\n$exec")
    assert(scans.head.output.map(_.name) == Seq("id"),
      s"scan must read only id, got ${scans.head.output}:\n$exec")
    // and the pruned read still computes correctly
    assert(ranged(0, 100, 2).select("tag").distinct().count() == 10)
  }

  test("id-range filters are pushed into planning: readers generate only survivors") {
    graft.sources.RangeSource.rowsRead.set(0)
    val got = ranged(0, 1000, 8).filter(col("id") >= 990 && col("id") < 995)
      .select("id").collect().map(_.getLong(0)).sorted
    assert(got.sameElements(990L until 995L))
    val generated = graft.sources.RangeSource.rowsRead.get()
    assert(generated == 5,
      s"pushdown must narrow generation to 5 rows, readers produced $generated")
    // a non-id predicate stays residual and still answers correctly
    graft.sources.RangeSource.rowsRead.set(0)
    assert(ranged(0, 100, 4).filter(col("tag") === "t3").count() == 10)
    assert(graft.sources.RangeSource.rowsRead.get() == 100,
      "tag predicate is residual: full generation expected")
  }

  test("LIMIT is pushed into planning: readers generate exactly limit rows") {
    graft.sources.RangeSource.rowsRead.set(0)
    val got = ranged(0, 1000, 8).limit(7)
      .select("id").collect().map(_.getLong(0)).sorted
    assert(got.sameElements(0L until 7L))
    val generated = graft.sources.RangeSource.rowsRead.get()
    assert(generated == 7,
      s"limit pushdown must truncate generation to 7 rows, got $generated")
    // limit composes with a pushed filter: only the surviving prefix
    graft.sources.RangeSource.rowsRead.set(0)
    val fl = ranged(0, 1000, 4).filter(col("id") >= 100).limit(3)
      .select("id").collect().map(_.getLong(0)).sorted
    assert(fl.sameElements(100L until 103L))
    assert(graft.sources.RangeSource.rowsRead.get() == 3,
      "filter+limit must generate exactly the 3 surviving rows")
  }

  test("ORDER BY id LIMIT is pushed: only the surviving range end generates") {
    // ascending: the top-5 under id asc is the range PREFIX
    graft.sources.RangeSource.rowsRead.set(0)
    val asc = ranged(0, 1000, 8).orderBy(col("id")).limit(5)
      .collect().map(_.getLong(0))
    assert(asc.sameElements(0L until 5L))
    assert(graft.sources.RangeSource.rowsRead.get() == 5,
      s"asc top-5 must generate 5 rows, got ${graft.sources.RangeSource.rowsRead.get()}")
    // descending: the top-5 under id desc is the range SUFFIX
    graft.sources.RangeSource.rowsRead.set(0)
    val desc5 = ranged(0, 1000, 8).orderBy(col("id").desc).limit(5)
      .collect().map(_.getLong(0))
    assert(desc5.sameElements((995L until 1000L).reverse))
    assert(graft.sources.RangeSource.rowsRead.get() == 5,
      s"desc top-5 must generate 5 rows, got ${graft.sources.RangeSource.rowsRead.get()}")
    // a non-id sort must NOT push: full generation, correct answer
    graft.sources.RangeSource.rowsRead.set(0)
    val byVal = ranged(0, 100, 4).orderBy(col("tag"), col("id")).limit(3)
      .collect().map(_.getLong(0))
    assert(byVal.sameElements(Seq(0L, 10L, 20L)))
    assert(graft.sources.RangeSource.rowsRead.get() == 100,
      "non-id sort is not pushable: full generation expected")
  }

  test("reported statistics let a small range table broadcast in a join") {
    // without SupportsReportStatistics a V2 relation defaults to
    // defaultSizeInBytes (effectively infinite) and never broadcasts;
    // with it, the 100-row side must plan as BroadcastHashJoin
    val small = ranged(0, 100, 2)
    val big = ranged(0, 200000, 8)
    val joined = big.join(small.withColumnRenamed("val", "v2")
      .withColumnRenamed("tag", "t2"), "id")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"stats must make the 100-row side broadcast:\n$plan")
    assert(joined.count() == 100)
  }

  test("count/min/max push COMPLETELY: readers generate zero base rows") {
    graft.sources.RangeSource.rowsRead.set(0)
    val r = ranged(5, 10005, 8)
      .agg(count(lit(1)).as("n"), min("id").as("mn"), max("id").as("mx"),
        count("id").as("nid"))
      .collect().head
    assert(r.getLong(0) == 10000L && r.getLong(1) == 5L &&
      r.getLong(2) == 10004L && r.getLong(3) == 10000L)
    assert(graft.sources.RangeSource.rowsRead.get() == 0,
      "closed-form aggregates must not generate base rows")
    // the plan carries the pushed aggregation, not a scan aggregate
    val plan = ranged(5, 10005, 8).agg(count(lit(1)), min("id"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates") || plan.contains("RangeAggScan"),
      s"plan must show the pushed aggregation:\n$plan")
  }

  test("aggregate pushdown composes with pushed id filters") {
    graft.sources.RangeSource.rowsRead.set(0)
    val r = ranged(0, 1000, 4).filter(col("id") >= 900 && col("id") < 950)
      .agg(count(lit(1)), min("id"), max("id")).collect().head
    assert(r.getLong(0) == 50L && r.getLong(1) == 900L && r.getLong(2) == 949L)
    assert(graft.sources.RangeSource.rowsRead.get() == 0,
      "filter-narrowed closed forms still need no base rows")
    // empty surviving range: count 0, min/max NULL — one row
    val e = ranged(0, 100, 4).filter(col("id") > 1000)
      .agg(count(lit(1)), min("id"), max("id")).collect().head
    assert(e.getLong(0) == 0L && e.isNullAt(1) && e.isNullAt(2))
  }

  test("non-closed-form aggregates fall back to full generation, correct") {
    // avg(val) and GROUP BY are not translatable: the connector must
    // decline and Spark aggregates the generated rows normally
    graft.sources.RangeSource.rowsRead.set(0)
    val r = ranged(0, 100, 4).agg(avg("val")).collect().head
    assert(math.abs(r.getDouble(0) - 24.75) < 1e-12)
    assert(graft.sources.RangeSource.rowsRead.get() == 100,
      "non-pushable aggregate must generate the range")
    val g = ranged(0, 100, 4).groupBy("tag").agg(count(lit(1)).as("n"))
    assert(g.collect().map(_.getLong(1)).forall(_ == 10L))
  }

  test("runtime (DPP) filtering narrows generation via the build side's keys") {
    // the fifth V2 rung: the probe-side scan declares id filterable
    // (SupportsRuntimeV2Filtering); Spark executes the selective build
    // side first and pushes the observed join keys back as an IN
    // predicate, which the scan reduces to its [min, max] envelope
    // BEFORE planning partitions — readers never generate the rest of
    // the million-row range. useStats=false because the synthetic
    // range reports flat stats and the benefit heuristic would
    // otherwise veto pruning that is plainly profitable here.
    val key = "spark.sql.optimizer.dynamicPartitionPruning.useStats"
    val prev = spark.conf.getOption(key)
    try {
      spark.conf.set(key, "false")
      val big = ranged(0, 1000000, 8)
      val small = ranged(500000, 501000, 2)
        .filter(col("tag") === "t3").select("id")
      graft.sources.RangeSource.rowsRead.set(0)
      val j = big.join(small, "id")
      assert(j.count() == 100)
      val generated = graft.sources.RangeSource.rowsRead.get()
      assert(generated < 5000,
        s"runtime filter must prune generation to the key envelope, got $generated")
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruningexpression"),
        s"plan must carry the runtime filter:\n$plan")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("reported output ordering eliminates the per-partition sort on id") {
    // the scan declares id ASC within every partition, so a
    // sortWithinPartitions("id") requirement is already satisfied —
    // no SortExec in the plan; an ordering the scan does NOT provide
    // (val desc) must still plan one
    val sorted = ranged(0, 10000, 8).sortWithinPartitions("id")
    val plan = sorted.queryExecution.executedPlan.toString
    assert(!plan.contains("Sort "),
      s"id asc is the scan's declared ordering; plan re-sorts:\n$plan")
    assert(sorted.count() == 10000)
    val other = ranged(0, 10000, 8).sortWithinPartitions(col("val").desc)
    assert(other.queryExecution.executedPlan.toString.contains("Sort "),
      "an undeclared ordering must still plan a SortExec")
    // pruning id away must drop the report (an ordering over a pruned
    // column would be unresolvable) — the sort on val stays
    val pruned = ranged(0, 10000, 8).select("val")
      .sortWithinPartitions("val")
    assert(pruned.queryExecution.executedPlan.toString.contains("Sort "))
  }

  test("partition boundaries cover the range exactly once (uneven split)") {
    val ids = ranged(0, 103, 8).select("id")
      .collect().map(_.getLong(0)).sorted
    assert(ids.length == 103 && ids.head == 0 && ids.last == 102)
    assert(ids.distinct.length == 103)
  }
}
