package graft

import org.apache.spark.sql.functions._
import graft.queries.TemporalQueries

/** Temporal operators: grid completeness + fill semantics for the
  * resampler, version bookkeeping for the SCD2 merge. Exact values are
  * oracle-checked by the driver; these pin the structural invariants. */
class TemporalQueriesSpec extends SparkSpec {

  test("resample grid is complete: types × hours, no holes, fills flagged") {
    val out = TemporalQueries.queries("q_resample_fill")(spark, sf).cache()
    val types = out.select("event_type").distinct().count()
    val hours = out.select("h").distinct().count()
    assert(out.count() == types * hours, "grid must be the full cross product")
    // every gap row carries the last observed value (or null before
    // the first observation) — a filled row never introduces a value
    // absent from the raw hourly aggregate
    val filled = out.filter(col("filled") === 1).count()
    assert(filled > 0, "the fixture data has gaps; none were flagged")
    val nullFilled = out.filter(col("filled") === 1 && col("v_ff").isNull)
    nullFilled.collect() // leading-gap rows are legitimately null
    out.unpersist()
  }

  test("forward-fill carries the previous value, not a future one") {
    val out = TemporalQueries.queries("q_resample_fill")(spark, sf)
      .filter(col("event_type") === "click")
      .orderBy("h")
      .select("v_ff", "filled")
      .collect()
    var last: Option[Double] = None
    out.foreach { r =>
      val v = if (r.isNullAt(0)) None else Some(r.getDouble(0))
      if (r.getInt(1) == 1) {
        assert(v == last, s"filled row must repeat the previous value")
      }
      last = v
    }
  }

  test("scd2 merge versions updated keys and passes untouched keys through") {
    val out = TemporalQueries.queries("q_scd2_merge")(spark, sf).cache()
    val perKey = out.groupBy("c_custkey")
      .agg(count(lit(1)).as("n"),
        sum("is_current").as("n_current"),
        sum(when(col("valid_to").isNull, 1).otherwise(0)).as("n_open"))
    // exactly one current + one open-ended version per key, 1 or 2 rows
    assert(perKey.filter(col("n_current") =!= 1 || col("n_open") =!= 1)
      .count() == 0)
    assert(perKey.filter(col("n") < 1 || col("n") > 2).count() == 0)
    // a two-row key's old version closes exactly at the new version's start
    val bad = out.filter(col("is_current") === 0).as("o")
      .join(out.filter(col("is_current") === 1).as("c"), "c_custkey")
      .filter(col("o.valid_to") =!= col("c.valid_from"))
    assert(bad.count() == 0, "old version must close at the new valid_from")
    out.unpersist()
  }
}
