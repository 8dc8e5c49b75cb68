package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint checking — the pre-ingest gate a
  * large-scale training-data pipeline runs before a corpus batch is
  * admitted (the public pattern popularized by AWS Deequ / Great
  * Expectations; reimplemented here from the published constraint
  * taxonomy, not their code).
  *
  * Design for 100 TB: every declared constraint compiles to ONE metric
  * expression, and the whole suite evaluates in a SINGLE aggregate pass
  * over the data — one job, one shuffle-free partial-aggregate tree, no
  * matter how many constraints are declared. (`Uniqueness` adds exact
  * `count(distinct)` which Catalyst plans as its own expand — still one
  * job.) The verdict table the caller receives is constraint-sized, not
  * data-sized: evaluation of thresholds happens on the one-row metric
  * result, never in a second scan.
  */
object QualityChecks {

  /** One declarative constraint: a named metric expression plus the
    * closed interval the metric must land in to pass. */
  final case class Check(name: String, metric: Column,
      lo: Double, hi: Double)

  /** Fraction of rows where `c` is non-null. */
  def completeness(c: Column): Column =
    avg(when(c.isNotNull, 1.0).otherwise(0.0))

  /** Exact distinct ratio: count(distinct c) / count(c). 1.0 = unique.
    * Null rows are excluded from both sides (SQL count semantics). */
  def uniqueness(c: Column): Column =
    count_distinct(c).cast("double") / count(c)

  /** Fraction of NON-NULL rows satisfying `pred` (compliance in the
    * Deequ taxonomy). Rows where pred is null count as failing. */
  def compliance(pred: Column): Column =
    avg(when(pred, 1.0).otherwise(0.0))

  /** Evaluate all checks in one aggregate pass; returns one row per
    * check: (check, value, lo, hi, passed). */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "quality: no checks declared")
    val dupes = checks.groupBy(_.name).filter(_._2.size > 1).keys
    require(dupes.isEmpty,
      s"quality: duplicate check names would overwrite silently: " +
        dupes.mkString(", "))
    val metricCols = checks.map(c => c.metric.as(c.name))
    val row = df.agg(metricCols.head, metricCols.tail: _*)
    // unpivot the 1-row metric result into the verdict table; stack()
    // keeps it a single projection over the aggregate.
    val stacked = checks.map { c =>
      struct(lit(c.name).as("check"), col(c.name).cast("double").as("value"),
        lit(c.lo).as("lo"), lit(c.hi).as("hi"))
    }
    row.select(explode(array(stacked: _*)).as("r"))
      .select(col("r.check").as("check"),
        round(col("r.value"), 6).as("value"),
        col("r.lo").as("lo"), col("r.hi").as("hi"))
      .withColumn("passed",
        (col("value") >= col("lo") && col("value") <= col("hi")).cast("int"))
      .orderBy("check")
  }
}
