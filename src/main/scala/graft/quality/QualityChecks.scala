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

  /** FREE-RIDING metrics via `Dataset.observe`: where [[run]] spends a
    * dedicated aggregate job on the gate, `observed` attaches the same
    * metric expressions to a dataframe the pipeline is about to
    * materialize ANYWAY — the metrics accumulate on the executors as
    * the real job's rows stream past, at zero extra scans, zero extra
    * shuffles. This is how a 100 TB ingest gets per-batch quality
    * telemetry without doubling its I/O: the write pays for the
    * metrics. Read results from the returned Observation AFTER an
    * action on the returned frame. Contract: CollectMetrics forbids
    * DISTINCT aggregates, so [[uniqueness]] checks stay on the [[run]]
    * gate; completeness/compliance ride along free. */
  def observed(df: DataFrame, checks: Seq[Check])
      : (DataFrame, org.apache.spark.sql.Observation) = {
    require(checks.nonEmpty, "quality: no checks declared")
    val obs = org.apache.spark.sql.Observation()
    (df.observe(obs, checks.head.metric.as(checks.head.name),
      checks.tail.map(c => c.metric.as(c.name)): _*), obs)
  }

  /** Verdicts from an Observation's metric row (blocks until the
    * observed job finishes): same (check, value, lo, hi, passed) shape
    * as [[run]]'s verdict table, evaluated driver-side on the one
    * metric row. */
  def verdicts(obs: org.apache.spark.sql.Observation,
      checks: Seq[Check]): Seq[(String, Double, Boolean)] = {
    val m = obs.get
    checks.map { c =>
      val v = m(c.name) match {
        case d: java.lang.Double => d.doubleValue()
        case l: java.lang.Long   => l.doubleValue()
        case x => x.toString.toDouble
      }
      (c.name, v, v >= c.lo && v <= c.hi)
    }
  }
}
