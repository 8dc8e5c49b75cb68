package graft

import org.apache.spark.sql.functions._
import graft.quality.QualityChecks
import graft.quality.QualityChecks._

/** Declarative constraint checking: exact metric values on a fixture
  * with known defects, verdict thresholds, and the single-pass plan
  * guarantee (one scan no matter how many constraints). */
class QualityChecksSpec extends SparkSpec {

  private def fixture = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, Option("aa"), Option("en")),
      (2L, Option("bb"), Option("en")),
      (2L, None, Option("xx")),
      (4L, Option("dd"), None))
      .toDF("id", "text", "lang")
  }

  test("metrics are exact on a fixture with known defects") {
    val out = QualityChecks.run(fixture, Seq(
      Check("rows_min", count(lit(1)).cast("double"), 1.0, 1e18),
      Check("id_unique", uniqueness(col("id")), 1.0, 1.0),
      Check("text_complete", completeness(col("text")), 0.9, 1.0),
      Check("lang_en", compliance(col("lang") === "en"), 0.9, 1.0)))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getInt(4)))
      .toMap
    assert(out("rows_min") == ((4.0, 1)))
    assert(out("id_unique") == ((0.75, 0)), "duplicate id must fail")
    assert(out("text_complete") == ((0.75, 0)), "null text must fail")
    // 2 of 4 rows are lang=en (null lang counts as non-compliant)
    assert(out("lang_en") == ((0.5, 0)))
  }

  test("whole suite evaluates in a single pass over the source") {
    val plan = graft.queries.TextQueries.queries("q_quality_checks")(
      spark, sf).queryExecution.executedPlan.toString
    val scans = "FileScan parquet".r.findAllMatchIn(plan).size
    assert(scans == 1, s"expected 1 scan for the whole suite, got $scans:\n$plan")
  }

  test("observe() metrics ride a real job and match the dedicated gate") {
    val checks = Seq(
      Check("rows_min", count(lit(1)).cast("double"), 1.0, 1e18),
      Check("text_complete", completeness(col("text")), 0.9, 1.0),
      Check("lang_en", compliance(col("lang") === "en"), 0.9, 1.0))
    val (df, obs) = QualityChecks.observed(fixture, checks)
    // the "real job": a materialization the pipeline runs anyway
    assert(df.count() == 4)
    val got = QualityChecks.verdicts(obs, checks)
      .map { case (n, v, p) => n -> ((v, p)) }.toMap
    assert(got("rows_min") == ((4.0, true)))
    assert(got("text_complete") == ((0.75, false)))
    assert(got("lang_en") == ((0.5, false)))
    // and the free-riding values equal the dedicated single-pass gate's
    val gate = QualityChecks.run(fixture, checks)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    got.foreach { case (n, (v, _)) => assert(v == gate(n)) }
  }

  test("empty check list is rejected loudly") {
    intercept[IllegalArgumentException](QualityChecks.run(fixture, Seq.empty))
  }

  test("duplicate check names are rejected loudly") {
    val e = intercept[IllegalArgumentException](QualityChecks.run(fixture, Seq(
      Check("dup", completeness(col("text")), 0, 1),
      Check("dup", uniqueness(col("id")), 0, 1))))
    assert(e.getMessage.contains("dup"))
  }
}
