package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan

/** Physical-plan hygiene auditor — the library form of the checks this
  * repo's own CI runs over every query (PlanHygieneSpec): walk a
  * query's executed plan and report the shapes that stop scaling
  * BEFORE the job launches against 100 TB. Intended as a pre-flight
  * gate: `PlanAudit.findings(df)` in a test or submission hook, fail
  * on non-empty (minus explicitly allowed patterns).
  *
  * Checks are string/structure heuristics over the physical plan —
  * deliberately conservative: a finding means "look at this", and the
  * allow-list carries the reviewed exceptions (tiny-side cross
  * products, 1-row broadcast probes).
  */
object PlanAudit {

  final case class Finding(kind: String, detail: String)

  /** Audit an executed plan (forces planning, not execution).
    * Detection runs over the STRINGIFIED plan, not a tree walk: under
    * AQE the top node is an AdaptiveSparkPlanExec whose real subtree is
    * not reachable through `children` before execution, while its
    * toString renders the full initial plan. */
  def findings(df: DataFrame,
      allow: Set[String] = Set.empty): Seq[Finding] = {
    val plan: SparkPlan = df.queryExecution.executedPlan
    val out = Seq.newBuilder[Finding]
    val planStr = plan.toString
    if (planStr.contains("CartesianProduct") && !allow("cartesian"))
      out += Finding("cartesian",
        "CartesianProduct: unpartitioned all-pairs join — rewrite as an " +
          "equi-join (bucket/band/block the key) or broadcast a tiny side")
    if (planStr.contains("BroadcastNestedLoopJoin") && !allow("bnl"))
      out += Finding("bnl",
        "BroadcastNestedLoopJoin: non-equi join against a broadcast side — " +
          "fine only when the build side is provably tiny (dims, 1-row probes)")

    // unpruned wide scans: a FileSourceScan reading far more columns
    // than the query returns usually means a missing projection
    if (!allow("widescan")) {
      val readSchemas = "ReadSchema: struct<([^>]*)>".r
        .findAllMatchIn(planStr).map(_.group(1)).toSeq
      readSchemas.foreach { rs =>
        val nRead = rs.count(_ == ':')
        val nOut = df.schema.length
        if (nRead > math.max(nOut * 4, nOut + 8))
          out += Finding("widescan",
            s"scan reads $nRead columns for a $nOut-column result — check " +
              "column pruning (ReadSchema) and drop unused fields early")
      }
    }
    out.result()
  }

  /** Throw unless the plan is clean (the CI-gate form). */
  def require(df: DataFrame, allow: Set[String] = Set.empty): Unit = {
    val fs = findings(df, allow)
    if (fs.nonEmpty) throw new IllegalStateException(
      "plan audit failed:\n" + fs.map(f => s"  [${f.kind}] ${f.detail}").mkString("\n"))
  }
}
