package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.Cross
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

import graft.functions.{DotF, Fingerprint64, Geohash, JaroWinkler, WinnowStats, ZOrder}

/** Deployment-grade Catalyst extension point: `spark.sql.extensions=
  * graft.GraftExtensions` (or `builder.withExtensions`) wires the
  * engine's custom expressions and lint rules into EVERY session built
  * from that config — the path a cluster user takes when they cannot
  * run Scala registration code (JDBC gateways, Thrift server, notebook
  * kernels with a preconfigured session).
  *
  * Two injections:
  *
  *  1. the six SQL-registered codegen expressions (`dot_f`,
  *     `jaro_winkler`, `fingerprint64`, `z_value`, `geohash`,
  *     `winnow_stats`) with the same arity validation as the per-session
  *     [[org.apache.spark.sql.graftshim.registerExpression]] path —
  *     session-independent, catalog-visible (DESCRIBE FUNCTION works),
  *     no imperative setup;
  *
  *  2. [[GraftExtensions.CartesianGuard]], an opt-in optimizer lint
  *     (`spark.graft.guard.cartesian=true`) that fails FAST — at
  *     optimization time, before a single task runs — on any
  *     condition-less cross join whose both sides exceed the
  *     auto-broadcast threshold. The same invariant
  *     `scale.PlanAudit` asserts in tests, promoted to an always-on
  *     guard for ad-hoc sessions: at 100 TB a planned-then-killed
  *     cartesian costs a cluster-hour, a rejected one costs nothing.
  *     Default OFF so deliberate tiny-side cross joins (q_join_cross,
  *     the broadcast-stats shapes) run untouched.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functionDescriptions.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => GraftExtensions.CartesianGuard)
    // opt-in per-key rank-filter rewrite to the native top-k operator
    // (spark.graft.rewrite.topk=true); the strategy registration is
    // unconditional and inert unless a TopKPerKeyPlan reaches planning
    ext.injectOptimizerRule(_ => graft.plans.TopKPerKey.RewriteRule)
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKey.Strategy)
  }
}

object GraftExtensions {

  /** One (identifier, info, arity-checked builder) triple per custom
    * expression — the injectFunction payload. Builders mirror the
    * graftshim temp-function registrations exactly, so SQL written
    * against either registration path resolves identically. */
  private[graft] val functionDescriptions: Seq[
      (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = {

    def d(name: String, usage: String, arities: Set[Int],
        builder: Seq[Expression] => Expression) =
      (FunctionIdentifier(name),
        // 2-arg ctor: the richer ctors validate group/source enums;
        // usage is carried in the scaladoc table instead
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        (exprs: Seq[Expression]) => {
          if (!arities(exprs.length)) throw new IllegalArgumentException(
            s"Invalid number of arguments for function $name: " +
              s"expected ${arities.toSeq.sorted.mkString(" or ")}, " +
              s"got ${exprs.length}")
          builder(exprs)
        })

    def intLit(e: Expression, fn: String, what: String): Int = e match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"$fn: $what must be an integer literal, got $other")
    }

    Seq(
      d("dot_f", "dot_f(a, b) - float-array dot product", Set(2),
        e => DotF(e(0), e(1))),
      d("jaro_winkler", "jaro_winkler(l, r) - string similarity in [0,1]",
        Set(2), e => JaroWinkler(e(0), e(1))),
      d("fingerprint64", "fingerprint64(s) - 64-bit document fingerprint",
        Set(1), e => Fingerprint64(e.head)),
      d("z_value", "z_value(x, y) - Morton-interleaved Z-order key", Set(2),
        e => ZOrder(e(0), e(1))),
      d("geohash", "geohash(lat, lon, precision) - base-32 geohash cell",
        Set(3), e => Geohash(e(0), e(1), e(2))),
      d("winnow_stats", "winnow_stats(text[, gram, window]) - winnowing " +
        "fingerprint stats", Set(1, 3), {
          case Seq(text) => WinnowStats(text, 8, 4)
          case Seq(text, g, w) => WinnowStats(text,
            intLit(g, "winnow_stats", "gram"),
            intLit(w, "winnow_stats", "window"))
          case _ => throw new IllegalStateException("unreachable: arity-checked")
        }),
    )
  }

  /** Opt-in optimizer lint: reject condition-less cross joins whose
    * BOTH sides exceed the auto-broadcast threshold (logical stats),
    * i.e. exactly the joins that plan as an unpartitioned
    * CartesianProduct. Validation-only — the rule never rewrites, so
    * running to fixed point is a no-op after the first pass. */
  object CartesianGuard extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = {
      if (conf.getConfString("spark.graft.guard.cartesian", "false").toBoolean) {
        // Sessions that disable auto-broadcast (threshold = -1) are exactly
        // the ones where every large cross join plans as a CartesianProduct,
        // so an armed guard must not go inert there: fall back to a fixed
        // 10 MB "small side" cutoff instead of skipping the check.
        val configured = conf.autoBroadcastJoinThreshold
        val threshold =
          if (configured >= 0) configured else 10L * 1024 * 1024
        plan.foreach {
          case j @ Join(left, right, Cross, None, _)
              if left.stats.sizeInBytes > threshold &&
                right.stats.sizeInBytes > threshold =>
            throw new IllegalStateException(
              "graft cartesian guard: condition-less CROSS JOIN with both " +
                s"sides above the broadcast threshold ($threshold B): " +
                s"left=${left.stats.sizeInBytes} B, " +
                s"right=${right.stats.sizeInBytes} B. A join this shape " +
                "plans as an unpartitioned CartesianProduct. Add a join " +
                "condition, broadcast() a reduced side, or disable " +
                "spark.graft.guard.cartesian for this session.")
          case _ =>
        }
      }
      plan
    }
  }
}
