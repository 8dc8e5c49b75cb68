package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, AttributeReference, AttributeSet, BindReferences, Cast, Descending, Expression, GenericInternalRow, GreaterThan, GreaterThanOrEqual, JoinedRow, LessThan, LessThanOrEqual, Literal, NullsFirst, NullsLast, RowNumber, SortOrder, UnsafeProjection, UnsafeRow, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, UnaryNode, Window => LogicalWindow}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Whole-operator Catalyst extension: native per-key top-k — the
  * `LogicalPlan + SparkStrategy + SparkPlan` rung of the extension
  * ladder (SURVEY §4.3(c)), below the custom-Expression rung the
  * Fingerprint64/Geohash family demonstrates.
  *
  * Why a physical operator instead of the window form: `row_number()
  * OVER (PARTITION BY key ORDER BY ord DESC) <= k` must SHUFFLE AND
  * SORT EVERY INPUT ROW before it can discard any. This operator runs
  * a bounded heap per key inside each input partition first (the
  * partial phase — the top-k-specific analogue of a map-side combine),
  * so the exchange moves at most `partitions × |keys| × k` survivor
  * rows no matter how large the fact table is; the final phase merges
  * co-located survivors and emits ranks. At 100 TB with a
  * low-cardinality key that is the difference between shuffling the
  * table and shuffling kilobytes.
  *
  * Honest trade, documented: per-partition state is `|keys| × k` rows.
  * For HIGH-cardinality keys (key count ~ row count) the partial phase
  * discards little and the window form's single sort wins — this
  * operator is the right plan exactly when keys are few and data is
  * big. The API is therefore explicit (`TopKPerKey.topK`), not an
  * automatic rewrite of window queries.
  *
  * Determinism: ordering is (ord DESC, tie ASC); callers pass a unique
  * `tie` column so both phases and any re-execution cut identical row
  * sets — the same protocol every oracle-checked ranking query in the
  * engine follows.
  *
  * The physical pair mirrors partial/final hash aggregation: the final
  * operator declares `ClusteredDistribution(keys)` and Spark's
  * EnsureRequirements inserts the (tiny) exchange.
  */
object TopKPerKey {

  /** Logical node. `rankAttr` is a constructor parameter — minting it
    * in the body would give every `copy()` during analysis/optimizer
    * transforms a fresh exprId and orphan downstream references. */
  case class TopKPerKeyPlan(keys: Seq[Expression], ord: Expression,
      tie: Expression, k: Int, rankAttr: AttributeReference,
      child: LogicalPlan) extends UnaryNode {
    override def output: Seq[Attribute] = child.output :+ rankAttr
    override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
    override protected def withNewChildInternal(
        newChild: LogicalPlan): TopKPerKeyPlan = copy(child = newChild)
  }

  /** Physical operator; `partial = true` is the pre-exchange bounded
    * heap (emits child columns only), `partial = false` the post-
    * exchange merge that appends the rank. */
  case class TopKPerKeyExec(keys: Seq[Expression], ord: Expression,
      tie: Expression, k: Int, rankAttr: AttributeReference,
      partial: Boolean, child: SparkPlan) extends UnaryExecNode {

    override def output: Seq[Attribute] =
      if (partial) child.output else child.output :+ rankAttr

    override def requiredChildDistribution: Seq[Distribution] =
      if (partial) UnspecifiedDistribution :: Nil
      else ClusteredDistribution(keys) :: Nil

    // rankAttr rides in `expressions` (it is a constructor argument),
    // so without this both phases render with the `!`-missing-input
    // marker and plan audits would flag a healthy plan
    override def producedAttributes: AttributeSet = AttributeSet(rankAttr)

    // partial emits a subset of child rows unchanged; final's rank is
    // appended per key group — neither phase needs a child ordering
    override protected def doExecute(): RDD[InternalRow] = {
      val keyExprs = keys.map(BindReferences.bindReference(_, child.output))
      val boundOrd = BindReferences.bindReference(ord, child.output)
      val boundTie = BindReferences.bindReference(tie, child.output)
      // null-aware, matching the window form this operator replaces:
      // ord DESC NULLS LAST (null = weakest), tie ASC NULLS FIRST
      def nullAware(base: Ordering[Any], nullIsSmallest: Boolean): Ordering[Any] =
        new Ordering[Any] {
          override def compare(a: Any, b: Any): Int =
            if (a == null && b == null) 0
            else if (a == null) { if (nullIsSmallest) -1 else 1 }
            else if (b == null) { if (nullIsSmallest) 1 else -1 }
            else base.compare(a, b)
        }
      val ordOrdering = nullAware(TypeUtils
        .getInterpretedOrdering(boundOrd.dataType)
        .asInstanceOf[Ordering[Any]], nullIsSmallest = true)
      val tieOrdering = nullAware(TypeUtils
        .getInterpretedOrdering(boundTie.dataType)
        .asInstanceOf[Ordering[Any]], nullIsSmallest = true)
      val isPartial = partial
      val kk = k
      val childOutput = child.output
      val rank = rankAttr
      child.execute().mapPartitions({ iter =>
        val keyProj = UnsafeProjection.create(keyExprs)
        // strength ordering over (ord, tie, row): compare < 0 means
        // WEAKER — smaller ord, or equal ord with a larger tie (ranks
        // run ord DESC, tie ASC)
        val strength = new Ordering[(Any, Any, InternalRow)] {
          override def compare(a: (Any, Any, InternalRow),
              b: (Any, Any, InternalRow)): Int = {
            val c = ordOrdering.compare(a._1, b._1)
            if (c != 0) c else tieOrdering.compare(b._2, a._2)
          }
        }
        val heaps = scala.collection.mutable.HashMap
          .empty[UnsafeRow, scala.collection.mutable.PriorityQueue[(Any, Any, InternalRow)]]
        iter.foreach { row =>
          val key = keyProj(row)
          // get-then-update: key.copy() only on first sight of a key,
          // not per input row (the partial phase exists for exactly
          // the low-|keys|, high-row case where per-row copies would
          // be the dominant allocation)
          val heap = heaps.get(key) match {
            case Some(h) => h
            case None =>
              // PriorityQueue dequeues the MAX of its ordering;
              // reversed strength puts the WEAKEST survivor at the
              // head, giving the O(1) keep-or-drop probe a bounded
              // heap needs
              val h = scala.collection.mutable.PriorityQueue
                .empty[(Any, Any, InternalRow)](strength.reverse)
              heaps.put(key.copy(), h)
              h
          }
          // copyValue: eval on a reused row buffer returns VIEWS for
          // buffer-backed types (UTF8String, arrays, structs) — the
          // heap must own its ord/tie values or they mutate as the
          // iterator advances
          val o = InternalRow.copyValue(boundOrd.eval(row))
          val t = InternalRow.copyValue(boundTie.eval(row))
          if (heap.size < kk) {
            heap.enqueue((o, t, row.copy()))
          } else if (strength.compare((o, t, null), heap.head) > 0) {
            heap.dequeue()
            heap.enqueue((o, t, row.copy()))
          }
        }
        if (isPartial) {
          heaps.valuesIterator.flatMap(_.iterator.map(_._3))
        } else {
          val joined = new JoinedRow
          val project = UnsafeProjection.create(
            childOutput :+ rank, childOutput :+ rank)
          heaps.valuesIterator.flatMap { heap =>
            // dequeueAll yields weakest-first (priority order of the
            // reversed queue); reverse for strongest-first rank 1..k
            val ordered: Seq[(Any, Any, InternalRow)] = heap.dequeueAll
            ordered.reverseIterator.zipWithIndex.map {
              case ((_, _, row), i) =>
                val rankRow = new GenericInternalRow(Array[Any](i + 1))
                project(joined(row, rankRow))
            }
          }
        }
      }, preservesPartitioning = true)
    }

    override protected def withNewChildInternal(
        newChild: SparkPlan): TopKPerKeyExec = copy(child = newChild)
  }

  /** Planner strategy: one logical node → partial + final physical
    * pair; EnsureRequirements supplies the key-clustered exchange
    * between them. */
  object Strategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case TopKPerKeyPlan(keys, ord, tie, k, rankAttr, child) =>
        TopKPerKeyExec(keys, ord, tie, k, rankAttr, partial = false,
          TopKPerKeyExec(keys, ord, tie, k, rankAttr, partial = true,
            planLater(child))) :: Nil
      case _ => Nil
    }
  }

  /** Opt-in optimizer rewrite (`spark.graft.rewrite.topk=true`,
    * injected by [[graft.GraftExtensions]]): recognizes the canonical
    * per-key rank-filter shape
    * {{{ Filter(rn <= k, [Project,] Window(row_number() OVER
    *     (PARTITION BY keys ORDER BY ord DESC, tie ASC) AS rn)) }}}
    * and replaces it with the native [[TopKPerKeyPlan]] — the
    * `injectOptimizerRule` rung between the expression registrations
    * and the planner strategy. The rewrite is conservative by
    * construction; it fires ONLY when the semantics are exactly the
    * operator's contract:
    *  - a single `row_number` window expression (no sibling windows),
    *  - non-empty attribute partition keys,
    *  - order = (attr DESC NULLS LAST, attr ASC NULLS FIRST) — the
    *    window defaults, which are the operator's tie protocol,
    *  - a literal integer rank bound `rn <= k` / `rn < k`,
    *  - an optional attributes-only Project between Filter and Window.
    * The minted rank attribute reuses the window alias's exprId and
    * name, so downstream references resolve unchanged. Default OFF —
    * high-cardinality keys favor the window form (see the class doc);
    * the config is the same opt-in contract as the cartesian guard. */
  object RewriteRule extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan =
      if (!conf.getConfString("spark.graft.rewrite.topk", "false").toBoolean) plan
      else plan.transformUp {
        case f @ Filter(cond, w: LogicalWindow) =>
          asTopK(cond, w).getOrElse(f)
        case f @ Filter(cond, Project(projectList, w: LogicalWindow))
            if projectList.forall(_.isInstanceOf[Attribute]) =>
          asTopK(cond, w)
            .map(t => Project(projectList, t))
            .getOrElse(f)
      }

    private def asTopK(cond: Expression, w: LogicalWindow): Option[LogicalPlan] =
      w.windowExpressions match {
        case Seq(a @ Alias(WindowExpression(_: RowNumber,
            WindowSpecDefinition(parts, Seq(
              SortOrder(ord: Attribute, Descending, NullsLast, _),
              SortOrder(tie: Attribute, Ascending, NullsFirst, _)), _)), _))
            if parts.nonEmpty && parts.forall(_.isInstanceOf[Attribute]) =>
          val rn = a.toAttribute
          // normalize the rank-bound shape: accept int AND long
          // literals (a long bound past Int.MaxValue can't be a
          // top-k), the reversed comparison (lit >= rn), and the
          // widening cast the analyzer inserts around the rank
          // attribute when the literal is a long
          def isRank(e: Expression): Boolean = e match {
            case r: Attribute => r.semanticEquals(rn)
            case Cast(r: Attribute, LongType, _, _) => r.semanticEquals(rn)
            case _ => false
          }
          def bound(l: Literal): Option[Int] = l match {
            case Literal(v: Int, IntegerType) => Some(v)
            // lower guard too: a long below 1 must fall through to
            // the un-rewritten window path (like int bounds ≤ 0 via
            // k.filter below) — v.toInt on a large-negative long
            // wraps positive and the `.map(_ - 1)` on Int.MinValue
            // underflows, either of which would silently rewrite an
            // always-false rank predicate into a row-returning top-k
            case Literal(v: Long, LongType)
                if v >= 1L && v <= Int.MaxValue =>
              Some(v.toInt)
            case _ => None
          }
          val k = cond match {
            case LessThanOrEqual(r, l: Literal) if isRank(r) => bound(l)
            case LessThan(r, l: Literal) if isRank(r) => bound(l).map(_ - 1)
            case GreaterThanOrEqual(l: Literal, r) if isRank(r) => bound(l)
            case GreaterThan(l: Literal, r) if isRank(r) =>
              bound(l).map(_ - 1)
            case _ => None
          }
          k.filter(_ > 0).map { kk =>
            TopKPerKeyPlan(parts, ord, tie, kk,
              AttributeReference(a.name, IntegerType, nullable = false)(
                exprId = a.exprId),
              w.child)
          }
        case _ => None
      }
  }

  /** Public entry point: top `k` rows per `keyCols` by (`ordCol` DESC
    * NULLS LAST, `tieCol` ASC NULLS FIRST — the window form's default
    * null placement), with a 1-based `rank` column appended. `tieCol`
    * must be unique within a key for deterministic output. */
  def topK(df: DataFrame, keyCols: Seq[String], ordCol: String,
      tieCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val spark: SparkSession = df.sparkSession
    graftshim.addStrategy(spark, Strategy)
    val plan = graftshim.analyzedPlan(df)
    def attr(name: String): Attribute = plan.output
      .find(_.name.equalsIgnoreCase(name))
      .getOrElse(throw new IllegalArgumentException(
        s"column $name not found in ${plan.output.map(_.name).mkString(", ")}"))
    val rankAttr = AttributeReference("rank", IntegerType, nullable = false)()
    graftshim.ofRows(spark, TopKPerKeyPlan(
      keyCols.map(attr), attr(ordCol), attr(tieCol), k, rankAttr, plan))
  }
}
