package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** TPC-H-shaped analytical workloads (Q3/Q5/Q10 adapted to the driver
  * schema) — the multi-join benchmark weight class. Expressed with the
  * DataFrame API; Catalyst/AQE pick broadcast vs sort-merge per side
  * and reorder the star joins. Dates are emitted as epoch days
  * (integers) for cross-engine hash parity.
  */
object TpchQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Q1 pricing summary — the canonical scan-and-aggregate benchmark,
    * in its full 8-aggregate form (q_groupby carries the shape with
    * fewer aggregates): one lineitem pass, partial+final hash agg, no
    * join. All sums round at the boundary for cross-engine parity. */
  private val q1: Q = (s, d) =>
    Tables.lineitem(s, d)
      // ISO-formatted date strings order lexicographically as dates, so
      // the raw string comparison is pushable to the parquet scan where
      // to_date(col) <= ... would not be
      .filter(col("l_shipdate") <= "1998-09-02")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_extendedprice"), 4).as("avg_price"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Q6 forecasting revenue change — THE predicate-pushdown benchmark:
    * every filter (date range, discount band, quantity cap) must reach
    * the parquet scan; the remainder is one global aggregate. The plan
    * is asserted pushdown-clean in PlanHygieneSpec. */
  private val q6: Q = (s, d) =>
    Tables.lineitem(s, d)
      // all three predicates in pushable form (the date range as an ISO
      // string comparison) so the scan itself does the filtering
      .filter(
        col("l_shipdate").between("1997-01-01", "1997-12-31") &&
          col("l_discount").between(0.03, 0.07) &&
          col("l_quantity") < 25)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2)
        .as("revenue"))

  /** Q3 shipping priority: top unshipped-revenue orders for a segment. */
  private val q3: Q = (s, d) => {
    val cutoff = "1998-06-15"
    val cust = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(s, d).filter(to_date(col("o_orderdate")) < lit(cutoff))
    val li = Tables.lineitem(s, d).filter(to_date(col("l_shipdate")) > lit(cutoff))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"),
        datediff(to_date(col("o_orderdate")), lit("1970-01-01")).as("o_date_days"),
        col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(desc("revenue"), asc("l_orderkey"))
      .limit(20)
  }

  /** Q5 local supplier volume: revenue by nation within one region,
    * customer and supplier in the same nation. */
  private val q5: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    val ord = Tables.orders(s, d)
      .filter(to_date(col("o_orderdate")).between("1996-01-01", "1996-12-31"))
    val cust = Tables.customer(s, d)
    val supp = Tables.supplier(s, d)
    val nat = Tables.nation(s, d)
    val reg = Tables.region(s, d).filter(col("r_name") === "ASIA")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(nat, col("s_nationkey") === col("n_nationkey"))
      .join(reg, col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(desc("revenue"), asc("n_name"))
  }

  /** Q10 returned-item reporting: revenue lost to returns per customer. */
  private val q10: Q = (s, d) => {
    val li = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
    val ord = Tables.orders(s, d)
      .filter(to_date(col("o_orderdate")).between("1997-01-01", "1997-06-30"))
    val cust = Tables.customer(s, d)
    val nat = Tables.nation(s, d)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(nat, col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "n_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(desc("revenue"), asc("c_custkey"))
      .limit(20)
  }

  /** The correlated-subquery weight class (Q2/Q17/Q18/Q20/Q21) enters
    * through the SQL text front-end: correlated scalar/EXISTS subqueries
    * are a parser-level construct, and routing them through `spark.sql`
    * exercises the decorrelation rewrites (RewriteCorrelatedScalarSubquery,
    * RewritePredicateSubquery, PullupCorrelatedPredicates) that the
    * DataFrame-built plans never touch. TpchDecorrelationSpec asserts the
    * optimized plans carry no residual correlated subquery expression —
    * i.e. nothing executes a per-row subplan.
    *
    * The driver schema has no partsupp table and lineitem carries no
    * receipt/commit dates, so Q2/Q20/Q21 keep their exact correlation
    * structure over the columns that exist (supply relation := lineitem;
    * "late" := returned): the same adaptation q3/q5/q10 made above.
    */
  private def sqlQ(text: String): Q = (s, d) => {
    Tables.registerAll(s, d)
    s.sql(text)
  }

  /** Q2 minimum-cost supplier: correlated scalar MIN subquery whose inner
    * query repeats the outer's join chain (supplier→nation→region). The
    * decorrelated form is an aggregate-on-partkey joined back — Catalyst
    * must pull the correlated predicate up, not execute one subplan per
    * candidate row. */
  private val q2Sql =
    """SELECT s_acctbal, s_name, n_name, p_partkey, p_type,
              l_extendedprice AS supply_price
       FROM part, supplier, lineitem, nation, region
       WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
         AND p_size = 15
         AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
         AND r_name = 'EUROPE'
         AND l_extendedprice = (
           SELECT min(l2.l_extendedprice)
           FROM lineitem l2, supplier s2, nation n2, region r2
           WHERE l2.l_partkey = p_partkey AND s2.s_suppkey = l2.l_suppkey
             AND s2.s_nationkey = n2.n_nationkey
             AND n2.n_regionkey = r2.r_regionkey
             AND r2.r_name = 'EUROPE')
       ORDER BY s_acctbal DESC, n_name, s_name, p_partkey, supply_price
       LIMIT 100"""

  /** Q17 small-quantity revenue: nested aggregate in the predicate —
    * l_quantity compared against 0.2×avg(quantity) of the SAME part.
    * l_quantity is integer-valued in the testdata, so the per-part sums
    * are exact doubles and the threshold comparison is deterministic
    * across engines regardless of summation order. */
  private val q17Sql =
    """SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
       FROM lineitem, part
       WHERE p_partkey = l_partkey AND p_brand = 'Brand#13' AND p_type = 'PROMO'
         AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                           FROM lineitem l2 WHERE l2.l_partkey = p_partkey)"""

  /** Q18 large-volume customers: IN over a grouped HAVING subquery
    * (rewritten to a left-semi join on the aggregated orderkeys). */
  private def q18Sql(dateDays: String) =
    s"""SELECT c_name, c_custkey, o_orderkey,
              CAST($dateDays AS INTEGER) AS o_date_days,
              o_totalprice, sum(l_quantity) AS sum_qty
       FROM customer, orders, lineitem
       WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                            GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
         AND c_custkey = o_custkey AND o_orderkey = l_orderkey
       GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
       ORDER BY o_totalprice DESC, o_orderkey
       LIMIT 100"""

  /** Q20 concentrated suppliers (partsupp emulated by a grouped lineitem
    * derived table): TWO correlated scalar aggregates against the same
    * inner relation — suppliers who shipped more than half a (part,
    * supplier) pair's lifetime volume inside 1997, for red parts, where
    * the pair also shipped outside 1997. Exercises scalar-subquery
    * merging on top of decorrelation. Integer-valued quantities make
    * both threshold comparisons exact (0.5×exact-sum is exact). */
  private val q20Sql =
    """SELECT s_name, s_acctbal
       FROM supplier
       WHERE s_suppkey IN (
         SELECT ps.l_suppkey
         FROM (SELECT l_suppkey, l_partkey, sum(l_quantity) AS qty_97
               FROM lineitem
               WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
                 AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
                 AND l_partkey IN (SELECT p_partkey FROM part
                                   WHERE p_name LIKE 'red%')
               GROUP BY l_suppkey, l_partkey) ps
         WHERE ps.qty_97 > (
             SELECT 0.5 * sum(l2.l_quantity) FROM lineitem l2
             WHERE l2.l_partkey = ps.l_partkey AND l2.l_suppkey = ps.l_suppkey)
           AND ps.qty_97 < (
             SELECT sum(l3.l_quantity) FROM lineitem l3
             WHERE l3.l_partkey = ps.l_partkey AND l3.l_suppkey = ps.l_suppkey))
       ORDER BY s_name"""

  /** Q21 waiting suppliers: the double-correlated EXISTS / NOT EXISTS
    * pair over the same fact table ("another supplier in the order" /
    * "no other supplier also failed") — left-semi plus left-anti join
    * after RewritePredicateSubquery. l_returnflag='R' stands in for the
    * reference Q21's receipt>commit lateness (columns absent here). */
  private val q21Sql =
    """SELECT s_name, count(*) AS numwait
       FROM supplier, lineitem l1, orders, nation
       WHERE s_suppkey = l1.l_suppkey
         AND o_orderkey = l1.l_orderkey
         AND o_orderstatus = 'F'
         AND l1.l_returnflag = 'R'
         AND EXISTS (SELECT 1 FROM lineitem l2
                     WHERE l2.l_orderkey = l1.l_orderkey
                       AND l2.l_suppkey <> l1.l_suppkey)
         AND NOT EXISTS (SELECT 1 FROM lineitem l3
                         WHERE l3.l_orderkey = l1.l_orderkey
                           AND l3.l_suppkey <> l1.l_suppkey
                           AND l3.l_returnflag = 'R')
         AND s_nationkey = n_nationkey AND n_name = 'NATION_9'
       GROUP BY s_name
       ORDER BY numwait DESC, s_name
       LIMIT 100"""

  val queries: Map[String, Q] = Map(
    "q_tpch_q1" -> q1,
    "q_tpch_q6" -> q6,
    "q_tpch_q3" -> q3,
    "q_tpch_q5" -> q5,
    "q_tpch_q10" -> q10,
    "q_tpch_q2" -> sqlQ(q2Sql),
    "q_tpch_q17" -> sqlQ(q17Sql),
    "q_tpch_q18" -> sqlQ(q18Sql("datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01')")),
    "q_tpch_q20" -> sqlQ(q20Sql),
    "q_tpch_q21" -> sqlQ(q21Sql),
  )

  val oracles: Map[String, String] = Map(
    "q_tpch_q1" ->
      """SELECT l_returnflag, l_linestatus,
                round(sum(l_quantity), 2) AS sum_qty,
                round(sum(l_extendedprice), 2) AS sum_base_price,
                round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
                round(avg(l_quantity), 4) AS avg_qty,
                round(avg(l_extendedprice), 4) AS avg_price,
                round(avg(l_discount), 4) AS avg_disc,
                count(*) AS count_order
         FROM lineitem
         WHERE l_shipdate <= '1998-09-02'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q_tpch_q6" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
         FROM lineitem
         WHERE l_shipdate BETWEEN '1997-01-01' AND '1997-12-31'
           AND l_discount BETWEEN 0.03 AND 0.07
           AND l_quantity < 25""",
    "q_tpch_q3" ->
      """SELECT l_orderkey,
                CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS o_date_days,
                o_orderpriority,
                round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
         FROM lineitem
         JOIN orders   ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING'
           AND CAST(o_orderdate AS DATE) < DATE '1998-06-15'
           AND CAST(l_shipdate AS DATE) > DATE '1998-06-15'
         GROUP BY 1, 2, 3
         ORDER BY revenue DESC, l_orderkey ASC LIMIT 20""",
    "q_tpch_q5" ->
      """SELECT n_name,
                round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
         FROM lineitem
         JOIN orders   ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         JOIN nation   ON s_nationkey = n_nationkey
         JOIN region   ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA'
           AND CAST(o_orderdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'
         GROUP BY n_name
         ORDER BY revenue DESC, n_name ASC""",
    "q_tpch_q10" ->
      """SELECT c_custkey, c_name, n_name,
                round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
         FROM lineitem
         JOIN orders   ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation   ON c_nationkey = n_nationkey
         WHERE l_returnflag = 'R'
           AND CAST(o_orderdate AS DATE) BETWEEN DATE '1997-01-01' AND DATE '1997-06-30'
         GROUP BY 1, 2, 3
         ORDER BY revenue DESC, c_custkey ASC LIMIT 20""",
    // The correlated five run near-identical text on DuckDB; only q18's
    // epoch-days function differs (DuckDB date_diff vs Spark datediff).
    "q_tpch_q2" -> q2Sql,
    "q_tpch_q17" -> q17Sql,
    "q_tpch_q18" -> q18Sql("date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))"),
    "q_tpch_q20" -> q20Sql,
    "q_tpch_q21" -> q21Sql,
  )
}
