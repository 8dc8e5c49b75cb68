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

  val queries: Map[String, Q] = Map(
    "q_tpch_q1" -> q1,
    "q_tpch_q6" -> q6,
    "q_tpch_q3" -> q3,
    "q_tpch_q5" -> q5,
    "q_tpch_q10" -> q10,
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
  )
}
