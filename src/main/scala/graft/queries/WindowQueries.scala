package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Window-function surface (SURVEY.md §2.5) + the label-encode operator
  * (§2.9 E1) whose semantics are exactly a dense_rank over sorted
  * distinct values.
  *
  * Scale notes: every window here partitions by a real key
  * (segment/customer/user) so state is distributed; there is no
  * global ORDER BY window (a single-partition window is the classic
  * 100 TB deadlock — everything funnels through one task).
  */
object WindowQueries {
  type Q = (SparkSession, String) => DataFrame

  /** W1 ranking family over acctbal within market segment. */
  private val winRank: Q = (s, d) => {
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(desc("c_acctbal"), asc("c_custkey"))
    Tables.customer(s, d).select(
      col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
      row_number().over(w).as("rn"),
      rank().over(w).as("rnk"),
      dense_rank().over(w).as("drnk"),
      ntile(4).over(w).as("quartile"))
      .orderBy("c_mktsegment", "rn")
  }

  /** W2 lag/lead over each customer's order history. */
  private val winLag: Q = (s, d) => {
    val w = Window.partitionBy("o_custkey")
      .orderBy(asc("o_orderdate"), asc("o_orderkey"))
    Tables.orders(s, d).select(
      col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
      round(lag("o_totalprice", 1).over(w), 2).as("prev_price"),
      round(lead("o_totalprice", 1).over(w), 2).as("next_price"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** W3 frame aggregates: 3-row moving average + running sum per user.
    * (ts, event_id) ordering is unique → deterministic frames. */
  private val winFrame: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
    Tables.events(s, d).select(
      col("user_id"), col("event_id"), col("value"),
      round(avg("value").over(w.rowsBetween(-2, 0)), 4).as("mov_avg3"),
      round(sum("value").over(w.rowsBetween(Window.unboundedPreceding, 0)), 4)
        .as("running_sum"))
      .orderBy("user_id", "event_id")
  }

  /** E1 label encode (reference NB cell 75 LabelEncoder loop): integer
    * codes in lexicographic value order == dense_rank - 1. The MLlib
    * StringIndexer(alphabetAsc) form lives in the clean pipeline; this
    * query expresses the same semantics relationally so DuckDB can
    * oracle-check it.
    *
    * Scale shape: the unpartitioned ranking window runs over the
    * *distinct* values only (cardinality ~6, after a distributed
    * distinct), and the codes are broadcast-joined back — never a
    * global window over the fact table. */
  private val labelEncode: Q = (s, d) => {
    val cust = Tables.customer(s, d)
    val codes = cust.select("c_mktsegment").distinct()
      .withColumn("segment_code",
        (dense_rank().over(Window.orderBy("c_mktsegment")) - 1))
    cust.join(broadcast(codes), "c_mktsegment")
      .select("c_custkey", "c_mktsegment", "segment_code")
      .orderBy("c_custkey")
  }

  /** W3 value-range frame: RANGE BETWEEN over numeric order (peers by
    * value distance, not row offset). */
  private val winRange: Q = (s, d) => {
    val w = Window.partitionBy("c_mktsegment").orderBy(col("c_acctbal"))
      .rangeBetween(-500, 0)
    Tables.customer(s, d).select(
      col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
      count(lit(1)).over(w).as("n_within_500"),
      round(sum("c_acctbal").over(w), 2).as("sum_within_500"))
      .orderBy("c_mktsegment", "c_custkey")
  }

  /** A-family: argmax/argmin aggregates (max_by/min_by). Ordering key
    * is a composite scalar (price * 1e6 + orderkey — exact in double
    * at these magnitudes) because DuckDB's max_by takes scalars only;
    * the orderkey term makes ties deterministic in both engines. */
  private val aggMaxBy: Q = (s, d) => {
    val ord = col("o_totalprice") * 1000000d + col("o_orderkey")
    Tables.orders(s, d)
      .groupBy("o_orderpriority")
      .agg(
        max_by(col("o_orderkey"), ord).as("top_order"),
        min_by(col("o_orderkey"), ord).as("bottom_order"),
        round(max("o_totalprice"), 2).as("top_price"))
      .orderBy("o_orderpriority")
  }

  val queries: Map[String, Q] = Map(
    "q_win_range" -> winRange,
    "q_agg_maxby" -> aggMaxBy,
    "q_win_rank" -> winRank,
    "q_win_lag" -> winLag,
    "q_win_frame" -> winFrame,
    "q_label_encode" -> labelEncode,
  )

  val oracles: Map[String, String] = Map(
    "q_win_range" ->
      """SELECT c_mktsegment, c_custkey, c_acctbal,
                count(*) OVER w AS n_within_500,
                round(sum(c_acctbal) OVER w, 2) AS sum_within_500
         FROM customer
         WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal
                      RANGE BETWEEN 500 PRECEDING AND CURRENT ROW)
         ORDER BY c_mktsegment, c_custkey""",
    "q_agg_maxby" ->
      """SELECT o_orderpriority,
                max_by(o_orderkey, o_totalprice * 1000000 + o_orderkey) AS top_order,
                min_by(o_orderkey, o_totalprice * 1000000 + o_orderkey) AS bottom_order,
                round(max(o_totalprice), 2) AS top_price
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q_win_rank" ->
      """SELECT c_mktsegment, c_custkey, c_acctbal,
                CAST(row_number() OVER w AS INTEGER) AS rn,
                CAST(rank() OVER w AS INTEGER) AS rnk,
                CAST(dense_rank() OVER w AS INTEGER) AS drnk,
                CAST(ntile(4) OVER w AS INTEGER) AS quartile
         FROM customer
         WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC)
         ORDER BY c_mktsegment, rn""",
    "q_win_lag" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
                round(lag(o_totalprice, 1) OVER w, 2) AS prev_price,
                round(lead(o_totalprice, 1) OVER w, 2) AS next_price
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
         ORDER BY o_custkey, o_orderkey""",
    "q_win_frame" ->
      """SELECT user_id, event_id, value,
                round(avg(value) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS mov_avg3,
                round(sum(value) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_sum
         FROM events ORDER BY user_id, event_id""",
    "q_label_encode" ->
      """SELECT c_custkey, c_mktsegment,
                CAST(dense_rank() OVER (ORDER BY c_mktsegment) - 1 AS INTEGER) AS segment_code
         FROM customer ORDER BY c_custkey""",
  )
}
