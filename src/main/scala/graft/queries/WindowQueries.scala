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

  val queries: Map[String, Q] = Map(
    "q_win_rank" -> winRank,
    "q_win_lag" -> winLag,
    "q_win_frame" -> winFrame,
    "q_label_encode" -> labelEncode,
  )

  val oracles: Map[String, String] = Map(
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
