package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.plans.Checkpoints

/** Iterative graph analytics over relational edge lists — the second
  * iterative-computation pattern in the engine beside the dedup-cluster
  * fixpoint ([[ConnectedComponents]]).
  *
  * The graph is derived, not stored: the customer–supplier bipartite
  * graph is exactly "which customers bought from which suppliers",
  * materialized from orders ⋈ lineitem. No reference analogue (the
  * reference is a single-table pandas notebook); this is an
  * engine-extension operator (SURVEY §8.4).
  *
  * Scale shape (100 TB): the edge list is built once with an equi-join
  * and deduplicated (shuffle ∝ distinct edges, 8-byte keys); each
  * PageRank iteration is one join + one aggregation. The rank vector is
  * node-sized — orders of magnitude smaller than the edge list — so
  * Catalyst broadcast-joins it against the edges and the per-iteration
  * cost is a map-side-combined groupBy over contributions. Lineage is
  * cut every iteration through [[Checkpoints.cut]] (injectable: local
  * at local[32], reliable `checkpoint()` on a cluster), so plan depth
  * stays constant regardless of iteration count. Were the node set too
  * big to broadcast, the same loop holds with edges pre-hash-partitioned
  * by src and the join degrading to co-partitioned shuffle — the
  * iteration structure is unchanged.
  */
object GraphQueries {
  type Q = (SparkSession, String) => DataFrame

  private val Damping = 0.85
  private val Iterations = 3

  /** PageRank over the undirected customer–supplier purchase graph.
    *
    * Nodes: customers (node = custkey) and suppliers (node = −suppkey,
    * sign-disambiguated so both key spaces share one BIGINT column).
    * Edges: distinct (customer, supplier) purchase pairs, mirrored both
    * directions — undirected, so every node has out-degree ≥ 1 and the
    * classic dangling-mass redistribution is structurally unnecessary
    * (the oracle stays exact SQL, no per-iteration global correction).
    *
    * rank₀ = 1/N; rankᵢ₊₁(n) = (1−d)/N + d·Σ_{(m,n)∈E} rankᵢ(m)/deg(m).
    * Output is the conventional N-normalized rank (mean 1.0) rounded to
    * 6 decimals — sums here are a few hundred doubles per node, so both
    * engines agree far below the rounding grain. */
  private val pageRank: Q = (s, d) => {
    val pairs = Tables.orders(s, d)
      .join(Tables.lineitem(s, d),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("src"), (-col("l_suppkey")).as("dst"))
      .distinct()
    val edges = pairs
      .unionByName(pairs.select(col("dst").as("src"), col("src").as("dst")))
      .persist()
    // deg doubles as the node list: its count is the node count (one
    // O(1) scalar to the driver), its keys seed rank0 — no separate
    // countDistinct or distinct() shuffle.
    val deg = edges.groupBy("src").agg(count(lit(1)).as("outdeg")).persist()
    val n = deg.count()
    require(n > 0, "pagerank: empty edge list (no orders⋈lineitem rows)")
    val withDeg = edges.join(deg, "src")
    // 0.15 literal, not (1.0 - 0.85): the doubles differ in the last ulp
    // and the oracle writes the literal.
    val teleport = 0.15 / n

    var ranks = deg.select(col("src").as("node"))
      .withColumn("rank", lit(1.0 / n))
    for (_ <- 1 to Iterations) {
      ranks = Checkpoints.cut(
        withDeg
          .join(ranks, col("src") === col("node"))
          .groupBy(col("dst").as("node2"))
          .agg(sum(col("rank") / col("outdeg")).as("contrib"))
          .select(col("node2").as("node"),
            (lit(teleport) + lit(Damping) * col("contrib")).as("rank")))
    }
    val out = ranks
      .select(col("node"), round(col("rank") * n, 6).as("pr"))
      .orderBy("node")
    out
  }

  /** Degree profile of the same purchase graph: per-family (customer /
    * supplier) node count, degree min/max/mean, and the top hub by
    * degree. One edge-list aggregate + one 2-row reduce — the cheap
    * pre-flight a graph job runs to choose its partitioning (hub skew
    * shows up here before it shows up as a straggler task). */
  private val graphDegree: Q = (s, d) => {
    val pairs = Tables.orders(s, d)
      .join(Tables.lineitem(s, d),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("src"), (-col("l_suppkey")).as("dst"))
      .distinct()
    val edges = pairs
      .unionByName(pairs.select(col("dst").as("src"), col("src").as("dst")))
    edges.groupBy("src").agg(count(lit(1)).as("deg"))
      .groupBy(when(col("src") > 0, "customer").otherwise("supplier")
        .as("family"))
      .agg(
        count(lit(1)).as("n_nodes"),
        min("deg").as("min_deg"),
        max("deg").as("max_deg"),
        round(avg("deg"), 6).as("mean_deg"),
        // composite BIGINT ordering key: degree first, node id breaks
        // ties — DuckDB's max_by takes scalars only (see aggMaxBy)
        max_by(col("src"), col("deg") * lit(100000000L) + col("src"))
          .as("top_hub"))
      .orderBy("family")
  }

  val queries: Map[String, Q] = Map(
    "q_pagerank" -> pageRank,
    "q_graph_degree" -> graphDegree,
  )

  val oracles: Map[String, String] = Map(
    // The 3 iterations unroll into chained CTEs — plain SQL, exact.
    "q_pagerank" ->
      """WITH e0 AS (SELECT DISTINCT o_custkey AS src, -l_suppkey AS dst
                     FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
         edges AS (SELECT src, dst FROM e0
                   UNION ALL
                   SELECT dst AS src, src AS dst FROM e0),
         deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
         n AS (SELECT count(DISTINCT src) AS cnt FROM edges),
         r0 AS (SELECT DISTINCT src AS node,
                       CAST(1.0 AS DOUBLE) / (SELECT cnt FROM n) AS rank
                FROM edges),
         r1 AS (SELECT e.dst AS node,
                       CAST(0.15 AS DOUBLE) / (SELECT cnt FROM n)
                         + CAST(0.85 AS DOUBLE) * sum(r.rank / d.outdeg) AS rank
                FROM edges e
                JOIN r0 r ON r.node = e.src
                JOIN deg d ON d.src = e.src
                GROUP BY e.dst),
         r2 AS (SELECT e.dst AS node,
                       CAST(0.15 AS DOUBLE) / (SELECT cnt FROM n)
                         + CAST(0.85 AS DOUBLE) * sum(r.rank / d.outdeg) AS rank
                FROM edges e
                JOIN r1 r ON r.node = e.src
                JOIN deg d ON d.src = e.src
                GROUP BY e.dst),
         r3 AS (SELECT e.dst AS node,
                       CAST(0.15 AS DOUBLE) / (SELECT cnt FROM n)
                         + CAST(0.85 AS DOUBLE) * sum(r.rank / d.outdeg) AS rank
                FROM edges e
                JOIN r2 r ON r.node = e.src
                JOIN deg d ON d.src = e.src
                GROUP BY e.dst)
         SELECT node, round(rank * (SELECT cnt FROM n), 6) AS pr
         FROM r3 ORDER BY node""",
    "q_graph_degree" ->
      """WITH e0 AS (SELECT DISTINCT o_custkey AS src, -l_suppkey AS dst
                     FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
         edges AS (SELECT src, dst FROM e0
                   UNION ALL
                   SELECT dst AS src, src AS dst FROM e0),
         deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src)
         SELECT CASE WHEN src > 0 THEN 'customer' ELSE 'supplier' END
                  AS family,
                count(*) AS n_nodes,
                min(deg) AS min_deg,
                max(deg) AS max_deg,
                round(avg(CAST(deg AS DOUBLE)), 6) AS mean_deg,
                max_by(src, deg * 100000000 + src) AS top_hub
         FROM deg GROUP BY 1 ORDER BY family""",
  )
}
