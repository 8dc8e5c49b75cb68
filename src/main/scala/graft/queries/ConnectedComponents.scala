package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Connected components over an edge list, in the large-star/small-star
  * formulation of Kiveris et al., "Connected Components in MapReduce and
  * Beyond" (SoCC 2014). Converges in O(log² n) rounds (O(log n) in
  * practice) regardless of component DIAMETER — unlike one-hop min-label
  * propagation, which needs diameter-many rounds and dies on chain-shaped
  * duplicate families (serial near-identical revisions).
  *
  * Reference anchor: backend-model's dedup step keeps one row per dup
  * group (pipeline.py drop_duplicates); at corpus scale that requires
  * CC over the near-dup pair graph, and this is the formulation that
  * survives adversarial graph shapes.
  *
  * Scale design (every round is pure DataFrame shuffle work):
  *  - neighborhood minima via groupBy().min() + an equi-join back on the
  *    SAME key — partial aggregation (map-side combine) handles hub
  *    nodes, where a Window.partitionBy(node) would sort one fat
  *    partition per hub;
  *  - large-star points every bigger neighbor of u at u's smallest
  *    neighbor, so hub degrees collapse geometrically instead of being
  *    re-shipped each round;
  *  - each round ends in a lineage cut ([[graft.plans.Checkpoints]]:
  *    localCheckpoint by default, reliable checkpoint() when the session
  *    opts in — same pattern as the min-label loop it backs up);
  *  - the driver sees only an O(1) convergence signature per round
  *    (count + two hash sums), never node data.
  */
object ConnectedComponents {

  /** (src, dst) -> per-src minimum over dst, computed with a partial-agg
    * groupBy and joined back; `least` folds src itself into the min. */
  private def withNbrMin(sym: DataFrame, includeSelf: Boolean): DataFrame = {
    val mins = sym.groupBy("src").agg(min("dst").as("nbr_min"))
    val joined = sym.join(mins, "src")
    if (includeSelf) joined.withColumn("m", least(col("nbr_min"), col("src")))
    else joined.withColumn("m", col("nbr_min"))
  }

  /** Large-star: for every node u, connect all neighbors v > u to
    * m = min(Γ(u) ∪ {u}). Strictly decreases big-neighbor pointers. */
  private[queries] def largeStar(edges: DataFrame): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
    withNbrMin(sym, includeSelf = true)
      .filter(col("dst") > col("src"))
      .select(col("dst").as("src"), col("m").as("dst"))
      .distinct()
  }

  /** Small-star: orient every edge big→small, then connect each node's
    * smaller neighbors (and the node itself) to the smallest of them. */
  private[queries] def smallStar(edges: DataFrame): DataFrame = {
    val canon = edges
      .select(greatest(col("src"), col("dst")).as("src"),
        least(col("src"), col("dst")).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
    val withM = withNbrMin(canon, includeSelf = false)
    withM.select(col("dst").as("src"), col("m").as("dst"))
      .union(withM.select(col("src"), col("m").as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()
  }

  /** Labels every node of `edges` (long columns `src`, `dst`) with the
    * minimum node id of its connected component. Returns (node, label);
    * nodes appearing in no edge are absent (callers re-join singletons). */
  def labels(spark: SparkSession, edges: DataFrame, maxRounds: Int = 60): DataFrame =
    labelsWithRounds(spark, edges, maxRounds)._1

  /** [[labels]] plus the number of LS/SS rounds actually run — returned
    * in the result (not shared state) so concurrent queries and parallel
    * tests cannot race on it.
    *
    * `maxRounds` is a round BUDGET, not a correctness bound: LS/SS
    * converges in O(log² n) alternations, but the constant is graph-
    * shape-dependent (chains measure ~1.7·log₂ n in this suite), so 60
    * rounds covers any corpus this engine will meet — while a legal but
    * astronomically deep input could in principle exceed it. Exceeding
    * the budget therefore fails loud as an OVERSIZED INPUT, never
    * silently returns partial labels (which would split true dup
    * clusters downstream). */
  def labelsWithRounds(spark: SparkSession, edges: DataFrame,
      maxRounds: Int = 60): (DataFrame, Int) = {
    // convergence signature: edge count + two independent hash XORs —
    // equal signatures on consecutive rounds mean the edge set is a
    // fixpoint (stars are fixpoints of both ops); O(1) to the driver.
    // bit_xor (not sum): full-range 64-bit hashes overflow an ANSI sum,
    // and xor can't cancel because the edge set is distinct()
    def signature(e: DataFrame): (Long, Long, Long) = {
      val r = e.agg(
        count(lit(1)),
        coalesce(bit_xor(xxhash64(col("src"), col("dst"))), lit(0L)),
        coalesce(bit_xor(xxhash64(col("dst"), col("src"), lit(7L))), lit(0L))).head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    val cut = graft.plans.Checkpoints.cut _
    var cur = cut(edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
      .filter(col("src") =!= col("dst")).distinct())
    val nodes = cut(cur.select(col("src").as("node"))
      .union(cur.select(col("dst").as("node"))).distinct())
    var sig = signature(cur)
    var converged = cur.isEmpty
    var round = 0
    while (!converged && round < maxRounds) {
      // checkpoint (plan TRUNCATION), not persist: each LS∘SS round
      // references its input ~6× (sym unions, min-join, two star
      // projections), so the LOGICAL tree grows ~6^k nodes by round k
      // and analysis/optimization time explodes even though the data
      // is cached — measured 52 s (vs 1.3) for q_dedup_cluster_ls when
      // round 15 tried persist here; fixed shallow loops (pagerank,
      // k-core) take the cheap persist instead, this one cannot
      cur = cut(smallStar(largeStar(cur)))
      val s2 = signature(cur)
      converged = s2 == sig
      sig = s2
      round += 1
    }
    if (!converged) throw new IllegalStateException(
      s"large-star/small-star did not converge within the $maxRounds-round " +
        "budget — the component structure is deeper than this budget covers " +
        "(LS/SS needs O(log² n) rounds, so this is an extraordinarily large " +
        "or adversarial graph); raise maxRounds rather than accept partial " +
        "labels, which would silently split true components")
    // converged edges form stars: every non-root node has exactly one
    // outgoing edge to its component min; roots appear only as dst
    (nodes.join(cur.withColumnRenamed("src", "node"), Seq("node"), "left")
      .select(col("node"), coalesce(col("dst"), col("node")).as("label")),
      round)
  }
}
