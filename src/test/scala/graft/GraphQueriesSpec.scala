package graft

import org.apache.spark.sql.functions._
import graft.queries.GraphQueries

/** PageRank invariants on the real customer–supplier graph. Exact
  * values are oracle-checked by the driver (unrolled-CTE DuckDB replay);
  * this spec pins the structural properties that hold for ANY undirected
  * graph with no dangling nodes. */
class GraphQueriesSpec extends SparkSpec {

  private def run() = GraphQueries.queries("q_pagerank")(spark, sf)

  test("rank mass is conserved: normalized ranks average to 1") {
    val pr = run().cache()
    val n = pr.count()
    assert(n > 0)
    val total = pr.agg(sum("pr")).head().getDouble(0)
    // sum(pr) = n exactly in theory (undirected graph, no dangling
    // mass); rounding to 6 decimals perturbs each row by <5e-7.
    assert(math.abs(total - n) < n * 1e-5, s"mass $total for $n nodes")
    pr.unpersist()
  }

  test("both node families appear and every rank is positive") {
    val pr = run().cache()
    val custs = pr.filter(col("node") > 0).count()
    val supps = pr.filter(col("node") < 0).count()
    assert(custs > 0 && supps > 0, s"customers=$custs suppliers=$supps")
    assert(pr.filter(col("pr") <= 0).count() == 0,
      "teleport term makes every reachable node's rank strictly positive")
    pr.unpersist()
  }

  test("two executions produce identical output (checkpointed iterations)") {
    val a = run().collect().map(_.toString)
    val b = run().collect().map(_.toString)
    assert(a.sameElements(b))
  }
}
