package graft

import org.apache.spark.sql.functions._
import graft.queries.{ConnectedComponents, TextQueries}

/** Large-star/small-star CC (Kiveris et al., SoCC 2014): the log-round
  * fallback that one-hop min-label propagation needs on chain-shaped
  * duplicate families (VERDICT r2 task #1). */
class ConnectedComponentsSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  private def labelMap(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.labels(spark, edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("adversarial 120-node chain converges in log rounds, not diameter rounds") {
    // diameter 119 — one-hop propagation needs 119 rounds and would blow
    // the propagation budget that used to hard-fail q_dedup_cluster
    val chain = (0L until 119L).map(i => (i, i + 1))
    val (labelDf, rounds) = ConnectedComponents.labelsWithRounds(
      spark, chain.toDF("src", "dst"))
    val labels = labelDf.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == 120)
    assert(labels.values.forall(_ == 0L), "every chain node joins component 0")
    assert(rounds <= 12, s"expected O(log n) rounds, took $rounds")
  }

  test("matches a union-find ground truth on a multi-component graph") {
    // deterministic pseudo-random graph: 200 nodes, 150 edges
    val edges = (0 until 150).map { i =>
      val a = (i * 7919L) % 200
      val b = (i * 104729L + 31) % 200
      (a, b)
    }.filter { case (a, b) => a != b }
    // driver-side union-find oracle
    val parent = Array.tabulate(200)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val truth = (0 until 200).groupBy(find).flatMap { case (_, ns) =>
      val m = ns.min.toLong; ns.map(_.toLong -> m)
    }
    val got = labelMap(edges)
    got.foreach { case (node, label) =>
      assert(label == truth(node), s"node $node: got $label want ${truth(node)}")
    }
  }

  test("empty and self-loop-only edge sets yield no labels") {
    assert(labelMap(Seq.empty).isEmpty)
    assert(labelMap(Seq((3L, 3L), (7L, 7L))).isEmpty)
  }

  test("q_dedup_cluster_ls equals q_dedup_cluster on real near-dup pairs") {
    val a = TextQueries.queries("q_dedup_cluster")(spark, sf).collect().toSeq
    val b = TextQueries.queries("q_dedup_cluster_ls")(spark, sf).collect().toSeq
    assert(a == b, "LS/SS and min-label propagation must compute the same fixpoint")
  }

  test("min-label fallback: a chain through dedupCluster's budget would now degrade") {
    // the public seam is ConnectedComponents.labels; assert it also
    // handles star + clique shapes (the common near-dup families) so
    // the fallback can replace propagation output wholesale
    val star = (1L to 30L).map(i => (0L, i))
    assert(labelMap(star).values.forall(_ == 0L))
    val clique = for (i <- 0L to 9L; j <- (i + 1) to 9L) yield (i + 100, j + 100)
    assert(labelMap(clique).values.forall(_ == 100L))
  }

  test("q_dedup_cluster's LS/SS fallback branch labels a chain corpus correctly") {
    // A chain-shaped dup family driven through dedupCluster ITSELF (not
    // just ConnectedComponents.labels): doc i shares 11 of 12 shingles
    // with doc i+1 (Jaccard 11/13 >= 0.8) but only 10 with doc i+2
    // (10/14 < 0.8), so the near-dup graph is a 12-node path of
    // diameter 11. With maxIter=2, one-hop propagation cannot converge
    // and the fallback at the end of the loop is the ONLY path to these
    // labels — this covers the rejoin/column wiring the unit tests on
    // labels() alone cannot reach.
    val dir = java.nio.file.Files.createTempDirectory("graft-chain").toString
    val docs = (0L until 12L).map { i =>
      (i, (i until i + 14).map(w => s"c$w").mkString(" "))
    }
    docs.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // precondition: the pair graph really is the 11-edge path
    val pairs = TextQueries.ngramPairs(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == (0L until 11L).map(i => (i, i + 1)).toSet)
    val clustered = TextQueries.dedupClusterImpl(spark, dir, maxIter = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clustered.size == 12)
    assert(clustered.values.forall(_ == 0L),
      s"all chain docs must collapse to cluster 0 via the LS/SS fallback, got $clustered")
  }
}
