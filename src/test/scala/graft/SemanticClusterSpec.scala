package graft

import org.apache.spark.sql.functions._
import graft.queries.SimilarityQueries

/** q_dedup_cluster_semantic (VERDICT r5 item #2): embedding near-dup
  * pairs feed connected components, so PARAPHRASE CHAINS — A≈B and B≈C
  * with cos(A,C) below the pair threshold — collapse into one dup
  * family, which pairwise detection alone cannot express.
  */
class SemanticClusterSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  /** Fixture: 16-dim float vectors. Components 1-8 are a tiny positive
    * epsilon so every vector lands in the SAME sign-bit bucket (255) —
    * the blocking cannot hide a miss. The similarity geometry lives in
    * components 9-10: unit vectors at 0°, 60°, 120° form the chain
    * (cos 60° = 0.5 ≥ 0.35 for adjacent, cos 120° = −0.5 < 0.35 for the
    * endpoints); vector 3 points along component 11, orthogonal to all. */
  private def chainDir: String = {
    val eps = 1e-6f
    def vec(c9: Float, c10: Float, c11: Float): Seq[Float] =
      Seq.fill(8)(eps) ++ Seq(c9, c10, c11) ++ Seq.fill(5)(0f)
    val cos60 = math.cos(math.Pi / 3).toFloat
    val sin60 = math.sin(math.Pi / 3).toFloat
    val cos120 = math.cos(2 * math.Pi / 3).toFloat
    val sin120 = math.sin(2 * math.Pi / 3).toFloat
    val rows = Seq(
      (0L, vec(1f, 0f, 0f), 0),          // A at 0°
      (1L, vec(cos60, sin60, 0f), 0),    // B at 60°
      (2L, vec(cos120, sin120, 0f), 0),  // C at 120°
      (3L, vec(0f, 0f, 1f), 1))          // D orthogonal to the plane
    val dir = java.nio.file.Files.createTempDirectory("graft-semchain").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("a paraphrase chain clusters into one family; isolated vectors self-label") {
    val dir = chainDir
    // precondition: the pair stage sees exactly the two adjacent pairs
    val pairs = SimilarityQueries.embeddingLshPairs(spark, dir)
      .select("v1", "v2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L), (1L, 2L)),
      s"expected the chain's adjacent pairs only, got $pairs")
    val clusters = SimilarityQueries.queries("q_dedup_cluster_semantic")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 3L),
      s"chain must collapse to cluster 0 and D stay its own cluster, got $clusters")
  }

  test("q_dedup_cluster_semantic labels every corpus vector exactly once") {
    val out = SimilarityQueries.queries("q_dedup_cluster_semantic")(spark, sf)
    val n = Tables.embeddings(spark, sf).count()
    assert(out.count() == n)
    assert(out.select("vec_id").distinct().count() == n)
    // cluster ids are component minima: every cluster id labels itself
    val ids = out.select("cluster_id").distinct()
      .join(out.withColumnRenamed("vec_id", "cluster_id"), "cluster_id")
    assert(ids.count() >= out.select("cluster_id").distinct().count())
  }
}
