package graft

import org.apache.spark.sql.functions._
import graft.functions.LshBuckets

/** LshBuckets must reproduce the HOF bucket formulation bit-for-bit —
  * the knn recall tests depend on identical bucket assignment. */
class LshBucketsSpec extends SparkSpec {

  test("lsh buckets match the HOF formulation on the corpus") {
    val nTables = 8
    val bitsPerTable = 8
    val rnd = new scala.util.Random(42)
    val planes: Seq[Seq[Double]] = Seq.fill(nTables * bitsPerTable)(
      Seq.fill(64)(rnd.nextGaussian()))
    val e = Tables.embeddings(spark, sf)
    val hof = e
      .withColumn("planes", typedLit(planes))
      .withColumn("bits", expr(
        """transform(planes, p ->
             CASE WHEN aggregate(zip_with(embedding, p,
                    (x, h) -> CAST(x AS DOUBLE) * h), 0D, (a, v) -> a + v) >= 0D
                  THEN 1L ELSE 0L END)"""))
      .select(col("vec_id"), expr(
        s"""transform(sequence(0, ${nTables - 1}, 1), t ->
              aggregate(sequence(0, ${bitsPerTable - 1}, 1), 0L,
                (acc, b) -> acc + bits[t * $bitsPerTable + b] * shiftleft(1L, b)))""")
        .as("buckets"))
      .orderBy("vec_id").collect()
    val fast = e.select(col("vec_id"),
      LshBuckets.lshBuckets(col("embedding"), planes.flatten.toIndexedSeq,
        nTables, bitsPerTable).as("buckets"))
      .orderBy("vec_id").collect()
    assert(hof.length == fast.length && hof.nonEmpty)
    hof.zip(fast).foreach { case (h, f) =>
      assert(h.getSeq[Long](1) == f.getSeq[Long](1), s"vec ${h.getLong(0)}")
    }
  }

  test("lsh buckets fail loudly on a dimension-mismatched embedding") {
    val s = spark
    import s.implicits._
    val df = Seq(Tuple1(Array(1f, 2f))).toDF("emb")
    val e = intercept[Throwable] {
      df.select(LshBuckets.lshBuckets(col("emb"),
        IndexedSeq.fill(64 * 64)(0.5), 8, 8)).collect()
    }
    val messages = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    assert(messages.contains("lsh_buckets"),
      s"expected a loud lsh_buckets dims error, got:\n$messages")
  }

  test("lsh buckets expression participates in whole-stage codegen") {
    val plan = Tables.embeddings(spark, sf)
      .select(LshBuckets.lshBuckets(col("embedding"),
        IndexedSeq.fill(64 * 64)(0.5), 8, 8))
      .queryExecution.executedPlan
    assert(plan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec]),
      s"expected WholeStageCodegen:\n$plan")
  }
}
