package graft

import org.apache.spark.sql.functions._
import graft.functions.DotF

/** DotF must be bit-identical to the HOF fold it replaced — the
  * embedding oracles round to 6 decimals, but parity is exact here. */
class DotFSpec extends SparkSpec {

  test("dot_f matches the zip_with/aggregate fold bit-for-bit on the corpus") {
    val e = Tables.embeddings(spark, sf)
    val hof = aggregate(
      zip_with(col("embedding"), col("embedding"),
        (p, q) => p.cast("double") * q.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val rows = e.select(
      col("vec_id"),
      DotF.dotF(col("embedding"), col("embedding")).as("fast"),
      hof.as("slow")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(1) == r.getDouble(2), s"vec ${r.getLong(0)}")
    }
  }

  test("dot_f of orthogonal and identical unit vectors") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (Array(1f, 0f), Array(0f, 1f), 0.0),
      (Array(1f, 0f), Array(1f, 0f), 1.0),
      (Array(0.5f, 0.5f), Array(2f, 2f), 2.0))
      .toDF("a", "b", "want")
    df.select(DotF.dotF(col("a"), col("b")).as("got"), col("want"))
      .collect().foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("dot_f yields NULL on length mismatch and null elements, like the HOF") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (Seq(Option(1f), Option(2f)), Seq(Option(3f))),             // short right
      (Seq(Option(1f), None),       Seq(Option(3f), Option(4f))), // null element
      (Seq(Option(1f), Option(2f)), Seq(Option(3f), Option(4f)))) // clean
      .toDF("a", "b")
    val hof = aggregate(
      zip_with(col("a"), col("b"),
        (p, q) => p.cast("double") * q.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val rows = df.select(
      DotF.dotF(col("a"), col("b")).as("fast"), hof.as("slow")).collect()
    rows.foreach(r => assert(r.isNullAt(0) == r.isNullAt(1),
      s"fast/HOF null disagreement: $r"))
    assert(rows(0).isNullAt(0), "length mismatch must yield NULL")
    assert(rows(1).isNullAt(0), "null element must yield NULL")
    assert(rows(2).getDouble(0) == 11.0)
  }

  test("dot_f SQL arity is validated at analysis time") {
    DotF.register(spark)
    val e = intercept[Exception](
      spark.sql("SELECT dot_f(array(CAST(1 AS FLOAT)))").collect())
    assert(e.getMessage.contains("dot_f"), e.getMessage)
  }

  test("dot_f is callable from SQL and participates in codegen") {
    DotF.register(spark)
    val got = spark.sql(
      "SELECT dot_f(array(CAST(1.5 AS FLOAT), CAST(2 AS FLOAT)), " +
        "array(CAST(2 AS FLOAT), CAST(0.5 AS FLOAT)))").head().getDouble(0)
    assert(got == 4.0)
    val plan = Tables.embeddings(spark, sf)
      .select(DotF.dotF(col("embedding"), col("embedding")))
      .queryExecution.executedPlan
    assert(plan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec]),
      s"expected WholeStageCodegen:\n$plan")
  }
}
