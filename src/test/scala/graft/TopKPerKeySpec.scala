package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.plans.TopKPerKey

/** The native per-key top-k physical operator: equivalence with the
  * window-function form on random data (with deliberate ties), the
  * partial→exchange→final plan shape, and the bounded shuffle claim. */
class TopKPerKeySpec extends SparkSpec {

  test("equals the window row_number form on random data with ties") {
    val s = spark
    import s.implicits._
    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(700 + seed)
      // coarse value grid on few keys → deliberate ties, broken by id
      val rows = (1L to 2000L).map { i =>
        (i, s"k${rnd.nextInt(7)}", (rnd.nextInt(40) * 5).toDouble)
      }
      val df = rows.toDF("id", "key", "v").repartition(8)
      val got = TopKPerKey.topK(df, Seq("key"), "v", "id", 5)
        .collect().map(r =>
          (r.getString(1), r.getLong(0), r.getDouble(2), r.getInt(3))).toSet
      val w = Window.partitionBy("key").orderBy(desc("v"), col("id"))
      val want = df.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .collect().map(r =>
          (r.getString(1), r.getLong(0), r.getDouble(2), r.getInt(3))).toSet
      assert(got == want, s"seed=$seed missing=${(want -- got).take(3)} " +
        s"extra=${(got -- want).take(3)}")
    }
  }

  test("plans as partial + exchange + final, not a window sort") {
    val s = spark
    import s.implicits._
    val df = (1L to 100L).map(i => (i, s"k${i % 3}", i.toDouble))
      .toDF("id", "key", "v").repartition(4)
    val out = TopKPerKey.topK(df, Seq("key"), "v", "id", 2)
    val plan = out.queryExecution.executedPlan.toString
    assert("TopKPerKey \\[".r.findAllIn(plan).size == 2,
      s"expected partial+final TopKPerKeyExec pair:\n$plan")
    assert(plan.contains("Exchange hashpartitioning"),
      s"EnsureRequirements must insert the key-clustered exchange:\n$plan")
    assert(!plan.contains("!TopKPerKey"),
      s"plan must not carry the missing-input marker:\n$plan")
    assert(!plan.contains("Window"), s"must not fall back to a window:\n$plan")
  }

  test("partial phase bounds what crosses the exchange") {
    val s = spark
    import s.implicits._
    // 4 input partitions × 3 keys × k=2 → at most 24 partial rows may
    // cross, out of 100,000 inputs; assert via the final output being
    // exact (global, not per-partition) top-2 — rows the partial phase
    // dropped can never resurface, so exactness here proves the merge
    val df = (1L to 100000L).map(i => (i, s"k${i % 3}", (i % 997).toDouble))
      .toDF("id", "key", "v").repartition(4)
    val got = TopKPerKey.topK(df, Seq("key"), "v", "id", 2)
      .collect().map(r => (r.getString(1), r.getDouble(2), r.getInt(3)))
    assert(got.length == 6)
    // per key the max v is 996 (v = i mod 997) and rank-2 is the tied
    // 996 with the next-larger id — ties cut by id ascending
    got.groupBy(_._1).foreach { case (k, xs) =>
      assert(xs.map(_._2).forall(_ == 996.0), s"$k top values")
      assert(xs.map(_._3).sorted.sameElements(Array(1, 2)), s"$k ranks")
    }
  }

  test("string ord column: heap owns its values, not the row buffer") {
    val s = spark
    import s.implicits._
    // buffer-backed ord values (UTF8String views into the reused
    // iterator row) — without InternalRow.copyValue the heap's stored
    // ord/tie silently mutate as the partition iterator advances
    val rnd = new scala.util.Random(41)
    val rows = (1L to 3000L).map { i =>
      (i, s"k${rnd.nextInt(5)}", f"v${rnd.nextInt(900)}%03d")
    }
    val df = rows.toDF("id", "key", "sv").repartition(6)
    val got = TopKPerKey.topK(df, Seq("key"), "sv", "id", 4)
      .collect().map(r =>
        (r.getString(1), r.getLong(0), r.getString(2), r.getInt(3))).toSet
    val w = Window.partitionBy("key").orderBy(desc("sv"), col("id"))
    val want = df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 4)
      .collect().map(r =>
        (r.getString(1), r.getLong(0), r.getString(2), r.getInt(3))).toSet
    assert(got == want, s"missing=${(want -- got).take(4)} extra=${(got -- want).take(4)}")
  }

  test("null ord values: matches the window form's desc-nulls-last") {
    val s = spark
    import s.implicits._
    val rows: Seq[(Long, String, Option[Double])] =
      (1L to 50L).map(i => (i, s"k${i % 2}",
        if (i % 7 == 0) None else Some((i % 11).toDouble)))
    val df = rows.toDF("id", "key", "v").repartition(4)
    // both regimes: k beyond the group size (nulls must surface, last)
    // AND k well inside it (null rows contend against a FULL heap, so
    // the eviction probe's null handling is on the hot path)
    Seq(30, 3).foreach { k =>
      val got = TopKPerKey.topK(df, Seq("key"), "v", "id", k)
        .collect().map(r =>
          (r.getString(1), r.getLong(0), r.getInt(3))).toSet
      val w = Window.partitionBy("key").orderBy(desc("v"), col("id"))
      val want = df.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .collect().map(r => (r.getString(1), r.getLong(0), r.getInt(3))).toSet
      assert(got == want,
        s"k=$k missing=${(want -- got).take(4)} extra=${(got -- want).take(4)}")
    }
  }

  test("rejects unknown columns and non-positive k") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "a", 1.0)).toDF("id", "key", "v")
    intercept[IllegalArgumentException](
      TopKPerKey.topK(df, Seq("nope"), "v", "id", 3))
    intercept[IllegalArgumentException](
      TopKPerKey.topK(df, Seq("key"), "v", "id", 0))
  }
}
