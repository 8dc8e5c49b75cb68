package graft

import org.apache.spark.sql.functions._
import graft.functions.CharEntropyStats

/** The single-pass char-entropy codegen expression: brute-force parity
  * on random strings, edge cases, and parity with the sorted-fold
  * definition the q_char_entropy oracle uses. */
class CharEntropySpec extends SparkSpec {

  private def brute(s: String): (Int, Double) = {
    val counts = s.codePoints().toArray.groupBy(identity)
      .map { case (c, xs) => c -> xs.length }
    val n = s.codePointCount(0, s.length).toDouble
    val acc = counts.toSeq.sortBy(_._1).map { case (_, k) =>
      (k / n) * (math.log(k / n) / math.log(2.0))
    }.sum
    (counts.size, acc)
  }

  test("matches the sorted-fold brute force on random strings") {
    val rnd = new scala.util.Random(77)
    val s = spark
    import s.implicits._
    val strings = (1 to 300).map { _ =>
      val len = rnd.nextInt(200)
      (1 to len).map(_ => ('a' + rnd.nextInt(30)).toChar).mkString
    }.filter(_.nonEmpty)
    val out = strings.toDF("text")
      .select(CharEntropyStats.charEntropyStats(col("text")).as("st"))
      .select(col("st.n_unique"), col("st.entropy_sum"))
      .collect()
    out.zip(strings).foreach { case (row, str) =>
      val (u, e) = brute(str)
      assert(row.getInt(0) == u, s"n_unique of '$str'")
      assert(row.getDouble(1) == e, s"entropy fold of '$str' must be bit-exact")
    }
  }

  test("edge cases: empty, single char, uniform, null") {
    val s = spark
    import s.implicits._
    val out = Seq(Some(""), Some("x"), Some("aabb"), None).toDF("text")
      .select(CharEntropyStats.charEntropyStats(col("text")).as("st"))
      .collect()
    assert(out(0).getStruct(0).getInt(0) == 0)
    assert(out(0).getStruct(0).getDouble(1) == 0.0)
    assert(out(1).getStruct(0).getInt(0) == 1)
    assert(out(1).getStruct(0).getDouble(1) == 0.0)
    // aabb: two chars at p=.5 → Σ p·log2 p = -1 → entropy_bits = 1
    assert(out(2).getStruct(0).getInt(0) == 2)
    assert(math.abs(out(2).getStruct(0).getDouble(1) + 1.0) < 1e-12)
    assert(out(3).isNullAt(0))
  }

  test("q_char_entropy emits the expression over every document") {
    val docs = Tables.documents(spark, sf).count()
    val out = graft.queries.CorpusStatsQueries.queries("q_char_entropy")(spark, sf)
    assert(out.count() == docs)
    val sample = out.limit(5).collect()
    sample.foreach { r =>
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) < 8.0,
        "entropy bits must be plausible for text")
    }
  }
}
