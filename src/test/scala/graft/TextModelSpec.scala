package graft

import org.apache.spark.sql.functions._
import graft.queries.{TextQueries, WindowQueries}

/** Property pins for the corpus-model operators added with q_lm_score /
  * q_source_divergence / q_win_ewma. The DuckDB oracles already prove
  * cross-engine value equality at the driver SF; these tests pin the
  * SEMANTICS on constructed distributions where the right answer is
  * known in closed form — the drift the hash compare can't explain.
  */
class TextModelSpec extends SparkSpec {

  /** documents-shaped fixture written through the real parquet scan path. */
  private def writeDocs(rows: Seq[(Long, String, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-lmfix").toString
    val df = spark.createDataFrame(rows).toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("lm_score ranks a common-word doc above a rare-word doc") {
    // 9 docs of the same common words, 1 doc of corpus-unique words:
    // every rare token has count 1, every common token count 9, so the
    // mean log-prob separates the docs with certainty, not by luck.
    val common = (0L until 9L).map(i => (i, "the cat sat on the mat", "en", "s"))
    val rare = Seq((99L, "zq1 zq2 zq3 zq4 zq5 zq6", "en", "s"))
    val d = writeDocs(common ++ rare)
    val scores = TextQueries.queries("q_lm_score")(spark, d)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scores(99L) < scores(0L) - 1.0,
      s"rare-word doc must score well below common-word docs: $scores")
    // all common docs share one text, hence one score
    assert((0L until 9L).map(scores).distinct.size == 1)
  }

  test("lm_score n_tokens is the doc's whitespace token count") {
    val d = writeDocs(Seq((1L, "a b c", "en", "s"), (2L, "a", "en", "s")))
    val n = TextQueries.queries("q_lm_score")(spark, d)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(n == Map(1L -> 3, 2L -> 1))
  }

  test("readability reproduces Flesch in closed form on known text") {
    // doc 1: 4 words, 2 sentences, 4 vowel groups -> w/s=2, syl/w=1
    //   flesch = 206.835 - 1.015*2 - 84.6*1 = 120.205 (easy: >= 60)
    // doc 2: 2 words, 1 sentence ("..." counts once), 6 vowel groups
    //   -> w/s=2, syl/w=3: 206.835 - 2.03 - 253.8 = -48.995 (hard)
    val d = writeDocs(Seq(
      (1L, "go up. go up.", "en", "s"),
      (2L, "banana banana...", "en", "s")))
    val got = TextQueries.queries("q_readability")(spark, d)
      .collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getLong(2) == 2)
    val exp = (120.205 + -48.995) / 2
    assert(math.abs(r.getDouble(3) - exp) < 1e-3, s"avg=${r.getDouble(3)}")
    assert(math.abs(r.getDouble(4) - 0.5) < 1e-9, "one of two is easy")
  }

  test("readability on the corpus: shares in [0,1], sane score range") {
    val got = TextQueries.queries("q_readability")(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
      assert(r.getDouble(3) > -1000.0 && r.getDouble(3) < 206.836)
    }
  }

  test("naive bayes separates two languages with disjoint vocab") {
    val en = (0L until 3L).map(i => (i, "the cat sat on the mat", "en", "s"))
    val es = (10L until 13L).map(i => (i, "el gato se sento en la", "es", "s"))
    val d = writeDocs(en ++ es)
    val got = TextQueries.queries("q_naive_bayes")(spark, d)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    // disjoint vocab + resubstitution => a perfect confusion diagonal
    assert(got == Map(("en", "en") -> 3L, ("es", "es") -> 3L), got.toString)
  }

  test("naive bayes on the corpus conserves docs; labels from the corpus") {
    val docs = Tables.documents(spark, sf)
    val got = TextQueries.queries("q_naive_bayes")(spark, sf).collect()
    assert(got.map(_.getLong(2)).sum == docs.count())
    val langs = docs.select("lang").distinct().collect()
      .map(_.getString(0)).toSet
    got.foreach { r =>
      assert(langs(r.getString(0)) && langs(r.getString(1)))
    }
  }

  test("cohen kappa: perfect labeler scores 1, constant labeler 0-ish") {
    // marker words make the heuristic's prediction certain per doc
    val d = writeDocs(Seq(
      (1L, "the a of", "en", "s"), (2L, "the a of", "en", "s"),
      (3L, "el la de", "es", "s"), (4L, "der und die", "de", "s")))
    val r = TextQueries.queries("q_cohen_kappa")(spark, d).collect().head
    assert(r.getLong(0) == 4 && r.getLong(1) == 4)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-9, "po = 1")
    assert(math.abs(r.getDouble(4) - 1.0) < 1e-9, "perfect kappa")
  }

  test("cohen kappa on the corpus matches a sequential confusion pass") {
    val preds = TextQueries.queries("q_lang_id")(spark, sf)
      .select("lang", "pred_lang").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val n = preds.length.toLong
    val agree = preds.count { case (a, b) => a == b }.toLong
    val ri = preds.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val cj = preds.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val chance = ri.keys.toSeq.map { k =>
      val c: Long = cj.getOrElse(k, 0L)
      BigInt(ri(k)) * BigInt(c)
    }.sum
    val po = agree.toDouble / n
    val pe = chance.toDouble / (n.toDouble * n)
    val r = TextQueries.queries("q_cohen_kappa")(spark, sf).collect().head
    assert(r.getLong(0) == n && r.getLong(1) == agree)
    assert(math.abs(r.getDouble(2) - po) < 1e-6 + 1e-9)
    assert(math.abs(r.getDouble(3) - pe) < 1e-6 + 1e-9)
    assert(math.abs(r.getDouble(4) - (po - pe) / (1.0 - pe)) < 1e-6 + 1e-9)
    assert(r.getDouble(4) <= 1.0 + 1e-9)
  }

  test("mcnemar reproduces a sequential paired comparison of the labelers") {
    val a = TextQueries.queries("q_lang_id")(spark, sf)
      .select("doc_id", "lang", "pred_lang").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    val b = TextQueries.nbPredictions(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val paired = a.keySet.intersect(b.keySet).toSeq.map { id =>
      val (lang, pa) = a(id); (pa == lang, b(id) == lang)
    }
    val n = paired.length.toLong
    val b01 = paired.count { case (x, y) => x && !y }.toLong
    val b10 = paired.count { case (x, y) => !x && y }.toLong
    val chi2 = (b01 - b10).toDouble * (b01 - b10) / (b01 + b10)
    val r = TextQueries.queries("q_mcnemar")(spark, sf).collect().head
    assert(r.getLong(0) == n)
    assert(math.abs(r.getDouble(1) -
      paired.count(_._1).toDouble / n) < 1e-6 + 1e-9)
    assert(math.abs(r.getDouble(2) -
      paired.count(_._2).toDouble / n) < 1e-6 + 1e-9)
    assert(r.getLong(3) == b01 && r.getLong(4) == b10)
    assert(math.abs(r.getDouble(5) - chi2) < 1e-4 + 1e-9)
    assert(r.getBoolean(6) == (chi2 > 3.841))
  }

  test("source divergence is zero for identically-distributed sources") {
    val d = writeDocs(Seq(
      (1L, "a b c d", "en", "s1"), (2L, "a b c d", "en", "s2"),
      (3L, "a b c d", "en", "s3")))
    val kl = TextQueries.queries("q_source_divergence")(spark, d)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(kl.values.forall(_ == 0.0),
      s"every source matches the corpus marginal exactly, want KL=0: $kl")
  }

  test("source divergence orders an off-profile source above on-profile ones") {
    val d = writeDocs(Seq(
      (1L, "a b c d", "en", "s1"), (2L, "a b c d", "en", "s2"),
      (3L, "a a a a", "en", "s3"))) // s3 floods one token
    val kl = TextQueries.queries("q_source_divergence")(spark, d)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(kl("s1") == kl("s2"), s"identical sources must tie: $kl")
    assert(kl("s3") > kl("s1") && kl("s1") >= 0.0,
      s"the flooding source must read as the drifted one: $kl")
  }

  test("win_ewma replays the recursive fold per user") {
    val rows = WindowQueries.queries("q_win_ewma")(spark, sf)
      .filter(col("user_id") === 0).collect()
    assert(rows.nonEmpty)
    // re-run the recurrence on the already-ordered values, bounded to
    // the same 10-row window the query uses
    val vals = rows.map(_.getDouble(2))
    rows.zipWithIndex.foreach { case (r, i) =>
      val frame = vals.slice(math.max(0, i - 9), i + 1)
      val want = frame.tail.foldLeft(frame.head)((acc, x) => 0.3 * x + 0.7 * acc)
      val got = r.getDouble(3)
      assert(math.abs(got - want) < 1e-3,
        s"row $i: ewma $got != recurrence $want")
    }
  }
}
