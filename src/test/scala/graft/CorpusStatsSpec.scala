package graft

import org.apache.spark.sql.functions._
import graft.queries.CorpusStatsQueries

/** Closed-form pins for the corpus/distribution profiling operators.
  * The DuckDB oracles prove cross-engine equality at the driver SF;
  * these fixtures pin the SEMANTICS where the right answer is knowable
  * by hand (entropy of 'abab', containment of a subset source, the
  * interpolated percentile formula, exact centroid angles). */
class CorpusStatsSpec extends SparkSpec {

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft-cstats").toString

  /** documents-shaped fixture; n_chars defaults to length(text) but can
    * be overridden to probe the numeric ops directly. */
  private def writeDocs(rows: Seq[(Long, String, String, String)],
      nChars: Option[Seq[Long]] = None): String = {
    val dir = tmpDir()
    var df = spark.createDataFrame(rows).toDF("doc_id", "text", "lang", "source")
    df = nChars match {
      case Some(ns) =>
        val byId = rows.map(_._1).zip(ns).toMap
        val setN = udf((id: Long) => byId(id))
        df.withColumn("n_chars", setN(col("doc_id")))
      case None => df.withColumn("n_chars", length(col("text")).cast("long"))
    }
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("char entropy: closed-form values and distinct counts") {
    val d = writeDocs(Seq(
      (1L, "aaaa", "en", "s"),   // one symbol: 0 bits
      (2L, "abab", "en", "s"),   // uniform over 2: exactly 1 bit
      (3L, "abcd", "en", "s"))) // uniform over 4: exactly 2 bits
    val r = CorpusStatsQueries.queries("q_char_entropy")(spark, d)
      .collect().map(x => x.getLong(0) -> ((x.getInt(1), x.getDouble(2)))).toMap
    assert(r(1L) == ((1, 0.0)))
    assert(r(2L) == ((2, 1.0)))
    assert(r(3L) == ((4, 2.0)))
  }

  test("dup coverage: verbatim copies read 1.0, unique text reads 0.0") {
    val d = writeDocs(Seq(
      (1L, "the cat sat on the mat", "en", "s"),
      (2L, "the cat sat on the mat", "en", "s"),
      (3L, "entirely fresh words appear here now", "en", "s")))
    val r = CorpusStatsQueries.queries("q_dup_coverage")(spark, d)
      .collect().map(x => x.getLong(0) -> x.getDouble(3)).toMap
    assert(r == Map(1L -> 1.0, 2L -> 1.0, 3L -> 0.0))
  }

  test("novelty: first doc claims its shingles, a later copy claims none") {
    val d = writeDocs(Seq(
      (1L, "the cat sat on the mat", "en", "s"),
      (2L, "the cat sat on the mat", "en", "s"),
      (3L, "entirely fresh words appear here now", "en", "s")))
    val r = CorpusStatsQueries.queries("q_ngram_novelty")(spark, d)
      .collect().map(x => x.getLong(0) -> x.getDouble(3)).toMap
    assert(r == Map(1L -> 1.0, 2L -> 0.0, 3L -> 1.0))
  }

  test("source overlap: subset source is fully contained, superset is not") {
    // s2's single shingle ('a b c') is one of s1's two → containment
    // s2→s1 = 1.0, s1→s2 = 0.5; shingle sets are per-source distinct.
    val d = writeDocs(Seq(
      (1L, "a b c d", "en", "s1"),
      (2L, "a b c", "en", "s2")))
    val r = CorpusStatsQueries.queries("q_source_overlap")(spark, d)
      .collect().map(x => (x.getString(0), x.getString(1)) -> x.getDouble(3)).toMap
    assert(r == Map(("s1", "s2") -> 0.5, ("s2", "s1") -> 1.0))
  }

  test("temperature sample: rare lang keeps all, common lang rate is sqrt") {
    val en = (0L until 16L).map(i => (i, s"doc $i", "en", "s"))
    val fr = (100L until 104L).map(i => (i, s"doc $i", "fr", "s"))
    val d = writeDocs(en ++ fr)
    val rows = CorpusStatsQueries.queries("q_temperature_sample")(spark, d)
      .collect().map(x => (x.getLong(0), x.getString(1), x.getDouble(2)))
    val frKept = rows.filter(_._2 == "fr")
    assert(frKept.length == 4 && frKept.forall(_._3 == 1.0),
      "the minimum-count language must survive in full at rate 1")
    val enKept = rows.filter(_._2 == "en")
    assert(enKept.forall(_._3 == 0.5), "rate_en = sqrt(4/16) = 0.5")
    // md5-prefix rule replayed on the driver: exactly the docs whose
    // 6-hex prefix is below 0.5 * 16^6 = 0x800000 survive
    val md = java.security.MessageDigest.getInstance("MD5")
    val expect = (0L until 16L).filter { i =>
      val h = md.digest(i.toString.getBytes).map("%02x".format(_)).mkString
      h.substring(0, 6) < "800000"
    }.toSet
    assert(enKept.map(_._1).toSet == expect)
  }

  test("winsorize: interpolated p05/p95 bounds cap the tails only") {
    val rows = (1L to 100L).map(i => (i, s"t$i", "en", "s"))
    val d = writeDocs(rows, nChars = Some((1L to 100L).toSeq))
    val r = CorpusStatsQueries.queries("q_winsorize")(spark, d)
      .collect().map(x => x.getLong(0) -> x.getDouble(3)).toMap
    // sorted values 1..100: p05 = v[4] + 0.95*(v[5]-v[4]) = 5.95,
    // p95 = v[94] + 0.05*(v[95]-v[94]) = 95.05
    assert(r(1L) == 5.95 && r(3L) == 5.95, "low tail capped at p05")
    assert(r(100L) == 95.05 && r(97L) == 95.05, "high tail capped at p95")
    assert(r(50L) == 50.0, "interior values pass through")
  }

  test("skew profile: counts, percentile interpolation, hot key, ratio") {
    val dir = tmpDir()
    val custkeys = Seq.fill(5)(1L) ++ Seq(2L, 3L, 4L)
    spark.createDataFrame(custkeys.zipWithIndex.map { case (c, i) => (i.toLong, c) })
      .toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = CorpusStatsQueries.queries("q_skew_profile")(spark, dir).collect()(0)
    assert(r.getLong(r.fieldIndex("n_keys")) == 4L)
    assert(r.getLong(r.fieldIndex("max_n")) == 5L)
    assert(r.getDouble(r.fieldIndex("avg_n")) == 2.0)
    assert(r.getDouble(r.fieldIndex("p50_n")) == 1.0)
    // counts sorted [1,1,1,5]: p99 = 1 + 0.97*(5-1) = 4.88
    assert(r.getDouble(r.fieldIndex("p99_n")) == 4.88)
    assert(r.getLong(r.fieldIndex("hot_key")) == 1L)
    assert(r.getDouble(r.fieldIndex("skew_ratio")) == 2.5)
  }

  test("MAD outliers: flags the planted extreme, robust to its leverage") {
    val dir = tmpDir()
    // values 1..9 plus a planted 100: med = 5.5, MAD = 2.5, so the
    // modified z of the plant is 0.6745*94.5/2.5 ≈ 25.5 — flagged;
    // the honest rows all sit below |3.5|. (A classical z-score with
    // the same data reads z(100) ≈ 3.0 — the outlier's own leverage
    // on the stddev hides it from a 3.5 cut.)
    val vals = (1 to 9).map(_.toDouble) :+ 100.0
    spark.createDataFrame(vals.zipWithIndex.map { case (v, i) =>
      (i.toLong, i.toLong * 1000000000L, "click", v)
    }).toDF("event_id", "ts", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = CorpusStatsQueries.queries("q_mad_outliers")(spark, dir).collect()
    assert(r.length == 1 && r(0).getLong(0) == 9L,
      s"exactly the planted row must flag: ${r.mkString(",")}")
    assert(math.abs(r(0).getDouble(2) - 0.6745 * 94.5 / 2.5) < 1e-3)
  }

  test("CMS heavy hitters: never underestimates; exact when collision-free") {
    val dir = tmpDir()
    val custkeys = Seq.fill(7)(10L) ++ Seq.fill(3)(20L) ++ Seq(30L, 40L)
    spark.createDataFrame(custkeys.zipWithIndex.map { case (c, i) => (i.toLong, c) })
      .toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val est = CorpusStatsQueries.queries("q_heavy_hitters")(spark, dir)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val truth = custkeys.groupBy(identity).view.mapValues(_.size.toLong).toMap
    truth.foreach { case (k, n) =>
      assert(est(k) >= n, s"CMS must never underestimate: key $k est ${est(k)} < $n")
    }
    // 4 keys in 256 buckets × 4 independent rows: the min over rows is
    // collision-free here, so the estimates are exact
    assert(est == truth)
  }

  test("ttr matches a sequential per-doc recompute; bounded by 1") {
    val rows = Tables.documents(spark, sf)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1).split(" ", -1)))
    val want = rows.filter(_._2.nonEmpty).groupBy(_._1).map {
      case (src, docs) =>
        val units = docs.map { case (_, w) =>
          w.distinct.length.toLong * 1000000000L / w.length
        }.sum
        src -> (docs.length.toLong, docs.map(_._2.length.toLong).sum,
          docs.map(_._2.distinct.length.toLong).sum,
          units.toDouble / (docs.length * 1.0e9))
    }
    val got = CorpusStatsQueries.queries("q_ttr")(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (src, (nd, nt, ty, ttr)) =>
      val g = got(src)
      assert(g._1 == nd && g._2 == nt && g._3 == ty, s"source $src: $g")
      assert(math.abs(g._4 - ttr) < 1e-6 + 1e-9, s"$src ttr ${g._4} vs $ttr")
      assert(g._4 > 0.0 && g._4 <= 1.0)
    }
  }

  test("heaps law matches a sequential vocabulary-growth replay") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
      .sortBy(_._1)
    val seen = scala.collection.mutable.Set[String]()
    var cumN = 0L; var cumV = 0L
    val pts = docs.map { case (_, w) =>
      cumN += w.length
      w.foreach { t => if (!seen(t)) { seen += t; cumV += 1 } }
      (math.log(cumN.toDouble), math.log(cumV.toDouble))
    }
    val n = pts.length.toDouble
    val (mx, my) = (pts.map(_._1).sum / n, pts.map(_._2).sum / n)
    val beta = pts.map { case (x, y) => (x - mx) * (y - my) }.sum /
      pts.map { case (x, _) => (x - mx) * (x - mx) }.sum
    val logk = my - beta * mx
    val got = CorpusStatsQueries.queries("q_heaps_law")(spark, sf)
      .collect()(0)
    assert(got.getLong(0) == docs.length.toLong)
    assert(math.abs(got.getDouble(1) - beta) < 1e-3 + 1e-9,
      s"beta ${got.getDouble(1)} vs brute $beta")
    assert(math.abs(got.getDouble(2) - logk) < 1e-2 + 1e-9)
    // natural-text sanity: vocabulary grows sublinearly
    assert(got.getDouble(1) > 0.0 && got.getDouble(1) < 1.0)
  }

  test("label centroids: identical direction reads 1, orthogonal reads 0") {
    val dir = tmpDir()
    val rows = Seq(
      (1L, Array(1f, 0f), 0), (2L, Array(1f, 0f), 0), // label 0 → (1, 0)
      (3L, Array(0f, 1f), 1),                          // label 1 → (0, 1)
      (4L, Array(2f, 0f), 2))                          // label 2 → (2, 0)
    spark.createDataFrame(rows).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val r = CorpusStatsQueries.queries("q_label_centroids")(spark, dir)
      .collect().map(x => (x.getInt(0), x.getInt(1)) -> x.getDouble(2)).toMap
    assert(r == Map((0, 1) -> 0.0, (0, 2) -> 1.0, (1, 2) -> 0.0))
  }
}
