package graft

import org.apache.spark.sql.functions._
import graft.queries.CurationQueries

/** Semantics pins for the curation/featurization operators beyond the
  * DuckDB oracle (which checks engine equivalence, not intent). */
class CurationSpec extends SparkSpec {

  test("bm25 emits at most 3 ranked terms per doc, scores descending") {
    val r = CurationQueries.queries("q_bm25")(spark, sf).cache()
    val perDoc = r.groupBy("doc_id").agg(
      count(lit(1)).as("n"), max("rnk").as("mx"), min("rnk").as("mn"))
    assert(perDoc.filter(col("n") > 3 || col("mx") > 3 || col("mn") =!= 1)
      .isEmpty, "each doc: ranks 1..min(3, terms)")
    // within a doc, score never increases with rank
    val bad = r.as("a").join(r.as("b"),
        col("a.doc_id") === col("b.doc_id") &&
          col("a.rnk") < col("b.rnk") &&
          col("a.bm25") < col("b.bm25"))
    assert(bad.isEmpty, "bm25 must be non-increasing in rank")
    r.unpersist()
  }

  test("bm25 prefers the rarer term at equal tf (idf monotonicity)") {
    // two docs, same length; 'rare' appears once in one doc, 'common'
    // in both — with equal tf and dl the rarer term must outscore
    // doc 1 has exactly 3 distinct terms so none falls outside top-3
    val docs = spark.createDataFrame(
      Seq((1L, "common rare z"), (2L, "common only p")))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-bm25").toString
    docs.withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = CurationQueries.queries("q_bm25")(spark, dir)
      .filter(col("doc_id") === 1L).collect()
    val byWord = r.map(x => x.getString(2) -> x.getDouble(4)).toMap
    assert(byWord("rare") > byWord("common"),
      s"rare must outscore common: $byWord")
  }

  test("robust_z is 0 at the median and NULL only for zero-IQR groups") {
    val r = CurationQueries.queries("q_robust_scale")(spark, sf).cache()
    assert(r.filter(col("robust_z").isNull).isEmpty,
      "real data: every language has spread, no NULL scales")
    // the sign splits around the per-lang median: both signs present
    val signs = r.groupBy("lang").agg(
      sum(when(col("robust_z") > 0, 1).otherwise(0)).as("pos"),
      sum(when(col("robust_z") < 0, 1).otherwise(0)).as("neg"))
    assert(signs.filter(col("pos") === 0 || col("neg") === 0).isEmpty)
    r.unpersist()
  }

  test("stratified sample takes exactly ceil(20%) per language") {
    val want = Tables.documents(spark, sf).groupBy("lang")
      .agg(ceil(count(lit(1)) * 0.2).as("want"))
    val got = CurationQueries.queries("q_stratified_sample")(spark, sf)
      .groupBy("lang").agg(count(lit(1)).as("got"))
    assert(want.join(got, "lang").filter(col("want") =!= col("got")).isEmpty)
    // determinism: same survivors on a re-run
    val a = CurationQueries.queries("q_stratified_sample")(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = CurationQueries.queries("q_stratified_sample")(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("overlapping chunks cover every token and overlap by 64") {
    val r = CurationQueries.queries("q_doc_chunk_overlap")(spark, sf).cache()
    val toks = Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).as("nt"))
    // chunk count = ceil(nt / 64); token coverage: last chunk ends at nt
    val agg = r.groupBy("doc_id").agg(
      count(lit(1)).as("n_chunks"),
      max(col("chunk_id") * 64 + col("n_tok")).as("covered"))
    val joined = agg.join(toks, "doc_id")
    assert(joined.filter(col("covered") =!= col("nt")).isEmpty,
      "chunks must cover exactly the token count")
    assert(joined.filter(col("n_chunks") =!=
      ceil(col("nt") / lit(64.0)).cast("long")).isEmpty)
    // consecutive full chunks share 64 tokens: start delta is 64
    assert(r.filter(col("chunk_id") > 0).select(min("n_tok")).head.getInt(0) >= 1)
    r.unpersist()
  }

  test("lang-source shares sum to 1 within every language") {
    val r = CurationQueries.queries("q_lang_source_share")(spark, sf)
    val sums = r.groupBy("lang").agg(sum("share").as("s"))
    assert(sums.filter(abs(col("s") - 1.0) > 0.01).isEmpty,
      "rounded shares must sum to ~1 per language")
  }

  test("pmi pairs are supported, vocab-bounded, and symmetric-ordered") {
    val r = CurationQueries.queries("q_cooccur_pmi")(spark, sf).collect()
    assert(r.length <= 20 && r.nonEmpty)
    assert(r.forall(x => x.getLong(2) >= 5), "support >= 5 docs")
    assert(r.forall(x => x.getString(0) < x.getString(1)), "wa < wb")
    // top-20 by pmi: the list is non-increasing
    val pmis = r.map(_.getDouble(3)).toSeq
    assert(pmis.zip(pmis.tail).forall { case (x, y) => x >= y })
  }

  test("bigram lm matches a sequential add-k recompute; ppl = exp(-lm)") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1).split(" "))
      .filter(_._2.length >= 2)
    val bigrams = docs.flatMap { case (_, w) =>
      w.dropRight(1).zip(w.drop(1)).map { case (a, b) => s"$a $b" } }
    val n12 = bigrams.groupBy(identity).map { case (k, v) => k -> v.length }
    val nc = n12.toSeq.groupBy(_._1.split(" ")(0))
      .map { case (w1, m) => w1 -> m.map(_._2).sum }
    val v = docs.flatMap(_._2).distinct.length
    val got = CurationQueries.queries("q_bigram_lm")(spark, sf).collect()
    assert(got.length == docs.length)
    got.take(20).foreach { r =>
      val w = docs.find(_._1 == r.getLong(0)).get._2
      val lps = w.dropRight(1).zip(w.drop(1)).map { case (a, b) =>
        math.log((n12(s"$a $b") + 0.5) / (nc(a) + 0.5 * v))
      }
      assert(r.getInt(1) == lps.length)
      val mean = lps.sum / lps.length
      assert(math.abs(r.getDouble(2) - mean) < 1e-4 + 1e-9, s"doc ${r.getLong(0)}")
      assert(math.abs(r.getDouble(3) - math.exp(-mean)) < 1e-3)
      assert(r.getDouble(3) > 1.0, "perplexity of a proper LM exceeds 1")
    }
  }
}
