package graft

import org.apache.spark.sql.functions._
import graft.queries.TextQueries

/** Prefix-filtering near-dup join: the driver oracle proves complete
  * recall by hash equality with the declarative Jaccard pair set; this
  * spec pins the two properties the oracle can't see — a boilerplate
  * (hot) shingle never generates candidates, and the result agrees
  * with a driver-side brute force on real docs. */
class PrefixJoinSpec extends SparkSpec {

  test("prefix pairs equal brute-force Jaccard >= 0.8 pairs on real docs") {
    val got = TextQueries.queries("q_dedup_prefix")(spark, sf)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // independent sequential reimplementation
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    def shingles(t: String): Set[String] =
      t.split(" ").sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    val sets = docs.map { case (id, t) => id -> shingles(t) }.filter(_._2.nonEmpty)
    val want = (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      inter = (sa & sb).size if inter > 0
      union = (sa | sb).size if inter * 5 >= union * 4
    } yield (a, b)).toSet
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
  }

  test("a universal boilerplate shingle generates zero candidates") {
    val s = spark
    import s.implicits._
    val boiler = "terms of service apply"
    // 60 unrelated docs all sharing the boilerplate + one true dup pair
    val base = (1L to 60L).map(i =>
      (i, s"$boiler unique$i text$i body$i words$i content$i filler$i"))
    val dup = Seq(
      (100L, s"$boiler alpha beta gamma delta epsilon zeta eta theta"),
      (101L, s"$boiler alpha beta gamma delta epsilon zeta eta theta"))
    val docs = (base ++ dup).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("graft-prefix").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val pairs = TextQueries.queries("q_dedup_prefix")(spark, tmp)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exactly the true dup pair — the 60 boilerplate-sharing docs have
    // true Jaccard far below 0.8 and must produce nothing
    assert(pairs == Set((100L, 101L)), s"got $pairs")
  }
}
