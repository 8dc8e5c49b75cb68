package graft

import org.apache.spark.sql.functions._
import graft.queries.CurationQueries
import scala.collection.mutable

/** BPE merge training: the distributed fold must agree with an
  * independent sequential reimplementation of the reference algorithm
  * (pair counts over the word-frequency dict, argmax with
  * (freq desc, left, right) ties, greedy left-to-right merge), and
  * reproduce the classic hand-computed example. */
class BpeSpec extends SparkSpec {

  /** Sequential reference BPE (the subword-nmt algorithm, driver-side). */
  private def refBpe(words: Seq[String], n: Int): Seq[(Int, String, String, Long)] = {
    def mergeSeq(seq: List[String], l: String, r: String): List[String] = {
      val buf = mutable.ListBuffer[String]()
      for (x <- seq)
        if (buf.nonEmpty && buf.last == l && x == r) {
          buf.remove(buf.size - 1); buf += (l + r)
        } else buf += x
      buf.toList
    }
    var freq: Map[List[String], Long] = words.filter(_.nonEmpty)
      .groupBy(w => w.map(_.toString).toList :+ "</w>")
      .map { case (seq, ws) => seq -> ws.size.toLong }
    val out = mutable.ArrayBuffer[(Int, String, String, Long)]()
    var k = 1
    while (k <= n) {
      val pc = mutable.Map[(String, String), Long]()
      freq.foreach { case (seq, f) =>
        seq.zip(seq.tail).foreach(p => pc(p) = pc.getOrElse(p, 0L) + f)
      }
      if (pc.isEmpty) return out.toSeq
      val ((l, r), pf) = pc.toSeq
        .sortBy { case ((l, r), f) => (-f, l, r) }.head
      out += ((k, l, r, pf))
      freq = freq.groupMapReduce { case (seq, _) => mergeSeq(seq, l, r) }(_._2)(_ + _)
      k += 1
    }
    out.toSeq
  }

  test("classic fixture: low/lower/newest/widest merges in order") {
    val words =
      Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val s = spark
    import s.implicits._
    val docs = Seq(words.mkString(" ")).toDF("text")
    val got = CurationQueries.bpeMerges(docs, 5)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1, "e", "s", 9L), (2, "es", "t", 9L), (3, "est", "</w>", 9L),
      (4, "l", "o", 7L), (5, "lo", "w", 7L)))
  }

  test("distributed merges equal the sequential reference on real docs") {
    val docs = Tables.documents(spark, sf).limit(60).select("text")
    val words = docs.collect().flatMap(_.getString(0).split(" ")).toSeq
    val want = refBpe(words, 10)
    val got = CurationQueries.bpeMerges(docs, 10)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == want, s"got ${got.toSeq}\nwant $want")
  }

  test("dict-path training equals the distributed path merge-for-merge") {
    // the round-17 fast path (one corpus pass + driver dict loop) vs
    // the fully-distributed per-round form: independent machinery end
    // to end — explode/groupBy/argmax jobs vs an in-memory dict loop —
    // so agreement on real docs pins both
    val docs = Tables.documents(spark, sf).limit(80).select("text")
    val dist = CurationQueries.trainBpe(docs, 10)
    val dict = CurationQueries.trainBpeDict(docs, 10)
    assert(dict == dist, s"dict $dict\ndist $dist")
  }

  test("dict-path fixture: low/lower/newest/widest merges in order") {
    val words =
      Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val s = spark
    import s.implicits._
    val docs = Seq(words.mkString(" ")).toDF("text")
    val got = CurationQueries.bpeMergesDict(docs, 5)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1, "e", "s", 9L), (2, "es", "t", 9L), (3, "est", "</w>", 9L),
      (4, "l", "o", 7L), (5, "lo", "w", 7L)))
  }

  test("dict-path minFreq pruning drops sub-threshold words from training") {
    val s = spark
    import s.implicits._
    // "zq" appears once — at minFreq=2 its chars must not influence
    // pair counts; at minFreq=1 they do (but never win here)
    val docs = Seq(("low low low zq")).toDF("text")
    val all = CurationQueries.trainBpeDict(docs, 2, minFreq = 1L)
    val pruned = CurationQueries.trainBpeDict(docs, 2, minFreq = 2L)
    assert(all.map(m => (m._2, m._3)) == pruned.map(m => (m._2, m._3)))
    assert(pruned.forall { case (_, l, r, _) =>
      !l.contains("z") && !r.contains("q") })
  }

  test("encode matches the sequential reference tokenization per doc") {
    def mergeSeq(seq: List[String], l: String, r: String): List[String] = {
      val buf = mutable.ListBuffer[String]()
      for (x <- seq)
        if (buf.nonEmpty && buf.last == l && x == r) {
          buf.remove(buf.size - 1); buf += (l + r)
        } else buf += x
      buf.toList
    }
    val docs = Tables.documents(spark, sf).limit(40).select("doc_id", "text")
    val rows = docs.collect().map(r => r.getLong(0) -> r.getString(1))
    val merges = refBpe(rows.flatMap(_._2.split(" ")).toSeq, 10)
      .map { case (_, l, r, _) => (l, r) }
    def encodeWord(w: String): Int =
      merges.foldLeft(w.map(_.toString).toList :+ "</w>") {
        case (seq, (l, r)) => mergeSeq(seq, l, r)
      }.size
    val want = rows.map { case (id, text) =>
      val ws = text.split(" ").filter(_.nonEmpty)
      (id, ws.length.toLong, ws.map(encodeWord(_).toLong).sum)
    }.sortBy(_._1).toSeq
    val got = CurationQueries.bpeEncode(docs, merges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
  }

  test("more merges never lengthen any document") {
    val docs = Tables.documents(spark, sf).limit(40).select("doc_id", "text")
    val merges = CurationQueries.trainBpe(docs, 8)
      .map { case (_, l, r, _) => (l, r) }
    def tokens(m: Seq[(String, String)]): Map[Long, Long] =
      CurationQueries.bpeEncode(docs, m)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val none = tokens(Seq.empty)
    val all = tokens(merges)
    assert(all.keySet == none.keySet)
    all.foreach { case (id, n) =>
      assert(n <= none(id), s"doc $id grew: $n > ${none(id)}")
    }
    assert(all.values.sum < none.values.sum, "merges compressed nothing")
  }

  test("training is deterministic across runs") {
    val docs = Tables.documents(spark, sf).limit(30).select("text")
    val a = CurationQueries.bpeMerges(docs, 6).collect().toSeq
    val b = CurationQueries.bpeMerges(docs, 6).collect().toSeq
    assert(a == b)
  }
}
