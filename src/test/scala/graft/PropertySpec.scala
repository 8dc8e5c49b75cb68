package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.{forAll, propBoolean}
import graft.functions.{Fingerprint64, MomentsAgg, SimHashAgg, TopKAgg}

/** Property-based invariants (SURVEY.md §5.2.3) for the engine's pure
  * kernels — no SparkSession needed, so these run in milliseconds and
  * cover the merge/associativity laws the distributed runtime relies
  * on (partial aggregation is only correct if merge agrees with
  * straight reduce under any split).
  */
object PropertySpec extends Properties("graft") {

  property("fingerprint64 deterministic, distinct inputs distinct") =
    forAll(Gen.asciiPrintableStr, Gen.asciiPrintableStr) { (a, b) =>
      val ha = Fingerprint64.hash(a.getBytes("UTF-8"))
      val stable = ha == Fingerprint64.hash(a.getBytes("UTF-8"))
      val spread = a == b || ha != Fingerprint64.hash(b.getBytes("UTF-8"))
      stable && spread
    }

  private val doubles = Gen.listOfN(30, Gen.chooseNum(-1e6, 1e6))

  property("moments merge agrees with single-pass reduce under any split") =
    forAll(doubles, doubles, doubles) { (a, b, c) =>
      def red(l: List[Double]) = l.foldLeft(MomentsAgg.zero)(MomentsAgg.reduce)
      val all = red(a ++ b ++ c)
      val m1 = MomentsAgg.merge(MomentsAgg.merge(red(a), red(b)), red(c))
      val m2 = MomentsAgg.merge(red(a), MomentsAgg.merge(red(b), red(c)))
      (m1.n == all.n && m2.n == all.n) && (all.n == 0 ||
        (math.abs(m1.mean - all.mean) <= 1e-6 * (1 + math.abs(all.mean)) &&
          math.abs(m1.m2 - all.m2) <= 1e-5 * (1 + math.abs(all.m2)) &&
          math.abs(m2.mean - m1.mean) <= 1e-6 * (1 + math.abs(m1.mean))))
    }

  property("moments variance equals two-pass variance") =
    forAll(Gen.listOfN(50, Gen.chooseNum(-1e4, 1e4))) { xs =>
      (xs.length > 1) ==> {
        val m = xs.foldLeft(MomentsAgg.zero)(MomentsAgg.reduce)
        val mean = xs.sum / xs.length
        val v2 = xs.map(x => (x - mean) * (x - mean)).sum / (xs.length - 1)
        math.abs(m.variance - v2) <= 1e-6 * (1 + v2)
      }
    }

  property("simhash is order-free and split-merge equals reduce") =
    forAll(Gen.listOfN(20, Gen.long), Gen.long) { (hashes, seed) =>
      def simhash(l: List[Long]) =
        SimHashAgg.finish(l.foldLeft(SimHashAgg.zero)(SimHashAgg.reduce))
      val shuffled = new scala.util.Random(seed).shuffle(hashes)
      val (a, b) = hashes.splitAt(hashes.length / 2)
      val merged = SimHashAgg.merge(
        a.foldLeft(SimHashAgg.zero)(SimHashAgg.reduce),
        b.foldLeft(SimHashAgg.zero)(SimHashAgg.reduce))
      simhash(hashes) == simhash(shuffled) &&
        SimHashAgg.finish(merged) == simhash(hashes)
    }

  property("topk equals sort-then-take under any split") =
    forAll(
      Gen.listOf(Gen.zip(Gen.chooseNum(0.0, 100.0), Gen.chooseNum(0L, 1000L))),
      Gen.chooseNum(1, 5)) { (xs0, k) =>
      val xs = xs0.distinct
      val agg = new TopKAgg(k)
      val expect = xs.sortBy { case (v, id) => (-v, id) }.take(k)
      val viaReduce = agg.finish(xs.foldLeft(agg.zero)(agg.reduce))
      val (a, b) = xs.splitAt(xs.length / 2)
      val viaMerge = agg.finish(agg.merge(
        a.foldLeft(agg.zero)(agg.reduce), b.foldLeft(agg.zero)(agg.reduce)))
      viaReduce == expect && viaMerge == expect
    }

  property("clean_data output is clean and idempotent") =
    forAll(Gen.asciiPrintableStr) { s =>
      val cleaned = s.replaceAll("[^, a-zA-Z0-9]", " ").split(" ", -1)(0)
      cleaned.forall(c => c.isLetterOrDigit || c == ',') &&
        cleaned.replaceAll("[^, a-zA-Z0-9]", " ").split(" ", -1)(0) == cleaned
    }

  property("round(exp(log(p)), 2) recovers 2-decimal prices") =
    forAll(Gen.chooseNum(1.0, 1999.0)) { p0 =>
      val p = math.rint(p0 * 100) / 100
      val recovered = BigDecimal(math.exp(math.log(p)))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
      math.abs(recovered - p) <= 0.01 + 1e-9
    }

  // independent re-derivation of the winnowing semantics the WinnowStats
  // codegen expression implements: code-point substrings (what Spark's
  // char-counted length/substring see), xxhash64 seed 42, 4-window
  // minima, first-occurrence distinct
  private def winnowExpected(str: String, gram: Int, window: Int): (Int, Long) = {
    import org.apache.spark.unsafe.types.UTF8String
    import org.apache.spark.sql.catalyst.expressions.XXH64
    def xxh(s: String): Long =
      XXH64.hashUTF8String(UTF8String.fromString(s), 42L)
    val cps = str.codePoints.toArray
    val grams: Seq[Long] =
      if (cps.length >= gram)
        (0 to cps.length - gram).map(i => xxh(new String(cps, i, gram)))
      else Seq(xxh(str))
    val minima: Seq[Long] =
      if (grams.length >= window)
        (0 to grams.length - window).map(j => grams.slice(j, j + window).min)
      else Seq(grams.min)
    val distinct = minima.distinct
    (distinct.length, distinct.foldLeft(0L)(_ ^ _))
  }

  private val textGen: Gen[String] = Gen.oneOf(
    Gen.asciiPrintableStr,
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('é', 'ü', '日', '語', '—', ' ')))
      .map(_.mkString))

  property("winnow expression kernel matches an independent re-derivation") =
    forAll(textGen) { s =>
      val row = graft.functions.Winnow.stats(
        org.apache.spark.unsafe.types.UTF8String.fromString(s), 8, 4)
      (row.getInt(0), row.getLong(1)) == winnowExpected(s, 8, 4)
    }

  property("jaro-winkler is symmetric, bounded, 1 iff equal (non-empty)") =
    forAll(textGen, textGen) { (a, b) =>
      val ab = graft.functions.JaroWinkler.similarity(a, b)
      val ba = graft.functions.JaroWinkler.similarity(b, a)
      val sym = ab == ba
      val bounded = ab >= 0.0 && ab <= 1.0
      val ident = if (a == b && a.nonEmpty)
        graft.functions.JaroWinkler.similarity(a, a) == 1.0
      else true
      sym && bounded && ident
    }

  /** Independent de-interleave: extract even/odd bits one at a time. */
  private def deinterleave(z: Long): (Long, Long) = {
    var (x, y) = (0L, 0L)
    for (i <- 0 until 16) {
      x |= ((z >> (2 * i)) & 1L) << i
      y |= ((z >> (2 * i + 1)) & 1L) << i
    }
    (x, y)
  }

  property("z-order interleave round-trips through de-interleave") =
    forAll(Gen.chooseNum(0L, 65535L), Gen.chooseNum(0L, 65535L)) { (x, y) =>
      deinterleave(graft.functions.ZOrder.interleave16(x, y)) == ((x, y))
    }

  property("z-order preserves per-dimension order within a fixed other dim") =
    forAll(Gen.chooseNum(0L, 65534L), Gen.chooseNum(0L, 65535L)) { (x, y) =>
      graft.functions.ZOrder.interleave16(x, y) <
        graft.functions.ZOrder.interleave16(x + 1, y)
    }
}
