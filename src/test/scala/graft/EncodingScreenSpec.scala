package graft

import graft.queries.TextQueries

/** Mojibake / encoding-damage screen -- FIXTURE-ONLY evidence: the
  * synthetic corpus is pure ASCII (an oracle there would verify an
  * all-zero column), so the signatures are exercised on constructed
  * texts instead: UTF-8-read-as-Latin-1 digraphs, replacement chars,
  * stray control bytes, and the clean-accented-text negative case the
  * >=2-hit threshold exists for. Non-ASCII is built from escapes so
  * this source file stays byte-safe. */
class EncodingScreenSpec extends SparkSpec {

  private def screen(rows: Seq[(Long, String)]) = {
    val ss = spark
    import ss.implicits._
    TextQueries.encodingScreen(rows.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getBoolean(4)))).toMap
  }

  /** The UTF-8 bytes of `s` re-read as cp1252 -- the classic mojibake
    * transform (this is how "caf\u00e9" becomes "caf\u00c3\u00a9" and
    * \u2019 becomes \u00e2\u20ac\u2122; cp1252, not ISO-8859-1,
    * because the C1 range 0x80-0x9F maps to the printable punctuation
    * the \u00e2\u20ac signature keys on). */
  private def mojibake(s: String): String =
    new String(s.getBytes("UTF-8"), "windows-1252")

  test("classic mojibake digraphs are counted and flagged") {
    val damaged = mojibake("caf\u00e9\u2019s na\u00efve") // cafe'+quote+naive
    val nbsp = mojibake("a\u00a0b\u00a0c") // two NBSPs
    val r = screen(Seq(1L -> damaged, 2L -> nbsp))
    assert(r(1L)._2 >= 3 && r(1L)._4, s"damaged text must flag: ${r(1L)}")
    assert(r(2L)._2 >= 2 && r(2L)._4, s"NBSP mojibake must flag: ${r(2L)}")
  }

  test("replacement and control characters flag on a single hit") {
    val repl = "broken \ufffd decode"
    val ctrl = "binary junk\u0001here\u0007"
    val r = screen(Seq(1L -> repl, 2L -> ctrl))
    assert(r(1L)._1 == 1 && r(1L)._4, "one U+FFFD is already damage")
    assert(r(2L)._3 == 2 && r(2L)._4, "C0 control bytes are damage")
  }

  test("clean ASCII and clean accented UTF-8 pass; tab/newline are not control hits") {
    val ascii = "the quick brown fox\tjumps\nover the lazy dog"
    val accented = "caf\u00e9\u2019s na\u00efve r\u00e9sum\u00e9"
    // ONE ambiguous digraph (the damaged form of "S\u00e3o" carries a
    // single C3+continuation hit) must NOT flag -- threshold 2
    val lusophone = mojibake("S\u00e3o") + " Paulo"
    val r = screen(Seq(1L -> ascii, 2L -> accented, 3L -> lusophone))
    assert(r(1L) == ((0, 0, 0, false)), s"ASCII must pass: ${r(1L)}")
    assert(r(2L) == ((0, 0, 0, false)), s"clean UTF-8 must pass: ${r(2L)}")
    assert(r(3L)._2 == 1 && !r(3L)._4,
      s"single ambiguous digraph must not flag: ${r(3L)}")
  }
}
