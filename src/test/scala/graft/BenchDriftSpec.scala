package graft

import org.scalatest.funsuite.AnyFunSuite

/** Unit pins for Bench's measurement machinery — the committed-artifact
  * parser and the round-16 whole-window drift signal. These run
  * without a SparkSession: the drift decision must be testable as the
  * pure function it is (the trigger is part of the recorded
  * methodology, so its edge cases need pins like any operator).
  */
class BenchDriftSpec extends AnyFunSuite {

  test("windowRatio is the median ratio over stable committed queries") {
    val committed = Map("a" -> 1.0, "b" -> 2.0, "c" -> 0.5, "d" -> 4.0)
    // uniform +20% window
    val vals = Map("a" -> 1.2, "b" -> 2.4, "c" -> 0.6, "d" -> 4.8)
    val (r, n) = Bench.windowRatio(vals, committed)
    assert(n == 4)
    assert(math.abs(r - 1.2) < 1e-12)
  }

  test("windowRatio is robust to a localized block (median, not mean)") {
    val committed = (1 to 100).map(i => s"q$i" -> 1.0).toMap
    // 10 queries read 6x (an interference block), the rest clean
    val vals = (1 to 100).map(i =>
      s"q$i" -> (if (i <= 10) 6.0 else 1.0)).toMap
    val (r, n) = Bench.windowRatio(vals, committed)
    assert(n == 100)
    assert(r == 1.0, s"median must ignore the block, got $r")
  }

  test("windowRatio skips failures, sub-floor and uncommitted queries") {
    val committed = Map("a" -> 1.0, "tiny" -> 0.01, "b" -> 2.0)
    val vals = Map(
      "a" -> -1.0,  // failed this run — no ratio
      "tiny" -> 0.05, // committed under the 0.05 s floor — jitter, no ratio
      "b" -> 3.0,   // the one comparable query
      "new" -> 9.9) // no committed value — no ratio
    val (r, n) = Bench.windowRatio(vals, committed)
    assert(n == 1 && r == 1.5)
  }

  test("windowRatio with nothing comparable reports (-1, 0)") {
    assert(Bench.windowRatio(Map("x" -> 1.0), Map.empty) == (-1.0, 0))
    assert(Bench.windowRatio(Map.empty, Map("x" -> 1.0)) == (-1.0, 0))
  }

  test("windowRatio averages the two middle ratios for even sizes") {
    val committed = Map("a" -> 1.0, "b" -> 1.0, "c" -> 1.0, "d" -> 1.0)
    val vals = Map("a" -> 1.0, "b" -> 1.1, "c" -> 1.3, "d" -> 9.9)
    val (r, n) = Bench.windowRatio(vals, committed)
    assert(n == 4)
    assert(math.abs(r - 1.2) < 1e-12, s"expected (1.1+1.3)/2, got $r")
  }

  test("windowRatio applies the stability floor to BOTH sides") {
    // a sub-floor CURRENT reading over a stable committed value is
    // scheduler jitter too (round-16 advice) — no ratio either way
    val committed = Map("a" -> 1.0, "b" -> 2.0)
    val vals = Map("a" -> 0.04, "b" -> 2.0)
    val (r, n) = Bench.windowRatio(vals, committed)
    assert(n == 1 && r == 1.0)
  }

  test("minMerge keeps per-query mins; -1 and absent entries lose") {
    val a = Map("x" -> 1.0, "y" -> -1.0, "z" -> 3.0)
    val b = Map("x" -> 1.5, "y" -> 2.0, "w" -> 0.5)
    assert(Bench.minMerge(a, b) ==
      Map("x" -> 1.0, "y" -> 2.0, "z" -> 3.0, "w" -> 0.5))
  }

  test("a hot committed recording cannot deaden the drift detector " +
      "(round-16 ratchet scenario)") {
    // clean anchor: 150 queries at 1.0 s. A +18%-inflated recording
    // got committed (the exact round-16 event). The next window runs
    // uniformly at 1.31× clean — vs the inflated artifact alone that
    // reads 1.11 (under the 1.15 trigger, detector blinded); vs the
    // min-merged anchor it MUST still read 1.31 and trigger.
    val clean = (1 to 150).map(i => s"q$i" -> 1.0).toMap
    val inflated = clean.map { case (k, v) => k -> v * 1.18 }
    val current = clean.map { case (k, v) => k -> v * 1.31 }
    val (blind, _) = Bench.windowRatio(current, inflated)
    assert(math.abs(blind - 1.31 / 1.18) < 1e-9) // the flaw, documented
    val anchor = Bench.minMerge(clean, inflated)
    assert(anchor == clean, "min-merge must refuse the inflated values")
    val (r, n) = Bench.windowRatio(current, anchor)
    assert(n == 150)
    assert(math.abs(r - 1.31) < 1e-9, s"detector must see 1.31, got $r")
    assert(r > 1.15, "the 1.15 trigger must fire on this window")
  }

  test("minMerge admits new queries at their first recorded value") {
    val anchor = Map("old" -> 1.0)
    val run = Map("old" -> 1.2, "new" -> 0.7)
    assert(Bench.minMerge(anchor, run) == Map("old" -> 1.0, "new" -> 0.7))
  }

  test("the live CLEAN_ANCHOR ledger never sits above the committed " +
      "recording (anchor invariant)") {
    // runs from the repo root: both files exist in a checked-out tree.
    // anchorBench = minMerge(ledger, BENCH_FULL) must be <= BENCH_FULL
    // per query wherever both are defined.
    val full = Bench.committedBench()
    val anchor = Bench.anchorBench()
    if (full.nonEmpty && anchor.nonEmpty) {
      val above = full.collect {
        case (q, v) if v >= 0 && anchor.getOrElse(q, v) > v + 1e-9 => q
      }
      assert(above.isEmpty, s"anchor above committed for: $above")
    }
  }

  test("committedRatio reads the drift stamp; -1 when absent") {
    val f = java.nio.file.Files.createTempFile("bench-ratio", ".json")
    java.nio.file.Files.write(f,
      """{"metric":"total","drift":{"window_ratio":1.257,"ratio_n":380,"threshold":1.15,"passes":2,"window_ratio_final":1.182},"queries":{"q_a":1}}"""
        .getBytes("UTF-8"))
    assert(math.abs(Bench.committedRatio(f.toString) - 1.182) < 1e-12)
    assert(Bench.committedRatio("/nonexistent.json") == -1.0)
    val g = java.nio.file.Files.createTempFile("bench-nostamp", ".json")
    java.nio.file.Files.write(g, """{"metric":"total","queries":{}}""".getBytes("UTF-8"))
    assert(Bench.committedRatio(g.toString) == -1.0)
  }

  test("committedBench parses the artifact's per-query map") {
    val f = java.nio.file.Files.createTempFile("bench-full", ".json")
    java.nio.file.Files.write(f,
      """{"metric":"total","value":3.5,"unit":"sec","p50":0.3,"queries":{"q_a":1.25,"q_b":2,"q_c":0.25}}"""
        .getBytes("UTF-8"))
    val m = Bench.committedBench(f.toString)
    assert(m == Map("q_a" -> 1.25, "q_b" -> 2.0, "q_c" -> 0.25))
  }

  test("committedBench is empty on a missing or malformed file") {
    assert(Bench.committedBench("/nonexistent/BENCH_FULL.json").isEmpty)
    val f = java.nio.file.Files.createTempFile("bench-bad", ".json")
    java.nio.file.Files.write(f, "not json at all".getBytes("UTF-8"))
    assert(Bench.committedBench(f.toString).isEmpty)
  }
}
