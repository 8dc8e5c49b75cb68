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
