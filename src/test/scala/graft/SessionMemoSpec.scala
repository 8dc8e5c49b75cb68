package graft

import graft.queries.SessionMemo
import org.apache.spark.sql.functions._

/** Lifecycle contract of the shared-builder memo: build-once reuse,
  * dir-scoped invalidation, and full drain (the eviction surface the
  * bare ConcurrentHashMaps it replaced did not have). */
class SessionMemoSpec extends SparkSpec {

  test("memo builds once per (key, session, dir) and reuses the frame") {
    val ss = spark
    import ss.implicits._
    var builds = 0
    def get() = SessionMemo("spec.buildOnce", spark, sf) {
      builds += 1
      Seq(1, 2, 3).toDF("v")
    }
    val a = get()
    val b = get()
    assert(builds == 1, "second lookup must reuse, not rebuild")
    assert(a eq b, "memo must hand back the SAME persisted frame")
    assert(a.agg(sum("v")).collect()(0).getLong(0) == 6L)
    // a different dir key is a different entry
    SessionMemo("spec.buildOnce", spark, sf + "/other") {
      builds += 1; Seq(4).toDF("v")
    }
    assert(builds == 2)
  }

  test("invalidate(dir) drops only that dir; drain drops everything") {
    val ss = spark
    import ss.implicits._
    var builds = 0
    def get(d: String) = SessionMemo("spec.evict", spark, d) {
      builds += 1; Seq(1).toDF("v")
    }
    get("dirA"); get("dirB")
    assert(builds == 2)
    SessionMemo.invalidate("dirA")
    get("dirA") // rebuilt
    get("dirB") // still memoized
    assert(builds == 3, "invalidate must drop exactly the named dir")
    SessionMemo.drain()
    get("dirA"); get("dirB")
    assert(builds == 5, "drain must forget every entry")
    val cached = get("dirB")
    assert(cached.storageLevel.useMemory || cached.storageLevel.useDisk,
      "memoized frames must be persisted")
  }
}
