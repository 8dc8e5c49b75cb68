package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The `spark.sql.extensions=graft.GraftExtensions` deployment path:
  * a session built from config alone (no imperative register() calls)
  * must expose every custom SQL function, and the opt-in cartesian
  * guard must reject exactly the joins PlanHygieneSpec forbids. */
class GraftExtensionsSpec extends AnyFunSuite {

  /** New session on the shared context with the extensions applied via
    * `builder.withExtensions(new GraftExtensions)` — same injections as
    * the `spark.sql.extensions=graft.GraftExtensions` config string,
    * which is a STATIC conf Spark reads at SparkContext start and so
    * cannot be exercised on this JVM's shared test context. The shared
    * SparkSpec session is saved/restored so other suites never see a
    * swapped active session. */
  private def withExtSession[A](f: SparkSession => A): A = {
    val base = SparkSpec.spark // force-init the shared session first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .master("local[2]")
        .appName("graft-ext-test")
        .withExtensions(new GraftExtensions)
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      f(s)
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }

  test("config-injected session resolves every custom SQL function") {
    withExtSession { s =>
      assert(s.sql("SELECT dot_f(array(CAST(1 AS FLOAT), CAST(2 AS FLOAT)), " +
        "array(CAST(3 AS FLOAT), CAST(4 AS FLOAT)))").head.getDouble(0) == 11.0)
      assert(s.sql("SELECT jaro_winkler('martha', 'marhta')")
        .head.getDouble(0) > 0.95)
      assert(!s.sql("SELECT fingerprint64('abc')").head.isNullAt(0))
      // z_value(1, 1) interleaves to binary 11 = 3
      assert(s.sql("SELECT z_value(1, 1)").head.getLong(0) == 3L)
      assert(s.sql("SELECT winnow_stats('a b c d e f g h i j k l')")
        .head.schema.nonEmpty)
      // catalog-visible, not a temp function
      assert(s.catalog.functionExists("dot_f"))
    }
  }

  test("injected functions enforce arity at analysis time") {
    withExtSession { s =>
      val e = intercept[Exception](s.sql("SELECT dot_f(array(1.0F))").collect())
      assert(e.getMessage.contains("dot_f"), s"got: ${e.getMessage}")
    }
  }

  test("cartesian guard rejects big-both-sides cross joins when armed") {
    withExtSession { s =>
      val big = s.range(1000000).withColumn("pad",
        concat_ws("-", (0 to 8).map(i => col("id") * i): _*))
      // both sides must exceed the 10 MB broadcast threshold or the
      // join is a legitimate broadcast BNLJ the guard must allow
      val big2 = big.select(col("id").as("id2"), col("pad").as("pad2"))
      // disarmed (default): the plan is allowed to materialize
      assert(big.crossJoin(big2).queryExecution.executedPlan != null)
      s.conf.set("spark.graft.guard.cartesian", "true")
      try {
        val e = intercept[IllegalStateException] {
          big.crossJoin(big2).queryExecution.executedPlan
        }
        assert(e.getMessage.contains("cartesian guard"))
        // a broadcast-small side stays allowed: that is the q_join_cross
        // shape PlanHygieneSpec permits
        val tiny = s.range(5).select(col("id").as("id3"))
        assert(big.crossJoin(tiny).queryExecution.executedPlan != null)
      } finally s.conf.set("spark.graft.guard.cartesian", "false")
    }
  }

  test("guard stays armed when auto-broadcast is disabled (threshold -1)") {
    withExtSession { s =>
      val big = s.range(1000000).withColumn("pad",
        concat_ws("-", (0 to 8).map(i => col("id") * i): _*))
      val big2 = big.select(col("id").as("id2"), col("pad").as("pad2"))
      s.conf.set("spark.graft.guard.cartesian", "true")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        // sessions that disable auto-broadcast plan EVERY cross join as a
        // CartesianProduct — the armed guard must fall back to its fixed
        // 10 MB cutoff, not silently disarm
        val e = intercept[IllegalStateException] {
          big.crossJoin(big2).queryExecution.executedPlan
        }
        assert(e.getMessage.contains("cartesian guard"))
        // small-side cross joins stay allowed under the fallback cutoff
        val tiny = s.range(5).select(col("id").as("id3"))
        assert(big.crossJoin(tiny).queryExecution.executedPlan != null)
      } finally {
        s.conf.set("spark.graft.guard.cartesian", "false")
        s.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
    }
  }

  test("guard leaves conditioned and broadcast joins untouched") {
    withExtSession { s =>
      s.conf.set("spark.graft.guard.cartesian", "true")
      try {
        val a = s.range(100000).withColumn("k", col("id") % 100)
        val b = s.range(100000).withColumn("k", col("id") % 100)
        assert(a.join(b, "k").queryExecution.executedPlan != null)
      } finally s.conf.set("spark.graft.guard.cartesian", "false")
    }
  }

  // --------------------------------------- opt-in top-k rewrite rule

  import org.apache.spark.sql.expressions.Window

  private def rankFiltered(s: SparkSession) = {
    val df = s.range(0, 20000).select(
      (col("id") % 7).as("key"),
      (col("id") * 37 % 10007).as("v"),
      col("id").as("tie"))
    df.withColumn("rn", row_number().over(
        Window.partitionBy("key").orderBy(desc("v"), asc("tie"))))
      .filter(col("rn") <= 5)
  }

  test("topk rewrite replaces the rank-filter window with the native operator") {
    withExtSession { s =>
      // OFF (default): the window form plans as WindowExec
      val off = rankFiltered(s)
      val offPlan = off.queryExecution.executedPlan.toString
      assert(!offPlan.contains("TopKPerKey"), offPlan)
      val want = off.collect().map(_.toSeq).toSet
      s.conf.set("spark.graft.rewrite.topk", "true")
      try {
        val on = rankFiltered(s)
        val onPlan = on.queryExecution.executedPlan.toString
        assert(onPlan.contains("TopKPerKey"), onPlan)
        assert(!onPlan.contains("Window ["), onPlan)
        // value equivalence, including the rank column under its name
        assert(on.columns.contains("rn"))
        assert(on.collect().map(_.toSeq).toSet == want)
        // downstream references to the rank column still resolve
        val agg = rankFiltered(s).groupBy("key")
          .agg(sum("rn").as("srn")).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(agg.values.forall(_ == 15L), agg.toString) // 1+2+3+4+5
      } finally s.conf.set("spark.graft.rewrite.topk", "false")
    }
  }

  test("topk rewrite leaves non-matching window shapes alone") {
    withExtSession { s =>
      s.conf.set("spark.graft.rewrite.topk", "true")
      try {
        val df = s.range(0, 1000).select(
          (col("id") % 7).as("key"), col("id").as("v"), col("id").as("tie"))
        // ASC primary order: not the operator's contract
        val asc1 = df.withColumn("rn", row_number().over(
            Window.partitionBy("key").orderBy(asc("v"), asc("tie"))))
          .filter(col("rn") <= 3)
        assert(!asc1.queryExecution.executedPlan.toString.contains("TopKPerKey"))
        // global window (no partition keys): stays a window
        val global = df.withColumn("rn", row_number().over(
            Window.orderBy(desc("v"), asc("tie"))))
          .filter(col("rn") <= 3)
        assert(!global.queryExecution.executedPlan.toString.contains("TopKPerKey"))
        // rank() instead of row_number(): stays a window
        val rk = df.withColumn("rn", rank().over(
            Window.partitionBy("key").orderBy(desc("v"), asc("tie"))))
          .filter(col("rn") <= 3)
        assert(!rk.queryExecution.executedPlan.toString.contains("TopKPerKey"))
        // sibling window expression: stays a window
        val sib = df
          .withColumn("rn", row_number().over(
            Window.partitionBy("key").orderBy(desc("v"), asc("tie"))))
          .withColumn("lagv", lag("v", 1).over(
            Window.partitionBy("key").orderBy(desc("v"), asc("tie"))))
          .filter(col("rn") <= 3)
        assert(sib.collect().nonEmpty) // correctness regardless of plan
      } finally s.conf.set("spark.graft.rewrite.topk", "false")
    }
  }

  test("topk rewrite handles the strict < bound and skips k <= 0") {
    withExtSession { s =>
      s.conf.set("spark.graft.rewrite.topk", "true")
      try {
        val df = s.range(0, 1000).select(
          (col("id") % 7).as("key"), col("id").as("v"), col("id").as("tie"))
        def rn(cond: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
          df.withColumn("rn", row_number().over(
              Window.partitionBy("key").orderBy(desc("v"), asc("tie"))))
            .filter(cond(col("rn")))
        val strict = rn(_ < 4)
        assert(strict.queryExecution.executedPlan.toString.contains("TopKPerKey"))
        assert(strict.groupBy("key").count().collect().forall(_.getLong(1) == 3L))
        // rn < 1 selects nothing and must NOT become a k=0 operator
        val empty = rn(_ < 1)
        assert(!empty.queryExecution.executedPlan.toString.contains("TopKPerKey"))
        assert(empty.count() == 0)
      } finally s.conf.set("spark.graft.rewrite.topk", "false")
    }
  }

  test("topk rewrite normalizes long-literal and reversed rank bounds") {
    withExtSession { s =>
      s.conf.set("spark.graft.rewrite.topk", "true")
      try {
        val df = s.range(0, 1000).select(
          (col("id") % 7).as("key"), col("id").as("v"), col("id").as("tie"))
        def rn(cond: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
          df.withColumn("rn", row_number().over(
              Window.partitionBy("key").orderBy(desc("v"), asc("tie"))))
            .filter(cond(col("rn")))
        // long literal: rn <= 5L
        val longLit = rn(_ <= lit(5L))
        assert(longLit.queryExecution.executedPlan.toString.contains("TopKPerKey"),
          longLit.queryExecution.executedPlan.toString)
        assert(longLit.groupBy("key").count().collect().forall(_.getLong(1) == 5L))
        // reversed comparison: lit(4) >= rn
        val rev = rn(c => lit(4) >= c)
        assert(rev.queryExecution.executedPlan.toString.contains("TopKPerKey"),
          rev.queryExecution.executedPlan.toString)
        assert(rev.groupBy("key").count().collect().forall(_.getLong(1) == 4L))
        // reversed strict: lit(4) > rn means top 3
        val revStrict = rn(c => lit(4) > c)
        assert(revStrict.queryExecution.executedPlan.toString.contains("TopKPerKey"))
        assert(revStrict.groupBy("key").count().collect().forall(_.getLong(1) == 3L))
        // a long bound past Int.MaxValue stays a window (not a top-k)
        val huge = rn(_ <= lit(Int.MaxValue.toLong + 1))
        assert(!huge.queryExecution.executedPlan.toString.contains("TopKPerKey"))
        // large-NEGATIVE long bounds: v.toInt would wrap positive
        // (-4294967295L -> 1) and rewrite an always-false predicate
        // into a row-returning top-k — they must stay un-rewritten
        val negWrap = rn(_ <= lit(-4294967295L))
        assert(!negWrap.queryExecution.executedPlan.toString.contains("TopKPerKey"))
        assert(negWrap.count() == 0)
        // Int.MinValue long under strict <: the `.map(_ - 1)` would
        // underflow to Int.MaxValue — must also stay un-rewritten
        val minStrict = rn(_ < lit(Int.MinValue.toLong))
        assert(!minStrict.queryExecution.executedPlan.toString.contains("TopKPerKey"))
        assert(minStrict.count() == 0)
      } finally s.conf.set("spark.graft.rewrite.topk", "false")
    }
  }
}
