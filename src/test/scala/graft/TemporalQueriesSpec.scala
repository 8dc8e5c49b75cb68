package graft

import org.apache.spark.sql.functions._
import graft.queries.TemporalQueries

/** Temporal operators: grid completeness + fill semantics for the
  * resampler, version bookkeeping for the SCD2 merge. Exact values are
  * oracle-checked by the driver; these pin the structural invariants. */
class TemporalQueriesSpec extends SparkSpec {

  test("resample grid is complete: types × hours, no holes, fills flagged") {
    val out = TemporalQueries.queries("q_resample_fill")(spark, sf).cache()
    val types = out.select("event_type").distinct().count()
    val hours = out.select("h").distinct().count()
    assert(out.count() == types * hours, "grid must be the full cross product")
    // every gap row carries the last observed value (or null before
    // the first observation) — a filled row never introduces a value
    // absent from the raw hourly aggregate
    val filled = out.filter(col("filled") === 1).count()
    assert(filled > 0, "the fixture data has gaps; none were flagged")
    val nullFilled = out.filter(col("filled") === 1 && col("v_ff").isNull)
    nullFilled.collect() // leading-gap rows are legitimately null
    out.unpersist()
  }

  test("forward-fill carries the previous value, not a future one") {
    val out = TemporalQueries.queries("q_resample_fill")(spark, sf)
      .filter(col("event_type") === "click")
      .orderBy("h")
      .select("v_ff", "filled")
      .collect()
    var last: Option[Double] = None
    out.foreach { r =>
      val v = if (r.isNullAt(0)) None else Some(r.getDouble(0))
      if (r.getInt(1) == 1) {
        assert(v == last, s"filled row must repeat the previous value")
      }
      last = v
    }
  }

  test("scd2 merge versions updated keys and passes untouched keys through") {
    val out = TemporalQueries.queries("q_scd2_merge")(spark, sf).cache()
    val perKey = out.groupBy("c_custkey")
      .agg(count(lit(1)).as("n"),
        sum("is_current").as("n_current"),
        sum(when(col("valid_to").isNull, 1).otherwise(0)).as("n_open"))
    // exactly one current + one open-ended version per key, 1 or 2 rows
    assert(perKey.filter(col("n_current") =!= 1 || col("n_open") =!= 1)
      .count() == 0)
    assert(perKey.filter(col("n") < 1 || col("n") > 2).count() == 0)
    // a two-row key's old version closes exactly at the new version's start
    val bad = out.filter(col("is_current") === 0).as("o")
      .join(out.filter(col("is_current") === 1).as("c"), "c_custkey")
      .filter(col("o.valid_to") =!= col("c.valid_from"))
    assert(bad.count() == 0, "old version must close at the new valid_from")
    out.unpersist()
  }

  test("stl decomposition: multiplicative identity holds; seasonal centers on 1") {
    val got = TemporalQueries.queries("q_stl_decompose")(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (rev, trend, seasonal, resid) =
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      // rev = trend * seasonal * resid by construction, up to the three
      // independent roundings
      assert(math.abs(trend * seasonal * resid - rev) < rev * 1e-3 + 0.02,
        s"${r.getDate(0)}: $trend * $seasonal * $resid vs $rev")
      assert(seasonal > 0.5 && seasonal < 2.0, "sane multiplicative index")
    }
    val seasonals = got.map(r => (r.getDate(0).toLocalDate.getMonthValue,
      r.getDouble(3))).distinct
    val mean = seasonals.map(_._2).sum / seasonals.length
    assert(math.abs(mean - 1.0) < 0.1, s"seasonal indices center on 1: $mean")
  }

  test("time-decay attribution matches a sequential micro-weight recompute") {
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val firstBuy = evs.filter(_._2 == "purchase").groupBy(_._1)
      .map { case (u, es) => u -> es.map(_._3).min }
    val credits = evs
      .filter(e => Set("view", "click")(e._2))
      .flatMap { case (u, ch, t) =>
        firstBuy.get(u).filter(t < _).map { pt =>
          ch -> math.round(
            math.pow(2.0, -(pt - t) / (7.0 * 86400000000L)) * 1000000)
        }
      }
    val byCh = credits.groupBy(_._1)
      .map { case (ch, ws) => ch -> ((ws.length.toLong, ws.map(_._2).sum)) }
    val wtot = byCh.values.map(_._2).sum.toDouble
    val got = TemporalQueries.queries("q_attribution_decay")(spark, sf)
      .collect()
    assert(got.map(_.getString(0)).sorted.sameElements(
      byCh.keys.toArray.sorted))
    got.foreach { r =>
      val (n, wm) = byCh(r.getString(0))
      assert(r.getLong(1) == n)
      assert(math.abs(r.getDouble(2) - wm / 1e6) < 1e-4 + 1e-9)
      assert(math.abs(r.getDouble(3) - wm / wtot) < 1e-6 + 1e-9)
    }
    assert(math.abs(got.map(_.getDouble(3)).sum - 1.0) < 1e-5)
  }

  test("srm guardrail reproduces the goodness-of-fit arithmetic") {
    val users = Tables.events(spark, sf).select("user_id").distinct()
      .collect().map(_.getLong(0))
    val na = users.count(_ % 2 == 0).toLong
    val nb = users.count(_ % 2 == 1).toLong
    val got = graft.queries.StatQueries.queries("q_srm")(spark, sf)
      .collect()(0)
    assert(got.getLong(0) == na && got.getLong(1) == nb)
    val chi2 = (na - nb).toDouble * (na - nb) / (na + nb)
    assert(math.abs(got.getDouble(2) - chi2) < 1e-4 + 1e-9)
    assert(got.getBoolean(3) == chi2 > 3.841)
  }

  test("cohort ltv triangle matches a sequential recompute; cum is monotone") {
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        expr("unix_micros(ts) DIV 604800000000").as("wk"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val cohort = evs.groupBy(_._1).map { case (u, es) => u -> es.map(_._3).min }
    val cs = cohort.groupBy(_._2).map { case (w, m) => w -> m.size.toLong }
    val cells = evs.filter(_._2 == "purchase")
      .map(e => ((cohort(e._1), e._3 - cohort(e._1)),
        math.round(e._4 * 100)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    val got = TemporalQueries.queries("q_cohort_ltv")(spark, sf).collect()
    assert(got.length == cells.size)
    val byCohort = got.groupBy(_.getLong(0))
    byCohort.foreach { case (cwk, rows) =>
      var cum = 0L
      rows.sortBy(_.getLong(1)).foreach { r =>
        val cents = cells((cwk, r.getLong(1)))
        cum += cents
        assert(r.getLong(2) == cs(cwk))
        assert(math.abs(r.getDouble(3) - cents / 100.0) < 1e-6)
        assert(math.abs(r.getDouble(4) - cum / (cs(cwk) * 100.0)) < 1e-4)
      }
      val ltvs = rows.sortBy(_.getLong(1)).map(_.getDouble(4))
      assert(ltvs.zip(ltvs.tail).forall { case (a, b) => b >= a },
        "cumulative LTV is monotone")
    }
  }

  test("rolling slope matches a sequential 30-day OLS recompute") {
    val daily = Tables.orders(spark, sf)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("v"))
      .orderBy("day").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)))
    val got = TemporalQueries.queries("q_rolling_slope")(spark, sf).collect()
    assert(got.length == daily.length - 29)
    got.take(30).foreach { r =>
      val i = daily.indexWhere(_._1 == r.getDate(0).toString)
      val win = (i - 29 to i).map(j => ((j + 1).toLong, daily(j)._2))
      val n = 30L
      val st = win.map(_._1).sum; val sv = win.map(_._2).sum
      val stv = win.map { case (t, v) => BigInt(t) * v }.sum
      val stt = win.map(t => t._1 * t._1).sum
      val slope = (BigInt(n) * stv - BigInt(st) * sv).toDouble /
        ((n * stt - st * st) * 100L).toDouble
      assert(math.abs(r.getDouble(2) - slope) < 1e-6 + 1e-9, daily(i)._1)
    }
  }

  test("ses level equals the sequential smoothing recursion") {
    val daily = Tables.orders(spark, sf)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("v"))
      .orderBy("day").collect().map(_.getLong(1))
    // the definitional form the closed weighted sum must reproduce:
    // l_1 = y_1; l_t = alpha*y_t + (1-alpha)*l_{t-1}
    var l = daily.head / 100.0
    daily.tail.foreach(v => l = 0.3 * (v / 100.0) + 0.7 * l)
    val got = TemporalQueries.queries("q_ses_forecast")(spark, sf)
      .collect()(0)
    assert(got.getLong(0) == daily.length.toLong)
    assert(got.getDouble(1) == 0.3)
    assert(math.abs(got.getDouble(2) - l) < 1e-3 + 1e-9,
      s"closed-form level ${got.getDouble(2)} vs recursion $l")
  }

  test("holt-winters equals the sequential triple-smoothing recursion") {
    val daily = Tables.orders(spark, sf)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("v"))
      .orderBy("day").collect().map(_.getLong(1) / 100.0)
    val n = daily.length
    // the mirrored floor construction of the query (hwRnd/hwRnd4):
    // identical IEEE ops, not a library rounding mode
    def rnd(x: Double, sc: Int) = {
      val m = if (sc == 6) 1000000.0 else 10000.0
      math.floor(x * m + 0.5) / m
    }
    // seeds: explicit left-associated 7-term sums, like both engines
    val sum7a = daily.slice(0, 7).reduceLeft(_ + _)
    val sum7b = daily.slice(7, 14).reduceLeft(_ + _)
    var l = rnd(sum7a / 7.0, 6)
    var b = rnd((sum7b - sum7a) / 49.0, 6)
    var sidx = daily.slice(0, 7).map(y => rnd(y - l, 6)).toVector
    daily.drop(7).foreach { y =>
      val sOld = sidx.head
      val lNew = rnd(0.3 * (y - sOld) + 0.7 * (l + b), 6)
      val bNew = rnd(0.1 * (lNew - l) + 0.9 * b, 6)
      val sNew = rnd(0.2 * (y - lNew) + 0.8 * sOld, 6)
      l = lNew; b = bNew; sidx = sidx.tail :+ sNew
    }
    val got = TemporalQueries.queries("q_holt_winters")(spark, sf)
      .collect()(0)
    assert(got.getLong(0) == n.toLong)
    assert(got.getDouble(1) == 0.3 && got.getDouble(2) == 0.1
      && got.getDouble(3) == 0.2)
    assert(got.getDouble(4) == rnd(l, 4), s"level ${got.getDouble(4)} vs $l")
    assert(got.getDouble(5) == rnd(b, 4), s"trend ${got.getDouble(5)} vs $b")
    assert(got.getDouble(6) == rnd(l + b + sidx(0), 4), "fc_1d")
    assert(got.getDouble(7) == rnd(l + 7.0 * b + sidx(6), 4), "fc_7d")
    // definitional sanity: the one-step forecast sits within the
    // observed revenue range (a wildly diverging trend would not)
    assert(got.getDouble(6) > 0.0 && got.getDouble(6) < daily.max * 2)
  }

  test("grouped holt-winters equals the per-key sequential recursion") {
    // the query's mirrored floor construction (see hwRnd's midpoint note)
    def rnd(x: Double, sc: Int) = {
      val m = if (sc == 6) 1000000.0 else 10000.0
      math.floor(x * m + 0.5) / m
    }
    // per-nation daily series, recomputed independently of the query
    val byNation = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").as("nation"),
        to_date(col("o_orderdate")).as("day"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("v"))
      .collect()
      .map(r => (r.getInt(0), r.getDate(1).toString, r.getLong(2)))
      .groupBy(_._1)
      .map { case (k, rows) =>
        k -> rows.sortBy(_._2).map(_._3 / 100.0).toVector
      }
    val expected = byNation.collect { case (k, daily) if daily.length >= 14 =>
      val sum7a = daily.slice(0, 7).reduceLeft(_ + _)
      val sum7b = daily.slice(7, 14).reduceLeft(_ + _)
      var l = rnd(sum7a / 7.0, 6)
      var b = rnd((sum7b - sum7a) / 49.0, 6)
      var sidx = daily.slice(0, 7).map(y => rnd(y - l, 6)).toVector
      daily.drop(7).foreach { y =>
        val sOld = sidx.head
        val lNew = rnd(0.3 * (y - sOld) + 0.7 * (l + b), 6)
        val bNew = rnd(0.1 * (lNew - l) + 0.9 * b, 6)
        val sNew = rnd(0.2 * (y - lNew) + 0.8 * sOld, 6)
        l = lNew; b = bNew; sidx = sidx.tail :+ sNew
      }
      // emission grain is the state's own floor-6 (see the query's
      // midpoint note); l/b are already floor-6 state values
      k -> (daily.length.toLong, l, b,
        rnd(l + b + sidx(0), 6), rnd(l + 7.0 * b + sidx(6), 6))
    }
    val got = TemporalQueries.queries("q_holt_winters_grouped")(spark, sf)
      .collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(got.keySet == expected.keySet,
      s"key sets differ: ${got.keySet} vs ${expected.keySet}")
    expected.foreach { case (k, e) =>
      assert(got(k) == e, s"nation $k: ${got(k)} vs $e")
    }
    // every key with >= 14 grid days made it through (none silently
    // dropped by the fold), and keys are distinct rows
    assert(got.size == expected.size && got.nonEmpty)
  }

  test("interarrival matches a sequential per-user gap recompute") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val gaps = ev.groupBy(_._1).values.flatMap { es =>
      val sorted = es.sortBy(e => (e._2, e._3))
      sorted.zip(sorted.tail).map { case (a, b) => (b._4, b._2 - a._2) }
    }.toSeq
    val expected = gaps.groupBy(_._1).map { case (t, xs) =>
      val n = xs.length.toLong
      val sg = xs.map(x => BigInt(x._2)).sum
      val sgg = xs.map(x => BigInt(x._2) * x._2).sum
      val mean = sg.toDouble / n
      val sd = math.sqrt((BigInt(n) * sgg - sg * sg).toDouble /
        (n.toDouble * (n - 1)))
      t -> ((n, mean / 1e6, sd / 1e6, (sd - mean) / (sd + mean)))
    }
    val got = TemporalQueries.queries("q_interarrival")(spark, sf).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (n, mean, sd, b) = expected(r.getString(0))
      assert(r.getLong(1) == n, s"n at ${r.getString(0)}")
      assert(math.abs(r.getDouble(2) - mean) < 1e-3 + 1e-9)
      assert(math.abs(r.getDouble(3) - sd) < 1e-3 + 1e-9)
      assert(math.abs(r.getDouble(5) - b) < 1e-4 + 1e-9)
      // burstiness lives in (-1, 1) by construction
      assert(r.getDouble(5) > -1.0 && r.getDouble(5) < 1.0)
    }
  }

  test("gumbel fit matches a sequential moment recompute; levels ordered") {
    val daily = Tables.orders(spark, sf)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("v"))
      .collect().map(r => (r.getDate(0).toString.substring(0, 7), r.getLong(1)))
    val maxima = daily.groupBy(_._1).map(_._2.map(_._2).max).toSeq
    val n = maxima.length
    val sv = maxima.map(BigInt(_)).sum
    val svv = maxima.map(x => BigInt(x) * x).sum
    val mean = sv.toDouble / n
    val sd = math.sqrt((BigInt(n) * svv - sv * sv).toDouble /
      (n.toDouble * (n - 1)))
    val beta = sd * (math.sqrt(6.0) / math.Pi)
    val mu = mean - 0.5772156649 * beta
    val y12 = -math.log(-math.log(1.0 - 1.0 / 12.0))
    val r = TemporalQueries.queries("q_gumbel")(spark, sf).collect().head
    assert(r.getLong(0) == n)
    assert(math.abs(r.getDouble(1) - maxima.max / 100.0) < 1e-9)
    assert(math.abs(r.getDouble(2) - beta / 100.0) < 1e-2 + 1e-9)
    assert(math.abs(r.getDouble(3) - mu / 100.0) < 1e-2 + 1e-9)
    assert(math.abs(r.getDouble(4) - (mu + beta * y12) / 100.0)
      < 1e-2 + 1e-9)
    // longer horizons demand higher provisioning; 12-month level sits
    // above the location parameter (y12 > 0)
    assert(r.getDouble(5) > r.getDouble(4) && r.getDouble(4) > r.getDouble(3))
  }

  test("markov entropy matches a sequential transition recompute") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"),
        col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val trans = ev.groupBy(_._1).values.flatMap { es =>
      val s = es.sortBy(e => (e._2, e._3)).map(_._4)
      s.zip(s.tail)
    }.toSeq
    val nt = trans.length.toLong
    val byCell = trans.groupBy(identity).view.mapValues(_.length.toLong)
    val byState = trans.groupBy(_._1).view
      .mapValues(_.length.toLong).toMap
    val expected = byState.map { case (st, ni) =>
      val cells = byCell.filter(_._1._1 == st)
      val hms = cells.map { case (_, nij) =>
        math.round(-1e6 * (nij.toDouble / ni) *
          math.log(nij.toDouble / ni))
      }.sum
      val rms = cells.map { case (_, nij) =>
        math.round(-1e6 * (nij.toDouble / nt) *
          math.log(nij.toDouble / ni))
      }.sum
      st -> ((ni, ni.toDouble / nt, hms / 1e6, rms / 1e6))
    }
    val got = TemporalQueries.queries("q_markov_entropy")(spark, sf)
      .collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (ni, pi, h, rate) = expected(r.getString(0))
      assert(r.getLong(1) == ni, s"n_from at ${r.getString(0)}")
      assert(math.abs(r.getDouble(2) - pi) < 1e-6 + 1e-9)
      assert(math.abs(r.getDouble(3) - h) < 1e-6 + 1e-9)
      assert(math.abs(r.getDouble(4) - rate) < 1e-6 + 1e-9)
      assert(r.getDouble(3) >= 0.0, "conditional entropy is nonnegative")
    }
    // the rate decomposition: sum of state contributions is the
    // sequence's entropy rate, bounded by ln(#states)
    val rateSum = got.map(_.getDouble(4)).sum
    assert(rateSum >= 0.0 && rateSum <= math.log(expected.size.toDouble))
  }

  test("runs test matches a sequential sign-run recompute") {
    val daily = Tables.orders(spark, sf)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("v"))
      .collect().map(r => (r.getDate(0).toString, r.getLong(1)))
      .sortBy(_._1)
    val sorted = daily.map(_._2).sorted
    val n = sorted.length
    val med = (sorted((n + 1) / 2 - 1) + sorted(n / 2)) / 2.0
    val signs = daily.filter(_._2 != med).map(_._2 > med)
    val n1 = signs.count(identity).toLong
    val n2 = signs.count(!_).toLong
    val r = 1L + signs.zip(signs.tail).count { case (a, b) => a != b }
    val mean = 2.0 * n1 * n2 / (n1 + n2) + 1.0
    val vr = 2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2) /
      ((n1 + n2).toDouble * (n1 + n2) * (n1 + n2 - 1))
    val got = TemporalQueries.queries("q_runs_test")(spark, sf)
      .collect().head
    assert(got.getLong(0) == n1 && got.getLong(1) == n2)
    assert(got.getLong(2) == r, "run count")
    assert(math.abs(got.getDouble(3) - (r - mean) / math.sqrt(vr))
      < 1e-4 + 1e-9)
    assert(got.getBoolean(4) ==
      (math.abs((r - mean) / math.sqrt(vr)) > 1.96))
  }

  test("sax: 100 segments partition the days; symbols match the z cut") {
    val got = TemporalQueries.queries("q_sax")(spark, sf).collect()
    assert(got.length == math.min(100,
      got.map(_.getLong(1)).sum).toInt || got.length == 100)
    assert(got.map(_.getLong(0)).toSeq == (1L to got.length).toSeq)
    got.foreach { r =>
      val z = r.getDouble(2); val sym = r.getString(3)
      val expected =
        if (z < -0.6745) "a" else if (z < 0.0) "b"
        else if (z < 0.6745) "c" else "d"
      // paa_z is the rounded z; symbols can only disagree with the
      // recomputed cut within rounding distance of a breakpoint
      assert(sym == expected ||
        Seq(-0.6745, 0.0, 0.6745).exists(b => math.abs(z - b) < 1e-4),
        s"segment ${r.getLong(0)}: z=$z sym=$sym")
    }
    // z-normalized PAA means must straddle zero over the full series
    assert(got.exists(_.getDouble(2) < 0) && got.exists(_.getDouble(2) > 0))
  }

  test("haar energies match a sequential lifting; Parseval holds") {
    val v0 = Tables.orders(spark, sf)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("v"))
      .orderBy("day").collect().map(_.getLong(1)).take(2048)
    // at sf0.001 the order-day grid is shorter than 2048 — the lifting
    // is ragged there: a lone trailing element carries a = d = v, so
    // the per-level identity v^2 = (a^2 + d^2) / 2 still holds exactly
    var cur = v0
    val expected = (1 to 11).map { _ =>
      val pairs = cur.grouped(2).toArray
      val d = pairs.map(p => if (p.length == 2) p(0) - p(1) else p(0))
      cur = pairs.map(p => if (p.length == 2) p(0) + p(1) else p(0))
      (d.length.toLong, d.map(x => BigInt(x) * x).sum)
    }
    val got = TemporalQueries.queries("q_haar")(spark, sf).collect()
    assert(got.length == 11)
    got.zip(expected).zipWithIndex.foreach { case ((r, (nc, en)), i) =>
      assert(r.getInt(0) == i + 1 && r.getLong(1) == nc, s"level ${i + 1}")
      val e = en.toDouble / 1e8
      assert(math.abs(r.getDouble(2) - e) <= 1e-9 * e + 1e-4,
        s"energy at level ${i + 1}")
    }
    // Parseval for the unnormalized lifting, cleared of denominators:
    // 2^11 * sum(v^2) = sum_k E_k * 2^(11-k) + A^2
    val lhs = v0.map(x => BigInt(x) * x).sum * BigInt(2).pow(11)
    val rhs = expected.zipWithIndex.map { case ((_, e), i) =>
      e * BigInt(2).pow(11 - (i + 1))
    }.sum + BigInt(cur.head) * cur.head
    assert(cur.length == 1)
    assert(lhs == rhs, "exact Parseval identity")
  }

  test("rank turnover matches a sequential top-10 set comparison") {
    val mb = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf), col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .groupBy(trunc(to_date(col("o_orderdate")), "month").as("mth"),
        col("p_brand").as("brand"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("v"))
      .collect().map(r => (r.getDate(0).toLocalDate, r.getString(1),
        r.getLong(2)))
    val tops = mb.groupBy(_._1).view.mapValues { xs =>
      xs.sortBy(x => (-x._3, x._2)).take(10).map(_._2).toSet
    }.toMap
    val got = TemporalQueries.queries("q_rank_turnover")(spark, sf)
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val m = r.getDate(0).toLocalDate
      val cur = tops(m)
      val prev = tops.getOrElse(m.minusMonths(1), Set.empty[String])
      assert(prev.nonEmpty, s"emitted month $m must have a predecessor")
      val nc = cur.intersect(prev).size.toLong
      assert(r.getLong(1) == nc, s"common at $m")
      assert(r.getLong(2) == cur.size - nc, s"new at $m")
      assert(math.abs(r.getDouble(3) -
        nc.toDouble / (cur.size + prev.size - nc)) < 1e-4 + 1e-9)
    }
    // every month with a predecessor is emitted
    assert(got.length == tops.keys.count(m => tops.contains(m.minusMonths(1))))
  }

  test("weekday index matches a sequential recompute; indices average out") {
    val daily = Tables.orders(spark, sf)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("v"))
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    val byDow = daily.groupBy(_._1.getDayOfWeek.getValue % 7)
    val nt = daily.length.toLong
    val rt = daily.map(x => BigInt(x._2)).sum
    val got = TemporalQueries.queries("q_weekday_index")(spark, sf)
      .collect()
    assert(got.length == byDow.size)
    got.foreach { r =>
      val xs = byDow(r.getLong(0).toInt)
      val rev = xs.map(x => BigInt(x._2)).sum
      assert(r.getLong(1) == xs.length, s"days at dow ${r.getLong(0)}")
      val idx = (rev.toDouble / xs.length) / (rt.toDouble / nt)
      assert(math.abs(r.getDouble(3) - idx) < 1e-6 + 1e-9)
      assert(r.getDouble(3) > 0.0)
    }
    // the day-count-weighted mean index is exactly 1 by construction
    val wmean = got.map(r => r.getDouble(3) * r.getLong(1)).sum / nt
    assert(math.abs(wmean - 1.0) < 1e-5)
  }

  test("streak distribution matches a sequential gaps-and-islands pass") {
    val days = Tables.orders(spark, sf)
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("day"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val maxs = days.groupBy(_._1).values.map { xs =>
      val sorted = xs.map(_._2).sortBy(_.toEpochDay)
      var (best, cur) = (1L, 1L)
      sorted.zip(sorted.tail).foreach { case (a, b) =>
        cur = if (b.toEpochDay == a.toEpochDay + 1) cur + 1 else 1
        best = math.max(best, cur)
      }
      best
    }.toSeq
    val expected = maxs.groupBy(identity).view
      .mapValues(_.length.toLong).toMap
    val got = TemporalQueries.queries("q_streaks")(spark, sf).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      assert(expected(r.getLong(0)) == r.getLong(1),
        s"streak ${r.getLong(0)}")
    }
    // every customer appears in exactly one bucket
    assert(got.map(_.getLong(1)).sum == days.map(_._1).distinct.length)
  }

  test("ljung-box reproduces the portmanteau sum over the acf lags") {
    val acf = TemporalQueries.queries("q_acf")(spark, sf).collect()(0)
    val n = acf.getLong(0)
    val q = (1 to 7).map { k =>
      val r = acf.getDouble(k)
      r * r / (n - k)
    }.reduceLeft(_ + _) * n * (n + 2)
    val got = TemporalQueries.queries("q_ljung_box")(spark, sf).collect()(0)
    assert(got.getLong(0) == n)
    assert(math.abs(got.getDouble(1) - q) < 1e-4 + 1e-9,
      s"lb ${got.getDouble(1)} vs $q")
    assert(got.getLong(2) == 7L)
    assert(got.getBoolean(3) == (q > 14.067))
  }

  test("adstock matches a sequential 14-term unroll; carryover dominates") {
    val daily = Tables.orders(spark, sf)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("v"))
      .orderBy("day").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)))
    val lambdas = (0 until 14).map(k => math.pow(0.7, k))
    val got = TemporalQueries.queries("q_adstock")(spark, sf).collect()
    assert(got.length == daily.length - 13)
    got.foreach { r =>
      val i = daily.indexWhere(_._1 == r.getDate(0).toString)
      val ad = lambdas.zipWithIndex
        .map { case (l, k) => l * daily(i - k)._2 }
        .reduceLeft(_ + _)
      assert(math.abs(r.getDouble(2) - ad / 100.0) < 1e-3, daily(i)._1)
      assert(r.getDouble(2) >= r.getDouble(1) - 1e-9,
        "adstock includes today's revenue plus nonnegative carryover")
    }
  }

  test("binseg reproduces a sequential depth-1 segmentation") {
    val daily = Tables.orders(spark, sf)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("v"))
      .orderBy("day").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)))
    def argmax(seg: Array[(String, Long)]): (String, BigInt, Int) = {
      val n = seg.length
      val tot = seg.map(v => BigInt(v._2)).sum
      var cum = BigInt(0)
      seg.zipWithIndex.map { case ((day, v), i) =>
        cum += v
        (day, (cum * n - BigInt(i + 1) * tot).abs, i)
      }.maxBy(x => (x._2, -x._3.toLong))(
        Ordering.Tuple2(Ordering.BigInt, Ordering.Long))
    }
    val (d0, a0, i0) = argmax(daily)
    val (left, right) = daily.splitAt(i0 + 1)
    val got = TemporalQueriesSpecHelper.rows(
      TemporalQueries.queries("q_binseg")(spark, sf))
    assert(got.length == 3)
    assert((got(0)._1, got(0)._2, got(0)._3, got(0)._4)
      == ((0L, 0L, daily.length.toLong, d0)))
    assert(math.abs(got(0)._5
      - (BigDecimal(a0) / (daily.length * 100.0)).toDouble) < 0.01)
    Seq((1, left), (2, right)).foreach { case (idx, seg) =>
      val (dd, aa, _) = argmax(seg)
      val r = got(idx)
      assert(r._2 == (idx - 1).toLong && r._3 == seg.length.toLong)
      assert(r._4 == dd, s"segment ${idx - 1} changepoint")
      assert(math.abs(r._5 - (BigDecimal(aa) / (seg.length * 100.0)).toDouble)
        < 0.01, s"segment ${idx - 1} stat")
    }
  }

  // ---- round 12 operators ----

  private def dailySeries(): Array[(Long, Long)] =
    Tables.orders(spark, sf)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("cnt"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("v"))
      .orderBy("day").collect()
      .map(r => (r.getLong(1), r.getLong(2)))

  test("hurst R/S spectrum matches a sequential per-block recompute") {
    val v = dailySeries().map(_._2).take(2048)
    val got = TemporalQueries.queries("q_hurst_rs")(spark, sf).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    Seq(64, 128, 256, 512).foreach { m =>
      val blocks = v.grouped(m).filter(_.length == m).toArray
      val rs = blocks.flatMap { b =>
        val sm = b.map(BigInt(_)).sum
        val ssq = b.map(x => BigInt(x) * BigInt(x)).sum
        val den = ssq * m - sm * sm
        if (den <= 0) None
        else {
          var cum = BigInt(0); var mx = BigInt(0); var mn = BigInt(0)
          b.zipWithIndex.foreach { case (x, i) =>
            cum += x
            val dd = cum * m - sm * (i + 1)
            if (dd > mx) mx = dd
            if (dd < mn) mn = dd
          }
          Some(math.round(1e6 * (mx - mn).toDouble /
            math.sqrt(den.toDouble)))
        }
      }
      val (nb, mean) = got(m)
      assert(nb == rs.length.toLong, s"m=$m n_blocks")
      assert(math.abs(mean - rs.sum / (rs.length * 1e6)) < 1e-5,
        s"m=$m mean R/S")
      // long-memory sanity: R/S grows with the block size
      if (m > 64) assert(got(m)._2 > got(64)._2 * 0.5)
    }
  }

  test("ccf matches brute-force lagged Pearson at every lag") {
    val s = dailySeries()
    val got = TemporalQueries.queries("q_ccf")(spark, sf).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet == (-7 to 7).toSet)
    (-7 to 7).foreach { l =>
      val pairs = s.indices.flatMap { i =>
        val j = i + l
        if (j >= 0 && j < s.length) Some((s(i)._1.toDouble, s(j)._2.toDouble))
        else None
      }
      val n = pairs.length.toDouble
      val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
      val sxx = pairs.map(p => p._1 * p._1).sum
      val syy = pairs.map(p => p._2 * p._2).sum
      val sxy = pairs.map(p => p._1 * p._2).sum
      val r = (n * sxy - sx * sy) /
        (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
      assert(got(l)._1 == pairs.length.toLong, s"lag $l n")
      assert(math.abs(got(l)._2 - r) < 1e-4 + 1e-9, s"lag $l r")
    }
  }

  test("granger F and coefficients match a brute-force two-model OLS") {
    val s = dailySeries()
    // rows t = 2..n: y_t on (1, y_{t-1}, x_{t-1})
    val rows = (1 until s.length).map(i =>
      (s(i)._2.toDouble, s(i - 1)._2.toDouble, s(i - 1)._1.toDouble))
    val n = rows.length.toDouble
    def solve3(a: Array[Array[Double]], b: Array[Double]): Array[Double] = {
      // gaussian elimination, 3x3
      val m = a.map(_.clone)
      val x = b.clone
      for (p <- 0 until 3) {
        val piv = (p until 3).maxBy(r => math.abs(m(r)(p)))
        val (tm, tx) = (m(p), x(p)); m(p) = m(piv); x(p) = x(piv)
        m(piv) = tm; x(piv) = tx
        for (r <- p + 1 until 3) {
          val f = m(r)(p) / m(p)(p)
          for (c <- p until 3) m(r)(c) -= f * m(p)(c)
          x(r) -= f * x(p)
        }
      }
      val out = Array.fill(3)(0.0)
      for (r <- 2 to 0 by -1) {
        out(r) = (x(r) - (r + 1 until 3).map(c => m(r)(c) * out(c)).sum) /
          m(r)(r)
      }
      out
    }
    val sy = rows.map(_._1).sum; val syl = rows.map(_._2).sum
    val sxl = rows.map(_._3).sum
    val syl2 = rows.map(r => r._2 * r._2).sum
    val sxl2 = rows.map(r => r._3 * r._3).sum
    val sylxl = rows.map(r => r._2 * r._3).sum
    val syyl = rows.map(r => r._1 * r._2).sum
    val syxl = rows.map(r => r._1 * r._3).sum
    val bu = solve3(Array(
      Array(n, syl, sxl), Array(syl, syl2, sylxl),
      Array(sxl, sylxl, sxl2)), Array(sy, syyl, syxl))
    val rssU = rows.map { case (y, yl, xl) =>
      val e = y - (bu(0) + bu(1) * yl + bu(2) * xl); e * e
    }.sum
    val detr = n * syl2 - syl * syl
    val b0r = (sy * syl2 - syl * syyl) / detr
    val b1r = (n * syyl - syl * sy) / detr
    val rssR = rows.map { case (y, yl, _) =>
      val e = y - (b0r + b1r * yl); e * e
    }.sum
    val f = (rssR - rssU) / (rssU / (n - 3))
    val got = TemporalQueries.queries("q_granger")(spark, sf).collect()(0)
    assert(got.getLong(0) == rows.length.toLong)
    assert(math.abs(got.getDouble(1) - bu(1)) < 1e-4 + 1e-9, "b_y_lag")
    assert(math.abs(got.getDouble(2) - bu(2)) < math.abs(bu(2)) * 1e-3 + 1e-3,
      "b_x_lag")
    assert(math.abs(got.getDouble(3) - f) < math.abs(f) * 1e-2 + 1e-2,
      s"F ${got.getDouble(3)} vs brute $f")
  }

  test("engle-granger matches a brute-force two-step cointegration recompute") {
    val s = dailySeries()
    val n = s.length.toDouble
    val xs = s.map(_._1.toDouble); val ys = s.map(_._2.toDouble)
    val sx = xs.sum; val sy = ys.sum
    val sxx = xs.map(x => x * x).sum
    val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
    val b1 = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val b0 = (sy - b1 * sx) / n
    // residuals micro-rounded to integer cents, like the engine
    val e = xs.zip(ys).map { case (x, y) => math.round(y - (b0 + b1 * x)) }
    val pairs = e.zip(e.tail) // (e_{t-1}, e_t)
    val sll = pairs.map(p => BigInt(p._1) * p._1).sum
    val sld = pairs.map(p => BigInt(p._1) * (p._2 - p._1)).sum
    val sdd = pairs.map(p => BigInt(p._2 - p._1) * (p._2 - p._1)).sum
    val gam = sld.toDouble / sll.toDouble
    val rss = sdd.toDouble - sld.toDouble * sld.toDouble / sll.toDouble
    val t = gam / math.sqrt(rss / (pairs.length - 1) / sll.toDouble)
    val got = TemporalQueries.queries("q_engle_granger")(spark, sf)
      .collect()(0)
    assert(got.getLong(0) == s.length.toLong)
    assert(got.getLong(1) == pairs.length.toLong)
    assert(math.abs(got.getDouble(2) - b1) < math.abs(b1) * 1e-6 + 1e-6,
      "hedge ratio")
    assert(math.abs(got.getDouble(3) - gam) < 1e-4 + 1e-9, "gamma")
    assert(math.abs(got.getDouble(4) - t) < math.abs(t) * 1e-3 + 1e-3,
      s"ADF t ${got.getDouble(4)} vs brute $t")
    assert(got.getBoolean(5) == (t < -3.37))
    // OLS residuals of a stationary-vs-trend pair mean-revert hard:
    // gamma must be negative (Δe leans against e)
    assert(gam < 0.0, "residual changes must lean against the level")
  }

  test("adf-with-drift matches a brute-force centered-form recompute") {
    val v = dailySeries().map(_._2.toDouble)
    val pairs = (1 until v.length).map(i => (v(i - 1), v(i) - v(i - 1)))
    val n = pairs.length
    val lbar = pairs.map(_._1).sum / n
    val dbar = pairs.map(_._2).sum / n
    val sxx = pairs.map(p => (p._1 - lbar) * (p._1 - lbar)).sum
    val sxy = pairs.map(p => (p._1 - lbar) * (p._2 - dbar)).sum
    val gam = sxy / sxx
    val a = dbar - gam * lbar
    val rss = pairs.map { case (yl, dy) =>
      val e = dy - (a + gam * yl); e * e
    }.sum
    val t = gam / math.sqrt(rss / (n - 2) / sxx)
    val got = TemporalQueries.queries("q_adf_drift")(spark, sf).collect()(0)
    assert(got.getLong(0) == n.toLong)
    assert(math.abs(got.getDouble(1) - gam) < math.abs(gam) * 1e-4 + 1e-6)
    assert(math.abs(got.getDouble(2) - t) < math.abs(t) * 1e-3 + 1e-3,
      s"ADF t ${got.getDouble(2)} vs brute $t")
    assert(got.getBoolean(3) == (t < -2.86))
    // a near-random daily series is stationary around its mean: gamma
    // must lean hard negative (strong mean reversion day to day)
    assert(gam < 0.0)
  }

  test("durbin-watson matches a brute-force AR(1) residual recompute") {
    val s = dailySeries()
    val rows = (1 until s.length).map(i => (s(i)._2, s(i - 1)._2))
    val n = rows.length.toDouble
    val sy = rows.map(_._1.toDouble).sum; val syl = rows.map(_._2.toDouble).sum
    val syl2 = rows.map(r => r._2.toDouble * r._2).sum
    val syyl = rows.map(r => r._1.toDouble * r._2).sum
    val detr = n * syl2 - syl * syl
    val b0 = (sy * syl2 - syl * syyl) / detr
    val b1 = (n * syyl - syl * sy) / detr
    val e = rows.map { case (y, yl) => math.round(y - (b0 + b1 * yl)) }
    val se2 = e.map(x => BigInt(x) * BigInt(x)).sum
    val sd2 = e.zip(e.tail).map { case (a, b) =>
      BigInt(b - a) * BigInt(b - a)
    }.sum
    val dw = sd2.toDouble / se2.toDouble
    val got = TemporalQueries.queries("q_durbin_watson")(spark, sf)
      .collect()(0)
    assert(got.getLong(0) == rows.length.toLong)
    assert(math.abs(got.getDouble(1) - dw) < 1e-3 + 1e-9)
    assert(math.abs(got.getDouble(2) - (1.0 - dw / 2)) < 1e-3 + 1e-9)
    // a near-random daily series should show DW near 2
    assert(got.getDouble(1) > 1.0 && got.getDouble(1) < 3.0)
  }

  test("rolling correlation matches a brute-force 30-day window") {
    val s = dailySeries()
    val got = TemporalQueries.queries("q_rolling_corr")(spark, sf)
      .collect()
    assert(got.length == s.length - 29, "one row per full frame")
    // spot-check every 100th frame
    (29 until s.length by 100).foreach { i =>
      val fr = s.slice(i - 29, i + 1)
      val n = 30.0
      val x = fr.map(_._1.toDouble); val y = fr.map(_._2.toDouble)
      val (sx, sy) = (x.sum, y.sum)
      val sxx = x.map(v => v * v).sum; val syy = y.map(v => v * v).sum
      val sxy = x.zip(y).map { case (a, b) => a * b }.sum
      val r = (n * sxy - sx * sy) /
        (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
      assert(math.abs(got(i - 29).getDouble(1) - r) < 1e-4 + 1e-9,
        s"frame ending at index $i")
    }
    // rolling r is bounded
    assert(got.forall(r => r.getDouble(1) >= -1.0 && r.getDouble(1) <= 1.0))
  }

  // ---- round 13 operators ----

  private def datedDaily(): Array[(String, Long)] =
    Tables.orders(spark, sf)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("v"))
      .orderBy("day").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)))

  test("max drawdown matches a sequential equity-curve replay") {
    val rows = datedDaily()
    val n = rows.length
    val sv = rows.map(r => BigInt(r._2)).sum
    var cum = BigInt(0); var peak: BigInt = null
    var maxDd = BigInt(-1); var trough = ""
    var curRun = 0; var maxRun = 0
    rows.zipWithIndex.foreach { case ((day, v), i) =>
      cum += v
      val path = BigInt(n) * cum - BigInt(i + 1) * sv
      if (peak == null || path > peak) peak = path
      val dd = peak - path
      if (dd > maxDd) { maxDd = dd; trough = day }
      if (dd > 0) { curRun += 1; maxRun = math.max(maxRun, curRun) }
      else curRun = 0
    }
    val got = TemporalQueries.queries("q_drawdown")(spark, sf).collect()(0)
    assert(got.getLong(0) == n.toLong)
    assert(got.getDate(1).toString == trough, s"trough ${got.getDate(1)}")
    val wantUsd = (BigDecimal(maxDd) / (n * 100.0)).toDouble
    assert(math.abs(got.getDouble(2) - wantUsd) <
      math.abs(wantUsd) * 1e-9 + 1e-3, s"dd ${got.getDouble(2)} vs $wantUsd")
    assert(got.getLong(3) == maxRun.toLong,
      s"underwater ${got.getLong(3)} vs $maxRun")
  }

  test("bollinger breakout counts match a sequential exact-integer replay") {
    val v = datedDaily().map(_._2)
    var above = 0; var below = 0; var cnt = 0
    for (i <- 19 until v.length) {
      val fr = v.slice(i - 19, i + 1).map(BigInt(_))
      val s0 = fr.sum; val s2 = fr.map(x => x * x).sum
      val dev = BigInt(20) * v(i) - s0
      val rhs = BigInt(4) * (BigInt(20) * s2 - s0 * s0)
      cnt += 1
      if (dev > 0 && dev * dev > rhs) above += 1
      if (dev < 0 && dev * dev > rhs) below += 1
    }
    val got = TemporalQueries.queries("q_bollinger")(spark, sf).collect()(0)
    assert(got.getLong(0) == cnt.toLong)
    assert(got.getLong(1) == above.toLong, s"above ${got.getLong(1)} vs $above")
    assert(got.getLong(2) == below.toLong, s"below ${got.getLong(2)} vs $below")
    assert(math.abs(got.getDouble(3) - (above + below).toDouble / cnt) < 1e-6)
  }

  test("rsi regime counts match a sequential exact-ratio replay") {
    val v = datedDaily().map(_._2)
    val diffs = (1 until v.length).map(i => v(i) - v(i - 1)).toArray
    var ob = 0; var os = 0; var cnt = 0
    var lastG = 0L; var lastL = 0L
    for (i <- 13 until diffs.length) {
      val fr = diffs.slice(i - 13, i + 1)
      val g = fr.map(x => math.max(x, 0L)).sum
      val l = fr.map(x => math.max(-x, 0L)).sum
      cnt += 1
      if (3 * g >= 7 * l) ob += 1
      if (7 * g <= 3 * l) os += 1
      lastG = g; lastL = l
    }
    val want = if (lastG + lastL == 0) 50.0
      else 100.0 * lastG / (lastG + lastL)
    val got = TemporalQueries.queries("q_rsi")(spark, sf).collect()(0)
    assert(got.getLong(0) == cnt.toLong)
    assert(got.getLong(1) == ob.toLong, s"overbought ${got.getLong(1)} vs $ob")
    assert(got.getLong(2) == os.toLong, s"oversold ${got.getLong(2)} vs $os")
    assert(math.abs(got.getDouble(3) - want) < 1e-3 + 1e-9)
  }

  test("arch lm matches a sequential squared-residual lag regression") {
    val v = datedDaily().map(_._2)
    val pairs = (1 until v.length).map(i => (v(i), v(i - 1)))
    val n = pairs.length.toDouble
    val sy = pairs.map(_._1.toDouble).sum
    val syl = pairs.map(_._2.toDouble).sum
    val syl2 = pairs.map(p => p._2.toDouble * p._2).sum
    val syyl = pairs.map(p => p._1.toDouble * p._2).sum
    val b1 = (n * syyl - syl * sy) / (n * syl2 - syl * syl)
    val b0 = (sy * syl2 - syl * syyl) / (n * syl2 - syl * syl)
    // dollar-rounded residuals (the engine's DECIMAL-headroom grain)
    val e = pairs.map { case (y, yl) => math.round((y - (b0 + b1 * yl)) / 100) }
    val x2 = e.map(x => x.toDouble * x)
    val lp = (1 until x2.length).map(i => (x2(i), x2(i - 1)))
    val m = lp.length.toDouble
    val sx = lp.map(_._2).sum; val sy2 = lp.map(_._1).sum
    val sxx = lp.map(p => p._2 * p._2).sum
    val syy2 = lp.map(p => p._1 * p._1).sum
    val sxy = lp.map(p => p._1 * p._2).sum
    val num = m * sxy - sx * sy2
    val r2 = num * num / ((m * sxx - sx * sx) * (m * syy2 - sy2 * sy2))
    val got = TemporalQueries.queries("q_arch_lm")(spark, sf).collect()(0)
    assert(got.getLong(0) == lp.length.toLong)
    assert(math.abs(got.getDouble(1) - m * r2) < math.abs(m * r2) * 1e-3 + 1e-2,
      s"LM ${got.getDouble(1)} vs brute ${m * r2}")
    assert(got.getDouble(2) >= 0.0 && got.getDouble(2) <= 1.0)
  }

  test("pacf matches a sequential durbin–levinson recompute; pacf1 = acf1") {
    val rows = Tables.orders(spark, sf)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(round(sum("o_totalprice"), 2).as("v"))
      .orderBy("day").collect().map(_.getDouble(1))
    val m = rows.sum / rows.length
    val c = rows.map(_ - m)
    val c0 = c.map(x => x * x).sum
    def rho(k: Int): Double =
      (k until c.length).map(i => c(i) * c(i - k)).sum / c0
    val (r1, r2, r3) = (rho(1), rho(2), rho(3))
    val p2 = (r2 - r1 * r1) / (1.0 - r1 * r1)
    val p21 = r1 - p2 * r1
    val p3 = (r3 - p21 * r2 - p2 * r1) / (1.0 - p21 * r1 - p2 * r2)
    val got = TemporalQueries.queries("q_pacf")(spark, sf).collect()(0)
    assert(got.getLong(0) == rows.length.toLong)
    assert(math.abs(got.getDouble(1) - r1) < 1e-4 + 1e-9)
    assert(math.abs(got.getDouble(2) - p2) < 1e-4 + 1e-9)
    assert(math.abs(got.getDouble(3) - p3) < 1e-4 + 1e-9)
  }

  test("seasonal strength matches a sequential STL-ratio replay; in [0,1]") {
    val ms = Tables.orders(spark, sf)
      .groupBy(trunc(col("o_orderdate"), "month").as("month"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("v"))
      .orderBy("month").collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // centered 2x12 MA: num = 2*sum(v[-5..+5]) + v[-6] + v[+6]
    val rrs = (6 until ms.length - 6).map { i =>
      val num = 2L * (i - 5 to i + 5).map(j => ms(j)._2).sum +
        ms(i - 6)._2 + ms(i + 6)._2
      (ms(i)._1.getMonthValue, r6(ms(i)._2 * 24 / num.toDouble))
    }
    val seasonal = rrs.groupBy(_._1).map { case (moy, xs) =>
      moy -> r6(xs.map(_._2).sum / xs.length)
    }
    val resid = rrs.map { case (moy, rr) => r6(rr / seasonal(moy)) }
    def varPop(xs: Seq[Double]) = {
      val mu = xs.sum / xs.length
      xs.map(x => (x - mu) * (x - mu)).sum / xs.length
    }
    val vd = varPop(rrs.map(_._2)); val vr = varPop(resid)
    val strength = math.max(0.0, 1.0 - vr / vd)
    val got = TemporalQueries.queries("q_seasonal_strength")(spark, sf)
      .collect()(0)
    assert(got.getLong(0) == rrs.length.toLong)
    assert(math.abs(got.getDouble(1) - vd) < 1e-6 + 1e-9)
    assert(math.abs(got.getDouble(2) - vr) < 1e-6 + 1e-9)
    assert(math.abs(got.getDouble(3) - strength) < 1e-3 + 1e-9,
      s"F_s ${got.getDouble(3)} vs brute $strength")
    assert(got.getDouble(3) >= 0.0 && got.getDouble(3) <= 1.0)
  }

  test("control chart ooc counts and worst day match an exact replay") {
    val rows = Tables.orders(spark, sf)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getDate(0).toString, r.getLong(1)))
      .sortBy(_._1)
    val n = rows.length.toLong
    val sc = rows.map(_._2).sum
    var hi = 0L; var lo = 0L
    var mx = BigInt(-1); var worst = ("", 0L)
    rows.foreach { case (day, c) =>
      val dev = BigInt(n) * c - sc
      val dev2 = dev * dev
      val lim = BigInt(9) * n * sc
      if (dev > 0 && dev2 > lim) hi += 1
      if (dev < 0 && dev2 > lim) lo += 1
      if (dev2 > mx) { mx = dev2; worst = (day, c) }
    }
    val got = TemporalQueries.queries("q_control_chart")(spark, sf)
      .collect()(0)
    assert(got.getLong(0) == n)
    assert(got.getLong(1) == hi && got.getLong(2) == lo,
      s"ooc ${got.getLong(1)}/${got.getLong(2)} vs $hi/$lo")
    assert(math.abs(got.getDouble(3) - sc.toDouble / n) < 1e-6)
    assert(got.getDate(4).toString == worst._1)
    assert(got.getLong(5) == worst._2)
  }
}

private object TemporalQueriesSpecHelper {
  def rows(df: org.apache.spark.sql.DataFrame)
      : Array[(Long, Long, Long, String, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getDate(3).toString, r.getDouble(4)))
}
