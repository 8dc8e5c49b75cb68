package graft

import org.apache.spark.sql.functions._
import graft.queries.InsightQueries

/** Round-10 analytics operators. Exact values are oracle-checked by
  * the driver's DuckDB gate; these specs pin the structural invariants
  * and — for every operator whose naive form is collectable at
  * sf0.001 — cross-check the distributed plan against an independent
  * sequential brute-force reimplementation. */
class InsightSpec extends SparkSpec {

  private def q(name: String) = InsightQueries.queries(name)(spark, sf)

  private def haversine(lat1: Double, lon1: Double,
      lat2: Double, lon2: Double): Double = {
    val dLat = math.toRadians(lat2 - lat1) / 2
    val dLon = math.toRadians(lon2 - lon1) / 2
    val a = math.pow(math.sin(dLat), 2) +
      math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
        math.pow(math.sin(dLon), 2)
    2 * 6371.0 * math.asin(math.sqrt(a))
  }

  private def latOf(k: Long, m: Int): Double = (k * m % 1200) / 10.0 - 60.0
  private def lonOf(k: Long, m: Int): Double = (k * m % 3600) / 10.0 - 180.0

  test("geo knn: 100 rows, nondecreasing distance, matches brute force") {
    val got = q("q_geo_knn").collect()
    assert(got.length == 100)
    val dists = got.map(_.getDouble(3))
    assert(dists.sameElements(dists.sorted), "distance must be nondecreasing")
    val keys = Tables.customer(spark, sf).select("c_custkey")
      .collect().map(_.getLong(0))
    val brute = keys
      .map { k =>
        (k, BigDecimal(haversine(latOf(k, 37), lonOf(k, 73), 48.85, 2.35))
          .setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      .sortBy { case (k, d) => (d, k) }.take(100)
    assert(got.map(r => (r.getLong(0), r.getDouble(3))).toSeq == brute.toSeq)
  }

  test("geo radius join: grid-stencil candidates reproduce the cross join") {
    val got = q("q_geo_radius_join").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val sup = Tables.supplier(spark, sf).select("s_suppkey")
      .collect().map(_.getLong(0))
    val cust = Tables.customer(spark, sf).select("c_custkey")
      .collect().map(_.getLong(0))
    // mirror the engine's protocol exactly: membership and min run on
    // the 6-dp ROUNDED distance, the reported nearest re-rounds at 3
    def r6(d: Double) =
      BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val brute = sup.flatMap { sk =>
      val ds = cust.map(ck => r6(haversine(latOf(ck, 37), lonOf(ck, 73),
        latOf(sk, 53), lonOf(sk, 97)))).filter(_ <= 50.0)
      if (ds.isEmpty) None
      else Some((sk, ds.length.toLong,
        BigDecimal(ds.min).setScale(3, BigDecimal.RoundingMode.HALF_UP)
          .toDouble))
    }.sortBy(_._1).toSeq
    assert(brute.nonEmpty, "fixture must produce at least one in-radius pair")
    assert(got == brute,
      "the 9-cell grid stencil must find exactly the cross-join's pairs")
  }

  test("assoc rules: counts and lift match a sequential reimplementation") {
    val items = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf), col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("p_brand")).distinct()
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val nOrders = items.map(_._1).distinct.length
    val supp = items.groupBy(_._2).map { case (b, xs) => b -> xs.length }
    val baskets = items.groupBy(_._1).values.map(_.map(_._2).sorted)
    val pairCount = baskets.toSeq
      .flatMap(b => for (i <- b.indices; j <- i + 1 until b.length)
        yield (b(i), b(j)))
      .groupBy(identity).map { case (p, xs) => p -> xs.length }
      .filter(_._2 >= 10)
    val got = q("q_assoc_rules").collect()
    assert(got.length == pairCount.size)
    got.foreach { r =>
      val (a, b, n) = (r.getString(0), r.getString(1), r.getLong(2))
      assert(pairCount((a, b)) == n, s"pair ($a,$b)")
      val lift = n.toDouble * nOrders / (supp(a).toDouble * supp(b))
      assert(math.abs(r.getDouble(5) - lift) < 1e-4, s"lift ($a,$b)")
    }
  }

  test("kaplan-meier: survival from a sequential estimator, monotone") {
    val lifetimes = Tables.orders(spark, sf)
      .groupBy("o_custkey")
      .agg(datediff(max("o_orderdate"), min("o_orderdate")).as("dur"),
        (max("o_orderdate") < lit("2001-01-01").cast("date"))
          .cast("long").as("event"))
      .collect().map(r => (r.getInt(1), r.getLong(2)))
    val byDur = lifetimes.groupBy(_._1).toSeq.sortBy(_._1)
    var atRisk = lifetimes.length.toLong
    var s = 1.0
    val expected = byDur.flatMap { case (dur, xs) =>
      val deaths = xs.map(_._2).sum
      val row = if (deaths > 0) {
        s *= 1.0 - deaths.toDouble / atRisk
        Some((dur, deaths, atRisk, s))
      } else None
      atRisk -= xs.length
      row
    }
    val got = q("q_kaplan_meier").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.length == expected.length)
    got.zip(expected).foreach { case ((d1, k1, n1, s1), (d2, k2, n2, s2)) =>
      assert(d1 == d2 && k1 == k2 && n1 == n2, s"row at dur=$d2")
      assert(math.abs(s1 - s2) < 1e-6, s"survival at dur=$d2")
    }
    val curve = got.map(_._4)
    assert(curve.zip(curve.tail).forall { case (a, b) => b <= a + 1e-12 },
      "survival must be nonincreasing")
  }

  test("confusion: counts match brute force, metrics coherent") {
    val rows = Tables.orders(spark, sf)
      .select("o_orderkey", "o_totalprice").collect()
      .map(r => (r.getDouble(1), r.getLong(0) % 2 == 1))
    val got = InsightQueries.queries("q_confusion")(spark, sf).collect()
    assert(got.length == 3)
    got.foreach { r =>
      val th = r.getDouble(0)
      val tp = rows.count { case (sc, y) => sc >= th && y }
      val fp = rows.count { case (sc, y) => sc >= th && !y }
      val fn = rows.count { case (sc, y) => sc < th && y }
      val tn = rows.count { case (sc, y) => sc < th && !y }
      assert(r.getLong(1) == tp && r.getLong(2) == fp
        && r.getLong(3) == fn && r.getLong(4) == tn, s"counts at $th")
      assert(r.getLong(1) + r.getLong(2) + r.getLong(3) + r.getLong(4)
        == rows.length)
      val f1 = 2.0 * tp / (2.0 * tp + fp + fn)
      assert(math.abs(r.getDouble(7) - f1) < 1e-6, s"f1 at $th")
      assert(r.getDouble(9) >= -1.0 - 1e-9 && r.getDouble(9) <= 1.0 + 1e-9)
    }
    // raising the threshold can only shrink the predicted-positive set
    val tps = got.sortBy(_.getDouble(0)).map(_.getLong(1))
    assert(tps.zip(tps.tail).forall { case (a, b) => b <= a })
  }

  test("nelson-aalen: hazard from a sequential estimator, bounds KM") {
    val lifetimes = Tables.orders(spark, sf)
      .groupBy("o_custkey")
      .agg(datediff(max("o_orderdate"), min("o_orderdate")).as("dur"),
        (max("o_orderdate") < lit("2001-01-01").cast("date"))
          .cast("long").as("event"))
      .collect().map(r => (r.getInt(1), r.getLong(2)))
    val byDur = lifetimes.groupBy(_._1).toSeq.sortBy(_._1)
    var atRisk = lifetimes.length.toLong
    var cumMicro = 0L
    val expected = byDur.flatMap { case (dur, xs) =>
      val deaths = xs.map(_._2).sum
      val row = if (deaths > 0) {
        cumMicro += math.round(1000000.0 * deaths / atRisk)
        Some((dur, deaths, atRisk, cumMicro / 1000000.0))
      } else None
      atRisk -= xs.length
      row
    }
    val got = q("q_nelson_aalen").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    assert(got.length == expected.length)
    got.zip(expected).foreach { case ((d1, k1, n1, h1, _), (d2, k2, n2, h2)) =>
      assert(d1 == d2 && k1 == k2 && n1 == n2, s"row at dur=$d2")
      assert(math.abs(h1 - h2) < 1e-6, s"hazard at dur=$d2")
    }
    val hz = got.map(_._4)
    assert(hz.zip(hz.tail).forall { case (a, b) => b >= a - 1e-12 },
      "cumulative hazard must be nondecreasing")
    // exp(-d/n) >= 1 - d/n, so the Breslow curve dominates KM everywhere
    val km = q("q_kaplan_meier").collect().map(r => r.getDouble(3))
    got.map(_._5).zip(km).foreach { case (b, k) =>
      assert(b >= k - 1e-6, "Breslow survival must dominate KM")
    }
  }

  test("hhi: matches a sequential share-squared pass, sane bounds") {
    val rows = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"), col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("r"))
      .collect().map(r => (r.getInt(0), r.getLong(2)))
    val expected = rows.groupBy(_._1).map { case (nk, xs) =>
      val tot = xs.map(_._2).sum
      val sm = xs.map { case (_, r) =>
        math.round(1.0e8 * (r.toDouble / tot) * (r.toDouble / tot))
      }.sum
      nk -> (xs.length.toLong, sm / 10000.0, 1.0e8 / sm)
    }
    val got = q("q_hhi").collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (n, hhi, neff) = expected(r.getInt(0))
      assert(r.getLong(1) == n)
      assert(math.abs(r.getDouble(3) - hhi) < 1e-4, s"hhi n=${r.getInt(0)}")
      assert(math.abs(r.getDouble(4) - neff) < 1e-3, s"neff n=${r.getInt(0)}")
      assert(r.getDouble(3) > 0 && r.getDouble(3) <= 10000.0)
      assert(r.getDouble(4) >= 1.0 - 1e-9 && r.getDouble(4) <= n + 1e-6)
    }
  }

  test("lorenz deciles match brute force; curve sits under the diagonal") {
    val rev = Tables.orders(spark, sf)
      .groupBy("o_custkey")
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("r"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (k, r) => (r, k) }
    val n = rev.length; val total = rev.map(_._2).sum
    val byDecile = rev.zipWithIndex
      .groupBy { case (_, i) => i.toLong * 10 / n + 1 }
    val got = InsightQueries.queries("q_lorenz")(spark, sf).collect()
    assert(got.length == byDecile.size)
    var (cp, cr) = (0L, 0L)
    got.foreach { r =>
      val d = r.getLong(0)
      val xs = byDecile(d)
      cp += xs.length; cr += xs.map(_._1._2).sum
      assert(r.getLong(1) == xs.length, s"pop at decile $d")
      assert(math.abs(r.getDouble(3) - cp.toDouble / n) < 1e-6 + 1e-9)
      assert(math.abs(r.getDouble(4) - cr.toDouble / total) < 1e-6 + 1e-9)
      // ascending-revenue deciles: cumulative revenue share can never
      // exceed cumulative population share
      assert(r.getDouble(4) <= r.getDouble(3) + 1e-9, s"diagonal at $d")
    }
    assert(math.abs(got.last.getDouble(3) - 1.0) < 1e-9)
    assert(math.abs(got.last.getDouble(4) - 1.0) < 1e-9)
  }

  test("hill numbers match brute force and obey D0 >= D1 >= D2") {
    val rows = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf), col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"), col("p_brand"))
      .agg(count(lit(1)).as("nb"))
      .collect().map(r => (r.getInt(0), r.getLong(2)))
    val expected = rows.groupBy(_._1).map { case (nk, xs) =>
      val nt = xs.map(_._2).sum
      val hms = xs.map { case (_, nb) =>
        math.round(-1e6 * (nb.toDouble / nt) * math.log(nb.toDouble / nt))
      }.sum
      val sms = xs.map { case (_, nb) =>
        math.round(1e8 * (nb.toDouble / nt) * (nb.toDouble / nt))
      }.sum
      nk -> ((nt, xs.length.toLong, math.exp(hms / 1e6), 1e8 / sms))
    }
    val got = InsightQueries.queries("q_hill_diversity")(spark, sf)
      .collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (nt, d0, d1, d2) = expected(r.getInt(0))
      assert(r.getLong(1) == nt && r.getLong(2) == d0)
      assert(math.abs(r.getDouble(3) - d1) < 1e-3 + 1e-6 * d1)
      assert(math.abs(r.getDouble(4) - d2) < 1e-3 + 1e-6 * d2)
      // the Hill ordering: richness >= exp(Shannon) >= inverse Simpson
      assert(r.getLong(2) >= r.getDouble(3) - 1e-3)
      assert(r.getDouble(3) >= r.getDouble(4) - 1e-3)
    }
  }

  test("gini: matches the sequential rank formula, in [0, 1)") {
    val rev = Tables.orders(spark, sf)
      .groupBy("o_custkey").agg(round(sum("o_totalprice"), 2).as("r"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy { case (k, r) => (r, k) }
    val n = rev.length
    val total = rev.map(_._2).sum
    val expected = 2.0 * rev.zipWithIndex
      .map { case ((_, r), i) => (i + 1) * r }.sum / (n * total) -
      (n + 1.0) / n
    val row = q("q_gini").collect().head
    assert(row.getLong(0) == n)
    assert(math.abs(row.getDouble(2) - expected) < 1e-6)
    assert(row.getDouble(2) >= 0.0 && row.getDouble(2) < 1.0)
  }

  test("chi-square: statistic matches the sequential contingency pass") {
    val cells = Tables.orders(spark, sf)
      .groupBy("o_orderpriority", "o_orderstatus").count()
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
    val n = cells.map(_._2).sum.toDouble
    val rt = cells.groupBy(_._1._1).map { case (k, xs) => k -> xs.map(_._2).sum }
    val ct = cells.groupBy(_._1._2).map { case (k, xs) => k -> xs.map(_._2).sum }
    val chi2 = cells.map { case ((p, st), obs) =>
      val e = rt(p) * ct(st) / n
      (obs - e) * (obs - e) / e
    }.sum
    val dof = (rt.size - 1) * (ct.size - 1)
    val row = q("q_chi_square").collect().head
    assert(math.abs(row.getDouble(0) - chi2) < 1e-4)
    assert(row.getLong(1) == dof)
    assert(row.getLong(2) == n.toLong)
    val v = math.sqrt(chi2 / (n * math.min(rt.size - 1, ct.size - 1)))
    assert(math.abs(row.getDouble(3) - v) < 1e-6)
  }

  test("seasonal-naive: every yhat is the actual from 12 months before") {
    val out = q("q_forecast_snaive").collect()
      .map(r => (r.getDate(0).toString, r.getDouble(1), r.getDouble(2)))
    assert(out.nonEmpty)
    val actualByMonth = out.map(r => r._1 -> r._2).toMap
    // rows whose lag-12 month is itself in the output must agree
    var checked = 0
    out.foreach { case (m, _, yhat) =>
      val lagM = java.time.LocalDate.parse(m).minusMonths(12).toString
      actualByMonth.get(lagM).foreach { a =>
        assert(math.abs(yhat - a) < 1e-9, s"yhat at $m must equal actual at $lagM")
        checked += 1
      }
    }
    assert(checked > 0)
  }

  test("inverted index: df counts the full set, postings capped and sorted") {
    val got = q("q_inverted_index").collect()
    val brute = Tables.documents(spark, sf)
      .select(col("doc_id"),
        explode(split(lower(col("text")), "[^a-z]+")).as("term"))
      .filter(length(col("term")) >= 4).distinct()
      .collect().map(r => (r.getString(1), r.getLong(0)))
      .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).sorted }
    assert(got.length == math.min(50, brute.size),
      "top-k must cover min(50, vocabulary) terms")
    got.foreach { r =>
      val (term, df, postings) = (r.getString(0), r.getLong(1), r.getString(2))
      val docs = brute(term)
      assert(df == docs.length, s"df($term)")
      val ids = postings.split(",").map(_.toLong)
      assert(ids.sameElements(docs.take(100)),
        s"postings($term) must be the first 100 sorted doc ids")
    }
    val dfs = got.map(_.getLong(1))
    assert(dfs.sameElements(dfs.sorted.reverse), "ordered by df desc")
  }

  test("recommender: top-3 matches a sequential item-CF scorer") {
    val itemRows = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf), col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("p_brand")).distinct()
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val supp = itemRows.groupBy(_._2).map { case (b, xs) => b -> xs.length }
    val baskets = itemRows.groupBy(_._1).values.map(_.map(_._2).sorted)
    val nab = baskets.toSeq
      .flatMap(b => for (i <- b.indices; j <- i + 1 until b.length)
        yield (b(i), b(j)))
      .groupBy(identity).map { case (p, xs) => p -> xs.length }
      .filter(_._2 >= 5)
    val sim = nab.toSeq.flatMap { case ((a, b), n) =>
      val c = n / math.sqrt(supp(a).toDouble * supp(b))
      Seq((a, b, c), (b, a, c))
    }.groupBy(_._1).map { case (a, xs) =>
      a -> xs.map(x => (x._2, x._3))
    }
    val ub = Tables.orders(spark, sf)
      .join(Tables.lineitem(spark, sf), col("o_orderkey") === col("l_orderkey"))
      .join(Tables.part(spark, sf), col("l_partkey") === col("p_partkey"))
      .select(col("o_custkey"), col("p_brand")).distinct()
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val owned = ub.groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2).toSet }
    val want = owned.toSeq.flatMap { case (cust, items) =>
      val scores = items.toSeq.flatMap(i => sim.getOrElse(i, Nil))
        .groupBy(_._1).map { case (cand, xs) =>
          cand -> BigDecimal(xs.map(_._2).sum)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        }
        .filter { case (cand, _) => !items(cand) }
      scores.toSeq.sortBy { case (cand, sc) => (-sc, cand) }.take(3)
        .zipWithIndex.map { case ((cand, sc), i) => (cust, cand, sc, i + 1) }
    }.toSet
    val got = q("q_recommend_brands").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getInt(3)))
      .toSet
    assert(got == want,
      s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
  }

  test("seasonal index: 12 groups, indices average to 1, matches brute") {
    val got = q("q_seasonal_index").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.map(_._1).toSeq == (1 to 12),
      "every month-of-year must appear exactly once, ordered")
    val meanIdx = got.map(_._4).sum / got.length
    assert(math.abs(meanIdx - 1.0) < 1e-4, s"indices must center on 1, got $meanIdx")
    val monthly = Tables.orders(spark, sf)
      .groupBy(trunc(col("o_orderdate"), "month").as("mon"))
      .agg(round(sum("o_totalprice"), 2).as("v"))
      .collect().map(r => (r.getDate(0).toLocalDate.getMonthValue, r.getDouble(1)))
    val byMo = monthly.groupBy(_._1).map { case (mo, xs) =>
      mo -> (xs.length.toLong, xs.map(_._2).sum / xs.length)
    }
    val grand = byMo.values.map(_._2).sum / byMo.size
    got.foreach { case (mo, n, _, idx) =>
      assert(byMo(mo)._1 == n, s"n_months($mo)")
      assert(math.abs(idx - byMo(mo)._2 / grand) < 1e-5, s"idx($mo)")
    }
  }

  test("ab test: Welch z matches a sequential two-sample computation") {
    val perUser = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .groupBy("user_id").agg(round(sum("value"), 4).as("m"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val (g1, g0) = perUser.partition(_._1 % 2 == 1)
    def stats(xs: Array[(Long, Double)]): (Long, Double, Double) = {
      val v = xs.map(_._2); val n = v.length
      val mean = v.sum / n
      val varS = v.map(x => (x - mean) * (x - mean)).sum / (n - 1)
      (n.toLong, mean, varS)
    }
    val (n0, m0, v0) = stats(g0); val (n1, m1, v1) = stats(g1)
    val z = (m1 - m0) / math.sqrt(v0 / n0 + v1 / n1)
    val row = q("q_ab_test").collect().head
    assert(row.getLong(0) == n0 && row.getLong(1) == n1)
    assert(math.abs(row.getDouble(2) - m0) < 1e-3)
    assert(math.abs(row.getDouble(3) - m1) < 1e-3)
    assert(math.abs(row.getDouble(4) - z) < 1e-3, s"welch_z got=${row.getDouble(4)} want=$z")
    assert(row.getBoolean(5) == (math.abs(z) > 1.96))
  }

  test("cuped: theta and variance reduction match the closed form") {
    val split = java.sql.Timestamp.valueOf("2024-01-16 00:00:00")
    val perUser = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(
        round(sum(when(col("ts") < lit(split), col("value")).otherwise(0.0)), 4).as("pre"),
        round(sum(when(col("ts") >= lit(split), col("value")).otherwise(0.0)), 4).as("post"))
      .collect().map(r => (r.getDouble(1), r.getDouble(2)))
    val n = perUser.length
    val mPre = perUser.map(_._1).sum / n
    val mPost = perUser.map(_._2).sum / n
    val varPre = perUser.map(p => (p._1 - mPre) * (p._1 - mPre)).sum / n
    val varPost = perUser.map(p => (p._2 - mPost) * (p._2 - mPost)).sum / n
    val cov = perUser.map(p => (p._1 - mPre) * (p._2 - mPost)).sum / n
    val theta = cov / varPre
    val varAdj = varPost - theta * theta * varPre
    val row = q("q_cuped").collect().head
    assert(row.getLong(0) == n)
    assert(math.abs(row.getDouble(1) - theta) < 1e-4, "theta")
    assert(math.abs(row.getDouble(3) - varAdj) < 1e-2, "var_adj")
    assert(row.getDouble(4) >= 0.0 && row.getDouble(4) <= 1.0,
      "variance reduction must be a fraction (theta is the minimizer)")
  }

  test("shapley attribution: matches brute force and the efficiency identity") {
    val events = Tables.events(spark, sf)
      .select("user_id", "event_type", "ts")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2)))
    val fp = events.filter(_._2 == "purchase")
      .groupBy(_._1).map { case (u, xs) => u -> xs.map(_._3).min }
    val byUser = events.groupBy(_._1).toSeq
    val sig = byUser.map { case (u, xs) =>
      val cut = fp.get(u)
      def touched(t: String) = xs.exists(e =>
        e._2 == t && cut.forall(c => e._3.before(c)))
      val mask = (if (touched("view")) 1 else 0) +
        (if (touched("click")) 2 else 0) + (if (touched("signup")) 4 else 0)
      (mask, if (fp.contains(u)) 1 else 0)
    }.toSeq
    val g = sig.groupBy(_._1).map { case (m, xs) =>
      m -> (xs.length, xs.map(_._2).sum)
    }
    def v(m: Int): Double = g.get(m).map { case (n, nc) =>
      nc.toDouble / n
    }.getOrElse(0.0)
    val t = 1.0 / 3; val x = 1.0 / 6
    val phiView = (v(1) - v(0)) * t + (v(3) - v(2)) * x +
      (v(5) - v(4)) * x + (v(7) - v(6)) * t
    val phiClick = (v(2) - v(0)) * t + (v(3) - v(1)) * x +
      (v(6) - v(4)) * x + (v(7) - v(5)) * t
    val phiSignup = (v(4) - v(0)) * t + (v(5) - v(1)) * x +
      (v(6) - v(2)) * x + (v(7) - v(3)) * t
    val row = q("q_attribution_shapley").collect().head
    assert(row.getLong(0) == sig.length)
    assert(math.abs(row.getDouble(3) - phiView) < 1e-6, "phi_view")
    assert(math.abs(row.getDouble(4) - phiClick) < 1e-6, "phi_click")
    assert(math.abs(row.getDouble(5) - phiSignup) < 1e-6, "phi_signup")
    // efficiency: credit assigned equals the lift from no-touch to full
    val phiSum = row.getDouble(3) + row.getDouble(4) + row.getDouble(5)
    assert(math.abs(phiSum - (v(7) - v(0))) < 1e-5,
      s"sum(phi)=$phiSum must equal v(full)-v(none)=${v(7) - v(0)}")
  }

  test("did: the 2x2 cell means and estimator match brute force") {
    val split = java.sql.Timestamp.valueOf("2024-01-16 00:00:00")
    val perUser = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(
        round(sum(when(col("ts") < lit(split), col("value")).otherwise(0.0)), 4).as("pre"),
        round(sum(when(col("ts") >= lit(split), col("value")).otherwise(0.0)), 4).as("post"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val (t, c) = perUser.partition(_._1 % 2 == 1)
    def mean(xs: Array[Double]) = xs.sum / xs.length
    val want = (mean(t.map(_._3)) - mean(t.map(_._2))) -
      (mean(c.map(_._3)) - mean(c.map(_._2)))
    val row = q("q_did").collect().head
    assert(row.getLong(0) == t.length && row.getLong(1) == c.length)
    assert(math.abs(row.getDouble(6) - want) < 1e-5, "did estimator")
  }

  test("bootstrap ci: hash-seeded resample replicates sequentially") {
    val users = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(round(sum("value") * 10000).cast("long").as("mi"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    val mi = users.map(_._2)
    val n = mi.length
    def md5hex8(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
    }
    // exact-integer replica sums, ranked (sum, b) — the engine's cut
    val bootSums = (1 to 200).map { b =>
      (b, (1 to n).map(i => mi((md5hex8(s"$b:$i") % n).toInt)).sum)
    }
    val ranked = bootSums.sortBy { case (b, bs) => (bs, b) }.map(_._2)
    def out(sum: Long) = BigDecimal(sum / (n * 10000.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val (lo, hi) = (out(ranked(4)), out(ranked(195)))
    val row = q("q_bootstrap_ci").collect().head
    assert(row.getLong(0) == n)
    assert(math.abs(row.getDouble(2) - lo) < 1e-9, s"ci_lo got=${row.getDouble(2)} want=$lo")
    assert(math.abs(row.getDouble(3) - hi) < 1e-9, s"ci_hi got=${row.getDouble(3)} want=$hi")
    assert(row.getDouble(2) <= row.getDouble(1) && row.getDouble(1) <= row.getDouble(3),
      "point estimate must sit inside the 95% CI on this data")
  }

  test("abc classes match a sequential cents-exact classification") {
    val got = q("q_abc_class").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(math.abs(got.map(_._4).sum - 1.0) < 1e-5, "shares sum to 1")
    val perPart = Tables.lineitem(spark, sf)
      .select(col("l_partkey"),
        round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
          .cast("long").as("cents"))
      .groupBy("l_partkey").agg(sum("cents").as("rev"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (k, r) => (-r, k) }
    val total = perPart.map(_._2).sum
    var cum = 0L
    val brute = perPart.map { case (_, r) =>
      cum += r
      val cls = if (cum * 100 <= total * 80) "A"
        else if (cum * 100 <= total * 95) "B" else "C"
      (cls, r)
    }.groupBy(_._1).map { case (c, xs) =>
      c -> (xs.length.toLong, xs.map(_._2).sum)
    }
    assert(got.map(_._1).toSeq == brute.keys.toSeq.sorted)
    got.foreach { case (c, nP, cents, _) =>
      assert(brute(c) == ((nP, cents)), s"class $c")
    }
  }

  test("auc equals the brute-force tie-corrected pair probability") {
    val row = q("q_auc").head()
    val (nPos, nNeg, got) = (row.getLong(0), row.getLong(1), row.getDouble(2))
    // brute force over all (pos, neg) pairs: 1 if pos scores higher,
    // 0.5 on a tie — the definition the grouped-cumsum form must equal
    val rows = Tables.orders(spark, sf)
      .select(col("o_totalprice"), pmod(col("o_orderkey"), lit(2)))
      .collect().map(r => (r.getDouble(0), r.getLong(1)))
    val pos = rows.filter(_._2 == 1L).map(_._1)
    val neg = rows.filter(_._2 == 0L).map(_._1)
    assert(pos.length.toLong == nPos && neg.length.toLong == nNeg)
    var num = 0.0
    // O(nP·nN) is fine at sf0.001
    pos.foreach { p => neg.foreach { n =>
      if (p > n) num += 1.0 else if (p == n) num += 0.5
    } }
    val brute = num / (nPos.toDouble * nNeg)
    assert(math.abs(got - brute) < 1e-6, s"engine $got vs brute $brute")
    assert(got > 0.0 && got < 1.0)
  }

  test("lift deciles: equal-population cut, conservation, final gain = 1") {
    val rows = q("q_lift_deciles").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.map(_._1).toSeq == (1L to 10L))
    val nTotal = Tables.orders(spark, sf).count()
    assert(rows.map(_._2).sum == nTotal)
    // the explicit ((rk-1)*10) DIV n cut differs by at most 1 per decile
    assert(rows.map(_._2).max - rows.map(_._2).min <= 1)
    // lift conservation: Σ n_i·lift_i = N (weighted mean lift is 1)
    val conserved = rows.map { case (_, n, _, lift, _) => n * lift }.sum
    assert(math.abs(conserved - nTotal) < nTotal * 1e-4, conserved.toString)
    // cumulative gain is monotone and ends at exactly 1
    val gains = rows.map(_._5)
    assert(gains.zip(gains.tail).forall { case (a, b) => a <= b })
    assert(gains.last == 1.0)
  }

  // ---- round 12 operators ----

  test("item-item cosine CF matches the brute-force top-20") {
    val adj = Tables.orders(spark, sf)
      .join(Tables.lineitem(spark, sf),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byCust = adj.groupBy(_._1).map { case (c, xs) =>
      c -> xs.map(_._2).toSet
    }.filter { case (_, ps) => ps.size >= 2 && ps.size <= 100 }
    val ni = byCust.values.flatten.groupBy(identity)
      .map { case (p, hits) => p -> hits.size }
    val co = scala.collection.mutable.Map[(Long, Long), Int]()
    byCust.values.foreach { ps =>
      val sorted = ps.toArray.sorted
      for (i <- sorted.indices; j <- i + 1 until sorted.length)
        co((sorted(i), sorted(j))) = co.getOrElse((sorted(i), sorted(j)), 0) + 1
    }
    val scored = co.toArray.filter(_._2 >= 2).map { case ((p1, p2), c) =>
      val s = math.round(1e6 * c /
        (math.sqrt(ni(p1).toDouble) * math.sqrt(ni(p2).toDouble)))
      (p1, p2, c, s)
    }.sortBy { case (p1, p2, _, s) => (-s, p1, p2) }.take(20)
    val got = q("q_item_cf").collect()
    assert(got.length == scored.length)
    got.zip(scored).foreach { case (r, (p1, p2, c, s)) =>
      assert(r.getLong(0) == p1 && r.getLong(1) == p2, "pair order")
      assert(r.getLong(2) == c.toLong)
      assert(r.getLong(3) == ni(p1).toLong && r.getLong(4) == ni(p2).toLong)
      assert(math.abs(r.getDouble(5) - s / 1e6) < 1e-9)
    }
  }

  test("capture-recapture replays the Chapman estimator exactly") {
    val cy = Tables.orders(spark, sf)
      .filter(year(col("o_orderdate")).isin(1995, 1996))
      .select(col("o_custkey"), year(col("o_orderdate")).as("yr"))
      .distinct().collect().map(r => (r.getLong(0), r.getInt(1)))
    val s1 = cy.filter(_._2 == 1995).map(_._1).toSet
    val s2 = cy.filter(_._2 == 1996).map(_._1).toSet
    val m = (s1 & s2).size
    val nhat = (s1.size + 1.0) * (s2.size + 1) / (m + 1) - 1.0
    val got = q("q_capture_recapture").collect()(0)
    assert(got.getLong(0) == s1.size.toLong && got.getLong(1) == s2.size.toLong)
    assert(got.getLong(2) == m.toLong)
    assert(math.abs(got.getDouble(3) - nhat) < 0.01)
    // the estimate should bracket the true sf0.001 customer count scale
    assert(got.getDouble(3) > s1.size.toDouble, "N-hat exceeds one capture")
  }

  test("beta-binomial shrinkage pulls extreme brand rates toward the prior") {
    val rows = q("q_beta_binomial").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.length == 25)
    // brute-force MoM prior from the micro-rounded rates
    val pq9 = rows.map { case (_, n, x, _, _) =>
      math.round(1e9 * x / n)
    }
    val k = pq9.length
    val m = pq9.map(BigInt(_)).sum.toDouble / (k * 1e9)
    val v = (BigInt(k) * pq9.map(p => BigInt(p) * BigInt(p)).sum -
      pq9.map(BigInt(_)).sum * pq9.map(BigInt(_)).sum).toDouble /
      (k.toLong * (k - 1L)) / 1e18
    val alpha = m * (m * (1 - m) / v - 1)
    val beta = (1 - m) * (m * (1 - m) / v - 1)
    rows.foreach { case (b, n, x, rate, shrunk) =>
      assert(math.abs(rate - x.toDouble / n) < 1e-6)
      val want = (x + alpha) / (n + alpha + beta)
      assert(math.abs(shrunk - want) < 1e-4, s"brand $b")
      // shrinkage moves every rate strictly toward the prior mean
      if (math.abs(rate - m) > 1e-9)
        assert(math.abs(shrunk - m) < math.abs(rate - m) + 1e-12, b)
    }
  }
}
