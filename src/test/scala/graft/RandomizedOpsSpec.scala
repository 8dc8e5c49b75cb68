package graft

import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Randomized cross-checks for the round-9 relational operators: each
  * query runs against seeded random tables written to a scratch dir
  * (the fixed testdata exercises one distribution; these exercise
  * ties, duplicates, empty groups, and boundary dates) and must equal
  * a driver-side brute-force reimplementation. */
class RandomizedOpsSpec extends SparkSpec {

  private def scratch(): String =
    java.nio.file.Files.createTempDirectory("graft-rand").toString

  test("skyline equals brute-force dominance on random points with ties") {
    val s = spark
    import s.implicits._
    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      // coarse grids force duplicate prices, duplicate sizes, AND
      // duplicate (price, size) points
      val pts = (1L to 300L).map(i =>
        (i, 900.0 + rnd.nextInt(40) * 2.5, 1 + rnd.nextInt(25)))
      val dir = scratch()
      pts.toDF("p_partkey", "p_retailprice", "p_size")
        .write.parquet(s"$dir/part.parquet")
      val got = SparkEntry.queries("q_skyline")(spark, dir)
        .select("p_partkey").collect().map(_.getLong(0)).toSet
      val want = pts.filter { case (_, p, sz) =>
        !pts.exists { case (_, q, qz) =>
          q <= p && qz >= sz && (q < p || qz > sz)
        }
      }.map(_._1).toSet
      assert(got == want, s"seed=$seed missing=${want -- got} extra=${got -- want}")
    }
  }

  test("interval coverage equals brute-force merge on random intervals") {
    val s = spark
    import s.implicits._
    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(100 + seed)
      // dense ts grid on few users → plenty of overlaps and exact ties
      val rows = (1L to 400L).map { i =>
        (i, new Timestamp(1700000000000L + rnd.nextInt(2000) * 60000L),
          1L + rnd.nextInt(5), "view", 1.0, "{}")
      }
      val dir = scratch()
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.parquet(s"$dir/events.parquet")
      val got = SparkEntry.queries("q_interval_coverage")(spark, dir)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val ivl = 300L * 1000000L
      val want = rows.groupBy(_._3).map { case (u, rs) =>
        val sorted = rs.map(r => r._2.getTime * 1000L).sorted
        var covered = 0L; var maxEnd = Long.MinValue
        sorted.foreach { st =>
          val en = st + ivl
          covered += math.max(0L, en - math.max(st, maxEnd))
          maxEnd = math.max(maxEnd, en)
        }
        u -> covered
      }
      assert(got == want, s"seed=$seed got=$got want=$want")
    }
  }

  test("binned range join equals brute-force interval match on random dates") {
    val s = spark
    import s.implicits._
    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(200 + seed)
      def day(offset: Int) = new Timestamp(
        java.time.LocalDate.of(1996, 1, 1).plusDays(offset.toLong)
          .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli)
      // orders across Q1-1996 AND outside it (must be filtered out);
      // lineitems across a wider window incl. exact boundary days
      val orders = (1L to 80L).map(i => (i, day(rnd.nextInt(150) - 20)))
      val lines = (1 to 600).map(_ =>
        (1.0 + rnd.nextInt(50), day(rnd.nextInt(150) - 20)))
      val dir = scratch()
      orders.toDF("o_orderkey", "o_orderdate").write.parquet(s"$dir/orders.parquet")
      lines.toDF("l_quantity", "l_shipdate").write.parquet(s"$dir/lineitem.parquet")
      val got = SparkEntry.queries("q_join_range_binned")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getDouble(2))).toSet
      val q1 = orders.filter { case (_, d) =>
        val ld = d.toInstant.atZone(java.time.ZoneOffset.UTC).toLocalDate
        ld.getYear == 1996 && ld.getMonthValue <= 3
      }
      val want = q1.flatMap { case (ok, od) =>
        val sd = od.toInstant.toEpochMilli / 86400000L
        val hits = lines.filter { case (_, ld) =>
          val pd = ld.toInstant.toEpochMilli / 86400000L
          pd >= sd && pd <= sd + 3
        }
        if (hits.isEmpty) None
        else Some((ok, hits.size.toLong,
          BigDecimal(hits.map(_._1).sum)
            .setScale(1, BigDecimal.RoundingMode.HALF_UP).toDouble))
      }.toSet
      assert(got == want, s"seed=$seed missing=${want -- got} extra=${got -- want}")
    }
  }

  test("k-hop BFS equals brute-force layered search on random graphs") {
    val s = spark
    import s.implicits._
    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(300 + seed)
      // bipartite purchase graph: custkeys 1..300 (seeds 1/101/201 when
      // present), suppkeys 1..15; some orders have no lineitems
      val orders = (1L to 120L).map(i => (i, 1L + rnd.nextInt(300)))
      val lines = (1 to 400).map(_ =>
        (1L + rnd.nextInt(120), 1L + rnd.nextInt(15)))
      val dir = scratch()
      orders.toDF("o_orderkey", "o_custkey").write.parquet(s"$dir/orders.parquet")
      lines.toDF("l_orderkey", "l_suppkey").write.parquet(s"$dir/lineitem.parquet")
      val got = SparkEntry.queries("q_bfs_khop")(spark, dir)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      // brute force: undirected adjacency, layered BFS to hop 3
      val custOf = orders.toMap
      val pairs = lines.flatMap { case (ok, sk) =>
        custOf.get(ok).map(ck => (ck, -sk - 1))
      }.distinct
      val adj = (pairs ++ pairs.map(p => (p._2, p._1)))
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
      var want = adj.keySet.filter(n => n > 0 && n % 100 == 1)
        .map(_ -> 0).toMap
      var frontier = want.keySet
      (1 to 3).foreach { h =>
        val next = frontier.flatMap(adj.getOrElse(_, Set.empty[Long]))
          .diff(want.keySet)
        want = want ++ next.map(_ -> h)
        frontier = next
      }
      assert(got == want,
        s"seed=$seed missing=${want.keySet -- got.keySet} " +
          s"extra=${got.keySet -- want.keySet} " +
          s"hopdiff=${got.filter(kv => want.get(kv._1).exists(_ != kv._2))}")
    }
  }

  test("hop-bounded weighted SSSP equals brute-force walk enumeration") {
    val s = spark
    import s.implicits._
    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(600 + seed)
      val orders = (1L to 120L).map(i => (i, 1L + rnd.nextInt(300)))
      val lines = (1 to 400).map(_ =>
        (1L + rnd.nextInt(120), 1L + rnd.nextInt(15),
          1.0 + rnd.nextInt(50)))
      val dir = scratch()
      orders.toDF("o_orderkey", "o_custkey").write.parquet(s"$dir/orders.parquet")
      lines.toDF("l_orderkey", "l_suppkey", "l_quantity")
        .write.parquet(s"$dir/lineitem.parquet")
      val got = SparkEntry.queries("q_sssp")(spark, dir)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // brute force: 3 rounds of relaxation over the min-weight edges
      val custOf = orders.toMap
      val pairs = lines.flatMap { case (ok, sk, q) =>
        custOf.get(ok).map(ck => ((ck, -sk - 1), q.toLong))
      }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).min }
      val adj = (pairs.toSeq ++ pairs.toSeq.map { case ((a, b), w) => ((b, a), w) })
        .groupBy(_._1._1)
        .map { case (k, es) => k -> es.map(e => (e._1._2, e._2)) }
      var dist = adj.keySet.filter(n => n > 0 && n % 100 == 1)
        .map(_ -> 0L).toMap
      (1 to 3).foreach { _ =>
        val relaxed = dist.toSeq.flatMap { case (n, dn) =>
          adj.getOrElse(n, Seq.empty).map { case (m, w) => (m, dn + w) }
        }
        dist = (dist.toSeq ++ relaxed).groupBy(_._1)
          .map { case (k, vs) => k -> vs.map(_._2).min }
      }
      assert(got == dist,
        s"seed=$seed missing=${dist.keySet -- got.keySet} " +
          s"extra=${got.keySet -- dist.keySet} " +
          s"diff=${got.filter(kv => dist.get(kv._1).exists(_ != kv._2)).take(5)}")
    }
  }

  test("event paths equal brute-force first-3 sequences with ts ties") {
    val s = spark
    import s.implicits._
    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(700 + seed)
      val types = Array("view", "click", "cart", "purchase")
      val rows = (1L to 400L).map { i =>
        (i, new Timestamp(1700000000000L + rnd.nextInt(40) * 60000L),
          1L + rnd.nextInt(30), types(rnd.nextInt(4)), 1.0, "{}")
      }
      val dir = scratch()
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.parquet(s"$dir/events.parquet")
      val got = SparkEntry.queries("q_event_paths")(spark, dir)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val want = rows.groupBy(_._3).values.map { rs =>
        rs.sortBy(r => (r._2.getTime, r._1)).take(3).map(_._4)
          .mkString(">")
      }.groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
      assert(got == want, s"seed=$seed got=$got want=$want")
    }
  }

  test("CDC apply equals sequential op-by-op replay on random logs") {
    val s = spark
    import s.implicits._
    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(400 + seed)
      // few keys, many ops per key → deletes, re-inserts, long chains;
      // values kept at exact 2dp so rounding is engine-independent
      val cust = (1L to 20L).map(i => (i, rnd.nextInt(10000) / 100.0))
      val orders = (1L to 200L).map(i =>
        (i, 1L + rnd.nextInt(20), rnd.nextInt(100000) / 100.0))
      val dir = scratch()
      cust.toDF("c_custkey", "c_acctbal").write.parquet(s"$dir/customer.parquet")
      orders.toDF("o_orderkey", "o_custkey", "o_totalprice")
        .write.parquet(s"$dir/orders.parquet")
      val got = SparkEntry.queries("q_cdc_apply")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
      val want = cust.flatMap { case (k, bal0) =>
        val ops = orders.filter(_._2 == k).sortBy(_._1)
        var state: Option[Double] = Some(bal0)
        ops.foreach { case (seqId, _, v) =>
          state = if (seqId % 11 == 0) None else Some(v)
        }
        state.map(v => (k, v, ops.size.toLong))
      }.toSet
      assert(got == want, s"seed=$seed missing=${want -- got} extra=${got -- want}")
    }
  }

  test("table diff equals brute-force row comparison on random snapshots") {
    val s = spark
    import s.implicits._
    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(800 + seed)
      // statuses from a tiny alphabet, prices on a coarse 2dp grid →
      // plenty of unchanged rows AND same-price-different-status rows
      val orders = (1L to 300L).map(i =>
        (i, Seq("O", "F", "P")(rnd.nextInt(3)), 100.0 + rnd.nextInt(50)))
      val dir = scratch()
      orders.toDF("o_orderkey", "o_orderstatus", "o_totalprice")
        .write.parquet(s"$dir/orders.parquet")
      val got = SparkEntry.queries("q_table_diff")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val a = orders.filter(_._1 % 5 != 4)
        .map(o => o._1 -> (o._2, o._3)).toMap
      val b = orders.filter(_._1 % 7 != 0)
        .map(o => o._1 -> (o._2, if (o._1 % 3 == 0) o._3 + 10.0 else o._3))
        .toMap
      val want = (a.keySet ++ b.keySet).flatMap { k =>
        (a.get(k), b.get(k)) match {
          case (None, Some(_)) => Some(k -> "added")
          case (Some(_), None) => Some(k -> "removed")
          case (Some(x), Some(y)) if x != y => Some(k -> "changed")
          case _ => None
        }
      }
      assert(got == want, s"seed=$seed missing=${want -- got} extra=${got -- want}")
    }
  }

  test("TWAP equals brute-force time-weighted mean with ts ties") {
    val s = spark
    import s.implicits._
    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(900 + seed)
      val rows = (1L to 300L).map { i =>
        (i, new Timestamp(1700000000000L + rnd.nextInt(100) * 60000L),
          1L + rnd.nextInt(5), "view", 1.0 + rnd.nextInt(100), "{}")
      }
      val dir = scratch()
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.parquet(s"$dir/events.parquet")
      val got = SparkEntry.queries("q_twap")(spark, dir)
        .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(3)))
        .toMap
      val want = rows.groupBy(_._3).flatMap { case (u, rs) =>
        val ordered = rs.sortBy(r => (r._2.getTime, r._1))
          .map(r => (r._2.getTime * 1000L, r._5))
        val held = ordered.zip(ordered.drop(1))
          .map { case ((t, v), (tn, _)) => (v, tn - t) }
        if (held.isEmpty) None
        else {
          val twap = held.map { case (v, dt) => v * dt }.sum /
            held.map(_._2).sum
          Some(u -> (BigDecimal(twap)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
            held.size.toLong))
        }
      }
      assert(got == want, s"seed=$seed got=$got want=$want")
    }
  }

  test("cohort matrix equals brute-force first-seen bucketing") {
    val s = spark
    import s.implicits._
    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(1000 + seed)
      // ts across ~5 epoch weeks on few users → multi-week cohorts,
      // users active in several weeks, single-week stragglers
      val rows = (1L to 400L).map { i =>
        (i, new Timestamp(1700000000000L + rnd.nextInt(35) * 86400000L),
          1L + rnd.nextInt(25), "view", 1.0, "{}")
      }
      val dir = scratch()
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.parquet(s"$dir/events.parquet")
      val got = SparkEntry.queries("q_cohort_matrix")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3))).toMap
      val uw = rows.map(r => (r._3, r._2.getTime * 1000L / 604800000000L))
        .distinct
      val first = uw.groupBy(_._1).map { case (u, ws) => u -> ws.map(_._2).min }
      val cells = uw.groupBy { case (u, w) => (first(u), w - first(u)) }
        .map { case (k, vs) => k -> vs.map(_._1).distinct.size.toLong }
      val sizes = cells.collect { case ((c, 0L), n) => c -> n }
      val want = cells.map { case ((c, off), n) => (c, off) -> (n, sizes(c)) }
      assert(got == want, s"seed=$seed got=$got want=$want")
    }
  }

  test("event transitions equal brute-force pair counts with ts ties") {
    val s = spark
    import s.implicits._
    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(500 + seed)
      val types = Array("view", "click", "cart", "purchase")
      // coarse ts grid on few users → deliberate ts ties, broken by
      // the unique event_id in both engine and brute force
      val rows = (1L to 500L).map { i =>
        (i, new Timestamp(1700000000000L + rnd.nextInt(50) * 60000L),
          1L + rnd.nextInt(6), types(rnd.nextInt(4)), 1.0, "{}")
      }
      val dir = scratch()
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.parquet(s"$dir/events.parquet")
      val got = SparkEntry.queries("q_event_transitions")(spark, dir)
        .collect().map(r =>
          (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
        .toMap
      val pairCounts = rows.groupBy(_._3).toSeq.flatMap { case (_, rs) =>
        val ordered = rs.sortBy(r => (r._2.getTime, r._1)).map(_._4)
        ordered.zip(ordered.drop(1))
      }.groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
      val prevTotals = pairCounts.groupBy(_._1._1)
        .map { case (p, m) => p -> m.values.sum }
      val want = pairCounts.map { case (p, n) =>
        p -> (n, BigDecimal(n.toDouble / prevTotals(p._1))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      assert(got == want, s"seed=$seed got=$got want=$want")
    }
  }

  test("label propagation equals sequential synchronous mode-voting") {
    val s = spark
    import s.implicits._
    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(600 + seed)
      val orders = (1L to 120L).map(i => (i, 1L + rnd.nextInt(300)))
      val lines = (1 to 400).map(_ =>
        (1L + rnd.nextInt(120), 1L + rnd.nextInt(15)))
      val dir = scratch()
      orders.toDF("o_orderkey", "o_custkey").write.parquet(s"$dir/orders.parquet")
      lines.toDF("l_orderkey", "l_suppkey").write.parquet(s"$dir/lineitem.parquet")
      val got = SparkEntry.queries("q_label_prop")(spark, dir)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // brute force: 3 synchronous rounds, new label = mode of
      // neighbor labels with (count desc, label asc) tie-break
      val custOf = orders.toMap
      val pairs = lines.flatMap { case (ok, sk) =>
        custOf.get(ok).map(ck => (ck, -sk - 1))
      }.distinct
      val adj = (pairs ++ pairs.map(p => (p._2, p._1)))
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
      var lbl = adj.keySet.map(n => n -> n).toMap
      (1 to 3).foreach { _ =>
        lbl = adj.map { case (node, nbrs) =>
          val votes = nbrs.map(lbl).groupBy(identity)
            .map { case (l, xs) => (l, xs.size) }
          node -> votes.toSeq.minBy { case (l, c) => (-c, l) }._1
        }
      }
      assert(got == lbl, s"seed=$seed diff=${
        got.collect { case (n, l) if lbl.get(n) != Some(l) => (n, l, lbl.get(n)) }.take(5)}")
    }
  }
}
