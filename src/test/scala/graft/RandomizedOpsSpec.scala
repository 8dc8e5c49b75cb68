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
}
