package graft

import org.apache.spark.sql.functions._
import graft.streaming.EventStreams

class StreamingSpec extends SparkSpec {

  /** Monotone long view of the raw events ts for ordering probes, on
    * either on-disk layout: nanos-long (identity) or timestamp (epoch
    * micros via an LTZ cast — TIMESTAMP_NTZ has no direct long cast). */
  private def tsAsLong(raw: org.apache.spark.sql.DataFrame) =
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => col("ts")
      case _ => unix_micros(col("ts").cast("timestamp"))
    }

  /** File streams need a directory; stage the events file into one. */
  private lazy val eventsDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    dir.toString
  }

  test("a stream can be defined on an empty landing directory") {
    // files arrive AFTER stream definition in a real landing zone — the
    // schema probe must fall back to the declared rawSchema, not throw
    val dir = java.nio.file.Files.createTempDirectory("graft-empty-landing")
    val stream = EventStreams.readEvents(spark, dir.toString)
    assert(stream.isStreaming)
    assert(stream.schema.fieldNames.contains("ts"))
    // once a file lands, the same directory serves data (fresh definition
    // picks up the on-disk schema; the early-bound stream stays valid)
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    val q = EventStreams.tumblingCounts(EventStreams.readEvents(spark, dir.toString))
      .writeStream.format("memory").queryName("empty_landing")
      .outputMode("complete").start()
    try { q.processAllAvailable() } finally q.stop()
    assert(spark.table("empty_landing").count() > 0)
  }

  test("loading events does not mutate the session timezone") {
    val before = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try {
      val batchTs = Tables.events(spark, sf)
        .agg(sum(unix_micros(col("ts")))).head.getLong(0)
      assert(spark.conf.get("spark.sql.session.timeZone") ==
        "America/Los_Angeles", "Tables.events mutated session tz")
      EventStreams.readEvents(spark, eventsDir)
      assert(spark.conf.get("spark.sql.session.timeZone") ==
        "America/Los_Angeles", "readEvents mutated session tz")
      // and the loaded instants are session-tz-independent
      spark.conf.set("spark.sql.session.timeZone", before)
      val utcTs = Tables.events(spark, sf)
        .agg(sum(unix_micros(col("ts")))).head.getLong(0)
      assert(batchTs == utcTs, "events ts depends on session timezone")
    } finally spark.conf.set("spark.sql.session.timeZone", before)
  }

  test("corpus operators run unchanged on a documents file stream") {
    // per-row text operators are streaming-compatible by construction —
    // prove it: the SAME piiColumns builder drives a readStream source
    // and matches the batch result row-for-row (the incremental-corpus
    // ingestion shape: scrub-as-you-land)
    val dir = java.nio.file.Files.createTempDirectory("graft-docstream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/documents.parquet"),
      dir.resolve("documents.parquet"))
    val stream = spark.readStream
      .schema(Tables.documents(spark, sf).schema)
      .parquet(dir.toString)
    val got = EventStreams.runToMemory(spark,
      graft.queries.TextQueries.piiColumns(stream), "t_docs_pii")
      .collect().map(_.toSeq).toSet
    val want = graft.queries.TextQueries.piiColumns(Tables.documents(spark, sf))
      .collect().map(_.toSeq).toSet
    assert(got.nonEmpty && got == want)
  }

  test("stream-static decontamination equals the batch contaminated set") {
    // the static side: eval-slice (doc_id % 5 = 4) distinct shingles,
    // same builder as batch q_decontaminate
    val evalShingles = graft.queries.TextQueries.shingleRows(spark, sf)
      .filter(col("doc_id") % 5 === 4)
      .select("shingle").distinct()
    val dir = java.nio.file.Files.createTempDirectory("graft-decontstream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/documents.parquet"),
      dir.resolve("documents.parquet"))
    val docsStream = spark.readStream
      .schema(Tables.documents(spark, sf).schema)
      .parquet(dir.toString)
    val got = EventStreams.runToMemory(spark,
      EventStreams.decontaminateStream(docsStream, evalShingles),
      "t_decont_stream")
      .collect().map(_.getLong(0)).toSet
    // batch truth: docs sharing any shingle with the eval set
    val want = graft.queries.TextQueries.shingleRows(spark, sf)
      .join(evalShingles, "shingle")
      .select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(got.nonEmpty && got == want,
      s"stream=${got.size} docs, batch=${want.size} docs")
  }

  test("streaming CM sketch state equals the batch sketch, and is additive") {
    // stream ≡ batch: the 1024-cell grid aggregated incrementally must
    // match the one-shot batch aggregate over the same rows
    val stream = EventStreams.cmSketchCells(EventStreams.readEvents(spark, eventsDir))
    val got = EventStreams.runToMemory(spark, stream, "t_cm_cells", "complete")
      .collect().map(_.toSeq).toSet
    val want = EventStreams.cmSketchCells(Tables.events(spark, sf))
      .collect().map(_.toSeq).toSet
    assert(got.nonEmpty && got == want)
    // additivity (the mergeable-sketch property): replaying the same
    // file twice must exactly double every cell
    val dir = java.nio.file.Files.createTempDirectory("graft-cm-replay")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"), dir.resolve("a.parquet"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"), dir.resolve("b.parquet"))
    val doubled = EventStreams
      .runToMemory(spark,
        EventStreams.cmSketchCells(EventStreams.readEvents(spark, dir.toString)),
        "t_cm_doubled", "complete")
      .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    val base = EventStreams.cmSketchCells(Tables.events(spark, sf))
      .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(doubled.size == base.size)
    base.foreach { case (k, v) =>
      assert(doubled(k) == 2 * v, s"cell $k: ${doubled(k)} != 2*$v")
    }
  }

  test("streaming tumbling windows equal the batch twin (complete mode)") {
    val stream = EventStreams.tumblingCounts(EventStreams.readEvents(spark, eventsDir))
    val got = EventStreams.runToMemory(spark, stream, "t_tumbling", "complete")
      .collect().map(_.toSeq).toSet
    val want = graft.queries.StreamQueries.queries("q_window_tumbling")(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(got == want)
  }

  test("streaming session windows equal the batch twin") {
    val stream = EventStreams.sessionCounts(EventStreams.readEvents(spark, eventsDir))
    val got = EventStreams.runToMemory(spark, stream, "t_sessions", "complete")
      .collect().map(_.toSeq).toSet
    val want = graft.queries.StreamQueries.queries("q_session_window")(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(got == want)
  }

  test("sliding windows double-count each event across windows") {
    val stream = EventStreams.slidingCounts(EventStreams.readEvents(spark, eventsDir))
    val total = EventStreams.runToMemory(spark, stream, "t_sliding", "complete")
      .agg(sum("n")).head().getLong(0)
    assert(total == 2 * Tables.events(spark, sf).count())
  }

  test("dropDuplicatesWithinWatermark dedups replayed events") {
    // stage the same file twice => every event_id arrives twice
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-dup")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"), dir.resolve("a.parquet"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"), dir.resolve("b.parquet"))
    val deduped = EventStreams.dedupedEvents(EventStreams.readEvents(spark, dir.toString))
      .groupBy("event_type").agg(count(lit(1)).as("n"))
    val got = EventStreams.runToMemory(spark, deduped, "t_dedup", "complete")
      .agg(sum("n")).head().getLong(0)
    assert(got == Tables.events(spark, sf).count(),
      "replayed file must not double-count within the watermark")
  }

  test("mapGroupsWithState final totals equal the batch aggregation") {
    val stream = EventStreams.userTotalsMapGroups(
      spark, EventStreams.readEvents(spark, eventsDir))
    val got = EventStreams.runToMemory(spark, stream.toDF(), "t_mapstate", "update")
    val finalPerUser = got.groupBy("user_id").agg(max("n_events").as("n_events"))
    val want = Tables.events(spark, sf).groupBy("user_id")
      .agg(count(lit(1)).as("n_events"))
    assert(finalPerUser.collect().map(_.toSeq).toSet ==
      want.collect().map(_.toSeq).toSet)
  }

  test("foreachBatch sink lands partitioned parquet per micro-batch") {
    val out = java.nio.file.Files.createTempDirectory("graft-fb").toString + "/sink"
    val events = EventStreams.readEvents(spark, eventsDir)
      .select("event_id", "event_type", "value")
    val q = EventStreams.writeViaForeachBatch(events, out)
    q.processAllAvailable(); q.stop()
    val back = spark.read.parquet(out)
    assert(back.count() == Tables.events(spark, sf).count())
    val dirs = new java.io.File(out).listFiles().map(_.getName)
      .filter(_.startsWith("event_type="))
    assert(dirs.length == 5, s"expected 5 event_type partitions, got ${dirs.toList}")
  }

  test("stream-stream interval join equals the batch interval join") {
    val stream = EventStreams.clickPurchaseJoin(EventStreams.readEvents(spark, eventsDir))
    val got = EventStreams.runToMemory(spark, stream, "t_ssjoin", "append")
      .collect().map(_.toSeq).toSet
    val e = Tables.events(spark, sf)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("c_ts"), col("event_id").as("click_id"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"), col("value"))
    val want = clicks.join(purchases,
      col("user_id") === col("p_user") &&
        col("p_ts") >= col("c_ts") - expr("INTERVAL 1 HOUR") &&
        col("p_ts") <= col("c_ts"))
      .select(col("click_id"), col("user_id"),
        unix_micros(col("c_ts")).as("click_us"),
        unix_micros(col("p_ts")).as("purchase_us"),
        round(col("value"), 2).as("purchase_value"))
      .collect().map(_.toSeq).toSet
    assert(got == want)
  }

  test("stream-stream LEFT OUTER interval join equals the batch left join") {
    // outer rows only emit once the watermark passes a click's match
    // window, so land the real events first and then two far-future
    // dummy batches (user_id = -1, one click + one purchase each) that
    // drive BOTH sides' watermarks far past every real click
    val root = java.nio.file.Files.createTempDirectory("graft-louter")
    val in = root.resolve("in"); java.nio.file.Files.createDirectories(in)
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      in.resolve("events.parquet"))
    val raw = spark.read.parquet(s"$sf/events.parquet")
    def bump(days: Int) = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        col("ts") + lit(days.toLong * 86400L * 1000000000L)
      case _ => col("ts") + expr(s"INTERVAL $days DAYS")
    }
    Seq((20, "d1"), (40, "d2")).foreach { case (days, tag) =>
      val scratch = root.resolve(s"scratch-$tag")
      raw.filter(col("event_type").isin("click", "purchase"))
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("event_type").orderBy("event_id")))
        .filter(col("rn") === 1).drop("rn")
        .withColumn("ts", bump(days))
        .withColumn("user_id", lit(-1L))
        .coalesce(1).write.parquet(scratch.toString)
      import scala.jdk.CollectionConverters._
      val part = java.nio.file.Files.list(scratch).iterator().asScala
        .find(_.toString.endsWith(".parquet")).get
      java.nio.file.Files.move(part, in.resolve(s"$tag.parquet"))
    }
    val stream = EventStreams.clickPurchaseLeftJoin(
      EventStreams.readEvents(spark, in.toString))
    val got = EventStreams.runToMemory(spark, stream, "t_ssljoin", "append")
      .filter(col("user_id") =!= -1L)
      .collect().map(_.toSeq).toSet
    val e = Tables.events(spark, sf)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("value"))
    val want = clicks.join(purchases,
      col("user_id") === col("p_user") &&
        col("p_ts") >= col("c_ts") - expr("INTERVAL 1 HOUR") &&
        col("p_ts") <= col("c_ts"),
      "left_outer")
      .select(col("click_id"), col("user_id"),
        unix_micros(col("c_ts")).as("click_us"),
        unix_micros(col("p_ts")).as("purchase_us"),
        round(col("value"), 2).as("purchase_value"))
      .collect().map(_.toSeq).toSet
    assert(got == want,
      s"stream-only: ${(got diff want).take(3)}; batch-only: ${(want diff got).take(3)}")
    // the outer join genuinely adds rows: unconverted clicks exist
    assert(want.exists(_(3) == null), "fixture has no unmatched clicks")
  }

  test("stream-stream join state is watermark-bounded") {
    // THE reason watermarks exist at 100 TB: without them a
    // stream-stream join buffers every row ever seen. Land the real
    // events, then two far-future dummy batches that push BOTH sides'
    // watermarks past every real event — after processing, the join's
    // state store must hold (almost) none of the real rows.
    val root = java.nio.file.Files.createTempDirectory("graft-ssstate")
    val in = root.resolve("in"); java.nio.file.Files.createDirectories(in)
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      in.resolve("events.parquet"))
    val raw = spark.read.parquet(s"$sf/events.parquet")
    def bump(days: Int) = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        col("ts") + lit(days.toLong * 86400L * 1000000000L)
      case _ => col("ts") + expr(s"INTERVAL $days DAYS")
    }
    Seq((20, "d1"), (40, "d2")).foreach { case (days, tag) =>
      val scratch = root.resolve(s"scratch-$tag")
      raw.filter(col("event_type").isin("click", "purchase"))
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("event_type").orderBy("event_id")))
        .filter(col("rn") === 1).drop("rn")
        .withColumn("ts", bump(days))
        .withColumn("user_id", lit(-1L))
        .coalesce(1).write.parquet(scratch.toString)
      import scala.jdk.CollectionConverters._
      val part = java.nio.file.Files.list(scratch).iterator().asScala
        .find(_.toString.endsWith(".parquet")).get
      java.nio.file.Files.move(part, in.resolve(s"$tag.parquet"))
    }
    val stream = EventStreams.clickPurchaseJoin(
      EventStreams.readEvents(spark, in.toString))
    val q = stream.writeStream.format("memory")
      .queryName("t_ssjoin_state").outputMode("append").start()
    val stateRows =
      try {
        q.processAllAvailable()
        q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      } finally q.stop()
    val cpRows = raw
      .filter(col("event_type").isin("click", "purchase")).count()
    // strict bound: the watermark horizon (10 min + 1 h interval) holds
    // only the tail of each side — orders of magnitude under "all rows
    // ever seen", which is what state would be without watermarks
    assert(stateRows < cpRows / 4,
      s"join state $stateRows rows vs $cpRows click/purchase inputs — " +
        "watermark is not bounding state")
    // and the join still produced the batch-equivalent output
    assert(spark.table("t_ssjoin_state")
      .filter(col("user_id") =!= -1L).count() > 0)
  }

  test("rate source generates the events shape deterministically") {
    val q = EventStreams.rateEvents(spark, rowsPerBatch = 50)
      .writeStream.format("memory").queryName("t_rate").outputMode("append")
      .start()
    try {
      // unbounded source: poll until 3 batches (150 rows) have landed
      val deadline = System.currentTimeMillis() + 60000
      while (spark.table("t_rate").count() < 150 &&
        System.currentTimeMillis() < deadline) Thread.sleep(200)
    } finally q.stop()
    val rows = spark.table("t_rate")
      .select("event_id", "user_id", "event_type", "value").collect()
    assert(rows.length >= 150, s"only ${rows.length} rate rows arrived")
    val kinds = Seq("view", "click", "purchase")
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == id % 50)
      assert(r.getString(2) == kinds((id % 3).toInt))
      assert(math.abs(r.getDouble(3) - (id * 37 % 1000) / 10.0) < 1e-9)
    }
    // the generator's value column is a gap-free sequence from 0
    val ids = rows.map(_.getLong(0)).sorted
    assert(ids.zipWithIndex.forall { case (id, i) => id == i.toLong })
  }

  test("rate-source tumbling windows match the closed-form batch count") {
    // batch k carries ts = k * 20 min, 60 rows → a 1 h window spans
    // exactly 3 batches = 180 rows, 60 per event_type; the 10 min
    // watermark closes window w once a batch with ts >= w+70min lands
    val stream = EventStreams.tumblingCounts(EventStreams.rateEvents(spark))
    val q = stream.writeStream.format("memory").queryName("t_rate_tumbling")
      .outputMode("append").start()
    try {
      val deadline = System.currentTimeMillis() + 120000
      while (spark.table("t_rate_tumbling").count() < 3 &&
        System.currentTimeMillis() < deadline) Thread.sleep(200)
    } finally q.stop()
    val emitted = spark.table("t_rate_tumbling")
      .select("w_start", "event_type", "n").collect()
    assert(emitted.length >= 3, "no closed window was emitted")
    emitted.foreach { r =>
      assert(r.getLong(0) % 3600 == 0, "window starts must align to the hour")
      assert(r.getLong(2) == 60L,
        s"window ${r.getLong(0)} ${r.getString(1)}: ${r.getLong(2)} != 60")
    }
  }

  test("streaming funnel folds state across MULTIPLE time-ordered triggers") {
    // split events into two files at the median timestamp; with
    // maxFilesPerTrigger=1 the state machine must carry each user's
    // funnel progress across micro-batch boundaries (event-time order
    // across triggers holds because the split is by time)
    val dir = java.nio.file.Files.createTempDirectory("graft-stream2")
    val ev = Tables.events(spark, sf).cache()
    val cut = ev.stat.approxQuantile("event_id", Array(0.5), 0.0).head.toLong
    // write RAW nanos (the stream source declares the raw schema);
    // re-read the original parquet to preserve the source layout
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sf/events.parquet")
    val lo = raw.filter(col("event_id") <= cut)
    val hi = raw.filter(col("event_id") > cut)
    // event_id correlates with ts in the fixture; verify that here so
    // the in-order-across-triggers premise of the test is real
    // monotone long view of ts for the ordering probe, on either on-disk
    // layout (nanos-long drop: identity; timestamp drop: epoch micros)
    import org.apache.spark.sql.functions.{max => fmax, min => fmin}
    val loMax = lo.agg(fmax(tsAsLong(raw))).head().getLong(0)
    val hiMin = hi.agg(fmin(tsAsLong(raw))).head().getLong(0)
    assume(loMax <= hiMin, "fixture not time-split by event_id; skip")
    lo.coalesce(1).write.parquet(s"$dir/a.parquet")
    hi.coalesce(1).write.parquet(s"$dir/b.parquet")
    // file source lists alphabetically: a (early) then b (late)
    val stream = EventStreams.funnelStages(
      spark, EventStreams.readEvents(spark, s"$dir/*.parquet"))
    val got = EventStreams.runToMemory(spark, stream.toDF(), "t_funnel2", "update")
    val stages = got.groupBy("user_id").agg(max("stage").as("stage"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val batch = graft.queries.StreamQueries.queries("q_funnel")(spark, sf)
      .collect().head
    assert(stages.values.count(_ >= 1).toLong == batch.getLong(0))
    assert(stages.values.count(_ >= 2).toLong == batch.getLong(1))
    assert(stages.values.count(_ >= 3).toLong == batch.getLong(2))
  }

  test("funnel state survives a checkpoint stop/restart and does not reprocess") {
    // the property a production stream actually depends on: kill the
    // query after the EARLY half of the data, restart from the same
    // checkpoint once the LATE half has landed, and require that
    //  (a) the restarted query does not reprocess the early file, and
    //  (b) per-user funnel state crossed the restart — a user whose
    //      view sits in file a and click in file b reaches stage 2 only
    //      if the state store recovered t1 from the checkpoint.
    val base = java.nio.file.Files.createTempDirectory("graft-recover")
    val inDir = java.nio.file.Files.createDirectory(base.resolve("in")).toString
    val outDir = s"$base/out"
    val cpDir = s"$base/cp"
    // time-split the raw events (same premise as the multi-trigger test)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sf/events.parquet").cache()
    val cut = raw.stat.approxQuantile("event_id", Array(0.5), 0.0).head.toLong
    val lo = raw.filter(col("event_id") <= cut)
    val hi = raw.filter(col("event_id") > cut)
    import org.apache.spark.sql.functions.{max => fmax, min => fmin}
    assume(lo.agg(fmax(tsAsLong(raw))).head().getLong(0) <=
      hi.agg(fmin(tsAsLong(raw))).head().getLong(0),
      "fixture not time-split; skip")
    val nUsersLo = lo.select("user_id").distinct().count()
    val nUsersHi = hi.select("user_id").distinct().count()

    def runOnce(): Unit = {
      val stream = EventStreams.funnelStages(
        spark, EventStreams.readEvents(spark, s"$inDir/*.parquet")).toDF()
      val q = stream.writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          batch.write.mode("append").parquet(outDir)
        }
        .outputMode("update")
        .option("checkpointLocation", cpDir)
        .start()
      q.processAllAvailable()
      q.stop()
      q.awaitTermination()
    }

    lo.coalesce(1).write.parquet(s"$inDir/a.parquet")
    runOnce() // phase 1: early half only, then a clean kill
    val afterPhase1 = spark.read.parquet(outDir).count()
    assert(afterPhase1 == nUsersLo,
      "phase 1 must emit one funnel row per user seen in the early half")

    hi.coalesce(1).write.parquet(s"$inDir/b.parquet")
    runOnce() // phase 2: restart from the checkpoint with the late half landed
    val out = spark.read.parquet(outDir).cache()
    assert(out.count() == nUsersLo + nUsersHi,
      "the restart must process ONLY the late file (no re-emission for file a)")

    // state continuity: final per-user stages equal the batch q_funnel
    val stages = out.groupBy("user_id").agg(max("stage").as("stage"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val batch = graft.queries.StreamQueries.queries("q_funnel")(spark, sf)
      .collect().head
    assert(stages.values.count(_ >= 1).toLong == batch.getLong(0), "n_view")
    assert(stages.values.count(_ >= 2).toLong == batch.getLong(1), "n_view_click")
    assert(stages.values.count(_ >= 3).toLong == batch.getLong(2), "n_full_funnel")
    raw.unpersist(); out.unpersist()
  }

  test("stateful streaming funnel reaches the batch q_funnel step counts") {
    val stream = EventStreams.funnelStages(
      spark, EventStreams.readEvents(spark, eventsDir))
    val got = EventStreams.runToMemory(spark, stream.toDF(), "t_funnel", "update")
    // stages are monotone, so each user's final stage = max emitted
    val stages = got.groupBy("user_id").agg(max("stage").as("stage"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val batch = graft.queries.StreamQueries.queries("q_funnel")(spark, sf)
      .collect().head
    assert(stages.values.count(_ >= 1).toLong == batch.getLong(0), "n_view")
    assert(stages.values.count(_ >= 2).toLong == batch.getLong(1), "n_view_click")
    assert(stages.values.count(_ >= 3).toLong == batch.getLong(2), "n_full_funnel")
  }

  test("flatMapGroupsWithState keeps running per-user totals") {
    val stream = EventStreams.userRunningTotals(
      spark, EventStreams.readEvents(spark, eventsDir))
    val got = EventStreams.runToMemory(spark, stream.toDF(), "t_state", "append")
    // final state per user (last emitted row) must equal the batch agg
    val finalPerUser = got.groupBy("user_id")
      .agg(max("n_events").as("n_events"))
    val want = Tables.events(spark, sf).groupBy("user_id")
      .agg(count(lit(1)).as("n_events"))
    assert(finalPerUser.collect().map(_.toSeq).toSet ==
      want.collect().map(_.toSeq).toSet)
  }

  test("transformWithState budget admission equals a sequential replay and persists across batches") {
    val ss = spark
    import ss.implicits._
    // transformWithState requires the RocksDB provider (state vars
    // live there at scale anyway)
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    try {
      spark.conf.set(key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val budget = 400L
      val dir = java.nio.file.Files.createTempDirectory("graft-twsbatch")
      // batch 1: the real corpus file; batch 2 lands AFTER the first
      // processAllAvailable, so the spent-counter state must carry over
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sf/documents.parquet"),
        dir.resolve("a-documents.parquet"))
      val schema = Tables.documents(spark, sf).schema
      val stream = spark.readStream.schema(schema).parquet(dir.toString)
      val q = EventStreams.sourceBudgetAdmission(spark, stream.toDF(), budget)
        .toDF().writeStream.format("memory").queryName("t_tws")
        .outputMode("append").start()
      q.processAllAvailable()
      val batch1 = spark.table("t_tws").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(4)))
      // sequential truth: per source, docs in doc_id order admit while
      // they fit — the processor's declared deterministic contract
      val docs = Tables.documents(spark, sf)
        .select(col("source"), col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("tok"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      val expect = docs.groupBy(_._1).toSeq.flatMap { case (src, xs) =>
        var cur = 0L
        xs.sortBy(_._2).toSeq.map { case (_, id, tok) =>
          val ok = cur + tok <= budget
          if (ok) cur += tok
          (src, id, ok)
        }
      }.toSet
      assert(batch1.map(t => (t._1, t._2, t._4)).toSet == expect,
        "stream admission must equal the sequential per-source replay")
      batch1.groupBy(_._1).foreach { case (src, rows) =>
        val admitted = rows.filter(_._4).map(_._3).sum
        assert(admitted <= budget, s"$src overspent: $admitted > $budget")
      }
      // batch 2: a second file for one known source — its budget is
      // already (partially) spent, so admission must resume from the
      // carried state, not restart at zero
      val src0 = docs.head._1
      val spent0 = batch1.filter(r => r._1 == src0 && r._4).map(_._3).sum
      Seq((900001L, src0, "one two three"),
          (900002L, src0, ("w " * 500).trim))
        .toDF("doc_id", "source", "text")
        .select(col("doc_id"), lit("en").as("lang"), col("source"),
          col("text"), length(col("text")).as("n_chars"))
        .select(schema.fieldNames.map(col): _*)
        .write.mode("append").parquet(dir.toString)
      q.processAllAvailable()
      val batch2 = spark.table("t_tws")
        .filter(col("doc_id") >= 900000L).collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
        .sortBy(_._1)
      assert(batch2.length == 2)
      val (_, tokSmall, afterSmall, okSmall) = batch2(0)
      assert(okSmall == (spent0 + tokSmall <= budget),
        s"cross-batch admission must start from carried spent=$spent0")
      if (okSmall) assert(afterSmall == spent0 + tokSmall,
        "running total must include prior batches")
      assert(!batch2(1)._4, "the 500-token doc must overflow any remaining budget")
      q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("transformWithState ListState ring slides across batches per source") {
    val ss = spark
    import ss.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    try {
      spark.conf.set(key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val dir = java.nio.file.Files.createTempDirectory("graft-twsring")
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("source",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType)))
      def land(name: String, rows: Seq[(String, Long)]): Unit =
        rows.toDF("source", "doc_id")
          .coalesce(1).write.mode("overwrite")
          .parquet(dir.resolve(name).toString)
      land("b1", Seq(("web", 1L), ("web", 2L), ("crawl", 10L)))
      val stream = spark.readStream.schema(schema).parquet(s"$dir/*")
      val q = EventStreams.sourceRingProgress(spark, stream.toDF(), 2)
        .toDF().writeStream.format("memory").queryName("t_twsring")
        .outputMode("append").start()
      q.processAllAvailable()
      land("b2", Seq(("web", 3L)))
      q.processAllAvailable()
      q.stop()
      val rows = spark.table("t_twsring").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getSeq[Long](3)))
      assert(rows.exists(r => r._1 == "web" && r._3 == 2 &&
        r._4 == Seq(1L, 2L)), s"web batch-1 progress: ${rows.toSeq}")
      assert(rows.exists(r => r._1 == "crawl" && r._3 == 1 &&
        r._4 == Seq(10L)), s"crawl batch-1 progress: ${rows.toSeq}")
      // batch 2: the ring must carry ListState across batches and
      // slide (drop 1, keep 2-3); the count must accumulate
      assert(rows.exists(r => r._1 == "web" && r._3 == 3 &&
        r._4 == Seq(2L, 3L)),
        s"the last-k ring must slide across batches: ${rows.toSeq}")
      // an idle source emits nothing in a batch it didn't send in
      assert(rows.count(_._1 == "crawl") == 1)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("transformWithState MapState lang mix accumulates point-wise across batches") {
    val ss = spark
    import ss.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    try {
      spark.conf.set(key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val dir = java.nio.file.Files.createTempDirectory("graft-twsmap")
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("source",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("lang",
          org.apache.spark.sql.types.StringType)))
      def land(name: String, rows: Seq[(String, String)]): Unit =
        rows.toDF("source", "lang")
          .coalesce(1).write.mode("overwrite")
          .parquet(dir.resolve(name).toString)
      land("b1", Seq(("web", "en"), ("web", "en"), ("web", "es"),
        ("crawl", "zh")))
      val stream = spark.readStream.schema(schema).parquet(s"$dir/*")
      val q = EventStreams.sourceLangMix(spark, stream.toDF())
        .toDF().writeStream.format("memory").queryName("t_twsmap")
        .outputMode("append").start()
      q.processAllAvailable()
      land("b2", Seq(("web", "zh"), ("web", "es")))
      q.processAllAvailable()
      q.stop()
      val rows = spark.table("t_twsmap").collect()
        .map(r => (r.getString(0), r.getLong(1),
          r.getSeq[String](2), r.getSeq[Long](3)))
      // batch 1: per-source histograms, lang-sorted
      assert(rows.exists(r => r._1 == "web" && r._2 == 3 &&
        r._3 == Seq("en", "es") && r._4 == Seq(2L, 1L)),
        s"web batch-1 mix: ${rows.toSeq}")
      assert(rows.exists(r => r._1 == "crawl" && r._2 == 1 &&
        r._3 == Seq("zh") && r._4 == Seq(1L)),
        s"crawl batch-1 mix: ${rows.toSeq}")
      // batch 2: existing lang counts bump, a NEW lang key appears in
      // the carried MapState — point-wise updates, not a rebuild
      assert(rows.exists(r => r._1 == "web" && r._2 == 5 &&
        r._3 == Seq("en", "es", "zh") && r._4 == Seq(2L, 2L, 1L)),
        s"web batch-2 mix must carry and extend state: ${rows.toSeq}")
      // an idle source emits nothing in a batch it didn't send in
      assert(rows.count(_._1 == "crawl") == 1)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("stateful aggregation under the RocksDB state store matches the default provider") {
    // at 100 TB keyed state outgrows the default in-memory
    // (HDFSBackedStateStore) provider; RocksDB keeps state on local
    // disk with incremental checkpoints. Same query, same answer —
    // the provider is an operational knob, not a semantics change.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    try {
      spark.conf.set(key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val stream = EventStreams.userTotalsMapGroups(
        spark, EventStreams.readEvents(spark, eventsDir))
      val got = EventStreams.runToMemory(spark, stream.toDF(),
        "t_rocksdb", "update")
      val finalPerUser = got.groupBy("user_id")
        .agg(max("n_events").as("n_events"))
      val want = Tables.events(spark, sf).groupBy("user_id")
        .agg(count(lit(1)).as("n_events"))
      assert(finalPerUser.collect().map(_.toSeq).toSet ==
        want.collect().map(_.toSeq).toSet)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("streaming CDC apply converges to latest-wins state under out-of-order delivery") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-cdc").toString
    // batch A lands first, batch B second and carries BOTH stale
    // (lower-seq) and newer ops — the fold must keep max-seq per key
    val batchA = Seq(
      (1L, 10L, "U", 1.0), (2L, 11L, "D", 0.0), (3L, 12L, "U", 3.0),
      (4L, 13L, "U", 4.0), (5L, 30L, "D", 0.0))
    val batchB = Seq(
      (1L, 5L, "U", 9.9),   // stale late upsert: loses to seq 10
      (2L, 31L, "U", 2.2),  // re-insert after delete
      (3L, 6L, "D", 0.0),   // stale late delete: loses
      (4L, 35L, "D", 0.0),  // final delete
      (5L, 20L, "U", 5.5))  // stale vs the seq-30 tombstone
    batchA.toDF("c_custkey", "seq", "op", "v")
      .coalesce(1).write.parquet(s"$dir/a.parquet")
    batchB.toDF("c_custkey", "seq", "op", "v")
      .coalesce(1).write.parquet(s"$dir/b.parquet")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("c_custkey",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("seq",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("op",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.DoubleType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/*.parquet")
    val got = EventStreams.runToMemory(spark,
      EventStreams.cdcApplyStream(spark, stream).toDF(), "t_cdc", "update")
    // final state per key = the emitted update with the highest seq
    val fin = got.collect()
      .groupBy(_.getLong(0))
      .map { case (k, rows) => k -> rows.maxBy(_.getLong(1)) }
    val live = fin.filter(_._2.getString(2) != "D")
      .map { case (k, r) => k -> r.getDouble(3) }
    assert(live == Map(1L -> 1.0, 2L -> 2.2, 3L -> 3.0),
      s"live state wrong: $live")
    // tombstones stay in state (they must outrank stale late upserts)
    assert(fin(4L).getString(2) == "D" && fin(5L).getString(2) == "D")
    // the batch replay (max_by over the full log) agrees
    val all = batchA ++ batchB
    val batchWant = all.groupBy(_._1).map { case (k, ops) =>
      k -> ops.maxBy(_._2)
    }.filter(_._2._3 != "D").map { case (k, op) => k -> op._4 }
    assert(live == batchWant)
  }
}
