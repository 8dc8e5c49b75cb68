package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming over the events table (SURVEY.md §2.10).
  *
  * The reference is batch-only; this is the engine extension: the same
  * window expressions as queries.StreamQueries' batch twins, driven by
  * a file stream with event-time watermarks. Batch/stream parity is
  * asserted in tests (the batch query is the oracle for the stream).
  *
  * Scale notes: file-source streaming partitions work by file; state
  * (windows, sessions, dedup, per-user running state) is keyed and
  * lives in the state store per shuffle partition — nothing global.
  * Watermarks bound state: without them a 100 TB backfill would pin
  * every window open forever.
  */
object EventStreams {

  /** The events schema as the file stream must declare it (streaming
    * sources cannot infer). ts has shipped both as TIMESTAMP(NANOS)
    * (read as long, see Tables.events) and as TIMESTAMP(MICROS). */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),   // TIMESTAMP(NANOS) read as long
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream over a directory of events parquet files.
    * Streaming sources need a static declared schema, so probe the
    * on-disk ts type with a one-file batch read first (driver-side
    * footer read, O(1)) and declare/convert to match — same
    * schema-adaptivity as Tables.events. */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // A stream must be definable on an EMPTY landing directory (files
    // arrive later) — if the batch probe can't infer (no files yet),
    // fall back to the declared rawSchema's long ts rather than throw.
    val onDisk =
      try spark.read.parquet(dir).schema("ts").dataType
      catch { case _: org.apache.spark.sql.AnalysisException =>
        rawSchema("ts").dataType }
    val schema = StructType(rawSchema.map(f =>
      if (f.name == "ts") f.copy(dataType = onDisk) else f))
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    onDisk match {
      case LongType =>
        stream.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case TimestampNTZType =>
        // naive-as-UTC, same convention as Tables.events: pure NTZ field
        // arithmetic, identical under any session timezone (defining a
        // stream must not mutate session state).
        stream.withColumn("ts", expr(
          "timestamp_micros(timestampdiff(MICROSECOND, " +
            "TIMESTAMP_NTZ'1970-01-01 00:00:00', ts))"))
      case _ => stream
    }
  }

  /** Rate source (engine extension): Spark's built-in load generator
    * mapped onto the events shape — soak/throughput testing of any
    * downstream streaming operator without a file fixture. Uses the
    * "rate-micro-batch" variant: a FIXED row count per batch and
    * deterministic timestamps (batch k ⇒ startTimestamp +
    * k·advanceMillis for every row in it), so results are reproducible
    * — the plain "rate" source keys row counts to wall-clock, which is
    * the right tool for throughput soak but not for tests.
    * event_id is the generator's monotonically increasing value;
    * user/type/value are pure functions of it. */
  def rateEvents(spark: SparkSession, rowsPerBatch: Int = 60,
      advanceMillisPerBatch: Long = 20L * 60 * 1000): DataFrame =
    spark.readStream
      .format("rate-micro-batch")
      .option("rowsPerBatch", rowsPerBatch)
      .option("startTimestamp", "0")
      .option("advanceMillisPerBatch", advanceMillisPerBatch)
      .load()
      .select(
        col("value").as("event_id"),
        col("timestamp").as("ts"),
        pmod(col("value"), lit(50L)).as("user_id"),
        element_at(
          typedLit(Seq("view", "click", "purchase")),
          (pmod(col("value"), lit(3L)) + 1).cast("int")).as("event_type"),
        (pmod(col("value") * 37L, lit(1000L)) / lit(10.0)).as("value"))

  /** Tumbling 1-hour event-time windows with a 10-minute watermark —
    * the streaming twin of q_window_tumbling. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(
        unix_timestamp(col("window.start")).as("w_start"),
        col("event_type"), col("n"), col("sum_value"))

  /** Sliding 1-hour/30-minute windows — twin of q_window_sliding. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(
        unix_timestamp(col("window.start")).as("w_start"),
        col("event_type"), col("n"), col("sum_value"))

  /** Per-user session windows (30-minute gap) — twin of
    * q_session_window. */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))
      .select(
        col("user_id"),
        unix_micros(col("session_window.start")).as("s_start_us"),
        col("n_events"), col("sum_value"))

  /** Watermark-bounded exactly-once-ish dedup on event_id. */
  def dedupedEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming count-min sketch — heavy-hitter detection over an
    * unbounded key stream, the streaming face of the batch
    * `q_heavy_hitters` family: the 4×256 additive-counter grid as a
    * plain streaming aggregate. The sketch's MERGEABILITY is exactly
    * why it is streaming-native — state is the 1024 cells and never
    * anything else, no matter how many events arrive or how hot one
    * key runs (the shape that makes per-key exact counting explode is
    * absorbed by bounded collision buckets). Same md5-prefix row
    * hashes as the batch sketch, so stream state ≡ the batch sketch
    * over the same rows (pinned in StreamingSpec), and a sketch
    * snapshot merges with any other by cell-wise addition. */
  def cmSketchCells(events: DataFrame): DataFrame =
    events
      .select(col("user_id"),
        explode(array((0 until 4).map(lit): _*)).as("h_row"))
      .withColumn("bucket", substring(
        md5(concat_ws("|", col("h_row"), col("user_id"))), 1, 2))
      .groupBy("h_row", "bucket")
      .agg(count(lit(1)).as("cell"))

  /** Stream-static decontamination — scrub-as-you-land: newly landed
    * documents explode to their word-3-gram shingles (the
    * [[graft.queries.TextQueries.shingleArraySql]] contract, xxhash64
    * identities on both sides) and probe the STATIC eval-slice shingle
    * set with a stream-static inner equi-join. Stream-static joins are
    * STATELESS — the static side is a plain batch relation (broadcast
    * when small), no watermark, no state store — so this is the
    * incremental form of q_decontaminate whose per-batch cost scales
    * with the batch, never the corpus. Emits contaminated doc_ids;
    * dropDuplicates collapses multi-shingle hits (state ∝ contaminated
    * docs — at 100 TB bound it with a watermark on an ingest-time
    * column, or leave the per-batch duplicates to the sink's dedup). */
  def decontaminateStream(docsStream: DataFrame, evalShingles: DataFrame): DataFrame =
    docsStream
      .withColumn("w", split(col("text"), " "))
      .select(col("doc_id"),
        explode(expr(graft.queries.TextQueries.shingleArraySql)).as("sh_str"))
      .select(col("doc_id"), xxhash64(col("sh_str")).as("shingle"))
      .join(evalShingles.select("shingle"), "shingle")
      .select("doc_id")
      .dropDuplicates("doc_id")

  /** MinHash band buckets of a documents BATCH — the same scheme as the
    * batch dedup family (q_dedup_minhash: word-3-gram shingles, xxhash64
    * identities, k=32 min-hashes, 8 bands × 4 rows), factored over a
    * DataFrame instead of a table dir so the streaming sink below can
    * apply it per micro-batch. One row per (doc_id, band) with the
    * band's bucket key; docs under 3 words emit no rows (no signal ⇒
    * never blocked, like the batch path). */
  def minhashBandBuckets(docs: DataFrame): DataFrame =
    docs.withColumn("w", split(col("text"), " "))
      .select(col("doc_id"),
        explode(expr(graft.queries.TextQueries.shingleArraySql)).as("sh_str"))
      .select(col("doc_id"), xxhash64(col("sh_str")).as("shingle"))
      .distinct()
      .groupBy("doc_id")
      .agg(array((0 until 32).map(i =>
        min(xxhash64(col("shingle"), lit(i)))): _*).as("mh"))
      .select(col("doc_id"),
        posexplode(expr(
          "transform(sequence(0, 7), b -> hash(slice(mh, b * 4 + 1, 4), b))"))
          .as(Seq("band", "bucket")))

  /** Near-dedup-as-you-land: the streaming twin of the batch MinHash
    * blocking family, as a foreachBatch sink. Each micro-batch of newly
    * landed documents is checked against the ACCUMULATED band-bucket
    * state (every bucket of every doc seen so far, an append-only
    * parquet log under `stateDir`): a doc is rejected when any of its 8
    * band buckets was already claimed — by a prior batch, or by a
    * smaller-id doc in the same batch — and survivors append to
    * `outDir`.
    *
    * Semantics: FIRST-LANDED WINS, i.e. a doc survives iff no
    * earlier-landed (or smaller-id in-batch) doc shares a band bucket.
    * When files land in doc_id order this is exactly the batch rule
    * "doc_id is the minimum over every bucket it occupies", so the
    * survivor set is INVARIANT to how the landing is split into batches
    * — asserted in IncrementalDedupSpec (1-batch ≡ 3-batch ≡ batch
    * query).
    *
    * Scale shape: per-batch cost is the batch's shingling plus one
    * equi-join of the batch's buckets (tiny) against the state log
    * keyed on (band, bucket) — shuffle ∝ batch + matched state rows,
    * never corpus × corpus, the same batch-proportional contract as
    * q_dedup_incremental. The state log is append-only parquet (at
    * 100 TB: a compacted, bucket-partitioned table or a key-value
    * store); exactly-once comes from the checkpointed batch id plus
    * idempotent per-batch overwrite-by-path (here: plain appends —
    * replay of a failed batch can duplicate a survivors file, the
    * documented at-least-once caveat of parquet-append foreachBatch
    * sinks). */
  def dedupDocsIncremental(docsStream: DataFrame, stateDir: String,
      outDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    docsStream.writeStream
      .option("checkpointLocation", s"$stateDir/_checkpoint")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val s = batch.sparkSession
        val bucketsPath = s"$stateDir/buckets"
        val b = minhashBandBuckets(batch.toDF()).persist()
        // Hadoop-FS existence, not java.io.File (see dedupSpansIncremental)
        val hBuckets = new org.apache.hadoop.fs.Path(bucketsPath)
        val bucketsFs = hBuckets.getFileSystem(s.sparkContext.hadoopConfiguration)
        val stateHit =
          if (bucketsFs.exists(hBuckets))
            b.join(s.read.parquet(bucketsPath), Seq("band", "bucket"), "left_semi")
              .select("doc_id")
          else s.emptyDataFrame.select(lit(0L).as("doc_id")).limit(0)
        val wB = org.apache.spark.sql.expressions.Window.partitionBy("band", "bucket")
        val inBatchHit = b
          .withColumn("mn", min("doc_id").over(wB))
          .filter(col("doc_id") =!= col("mn"))
          .select("doc_id")
        val rejected = stateHit.union(inBatchHit).distinct()
        batch.join(rejected, Seq("doc_id"), "left_anti")
          .write.mode("append").parquet(outDir)
        // ALL seen buckets enter the state (rejected docs' too): the
        // first-landed claim holds even when the claimant itself lost a
        // different bucket — matching the min-over-every-bucket batch rule
        b.write.mode("append").parquet(bucketsPath)
        b.unpersist()
        ()
      }
      .start()

  /** Span-level dedup-as-you-land — the streaming twin of the batch
    * q_dedup_spans (CCNet-style line dedup), completing batch≡stream
    * parity for the SALVAGING dedup path the way
    * [[dedupDocsIncremental]] does for whole-doc rejection. Each
    * micro-batch's 16-word chunk spans (the shared
    * [[graft.queries.TextQueries.chunkSpans]] builder) are dropped
    * when (a) the span was seen in ANY earlier batch (the append-only
    * span-key state log under `stateDir`, doc-agnostic — a doc
    * re-landing its own earlier boilerplate loses it, the streaming
    * approximation CCNet makes too), or (b) the span appears in more
    * than one doc of the CURRENT batch — exactly the batch operator's
    * cross-doc rule, so a single batch containing the whole corpus
    * reproduces q_dedup_spans verbatim (asserted in
    * IncrementalDedupSpec). Survivor docs are reassembled in span
    * order and appended to `outDir`.
    *
    * Scale shape: per-batch cost is the batch's chunking plus one
    * span-keyed anti-join against the state log — shuffle ∝ batch +
    * matched state rows, the q_dedup_incremental contract. At 100 TB
    * the state log keys become xxhash64 digests in a compacted
    * bucket-partitioned table; the at-least-once append caveat of
    * [[dedupDocsIncremental]] applies unchanged. */
  def dedupSpansIncremental(docsStream: DataFrame, stateDir: String,
      outDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    docsStream.writeStream
      .option("checkpointLocation", s"$stateDir/_checkpoint")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val s = batch.sparkSession
        val spansPath = s"$stateDir/spans"
        val sp = graft.queries.TextQueries.chunkSpans(batch.toDF()).persist()
        val dupInBatch = sp.groupBy("span")
          .agg(countDistinct("doc_id").as("nd"))
          .filter(col("nd") > 1).select("span")
        val kept0 = sp.join(dupInBatch, Seq("span"), "left_anti")
        // state existence resolved through the session's Hadoop
        // FileSystem, NOT java.io.File: a java.io check is always
        // false for hdfs://-s3a:// state dirs, which would silently
        // ignore earlier batches' spans and let duplicates through —
        // off local disk this must work or fail loudly, never degrade
        val hPath = new org.apache.hadoop.fs.Path(spansPath)
        val fs = hPath.getFileSystem(s.sparkContext.hadoopConfiguration)
        val kept =
          if (fs.exists(hPath))
            kept0.join(s.read.parquet(spansPath), Seq("span"), "left_anti")
          else kept0
        graft.queries.TextQueries
          .reassembleSpans(batch.toDF().select("doc_id"), kept)
          .write.mode("append").parquet(outDir)
        // EVERY span seen this batch claims the state — kept or not:
        // a span that lost in-batch must still block later landings
        sp.select("span").distinct().write.mode("append").parquet(spansPath)
        sp.unpersist()
        ()
      }
      .start()

  case class SourceAdmit(source: String, doc_id: Long, tok: Long,
      spent_after: Long, admitted: Boolean)

  /** Per-source token-budget admission gate on Spark 4's
    * `transformWithState` — the arbitrary-state API that replaces
    * mapGroupsWithState with TYPED, individually-evolvable state
    * variables (ValueState/ListState/MapState + TTL + timers) behind
    * a StatefulProcessor lifecycle. The operator is the streaming twin
    * of the q_source_cap curation rule: each source admits documents
    * until its token budget is spent, across micro-batches, and every
    * doc is emitted with its verdict and the running total.
    *
    * Determinism: within a batch the rows of a key are buffered and
    * admitted in doc_id order, so the verdict set is independent of
    * shuffle arrival order — the same contract the batch rule's
    * deterministic ordering gives. State is ONE long per source
    * (bounded by |sources|, not corpus); requires the RocksDB state
    * store provider, which is where this state lives at 100 TB
    * anyway. */
  class SourceBudgetProcessor(budget: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, (String, Long, Long), SourceAdmit] {
    @transient private var spent:
      org.apache.spark.sql.streaming.ValueState[Long] = _
    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
      spent = getHandle.getValueState[Long]("spent",
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)
      ()
    }
    override def handleInputRows(key: String,
        rows: Iterator[(String, Long, Long)],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[SourceAdmit] = {
      var cur = if (spent.exists()) spent.get() else 0L
      val out = rows.toSeq.sortBy(_._2).map { case (_, docId, tok) =>
        val admit = cur + tok <= budget
        if (admit) cur += tok
        SourceAdmit(key, docId, tok, cur, admit)
      }
      spent.update(cur)
      out.iterator
    }
  }

  /** documents stream → per-source budget admission (see
    * [[SourceBudgetProcessor]]). */
  def sourceBudgetAdmission(spark: SparkSession, docs: DataFrame,
      budget: Long): Dataset[SourceAdmit] = {
    import spark.implicits._
    docs.select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("tok"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new SourceBudgetProcessor(budget),
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Append())
  }

  case class SourceFlush(source: String, kind: String, n_docs: Long,
      recent_ids: Seq[Long])

  /** ListState rung of the transformWithState API (the one
    * [[SourceBudgetProcessor]]'s single counter doesn't exercise):
    * per source, a sliding last-k doc_id ring in a ListState plus a
    * running ValueState count, emitted as one progress row per batch —
    * the landing-zone bookkeeping ("what arrived last, how much
    * total") a corpus ingest manifest keeps per source. State is k
    * ids + one long per source, bounded by |sources| regardless of
    * corpus size. Timers (handleExpiredTimer) are deliberately NOT
    * used: an always-expired processing-time timer keeps the
    * micro-batch loop from quiescing (processAllAvailable never
    * returns), so idle-flush semantics belong to event-time
    * watermarks, not a unit-testable processing-time loop. */
  class SourceRingProcessor(k: Int)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, (String, Long), SourceFlush] {
    @transient private var recent:
      org.apache.spark.sql.streaming.ListState[Long] = _
    @transient private var nDocs:
      org.apache.spark.sql.streaming.ValueState[Long] = _
    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
      recent = getHandle.getListState[Long]("recent",
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)
      nDocs = getHandle.getValueState[Long]("nDocs",
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)
      ()
    }
    override def handleInputRows(key: String,
        rows: Iterator[(String, Long)],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[SourceFlush] = {
      val ids = rows.map(_._2).toSeq.sorted
      val n = (if (nDocs.exists()) nDocs.get() else 0L) + ids.length
      nDocs.update(n)
      val ring = (recent.get().toSeq ++ ids).takeRight(k)
      recent.clear()
      ring.foreach(recent.appendValue)
      Iterator.single(SourceFlush(key, "progress", n, ring))
    }
  }

  /** documents stream → per-source progress rows with the sliding
    * last-k ring (see [[SourceRingProcessor]]). */
  def sourceRingProgress(spark: SparkSession, docs: DataFrame,
      k: Int): Dataset[SourceFlush] = {
    import spark.implicits._
    docs.select(col("source"), col("doc_id"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .transformWithState(new SourceRingProcessor(k),
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Append())
  }

  case class SourceLangMix(source: String, n_docs: Long,
      langs: Seq[String], counts: Seq[Long])

  /** MapState rung of the transformWithState API — the third typed
    * state primitive beside [[SourceBudgetProcessor]]'s ValueState
    * and [[SourceRingProcessor]]'s ListState: per source, a
    * lang → doc-count histogram in a MapState, emitted each batch as
    * one manifest row with the full (lang-sorted) mix — the streaming
    * twin of the batch q_lang_source_share composition read, kept
    * incrementally as the corpus lands. A MapState is the right
    * shape here because the key set (languages seen per source) is
    * unknown upfront and updates are point-wise per language; state
    * is |langs| longs per source — bounded by the language vocab,
    * never corpus-sized. RocksDB provider required, like the other
    * two rungs. */
  class SourceLangMixProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, (String, String), SourceLangMix] {
    @transient private var byLang:
      org.apache.spark.sql.streaming.MapState[String, Long] = _
    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
      byLang = getHandle.getMapState[String, Long]("byLang",
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)
      ()
    }
    override def handleInputRows(key: String,
        rows: Iterator[(String, String)],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[SourceLangMix] = {
      rows.foreach { case (_, lang) =>
        val cur = if (byLang.containsKey(lang)) byLang.getValue(lang)
          else 0L
        byLang.updateValue(lang, cur + 1L)
      }
      val mix = byLang.iterator().toSeq.sortBy(_._1)
      Iterator.single(SourceLangMix(key, mix.map(_._2).sum,
        mix.map(_._1), mix.map(_._2)))
    }
  }

  /** documents stream → per-source incremental language-mix manifest
    * (see [[SourceLangMixProcessor]]). */
  def sourceLangMix(spark: SparkSession, docs: DataFrame)
      : Dataset[SourceLangMix] = {
    import spark.implicits._
    docs.select(col("source"), col("lang"))
      .as[(String, String)]
      .groupByKey(_._1)
      .transformWithState(new SourceLangMixProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Append())
  }

  case class UserTotal(user_id: Long, n_events: Long, total_value: Double)

  /** mapGroupsWithState variant: one state row per user per batch
    * (Update mode), the 1:1 sibling of flatMapGroupsWithState below. */
  def userTotalsMapGroups(spark: SparkSession, events: DataFrame): Dataset[UserTotal] = {
    import spark.implicits._
    events
      .select(col("user_id"), col("value"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[UserTotal, UserTotal](GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[(Long, Double)], state: GroupState[UserTotal]) =>
          val prev = state.getOption.getOrElse(UserTotal(userId, 0L, 0.0))
          var n = prev.n_events
          var tot = prev.total_value
          rows.foreach { case (_, v) => n += 1; tot += v }
          val next = UserTotal(userId, n, tot)
          state.update(next)
          next
      }
  }

  case class CdcRow(c_custkey: Long, seq: Long, op: String, v: Double)

  /** Streaming CDC apply — the incremental twin of the batch
    * q_cdc_apply (TemporalQueries): a keyed latest-wins register in
    * mapGroupsWithState. Each key's state is the op with the highest
    * sequence number seen SO FAR; because the fold keeps max-seq
    * regardless of arrival order, out-of-order CDC delivery across
    * micro-batches converges to the same final state as the batch
    * max_by replay (asserted in StreamingSpec). State is one (seq,
    * op, v) register per live key — snapshot-sized, never log-sized;
    * deletes stay IN state (a tombstone must outrank stale earlier
    * upserts that may still arrive) and are filtered at read time. */
  def cdcApplyStream(spark: SparkSession, ops: DataFrame): Dataset[CdcRow] = {
    import spark.implicits._
    ops.select(col("c_custkey"), col("seq"), col("op"), col("v"))
      .as[(Long, Long, String, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[CdcRow, CdcRow](GroupStateTimeout.NoTimeout()) {
        (key: Long, rows: Iterator[(Long, Long, String, Double)],
            state: GroupState[CdcRow]) =>
          var best = state.getOption
            .getOrElse(CdcRow(key, Long.MinValue, "D", 0.0))
          rows.foreach { case (_, seq, op, v) =>
            if (seq > best.seq) best = CdcRow(key, seq, op, v)
          }
          state.update(best)
          best
      }
  }

  /** foreachBatch sink: apply an arbitrary batch write (here: append
    * parquet partitioned by event_type) per micro-batch — the
    * batch-sink escape hatch for sinks without native streaming
    * support. */
  def writeViaForeachBatch(df: DataFrame, outDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batch.write.mode("append").partitionBy("event_type").parquet(outDir)
      }
      .outputMode("append")
      .start()

  /** Custom keyed state via flatMapGroupsWithState: per-user running
    * event count + value total, emitted on every update. */
  def userRunningTotals(spark: SparkSession, events: DataFrame): Dataset[UserTotal] = {
    import spark.implicits._
    events
      .select(col("user_id"), col("value"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[UserTotal, UserTotal](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[(Long, Double)], state: GroupState[UserTotal]) =>
          val prev = state.getOption.getOrElse(UserTotal(userId, 0L, 0.0))
          var n = prev.n_events
          var tot = prev.total_value
          rows.foreach { case (_, v) => n += 1; tot += v }
          val next = UserTotal(userId, n, tot)
          state.update(next)
          Iterator(next)
      }
  }

  case class FunnelState(t1: Long, t2: Long, t3: Long)
  case class FunnelStage(user_id: Long, stage: Int)

  /** Stateful per-user funnel — the streaming twin of StreamQueries'
    * q_funnel (view → click ≤24 h → purchase ≤24 h): a keyed state
    * machine in flatMapGroupsWithState that folds each user's events in
    * event-time order and emits the user's current stage (0-3) whenever
    * the group is touched. Timestamps fold as integer epoch-micros,
    * matching the batch query exactly. Stage transitions are monotone
    * (first view, then first qualifying click, then first qualifying
    * purchase), so per-batch event-time sorting + keyed state equals the
    * batch result whenever each user's events arrive in event-time order
    * across triggers; the parity test drives it from the single-file
    * fixture where that holds. State is 3 longs per user — bounded. */
  def funnelStages(spark: SparkSession, events: DataFrame): Dataset[FunnelStage] = {
    import spark.implicits._
    val dayUs = 86400000000L
    events
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("tus"))
      .as[(Long, String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[FunnelState, FunnelStage](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[(Long, String, Long)],
         state: GroupState[FunnelState]) =>
          var s = state.getOption.getOrElse(FunnelState(-1L, -1L, -1L))
          rows.toSeq.sortBy(_._3).foreach { case (_, typ, t) =>
            typ match {
              case "view" if s.t1 < 0 => s = s.copy(t1 = t)
              case "click" if s.t1 >= 0 && s.t2 < 0 &&
                t > s.t1 && t <= s.t1 + dayUs => s = s.copy(t2 = t)
              case "purchase" if s.t2 >= 0 && s.t3 < 0 &&
                t > s.t2 && t <= s.t2 + dayUs => s = s.copy(t3 = t)
              case _ => ()
            }
          }
          state.update(s)
          Iterator(FunnelStage(userId, Seq(s.t1, s.t2, s.t3).count(_ >= 0)))
      }
  }

  /** Stream-stream interval join: each click joins purchases by the
    * same user within the preceding hour. Both sides carry watermarks
    * so the join state is bounded — the unbounded-state stream join is
    * the other classic 100 TB backfill deadlock (alongside missing
    * watermarks on aggregations). */
  def clickPurchaseJoin(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", "10 minutes")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("value").as("p_value"))
      .withWatermark("p_ts", "10 minutes")
    clicks.join(purchases,
      col("c_user") === col("p_user") &&
        col("p_ts") >= col("c_ts") - expr("INTERVAL 1 HOUR") &&
        col("p_ts") <= col("c_ts"))
      .select(col("click_id"), col("c_user").as("user_id"),
        unix_micros(col("c_ts")).as("click_us"),
        unix_micros(col("p_ts")).as("purchase_us"),
        round(col("p_value"), 2).as("purchase_value"))
  }

  /** LEFT OUTER watermarked interval join — the attribution join where
    * UNCONVERTED clicks must still appear (they are the denominator of
    * every conversion rate). Exercises the outer-join semantics the
    * inner form never does: Spark holds each unmatched click in state
    * until the watermark passes its join window's upper bound, then
    * emits it once with a null purchase side — so the stream's output
    * is eventually-complete, not batch-instant, and the spec drives
    * the watermark forward explicitly to observe the null emissions.
    * Same interval and 10-minute watermarks as [[clickPurchaseJoin]].
    *
    * Scale shape: identical to the inner form — state is bounded by
    * the watermark horizon on both sides; the outer variant adds only
    * the deferred left-row buffer, which the same horizon bounds. */
  def clickPurchaseLeftJoin(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", "10 minutes")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("value").as("p_value"))
      .withWatermark("p_ts", "10 minutes")
    clicks.join(purchases,
      col("c_user") === col("p_user") &&
        col("p_ts") >= col("c_ts") - expr("INTERVAL 1 HOUR") &&
        col("p_ts") <= col("c_ts"),
      "leftOuter")
      .select(col("click_id"), col("c_user").as("user_id"),
        unix_micros(col("c_ts")).as("click_us"),
        unix_micros(col("p_ts")).as("purchase_us"),
        round(col("p_value"), 2).as("purchase_value"))
  }

  /** Drive any streaming frame to completion against an in-memory
    * table; returns the materialized result. Used by tests and demos —
    * production sinks are writeStream.format("parquet"/"kafka"/...). */
  def runToMemory(spark: SparkSession, df: DataFrame, name: String,
      outputMode: String = "append"): DataFrame = {
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(outputMode)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }
}
