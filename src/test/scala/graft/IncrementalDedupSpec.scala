package graft

import org.apache.spark.sql.functions._
import graft.streaming.EventStreams
import scala.jdk.CollectionConverters._

/** Streaming near-dedup-as-you-land (EventStreams.dedupDocsIncremental):
  * survivor set must equal the batch rule "doc_id is minimal over every
  * band bucket it occupies", and must be invariant to how the landing
  * is split into micro-batches. */
class IncrementalDedupSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sf).select("doc_id", "text")

  /** Batch twin of the first-landed-wins rule under doc_id-ordered
    * landing: reject any doc sharing a band bucket with a smaller id. */
  private lazy val batchSurvivors: Set[Long] = {
    val b = EventStreams.minhashBandBuckets(docs)
    val rejected = b.as("a")
      .join(b.as("b"),
        col("a.band") === col("b.band") &&
          col("a.bucket") === col("b.bucket") &&
          col("b.doc_id") < col("a.doc_id"))
      .select(col("a.doc_id")).distinct()
    docs.join(rejected, Seq("doc_id"), "left_anti")
      .select("doc_id").collect().map(_.getLong(0)).toSet
  }

  /** Land `parts` id-ordered document slices one file at a time and run
    * the incremental dedup stream over them; return survivor doc_ids. */
  private def streamSurvivors(parts: Int): Set[Long] = {
    val root = java.nio.file.Files.createTempDirectory("graft-incdedup")
    val in = root.resolve("in"); val state = root.resolve("state")
    val out = root.resolve("out")
    java.nio.file.Files.createDirectories(in)
    val maxId = docs.agg(max("doc_id")).head.getLong(0)
    val step = maxId / parts + 1
    val stream = spark.readStream
      .schema(docs.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(in.toString)
    val q = EventStreams.dedupDocsIncremental(
      stream, state.toString, out.toString)
    try {
      (0 until parts).foreach { i =>
        // land each slice as a FLAT file (the file source does not list
        // nested dirs): write to a scratch dir, move the part file in
        val scratch = root.resolve(s"scratch$i")
        docs.filter(col("doc_id") >= i * step && col("doc_id") < (i + 1) * step)
          .coalesce(1).write.parquet(scratch.toString)
        val part = java.nio.file.Files.list(scratch).iterator().asScala
          .find(_.toString.endsWith(".parquet")).get
        java.nio.file.Files.move(part, in.resolve(s"slice$i.parquet"))
        q.processAllAvailable() // one landing fully processed before the next
      }
    } finally q.stop()
    spark.read.parquet(out.toString)
      .select("doc_id").collect().map(_.getLong(0)).toSet
  }

  test("3-batch streamed survivors equal the batch min-per-bucket rule") {
    val streamed = streamSurvivors(3)
    assert(streamed == batchSurvivors,
      s"stream-only: ${streamed -- batchSurvivors}; " +
        s"batch-only: ${batchSurvivors -- streamed}")
  }

  test("survivor set is invariant to batch split (1 batch = batch rule)") {
    assert(streamSurvivors(1) == batchSurvivors)
  }

  test("dedup actually rejects something and keeps every unshingled doc") {
    val all = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(batchSurvivors.size < all.size, "no duplicates rejected at all")
    // docs under 3 words emit no buckets and must always survive
    val tiny = docs.filter(size(split(col("text"), " ")) < 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(tiny.subsetOf(batchSurvivors))
  }

  /** Land `input` as `parts` id-ordered slices through the span-level
    * incremental dedup; return doc_id → (clean_text, n_kept). */
  private def streamSpans(input: org.apache.spark.sql.DataFrame,
      parts: Int): Map[Long, (String, Long)] = {
    val root = java.nio.file.Files.createTempDirectory("graft-incspans")
    val in = root.resolve("in"); val state = root.resolve("state")
    val out = root.resolve("out")
    java.nio.file.Files.createDirectories(in)
    val maxId = input.agg(max("doc_id")).head.getLong(0)
    val step = maxId / parts + 1
    val stream = spark.readStream
      .schema(input.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(in.toString)
    val q = EventStreams.dedupSpansIncremental(
      stream, state.toString, out.toString)
    try {
      (0 until parts).foreach { i =>
        val scratch = root.resolve(s"scratch$i")
        input.filter(col("doc_id") >= i * step && col("doc_id") < (i + 1) * step)
          .coalesce(1).write.parquet(scratch.toString)
        val part = java.nio.file.Files.list(scratch).iterator().asScala
          .find(_.toString.endsWith(".parquet")).get
        java.nio.file.Files.move(part, in.resolve(s"slice$i.parquet"))
        q.processAllAvailable()
      }
    } finally q.stop()
    spark.read.parquet(out.toString).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
  }

  test("1-batch streamed span dedup reproduces the batch q_dedup_spans verbatim") {
    val want = graft.queries.TextQueries.queries("q_dedup_spans")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    val got = streamSpans(docs, 1)
    assert(got.keySet == want.keySet)
    want.foreach { case (id, v) =>
      assert(got(id) == v, s"doc $id: got ${got(id)} want $v")
    }
  }

  test("later-batch spans are dropped when an earlier batch claimed them") {
    val boiler = (1 to 16).map(i => s"s$i").mkString(" ")
    val u1 = (1 to 16).map(i => s"p$i").mkString(" ")
    val u2 = (1 to 16).map(i => s"q$i").mkString(" ")
    // ids chosen so a 2-way split lands doc 1 before doc 9000000
    val input = spark.createDataFrame(Seq(
      (1L, s"$boiler $u1"),
      (9000000L, s"$boiler $u2")))
      .toDF("doc_id", "text")
    val got = streamSpans(input, 2)
    // batch 1: boiler is unique within its batch → doc 1 keeps it all
    assert(got(1L) == (s"$boiler $u1", 2L), s"doc 1: ${got.get(1L)}")
    // batch 2: boiler already in state → dropped; unique half survives
    assert(got(9000000L) == (u2, 1L), s"doc 2: ${got.get(9000000L)}")
  }
}
