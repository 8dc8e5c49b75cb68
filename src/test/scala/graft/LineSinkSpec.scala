package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The V2 write path: two-phase commit semantics of the LineSink
  * connector — staging isolation, atomic publish, abort cleanup. */
class LineSinkSpec extends SparkSpec {

  test("a committed write publishes every row exactly once + _SUCCESS last") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sink").toString
    val df = spark.range(0, 1000, 1, 4)
      .select(col("id"), (col("id") % 7).as("grp"))
    df.write.format("graft.sources.LineSink")
      .mode("append").option("path", dir).save()
    val files = new java.io.File(dir).listFiles()
    assert(files.exists(_.getName == "_SUCCESS"), "commit marker missing")
    val parts = files.filter(_.getName.startsWith("part-"))
    assert(parts.length == 4, s"expected 4 task files, got ${parts.length}")
    // staging fully cleaned after publish
    assert(!new java.io.File(dir, "_staging").exists(),
      "staging directory must not survive a commit")
    val lines = parts.flatMap(f =>
      scala.io.Source.fromFile(f).getLines().toSeq)
    assert(lines.length == 1000)
    val ids = lines.map(_.split(",")(0).toLong).sorted
    assert(ids.sameElements(0L until 1000L), "rows lost or duplicated")
    lines.foreach { l =>
      val Array(id, grp) = l.split(",")
      assert(grp.toLong == id.toLong % 7)
    }
  }

  test("hostile string values round-trip through the escaped line format") {
    val ss = spark
    import ss.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-sink-esc").toString
    val hostile = Seq(
      (1L, "plain"),
      (2L, "comma, inside"),
      (3L, "line\nbreak and\rreturn"),
      (4L, "back\\slash and \\, pre-escaped"),
      (5L, ""))
    hostile.toDF("id", "s").repartition(1)
      .write.format("graft.sources.LineSink")
      .mode("append").option("path", dir).save()
    val part = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("part-")).head
    val lines = scala.io.Source.fromFile(part).getLines().toSeq
    // embedded \n in a value must NOT add physical lines
    assert(lines.length == hostile.length,
      s"escaping must keep one physical line per row, got ${lines.length}")
    val decoded = lines.map(graft.sources.LineSink.unescapeLine)
      .map(f => f(0).toLong -> f(1)).toMap
    hostile.foreach { case (id, s) =>
      assert(decoded(id) == s, s"row $id failed to round-trip: '${decoded(id)}'")
    }
  }

  test("task abort leaves nothing observable; job abort clears staging") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sink-abort")
      .toString
    val schema = StructType(Seq(StructField("id", LongType)))
    val bw = new graft.sources.LineBatchWrite(dir, "q-test", schema)
    val factory = bw.createBatchWriterFactory(null)
    // task 0 writes then ABORTS: its staging file must vanish
    val w0 = factory.createWriter(0, 100L)
    w0.write(org.apache.spark.sql.catalyst.InternalRow(1L))
    w0.abort()
    // task 1 writes and commits its message
    val w1 = factory.createWriter(1, 101L)
    w1.write(org.apache.spark.sql.catalyst.InternalRow(2L))
    val msg = w1.commit()
    // nothing observable in the target before the driver commit
    val before = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") || f.getName == "_SUCCESS")
    assert(before.isEmpty, "staged data leaked before commit")
    bw.commit(Array(msg))
    val after = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("part-"))
    assert(after.length == 1, "only the committed task's file publishes")
    val lines = scala.io.Source.fromFile(after.head).getLines().toSeq
    assert(lines == Seq("2"), s"aborted task's row leaked: $lines")
  }

  test("a second write with a different query id does not disturb the first") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sink-2q").toString
    spark.range(0, 10).write.format("graft.sources.LineSink")
      .mode("append").option("path", dir).save()
    spark.range(10, 30).write.format("graft.sources.LineSink")
      .mode("append").option("path", dir).save()
    val lines = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("part-"))
      .flatMap(f => scala.io.Source.fromFile(f).getLines().toSeq)
      .map(_.toLong).sorted
    assert(lines.sameElements(0L until 30L),
      "appends from two queries must union exactly")
  }
}
