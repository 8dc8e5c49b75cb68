package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Compaction

/** Small-file compaction: file count collapses to the byte-target
  * budget, rows and content survive bit-exactly, and the source is
  * swapped atomically (no temp dirs left behind). */
class CompactionSpec extends SparkSpec {

  test("compacting a fragmented table shrinks files, preserves rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString
    val docs = Tables.documents(spark, sf)
    docs.repartition(40).write.mode("overwrite").parquet(dir)
    val before = docs.count()
    val (nBefore, nAfter) = Compaction.compact(spark, dir, 8L * 1024 * 1024)
    assert(nBefore >= 40, s"fixture not fragmented: $nBefore files")
    assert(nAfter < nBefore / 4,
      s"compaction barely helped: $nBefore -> $nAfter")
    val back = spark.read.parquet(dir)
    assert(back.count() == before)
    assert(back.select("doc_id").exceptAll(docs.select("doc_id")).count() == 0)
    // atomic swap leaves no scratch dirs
    assert(!new java.io.File(dir + ".compact-tmp").exists())
    assert(!new java.io.File(dir + ".compact-old").exists())
  }

  test("compaction to a generous byte target yields a single file") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact1").toString
    Tables.nation(spark, sf).repartition(7).write.mode("overwrite").parquet(dir)
    val (_, nAfter) = Compaction.compact(spark, dir)
    assert(nAfter == 1)
    assert(spark.read.parquet(dir).count() == Tables.nation(spark, sf).count())
  }
}
