package graft.pipeline

import org.apache.spark.sql.{SaveMode, SparkSession}

/** Small-file compaction — the unglamorous operator that keeps a 100 TB
  * lake queryable. Every incremental landing pattern in this repo
  * (CorpusLayout.writeByLang appends, EtlJob.upsertPartitions, the
  * foreachBatch survivor sink) accretes files; once a partition holds
  * thousands of KB-sized parquet files, scan planning (file listing +
  * footer reads) dominates query time and executors thrash on tiny
  * splits. Compaction rewrites a directory into ~`targetBytes` files:
  * read → repartition to ⌈bytes/target⌉ → write BESIDE the source →
  * atomic directory swap, so readers never observe a half-compacted
  * table and a crashed compaction leaves the source untouched.
  */
object Compaction {

  private def dirBytes(dir: java.io.File): Long = {
    val fs = dir.listFiles()
    if (fs == null) 0L
    else fs.map(f => if (f.isDirectory) dirBytes(f) else f.length()).sum
  }

  private def parquetFileCount(dir: java.io.File): Int = {
    val fs = dir.listFiles()
    if (fs == null) 0
    else fs.map {
      case f if f.isDirectory => parquetFileCount(f)
      case f if f.getName.endsWith(".parquet") => 1
      case _ => 0
    }.sum
  }

  /** Compact `path` (a flat parquet directory) into ~targetBytes files.
    * Returns (filesBefore, filesAfter). */
  def compact(spark: SparkSession, path: String,
      targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val src = new java.io.File(path)
    require(src.isDirectory, s"compact: $path is not a directory")
    val before = parquetFileCount(src)
    val bytes = dirBytes(src)
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val tmp = new java.io.File(path + ".compact-tmp")
    val old = new java.io.File(path + ".compact-old")
    spark.read.parquet(path)
      .repartition(nFiles)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    // swap: src -> old, tmp -> src, drop old — single-directory renames
    // (atomic on one filesystem); a crash between renames leaves either
    // the old or the new complete directory, never a mix
    if (old.exists()) delete(old)
    require(src.renameTo(old), s"compact: could not move $src aside")
    require(tmp.renameTo(src), s"compact: could not activate $tmp")
    delete(old)
    (before, parquetFileCount(src))
  }

  private def delete(f: java.io.File): Unit = {
    val fs = f.listFiles()
    if (fs != null) fs.foreach(delete)
    f.delete(); ()
  }
}
