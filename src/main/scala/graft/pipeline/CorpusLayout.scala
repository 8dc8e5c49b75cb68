package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Partition-pruned physical layout for the LLM-corpus tables.
  *
  * The driver ships `documents.parquet` flat; at 100 TB a flat corpus
  * means every language-scoped query (per-lang dedup, lang-balanced
  * sampling, decontamination of an `en` eval set) scans all languages.
  * This module lands the corpus hive-partitioned by `lang` —
  * cardinality ~10, the textbook partition key: low enough that no
  * partition explodes the file count, selective enough that a one-lang
  * query reads ~1/10th of the bytes, and it is the join key of the
  * curation dims (per-lang quotas, per-lang quality thresholds), so
  * dynamic partition pruning fires on star-shaped corpus queries.
  *
  * Within each lang partition, files are laid out in `source` order
  * (a cheap `sortWithinPartitions`, no extra shuffle beyond the
  * partitionBy exchange) so parquet row-group min/max stats on
  * `source` make source-scoped scans skip row groups — a second,
  * free pruning level below the directory one.
  */
object CorpusLayout {

  /** Land a documents batch hive-partitioned by lang, source-clustered
    * within each partition. Append mode: the incremental-crawl landing
    * pattern (a daily batch adds files under each lang=… directory;
    * use [[repartitionedWrite]] for the initial bulk layout). */
  def writeByLang(df: DataFrame, path: String): Unit =
    df.sortWithinPartitions("lang", "source")
      .write.mode(SaveMode.Append).partitionBy("lang").parquet(path)

  /** Initial bulk layout: one shuffle keyed on lang so each output
    * partition holds one lang's rows contiguously — without this, every
    * input task writes a file into EVERY lang directory and a
    * 1000-executor bulk load produces 10 × 1000 small files. */
  def repartitionedWrite(df: DataFrame, path: String,
      filesPerLang: Int = 1): Unit =
    df.repartition(filesPerLang, col("lang"))
      .sortWithinPartitions("lang", "source")
      .write.mode(SaveMode.Overwrite).partitionBy("lang").parquet(path)

  /** Scan the partitioned corpus. A `filter(col("lang") === …)`
    * downstream prunes at the DIRECTORY level (PartitionFilters in the
    * scan, zero I/O for other langs) — assert with
    * `CorpusLayoutSpec`. `basePath` keeps the schema stable whether the
    * caller points at the root or a single lang subdirectory. */
  def readDocuments(spark: SparkSession, path: String): DataFrame =
    spark.read.option("basePath", path).parquet(path)
}
