package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** The reference's ETL entry point (pipeline.py) re-expressed as a bulk
  * distributed job.
  *
  * pipeline.py reads Final_EDA.csv into pandas (pipeline.py:8), appends
  * it to SQLite via to_sql (pipeline.py:14), then copies every row
  * one-at-a-time into PostgreSQL with string-formatted INSERTs
  * (pipeline.py:48-74) after a full fetchall() onto the client
  * (pipeline.py:36). Those are the three anti-patterns this job
  * removes: executors read/write in parallel, nothing materializes on
  * the driver, and the sink is an atomic bulk write.
  */
object EtlJob {

  /** CSV scan of a clean listings export (S1: header + declared schema;
    * set inferSchema=true to demonstrate the inference path instead). */
  def readCleanCsv(spark: SparkSession, path: String,
      inferSchema: Boolean = false): DataFrame = {
    val r = spark.read.option("header", "true")
    if (inferSchema) r.option("inferSchema", "true").csv(path)
    else r.schema(Listings.cleanSchema).csv(path)
  }

  /** Bulk append into a parquet "table" (S3's to_sql analogue).
    * Partitioned by the low-cardinality city code so downstream
    * city-filtered queries prune partitions at 100 TB. */
  def writeTable(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Append).partitionBy("city").parquet(path)

  /** JDBC sink — the literal PostgreSQL analogue (S5 replaced by the
    * parallel DataFrameWriter: one bulk transaction per partition, no
    * per-row client round-trip, no SQL string formatting). Exercised
    * only when a jdbcUrl is supplied (no database in the test env). */
  def writeJdbc(df: DataFrame, jdbcUrl: String, table: String,
      props: java.util.Properties = new java.util.Properties()): Unit =
    df.write.mode(SaveMode.Append).jdbc(jdbcUrl, table, props)

  /** JSON-lines sink (engine extension): the interchange format most
    * crawl/annotation pipelines land — one JSON object per line, so the
    * file splits by newline and every executor writes its partition. */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** JSON-lines source. Pass the schema whenever it is known: without
    * one, Spark runs a full extra INFERENCE PASS over every byte before
    * the real scan — at 100 TB that doubles ingest cost, so schema-less
    * reads are a dev-only convenience. */
  def readJsonl(spark: SparkSession, path: String,
      schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame =
    schema.fold(spark.read.json(path))(sc => spark.read.schema(sc).json(path))

  /** ORC sink/source (engine extension): the second columnar format a
    * warehouse must speak; same vectorized scan, predicate pushdown,
    * and column pruning contract as parquet (plan-asserted in
    * SourcesSpec). */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** JDBC source — the literal extract leg of the reference pipeline
    * (`GET_AIR_B` = `SELECT * FROM air_b`, db_queries.py:26-29, run via
    * cursor + `fetchall()` at pipeline.py:35-37). `fetchall()` pulls the
    * whole table onto one client process; the Spark twin is a
    * distributed JDBC relation — filters and projections push down to
    * the database, and nothing materializes on the driver. */
  def readJdbc(spark: SparkSession, jdbcUrl: String, table: String,
      props: java.util.Properties = new java.util.Properties()): DataFrame =
    spark.read.jdbc(jdbcUrl, table, props)

  /** Parallel JDBC source for big extracts: each of `numPartitions`
    * executors opens its OWN cursor over a disjoint
    * `partitionColumn` stride — at 100 TB the extract is N concurrent
    * range scans, not one connection. `partitionColumn` must be an
    * indexed numeric/date column (the reference table's SERIAL
    * `index` PK, db_queries.py:6, is exactly that shape); rows outside
    * [lower, upper] still land in the first/last stride, so bounds
    * tune parallelism, never correctness. */
  def readJdbcPartitioned(spark: SparkSession, jdbcUrl: String,
      table: String, partitionColumn: String, lowerBound: Long,
      upperBound: Long, numPartitions: Int,
      props: java.util.Properties = new java.util.Properties()): DataFrame =
    spark.read.jdbc(jdbcUrl, table, partitionColumn, lowerBound,
      upperBound, numPartitions, props)

  /** Arbitrary-SQL JDBC source (the `query` option): the database runs
    * the statement and Spark scans its result — the direct analogue of
    * handing db_queries.py's SQL text to a cursor, for extracts that
    * are themselves queries (joins, filters) best evaluated where the
    * indexes are. */
  def readJdbcQuery(spark: SparkSession, jdbcUrl: String,
      sql: String): DataFrame =
    spark.read.format("jdbc")
      .option("url", jdbcUrl)
      .option("query", sql)
      .load()

  /** Audited CSV scan — the malformed-row contract a 100 TB ingest
    * needs stated explicitly instead of inherited by default: mode
    * PERMISSIVE plus a named corrupt-record column, so every
    * unparseable line survives AS ITS RAW TEXT alongside the rows that
    * parsed. The caller splits on `_corrupt_record IS NULL` — good
    * rows to the table, bad rows to a quarantine sink with their
    * source text intact for replay after the upstream fix. The
    * alternatives are both silent data loss at scale: DROPMALFORMED
    * discards rows with no record, FAILFAST kills a day-long job on
    * byte one of bad input (use it only in CI).
    *
    * Spark contract detail, test-pinned: the corrupt column must be
    * declared in the schema (StringType) and rows where it is
    * non-null have every data column null. */
  val CorruptCol = "_corrupt_record"

  def readCsvAudited(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val withAudit = schema.add(CorruptCol,
      org.apache.spark.sql.types.StringType, nullable = true)
    spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .schema(withAudit)
      .csv(path)
  }

  /** Split an audited scan into (clean rows, quarantine rows), through
    * a persist boundary: Spark refuses any RAW-file query whose
    * required schema collapses to only the corrupt column
    * (QUERY_ONLY_CORRUPT_RECORD_COLUMN — e.g. a count() on either
    * split side, after pruning), and its sanctioned pattern is
    * "cache or save the parsed results, then query". The persist here
    * is that boundary for interactive use; a 100 TB ingest lands the
    * audited scan to a staging table in ONE write and splits from
    * there — same contract, durable boundary. */
  def quarantine(df: DataFrame): (DataFrame, DataFrame) = {
    val parsed = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    (parsed.filter(org.apache.spark.sql.functions.col(CorruptCol).isNull)
      .drop(CorruptCol),
      parsed.filter(org.apache.spark.sql.functions.col(CorruptCol).isNotNull)
        .select(CorruptCol))
  }

  /** Schema-evolution parquet read: a long-lived corpus directory
    * accumulates files written under several schema versions (a
    * re-crawl adds a column; old files stay). `mergeSchema` unions the
    * footers' schemas at planning time — files missing a column serve
    * nulls for it, column pruning and filter pushdown still apply
    * per-file. Off by default in Spark because footer-merging costs a
    * planning pass over file metadata — turn it on per-read exactly
    * when the directory is known to be mixed, or land a rewritten
    * manifest instead. */
  def readEvolved(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** Inline ingest metrics via Spark's Observation API — row count and
    * per-column null counts computed DURING the write action itself
    * (accumulator-backed, zero extra pass over the data), the way a
    * 100 TB load reports its own data-quality tallies without a second
    * scan. Returns the observation; read `obs.get` AFTER the action
    * that consumes the returned DataFrame. */
  def observeIngest(df: DataFrame, auditCols: Seq[String])
      : (DataFrame, org.apache.spark.sql.Observation) = {
    import org.apache.spark.sql.functions.{count, lit, sum, when, col}
    val obs = org.apache.spark.sql.Observation("ingest")
    val metrics = count(lit(1)).as("n_rows") +:
      auditCols.map(c =>
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"n_null_$c"))
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }

  /** End-to-end: CSV in, partitioned parquet table out. */
  def run(spark: SparkSession, inCsv: String, outTable: String): Unit =
    writeTable(readCleanCsv(spark, inCsv), outTable)

  /** Partition-level upsert via dynamic partition overwrite — the
    * vanilla-Spark refresh idiom for continuously updated corpora:
    * Overwrite mode with partitionOverwriteMode=dynamic replaces ONLY
    * the partitions present in the incoming batch and leaves every
    * other partition untouched (static overwrite would truncate the
    * whole table). At 100 TB this is how a daily re-crawl lands: the
    * job rewrites the handful of affected city/date partitions, a few
    * GB of I/O, instead of the full dataset. The conf is set per-write
    * via option(), not globally, so concurrent jobs keep their own
    * semantics. */
  def upsertPartitions(df: DataFrame, path: String): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("city")
      .parquet(path)
}
