package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver test schema (TESTDATA.md).
  *
  * The reference engine's only scan is `pd.read_csv` / SQLite `SELECT *
  * FROM air_b` (reference pipeline.py:8,35); here every scan is a columnar
  * Parquet `FileSourceScanExec` so Catalyst can push filters and prune
  * columns at the source — the property that matters at 100 TB, where a
  * scan that reads unneeded columns/rows is the dominant cost.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Scan one table. `dir` is an sf directory like /root/testdata/sf0.01. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")

  /** events.ts has shipped as parquet TIMESTAMP(NANOS) in some data drops
    * (unrepresentable in Spark's micros TimestampType — read as long via
    * legacy nanosAsLong, then converted) and as plain TIMESTAMP(MICROS) in
    * others (directly usable). Centralized, schema-adaptive load so every
    * consumer sees a plain TimestampType column either way. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // naive wall time ≡ UTC instant — the same convention the DuckDB
        // oracle applies with epoch_us(ts) on the raw parquet. Pure NTZ
        // field arithmetic (micros since the NTZ epoch), so the result is
        // identical under ANY session timezone — a table load must not
        // mutate session state or read tz-dependent semantics.
        raw.withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestamp_micros(timestampdiff(MICROSECOND, " +
            "TIMESTAMP_NTZ'1970-01-01 00:00:00', ts))"))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Register every table as a temp view so `spark.sql` text queries (the
    * analogue of the reference's db_queries.py SQL strings) resolve.
    * events goes through events() so the view exposes a converted
    * TimestampType ts (and so registration works in a fresh session —
    * a raw read of the NANOS column would throw PARQUET_TYPE_ILLEGAL
    * before any events-aware query had set the legacy conf). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach { n =>
      val df = if (n == "events") events(spark, dir) else table(spark, dir, n)
      df.createOrReplaceTempView(n)
    }
}
