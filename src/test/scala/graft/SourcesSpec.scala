package graft

import org.apache.spark.sql.functions._

/** Source/sink format coverage (SURVEY.md §2.1): parquet is the
  * primary format (everywhere else in the suite); CSV is covered by
  * EtlJobSpec; here: JSON, ORC, and Avro round-trips plus
  * inferSchema's capability demonstration (S1).
  */
class SourcesSpec extends SparkSpec {

  private def tmp(name: String) =
    java.nio.file.Files.createTempDirectory(name).toString

  test("json source round-trips the events rows") {
    val dir = tmp("graft-json")
    val events = Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"), col("value"), col("props"))
    events.write.mode("overwrite").json(dir)
    val back = spark.read.json(dir)
    assert(back.count() == events.count())
    // json infers value as double/string; check content equality on a key
    val a = events.agg(round(sum("value"), 2)).head().getDouble(0)
    val b = back.agg(round(sum("value"), 2)).head().getDouble(0)
    assert(a == b)
  }

  test("orc source round-trips lineitem bit-exactly") {
    val dir = tmp("graft-orc")
    val li = Tables.lineitem(spark, sf)
    li.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema == li.schema)
    assert(back.exceptAll(li).count() == 0 && li.exceptAll(back).count() == 0)
  }

  // avro: the spark-avro connector module is not shipped in this
  // distribution (/opt/spark/jars has only avro-core), so the format
  // is not exercised here.

  test("EtlJob jsonl round-trip with a pinned schema (no inference pass)") {
    val dir = tmp("graft-jsonl")
    val docs = Tables.documents(spark, sf).select("doc_id", "lang", "text")
    graft.pipeline.EtlJob.writeJsonl(docs, dir)
    val back = graft.pipeline.EtlJob.readJsonl(spark, dir, Some(docs.schema))
    assert(back.schema == docs.schema)
    assert(back.exceptAll(docs).count() == 0 && docs.exceptAll(back).count() == 0)
  }

  test("EtlJob orc scan pushes filters and prunes columns like parquet") {
    val dir = tmp("graft-orc-push")
    graft.pipeline.EtlJob.writeOrc(Tables.lineitem(spark, sf), dir)
    val q = graft.pipeline.EtlJob.readOrc(spark, dir)
      .filter(col("l_quantity") > 40)
      .select("l_orderkey", "l_quantity")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,40.0)]"),
      s"orc scan did not push the filter:\n$plan")
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      s"orc scan did not prune columns:\n$plan")
    assert(q.count() ==
      Tables.lineitem(spark, sf).filter(col("l_quantity") > 40).count())
  }

  test("csv inferSchema recovers numeric types (S1 capability)") {
    val dir = tmp("graft-infer")
    Tables.customer(spark, sf).write.option("header", "true").mode("overwrite").csv(dir)
    val inferred = spark.read.option("header", "true")
      .option("inferSchema", "true").csv(dir)
    val types = inferred.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    assert(types("c_custkey") == "long" || types("c_custkey") == "integer")
    assert(types("c_acctbal") == "double")
    assert(types("c_name") == "string")
  }

  test("audited CSV scan quarantines malformed rows with their raw text") {
    import org.apache.spark.sql.types._
    val dir = tmp("graft-csv-audit")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "in.csv"),
      ("id,price\n" +
        "1,10.5\n" +
        "2,not_a_number\n" +   // type failure
        "3,7.25\n" +
        "oops\n" +             // wrong column count
        "4,1.0\n").getBytes("UTF-8"))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("price", DoubleType)))
    val scanned = graft.pipeline.EtlJob.readCsvAudited(spark, dir, schema)
    val (clean, quar) = graft.pipeline.EtlJob.quarantine(scanned)
    assert(clean.count() == 3)
    assert(clean.agg(org.apache.spark.sql.functions.sum("price"))
      .head().getDouble(0) == 18.75)
    val bad = quar.collect().map(_.getString(0)).toSet
    assert(bad == Set("2,not_a_number", "oops"), bad.toString)
    // the alternatives, pinned: DROPMALFORMED silently discards,
    // FAILFAST refuses the scan
    val dropped = spark.read.option("header", "true")
      .option("mode", "DROPMALFORMED").schema(schema).csv(dir)
    // sharp edge worth pinning: a PRUNED count() parses no columns, so
    // DROPMALFORMED drops nothing and counts the raw lines — exactly
    // why the audited-PERMISSIVE path is the ingest default here
    assert(dropped.count() == 5)
    assert(dropped.collect().length == 3)
    val e = intercept[org.apache.spark.SparkException] {
      spark.read.option("header", "true")
        .option("mode", "FAILFAST").schema(schema).csv(dir).collect()
    }
    assert(e.getMessage.toLowerCase.contains("malformed")
      || Option(e.getCause).exists(_.getMessage.toLowerCase.contains("malformed")))
  }

  test("mergeSchema read unions parquet schema versions, null-filling old files") {
    val s = spark
    import s.implicits._
    val dir = tmp("graft-evolve")
    // v1 files: (doc_id, text); v2 adds a lang column
    Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
      .write.parquet(s"$dir/v1")
    Seq((3L, "gamma", "en"), (4L, "delta", "fr"))
      .toDF("doc_id", "text", "lang")
      .write.parquet(s"$dir/v2")
    val merged = graft.pipeline.EtlJob.readEvolved(spark, s"$dir/*")
    assert(merged.schema.fieldNames.sorted.toSeq == Seq("doc_id", "lang", "text"))
    assert(merged.count() == 4)
    // old files serve null for the evolved column
    assert(merged.filter(col("lang").isNull).select("doc_id")
      .collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    // a plain (non-merge) read keyed off one footer would miss `lang`;
    // the merged scan still prunes: projecting (doc_id, lang) reads
    // no text bytes
    val plan = merged.select("doc_id", "lang")
      .queryExecution.executedPlan.toString
    assert(plan.contains("doc_id") && !plan.contains("text"), plan)
  }

  test("observe() reports ingest metrics during the write with no extra pass") {
    val dir = tmp("graft-observe")
    val src = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_totalprice"),
        when(col("o_orderkey") % 5 === 0, lit(null).cast("string"))
          .otherwise(col("o_orderpriority")).as("prio"))
    val (observed, obs) = graft.pipeline.EtlJob.observeIngest(
      src, Seq("prio", "o_totalprice"))
    observed.write.mode("overwrite").parquet(dir)
    val m = obs.get
    val n = Tables.orders(spark, sf).count()
    assert(m("n_rows") == n)
    assert(m("n_null_prio") ==
      src.filter(col("prio").isNull).count())
    assert(m("n_null_o_totalprice") == 0L)
  }
}
