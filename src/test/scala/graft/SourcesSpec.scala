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
}
