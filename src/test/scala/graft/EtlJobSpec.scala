package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{CleanPipeline, EtlJob, Listings}

class EtlJobSpec extends SparkSpec {

  test("etl: clean csv → partitioned parquet table round-trips") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-etl")
    val csvDir = s"$tmp/clean_csv"
    val tableDir = s"$tmp/air_table"
    val (train, test) = ListingsFixture.trainTest(spark)
    val clean = CleanPipeline.run(train, test)
    clean.write.option("header", "true").csv(csvDir)

    EtlJob.run(spark, csvDir, tableDir)

    val back = spark.read.parquet(tableDir)
    assert(back.count() == clean.count())
    // partitionBy(city) must produce city=N directories (partition pruning)
    val dirs = new java.io.File(tableDir).listFiles().map(_.getName).filter(_.startsWith("city="))
    assert(dirs.nonEmpty, "expected city= partition directories")
    // append semantics like to_sql(if_exists='append'): second run doubles
    EtlJob.run(spark, csvDir, tableDir)
    assert(spark.read.parquet(tableDir).count() == 2 * clean.count())
    // city-filtered read prunes partitions
    val pruned = spark.read.parquet(tableDir).filter(col("city") === 0)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(city"), s"no partition pruning in:\n$plan")
  }

  test("dynamic partition overwrite upserts only the incoming partitions") {
    val tableDir = java.nio.file.Files.createTempDirectory("graft-upsert").toString + "/t"
    val (train, test) = ListingsFixture.trainTest(spark)
    val clean = CleanPipeline.run(train, test).cache()
    EtlJob.writeTable(clean, tableDir)
    val before = spark.read.parquet(tableDir)
      .groupBy("city").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(before.size > 1, "need multiple city partitions for the test")
    // refresh batch: only city 0, with doubled rows (self-union)
    val refresh = clean.filter(col("city") === 0)
    EtlJob.upsertPartitions(refresh.union(refresh), tableDir)
    val after = spark.read.parquet(tableDir)
      .groupBy("city").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    // city 0 replaced with the new (doubled) content...
    assert(after(0) == 2 * refresh.count())
    // ...and every other partition untouched
    before.filter(_._1 != 0).foreach { case (city, n) =>
      assert(after(city) == n, s"partition city=$city must be untouched")
    }
  }

  test("jdbc sink round-trips through an embedded Derby database") {
    // the literal pipeline.py PostgreSQL analogue, against the Derby
    // embedded driver shipped with Spark: bulk partition-parallel
    // INSERTs instead of the reference's row-at-a-time string-formatted
    // loop (pipeline.py:48-74)
    // Derby writes derby.log to user.dir by default; send it to target/
    System.setProperty("derby.stream.error.file", "target/derby.log")
    val url = "jdbc:derby:memory:graftdb;create=true"
    val (train, test) = ListingsFixture.trainTest(spark)
    val clean = CleanPipeline.run(train, test)
    EtlJob.writeJdbc(clean, url, "air_b")
    val back = spark.read.jdbc(url, "air_b", new java.util.Properties())
    assert(back.count() == clean.count())
    assert(back.columns.map(_.toLowerCase).sorted.sameElements(clean.columns.sorted))
    // append semantics like to_sql(if_exists='append')
    EtlJob.writeJdbc(clean, url, "air_b")
    assert(spark.read.jdbc(url, "air_b", new java.util.Properties()).count()
      == 2 * clean.count())
  }

  test("jdbc source reads back the extract leg of the reference pipeline") {
    // GET_AIR_B (SELECT * FROM air_b) run as a distributed JDBC relation
    // instead of cursor+fetchall onto one client
    System.setProperty("derby.stream.error.file", "target/derby.log")
    val url = "jdbc:derby:memory:graftsrc;create=true"
    val (train, test) = ListingsFixture.trainTest(spark)
    val clean = CleanPipeline.run(train, test)
    EtlJob.writeJdbc(clean, url, "air_b")

    val back = EtlJob.readJdbc(spark, url, "air_b")
    assert(back.count() == clean.count())
    assert(back.columns.map(_.toLowerCase).sorted.sameElements(clean.columns.sorted))
    // pushdown shape: a filtered projection must agree with the source df
    val cheap = EtlJob.readJdbc(spark, url, "air_b")
      .filter(col("price") < 100).count()
    assert(cheap == clean.filter(col("price") < 100).count())

    // parallel stride read: N executor-side cursors over disjoint ranges
    // of a numeric column, same rows regardless of bounds
    val stats = clean.agg(min(col("accommodates")), max(col("accommodates"))).head
    val par = EtlJob.readJdbcPartitioned(spark, url, "air_b",
      "accommodates", stats.getInt(0).toLong, stats.getInt(1).toLong, 4)
    assert(par.rdd.getNumPartitions == 4)
    assert(par.count() == clean.count())
    // deliberately-narrow bounds: out-of-range rows land in the edge
    // strides, so the row set is STILL complete (bounds tune parallelism)
    val narrow = EtlJob.readJdbcPartitioned(spark, url, "air_b",
      "accommodates", 2L, 3L, 3)
    assert(narrow.count() == clean.count())

    // query form: the database evaluates the SQL text
    // Derby folds unquoted identifiers to uppercase; Spark's writer
    // created quoted lowercase columns, so the raw SQL must quote them
    val q = EtlJob.readJdbcQuery(spark, url,
      "SELECT \"city\", \"price\" FROM air_b WHERE \"price\" < 100")
    assert(q.columns.map(_.toLowerCase).sorted.sameElements(Array("city", "price")))
    assert(q.count() == cheap)
  }

  test("declared-schema csv read matches the clean schema") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-etl2")
    val csvDir = s"$tmp/clean_csv"
    val (train, test) = ListingsFixture.trainTest(spark)
    CleanPipeline.run(train, test).write.option("header", "true").csv(csvDir)
    val df = EtlJob.readCleanCsv(spark, csvDir)
    // CSV sources mark everything nullable; compare names + types
    assert(df.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      Listings.cleanSchema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(df.count() > 0)
  }
}
