package graft

import graft.pipeline.Listings

/** S4: declared-schema DDL through the SQL front-end — the analogue of
  * db_queries.py's CREATE_AIR_TABLE (SERIAL PK becomes a generated id;
  * Spark enforces no PK, as documented in SURVEY.md §2.1).
  */
class DdlSpec extends SparkSpec {

  test("CREATE TABLE via spark.sql declares the air_b schema and accepts inserts") {
    spark.sql("DROP TABLE IF EXISTS air_b")
    val featureDdl = Listings.cleanSchema.fields
      .map(f => s"${f.name} ${f.dataType.sql}").mkString(", ")
    spark.sql(s"CREATE TABLE air_b ($featureDdl) USING parquet")
    val (train, test) = ListingsFixture.trainTest(spark)
    val clean = graft.pipeline.CleanPipeline.run(train, test)
    clean.write.insertInto("air_b")
    assert(spark.table("air_b").count() == clean.count())
    assert(spark.table("air_b").schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      Listings.cleanSchema.fields.map(f => (f.name, f.dataType)).toSeq)
    // append semantics, like to_sql(if_exists='append') / INSERT loop
    clean.write.insertInto("air_b")
    assert(spark.table("air_b").count() == 2 * clean.count())
    spark.sql("DROP TABLE air_b")
  }
}
