package graft

/** Guards the CleanPipeline golden tests against silent generator
  * drift: the in-code ListingsFixture generator must reproduce the
  * checked-in parquet snapshot row-for-row and field-for-field. If
  * this fails after an INTENTIONAL generator change, regenerate with
  * `sbt "Test/runMain graft.GoldenFixtureGen"` and re-check the
  * CleanPipeline golden numbers.
  */
class FixtureDriftSpec extends SparkSpec {

  test("generator reproduces the checked-in golden parquet exactly") {
    val url = getClass.getClassLoader.getResource("listings_raw_golden.parquet")
    assert(url != null, "golden fixture resource missing")
    val golden = spark.read.parquet(url.getPath)
    val gen = ListingsFixture.raw(spark)
    // parquet has no not-null flag — Spark reads everything back
    // nullable, so compare schemas with nullability normalized
    def norm(s: org.apache.spark.sql.types.StructType) =
      org.apache.spark.sql.types.StructType(s.map(_.copy(nullable = true)))
    assert(norm(golden.schema) == norm(gen.schema),
      s"schema drift:\n${golden.schema}\nvs\n${gen.schema}")
    val key = (r: org.apache.spark.sql.Row) => r.getLong(0)
    val goldenRows = golden.collect().map(r => key(r) -> r.toSeq).toMap
    val genRows = gen.collect().map(r => key(r) -> r.toSeq).toMap
    assert(goldenRows.keySet == genRows.keySet, "row-id set drift")
    val bad = goldenRows.collect {
      case (id, row) if genRows(id) != row => id -> (row, genRows(id))
    }
    assert(bad.isEmpty, s"value drift on ${bad.size} rows, first: ${bad.headOption}")
  }
}
