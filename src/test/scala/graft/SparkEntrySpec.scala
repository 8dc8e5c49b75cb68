package graft

import org.scalatest.funsuite.AnyFunSuite

/** Top-level driver-contract consistency: every oracle key must name a
  * query, and every untimed exclusion must name a query — an orphaned
  * key in ANY module would otherwise surface only as a late
  * "no spark result parquet" failure in the driver's oracle compare.
  */
class SparkEntrySpec extends AnyFunSuite {

  test("every oracleSql key has a matching queries entry") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle keys with no query: $orphans")
  }

  test("every untimed exclusion names a real query") {
    val orphans = SparkEntry.untimed -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"untimed keys with no query: $orphans")
  }

  test("query names are unique across modules (no silent map overwrite)") {
    val maps = Seq(
      graft.queries.RelationalQueries.queries,
      graft.queries.FunctionQueries.queries,
      graft.queries.JoinQueries.queries,
      graft.queries.WindowQueries.queries,
      graft.queries.StreamQueries.queries,
      graft.queries.TextQueries.queries,
      graft.queries.SimilarityQueries.queries,
      graft.queries.SqlQueries.queries,
      graft.queries.TpchQueries.queries,
      graft.queries.GraphQueries.queries,
      graft.queries.TemporalQueries.queries,
      graft.queries.CorpusStatsQueries.queries,
      graft.queries.CurationQueries.queries,
      graft.queries.SketchQueries.queries,
      graft.queries.InsightQueries.queries,
      graft.queries.StatQueries.queries)
    val all = maps.flatMap(_.keys)
    val dupes = all.groupBy(identity).filter(_._2.size > 1).keys
    assert(dupes.isEmpty, s"query name collides across modules: $dupes")
    assert(all.size == SparkEntry.queries.size)
  }
}
