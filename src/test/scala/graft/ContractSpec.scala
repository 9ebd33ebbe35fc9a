package graft

/** Guards the driver contract: every oracle belongs to a query, every
  * query without an oracle is on the explicit rows-only allowlist, and
  * the flagship entry returns rows. Breaking this silently zeroes a
  * round's correctness score — fail loudly here instead. */
class ContractSpec extends SparkSpec {

  // empty since round 12: c01's fixed-init MLlib run gained a DuckDB
  // replay, retiring the engine's last rows-only cell
  private val rowsOnlyAllowed = Set.empty[String]

  test("every oracle key has a query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("every query has an oracle unless explicitly rows-only") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing == rowsOnlyAllowed,
      s"queries missing oracles (add SQL or allowlist): ${missing -- rowsOnlyAllowed}")
  }

  test("flagship entry returns rows on the smoke scale factor") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("query names are unique across domain maps (no silent overrides)") {
    val all = Seq(
      operators.RelationalQueries.queries, operators.ArrayQueries.queries,
      operators.TextQueries.queries, operators.DedupQueries.queries,
      operators.SimilarityQueries.queries, operators.MultimodalQueries.queries,
      operators.DialectQueries.queries, operators.ClusterQueries.queries,
      operators.NetCDFQueries.queries, operators.PipelineQueries.queries,
      operators.StreamQueries.queries, operators.CubeQueries.queries)
    val names = all.flatMap(_.keys)
    assert(names.size == names.distinct.size,
      s"duplicate query names: ${names.diff(names.distinct)}")
    assert(SparkEntry.queries.size == names.size)
  }
}
