package graft.operators

import graft.SparkSpec

/** Guards the 100 TB scale posture at the PLAN level: these assertions
  * fail if a refactor drops predicate pushdown, broadcast joins, or
  * partial aggregation — the properties that keep the engine linear at
  * 1000 executors regardless of what the small-scale timings say.
  */
class PlanSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q01: filters are pushed to the parquet scan and columns pruned") {
    val p = plan(RelationalQueries.q01_filter_project(spark, sf()))
    assert(p.contains("PushedFilters:") && p.contains("l_quantity"),
      s"expected pushed filters in:\n$p")
    // projection needs 4 columns; the scan must not read the other 7
    val readSchema = "ReadSchema: struct<l_orderkey"
    assert(p.contains(readSchema), s"expected pruned ReadSchema in:\n$p")
    assert(!p.contains("l_shipdate"), s"unused column not pruned:\n$p")
  }

  test("q05/q06: dimension joins broadcast (no fact-side shuffle join)") {
    val p5 = plan(RelationalQueries.q05_join_agg(spark, sf()))
    assert(p5.contains("BroadcastHashJoin"), s"customer not broadcast:\n$p5")
    val p6 = plan(RelationalQueries.q06_join_chain(spark, sf()))
    assert(p6.contains("BroadcastHashJoin"), s"dims not broadcast:\n$p6")
  }

  test("q03: aggregation is partial+final (map-side combine)") {
    val p = plan(RelationalQueries.q03_agg_group(spark, sf()))
    assert(p.contains("partial_"), s"expected partial aggregation in:\n$p")
  }

  test("a10: array Aggregator runs partial+final, no explode/shuffle blowup") {
    val p = plan(ArrayQueries.a10_agg_elementwise(spark, sf()))
    assert(p.contains("partial_elementwise"),
      s"expected partial elementwise agg in:\n$p")
    assert(!p.toLowerCase.contains("generate"), // no explode in this plan
      s"elementwise agg must not explode:\n$p")
  }

  test("a01: array primitives stay whole-stage codegen'd") {
    val df = ArrayQueries.a01_scalar_math(spark, sf())
    df.collect() // AQE finalizes the plan (and codegen spans) on execution
    val p = df.queryExecution.executedPlan.toString
    // codegen'd operators render with the "*(n)" stage prefix
    assert(p.contains("*("), s"expected whole-stage-codegen spans:\n$p")
  }

  test("s01: query side is broadcast; scan side streams once") {
    val p = plan(SimilarityQueries.s01_ann_bruteforce(spark, sf()))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"expected broadcast of the query vectors:\n$p")
  }
}
