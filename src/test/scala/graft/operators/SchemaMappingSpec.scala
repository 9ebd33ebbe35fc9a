package graft.operators

import graft.SparkSpec

/** q75 field-id column mapping: pins the two claims that make the
  * evolution model viable at scale — (1) the dropped physical column
  * (f3) never leaves parquet: each file's scan ReadSchema carries only
  * the id-resolved physical columns the projection touches; (2) the
  * rename resolves by FIELD ID across files whose physical names
  * differ (f2 vs g2 both serve logical `quantity`). */
class SchemaMappingSpec extends SparkSpec {

  test("q75: dropped column pruned at the scan, rename resolves by id") {
    val df = RelationalQueries.q75_column_mapping(spark, sf())
    val plan = df.queryExecution.executedPlan.toString
    // file A's scan must read f1/f2 only — f3 (dropped field 3) pruned
    val readSchemas = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(plan).map(_.group(1)).toList
    assert(readSchemas.nonEmpty, plan.take(2000))
    assert(readSchemas.exists(s => s.contains("f1") && s.contains("f2")),
      readSchemas.toString)
    assert(!readSchemas.exists(_.contains("f3")),
      s"dropped column f3 still read: $readSchemas")
    assert(readSchemas.exists(s => s.contains("g1") && s.contains("g2") &&
      s.contains("g4")), readSchemas.toString)

    // semantic checks against a direct replay from orders
    import org.apache.spark.sql.functions._
    val out = df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toList
    val expected = graft.core.Tables.orders(spark, sf())
      .select(col("o_orderkey").as("id"),
        (col("o_custkey") % 100L).as("q"),
        when(col("o_orderkey") % 2 === 0, 0L)
          .otherwise(col("o_orderkey") % 50L).as("d"))
      .groupBy((col("id") % 8L).as("grp"))
      .agg(count(lit(1)).as("n"), sum("q").as("sq"), sum("d").as("sd"))
      .orderBy("grp")
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toList
    assert(out == expected)
  }
}
