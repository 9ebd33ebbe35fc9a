package graft.operators

import graft.SparkSpec

/** The q59 vacuum's FILE mechanics — the part the layout-independent
  * DuckDB oracle cannot see: dense files are rewritten (their DV
  * entries dropped), sparse files keep their DV, and the final merged
  * table equals the plain predicate delete. */
class VacuumSpec extends SparkSpec {

  test("vacuum rewrites only DV-dense files and keeps sparse DVs") {
    val (nHot, nCold, dvKept, dvAll) =
      RelationalQueries.q59Mechanics(spark, sf())
    // the key-range delete kills the low range files outright…
    assert(nHot >= 1, "at least one file must cross the 25% dead threshold")
    // …while the uniform ~3% predicate leaves every other file sparse
    assert(nCold >= 1, "sparse files must NOT be rewritten")
    assert(dvKept > 0, "sparse files keep riding their deletion vectors")
    assert(dvKept < dvAll,
      s"vacuum must drop the rewritten files' DV entries ($dvKept vs $dvAll)")
  }

  test("the vacuumed table equals the plain predicate delete") {
    import org.apache.spark.sql.functions._
    val got = RelationalQueries.q59_dv_vacuum(spark, sf())
      .agg(sum("n_items")).collect()(0).getLong(0)
    val li = graft.core.Tables.lineitem(spark, sf())
    val maxK = li.agg(max("l_orderkey")).collect()(0).getLong(0)
    val want = li.filter(!(col("l_orderkey") < lit(maxK / 4) ||
      (col("l_orderkey") + col("l_linenumber")) % 29 === 3)).count()
    assert(got == want, s"live row count diverged: $got vs $want")
  }
}
