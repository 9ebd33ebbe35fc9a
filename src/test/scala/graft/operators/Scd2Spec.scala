package graft.operators

import graft.SparkSpec

/** q51 SCD2 merge: version-chain invariants that hold for any data,
  * complementing the DuckDB replay oracle. */
class Scd2Spec extends SparkSpec {

  private lazy val rows =
    RelationalQueries.q51_scd2_merge(spark, sf("sf0.01")).collect()

  test("q51 every customer has exactly one open version") {
    val byCust = rows.groupBy(_.getLong(0))
    val nCust = graft.core.Tables.customer(spark, sf("sf0.01")).count()
    assert(byCust.size == nCust)
    byCust.foreach { case (ck, vs) =>
      assert(vs.count(_.getString(4) == "9999-12-31") == 1,
        s"customer $ck open-version count != 1")
    }
  }

  test("q51 changed customers chain v1 -> v2 seamlessly") {
    rows.groupBy(_.getLong(0)).foreach { case (ck, vs) =>
      val sorted = vs.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq == (1L to sorted.length).toSeq)
      assert(sorted.length <= 2)
      if (sorted.length == 2) {
        val (v1, v2) = (sorted(0), sorted(1))
        // closed v1 ends exactly where v2 begins, and the attr changed
        assert(v1.getString(4) == v2.getString(3), s"gap in chain for $ck")
        assert(v1.getString(2) != v2.getString(2), s"no-op version for $ck")
        assert(v2.getString(3) >= "2000-01-01")
      }
    }
    // the cutoff produces a real mix of changed and unchanged customers
    val nVersions = rows.groupBy(_.getLong(0)).values.map(_.length)
    assert(nVersions.exists(_ == 2) && nVersions.exists(_ == 1))
  }

  test("q51 plan merges in one pass: no window, no union rescan") {
    val p = RelationalQueries.q51_scd2_merge(spark, sf())
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"), "SCD2 merge must not window the dimension")
    assert(!p.contains("Union"), "version rows come from explode, not union")
    assert(p.contains("Generate"), "expected the explode emitting 1-2 versions")
  }
}
