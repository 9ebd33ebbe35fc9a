package graft.operators

import graft.SparkSpec

/** Structural invariants for the mergeable-sketch operators (t13 KMV).
  * The DuckDB oracle pins the exact arithmetic; these pin the sketch
  * THEORY — estimates must actually estimate. */
class SketchSpec extends SparkSpec {

  test("t13 KMV estimates land within the k=64 error envelope") {
    val rows = TextQueries.t13_kmv_distinct(spark, sf("sf0.01")).collect()
    val bySrc = rows.filterNot(_.getString(0).startsWith("__"))
    assert(bySrc.length == 20)
    // rel. std. error at k=64 is ~13%; 4σ envelope
    bySrc.foreach { r =>
      val exact = r.getLong(1).toDouble
      val est = r.getLong(2) / 1e4
      assert(est > 0.48 * exact && est < 2.1 * exact,
        s"${r.getString(0)}: est $est vs exact $exact")
    }
    val union = rows.find(_.getString(0) == "__union_all").get
    val inter = rows.find(_.getString(0) == "__inter_src0_src1").get
    assert(union.getLong(1) >= bySrc.map(_.getLong(1)).max)
    // the merged-sketch union estimate covers the union, not one source
    assert(union.getLong(2) / 1e4 > 0.48 * union.getLong(1))
    // intersection can never exceed either input's exact count
    assert(inter.getLong(1) <= union.getLong(1))
    assert(inter.getLong(2) / 1e4 < 2.1 * inter.getLong(1))
  }
}
