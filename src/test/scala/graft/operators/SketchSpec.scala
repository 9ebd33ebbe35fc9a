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

  test("t17 HDR sketch picks the exact quantile's bucket") {
    def bucket(v: Long): Long =
      if (v < 32) v
      else {
        val e = 63 - java.lang.Long.numberOfLeadingZeros(v)
        e * 32L + ((v >> (e - 5)) - 32)
      }
    def lb(idx: Long): Long =
      if (idx < 32) idx else (idx % 32 + 32) << (idx / 32 - 5).toInt
    val rows = TextQueries.t17_hdr_quantiles(spark, sf("sf0.01")).collect()
    assert(rows.map(_.getString(0)).distinct.length == 5) // 5 event types
    val exact = graft.core.Tables.events(spark, sf("sf0.01"))
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), math.floor(r.getDouble(1) * 100).toLong))
      .groupBy(_._1).map { case (t, vs) => (t, vs.map(_._2).sorted) }
    val qs = Map("p50" -> (1L, 2L), "p90" -> (9L, 10L),
      "p99" -> (99L, 100L), "p999" -> (999L, 1000L))
    rows.foreach { r =>
      val vs = exact(r.getString(0))
      val (qn, qd) = qs(r.getString(1))
      val target = ((vs.length * qn + qd - 1) / qd).toInt
      val ex = vs(target - 1)
      // the sketch's chosen bucket IS the bucket holding the exact
      // order statistic, and its lower bound is reported
      assert(r.getLong(3) == bucket(ex),
        s"${r.getString(0)}/${r.getString(1)}: bucket ${r.getLong(3)} != ${bucket(ex)}")
      assert(r.getLong(4) == lb(r.getLong(3)))
      assert(r.getLong(4) <= ex)
      // 5 significant bits => <= ~3.2% relative bucket width
      assert(ex <= r.getLong(4) + math.max(1L, r.getLong(4) / 32) * 2,
        s"bucket width blown: exact $ex vs lb ${r.getLong(4)}")
      assert(r.getLong(2) == vs.length)
    }
  }
}
