package graft.operators

import graft.SparkSpec

/** Structural invariants for t16 BM25 retrieval. The DuckDB oracle pins
  * the exact fixed-point arithmetic; these pin the RANKING contract and
  * the bounded-heap physical shape. */
class RetrievalSpec extends SparkSpec {

  test("t16 BM25 ranks are dense, scores nonincreasing, k-bounded") {
    val df = TextQueries.t16_bm25_topk(spark, sf("sf0.01"))
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      assert(sorted.length <= 10, s"q$q returned ${sorted.length} > k rows")
      // dense 1..n ranks
      assert(sorted.map(_.getLong(1)).toSeq == (1L to sorted.length).toSeq)
      // (score DESC, doc_id ASC) total order holds down the list
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          val (sa, sb) = (a.getLong(3), b.getLong(3))
          assert(sa > sb || (sa == sb && a.getLong(2) < b.getLong(2)),
            s"q$q rank order violated at ranks ${a.getLong(1)}/${b.getLong(1)}")
        case _ =>
      }
      // every hit matched at least one query term, at most all of them
      assert(rs.forall(r => r.getLong(4) >= 1 && r.getLong(4) <= 4))
    }
  }

  test("t16 plan ranks through the bounded TopKPerKey heap, not a sort") {
    val df = TextQueries.t16_bm25_topk(spark, sf("sf0.001"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TopKPartial") && p.contains("TopKPerKey"),
      "expected partial->final bounded-heap ranking in the plan")
    assert(!p.contains("Window"), "ranking must not fall back to a window sort")
  }
}
