package graft.operators

import graft.SparkSpec

/** s05 two-stage cascade invariants: the rerank output is well-formed
  * and its exact-cosine scores agree with the brute-force baseline
  * wherever the two report the same (query, neighbor) pair. */
class RerankSpec extends SparkSpec {

  private lazy val rerank = SimilarityQueries.s05_ann_rerank(spark, sf())
    .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
  private lazy val brute = SimilarityQueries.s01_ann_bruteforce(spark, sf())
    .collect().map(r => ((r.getLong(0), r.getLong(2)), r.getDouble(3))).toMap

  test("per query: 5 rows, contiguous ranks, descending sims") {
    rerank.groupBy(_._1).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq)
      assert(sorted.length <= 5)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._4 >= b._4)
        case _ =>
      }
    }
  }

  test("s06 custom top-k operator emits exactly the s01 window answer") {
    val viaWindow = SimilarityQueries.s01_ann_bruteforce(spark, sf())
      .collect().map(_.toSeq).toIndexedSeq
    val viaHeap = SimilarityQueries.s06_ann_topk_operator(spark, sf())
      .collect().map(_.toSeq).toIndexedSeq
    assert(viaHeap == viaWindow)
  }

  test("exact scores match the brute-force metric on shared pairs") {
    rerank.foreach { case (q, _, n, sim) =>
      brute.get((q, n)).foreach(bs => assert(bs == sim,
        s"pair ($q,$n): rerank $sim vs brute $bs"))
    }
    // the cascade should recover nearly all of the exact top-5
    val overlap = rerank.count { case (q, _, n, _) => brute.contains((q, n)) }
    assert(overlap >= rerank.length * 3 / 4)
  }
}
