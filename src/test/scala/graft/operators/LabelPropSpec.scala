package graft.operators

import graft.SparkSpec
import graft.core.Tables

/** p25 synchronous label propagation: re-derived by an independent
  * in-memory replay of the same 4 rounds (mode label, ties to the
  * smallest), so the spec is an oracle of its own. */
class LabelPropSpec extends SparkSpec {

  test("p25 equals an in-memory synchronous LPA replay") {
    val out = PipelineQueries.p25_label_propagation(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList

    val n = Tables.documents(spark, sf()).count()
    val ids = (0L until n).toArray
    val sym = ids.flatMap { v =>
      Seq((v * 31 + 7) % n, (v * 17 + 3) % n, (v * 13 + 11) % n,
        (v + 1) % n).map(d => if (d == v) (d + 1) % n else d)
        .filter(_ != v).map(d => (math.min(v, d), math.max(v, d)))
    }.distinct.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val nbrs = sym.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
    var lab = nbrs.keys.map(v => v -> v).toMap
    for (_ <- 1 to 4) {
      lab = lab.map { case (v, _) =>
        val votes = nbrs(v).groupBy(lab).map { case (l, vs) => (l, vs.length) }
        v -> votes.minBy { case (l, c) => (-c, l) }._1
      }
    }
    val expected = lab.groupBy(_._2).map { case (c, ms) =>
      (c, ms.size.toLong, ms.keys.sum)
    }.toList.sortBy(_._1)
    assert(out == expected)
    // every node is in exactly one community
    assert(out.map(_._2).sum == nbrs.size)
    // LPA must coarsen: fewer communities than nodes
    assert(out.size < nbrs.size)
  }
}
