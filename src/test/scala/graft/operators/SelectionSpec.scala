package graft.operators

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Round-11 selection operators: s11 Matryoshka prefix-dim retrieval,
  * t15 perplexity terciles, p15 quality-ranked token-budget fill. Each
  * is re-derived here independently (in-memory Scala fold) so the spec
  * is an oracle of its own, not a snapshot of the implementation. */
class SelectionSpec extends SparkSpec {

  test("s11: well-formed ranks, exact full-dim scores on shared pairs") {
    val m = SimilarityQueries.s11_ann_matryoshka(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(m.nonEmpty)
    m.groupBy(_._1).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq)
      assert(sorted.length <= 5)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._4 >= b._4)
        case _ =>
      }
    }
    // wherever the cascade surfaced a pair the exact engine also ranked,
    // the SCORE must be identical (stage 2 is the same exact metric)
    val brute = SimilarityQueries.s01_ann_bruteforce(spark, sf())
      .collect().map(r => ((r.getLong(0), r.getLong(2)), r.getDouble(3))).toMap
    m.foreach { case (q, _, n, sim) =>
      brute.get((q, n)).foreach(bs => assert(bs == sim)) }
  }

  test("s16: well-formed ranks, exact scores on shared pairs, nonzero recall") {
    val m = SimilarityQueries.s16_ann_binary_quant(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(m.nonEmpty)
    m.groupBy(_._1).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq)
      assert(sorted.length <= 5)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._4 >= b._4)
        case _ =>
      }
    }
    // stage 2 is the exact metric: any pair the brute-force engine also
    // ranked must carry an IDENTICAL score
    val brute = SimilarityQueries.s01_ann_bruteforce(spark, sf())
      .collect().map(r => ((r.getLong(0), r.getLong(2)), r.getDouble(3))).toMap
    m.foreach { case (q, _, n, sim) =>
      brute.get((q, n)).foreach(bs => assert(bs == sim)) }
    // sign bits carry angle information: the 1-bit cascade must agree
    // with exact top-5 on a meaningful share of pairs, not by accident
    val bruteTop = brute.keySet
    val hits = m.count { case (q, _, n, _) => bruteTop.contains((q, n)) }
    assert(hits * 5 >= m.length,
      s"recall vs brute too low: $hits/${m.length}")
  }

  test("t15: tercile sizes balanced, bucket boundaries respect score order") {
    val rows = TextQueries.t15_perplexity_bucket(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val n = rows.length
    assert(n > 0)
    val sizes = rows.groupBy(_._4).map { case (b, rs) => b -> rs.length }
    assert(sizes.keySet == Set("head", "middle", "tail"))
    assert(sizes.values.max - sizes.values.min <= 2)
    // ranks are a permutation of 1..n
    assert(rows.map(_._3).sorted.toSeq == (1L to n).toSeq)
    // score ordering: every head score <= every middle score <= tail
    def scores(b: String) = rows.filter(_._4 == b).map(_._2)
    assert(scores("head").max <= scores("middle").min)
    assert(scores("middle").max <= scores("tail").min)
  }

  test("p26: curve is monotone in cumulative mass, quality non-increasing") {
    val rows = PipelineQueries.p26_selection_curve(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.map(_._1).toSeq == (0L to 9L))
    // decile sizes balanced to ±1; doc total ties out with the corpus
    assert(rows.map(_._2).max - rows.map(_._2).min <= 1)
    val total = Tables.documents(spark, sf()).count()
    assert(rows.map(_._2).sum == total)
    // cumulative tokens strictly increase and end at the corpus total
    rows.sliding(2).foreach { case Array(a, b) => assert(b._5 > a._5); case _ => }
    val allTok = Tables.documents(spark, sf())
      .select(size(split(col("text"), " ")).cast("long")).collect()
      .map(_.getLong(0)).sum
    assert(rows.last._5 == allTok)
    // mean quality per decile is non-increasing down the ranking, and
    // the cumulative mean sits between the decile mean and the head's
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._4 <= a._4); assert(b._6 <= a._6); case _ => }
    rows.foreach { r => assert(r._6 >= r._4) }
  }

  test("p15: kept set is the maximal budget-respecting quality prefix") {
    val out = PipelineQueries.p15_token_budget(spark, sf())
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toList
    // independent in-memory replay from the raw table
    val docs = Tables.documents(spark, sf())
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("tk"))
      .collect().map { r =>
        val tk = r.getSeq[String](2)
        val nTok = tk.length.toLong
        val score = if (nTok == 0) 0L else tk.distinct.length * 1000000L / nTok
        (r.getLong(0), r.getString(1), nTok, score)
      }
    val budget = docs.map(_._3).sum * 6 / 10
    var cum = 0L
    val kept = docs.sortBy(d => (-d._4, d._1)).takeWhile { d =>
      cum += d._3; cum <= budget
    }.toList
    val bySource = docs.groupBy(_._2)
    val expected = bySource.keys.toList.sorted.map { src =>
      val k = kept.filter(_._2 == src)
      (src, bySource(src).length.toLong, k.length.toLong,
        k.map(_._3).sum, k.map(_._1).sum)
    }
    assert(out == expected)
    // never overshoots, and the next-ranked doc would not have fit
    assert(kept.map(_._3).sum <= budget)
  }

  test("p29: closed-form waterfill equals an independent iterative replay") {
    val rows = PipelineQueries.p29_epoch_budget(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    val b = 2L * rows.map(_._2).sum
    // independent replay: batch-cap any source whose proportional share
    // exceeds 4 epochs, remove, redistribute, repeat to fixpoint
    var un = rows.map(t => (t._1, t._2, t._3)).toList
    var cap = List.empty[(String, Long, Long)]
    var changed = true
    while (changed) {
      val r = b - 4L * cap.map(_._2).sum
      val wsum = un.map(_._3).sum
      val newly = un.filter { case (_, t, w) => r * w > 4L * t * wsum }
      changed = newly.nonEmpty
      cap = cap ++ newly
      un = un.filterNot(u => newly.exists(_._1 == u._1))
    }
    assert(un.nonEmpty, "budget 2x < cap 4x: someone must stay uncapped")
    val capSet = cap.map(_._1).toSet
    val rFin = b - 4L * cap.map(_._2).sum
    val wFin = un.map(_._3).sum
    rows.foreach { case (src, t, w, capped, alloc, epochsFp) =>
      assert((capped == 1L) == capSet(src), s"$src cap flag diverges")
      val expect = if (capSet(src)) 4L * t
        else rFin * w / wFin // floor division, as the operator
      assert(alloc == expect, s"$src alloc $alloc != replay $expect")
      assert(epochsFp == alloc * 1000000L / t)
      assert(epochsFp <= 4000000L, s"$src exceeds the 4-epoch cap")
    }
    // the budget is exhausted up to one floor-division remainder per
    // uncapped source (each floor loses strictly less than one token)
    val spent = rows.map(_._5).sum
    assert(spent <= b && b - spent <= rows.length, s"spent $spent of $b")
  }
}
