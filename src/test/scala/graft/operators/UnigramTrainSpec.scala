package graft.operators

import graft.SparkSpec

/** Pins t31's Viterbi kernel and training structure beyond the oracle
  * gate: the DP must be optimal (not greedy), break ties to the
  * shortest piece (the rule the oracle's CASE order mirrors), and the
  * shipped vocabulary must be internally consistent. */
class UnigramTrainSpec extends SparkSpec {

  test("viterbiSeg picks the globally optimal split, not the greedy one") {
    // greedy longest-match from the left would take "abc" (cost 10) +
    // "d" (cost 9) = 19; optimal is "ab" + "cd" = 5 + 5 = 10
    val cost = Map("a" -> 9L, "b" -> 9L, "c" -> 9L, "d" -> 9L,
      "abc" -> 10L, "ab" -> 5L, "cd" -> 5L)
    assert(TextQueries.viterbiSeg("abcd", cost) == Seq("ab", "cd"))
  }

  test("viterbiSeg breaks cost ties toward the shorter piece") {
    // "aa" costs exactly two "a"s: the single-char path must win the tie
    val cost = Map("a" -> 5L, "aa" -> 10L)
    assert(TextQueries.viterbiSeg("aaaa", cost) ==
      Seq("a", "a", "a", "a"))
    // but a strictly cheaper pair piece must be taken
    val cost2 = Map("a" -> 5L, "aa" -> 9L)
    assert(TextQueries.viterbiSeg("aaaa", cost2) == Seq("aa", "aa"))
  }

  test("viterbiSeg covers the word exactly; singles guarantee feasibility") {
    val cost = Map("x" -> 1L, "y" -> 2L, "z" -> 3L, "xyz" -> 100L)
    val seg = TextQueries.viterbiSeg("zyxxyz", cost)
    assert(seg.mkString == "zyxxyz")
    assert(TextQueries.viterbiSeg("", cost).isEmpty)
  }

  test("t31 output: ranks dense, ordering key respected, ledger consistent") {
    val out = TextQueries.t31_unigram_train(spark, sf()).collect()
    val kept = out.filter(_.getLong(0) > 0)
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(kept.map(_._1).toSeq == (1L to kept.length).toSeq, "dense ranks")
    // the M-step order is (usage desc, freq desc, piece asc) — verify
    kept.sliding(2).foreach {
      case Array((_, p1, f1, u1), (_, p2, f2, u2)) =>
        assert(u1 > u2 || (u1 == u2 && (f1 > f2 || (f1 == f2 && p1 < p2))),
          s"order violated between $p1 and $p2")
      case _ =>
    }
    kept.foreach { case (_, p, f, u) =>
      assert(p.length >= 2 && p.length <= 4 && f > 0 && u >= 0, p)
    }
    val ledger = out.filter(_.getLong(0) < 0)
      .map(r => r.getString(1) -> r.getLong(3)).toMap
    // pruning can only lengthen segmentations (fewer pieces available)
    assert(ledger("<tokens_v1>") >= ledger("<tokens_v0>"))
    assert(ledger("<tokens_v0>") > 0)
  }

  test("t32 per-source encode ties out to t31's corpus token ledger") {
    val train = TextQueries.t31_unigram_train(spark, sf()).collect()
    val v1 = train.filter(r => r.getString(1) == "<tokens_v1>")
      .head.getLong(3)
    val enc = TextQueries.t32_unigram_encode(spark, sf()).collect()
    // the per-source encode is a partition of the corpus: its token
    // total must equal the training ledger's corpus-wide v1 figure
    assert(enc.map(_.getLong(2)).sum == v1)
    enc.foreach { r =>
      val (docs, toks, chars, fp) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(docs > 0 && toks > 0 && chars > 0)
      // a unigram token is 1..4 chars
      assert(toks <= chars && chars <= toks * 4)
      assert(fp == chars * 1000000L / toks)
    }
  }
}
