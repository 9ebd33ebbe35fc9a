package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the round-14 additions t30 / c19 / m29 beyond the oracle gate:
  *
  *  - t30 must APPLY exactly the segmentation t22 trains — the word
  *    vocabulary's post-merge subword counts, re-derived here from the
  *    shipped merge table, must reproduce t30's per-doc totals.
  *  - c19's replicate deltas are deterministic (two runs bit-equal)
  *    and every replicate delta lies inside [-1e6, 1e6] with the band
  *    ordered lo ≤ hi.
  *  - m29's fingerprint selectivity: the 3-variant transcode cliques
  *    sit within Hamming ≤ 6, AND unrelated content stays spread out —
  *    the distinct-fingerprint count must stay near the content-id
  *    count. This is the regression pin for two measured dead ends
  *    (segment-energy bias, affine content hash) that each collapsed
  *    500 docs onto ~50 fingerprints and exploded the candidate join.
  */
class EncodeCompareSpec extends SparkSpec {

  test("t30: per-doc subword totals equal a re-application of t22's " +
    "shipped merge table to the raw tokens") {
    val dir = sf("sf0.001")
    val merges = TextQueries.t22_bpe_train(spark, dir)
      .orderBy("rank").collect()
      .map(r => (r.getAs[String]("lsym"), r.getAs[String]("rsym")))
    val enc = TextQueries.t30_bpe_encode(spark, dir).collect()
    // independent driver-side re-application over the same corpus
    val docs = graft.core.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def nSub(w: String): Int = {
      var seg = " " + w.split("").mkString(" ") + " "
      merges.foreach { case (l, r) =>
        seg = seg.replace(s" $l $r ", s" $l$r ")
      }
      seg.trim.split(" ").length
    }
    val expected = docs.map { case (id, text) =>
      val ws = text.split(" ")
      id -> ((ws.length.toLong, ws.map(_.length.toLong).sum,
        ws.map(w => nSub(w).toLong).sum))
    }.toMap
    assert(enc.nonEmpty)
    enc.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (nw, nc, ns) = expected(id)
      assert(r.getAs[Long]("n_words") === nw, s"doc $id words")
      assert(r.getAs[Long]("n_chars") === nc, s"doc $id chars")
      assert(r.getAs[Long]("n_subtokens") === ns, s"doc $id subtokens")
    }
  }

  test("c19: replicate deltas are deterministic and bounded with an " +
    "ordered band") {
    val dir = sf("sf0.001")
    val a = ClusterQueries.c19_paired_bootstrap(spark, dir).collect()
    val b = ClusterQueries.c19_paired_bootstrap(spark, dir).collect()
    assert(a.length === 32)
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
    a.foreach { r =>
      val d = r.getAs[Long]("delta_fp")
      assert(d >= -1000000L && d <= 1000000L)
      assert(r.getAs[Long]("lo_fp") <= r.getAs[Long]("hi_fp"))
      assert(r.getAs[Long]("n_eff") > 0L)
    }
  }

  test("m29: transcode cliques recovered, fingerprints stay spread " +
    "(regression pin for the biased-signature dead ends)") {
    val dir = sf("sf0.001")
    val pairs = MultimodalQueries.m29_video_neardup(spark, dir).collect()
    val n = graft.core.Tables.documents(spark, dir).count()
    val sameCid = pairs.count(r =>
      r.getAs[Long]("doc_a") / 3 == r.getAs[Long]("doc_b") / 3)
    // every same-content pair that survives banding must be ≤ 6 away
    pairs.foreach(r => assert(r.getAs[Long]("hamming") <= 6L))
    // ≥ 90 % of the ~n transcode pairs recovered (banding may miss a
    // few — that is LSH recall, not a bug)
    val possible = (0L until n).groupBy(_ / 3).values
      .map(g => g.size * (g.size - 1) / 2).sum
    assert(sameCid >= (possible * 9) / 10,
      s"recovered $sameCid of $possible transcode pairs")
    // selectivity: cross-content pairs must stay a small minority —
    // the dead-end signatures produced ~25× more cross pairs than
    // transcode pairs
    assert(pairs.length - sameCid <= possible,
      s"${pairs.length - sameCid} cross-content pairs vs $possible " +
        "transcode pairs — fingerprint bits have collapsed")
  }
}
