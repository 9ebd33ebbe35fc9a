package graft.operators

import graft.SparkSpec
import graft.sources.{Jpeg, MediaCodec}

/** Pins the round-14 c20 / p27 / m31 additions beyond the oracle gate:
  *
  *  - c20's normalization and shape invariants: 4 models ranked, Σγ
  *    stays at the 4e6 normalization target (± the 4 floor-division
  *    truncations), rank strictly follows γ.
  *  - p27's COUNT PRESERVATION: summing cluster size over the kept
  *    representatives must reproduce the corpus doc count exactly —
  *    the property the reweighting exists to restore.
  *  - m31's corruption classes really are undecodable: a half-truncated
  *    baseline JPEG and a zeroed-SOI payload both throw in the strict
  *    decoders (if either started decoding "successfully", the
  *    quarantine operator would be testing nothing).
  */
class ArenaLedgerSpec extends SparkSpec {

  test("c20: four ranked models, gamma normalized to 4e6, rank " +
    "follows gamma") {
    val out = ClusterQueries.c20_bt_arena(spark, sf()).collect()
    assert(out.length === 4)
    assert(out.map(_.getAs[Long]("model")).sorted.toSeq ===
      Seq(0L, 1L, 2L, 3L))
    val gammaSum = out.map(_.getAs[Long]("gamma_fp")).sum
    assert(gammaSum <= 4000000L && gammaSum >= 4000000L - 4L,
      s"gamma sum $gammaSum drifted from the 4e6 normalization")
    val byRank = out.sortBy(_.getAs[Long]("rank"))
    byRank.sliding(2).foreach { w =>
      assert(w(0).getAs[Long]("gamma_fp") >= w(1).getAs[Long]("gamma_fp"))
    }
  }

  test("p27: cluster sizes over kept representatives sum back to the " +
    "corpus doc count (count preservation)") {
    val dir = sf()
    val manifest = DedupQueries.d22_cluster_keep_best(spark, dir).collect()
    val total = manifest.length.toLong
    val represented = manifest.filter(_.getAs[Long]("kept") == 1L)
      .map(_.getAs[Long]("n_members")).sum
    assert(represented === total,
      s"kept reps represent $represented of $total docs")
    val ledger = PipelineQueries.p27_dedup_reweight(spark, dir).collect()
    ledger.foreach { r =>
      assert(r.getAs[Long]("tok_kept") <= r.getAs[Long]("tok_raw"))
      assert(r.getAs[Long]("tok_weighted") >= r.getAs[Long]("tok_kept"))
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_docs"))
    }
  }

  test("m31: the two corruption classes throw in the strict decoders") {
    val good = Jpeg.encodeGrayFlat(16, 16, Array(10, 20, 30, 40))
    assert(MediaCodec.decodeImage(good).width === 16)
    val truncated = java.util.Arrays.copyOf(good, good.length / 2)
    assertThrows[Exception](MediaCodec.decodeImage(truncated))
    val badSoi = good.clone(); badSoi(0) = 0
    assertThrows[Exception](MediaCodec.decodeImage(badSoi))
  }
}
