package graft.operators

import graft.SparkSpec
import graft.sources.MediaCodec

/** Pins the final round-14 batch beyond the oracle gate:
  *
  *  - m33's load-bearing premise: the THREE containers it interleaves
  *    (plain 8-bpp BMP, BI_RLE8 BMP, binary PGM) must decode the same
  *    gray raster to IDENTICAL pixels — a one-bit divergence in any
  *    path silently splits fingerprint groups. Checked on a raster
  *    that exercises palette indexing, RLE runs of every length and
  *    the PGM maxval path.
  *  - s17's sweep semantics: recall is MONOTONE non-decreasing in
  *    nprobe (nested probe order guarantees the candidate set only
  *    grows) and the nprobe=8 point (all 10 cells minus 2) stays ≤ 1.
  *  - p28's interleave quality: with the equal-size sources of the
  *    test corpus, the stride schedule is PERFECT — every source's
  *    worst gap × size equals the corpus size exactly (skew 1e6 ppm).
  */
class SweepInterleaveSpec extends SparkSpec {

  test("m33 premise: BMP8, RLE8 and PGM decode the same raster to " +
    "identical pixels") {
    val gray = Array.tabulate(256) { i =>
      // runs of varying length + all-distinct stretches
      (if (i < 64) i / 16 * 40 else (i * 37) % 200).toByte
    }
    def px(img: MediaCodec.Image): Seq[Int] =
      (0 until 256).map(i => img.pixels(i * img.channels) & 0xFF)
    val viaBmp = px(MediaCodec.decodeImage(MediaCodec.encodeBmp8(16, 16, gray)))
    val viaRle = px(MediaCodec.decodeImage(MediaCodec.encodeBmpRle8(16, 16, gray)))
    val viaPgm = px(MediaCodec.decodeImage(MediaCodec.encodePgm(16, 16, gray)))
    val want = gray.map(_ & 0xFF).toSeq
    assert(viaBmp === want)
    assert(viaRle === want)
    assert(viaPgm === want)
  }

  test("s17: recall monotone non-decreasing in nprobe, bounded by 1") {
    val rows = SimilarityQueries.s17_nprobe_sweep(spark, sf())
      .orderBy("nprobe").collect()
    assert(rows.map(_.getAs[Long]("nprobe")).toSeq === Seq(1L, 2L, 4L, 8L))
    val recalls = rows.map(_.getAs[Long]("recall_fp"))
    recalls.sliding(2).foreach(w => assert(w(0) <= w(1),
      s"recall not monotone: ${recalls.toSeq}"))
    assert(recalls.last <= 1000000L)
  }

  test("p28: equal-size sources interleave perfectly (skew exactly 1e6)") {
    val rows = PipelineQueries.p28_interleave_order(spark, sf()).collect()
    val sizes = rows.map(_.getAs[Long]("n_docs")).distinct
    assume(sizes.length == 1) // the test corpus is balanced by design
    rows.foreach { r =>
      assert(r.getAs[Long]("skew_ppm") === 1000000L,
        s"source ${r.getAs[String]("source")} skew != 1e6")
    }
  }
}
