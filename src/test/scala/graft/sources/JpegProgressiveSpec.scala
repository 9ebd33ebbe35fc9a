package graft.sources

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

/** Progressive (SOF2) JPEG: the SAME quantized coefficient blocks are
  * entropy-coded through two INDEPENDENT paths — baseline sequential
  * (one full-block scan, proven against hand fixtures and the m14/m17
  * oracles) and six progressive scans (DC successive approximation,
  * two spectral-selection AC bands at Al=1 each refined to Al=0) — and
  * the decoded rasters must be identical. A matched encoder/decoder
  * bug pair cannot hide: the baseline path would disagree. */
class JpegProgressiveSpec extends AnyFunSuite {

  private def decodeBoth(w: Int, h: Int,
                         blocks: Array[Array[Int]]): (Seq[Byte], Seq[Byte]) = {
    val base = Jpeg.decode(Jpeg.encodeGrayCoeffs(w, h, blocks.map(_.clone)))
    val prog = Jpeg.decode(Jpeg.encodeGrayProgressive(w, h, blocks.map(_.clone)))
    assert(base.width == w && prog.width == w)
    (base.pixels.toSeq, prog.pixels.toSeq)
  }

  test("flat DC-only blocks: progressive == baseline, exact values") {
    val vals = Array(64, 91, 128, 150, 191, 77, 99, 113)
    val blocks = vals.map { v => val c = new Array[Int](64); c(0) = v - 128; c }
    val (b, p) = decodeBoth(32, 16, blocks)
    assert(b == p)
    // DC-only progressive also hits the exact flat path
    for (k <- vals.indices) {
      val bx = k % 4; val by = k / 4
      assert(p((by * 8) * 32 + bx * 8) == vals(k).toByte)
    }
  }

  test("textured blocks through both paths (AC bands populated)") {
    val vals = Array(80, 120, 160, 100, 90, 140, 70, 180)
    val blocks = vals.map { v =>
      val c = new Array[Int](64); c(0) = v - 128
      Jpeg.AcPatternCoefs.foreach { case (i, q) => c(i) = q }
      c
    }
    val (b, p) = decodeBoth(32, 16, blocks)
    assert(b == p)
  }

  test("randomized coefficients: 25 rounds of cross-path equality") {
    val rnd = new Random(0xC0FFEE)
    for (round <- 1 to 25) {
      val bx = rnd.nextInt(4) + 1; val by = rnd.nextInt(3) + 1
      val blocks = Array.fill(bx * by) {
        val c = new Array[Int](64)
        c(0) = rnd.nextInt(256) - 128
        // sparse AC content across both spectral bands
        for (_ <- 0 until rnd.nextInt(12)) {
          val k = rnd.nextInt(63) + 1
          c(Jpeg.Zigzag(k)) = rnd.nextInt(35) - 17
        }
        c
      }
      val (b, p) = decodeBoth(bx * 8, by * 8, blocks)
      assert(b == p, s"round $round diverged (${bx}x$by blocks)")
    }
  }

  test("EOB runs and ZRL-in-refinement both exercised") {
    // blocks 0..4: empty high band -> EOBn run of 5 in the [6,63] scans;
    // block 5: a lone |c|=1 at zigzag 40 behind 33 zero-history
    // positions and one nonzero-history (|c|=4 at zigzag 10) -> two
    // ZRLs with an interleaved correction bit in the refinement scan
    val blocks = Array.tabulate(6) { i =>
      val c = new Array[Int](64)
      c(0) = 10 * i - 20
      if (i < 5) c(Jpeg.Zigzag(2)) = i + 1 // low band only
      else {
        c(Jpeg.Zigzag(10)) = 4
        c(Jpeg.Zigzag(40)) = -1
      }
      c
    }
    val (b, p) = decodeBoth(48, 8, blocks)
    assert(b == p)
  }

  test("odd dimensions crop partial MCUs identically") {
    val rnd = new Random(7)
    val blocks = Array.fill(6) {
      val c = new Array[Int](64)
      c(0) = rnd.nextInt(200) - 100
      c(Jpeg.Zigzag(1)) = 3; c(Jpeg.Zigzag(9)) = -2
      c
    }
    val base = Jpeg.decode(Jpeg.encodeGrayCoeffs(21, 13, blocks.map(_.clone)))
    val prog = Jpeg.decode(Jpeg.encodeGrayProgressive(21, 13, blocks.map(_.clone)))
    assert(base.width == 21 && base.height == 13)
    assert(base.pixels.toSeq == prog.pixels.toSeq)
  }
}
