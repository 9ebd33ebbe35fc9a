package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** From-spec TIFF codec: round-trips in both byte orders, exercises the
  * inline (single-strip) and out-of-line (multi-strip) value branches,
  * and rejects malformed payloads loudly. */
class TiffSpec extends AnyFunSuite {

  private def gray(w: Int, h: Int): Array[Byte] =
    Array.tabulate(w * h)(i => ((i * 7 + 3) % 251).toByte)

  test("round-trip little-endian, multi-strip (out-of-line arrays)") {
    val g = gray(32, 10) // 10 rows -> 3 strips of 4/4/2
    val d = Tiff.decode(Tiff.encodeGray(32, 10, g, bigEndian = false))
    assert(!d.bigEndian && d.nStrips == 3 && d.nTags == 9)
    assert(d.image.width == 32 && d.image.height == 10)
    assert(d.image.pixels.toSeq == g.toSeq)
  }

  test("round-trip big-endian, multi-strip") {
    val g = gray(32, 9)
    val d = Tiff.decode(Tiff.encodeGray(32, 9, g, bigEndian = true))
    assert(d.bigEndian && d.nStrips == 3)
    assert(d.image.pixels.toSeq == g.toSeq)
  }

  test("single-strip image keeps offsets/counts inline") {
    val g = gray(5, 3) // 3 rows <= RowsPerStrip -> 1 strip, inline values
    val enc = Tiff.encodeGray(5, 3, g, bigEndian = false)
    val d = Tiff.decode(enc)
    assert(d.nStrips == 1)
    assert(d.image.pixels.toSeq == g.toSeq)
    // inline means no array block: pixels at 8, IFD directly after
    val b = java.nio.ByteBuffer.wrap(enc)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(b.getInt(4) == 8 + g.length, "IFD must follow pixels directly")
  }

  test("malformed payloads are rejected loudly") {
    intercept[IllegalArgumentException](Tiff.decode("XXjunk12".getBytes))
    intercept[IllegalArgumentException](Tiff.decode(Array[Byte](1, 2, 3)))
    // bad magic (43)
    val enc = Tiff.encodeGray(2, 2, gray(2, 2), bigEndian = false)
    enc(2) = 43
    intercept[IllegalArgumentException](Tiff.decode(enc))
  }

  test("LZW round-trips past every width bump and a table-full clear") {
    // > 4094 distinct phrases forces 9→10→11→12-bit codes AND a mid-
    // stream clear + restart; pseudo-random bytes keep phrases short
    val rnd = new scala.util.Random(41)
    val data = Array.fill(40000)(rnd.nextInt(256).toByte)
    val enc = Tiff.lzwEncode(data)
    assert(Tiff.lzwDecode(enc, 0, enc.length, data.length).toSeq ==
      data.toSeq)
    // and a highly-compressible run exercises the KwKwK case
    val runs = Array.tabulate(5000)(i => (i / 97 % 7).toByte)
    val enc2 = Tiff.lzwEncode(runs)
    assert(enc2.length < runs.length / 3, "LZW must compress runs")
    assert(Tiff.lzwDecode(enc2, 0, enc2.length, runs.length).toSeq ==
      runs.toSeq)
  }

  test("compressed TIFFs round-trip: LZW, LZW+predictor, PackBits") {
    val g = gray(23, 11)
    for ((comp, pred) <- Seq((5, 1), (5, 2), (32773, 1), (32773, 2))) {
      for (be <- Seq(false, true)) {
        val d = Tiff.decode(Tiff.encodeGrayC(23, 11, g, be, comp, pred))
        assert(d.image.pixels.toSeq == g.toSeq,
          s"comp=$comp pred=$pred be=$be")
        assert(d.nTags == (if (pred == 2) 10 else 9))
      }
    }
    // a smooth gradient (the predictor's target case) shrinks under
    // LZW+predictor vs plain LZW
    val grad = Array.tabulate(64 * 32)(i => (i % 64 + i / 64).toByte)
    val plain = Tiff.encodeGrayC(64, 32, grad, bigEndian = false, 5, 1)
    val withPred = Tiff.encodeGrayC(64, 32, grad, bigEndian = false, 5, 2)
    assert(withPred.length < plain.length,
      "horizontal differencing must help LZW on a gradient")
  }

  test("hostile LZW streams fail descriptive, never hang or escape") {
    // a code beyond the table at the current width
    val bad = Array[Byte](0x80.toByte, 0x7F, 0xFF.toByte, 0xFF.toByte)
    val e = intercept[IllegalArgumentException](
      Tiff.lzwDecode(bad, 0, bad.length, 100))
    assert(e.getMessage.contains("LZW"))
    // truncated mid-code
    val good = Tiff.lzwEncode(gray(16, 16))
    val e2 = intercept[IllegalArgumentException](
      Tiff.lzwDecode(good, 0, 3, 256))
    assert(e2.getMessage.contains("LZW"))
    // fuzz: random bytes either decode to exactly `expected` bytes or
    // throw IllegalArgumentException — nothing else
    val rnd = new scala.util.Random(97)
    for (_ <- 1 to 300) {
      val junk = Array.fill(rnd.nextInt(60) + 4)(rnd.nextInt(256).toByte)
      try { Tiff.lzwDecode(junk, 0, junk.length, 64); () }
      catch { case _: IllegalArgumentException => }
    }
    // PackBits: truncated + overflowing runs
    val e3 = intercept[IllegalArgumentException](
      Tiff.unpackBits(Array[Byte](127), 0, 1, 64))
    assert(e3.getMessage.contains("PackBits"))
  }
}
