package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Spec for the from-spec baseline JPEG codec. The entropy/marker layer
  * is checked by encode→decode round trips (flat blocks decode
  * bit-exactly by construction), the transform layer by comparing the
  * decoder's separable IDCT against an INDEPENDENT direct O(64²)
  * evaluation of the T.81 A.3.3 definition written here in the test —
  * a shared transcription mistake in the fast path cannot pass. */
class JpegSpec extends AnyFunSuite {

  test("grayscale flat blocks round-trip bit-exactly (multi-row, no DRI)") {
    val vals = Array(0, 17, 255, 128, 96, 201, 1, 254, 63, 64, 190, 33)
    val img = Jpeg.decode(Jpeg.encodeGrayFlat(32, 24, vals))
    assert(img.width == 32 && img.height == 24 && img.channels == 1)
    for (y <- 0 until 24; x <- 0 until 32)
      assert((img.pixels(y * 32 + x) & 0xFF) ==
        vals((y / 8) * 4 + x / 8), s"pixel ($x,$y)")
  }

  test("EXIF APP1: splice is decode-invisible; orientation parses (LE and BE)") {
    val vals = Array(10, 20, 30, 40)
    val plain = Jpeg.encodeGrayFlat(32, 8, vals)
    val tagged = Jpeg.spliceApp1(plain, Jpeg.encodeApp1Exif(6))
    // the unknown APP1 must not disturb a single pixel
    assert(Jpeg.decode(tagged).pixels.toSeq == Jpeg.decode(plain).pixels.toSeq)
    assert(Jpeg.exifOrientation(tagged) == 6)
    assert(Jpeg.exifOrientation(plain) == 1) // absent → identity
    (1 to 8).foreach(o => assert(Jpeg.exifOrientation(
      Jpeg.spliceApp1(plain, Jpeg.encodeApp1Exif(o))) == o))
    // hand-built BIG-ENDIAN (MM) TIFF head: phones ship either order
    val tiff = java.nio.ByteBuffer.allocate(26)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    tiff.put('M'.toByte).put('M'.toByte).putShort(42).putInt(8)
    tiff.putShort(1)
    tiff.putShort(0x0112).putShort(3).putInt(1)
    tiff.putShort(7).putShort(0)
    tiff.putInt(0)
    val body = Array[Byte]('E', 'x', 'i', 'f', 0, 0) ++ tiff.array()
    val seg = java.nio.ByteBuffer.allocate(4 + body.length)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    seg.putShort(0xFFE1.toShort).putShort((body.length + 2).toShort).put(body)
    assert(Jpeg.exifOrientation(Jpeg.spliceApp1(plain, seg.array())) == 7)
    // an out-of-range orientation fails loud, not silently
    intercept[IllegalArgumentException](Jpeg.encodeApp1Exif(9))
    // hostile IFD offset/count fail descriptively, not with a raw
    // BufferUnderflow (the Tiff validation posture)
    val evil = Jpeg.encodeApp1Exif(3)
    val evilOff = evil.clone()
    evilOff(4 + 6 + 4) = 0x7F // TIFF IFD offset low byte -> far past end
    val exOff = intercept[IllegalArgumentException](
      Jpeg.exifOrientation(Jpeg.spliceApp1(plain, evilOff)))
    assert(exOff.getMessage.contains("IFD offset"))
    val evilCnt = evil.clone()
    evilCnt(4 + 6 + 8) = 0x7F // entry count low byte -> 127 entries
    val exCnt = intercept[IllegalArgumentException](
      Jpeg.exifOrientation(Jpeg.spliceApp1(plain, evilCnt)))
    assert(exCnt.getMessage.contains("IFD entries"))
  }

  test("restart markers reset DC predictors (DRI 1 and 3 agree with DRI 0)") {
    val vals = Array.tabulate(16)(k => (k * 37 + 11) % 256)
    val base = Jpeg.decode(Jpeg.encodeGrayFlat(32, 32, vals)).pixels.toSeq
    for (dri <- Seq(1, 3)) {
      val enc = Jpeg.encodeGrayFlat(32, 32, vals, dri)
      // the stream must really contain RSTn markers
      val nRst = enc.sliding(2).count(p =>
        (p(0) & 0xFF) == 0xFF && (p(1) & 0xFF) >= 0xD0 && (p(1) & 0xFF) <= 0xD7)
      assert(nRst == 15 / dri, s"dri=$dri wrote $nRst restarts")
      assert(Jpeg.decode(enc).pixels.toSeq == base, s"dri=$dri")
    }
  }

  test("partial edge MCUs are encoded padded and cropped on decode") {
    // 20×12 → 3×2 blocks of 8, right/bottom blocks partially visible
    val vals = Array(10, 80, 150, 220, 40, 99)
    val img = Jpeg.decode(Jpeg.encodeGrayFlat(20, 12, vals))
    assert(img.width == 20 && img.height == 12)
    for (y <- 0 until 12; x <- 0 until 20)
      assert((img.pixels(y * 20 + x) & 0xFF) == vals((y / 8) * 3 + x / 8))
  }

  test("4:2:0 color with neutral chroma decodes to exact gray RGB") {
    val vals = Array.tabulate(16)(k => (k * 53 + 5) % 256)
    val img = Jpeg.decode(Jpeg.encodeColor420Flat(32, 32, vals, 128, 128, dri = 2))
    assert(img.width == 32 && img.height == 32 && img.channels == 3)
    for (y <- 0 until 32; x <- 0 until 32) {
      val v = vals((y / 8) * 4 + x / 8)
      val o = 3 * (y * 32 + x)
      assert((img.pixels(o) & 0xFF) == v && (img.pixels(o + 1) & 0xFF) == v &&
        (img.pixels(o + 2) & 0xFF) == v, s"pixel ($x,$y)")
    }
  }

  test("4:2:0 non-neutral chroma follows the JFIF conversion exactly") {
    val img = Jpeg.decode(Jpeg.encodeColor420Flat(16, 16, Array(100, 100, 100, 100), 90, 170))
    def conv(yv: Int, cb: Int, cr: Int): (Int, Int, Int) = {
      def c(d: Double) = math.max(0, math.min(255, math.floor(d + 0.5).toInt))
      (c(yv + 1.402 * (cr - 128)),
        c(yv - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)),
        c(yv + 1.772 * (cb - 128)))
    }
    val (r, g, b) = conv(100, 90, 170)
    for (p <- 0 until 256) {
      assert((img.pixels(3 * p) & 0xFF) == r)
      assert((img.pixels(3 * p + 1) & 0xFF) == g)
      assert((img.pixels(3 * p + 2) & 0xFF) == b)
    }
  }

  /** Direct (non-separable) IDCT straight from the A.3.3 definition —
    * the independent reference for the transform tests. */
  private def directIdct(coef: Array[Int]): Array[Int] = {
    val out = new Array[Int](64)
    for (y <- 0 until 8; x <- 0 until 8) {
      var s = 0.0
      for (v <- 0 until 8; u <- 0 until 8) {
        val cu = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
        val cv = if (v == 0) 1.0 / math.sqrt(2.0) else 1.0
        s += cu * cv / 4.0 * coef(v * 8 + u) *
          math.cos((2 * x + 1) * u * math.Pi / 16.0) *
          math.cos((2 * y + 1) * v * math.Pi / 16.0)
      }
      out(y * 8 + x) = math.max(0, math.min(255, math.floor(s + 0.5).toInt + 128))
    }
    out
  }

  test("AC coefficients: Huffman runs, ZRL and EOB decode to the direct IDCT") {
    // quantized blocks in natural order; dequant uses FlatQ (DC 8, AC 16)
    val b1 = new Array[Int](64)
    b1(0) = 3; b1(1) = 5; b1(8) = -4; b1(27) = 7 // low-freq mix
    val b2 = new Array[Int](64)
    b2(0) = -9; b2(63) = 2 // 62-zero run: exercises ZRL twice + no EOB
    val b3 = new Array[Int](64)
    b3(2) = -6; b3(10) = 1 // zero DC diff from b2? (pred chain: -9 -> 0)
    val blocks = Array(b1, b2, b3, new Array[Int](64))
    val enc = Jpeg.encodeGrayCoeffs(32, 8, blocks)
    val img = Jpeg.decode(enc)
    assert(img.width == 32 && img.height == 8)
    for ((blk, bi) <- blocks.zipWithIndex) {
      val deq = Array.tabulate(64)(i => blk(i) * Jpeg.FlatQ(i))
      val want = directIdct(deq)
      for (y <- 0 until 8; x <- 0 until 8)
        assert((img.pixels(y * 32 + bi * 8 + x) & 0xFF) == want(y * 8 + x),
          s"block $bi pixel ($x,$y)")
    }
  }

  test("textured blocks decode to flat value + the fixed AC pattern LUT") {
    val vals = Array(64, 100, 191, 150, 77, 128, 65, 190)
    val img = Jpeg.decode(Jpeg.encodeGrayTextured(32, 16, vals, dri = 2))
    val pat = Jpeg.AcPatternPixels
    for (y <- 0 until 16; x <- 0 until 32) {
      val want = vals((y / 8) * 4 + x / 8) + pat((y % 8) * 8 + x % 8)
      assert((img.pixels(y * 32 + x) & 0xFF) == want, s"pixel ($x,$y)")
    }
    // the independent direct IDCT agrees with the LUT decomposition
    val coef = new Array[Int](64)
    coef(0) = (vals(0) - 128) * Jpeg.FlatQ(0)
    Jpeg.AcPatternCoefs.foreach { case (i, q) => coef(i) = q * Jpeg.FlatQ(i) }
    val direct = directIdct(coef)
    for (p <- 0 until 64) assert(direct(p) == vals(0) + pat(p), s"LUT pos $p")
  }

  test("entropy stream byte-stuffs FF and un-stuffs on decode") {
    // search AC-rich single-block fixtures until one stuffs an FF 00,
    // then check that stream decodes to the independent direct IDCT
    val found = (0 until 400).exists { seed =>
      val blk = new Array[Int](64)
      blk(0) = seed % 200 - 100
      blk(1) = (seed * 7) % 127 - 63
      blk(9) = (seed * 13) % 127 - 63
      blk(18) = (seed * 29) % 127 - 63
      val enc = Jpeg.encodeGrayCoeffs(8, 8, Array(blk))
      val stuffed = enc.sliding(2).exists(p =>
        (p(0) & 0xFF) == 0xFF && (p(1) & 0xFF) == 0x00)
      stuffed && {
        val want = directIdct(Array.tabulate(64)(i => blk(i) * Jpeg.FlatQ(i)))
        Jpeg.decode(enc).pixels.toSeq.map(_ & 0xFF) == want.toSeq
      }
    }
    assert(found, "no fixture produced a stuffed byte — stuffing path untested")
  }

  test("non-baseline and malformed streams fail loudly") {
    val ok = Jpeg.encodeGrayFlat(16, 16, Array(50, 60, 70, 80))
    // flip SOF0 -> SOF2 (progressive)
    val prog = ok.clone()
    val sof = prog.indices.find(i =>
      (prog(i) & 0xFF) == 0xFF && (prog(i + 1) & 0xFF) == 0xC0).get
    prog(sof + 1) = 0xC2.toByte
    intercept[IllegalArgumentException](Jpeg.decode(prog))
    // truncated entropy stream
    intercept[IllegalArgumentException](Jpeg.decode(ok.dropRight(8)))
    // missing SOI
    intercept[IllegalArgumentException](Jpeg.decode(ok.drop(2)))
  }

  test("decodeImage sniffs JPEG by FF D8 magic") {
    val img = MediaCodec.decodeImage(Jpeg.encodeGrayFlat(8, 8, Array(42)))
    assert(img.channels == 1 && (img.pixels(0) & 0xFF) == 42)
  }
}
