package graft.sources

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater}

import org.scalatest.funsuite.AnyFunSuite

/** Byte-level spec for the from-spec PNG codec. Decode fixtures are
  * built BY HAND (chunk framing, CRCs, raw filtered scanlines through a
  * bare Deflater), so an encoder/decoder pair sharing a layout mistake
  * cannot pass; the round-trip tests then drive the encoder's
  * row-cycling filter schedule through the independent decoder. */
class PngSpec extends AnyFunSuite {

  private def handPng(w: Int, h: Int, colorType: Int, depth: Int,
      filtered: Array[Byte], palette: Array[Byte] = null,
      interlace: Int = 0, corruptCrc: Boolean = false): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    o.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    def chunk(tpe: String, body: Array[Byte], breakCrc: Boolean = false): Unit = {
      def u32(v: Long): Unit = {
        o.write(((v >> 24) & 0xFF).toInt); o.write(((v >> 16) & 0xFF).toInt)
        o.write(((v >> 8) & 0xFF).toInt); o.write((v & 0xFF).toInt)
      }
      u32(body.length.toLong); o.write(tpe.getBytes); o.write(body)
      val c = new CRC32(); c.update(tpe.getBytes); c.update(body)
      u32(if (breakCrc) c.getValue ^ 1 else c.getValue)
    }
    val ihdr = new Array[Byte](13)
    def p32(off: Int, v: Int): Unit = {
      ihdr(off) = (v >> 24).toByte; ihdr(off + 1) = (v >> 16).toByte
      ihdr(off + 2) = (v >> 8).toByte; ihdr(off + 3) = v.toByte
    }
    p32(0, w); p32(4, h)
    ihdr(8) = depth.toByte; ihdr(9) = colorType.toByte
    ihdr(12) = interlace.toByte
    chunk("IHDR", ihdr)
    if (palette != null) chunk("PLTE", palette)
    val d = new Deflater(); d.setInput(filtered); d.finish()
    val comp = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) comp.write(buf, 0, d.deflate(buf))
    // split the stream over TWO IDAT chunks to pin multi-IDAT concat
    val cb = comp.toByteArray
    val cut = cb.length / 2
    chunk("IDAT", cb.take(cut), breakCrc = corruptCrc)
    chunk("IDAT", cb.drop(cut))
    chunk("IEND", Array.emptyByteArray)
    o.toByteArray
  }

  test("hand-built gray fixture: each filter type reconstructs per spec") {
    // 4x5 gray, one row per filter type. Raw pixel plan (what a correct
    // decoder must produce) chosen first; filtered bytes derived BY HAND
    // from the spec's forward filter definitions.
    val px = Array[Int](
      10, 20, 30, 40, // row0 None
      15, 25, 35, 45, // row1 Sub:   d = cur - left
      20, 30, 40, 50, // row2 Up:    d = cur - up
      30, 40, 50, 60, // row3 Avg:   d = cur - (left+up)/2
      35, 50, 60, 70) // row4 Paeth: d = cur - paeth(l, u, ul)
    val f = new ByteArrayOutputStream()
    f.write(0); Seq(10, 20, 30, 40).foreach(f.write)
    f.write(1); f.write(15); f.write(10); f.write(10); f.write(10)
    f.write(2); f.write(5); f.write(5); f.write(5); f.write(5)
    // row3 Avg: left(recon) ; up = row2 = 20 30 40 50
    // x0: cur 30, left 0, up 20 -> 30-10=20 ; x1: 40-(30+30)/2=10
    // x2: 50-(40+40)/2=10 ; x3: 60-(50+50)/2=10
    f.write(3); f.write(20); f.write(10); f.write(10); f.write(10)
    // row4 Paeth: up = row3 = 30 40 50 60
    // x0: l=0 u=30 ul=0 -> p=30 -> pred=u=30 ; 35-30=5
    // x1: l=35 u=40 ul=30 -> p=45, pa=10 pb=5 pc=15 -> pred=40 ; 50-40=10
    // x2: l=50 u=50 ul=40 -> p=60, pa=10 pb=10 pc=20 -> pred=l=50 ; 60-50=10
    // x3: l=60 u=60 ul=50 -> p=70, pa=10 pb=10 pc=20 -> pred=l=60 ; 70-60=10
    f.write(4); f.write(5); f.write(10); f.write(10); f.write(10)
    val img = Png.decode(handPng(4, 5, 0, 8, f.toByteArray))
    assert(img.width == 4 && img.height == 5 && img.channels == 1)
    assert(img.pixels.map(_ & 0xFF).toSeq == px.toSeq)
  }

  test("hand-built palette fixture maps PLTE entries to RGB") {
    val plte = Array[Byte](10, 11, 12, 20, 21, 22, 30, 31, 32)
    // two 1-px rows, both filter None: indexes 2 then 1
    val img = Png.decode(handPng(1, 2, 3, 8, Array[Byte](0, 2, 0, 1),
      palette = plte))
    assert(img.channels == 3)
    assert(img.pixels.toSeq == Seq[Byte](30, 31, 32, 20, 21, 22))
  }

  test("RGBA and gray+alpha drop alpha; RGB bpp=3 offsets in Sub filter") {
    // 2x1 RGBA, Sub filter: second pixel delta vs first (bpp=4)
    val raw = new ByteArrayOutputStream()
    raw.write(1)
    Seq(100, 110, 120, 255).foreach(raw.write) // first: minus zero
    Seq(10, 10, 10, 0).foreach(raw.write) // second = first + 10, alpha 255
    val img = Png.decode(handPng(2, 1, 6, 8, raw.toByteArray))
    assert(img.channels == 3)
    assert(img.pixels.map(_ & 0xFF).toSeq == Seq(100, 110, 120, 110, 120, 130))
    val ga = new ByteArrayOutputStream()
    ga.write(0); Seq(77, 255, 88, 0).foreach(ga.write)
    val img2 = Png.decode(handPng(2, 1, 4, 8, ga.toByteArray))
    assert(img2.channels == 1)
    assert(img2.pixels.map(_ & 0xFF).toSeq == Seq(77, 88))
  }

  test("CRC corruption, 16-bit palette and bad interlace are rejected loudly") {
    val f = Array[Byte](0, 1, 2)
    intercept[IllegalArgumentException](
      Png.decode(handPng(3, 1, 0, 8, f, corruptCrc = true)))
    // 16-bit GRAY is now supported; 16-bit PALETTE is out of spec
    intercept[IllegalArgumentException](
      Png.decode(handPng(3, 1, 3, 16, f,
        palette = Array[Byte](1, 2, 3, 4, 5, 6))))
    // a truncated 16-bit stream (3 filtered bytes for a 7-byte raster)
    intercept[IllegalArgumentException](
      Png.decode(handPng(3, 1, 0, 16, f)))
    // unknown interlace method (Adam7 = 1 is now supported; 2 is not)
    intercept[IllegalArgumentException](
      Png.decode(handPng(3, 1, 0, 8, f, interlace = 2)))
    // an interlace=1 flag over a non-interlaced (too short) stream must
    // fail loudly, not misread
    intercept[IllegalArgumentException](
      Png.decode(handPng(3, 1, 0, 8, f, interlace = 1)))
  }

  test("Adam7 round trip: gray and RGB, sizes straddling the pass grid") {
    for ((w, h, ch) <- Seq((1, 1, 1), (3, 1, 1), (7, 11, 1), (16, 5, 3),
      (8, 8, 3), (9, 2, 3), (2, 9, 1), (33, 17, 3))) {
      val px = Array.tabulate(w * h * ch)(i => ((i * 41 + (i * i) % 239) % 256).toByte)
      val img = Png.decode(Png.encodeAdam7(w, h, ch, px))
      assert(img.width == w && img.height == h && img.channels == ch, s"($w,$h,$ch)")
      assert(img.pixels.toSeq == px.toSeq, s"($w,$h,$ch)")
    }
  }

  test("Adam7 and sequential encodes of the same raster decode identically") {
    val (w, h, ch) = (21, 13, 3)
    val px = Array.tabulate(w * h * ch)(i => ((i * 7 + 5) % 256).toByte)
    val a = Png.decode(Png.encodeAdam7(w, h, ch, px))
    val b = Png.decode(Png.encode(w, h, ch, px))
    assert(a.pixels.toSeq == b.pixels.toSeq)
  }

  test("encoder round trip: all five filters, gray and RGB, odd sizes") {
    for ((w, h, ch) <- Seq((7, 11, 1), (16, 5, 3), (1, 6, 3), (33, 7, 1))) {
      val px = Array.tabulate(w * h * ch)(i => ((i * 37 + (i * i) % 251) % 256).toByte)
      val img = Png.decode(Png.encode(w, h, ch, px))
      assert(img.width == w && img.height == h && img.channels == ch, s"($w,$h,$ch)")
      assert(img.pixels.toSeq == px.toSeq, s"($w,$h,$ch)")
    }
  }

  test("decodeImage sniffs PNG by signature") {
    val px = Array.tabulate(12)(_.toByte)
    val img = MediaCodec.decodeImage(Png.encode(4, 3, 1, px))
    assert(img.channels == 1 && img.pixels.toSeq == px.toSeq)
  }

  // --------------------------------------------------------- 16-bit depth

  test("hand-traced 16-bit gray: Sub filter steps 2 bytes, not 1") {
    // 2x2 gray16. Row 0 filter None: samples 0x0102 0x0304. Row 1
    // filter Sub with bpp=2: targets 0x0510 0x0623, so the filtered
    // bytes are (05 10) then (06-05, 23-10) = (01 13). A decoder that
    // stepped 1 byte would reconstruct 0x0515 0x1629 instead.
    val filtered = Array[Byte](
      0, 0x01, 0x02, 0x03, 0x04,
      1, 0x05, 0x10, 0x01, 0x13)
    val png = handPng(2, 2, 0, 16, filtered)
    val img16 = Png.decode16(png)
    assert(img16.width == 2 && img16.height == 2 && img16.channels == 1)
    assert(img16.samples.toSeq == Seq(0x0102, 0x0304, 0x0510, 0x0623))
    // the 8-bit route takes the high byte of each sample (spec 13.12)
    val img8 = Png.decode(png)
    assert(img8.pixels.map(_ & 0xFF).toSeq == Seq(0x01, 0x03, 0x05, 0x06))
  }

  test("16-bit gray+alpha drops alpha at full precision") {
    // 2x1, filter None: (gray, alpha) = (0x1234, 0xFFFF), (0xABCD, 0x0001)
    val filtered = Array[Byte](0, 0x12, 0x34, 0xFF.toByte, 0xFF.toByte,
      0xAB.toByte, 0xCD.toByte, 0x00, 0x01)
    val png = handPng(2, 1, 4, 16, filtered)
    assert(Png.decode16(png).samples.toSeq == Seq(0x1234, 0xABCD))
    assert(Png.decode(png).pixels.map(_ & 0xFF).toSeq == Seq(0x12, 0xAB))
  }

  test("encode16 round trip: all five filters, gray and RGB, odd sizes") {
    for ((w, h, ch) <- Seq((3, 7, 1), (5, 6, 3), (1, 5, 1), (16, 9, 3))) {
      // values straddle 0x8000 to catch sign bugs, and exercise both bytes
      val px = Array.tabulate(w * h * ch)(i => (i * 9173 + 257) % 65536)
      val img = Png.decode16(Png.encode16(w, h, ch, px))
      assert(img.width == w && img.height == h && img.channels == ch,
        s"($w,$h,$ch)")
      assert(img.samples.toSeq == px.toSeq, s"($w,$h,$ch)")
    }
  }

  test("decodeImage sniffs a 16-bit PNG and serves the high bytes") {
    val px = Array.tabulate(6)(i => i * 256 * 40 + 7) // high bytes 0,40,80...
    val img = MediaCodec.decodeImage(Png.encode16(3, 2, 1, px))
    assert(img.channels == 1)
    assert(img.pixels.map(_ & 0xFF).toSeq == px.map(_ >> 8).toSeq)
  }

  test("decode16 on an 8-bit file fails loudly (no silent rescale)") {
    val e = intercept[IllegalArgumentException](
      Png.decode16(Png.encode(2, 2, 1, Array.tabulate(4)(_.toByte))))
    assert(e.getMessage.contains("decode16"))
  }

  // --------------------------------------------------------------- APNG

  /** Re-locate the nth chunk of `tpe`, apply `f` to its body, fix the
    * CRC — for constructing in-spec-invalid fixtures from valid ones. */
  private def patchChunk(png: Array[Byte], tpe: String, n: Int,
      f: Array[Byte] => Unit): Array[Byte] = {
    val out = png.clone
    var pos = 8
    var seen = 0
    while (pos + 8 <= out.length) {
      val len = ((out(pos) & 0xFF) << 24) | ((out(pos + 1) & 0xFF) << 16) |
        ((out(pos + 2) & 0xFF) << 8) | (out(pos + 3) & 0xFF)
      val t = new String(out, pos + 4, 4, "US-ASCII")
      if (t == tpe) {
        if (seen == n) {
          val body = java.util.Arrays.copyOfRange(out, pos + 8, pos + 8 + len)
          f(body)
          System.arraycopy(body, 0, out, pos + 8, len)
          val c = new CRC32()
          c.update(out, pos + 4, 4 + len)
          val v = c.getValue
          out(pos + 8 + len) = ((v >> 24) & 0xFF).toByte
          out(pos + 8 + len + 1) = ((v >> 16) & 0xFF).toByte
          out(pos + 8 + len + 2) = ((v >> 8) & 0xFF).toByte
          out(pos + 8 + len + 3) = (v & 0xFF).toByte
          return out
        }
        seen += 1
      }
      pos += 8 + len + 4
    }
    throw new IllegalArgumentException(s"no chunk $tpe#$n")
  }

  test("APNG: sub-rect frames compose; plain decode returns frame 0") {
    val (w, h) = (6, 4)
    val base = Array.tabulate(w * h)(i => (i * 3 + 1).toByte)
    val p1 = Array.tabulate(2 * 2)(i => (200 + i).toByte)
    val p2 = Array.tabulate(3 * 1)(i => (100 + i).toByte)
    val png = Png.encodeApng(w, h, 1, Seq(
      Png.ApngFrame(0, 0, w, h, base),
      Png.ApngFrame(2, 1, 2, 2, p1),
      Png.ApngFrame(3, 3, 3, 1, p2)), numPlays = 7)
    val (plays, frames) = Png.decodeApng(png)
    assert(plays == 7 && frames.length == 3)
    assert(frames(0).pixels.toSeq == base.toSeq)
    // frame 1 = base with the 2x2 patch at (2,1); dispose NONE keeps it
    val want1 = base.clone
    for (j <- 0 until 2; i <- 0 until 2)
      want1((1 + j) * w + 2 + i) = p1(j * 2 + i)
    assert(frames(1).pixels.toSeq == want1.toSeq)
    val want2 = want1.clone
    for (i <- 0 until 3) want2(3 * w + 3 + i) = p2(i)
    assert(frames(2).pixels.toSeq == want2.toSeq)
    // a non-APNG-aware decoder must see the default image
    assert(Png.decode(png).pixels.toSeq == base.toSeq)
    assert(MediaCodec.decodeImage(png).width == w)
  }

  test("APNG: dispose BACKGROUND clears the frame's region before the next") {
    val (w, h) = (4, 3)
    val base = Array.fill(w * h)(9.toByte)
    val p1 = Array.fill(2 * 2)(50.toByte)
    val p2 = Array.fill(1)(77.toByte)
    val png = Png.encodeApng(w, h, 1, Seq(
      Png.ApngFrame(0, 0, w, h, base),
      Png.ApngFrame(1, 1, 2, 2, p1, disposeOp = 1),
      Png.ApngFrame(0, 0, 1, 1, p2)))
    val (_, frames) = Png.decodeApng(png)
    val want = base.clone
    // frame 1's 2x2 region cleared to 0 (BACKGROUND), then p2 at (0,0)
    for (j <- 0 until 2; i <- 0 until 2) want((1 + j) * w + 1 + i) = 0
    want(0) = 77
    assert(frames(2).pixels.toSeq == want.toSeq)
  }

  test("APNG: RGB frames, 3-byte pixel step survives the rect copy") {
    val (w, h) = (3, 2)
    val base = Array.tabulate(w * h * 3)(i => (i + 1).toByte)
    val p1 = Array.tabulate(1 * 1 * 3)(i => (240 + i).toByte)
    val (_, frames) = Png.decodeApng(Png.encodeApng(w, h, 3, Seq(
      Png.ApngFrame(0, 0, w, h, base), Png.ApngFrame(2, 1, 1, 1, p1))))
    val want = base.clone
    for (c <- 0 until 3) want((1 * w + 2) * 3 + c) = p1(c)
    assert(frames(1).channels == 3 && frames(1).pixels.toSeq == want.toSeq)
  }

  test("APNG: sequence gaps, dispose PREVIOUS and rect overflow fail loud") {
    val ok = Png.encodeApng(4, 4, 1, Seq(
      Png.ApngFrame(0, 0, 4, 4, Array.fill(16)(1.toByte)),
      Png.ApngFrame(1, 1, 2, 2, Array.fill(4)(2.toByte))))
    // fdAT#0 sequence bumped: 2 -> 5
    val badSeq = patchChunk(ok, "fdAT", 0, b => b(3) = 5.toByte)
    val e1 = intercept[IllegalArgumentException](Png.decodeApng(badSeq))
    assert(e1.getMessage.contains("sequence"))
    // dispose op 2 (PREVIOUS) on frame 1's fcTL
    val badDisp = patchChunk(ok, "fcTL", 1, b => b(24) = 2.toByte)
    val e2 = intercept[IllegalArgumentException](Png.decodeApng(badDisp))
    assert(e2.getMessage.contains("dispose"))
    // frame rect pushed past the canvas (x offset 3 + width 2 > 4)
    val badRect = patchChunk(ok, "fcTL", 1, b => b(15) = 3.toByte)
    val e3 = intercept[IllegalArgumentException](Png.decodeApng(badRect))
    assert(e3.getMessage.contains("rect"))
    // acTL frame count mismatch
    val badCount = patchChunk(ok, "acTL", 0, b => b(3) = 3.toByte)
    val e4 = intercept[IllegalArgumentException](Png.decodeApng(badCount))
    assert(e4.getMessage.contains("declares"))
  }
}
