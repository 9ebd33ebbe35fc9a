package graft.sources

import java.io.ByteArrayOutputStream

import org.scalatest.funsuite.AnyFunSuite

/** Byte-level spec for the from-spec GIF codec. Decode fixtures are
  * assembled BY HAND — container framing and hand-traced LZW code
  * streams through a local bit-packer independent of the encoder — so
  * an encoder/decoder pair sharing a width-schedule mistake cannot
  * pass; round-trip tests then drive the real LZW compressor through
  * the independently-pinned decoder across width growth, table-full
  * reset and the K-ω-K case. */
class GifSpec extends AnyFunSuite {

  /** Hand container: GCT of 2^(sizeBits+1) gray entries (i*10), one
    * image, code stream packed LSB-first from explicit (code,width)
    * pairs. */
  private def handGif(w: Int, h: Int, sizeBits: Int, minCodeSize: Int,
      codes: Seq[(Int, Int)], sig: String = "GIF87a",
      extension: Boolean = false, interlace: Boolean = false): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    def u16(v: Int): Unit = { o.write(v & 0xFF); o.write((v >> 8) & 0xFF) }
    o.write(sig.getBytes("US-ASCII"))
    u16(w); u16(h)
    o.write(0x80 | sizeBits) // GCT present
    o.write(0); o.write(0)
    val n = 1 << (sizeBits + 1)
    (0 until n).foreach { i => o.write(i * 10); o.write(i * 10); o.write(i * 10) }
    if (extension) { // 89a comment extension: label + one sub-block
      o.write(0x21); o.write(0xFE); o.write(3); o.write('h'); o.write('i'); o.write('!')
      o.write(0)
    }
    o.write(0x2C)
    u16(0); u16(0); u16(w); u16(h)
    o.write(if (interlace) 0x40 else 0x00)
    o.write(minCodeSize)
    // pack codes LSB-first (independent of the encoder's BitPacker)
    var acc = 0L; var nbits = 0
    val body = new ByteArrayOutputStream()
    codes.foreach { case (c, width) =>
      acc |= c.toLong << nbits; nbits += width
      while (nbits >= 8) { body.write((acc & 0xFF).toInt); acc >>>= 8; nbits -= 8 }
    }
    if (nbits > 0) body.write((acc & 0xFF).toInt)
    val bb = body.toByteArray
    var off = 0
    while (off < bb.length) {
      val len = math.min(255, bb.length - off)
      o.write(len); o.write(bb, off, len); off += len
    }
    o.write(0) // terminator
    o.write(0x3B)
    o.toByteArray
  }

  test("hand-traced stream decodes: width grows 3->4 exactly at slot 8") {
    // pixels 0,1,1,2 with minCodeSize=2: clear=4, eoi=5; the encoder
    // trace emits 0,1,1 at width 3 (entries 6,7,8 defined), then 2 and
    // EOI at width 4 — the decoder must bump when ITS next slot hits 8
    val g = handGif(2, 2, 1, 2,
      Seq((4, 3), (0, 3), (1, 3), (1, 3), (2, 4), (5, 4)))
    val img = Gif.decode(g)
    assert((img.width, img.height, img.channels) == (2, 2, 3))
    val grays = img.pixels.grouped(3).map(_(0) & 0xFF).toSeq
    assert(grays == Seq(0, 10, 10, 20)) // palette entry i -> i*10
    // every pixel expands r=g=b through the gray ramp
    assert(img.pixels.grouped(3).forall(p => p(0) == p(1) && p(1) == p(2)))
  }

  test("hand-traced K-omega-K: code references the entry being defined") {
    // pixels 0,0,0: encoder emits 0 then 6 (== next free slot at that
    // moment) — the decoder must synthesize prev + prev.head
    val g = handGif(3, 1, 1, 2, Seq((4, 3), (0, 3), (6, 3), (5, 3)))
    val img = Gif.decode(g)
    assert(img.pixels.grouped(3).map(_(0) & 0xFF).toSeq == Seq(0, 0, 0))
  }

  test("89a signature and extension blocks are accepted and skipped") {
    val g = handGif(3, 1, 1, 2, Seq((4, 3), (0, 3), (6, 3), (5, 3)),
      sig = "GIF89a", extension = true)
    assert(Gif.decode(g).width == 3)
  }

  test("interlaced images are rejected loudly") {
    val g = handGif(3, 1, 1, 2, Seq((4, 3), (0, 3), (6, 3), (5, 3)),
      interlace = true)
    val e = intercept[IllegalArgumentException](Gif.decode(g))
    assert(e.getMessage.contains("interlaced"))
  }

  test("truncated stream and bad signature are rejected") {
    val good = Gif.encodeGray(4, 4, Array.tabulate(16)(_.toByte))
    intercept[IllegalArgumentException](Gif.decode(good.take(20)))
    val bad = good.clone(); bad(3) = '7'
    intercept[IllegalArgumentException](Gif.decode(bad))
  }

  private def roundTrip(w: Int, h: Int, px: Array[Byte]): Unit = {
    val img = Gif.decode(Gif.encodeGray(w, h, px))
    assert((img.width, img.height, img.channels) == (w, h, 3))
    val grays = img.pixels.grouped(3).map(_(0).toByte).toArray
    assert(java.util.Arrays.equals(grays, px), s"${w}x$h round trip")
  }

  test("round trip: small varied raster") {
    roundTrip(7, 3, Array.tabulate(21)(i => (i * 37 % 256).toByte))
  }

  test("round trip: repetitive text-like data builds deep entries") {
    val pat = "the quick brown fox ".getBytes("US-ASCII")
    roundTrip(40, 25, Array.tabulate(1000)(i => pat(i % pat.length)))
  }

  test("round trip: incompressible raster crosses 9->12 bit widths and the 4096 reset") {
    // LCG bytes defeat compression: one dictionary entry per ~2 pixels,
    // so 12800 pixels force width 9->10->11->12 and a mid-stream clear
    var s = 12345L
    val px = Array.tabulate(64 * 200) { _ =>
      s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 33) & 0xFF).toByte
    }
    roundTrip(64, 200, px)
  }

  test("round trip: constant raster (maximal run-length chains)") {
    roundTrip(50, 40, Array.fill(2000)(129.toByte))
  }

  test("animated round trip: frames decode in order with GCE blocks between") {
    val frames = (0 until 4).map(f =>
      Array.tabulate(30)(p => ((p * 13 + f * 41) % 256).toByte))
    val g = Gif.encodeGrayFrames(6, 5, frames)
    assert(new String(g, 0, 6, "US-ASCII") == "GIF89a")
    val dec = Gif.decodeFrames(g)
    assert(dec.length == 4)
    dec.zip(frames).foreach { case (img, px) =>
      assert(java.util.Arrays.equals(
        img.pixels.grouped(3).map(_(0).toByte).toArray, px))
    }
    // decode() takes the first frame only
    assert(java.util.Arrays.equals(
      Gif.decode(g).pixels.grouped(3).map(_(0).toByte).toArray, frames(0)))
  }

  test("partial-frame animation is rejected (no disposal compositing)") {
    // hand-build: screen 4x4 but the image descriptor claims 2x2 at (1,1)
    val o = new ByteArrayOutputStream()
    def u16(v: Int): Unit = { o.write(v & 0xFF); o.write((v >> 8) & 0xFF) }
    o.write("GIF87a".getBytes("US-ASCII")); u16(4); u16(4)
    o.write(0x80); o.write(0); o.write(0)
    (0 until 2).foreach { i => o.write(i); o.write(i); o.write(i) }
    o.write(0x2C); u16(1); u16(1); u16(2); u16(2); o.write(0)
    o.write(2); o.write(0) // min code size + empty stream (never reached)
    val e = intercept[IllegalArgumentException](Gif.decodeFrames(o.toByteArray))
    assert(e.getMessage.contains("partial-frame"))
  }

  test("MediaCodec sniffs GIF payloads") {
    val img = MediaCodec.decodeImage(Gif.encodeGray(2, 2, Array[Byte](1, 2, 3, 4)))
    assert(img.channels == 3 && (img.pixels(0) & 0xFF) == 1)
  }
}
