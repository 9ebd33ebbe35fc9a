package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import org.scalatest.funsuite.AnyFunSuite

/** Byte-level spec for the from-spec media codecs. The decode fixtures
  * are built BY HAND from the format specifications (not via the
  * encoders), so an encoder/decoder pair that inverts a shared layout
  * mistake cannot pass. */
class MediaCodecSpec extends AnyFunSuite {

  // ---- BMP ----

  /** 3×2 bottom-up 24-bpp BMP built field by field. Row stride is
    * 3*3=9 → padded to 12. Logical pixels (top-down RGB):
    * row0: (1,2,3) (4,5,6) (7,8,9) ; row1: (10,11,12) (13,14,15) (16,17,18) */
  private def handBmp24: Array[Byte] = {
    val b = ByteBuffer.allocate(54 + 24).order(ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(78).putShort(0).putShort(0)
    b.putInt(54) // bfOffBits
    b.putInt(40).putInt(3).putInt(2) // biSize, w, h (bottom-up)
    b.putShort(1).putShort(24).putInt(0).putInt(24)
    b.putInt(2835).putInt(2835).putInt(0).putInt(0)
    // bottom-up: file row 0 = logical row 1, stored BGR + 3 pad bytes
    b.put(Array[Byte](12, 11, 10, 15, 14, 13, 18, 17, 16, 0, 0, 0))
    b.put(Array[Byte](3, 2, 1, 6, 5, 4, 9, 8, 7, 0, 0, 0))
    b.array()
  }

  test("decodeBmp: hand-built bottom-up 24-bpp with row padding") {
    val img = MediaCodec.decodeBmp(handBmp24)
    assert(img.width == 3 && img.height == 2 && img.channels == 3)
    assert(img.pixels.toSeq == (1 to 18).map(_.toByte))
  }

  test("decodeBmp: top-down (negative height) 32-bpp") {
    val b = ByteBuffer.allocate(54 + 16).order(ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(70).putShort(0).putShort(0)
    b.putInt(54)
    b.putInt(40).putInt(2).putInt(-2) // negative = top-down
    b.putShort(1).putShort(32).putInt(0).putInt(16)
    b.putInt(0).putInt(0).putInt(0).putInt(0)
    // top-down BGRA: rows in logical order
    b.put(Array[Byte](3, 2, 1, -1, 6, 5, 4, -1))
    b.put(Array[Byte](9, 8, 7, -1, 12, 11, 10, -1))
    val img = MediaCodec.decodeBmp(b.array())
    assert(img.width == 2 && img.height == 2)
    assert(img.pixels.toSeq == (1 to 12).map(_.toByte))
  }

  test("BMP 24/32 encode→decode roundtrip (incl. non-multiple-of-4 widths)") {
    for (w <- Seq(1, 3, 5, 64); h <- Seq(1, 2, 7)) {
      val rgb = Array.tabulate(w * h * 3)(i => ((i * 37 + 11) % 251).toByte)
      val d24 = MediaCodec.decodeBmp(MediaCodec.encodeBmp24(w, h, rgb))
      val d32 = MediaCodec.decodeBmp(MediaCodec.encodeBmp32(w, h, rgb))
      assert(d24.width == w && d24.height == h && d24.pixels.toSeq == rgb.toSeq)
      assert(d32.width == w && d32.height == h && d32.pixels.toSeq == rgb.toSeq)
    }
  }

  test("decodeBmp rejects compressed / paletted files") {
    val b = ByteBuffer.wrap(handBmp24.clone()).order(ByteOrder.LITTLE_ENDIAN)
    b.putInt(30, 1) // biCompression = BI_RLE8
    intercept[IllegalArgumentException](MediaCodec.decodeBmp(b.array()))
  }

  // ---- Netpbm ----

  test("decodeNetpbm: P5 with comments and irregular whitespace") {
    val hdr = "P5 # inline comment\n#full comment line\n  3\t2 # dims\n255\n"
    val raster = Array[Byte](10, 20, 30, 40, 50, 60)
    val img = MediaCodec.decodeNetpbm(hdr.getBytes("US-ASCII") ++ raster)
    assert(img.width == 3 && img.height == 2 && img.channels == 1)
    assert(img.pixels.toSeq == raster.toSeq)
  }

  test("decodeNetpbm: P6 and PPM/PGM roundtrips") {
    val rgb = Array.tabulate(4 * 3 * 3)(i => (i * 7 % 256).toByte)
    val viaP6 = MediaCodec.decodeNetpbm(MediaCodec.encodePpm(4, 3, rgb))
    assert(viaP6.channels == 3 && viaP6.pixels.toSeq == rgb.toSeq)
    val gray = Array.tabulate(5 * 2)(i => (i * 11 % 256).toByte)
    val viaP5 = MediaCodec.decodeNetpbm(MediaCodec.encodePgm(5, 2, gray))
    assert(viaP5.channels == 1 && viaP5.width == 5 && viaP5.height == 2 &&
      viaP5.pixels.toSeq == gray.toSeq)
  }

  test("decodeBmp: 8-bpp paletted (BGRA color table) with row padding") {
    // 3x1 paletted image: indexes 0,1,2 -> RGB from the table; stride 4
    val b = ByteBuffer.allocate(54 + 3 * 4 + 4).order(ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(70).putShort(0).putShort(0)
    b.putInt(54 + 12) // data after the 3-entry table
    b.putInt(40).putInt(3).putInt(1)
    b.putShort(1).putShort(8).putInt(0).putInt(4)
    b.putInt(0).putInt(0).putInt(3).putInt(0) // biClrUsed = 3
    // color table BGRA: (B,G,R,0)
    b.put(Array[Byte](30, 20, 10, 0)) // idx0 -> RGB(10,20,30)
    b.put(Array[Byte](60, 50, 40, 0)) // idx1 -> RGB(40,50,60)
    b.put(Array[Byte](90, 80, 70, 0)) // idx2 -> RGB(70,80,90)
    b.put(Array[Byte](0, 1, 2, 0))    // pixel row: indexes + 1 pad byte
    val img = MediaCodec.decodeBmp(b.array())
    assert(img.width == 3 && img.height == 1)
    assert(img.pixels.toSeq == Seq[Byte](10, 20, 30, 40, 50, 60, 70, 80, 90))
  }

  test("decodeNetpbm: ASCII P2 and P3 forms") {
    val p2 = "P2\n# ascii gray\n3 2\n255\n0 64 128\n192 255 7\n"
    val g = MediaCodec.decodeNetpbm(p2.getBytes("US-ASCII"))
    assert(g.width == 3 && g.height == 2 && g.channels == 1)
    assert(g.pixels.map(_ & 0xFF).toSeq == Seq(0, 64, 128, 192, 255, 7))
    val p3 = "P3\n2 1\n255\n1 2 3  4 5 6\n"
    val c = MediaCodec.decodeNetpbm(p3.getBytes("US-ASCII"))
    assert(c.channels == 3 && c.pixels.toSeq == Seq[Byte](1, 2, 3, 4, 5, 6))
    // truncated ASCII raster fails instead of zero-filling
    intercept[IllegalArgumentException](
      MediaCodec.decodeNetpbm("P2\n2 2\n255\n1 2 3\n".getBytes("US-ASCII")))
  }

  test("decodeNetpbm rejects 2-byte maxval") {
    val bytes = "P5\n2 2\n65535\n".getBytes("US-ASCII") ++ Array[Byte](1, 2, 3, 4)
    intercept[IllegalArgumentException](MediaCodec.decodeNetpbm(bytes))
  }

  // ---- WAV ----

  /** Hand-built WAV with an unknown odd-sized chunk BEFORE fmt/data —
    * the chunk walk must skip it with 2-byte alignment. */
  test("decodeWav: hand-built file with extra odd-sized chunk") {
    val samples = Array[Short](100, -200, 32767, -32768, 0)
    val data = samples.flatMap(s0 => Array((s0 & 0xFF).toByte, ((s0 >> 8) & 0xFF).toByte))
    val junk = Array[Byte](1, 2, 3) // odd size → 1 pad byte follows
    val b = ByteBuffer.allocate(12 + (8 + 4) + (8 + 16) + (8 + data.length))
      .order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(0).put("WAVE".getBytes("US-ASCII"))
    b.put("JUNK".getBytes("US-ASCII")).putInt(3).put(junk).put(0.toByte)
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
    b.putShort(1).putShort(1).putInt(44100).putInt(88200).putShort(2).putShort(16)
    b.put("data".getBytes("US-ASCII")).putInt(data.length).put(data)
    val audio = MediaCodec.decodeWav(b.array())
    assert(audio.sampleRate == 44100 && audio.channels == 1)
    assert(audio.samples.toSeq == samples.toSeq)
  }

  test("WAV encode→decode roundtrip") {
    val samples = Array.tabulate(1000)(i => ((i * 997 - 500) % 32768).toShort)
    val audio = MediaCodec.decodeWav(MediaCodec.encodeWav(8000, samples))
    assert(audio.sampleRate == 8000 && audio.samples.toSeq == samples.toSeq)
  }

  test("decodeWav rejects non-PCM format tags") {
    val b = ByteBuffer.allocate(12 + 8 + 16 + 8).order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(0).put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
    b.putShort(3).putShort(1).putInt(8000).putInt(32000).putShort(4).putShort(16)
    b.put("data".getBytes("US-ASCII")).putInt(0)
    intercept[IllegalArgumentException](MediaCodec.decodeWav(b.array()))
  }

  test("decodeWav rejects a negative chunk size instead of stalling") {
    val b = ByteBuffer.allocate(12 + 8).order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(0).put("WAVE".getBytes("US-ASCII"))
    b.put("JUNK".getBytes("US-ASCII")).putInt(-8) // pos would never advance
    intercept[IllegalArgumentException](MediaCodec.decodeWav(b.array()))
  }

  test("decodeNetpbm rejects dimensions whose product overflows Int") {
    val bytes = "P5\n65536 65536\n255\n".getBytes("US-ASCII") ++ Array[Byte](0)
    intercept[IllegalArgumentException](MediaCodec.decodeNetpbm(bytes))
  }

  test("decodeImage sniffs by magic, ignoring any format tag") {
    val rgb = Array.tabulate(2 * 2 * 3)(_.toByte)
    assert(MediaCodec.decodeImage(MediaCodec.encodeBmp24(2, 2, rgb)).pixels.toSeq == rgb.toSeq)
    assert(MediaCodec.decodeImage(MediaCodec.encodePpm(2, 2, rgb)).pixels.toSeq == rgb.toSeq)
  }

  test("BI_RLE8 encode/decode round-trips runs and split >255 runs") {
    val gray = Array.tabulate(16 * 4)(i => (i / 8 * 10).toByte)
    val img = MediaCodec.decodeBmp(MediaCodec.encodeBmpRle8(16, 4, gray))
    assert(img.width == 16 && img.height == 4 && img.channels == 3)
    (0 until 16 * 4).foreach(i =>
      assert((img.pixels(i * 3) & 0xFF) == (gray(i) & 0xFF), s"px $i"))
    // one 300-wide row: the 255-run split path
    val wide = Array.fill(300)(7.toByte)
    val img2 = MediaCodec.decodeBmp(MediaCodec.encodeBmpRle8(300, 1, wide))
    assert(img2.pixels.indices.by(3).forall(i => img2.pixels(i) == 7))
  }

  /** Hand-built RLE8 stream using ABSOLUTE mode (00 n idx…, word pad),
    * a DELTA (00 02 dx dy — skipped pixels keep index 0) and EOL/EOB —
    * the decoder-only forms the spec requires accepting. Image 4×2
    * bottom-up: stream row 0 = image row 1. */
  test("BI_RLE8 absolute mode, delta and escapes decode per spec") {
    val rle = Array[Int](
      0, 3, 1, 2, 3, 0, // absolute: indices 1,2,3 then pad byte
      1, 9, // encoded run: one 9, filling the 4-wide row
      0, 0, // EOL -> up to image row 0
      1, 5, // 5
      0, 2, 2, 0, // delta right 2 (cols 1,2 stay 0)
      1, 6, // 6 at col 3
      0, 1 // EOB
    ).map(_.toByte)
    val b = java.nio.ByteBuffer.allocate(54 + 1024 + rle.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(54 + 1024 + rle.length)
    b.putShort(0).putShort(0).putInt(54 + 1024)
    b.putInt(40).putInt(4).putInt(2)
    b.putShort(1).putShort(8).putInt(1).putInt(rle.length)
    b.putInt(2835).putInt(2835).putInt(256).putInt(0)
    (0 until 256).foreach(i => b.put(i.toByte).put(i.toByte)
      .put(i.toByte).put(0.toByte))
    b.put(rle)
    val img = MediaCodec.decodeBmp(b.array())
    def px(r: Int, c: Int): Int = img.pixels((r * 4 + c) * 3) & 0xFF
    // top-down: row 0 = second stream row (5, 0, 0, 6); row 1 = first
    assert(Seq(px(0, 0), px(0, 1), px(0, 2), px(0, 3)) == Seq(5, 0, 0, 6))
    assert(Seq(px(1, 0), px(1, 1), px(1, 2), px(1, 3)) == Seq(1, 2, 3, 9))
  }

  // ---- IMA ADPCM (WAVE format tag 0x0011) ----

  /** Hand-build a mono IMA ADPCM WAV: fmt (tag 0x11, 4-bit, cbSize 2)
    * + data with the given blocks, each (pred, idx, nibbles). */
  private def handAdpcm(blocks: Seq[(Int, Int, Seq[Int])],
      blockAlign: Int): Array[Byte] = {
    val dataSize = blocks.size * blockAlign
    val b = ByteBuffer.allocate(12 + 28 + 8 + dataSize)
      .order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes); b.putInt(4 + 28 + 8 + dataSize)
    b.put("WAVE".getBytes)
    b.put("fmt ".getBytes); b.putInt(20)
    b.putShort(0x11); b.putShort(1); b.putInt(8000)
    b.putInt(8000 * blockAlign / ((blockAlign - 4) * 2 + 1))
    b.putShort(blockAlign.toShort); b.putShort(4)
    b.putShort(2); b.putShort(((blockAlign - 4) * 2 + 1).toShort)
    b.put("data".getBytes); b.putInt(dataSize)
    blocks.foreach { case (pred, idx, nibbles) =>
      require(nibbles.size == (blockAlign - 4) * 2)
      b.put((pred & 0xFF).toByte); b.put(((pred >> 8) & 0xFF).toByte)
      b.put(idx.toByte); b.put(0.toByte)
      nibbles.grouped(2).foreach(p => b.put((p(0) | (p(1) << 4)).toByte))
    }
    b.array()
  }

  test("TGA: both types and both row origins decode to the same top-down RGB") {
    val rgb = Array[Byte](10, 11, 12, 20, 21, 22, 30, 31, 32, 40, 41, 42)
    for (rle <- Seq(false, true); topDown <- Seq(false, true)) {
      val img = MediaCodec.decodeImage(Tga.encode(2, 2, rgb, rle, topDown))
      assert(img.width == 2 && img.height == 2 && img.channels == 3)
      assert(img.pixels.toSeq == rgb.toSeq, s"rle=$rle topDown=$topDown")
    }
    // hand-check the file bytes: bottom-up type 2 stores the BOTTOM
    // row first, channels as BGR
    val raw = Tga.encode(2, 2, rgb, rle = false, topDown = false)
    assert(raw(2) == 2 && (raw(17) & 0x20) == 0)
    assert(raw(18) == 32 && raw(19) == 31 && raw(20) == 30)
  }

  test("TGA RLE: a solid row collapses to one run packet; runs never cross rows") {
    val solid = Array.fill(2 * 2 * 3)(7.toByte)
    val enc = Tga.encode(2, 2, solid, rle = true, topDown = true)
    // header 18 + per row: 1 packet byte + 1 BGR pixel
    assert(enc.length == 18 + 2 * 4, s"got ${enc.length}")
    assert((enc(18) & 0xFF) == 0x81) // run of 2
    assert(MediaCodec.decodeImage(enc).pixels.toSeq == solid.toSeq)
    // literal packets: fully distinct pixels round-trip too
    val distinct = Array.tabulate(12)(i => (i * 17 + 3).toByte)
    val e2 = Tga.encode(2, 2, distinct, rle = true, topDown = true)
    assert(MediaCodec.decodeImage(e2).pixels.toSeq == distinct.toSeq)
    // a run packet claiming more pixels than the raster fails loud
    val evil = enc.clone(); evil(18) = 0xFF.toByte // run of 128
    intercept[IllegalArgumentException](Tga.decode(evil))
  }

  test("TGA sniff: strict plausibility cannot misroute the other formats") {
    // a valid PGM (P5) must NOT look like TGA (byte 1 is 0x35, not 0)
    val pgm = ("P5 4 4 255 " + "x" * 16).getBytes("US-ASCII")
    assert(!Tga.looksLikeTga(pgm))
    assert(MediaCodec.decodeImage(pgm).channels == 1) // still netpbm
    // and a real TGA routes to the TGA decoder through the sniff
    val rgb = Array.fill(12)(5.toByte)
    assert(MediaCodec.decodeImage(
      Tga.encode(2, 2, rgb, rle = false, topDown = true)).channels == 3)
  }

  test("applyOrientation: all 8 EXIF transforms hand-traced on a 2x3 raster") {
    import MediaCodec.Image
    val img = Image(2, 3, 1, Array[Byte](1, 2, 3, 4, 5, 6))
    def out(o: Int): (Int, Int, Seq[Byte]) = {
      val r = MediaCodec.applyOrientation(img, o)
      (r.width, r.height, r.pixels.toSeq)
    }
    assert(out(1) == ((2, 3, Seq[Byte](1, 2, 3, 4, 5, 6))))
    assert(out(2) == ((2, 3, Seq[Byte](2, 1, 4, 3, 6, 5)))) // mirror-H
    assert(out(3) == ((2, 3, Seq[Byte](6, 5, 4, 3, 2, 1)))) // rot 180
    assert(out(4) == ((2, 3, Seq[Byte](5, 6, 3, 4, 1, 2)))) // mirror-V
    assert(out(5) == ((3, 2, Seq[Byte](1, 3, 5, 2, 4, 6)))) // transpose
    assert(out(6) == ((3, 2, Seq[Byte](5, 3, 1, 6, 4, 2)))) // rot 90 CW
    assert(out(7) == ((3, 2, Seq[Byte](6, 4, 2, 5, 3, 1)))) // transverse
    assert(out(8) == ((3, 2, Seq[Byte](2, 4, 6, 1, 3, 5)))) // rot 270 CW
    // every transform is a permutation: the multiset of pixels survives
    (1 to 8).foreach(o => assert(out(o)._3.sorted == img.pixels.toSeq.sorted))
    // channels ride along: a 3-channel pixel moves as one unit
    val rgb = Image(2, 1, 3, Array[Byte](1, 2, 3, 4, 5, 6))
    val rot = MediaCodec.applyOrientation(rgb, 3)
    assert(rot.pixels.toSeq == Seq[Byte](4, 5, 6, 1, 2, 3))
    intercept[IllegalArgumentException](MediaCodec.applyOrientation(img, 0))
    intercept[IllegalArgumentException](MediaCodec.applyOrientation(img, 9))
  }

  test("G.711 mu-law: known codebook extremes and both zeros") {
    // ITU-T G.711 table values: 0x00 -> -32124, 0x80 -> +32124,
    // 0x7F and 0xFF are the two zeros of the folded code space
    val au = MediaCodec.decodeAudio(MediaCodec.encodeWavG711(8000,
      Array(0x00, 0x80, 0x7F, 0xFF, 0xF0, 0x70).map(_.toByte), aLaw = false))
    assert(au.sampleRate == 8000 && au.channels == 1)
    assert(au.samples.toSeq ==
      Seq[Short](-32124, 32124, 0, 0, 120, -120))
  }

  test("G.711 A-law: known codebook extremes, segment-0 linearity") {
    // 0x55 (a=0) -> -8, 0xD5 -> +8 (segment 0 is linear, step 16),
    // 0x2A/0xAA (a=0xFF) -> -/+32256 (the A-law max amplitude)
    val au = MediaCodec.decodeAudio(MediaCodec.encodeWavG711(8000,
      Array(0x55, 0xD5, 0x2A, 0xAA, 0x54, 0xD4).map(_.toByte), aLaw = true))
    assert(au.samples.toSeq ==
      Seq[Short](-8, 8, -32256, 32256, -24, 24))
  }

  test("G.711: the two expansions agree on NO code (sniff route pinned)") {
    val codes = Array.tabulate(256)(_.toByte)
    val u = MediaCodec.decodeAudio(
      MediaCodec.encodeWavG711(8000, codes, aLaw = false)).samples
    val a = MediaCodec.decodeAudio(
      MediaCodec.encodeWavG711(8000, codes, aLaw = true)).samples
    assert(u.indices.forall(i => u(i) != a(i)))
  }

  test("G.711: odd-length code stream pads the RIFF chunk correctly") {
    val au = MediaCodec.decodeAudio(
      MediaCodec.encodeWavG711(8000, Array[Byte](0x55, 0x55, 0x55), aLaw = true))
    assert(au.samples.toSeq == Seq[Short](-8, -8, -8))
  }

  test("IMA ADPCM: hand-traced state walk from the spec tables") {
    // pred=0 idx=0 (step 7): nibble 0 -> diff 0, pred 0, idx max(0,-1)=0
    // nibble 7 -> diff 0+1+3+7=11, pred 11, idx 8 (step 16)
    // nibble 8 -> diff 2, sign -, pred 9, idx 7 (step 14)
    // nibble 15 -> diff 1+3+7+14=25, sign -, pred -16, idx 15
    val au = MediaCodec.decodeAudio(handAdpcm(Seq((0, 0, Seq(0, 7, 8, 15))), 6))
    assert(au.sampleRate == 8000 && au.channels == 1)
    assert(au.samples.toSeq == Seq[Short](0, 0, 11, 9, -16))
  }

  test("IMA ADPCM: predictor clamps at int16, index clamps at 88") {
    // pred 32760, idx 88 (step 32767): nibble 7 -> diff 4095+8191+16383
    // +32767 = 61436 -> clamp 32767, idx 88+8 clamps to 88; nibble 15
    // -> minus the same diff -> -28669 (no clamp); nibble 15 again ->
    // -90105 clamps to -32768; nibble 0 -> diff 4095 -> -28673, idx 87
    val au = MediaCodec.decodeAudio(
      handAdpcm(Seq((32760, 88, Seq(7, 15, 15, 0))), 6))
    assert(au.samples.toSeq ==
      Seq[Short](32760, 32767, -28669, -32768, -28673))
  }

  test("IMA ADPCM: each block restarts from its own header") {
    val au = MediaCodec.decodeAudio(handAdpcm(
      Seq((100, 0, Seq(0, 0)), (-200, 30, Seq(0, 0))), 5))
    // block 2's samples start from ITS header (-200, idx 30, step 130):
    // nibble 0 twice -> diff 130>>3=16 each, idx decays 29 (step 118, 14)
    assert(au.samples.toSeq ==
      Seq[Short](100, 100, 100, -200, -184, -170))
  }

  test("IMA ADPCM: encoder round trip tracks within one step size") {
    val src = Array.tabulate(1200)(i =>
      (math.sin(i * 0.05) * 8000 + (i % 7) * 40).toInt.toShort)
    val wav = MediaCodec.encodeWavImaAdpcm(8000, src, samplesPerBlock = 505)
    val got = MediaCodec.decodeAudio(wav)
    assert(got.sampleRate == 8000 && got.channels == 1)
    // padded to whole blocks: 1200 -> 3 blocks of 505
    assert(got.samples.length == 1515)
    // after the adaptation warm-up, the decode tracks the source
    var i = 20
    while (i < src.length) {
      assert(math.abs(got.samples(i) - src(i)) <= 2000,
        s"sample $i: ${got.samples(i)} vs ${src(i)}")
      i += 1
    }
    // deterministic: a second decode is bit-identical
    assert(MediaCodec.decodeAudio(wav).samples.toSeq == got.samples.toSeq)
  }

  test("IMA ADPCM: >2 channels, wrong bit width and bad step index fail loud") {
    val ok = handAdpcm(Seq((0, 0, Seq(0, 0))), 5)
    val threeCh = ok.clone; threeCh(22) = 3 // nChannels
    intercept[IllegalArgumentException](MediaCodec.decodeAudio(threeCh))
    // a stereo flag over a mono-sized block must fail the align check,
    // not silently misread the second header
    val stereoBad = ok.clone; stereoBad(22) = 2
    intercept[IllegalArgumentException](MediaCodec.decodeAudio(stereoBad))
    val bits8 = ok.clone; bits8(34) = 8 // wBitsPerSample
    intercept[IllegalArgumentException](MediaCodec.decodeAudio(bits8))
    val badIdx = ok.clone; badIdx(50) = 99 // block header step index
    intercept[IllegalArgumentException](MediaCodec.decodeAudio(badIdx))
  }

  /** Hand-build a STEREO IMA ADPCM WAV: two 4-byte headers, then
    * 4-byte nibble groups alternating L/R. */
  private def handAdpcmStereo(predL: Int, idxL: Int, predR: Int, idxR: Int,
      nibL: Seq[Int], nibR: Seq[Int]): Array[Byte] = {
    require(nibL.size == nibR.size && nibL.size % 8 == 0)
    val groups = nibL.size / 8
    val blockAlign = 8 + groups * 8
    val b = ByteBuffer.allocate(12 + 28 + 8 + blockAlign)
      .order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes); b.putInt(4 + 28 + 8 + blockAlign)
    b.put("WAVE".getBytes)
    b.put("fmt ".getBytes); b.putInt(20)
    b.putShort(0x11); b.putShort(2); b.putInt(8000)
    b.putInt(8000 * blockAlign / (nibL.size + 1))
    b.putShort(blockAlign.toShort); b.putShort(4)
    b.putShort(2); b.putShort((nibL.size + 1).toShort)
    b.put("data".getBytes); b.putInt(blockAlign)
    b.put((predL & 0xFF).toByte); b.put(((predL >> 8) & 0xFF).toByte)
    b.put(idxL.toByte); b.put(0.toByte)
    b.put((predR & 0xFF).toByte); b.put(((predR >> 8) & 0xFF).toByte)
    b.put(idxR.toByte); b.put(0.toByte)
    (0 until groups).foreach { g =>
      Seq(nibL, nibR).foreach { nib =>
        (0 until 4).foreach(j =>
          b.put((nib(g * 8 + 2 * j) | (nib(g * 8 + 2 * j + 1) << 4)).toByte))
      }
    }
    b.array()
  }

  test("IMA ADPCM stereo: independent channel states, interleaved output") {
    // L: the mono hand-trace (0,0 + nibbles 0,7,8,15 -> 0,0,11,9,-16
    // padded to 8 nibbles with 0s); R: constant silence from a nonzero
    // predictor. Crossing the states would contaminate R with L's big
    // step-index jumps.
    // L continue: after -16 idx 15 (step 31): n=0 -> diff 3 -> -13,
    // idx 14 (28); n=0 -> diff 3 -> -10, idx 13 (25); n=0 -> -7,
    // idx 12 (23); n=0 -> -5, idx 11
    val au = MediaCodec.decodeAudio(handAdpcmStereo(
      0, 0, 1000, 20,
      Seq(0, 7, 8, 15, 0, 0, 0, 0), Seq(0, 8, 0, 8, 0, 8, 0, 8)))
    assert(au.channels == 2 && au.samples.length == 18)
    val l = au.samples.zipWithIndex.collect { case (v, i) if i % 2 == 0 => v }
    val r = au.samples.zipWithIndex.collect { case (v, i) if i % 2 == 1 => v }
    assert(l.toSeq == Seq[Short](0, 0, 11, 9, -16, -13, -10, -7, -5))
    // R: idx 20 (step 50): +6/-6 alternating from 1000, idx pinned at
    // 19/20 by the -1/+... wait: n=0 -> +6 idx 19 (45), n=8 -> -5 idx
    // 18 (41), n=0 -> +5 idx 17 (37), n=8 -> -4 idx 16 (34), n=0 -> +4
    // idx 15 (31), n=8 -> -3 idx 14 (28), n=0 -> +3 idx 13 (25), n=8 -> -3
    assert(r.toSeq == Seq[Short](1000, 1006, 1001, 1006, 1002, 1006,
      1003, 1006, 1003))
  }
}
