package graft.sources

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

/** Randomized roundtrip coverage for the media codecs: many random
  * dimensions and payloads through every encoder/decoder pair, plus
  * random-garbage inputs that must either decode or fail with a clear
  * IllegalArgumentException — never hang, loop, or throw an uncontrolled
  * index error. Fixed seed: deterministic offline runs. */
class MediaCodecFuzzSpec extends AnyFunSuite {

  private val rnd = new Random(0xC0FFEE)

  test("image roundtrips across random dimensions (all four containers)") {
    for (_ <- 1 to 40) {
      val w = rnd.nextInt(67) + 1
      val h = rnd.nextInt(19) + 1
      val rgb = Array.fill(w * h * 3)(rnd.nextInt(256).toByte)
      val gray = Array.fill(w * h)(rnd.nextInt(256).toByte)
      assert(MediaCodec.decodeBmp(MediaCodec.encodeBmp24(w, h, rgb))
        .pixels.toSeq == rgb.toSeq, s"bmp24 ${w}x$h")
      assert(MediaCodec.decodeBmp(MediaCodec.encodeBmp32(w, h, rgb))
        .pixels.toSeq == rgb.toSeq, s"bmp32 ${w}x$h")
      assert(MediaCodec.decodeNetpbm(MediaCodec.encodePpm(w, h, rgb))
        .pixels.toSeq == rgb.toSeq, s"ppm ${w}x$h")
      assert(MediaCodec.decodeNetpbm(MediaCodec.encodePgm(w, h, gray))
        .pixels.toSeq == gray.toSeq, s"pgm ${w}x$h")
      // paletted gray decodes to (b,b,b) RGB
      val g8 = MediaCodec.decodeBmp(MediaCodec.encodeBmp8(w, h, gray))
      assert(g8.channels == 3 && (0 until w * h).forall { p =>
        g8.pixels(3 * p) == gray(p) && g8.pixels(3 * p + 1) == gray(p) &&
          g8.pixels(3 * p + 2) == gray(p)
      }, s"bmp8 ${w}x$h")
    }
  }

  test("tiff roundtrips across random dimensions and both byte orders") {
    for (i <- 1 to 30) {
      val w = rnd.nextInt(40) + 1
      val h = rnd.nextInt(23) + 1
      val gray = Array.fill(w * h)(rnd.nextInt(256).toByte)
      val d = Tiff.decode(Tiff.encodeGray(w, h, gray, bigEndian = i % 2 == 0))
      assert(d.image.width == w && d.image.height == h, s"tiff ${w}x$h")
      assert(d.image.pixels.toSeq == gray.toSeq, s"tiff ${w}x$h")
      assert(d.nStrips == math.max(1, (h + 3) / 4))
    }
  }

  test("Adam7 PNG roundtrips across random dimensions, gray and RGB") {
    for (i <- 1 to 30) {
      val w = rnd.nextInt(37) + 1
      val h = rnd.nextInt(21) + 1
      val ch = if (i % 2 == 0) 1 else 3
      val px = Array.fill(w * h * ch)(rnd.nextInt(256).toByte)
      val img = Png.decode(Png.encodeAdam7(w, h, ch, px))
      assert(img.width == w && img.height == h && img.channels == ch)
      assert(img.pixels.toSeq == px.toSeq, s"adam7 ${w}x$h ch$ch")
    }
  }

  test("tiff garbage never hangs or escapes with an index error") {
    for (i <- 1 to 200) {
      val n = rnd.nextInt(300) + 4
      val junk = Array.fill(n)(rnd.nextInt(256).toByte)
      if (i % 2 == 0) { junk(0) = 'I'; junk(1) = 'I' }
      else { junk(0) = 'M'; junk(1) = 'M' }
      if (i % 3 == 0 && n > 3) { junk(2) = 42; junk(3) = 0 }
      try { Tiff.decode(junk); () }
      catch {
        case _: IllegalArgumentException | _: IndexOutOfBoundsException |
             _: NegativeArraySizeException |
             _: java.nio.BufferUnderflowException => ()
      }
    }
    // truncations of a REAL tiff exercise deeper walk states
    val real = Tiff.encodeGray(16, 9, Array.fill(144)(7.toByte), bigEndian = false)
    for (cut <- 4 until real.length by 7) {
      try { Tiff.decode(java.util.Arrays.copyOf(real, cut)); () }
      catch {
        case _: IllegalArgumentException | _: IndexOutOfBoundsException |
             _: NegativeArraySizeException |
             _: java.nio.BufferUnderflowException => ()
      }
    }
  }

  test("wav roundtrips across random lengths") {
    for (_ <- 1 to 20) {
      val n = rnd.nextInt(2000) + 1
      val samples = Array.fill(n)(rnd.nextInt(65536).toShort)
      val a = MediaCodec.decodeWav(MediaCodec.encodeWav(8000, samples))
      assert(a.samples.toSeq == samples.toSeq)
    }
  }

  test("tga roundtrips across random dims, both types, both origins") {
    for (i <- 1 to 30) {
      val w = rnd.nextInt(50) + 1
      val h = rnd.nextInt(20) + 1
      // biased toward runs so the RLE encoder emits real run packets
      val rgb = Array.fill(w * h * 3)(
        (if (rnd.nextInt(3) == 0) rnd.nextInt(256) else 7).toByte)
      val img = MediaCodec.decodeImage(
        Tga.encode(w, h, rgb, rle = i % 2 == 0, topDown = i % 3 == 0))
      assert(img.width == w && img.height == h, s"tga ${w}x$h")
      assert(img.pixels.toSeq == rgb.toSeq, s"tga ${w}x$h rle=${i % 2 == 0}")
    }
  }

  test("g711 all 256 codes survive both expansions at random lengths") {
    for (_ <- 1 to 20) {
      val n = rnd.nextInt(500) + 1
      val codes = Array.fill(n)(rnd.nextInt(256).toByte)
      val u = MediaCodec.decodeAudio(MediaCodec.encodeWavG711(8000, codes, aLaw = false))
      val a = MediaCodec.decodeAudio(MediaCodec.encodeWavG711(8000, codes, aLaw = true))
      assert(u.samples.length == n && a.samples.length == n)
      // both expansions land inside int16 (the clamp-free guarantee)
      assert(u.samples.forall(s => s >= -32124 && s <= 32124))
      assert(a.samples.forall(s => s >= -32256 && s <= 32256))
    }
  }

  test("tga garbage never hangs or escapes with an index error") {
    for (_ <- 1 to 200) {
      val n = rnd.nextInt(200) + 18
      val junk = Array.fill(n)(rnd.nextInt(256).toByte)
      junk(1) = 0 // colorMapType: force the TGA sniff to engage
      junk(2) = if (rnd.nextBoolean()) 2 else 10
      junk(16) = if (rnd.nextBoolean()) 24 else 32
      try MediaCodec.decodeImage(junk)
      catch { case _: IllegalArgumentException => }
    }
  }

  test("exif garbage APP1 never hangs or escapes with an index error") {
    val plain = Jpeg.encodeGrayFlat(16, 8, Array(10, 20))
    for (_ <- 1 to 200) {
      val n = rnd.nextInt(40) + 10
      val body = Array.fill(n)(rnd.nextInt(256).toByte)
      "Exif".getBytes.copyToArray(body, 0); body(4) = 0; body(5) = 0
      val seg = java.nio.ByteBuffer.allocate(4 + n)
        .order(java.nio.ByteOrder.BIG_ENDIAN)
      seg.putShort(0xFFE1.toShort).putShort((n + 2).toShort).put(body)
      try Jpeg.exifOrientation(Jpeg.spliceApp1(plain, seg.array()))
      catch { case _: IllegalArgumentException => }
    }
  }

  test("hostile IFD offset near Int.MaxValue fails descriptive, not raw") {
    // ifd = 0x7FFFFFFE: `ifd + 2` wraps negative in Int arithmetic, so
    // an Int-typed bound check would pass and getShort(ifd) would escape
    // with a raw IndexOutOfBoundsException — the check must run in Long
    val plain = Jpeg.encodeGrayFlat(16, 8, Array(10, 20))
    val body = java.nio.ByteBuffer.allocate(20)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    body.put("Exif".getBytes).put(0.toByte).put(0.toByte)
    body.put('I'.toByte).put('I'.toByte).putShort(42)
    body.putInt(0x7FFFFFFE) // hostile IFD offset
    val seg = java.nio.ByteBuffer.allocate(24)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    seg.putShort(0xFFE1.toShort).putShort(22.toShort).put(body.array())
    val e = intercept[IllegalArgumentException] {
      Jpeg.exifOrientation(Jpeg.spliceApp1(plain, seg.array()))
    }
    assert(e.getMessage.contains("IFD offset"))
  }

  test("random garbage never hangs or escapes with an index error") {
    for (i <- 1 to 300) {
      val n = rnd.nextInt(200) + 8
      val junk = Array.fill(n)(rnd.nextInt(256).toByte)
      // force each magic so every parser's validation path runs
      i % 4 match {
        case 0 => junk(0) = 'B'; junk(1) = 'M'
        case 1 => junk(0) = 'P'; junk(1) = ('2' + rnd.nextInt(5)).toByte
        case 2 =>
          "RIFF".getBytes.copyToArray(junk, 0)
          if (n >= 12) "WAVE".getBytes.copyToArray(junk, 8)
        case _ => // fully random
      }
      try {
        if (junk(0) == 'R') MediaCodec.decodeWav(junk)
        else MediaCodec.decodeImage(junk)
      } catch {
        case _: IllegalArgumentException => // the contract for bad input
      }
    }
  }
}
