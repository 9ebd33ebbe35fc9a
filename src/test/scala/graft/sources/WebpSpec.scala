package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** The WebP chunk walk: all three stored shapes, the RIFF pad rule,
  * bit-unpack vectors, and loud rejection of grammar violations. */
class WebpSpec extends AnyFunSuite {

  test("simple lossy VP8: dims from the key-frame header, partition validated") {
    val bytes = Webp.encode(0, 320, 240, alpha = false, 1, _ => 6)
    val b = Webp.parse(bytes)
    assert(b.variant == "vp8" && b.width == 320 && b.height == 240)
    assert(b.hasAlpha == 0 && b.nChunks == 1 && b.nFrames == 1)
    assert(b.nBytes == bytes.length)
    assert(bytes.length == 12 + 8 + 10 + 6) // even payload: no pad
  }

  test("simple lossless VP8L: 14-bit dims, alpha bit, odd-size pad byte") {
    val bytes = Webp.encode(1, 16383, 1, alpha = true, 1, _ => 0)
    val b = Webp.parse(bytes)
    assert(b.variant == "vp8l" && b.width == 16383 && b.height == 1)
    assert(b.hasAlpha == 1)
    assert(bytes.length == 12 + 8 + 5 + 1) // 5-byte payload -> pad byte
    assert(b.nBytes == bytes.length)
  }

  test("extended animation: VP8X canvas, ANMF frames, nested chunk walk") {
    val bytes = Webp.encode(2, 100, 50, alpha = true, 3, f => f % 2)
    val b = Webp.parse(bytes)
    assert(b.variant == "vp8x" && b.width == 100 && b.height == 50)
    assert(b.hasAlpha == 1 && b.nFrames == 3)
    assert(b.nChunks == 2 + 2 * 3) // VP8X, ANIM, 3x(ANMF + embedded VP8L)
    assert(b.nBytes == bytes.length)
  }

  test("grammar violations reject loudly") {
    val good = Webp.encode(1, 64, 64, alpha = false, 1, _ => 3)
    def mutated(f: Array[Byte] => Unit): Array[Byte] = {
      val b = good.clone(); f(b); b
    }
    // RIFF size mismatch
    assert(intercept[IllegalArgumentException](
      Webp.parse(mutated(_(4) = 99))).getMessage.contains("RIFF size"))
    // wrong form type
    assert(intercept[IllegalArgumentException](
      Webp.parse(mutated(_(8) = 'X'))).getMessage.contains("WEBP"))
    // bad VP8L signature (payload starts at 20)
    assert(intercept[IllegalArgumentException](
      Webp.parse(mutated(_(20) = 0x30))).getMessage.contains("signature"))
    // nonzero VP8L version (top 3 bits of the last bitstream byte)
    assert(intercept[IllegalArgumentException](
      Webp.parse(mutated(b => b(24) = (b(24) | 0x20).toByte)))
      .getMessage.contains("version"))
    // VP8 partition size past the chunk
    val lossy = Webp.encode(0, 64, 64, alpha = false, 1, _ => 2)
    val hostile = lossy.clone()
    hostile(22) = 0x7F.toByte // blow up the 19-bit first_partition_size
    assert(intercept[IllegalArgumentException](Webp.parse(hostile))
      .getMessage.contains("partition"))
    // frame overflowing the canvas: encode 2-frame anim, then shrink canvas
    val anim = Webp.encode(2, 32, 32, alpha = false, 2, _ => 0)
    val shrunk = anim.clone()
    shrunk(24) = 10 // VP8X canvas width-1 (LE24 at offset 20+4)
    assert(intercept[IllegalArgumentException](Webp.parse(shrunk))
      .getMessage.contains("overflows"))
    // truncation
    assert(intercept[IllegalArgumentException](Webp.parse(good.dropRight(2)))
      .getMessage.contains("RIFF size"))
  }
}
