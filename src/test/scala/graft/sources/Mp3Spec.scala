package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** The MP3 frame walk: spec frame-length vectors, ID3 skip with a
  * hostile syncsafe size, and loud rejection of every malformation
  * class the books pass must not silently absorb. */
class Mp3Spec extends AnyFunSuite {

  test("frame length matches the canonical 144*bitrate/samplerate vectors") {
    assert(Mp3.frameLength(9, 0, padding = false) == 417) // 128k @ 44100
    assert(Mp3.frameLength(9, 0, padding = true) == 418)
    assert(Mp3.frameLength(14, 1, padding = false) == 960) // 320k @ 48000
    assert(Mp3.frameLength(1, 2, padding = false) == 144) // 32k @ 32000
  }

  test("round-trip: books balance over a mixed-bitrate container") {
    val frames = (0 until 40).map(j => (1 + j % 14, 1, j % 2 == 0))
    val bytes = Mp3.encode(55, frames)
    val b = Mp3.parse(bytes)
    assert(b.nFrames == 40)
    assert(b.nBytes == bytes.length)
    assert(b.durationUs == 40L * 1152 * 1000000L / 48000L)
  }

  test("no ID3 tag is fine; hostile declared tag size is rejected") {
    val bare = Mp3.encode(0, Seq((9, 0, false))).drop(10) // strip the tag
    assert(Mp3.parse(bare).nFrames == 1)
    val hostile = Mp3.encode(0, Seq((9, 0, false)))
    hostile(6) = 0x7F; hostile(7) = 0x7F // declared size ~2^28 > buffer
    hostile(8) = 0x7F.toByte; hostile(9) = 0x7F.toByte
    val e = intercept[IllegalArgumentException](Mp3.parse(hostile))
    assert(e.getMessage.contains("exceeds"))
  }

  test("malformations reject loudly: sync, bitrate, sr, truncation, mix") {
    val good = Mp3.encode(0, Seq((9, 0, false)))
    def mutated(f: Array[Byte] => Unit): Array[Byte] = {
      val b = good.clone(); f(b); b
    }
    assert(intercept[IllegalArgumentException](
      Mp3.parse(mutated(_(10) = 0x00))).getMessage.contains("sync"))
    assert(intercept[IllegalArgumentException](
      Mp3.parse(mutated(_(12) = 0x00))).getMessage.contains("bitrate"))
    assert(intercept[IllegalArgumentException](
      Mp3.parse(mutated(_(12) = (0x90 | 0x0C).toByte)))
      .getMessage.contains("sampling"))
    assert(intercept[IllegalArgumentException](
      Mp3.parse(good.dropRight(5))).getMessage.contains("past the buffer"))
    val mixed = Mp3.encode(0, Seq((9, 0, false))) ++
      Mp3.encode(0, Seq((9, 1, false))).drop(10)
    assert(intercept[IllegalArgumentException](Mp3.parse(mixed))
      .getMessage.contains("changes mid-stream"))
  }
}
