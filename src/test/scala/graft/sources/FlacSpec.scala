package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** FLAC codec spec: a hand-assembled byte fixture pins the bit layout,
  * CRC conventions and sign handling independently of the encoder (the
  * Jpeg/Png fixture discipline), and encode→decode round trips drive
  * every subframe type, residual coding, channel mode and the wasted-
  * bits path. The decoder itself verifies STREAMINFO MD5 on every
  * decode, so each round trip is a second, internal losslessness proof.
  */
class FlacSpec extends AnyFunSuite {

  // independent bit-by-bit CRCs (no table, no shared code with Flac)
  private def crc8(bs: Seq[Int]): Int =
    bs.foldLeft(0) { (c0, b) =>
      (0 until 8).foldLeft(c0 ^ b) { (c, _) =>
        if ((c & 0x80) != 0) ((c << 1) ^ 0x07) & 0xFF else (c << 1) & 0xFF
      }
    }
  private def crc16(bs: Seq[Int]): Int =
    bs.foldLeft(0) { (c0, b) =>
      (0 until 8).foldLeft(c0 ^ (b << 8)) { (c, _) =>
        if ((c & 0x8000) != 0) ((c << 1) ^ 0x8005) & 0xFFFF
        else (c << 1) & 0xFFFF
      }
    }

  test("hand-assembled fixture: constant subframe, uncommon block size") {
    // mono, 8 kHz, 16-bit, 16 samples of value 1024, one frame with the
    // 8-bit uncommon block-size form; every byte below is hand-derived
    // from RFC 9639's field tables
    val streaminfo = Seq(
      0x00, 0x10, 0x00, 0x10, // min/max block size 16
      0x00, 0x00, 0x00, 0x00, 0x00, 0x00, // min/max frame size unknown
      0x01, 0xF4, 0x00, 0xF0, // rate 8000 | ch 1 | bps 16 | total(4 hi)
      0x00, 0x00, 0x00, 0x10) ++ // total samples 16 (32 lo)
      Seq.fill(16)(0x00) // MD5 unknown -> decoder skips the check
    val header = Seq(0xFF, 0xF8, 0x64, 0x08, 0x00, 0x0F)
    val subframe = Seq(0x00, 0x04, 0x00) // constant, wasted=0, value 1024
    val frame = header ++ Seq(crc8(header)) ++ subframe
    val fixture = ("fLaC".getBytes("US-ASCII").map(_ & 0xFF).toSeq ++
      Seq(0x80, 0x00, 0x00, 0x22) ++ streaminfo ++
      frame ++ Seq(crc16(frame) >> 8, crc16(frame) & 0xFF))
      .map(_.toByte).toArray
    val a = Flac.decode(fixture)
    assert(a.sampleRate == 8000 && a.channels == 1)
    assert(a.samples.length == 16 && a.samples.forall(_ == 1024))
  }

  private def pcm(n: Int): Array[Short] =
    Array.tabulate(n) { i =>
      // deterministic, sign-alternating, wide dynamic range
      (((i * 2654435761L + 12345) % 40000) - 20000).toShort
    }

  test("mono round trip across >5 frames exercises every strategy") {
    // 1400 samples / block 256 -> 6 frames: verbatim, fixed-1, fixed-2,
    // LPC, escape-coded residual (cycle%5==4), partial last frame
    val in = pcm(1400)
    val enc = Flac.encode(8000, 1, in)
    val dec = Flac.decode(enc)
    assert(dec.sampleRate == 8000 && dec.channels == 1)
    assert(dec.samples.toSeq == in.toSeq)
  }

  test("stereo round trip in all four channel modes") {
    val n = 700
    val in = new Array[Short](n * 2)
    for (i <- 0 until n) {
      in(2 * i) = (((i * 48271) % 30000) - 15000).toShort
      in(2 * i + 1) = (((i * 16807 + 7) % 30000) - 15000).toShort
    }
    for (mode <- 0 to 3) {
      val dec = Flac.decode(Flac.encode(16000, 2, in, mode = mode))
      assert(dec.channels == 2, s"mode $mode")
      assert(dec.samples.toSeq == in.toSeq, s"mode $mode")
    }
  }

  test("wasted-bits path: samples that are multiples of 128") {
    val in = Array.tabulate(600)(i => (((i % 300) - 150) * 128).toShort)
    val enc = Flac.encode(8000, 1, in, wastedBits = 7)
    assert(Flac.decode(enc).samples.toSeq == in.toSeq)
    // and the wasted coding must actually shrink the payload vs not
    val plain = Flac.encode(8000, 1, in, wastedBits = 0)
    assert(enc.length < plain.length)
  }

  test("empty stream: STREAMINFO only, zero samples") {
    val enc = Flac.encode(8000, 1, Array.empty[Short])
    val dec = Flac.decode(enc)
    assert(dec.samples.isEmpty && dec.sampleRate == 8000 && dec.channels == 1)
  }

  test("single-sample and sub-block streams round-trip") {
    for (n <- Seq(1, 2, 3, 15, 255, 256, 257)) {
      val in = pcm(n)
      assert(Flac.decode(Flac.encode(8000, 1, in)).samples.toSeq == in.toSeq,
        s"n=$n")
    }
  }

  test("corruption is caught: flipped payload bit fails CRC/MD5") {
    val enc = Flac.encode(8000, 1, pcm(500))
    val bad = enc.clone()
    bad(bad.length - 20) = (bad(bad.length - 20) ^ 0x10).toByte
    assertThrows[IllegalArgumentException](Flac.decode(bad))
  }

  test("truncated stream is rejected") {
    val enc = Flac.encode(8000, 1, pcm(500))
    assertThrows[IllegalArgumentException](
      Flac.decode(java.util.Arrays.copyOf(enc, enc.length - 3)))
  }
}
