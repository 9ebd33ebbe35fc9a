package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** The ISO-BMFF box walk: layout constants, all three legal mdat size
  * encodings, v1 full-box widening, unknown-box skipping, and loud
  * rejection of every framing malformation the books must not absorb. */
class Mp4Spec extends AnyFunSuite {

  test("round-trip: books balance over a 3-track movie with a free box") {
    val bytes = Mp4.encode(90000L, 123456L, 3, 17, 500, 0)
    val b = Mp4.parse(bytes)
    assert(b.nBoxes == 4 + 5 * 3 + 1)
    assert(b.timescale == 90000L)
    assert(b.durationMs == 123456L * 1000L / 90000L)
    assert(b.nVideo == 2 && b.nAudio == 1) // vide, soun, vide
    assert(b.mdatBytes == 500)
    assert(b.nBytes == bytes.length)
    assert(bytes.length ==
      Mp4.FtypBytes + 8 + Mp4.MvhdBytes + 3 * Mp4.TrakBytes + (8 + 17) + (8 + 500))
  }

  test("64-bit largesize and size-0-to-EOF mdat both balance") {
    val big = Mp4.parse(Mp4.encode(600L, 600L, 1, -1, 64, 1))
    assert(big.mdatBytes == 64)
    val eof = Mp4.parse(Mp4.encode(600L, 600L, 1, -1, 64, 2))
    assert(eof.mdatBytes == 64)
    assert(big.nBytes == eof.nBytes + 8) // largesize header is 8 B wider
  }

  test("mvhd version 1 widens the time fields to 64 bits") {
    // hand-build: ftyp + moov{mvhd v1} with duration > 2^32
    def be32(v: Long) = Array(((v >>> 24) & 0xFF).toByte,
      ((v >>> 16) & 0xFF).toByte, ((v >>> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def be64(v: Long) = be32(v >>> 32) ++ be32(v & 0xFFFFFFFFL)
    val dur = 5000000000L // > 2^32
    val p = be32(0x01000000L) ++ be64(0) ++ be64(0) ++ be32(1000) ++
      be64(dur) ++ new Array[Byte](80)
    val mvhd = be32(8L + p.length) ++ "mvhd".getBytes("US-ASCII") ++ p
    val moov = be32(8L + mvhd.length) ++ "moov".getBytes("US-ASCII") ++ mvhd
    val ftyp = Mp4.encode(600L, 1L, 1, -1, 0, 0).take(24)
    val b = Mp4.parse(ftyp ++ moov)
    assert(b.timescale == 1000L && b.durationMs == dur)
  }

  test("all-ones duration is the 'unknown' sentinel, not a huge number; " +
    "a v1 duration past Long.MaxValue/1000 rejects") {
    val good = Mp4.encode(600L, 600L, 1, -1, 0, 0)
    // v0 duration sits at 24 (ftyp) + 8 (moov hdr) + 8 (mvhd hdr) + 16
    val sentinel = good.clone()
    (0 until 4).foreach(i => sentinel(56 + i) = -1)
    assert(Mp4.parse(sentinel).durationMs == -1L)
    // hand-build a v1 mvhd with duration just past the ms-overflow bound
    def be32(v: Long) = Array(((v >>> 24) & 0xFF).toByte,
      ((v >>> 16) & 0xFF).toByte, ((v >>> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def be64(v: Long) = be32(v >>> 32) ++ be32(v & 0xFFFFFFFFL)
    val p = be32(0x01000000L) ++ be64(0) ++ be64(0) ++ be32(1000) ++
      be64(Long.MaxValue / 1000 + 1) ++ new Array[Byte](80)
    val mvhd = be32(8L + p.length) ++ "mvhd".getBytes("US-ASCII") ++ p
    val moov = be32(8L + mvhd.length) ++ "moov".getBytes("US-ASCII") ++ mvhd
    assert(intercept[IllegalArgumentException](
      Mp4.parse(good.take(24) ++ moov)).getMessage.contains("overflows"))
  }

  test("unknown top-level boxes are skipped but framing still validates") {
    val base = Mp4.encode(600L, 600L, 1, -1, 16, 0)
    val junk = Array[Byte](0, 0, 0, 12) ++ "xyz ".getBytes("US-ASCII") ++
      Array[Byte](1, 2, 3, 4)
    val b = Mp4.parse(base ++ junk)
    assert(b.nBoxes == Mp4.parse(base).nBoxes + 1)
  }

  test("malformations reject loudly: short size, overrun, nested size-0, dup mvhd") {
    val good = Mp4.encode(600L, 600L, 1, -1, 16, 0)
    def mutated(f: Array[Byte] => Unit): Array[Byte] = {
      val b = good.clone(); f(b); b
    }
    // ftyp size -> 4 (< 8-byte header)
    assert(intercept[IllegalArgumentException](
      Mp4.parse(mutated(_(3) = 4))).getMessage.contains("under the"))
    // ftyp size -> huge (past scope)
    assert(intercept[IllegalArgumentException](
      Mp4.parse(mutated(_(0) = 0x7F))).getMessage.contains("runs past"))
    // truncated buffer mid-box
    assert(intercept[IllegalArgumentException](
      Mp4.parse(good.dropRight(10))).getMessage.contains("runs past"))
    // size 0 on a nested box (tkhd starts at 24 + 8 + 108 + 8 = 148)
    val nested0 = mutated { b => b(148) = 0; b(149) = 0; b(150) = 0; b(151) = 0 }
    assert(intercept[IllegalArgumentException](
      Mp4.parse(nested0)).getMessage.contains("outside the top level"))
    // two movies concatenated -> duplicate mvhd
    assert(intercept[IllegalArgumentException](
      Mp4.parse(good ++ good)).getMessage.contains("duplicate mvhd"))
    // no moov at all
    assert(intercept[IllegalArgumentException](
      Mp4.parse(good.take(24))).getMessage.contains("no mvhd"))
  }
}
