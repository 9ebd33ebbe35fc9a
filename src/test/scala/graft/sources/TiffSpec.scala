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
}
