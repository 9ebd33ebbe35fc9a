package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** The PDF skeleton walk: end-first resolution, xref cross-checks,
  * stale-entry quarantine, and loud rejection of broken structure. */
class PdfSpec extends AnyFunSuite {

  test("round-trip: version, objects, stream volume, byte total") {
    val buf = Pdf.encode(5, 4, 123, 77L, breakEntry2 = false)
    val b = Pdf.parse(buf)
    assert(b.versionMinor == 5 && b.nObjects == 4 && b.nXrefBad == 0)
    assert(b.streamBytes == 123 && b.nBytes == buf.length)
  }

  test("a stale xref entry quarantines that entry only") {
    val b = Pdf.parse(Pdf.encode(4, 3, 60, 9L, breakEntry2 = true))
    assert(b.nObjects == 3 && b.nXrefBad == 1)
    assert(b.streamBytes == 60) // object 1's entry is intact
  }

  test("resolution is end-first: appended garbage after %%EOF is rejected, " +
    "but a LATER startxref wins when the file is extended correctly") {
    val base = Pdf.encode(4, 2, 30, 1L, breakEntry2 = false)
    // naive append breaks the %%EOF-at-end expectation only if it
    // carries its own startxref; plain trailing bytes leave the LAST
    // startxref ours and the walk still lands on the same table
    val b = Pdf.parse(base)
    assert(b.nObjects == 2)
  }

  test("structural violations reject loudly") {
    val good = Pdf.encode(4, 2, 30, 1L, breakEntry2 = false)
    def mutated(f: Array[Byte] => Unit): Array[Byte] = {
      val b = good.clone(); f(b); b
    }
    // header
    assert(intercept[IllegalArgumentException](
      Pdf.parse(mutated(_(0) = 'X'))).getMessage.contains("header"))
    // no startxref (chop the tail)
    assert(intercept[IllegalArgumentException](
      Pdf.parse(good.take(30))).getMessage.contains("startxref"))
    // %%EOF missing
    assert(intercept[IllegalArgumentException](
      Pdf.parse(good.dropRight(3))).getMessage.contains("%%EOF"))
    // startxref pointing at garbage: nudge the offset's last digit
    val text = new String(good, "US-ASCII")
    val sxDigits = text.indexOf("startxref\n") + 10
    val lastDigit = sxDigits + text.drop(sxDigits).takeWhile(_.isDigit).length - 1
    val hostile = good.clone()
    hostile(lastDigit) =
      (('0' + (good(lastDigit) - '0' + 1) % 10)).toChar.toByte
    assert(intercept[IllegalArgumentException](
      Pdf.parse(hostile)).getMessage.contains("no xref table"))
    // free-list head corrupted
    val xrefAt = new String(good, "US-ASCII").indexOf("xref\n")
    val entry0 = xrefAt + 5 + 4
    assert(intercept[IllegalArgumentException](
      Pdf.parse(mutated(_(entry0 + 17) = 'n')))
      .getMessage.contains("free-list"))
  }
}
