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

  test("resolution is end-first: an incremental update's LATER startxref wins") {
    // append an ISO 32000-1 §7.5.6-style incremental update — a new
    // object, a replacement xref table, a new trailer — and the walk
    // must resolve through the LAST startxref (3 objects); a regression
    // to the first one would report the original table's 2
    val base = Pdf.encode(4, 2, 30, 1L, breakEntry2 = false)
    val text = new String(base, "US-ASCII")
    val entries = text.indexOf("xref\n") + 5 + 4 // after the "0 3\n" header
    val e1 = text.substring(entries + 20, entries + 30).toLong
    val e2 = text.substring(entries + 40, entries + 50).toLong
    val sb = new StringBuilder(text)
    val o3 = sb.length.toLong
    sb.append("3 0 obj\n<< /Val 9 >>\nendobj\n")
    val nx = sb.length.toLong
    sb.append("xref\n0 4\n0000000000 65535 f \n")
    sb.append(f"$e1%010d 00000 n \n")
    sb.append(f"$e2%010d 00000 n \n")
    sb.append(f"$o3%010d 00000 n \n")
    sb.append("trailer\n<< /Size 4 /Root 1 0 R >>\n")
    sb.append(s"startxref\n$nx\n%%EOF\n")
    val b = Pdf.parse(sb.toString.getBytes("US-ASCII"))
    assert(b.nObjects == 3 && b.nXrefBad == 0 && b.streamBytes == 30)
  }

  test("a 2^63-scale xref count cannot overflow the bounds guard") {
    val hostile = ("%PDF-1.4\nstartxref\n28\n%%EOF\n" +
      "xref\n0 922337203685477581\n0000000000 65535 f \n")
      .getBytes("US-ASCII")
    assert(intercept[IllegalArgumentException](Pdf.parse(hostile))
      .getMessage.contains("truncated"))
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
