package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** The SRT cue walk: timestamp arithmetic vectors, quarantine
  * accounting, and loud rejection of violations that make the books
  * impossible. */
class SrtSpec extends AnyFunSuite {

  test("round-trip: books balance over a plain cue sheet") {
    val text = Srt.encode(Seq(
      Srt.Cue(0L, 1500L, Seq("hello world")),
      Srt.Cue(3600000L, 2000L, Seq("two", "lines"))))
    val b = Srt.parse(text)
    assert(b.nCues == 2 && b.nBad == 0)
    assert(b.totalDurMs == 3500L)
    assert(b.nChars == 11 + 3 + 5)
    assert(b.nBytes == text.length)
    assert(text.contains("01:00:00,000 --> 01:00:02,000"))
  }

  test("a malformed timing line quarantines the cue, books keep balancing") {
    val text = Srt.encode(Seq(
      Srt.Cue(0L, 1000L, Seq("ok")),
      Srt.Cue(5000L, 1000L, Seq("skipped", "text"), malformTiming = true),
      Srt.Cue(9000L, 700L, Seq("fine"))))
    val b = Srt.parse(text)
    assert(b.nCues == 2 && b.nBad == 1)
    assert(b.totalDurMs == 1700L)
    assert(b.nChars == 2 + 4) // the quarantined cue's text is not booked
    assert(b.nBytes == text.length)
  }

  test("structural violations reject loudly") {
    // non-numeric index line
    assert(intercept[IllegalArgumentException](
      Srt.parse("one\n00:00:00,000 --> 00:00:01,000\nx\n\n"))
      .getMessage.contains("not a number"))
    // end before start (a valid-format timing line must validate order)
    assert(intercept[IllegalArgumentException](
      Srt.parse("1\n00:00:05,000 --> 00:00:01,000\nx\n\n"))
      .getMessage.contains("not after"))
    // minutes out of range
    assert(intercept[IllegalArgumentException](
      Srt.parse("1\n00:99:00,000 --> 01:40:01,000\nx\n\n"))
      .getMessage.contains("out of range"))
    // cue with no text lines
    assert(intercept[IllegalArgumentException](
      Srt.parse("1\n00:00:00,000 --> 00:00:01,000\n\n"))
      .getMessage.contains("no text"))
    // missing timing line at EOF
    assert(intercept[IllegalArgumentException](
      Srt.parse("1")).getMessage.contains("missing timing"))
  }

  test("a wrong-width or wrong-arrow line is a quarantine, not a crash") {
    val b = Srt.parse("1\n0:00:00,000 --> 0:00:01,000\nx\n\n")
    assert(b.nCues == 0 && b.nBad == 1) // 28 chars: not a timing line
    val c = Srt.parse("1\n00:00:00,000 ==> 00:00:01,000\nx\n\n")
    assert(c.nCues == 0 && c.nBad == 1)
  }
}
