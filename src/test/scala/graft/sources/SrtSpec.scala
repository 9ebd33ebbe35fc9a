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
    // cue with no text lines
    assert(intercept[IllegalArgumentException](
      Srt.parse("1\n00:00:00,000 --> 00:00:01,000\n\n"))
      .getMessage.contains("no text"))
    // missing timing line at EOF
    assert(intercept[IllegalArgumentException](
      Srt.parse("1")).getMessage.contains("missing timing"))
  }

  test("ANY invalid timing line is a quarantine, not a crash") {
    def bad(line: String): Unit = {
      val b = Srt.parse(s"1\n$line\nx\n\n")
      assert(b.nCues == 0 && b.nBad == 1, s"'$line' should quarantine")
    }
    bad("0:00:00,000 --> 0:00:01,000") // 28 chars: wrong width
    bad("00:00:00,000 ==> 00:00:01,000") // wrong arrow
    bad("00:00:00,0,0 --> 00:00:01,000") // right chars, misplaced comma
    bad("00:00:05,000 --> 00:00:01,000") // end before start
    bad("00:99:00,000 --> 01:40:01,000") // minutes out of range
    bad("00:00:61,000 --> 00:01:02,000") // seconds out of range
    bad("00:00:0a,000 --> 00:00:01,000") // non-digit
  }
}
