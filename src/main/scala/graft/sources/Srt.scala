package graft.sources

/** From-spec SubRip (SRT) subtitle walk: the caption-alignment
  * bookkeeping pass a video training pipeline runs over every subtitle
  * sidecar at ingest scale. SRT grammar (de-facto spec, as consumed by
  * every player): cues separated by blank lines, each cue = an integer
  * index line, a timing line `HH:MM:SS,mmm --> HH:MM:SS,mmm`
  * (fixed-width, comma decimal mark), then one or more text lines.
  *
  * The walk books cue/character/duration totals in exact-integer
  * milliseconds. A cue whose timing line is not FULLY valid — wrong
  * shape, misplaced separators, non-digits, minutes/seconds ≥ 60,
  * end ≤ start — is QUARANTINED: counted in `nBad`, its text skipped
  * to the next blank line, never failing the file (the qn13
  * discipline: subtitle sidecars in the wild are full of half-broken
  * cues, and a books pass must account for them, not die on them).
  * Only structure that makes accounting impossible rejects loudly:
  * a non-numeric index line, a cue cut off before its timing line,
  * a parsed cue with no text. */
object Srt {

  final case class Books(nCues: Long, nBad: Long, totalDurMs: Long,
                         nChars: Long, nBytes: Long)

  private def ts(ms: Long): String = {
    require(ms >= 0 && ms < 100L * 3600 * 1000, s"timestamp $ms out of range")
    val h = ms / 3600000; val m = (ms / 60000) % 60
    val s = (ms / 1000) % 60; val f = ms % 1000
    f"$h%02d:$m%02d:$s%02d,$f%03d"
  }

  final case class Cue(startMs: Long, durMs: Long, lines: Seq[String],
                       malformTiming: Boolean = false)

  /** Deterministic fixture encoder; a malformed cue gets a timing line
    * that cannot parse (`badtiming`) but keeps its text block. */
  def encode(cues: Seq[Cue]): String = {
    val sb = new StringBuilder
    cues.zipWithIndex.foreach { case (c, i) =>
      sb.append(i + 1).append('\n')
      if (c.malformTiming) sb.append("badtiming").append('\n')
      else sb.append(ts(c.startMs)).append(" --> ")
        .append(ts(c.startMs + c.durMs)).append('\n')
      c.lines.foreach(l => sb.append(l).append('\n'))
      sb.append('\n')
    }
    sb.toString
  }

  /** (startMs, endMs) if the line is a FULLY valid timing line; None
    * on ANY malformation — shape, misplaced separators, non-digits,
    * minutes/seconds ≥ 60, end ≤ start. Totality here is the
    * quarantine contract: a half-broken timing line costs one cue,
    * never the file. */
  private def timing(line: String): Option[(Long, Long)] = {
    def ts(at: Int): Option[Long] = {
      def d2(off: Int): Option[Long] = {
        val a = line(at + off); val b = line(at + off + 1)
        if (a.isDigit && b.isDigit) Some((a - '0') * 10L + (b - '0')) else None
      }
      if (line(at + 2) != ':' || line(at + 5) != ':' || line(at + 8) != ',')
        None
      else for {
        h <- d2(0)
        m <- d2(3) if m < 60
        s <- d2(6) if s < 60
        ms <- if (line(at + 9).isDigit && line(at + 10).isDigit &&
            line(at + 11).isDigit)
          Some((line(at + 9) - '0') * 100L + (line(at + 10) - '0') * 10L +
            (line(at + 11) - '0'))
        else None
      } yield ((h * 60 + m) * 60 + s) * 1000 + ms
    }
    if (line.length != 29 || line.substring(12, 17) != " --> ") None
    else for { a <- ts(0); b <- ts(17) if b > a } yield (a, b)
  }

  def parse(text: String): Books = {
    val lines = text.split("\n", -1)
    var i = 0
    var nCues = 0L; var nBad = 0L; var dur = 0L; var chars = 0L
    while (i < lines.length) {
      if (lines(i).isEmpty) { i += 1 } // blank separators between cues
      else {
        require(lines(i).nonEmpty && lines(i).forall(_.isDigit),
          s"cue at line $i: index '${lines(i)}' is not a number")
        i += 1
        require(i < lines.length, s"cue at line $i: missing timing line")
        timing(lines(i)) match {
          case Some((a, b)) =>
            i += 1
            var got = false
            while (i < lines.length && lines(i).nonEmpty) {
              chars += lines(i).length; got = true; i += 1
            }
            require(got, s"cue at line $i: no text lines")
            nCues += 1
            dur += b - a
          case None => // quarantine: skip the cue's block, keep counting
            nBad += 1
            while (i < lines.length && lines(i).nonEmpty) i += 1
        }
      }
    }
    Books(nCues, nBad, dur, chars, text.length.toLong)
  }
}
