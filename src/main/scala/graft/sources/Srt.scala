package graft.sources

/** From-spec SubRip (SRT) subtitle walk: the caption-alignment
  * bookkeeping pass a video training pipeline runs over every subtitle
  * sidecar at ingest scale. SRT grammar (de-facto spec, as consumed by
  * every player): cues separated by blank lines, each cue = an integer
  * index line, a timing line `HH:MM:SS,mmm --> HH:MM:SS,mmm`
  * (fixed-width, comma decimal mark), then one or more text lines.
  *
  * The walk books cue/character/duration totals in exact-integer
  * milliseconds. A cue whose timing line does not parse is
  * QUARANTINED — counted in `nBad`, its text skipped to the next
  * blank line — rather than failing the file (the qn13 discipline:
  * subtitle sidecars in the wild are full of half-broken cues, and a
  * books pass must account for them, not die on them). Structural
  * violations that make accounting impossible (a non-numeric index
  * line, minutes/seconds ≥ 60, end ≤ start) reject loudly. */
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

  private def parseTs(s: String, at: Int): Long = {
    def d2(off: Int): Long = {
      require(s(at + off).isDigit && s(at + off + 1).isDigit,
        s"timing line: non-digit at ${at + off}")
      (s(at + off) - '0') * 10L + (s(at + off + 1) - '0')
    }
    require(s(at + 2) == ':' && s(at + 5) == ':' && s(at + 8) == ',',
      "timing line: bad separators")
    val h = d2(0); val m = d2(3); val sec = d2(6)
    require(s(at + 9).isDigit && s(at + 10).isDigit && s(at + 11).isDigit,
      "timing line: non-digit millis")
    val ms = (s(at + 9) - '0') * 100L + (s(at + 10) - '0') * 10L +
      (s(at + 11) - '0')
    require(m < 60 && sec < 60, s"timing line: minutes/seconds out of range")
    ((h * 60 + m) * 60 + sec) * 1000 + ms
  }

  /** (startMs, endMs) or None if the line is not a timing line. */
  private def timing(line: String): Option[(Long, Long)] = {
    if (line.length != 29 || line.substring(12, 17) != " --> ") None
    else {
      val ok = (0 until 12).forall { i =>
        val c = line(i); val d = line(i + 17)
        (c.isDigit || c == ':' || c == ',') && (d.isDigit || d == ':' || d == ',')
      }
      if (!ok) None
      else {
        val a = parseTs(line, 0)
        val b = parseTs(line, 17)
        require(b > a, s"timing line: end $b not after start $a")
        Some((a, b))
      }
    }
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
