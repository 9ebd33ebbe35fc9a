package graft.sources

/** From-spec UTF-8 validation/repair (the WHATWG Encoding Standard
  * decoder, which is also Unicode's "maximal subpart" best practice):
  * the corpus-cleaning step every crawl pipeline runs before text
  * processing — real dumps carry truncated multi-byte sequences, stray
  * continuation bytes, overlongs, surrogate encodings and
  * beyond-U+10FFFF leads, and a pipeline must repair them
  * DETERMINISTICALLY (one U+FFFD per maximal invalid subpart), not
  * crash and not silently mangle.
  *
  * The state machine is the spec's: boundaries tighten for E0/ED/F0/F4
  * leads (rejecting overlongs, surrogates and out-of-range codepoints
  * at the first continuation byte), and an out-of-range continuation
  * byte is RE-PROCESSED as a fresh lead after the error — that
  * re-processing is what makes the error count per maximal subpart.
  * JDK 8+'s CharsetDecoder implements the same policy, which the fuzz
  * spec uses as an independent reference. */
object Utf8 {
  /** (codepoints emitted INCLUDING replacements, replacements). */
  def decodeStats(bytes: Array[Byte]): (Int, Int) = {
    var cps = 0; var repl = 0
    var needed = 0; var seen = 0; var cp = 0
    var lower = 0x80; var upper = 0xBF
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xFF
      if (needed == 0) {
        if (b <= 0x7F) cps += 1
        else if (b >= 0xC2 && b <= 0xDF) { needed = 1; cp = b & 0x1F }
        else if (b == 0xE0) { needed = 2; lower = 0xA0; cp = b & 0xF }
        else if (b == 0xED) { needed = 2; upper = 0x9F; cp = b & 0xF }
        else if (b >= 0xE1 && b <= 0xEF) { needed = 2; cp = b & 0xF }
        else if (b == 0xF0) { needed = 3; lower = 0x90; cp = b & 0x7 }
        else if (b == 0xF4) { needed = 3; upper = 0x8F; cp = b & 0x7 }
        else if (b >= 0xF1 && b <= 0xF3) { needed = 3; cp = b & 0x7 }
        else { cps += 1; repl += 1 } // invalid lead (80-C1, F5-FF)
        i += 1
      } else if (b < lower || b > upper) {
        // maximal subpart ends BEFORE this byte: error, reset, and
        // re-process the byte as a fresh lead (no i += 1)
        cps += 1; repl += 1
        needed = 0; seen = 0; cp = 0; lower = 0x80; upper = 0xBF
      } else {
        cp = (cp << 6) | (b & 0x3F)
        lower = 0x80; upper = 0xBF
        seen += 1
        if (seen == needed) { cps += 1; needed = 0; seen = 0; cp = 0 }
        i += 1
      }
    }
    if (needed != 0) { cps += 1; repl += 1 } // truncated tail sequence
    (cps, repl)
  }

  /** Repaired string (U+FFFD per maximal invalid subpart) — the same
    * walk as [[decodeStats]], materialized. */
  def sanitize(bytes: Array[Byte]): String = {
    val out = new java.lang.StringBuilder(bytes.length)
    var needed = 0; var seen = 0; var cp = 0
    var lower = 0x80; var upper = 0xBF
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xFF
      if (needed == 0) {
        if (b <= 0x7F) out.append(b.toChar)
        else if (b >= 0xC2 && b <= 0xDF) { needed = 1; cp = b & 0x1F }
        else if (b == 0xE0) { needed = 2; lower = 0xA0; cp = b & 0xF }
        else if (b == 0xED) { needed = 2; upper = 0x9F; cp = b & 0xF }
        else if (b >= 0xE1 && b <= 0xEF) { needed = 2; cp = b & 0xF }
        else if (b == 0xF0) { needed = 3; lower = 0x90; cp = b & 0x7 }
        else if (b == 0xF4) { needed = 3; upper = 0x8F; cp = b & 0x7 }
        else if (b >= 0xF1 && b <= 0xF3) { needed = 3; cp = b & 0x7 }
        else out.append('�')
        i += 1
      } else if (b < lower || b > upper) {
        out.append('�')
        needed = 0; seen = 0; cp = 0; lower = 0x80; upper = 0xBF
      } else {
        cp = (cp << 6) | (b & 0x3F)
        lower = 0x80; upper = 0xBF
        seen += 1
        if (seen == needed) {
          out.appendCodePoint(cp); needed = 0; seen = 0; cp = 0
        }
        i += 1
      }
    }
    if (needed != 0) out.append('�')
    out.toString
  }
}
