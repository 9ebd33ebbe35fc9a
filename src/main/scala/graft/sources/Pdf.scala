package graft.sources

/** From-spec PDF skeleton walk (ISO 32000-1 file structure): the
  * document-corpus front door. A conforming reader starts at the END:
  * find the last `startxref`, jump to the cross-reference table, and
  * resolve objects through it — never by scanning forward. This walk
  * does exactly that over a strict fixture subset (classic xref table,
  * 20-byte entries, one stream object): header version, object count,
  * per-entry offset CROSS-CHECK (the entry's target must actually
  * begin with `<num> 0 obj` — a stale offset is how real PDFs rot),
  * stream payload volume, byte total.
  *
  * An xref entry whose target does not match is QUARANTINED (booked in
  * `nXrefBad` — readers rebuild such tables, they don't die); missing
  * structure — no header, no startxref/%%EOF, a malformed table or a
  * non-20-byte entry — rejects loudly. */
object Pdf {

  final case class Books(versionMinor: Long, nObjects: Long, nXrefBad: Long,
                         streamBytes: Long, nBytes: Long)

  /** Deterministic fixture: object 1 is a stream of `streamLen` bytes,
    * objects 2..n are scalar dicts; `breakEntry2` stores object 2's
    * xref offset off by one (the quarantine path). */
  def encode(versionMinor: Int, n: Int, streamLen: Int, idSeed: Long,
             breakEntry2: Boolean): Array[Byte] = {
    require(n >= 2 && n <= 9 && versionMinor >= 0 && versionMinor <= 9)
    val sb = new StringBuilder
    sb.append(s"%PDF-1.$versionMinor\n")
    val offsets = new Array[Long](n + 1)
    offsets(1) = sb.length.toLong
    sb.append(s"1 0 obj\n<< /Length $streamLen >>\nstream\n")
    (0 until streamLen).foreach(i => sb.append((('a' + (i * 7 + idSeed) % 26).toChar)))
    sb.append("\nendstream\nendobj\n")
    (2 to n).foreach { i =>
      offsets(i) = sb.length.toLong
      sb.append(s"$i 0 obj\n<< /Val ${idSeed + i} >>\nendobj\n")
    }
    val xrefOff = sb.length.toLong
    sb.append("xref\n").append(s"0 ${n + 1}\n")
    sb.append("0000000000 65535 f \n")
    (1 to n).foreach { i =>
      val off = offsets(i) + (if (breakEntry2 && i == 2) 1 else 0)
      sb.append(f"$off%010d 00000 n \n")
    }
    sb.append("trailer\n").append(s"<< /Size ${n + 1} /Root 1 0 R >>\n")
    sb.append("startxref\n").append(xrefOff).append("\n%%EOF\n")
    sb.toString.getBytes("US-ASCII")
  }

  private def lastIndexOf(buf: Array[Byte], pat: Array[Byte]): Int = {
    var i = buf.length - pat.length
    while (i >= 0) {
      var k = 0
      while (k < pat.length && buf(i + k) == pat(k)) k += 1
      if (k == pat.length) return i
      i -= 1
    }
    -1
  }

  private def digitsAt(buf: Array[Byte], off: Int, len: Int): Long = {
    var v = 0L
    (0 until len).foreach { k =>
      require(buf(off + k) >= '0' && buf(off + k) <= '9',
        s"non-digit in a numeric field at ${off + k}")
      v = v * 10 + (buf(off + k) - '0')
    }
    v
  }

  private def matches(buf: Array[Byte], off: Long, s: String): Boolean = {
    val b = s.getBytes("US-ASCII")
    off >= 0 && off + b.length <= buf.length &&
      b.indices.forall(k => buf(off.toInt + k) == b(k))
  }

  def parse(buf: Array[Byte]): Books = {
    require(buf.length >= 9 && matches(buf, 0, "%PDF-1."),
      "missing %PDF-1.x header")
    require(buf(7) >= '0' && buf(7) <= '9' && buf(8) == '\n',
      "malformed header version")
    val minor = (buf(7) - '0').toLong
    val sx = lastIndexOf(buf, "startxref\n".getBytes("US-ASCII"))
    require(sx >= 0, "no startxref")
    var p = sx + 10
    var xrefOff = 0L
    require(p < buf.length && buf(p) >= '0' && buf(p) <= '9',
      "startxref: no offset digits")
    while (p < buf.length && buf(p) >= '0' && buf(p) <= '9') {
      xrefOff = xrefOff * 10 + (buf(p) - '0'); p += 1
    }
    require(matches(buf, p.toLong, "\n%%EOF"), "missing %%EOF after startxref")
    require(matches(buf, xrefOff, "xref\n"), s"no xref table at $xrefOff")
    var q = xrefOff.toInt + 5
    // single subsection "0 K\n" (the fixture subset; multiple
    // subsections belong to incremental updates, out of scope here)
    require(q + 2 <= buf.length && buf(q) == '0' && buf(q + 1) == ' ',
      "xref subsection must start at object 0")
    q += 2
    var k = 0L
    require(q < buf.length && buf(q) >= '0' && buf(q) <= '9',
      "xref subsection: no count")
    while (q < buf.length && buf(q) >= '0' && buf(q) <= '9') {
      k = k * 10 + (buf(q) - '0'); q += 1
    }
    require(q < buf.length && buf(q) == '\n', "xref subsection: bad header end")
    q += 1
    // the count is hostile input: bound it BEFORE the 20·k product so a
    // 2^63-scale count cannot overflow the guard into a passing negative
    require(k >= 1 && k <= (buf.length - q) / 20,
      s"xref table of $k entries truncated")
    // entry 0: the head of the free list, generation 65535
    require(digitsAt(buf, q, 10) == 0 && digitsAt(buf, q + 11, 5) == 65535 &&
      buf(q + 17) == 'f', "xref entry 0 is not the free-list head")
    var bad = 0L
    var streamBytes = 0L
    (1L until k).foreach { i =>
      val e = q + (20 * i).toInt
      val off = digitsAt(buf, e, 10)
      require(digitsAt(buf, e + 11, 5) == 0 && buf(e + 17) == 'n',
        s"xref entry $i: not an in-use generation-0 entry")
      if (!matches(buf, off, s"$i 0 obj\n")) bad += 1
      else if (matches(buf, off + s"$i 0 obj\n".length, "<< /Length ")) {
        // stream object: trust the cross-checked dict, book the payload
        var d = off.toInt + s"$i 0 obj\n<< /Length ".length
        var len = 0L
        require(d < buf.length && buf(d) >= '0' && buf(d) <= '9',
          s"object $i: bad /Length")
        while (d < buf.length && buf(d) >= '0' && buf(d) <= '9') {
          len = len * 10 + (buf(d) - '0'); d += 1
        }
        streamBytes += len
      }
    }
    Books(minor, k - 1, bad, streamBytes, buf.length.toLong)
  }
}
