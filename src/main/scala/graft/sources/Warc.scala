package graft.sources

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater, Inflater}

/** From-spec WARC/1.0 codec (ISO 28500 / the Common Crawl `.warc.gz`
  * convention): every record is serialized as its OWN gzip member so a
  * reader can split a shard at member boundaries and decompress records
  * independently — the property that makes a 100 TB crawl scan-parallel.
  *
  * The reference engine ingests only scientific formats
  * (oph_io_server_nc.c:2716 reads NetCDF scalars); a training-data
  * pipeline's actual front door is crawl WARC. This codec applies the
  * same from-spec discipline as the repo's media codecs: hand-rolled
  * gzip member framing (RFC 1952 header + raw deflate + CRC32/ISIZE
  * trailer), WARC header-block parse, Content-Length body framing, and
  * a resync-on-corruption walk (scan for the next gzip magic) so one
  * truncated member quarantines ONE record instead of the shard tail.
  *
  * Hostile-input posture (the repo's Long-widening rule): declared
  * Content-Length is parsed as Long and bounds-checked against the
  * member's real payload size before any allocation, so a 2^40 header
  * cannot wrap an Int check or drive an allocation. */
object Warc {
  private val GzMagic0 = 0x1f.toByte
  private val GzMagic1 = 0x8b.toByte
  private val GzDeflate = 8.toByte

  /** One payload → one RFC 1952 gzip member. MTIME is zero and XFL/OS
    * fixed so the bytes are deterministic for a given payload. */
  def gzipMember(payload: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(payload.length / 2 + 64)
    out.write(Array[Byte](GzMagic0, GzMagic1, GzDeflate, 0, // FLG=0
      0, 0, 0, 0, // MTIME=0 (deterministic)
      0, 255.toByte)) // XFL=0, OS=unknown
    val d = new Deflater(Deflater.DEFAULT_COMPRESSION, true) // raw deflate
    d.setInput(payload); d.finish()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    val crc = new CRC32(); crc.update(payload)
    val t = new Array[Byte](8)
    val c = crc.getValue; val n = payload.length.toLong
    for (i <- 0 until 4) t(i) = ((c >>> (8 * i)) & 0xFF).toByte
    for (i <- 0 until 4) t(4 + i) = ((n >>> (8 * i)) & 0xFF).toByte
    out.write(t)
    out.toByteArray
  }

  /** Inflate ONE gzip member starting at `off`; returns (payload,
    * offset just past the member's trailer). Throws IllegalArgumentException
    * with a descriptive reason on any malformation — bad magic, unknown
    * compression method, truncated deflate stream, CRC/ISIZE mismatch. */
  def gunzipMember(buf: Array[Byte], off: Int): (Array[Byte], Int) = {
    require(off >= 0 && buf.length - off >= 18,
      s"gzip member at $off: shorter than the minimal header+trailer")
    require(buf(off) == GzMagic0 && buf(off + 1) == GzMagic1,
      s"gzip member at $off: bad magic")
    require(buf(off + 2) == GzDeflate,
      s"gzip member at $off: unsupported compression method ${buf(off + 2)}")
    val flg = buf(off + 3) & 0xFF
    var p = off + 10
    if ((flg & 0x04) != 0) { // FEXTRA
      require(buf.length - p >= 2, s"gzip member at $off: truncated FEXTRA")
      val xlen = (buf(p) & 0xFF) | ((buf(p + 1) & 0xFF) << 8)
      p += 2 + xlen
    }
    if ((flg & 0x08) != 0) { while (p < buf.length && buf(p) != 0) p += 1; p += 1 } // FNAME
    if ((flg & 0x10) != 0) { while (p < buf.length && buf(p) != 0) p += 1; p += 1 } // FCOMMENT
    if ((flg & 0x02) != 0) p += 2 // FHCRC
    require(p < buf.length, s"gzip member at $off: header ran past the buffer")
    val inf = new Inflater(true)
    inf.setInput(buf, p, buf.length - p)
    val out = new ByteArrayOutputStream(4096)
    val tmp = new Array[Byte](8192)
    try {
      while (!inf.finished()) {
        val k = inf.inflate(tmp)
        if (k == 0 && inf.needsInput())
          throw new IllegalArgumentException(
            s"gzip member at $off: truncated deflate stream")
        out.write(tmp, 0, k)
      }
      val consumed = (buf.length - p) - inf.getRemaining
      val trailerAt = p + consumed
      require(buf.length - trailerAt >= 8,
        s"gzip member at $off: truncated trailer")
      val payload = out.toByteArray
      var crcStored = 0L; var isize = 0L
      for (i <- 0 until 4) crcStored |= (buf(trailerAt + i) & 0xFFL) << (8 * i)
      for (i <- 0 until 4) isize |= (buf(trailerAt + 4 + i) & 0xFFL) << (8 * i)
      val crc = new CRC32(); crc.update(payload)
      require(crc.getValue == crcStored, s"gzip member at $off: CRC mismatch")
      require((payload.length.toLong & 0xFFFFFFFFL) == isize,
        s"gzip member at $off: ISIZE mismatch")
      (payload, trailerAt + 8)
    } catch {
      case e: java.util.zip.DataFormatException =>
        throw new IllegalArgumentException(
          s"gzip member at $off: corrupt deflate data (${e.getMessage})")
    } finally inf.end()
  }

  /** A parsed WARC record: the header map (names case-normalized to
    * their canonical spelling is NOT attempted — lookup is
    * case-insensitive instead, as the spec requires) plus the raw body. */
  final case class Record(headers: Map[String, String], body: Array[Byte]) {
    def header(name: String): Option[String] =
      headers.collectFirst { case (k, v) if k.equalsIgnoreCase(name) => v }
    def warcType: String = header("WARC-Type").getOrElse("")
    def targetUri: String = header("WARC-Target-URI").getOrElse("")
  }

  private val Crlf = "\r\n"

  /** Serialize one WARC/1.0 record (version line, header block, blank
    * line, body, two trailing CRLFs per the spec's record separator).
    * `declaredLength` overrides the Content-Length header — ONLY for
    * building hostile test fixtures; a real writer never sets it. */
  def encodeRecord(tpe: String, headers: Seq[(String, String)],
      body: Array[Byte], declaredLength: Option[Long] = None): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("WARC/1.0").append(Crlf)
    sb.append("WARC-Type: ").append(tpe).append(Crlf)
    headers.foreach { case (k, v) => sb.append(k).append(": ").append(v).append(Crlf) }
    sb.append("Content-Length: ")
      .append(declaredLength.getOrElse(body.length.toLong)).append(Crlf)
    sb.append(Crlf)
    val head = sb.toString.getBytes("US-ASCII")
    val out = new Array[Byte](head.length + body.length + 4)
    System.arraycopy(head, 0, out, 0, head.length)
    System.arraycopy(body, 0, out, head.length, body.length)
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  /** Parse one record from a decompressed member. Enforces the version
    * line, the header grammar, and Content-Length framing (declared
    * length parsed as LONG and checked against the real payload before
    * any slice — a hostile 2^40 header is a descriptive rejection, not
    * an Int wrap or an OOM). */
  def parseRecord(bytes: Array[Byte]): Record = {
    // header block ends at the first CRLFCRLF
    var hEnd = -1
    var i = 0
    while (hEnd < 0 && i + 3 < bytes.length) {
      if (bytes(i) == '\r' && bytes(i + 1) == '\n' &&
          bytes(i + 2) == '\r' && bytes(i + 3) == '\n') hEnd = i
      i += 1
    }
    require(hEnd >= 0, "WARC record: no CRLFCRLF header terminator")
    val headText = new String(bytes, 0, hEnd, "US-ASCII")
    val lines = headText.split("\r\n", -1)
    require(lines.nonEmpty && lines.head.startsWith("WARC/"),
      s"WARC record: bad version line '${lines.headOption.getOrElse("")}'")
    require(lines.head == "WARC/1.0",
      s"WARC record: unsupported version '${lines.head}'")
    val hdrs = lines.tail.map { l =>
      val c = l.indexOf(':')
      require(c > 0, s"WARC record: malformed header line '$l'")
      (l.substring(0, c).trim, l.substring(c + 1).trim)
    }.toMap
    val lenStr = hdrs.collectFirst {
      case (k, v) if k.equalsIgnoreCase("Content-Length") => v
    }.getOrElse(throw new IllegalArgumentException(
      "WARC record: missing Content-Length"))
    val len = try lenStr.toLong catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"WARC record: non-numeric Content-Length '$lenStr'")
    }
    val bodyStart = hEnd + 4
    val avail = (bytes.length - bodyStart).toLong
    require(len >= 0 && len <= avail,
      s"WARC record: declared Content-Length $len exceeds the $avail " +
        "bytes present in the member — truncated or hostile record")
    Record(hdrs, java.util.Arrays.copyOfRange(bytes, bodyStart,
      bodyStart + len.toInt))
  }

  /** `sha1:<base32>` payload digest in the WARC convention (RFC 4648
    * base32, no padding needed: sha1's 160 bits are exactly 32 chars). */
  def payloadDigest(payload: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("SHA-1").digest(payload)
    val alphabet = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567"
    val sb = new StringBuilder(32)
    var buf = 0L; var bits = 0
    d.foreach { b =>
      buf = (buf << 8) | (b & 0xFFL); bits += 8
      while (bits >= 5) {
        bits -= 5
        sb.append(alphabet(((buf >> bits) & 0x1F).toInt))
      }
    }
    "sha1:" + sb.toString
  }

  /** Walk a `.warc.gz` shard member-by-member. A malformed member (bad
    * gzip, CRC failure, bad WARC framing) yields a Left(reason) and the
    * walk RESYNCS by scanning forward for the next gzip magic — so one
    * corrupt record never quarantines the rest of the shard. Intact
    * members are always recovered: the scan can only try (and reject)
    * false magics strictly BEFORE the next real member start, never
    * skip past one. */
  def walk(buf: Array[Byte]): Iterator[Either[String, Record]] =
    new Iterator[Either[String, Record]] {
      private var off = 0
      def hasNext: Boolean = off < buf.length
      def next(): Either[String, Record] = {
        val start = off
        val member: Either[String, Array[Byte]] =
          try {
            val (payload, nextOff) = gunzipMember(buf, start)
            off = nextOff // boundary known even if the WARC parse fails below
            Right(payload)
          } catch {
            case e: IllegalArgumentException =>
              // corrupt member: boundary UNKNOWN — scan for the next magic
              var p = start + 1
              while (p + 2 < buf.length &&
                !(buf(p) == GzMagic0 && buf(p + 1) == GzMagic1 &&
                  buf(p + 2) == GzDeflate)) p += 1
              off = if (p + 2 < buf.length) p else buf.length
              Left(e.getMessage)
          }
        member.flatMap { payload =>
          // WARC-level malformation (hostile Content-Length, bad header
          // grammar): the member itself was intact, so the walk resumes
          // at its true end — no scan, no collateral quarantine
          try Right(parseRecord(payload))
          catch { case e: IllegalArgumentException => Left(e.getMessage) }
        }
      }
    }
}
