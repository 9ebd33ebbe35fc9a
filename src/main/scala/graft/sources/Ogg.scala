package graft.sources

/** From-spec Ogg container page walk — RFC 3533: the stream-corpus
  * bookkeeping pass (page/packet counts, granule positions, byte
  * volumes) that runs at ingest scale WITHOUT a codec.
  *
  * Page header (§6): "OggS" capture pattern, version 0, header-type
  * flags (0x1 continuation, 0x2 BOS, 0x4 EOS), 64-bit little-endian
  * granule position, 32-bit serial / page-sequence / CRC, segment
  * count, then the lacing table: each packet is laced as ⌊n/255⌋
  * 255-values plus a final `n mod 255` value; a lacing value of 255 at
  * the END of a page means the packet continues on the next page,
  * which must then carry the continuation flag. The page CRC is the
  * non-reflected CRC-32 with generator polynomial 0x04c11db7, zero
  * initial value and no final XOR (§6 "CRC checksum"), computed over
  * the whole page with the CRC field zeroed.
  *
  * The walk verifies EVERY page CRC and the full flag/sequence/serial
  * grammar, and rejects loudly on any mismatch — a books pass must
  * balance exactly, and a CRC that doesn't re-derive is corruption. */
object Ogg {

  private val Table: Array[Int] = Array.tabulate(256) { i =>
    var r = i << 24
    var k = 0
    while (k < 8) {
      r = if ((r & 0x80000000) != 0) (r << 1) ^ 0x04c11db7 else r << 1
      k += 1
    }
    r
  }

  private def crcByte(c: Int, b: Byte): Int =
    (c << 8) ^ Table(((c >>> 24) ^ (b & 0xFF)) & 0xFF)

  /** Page CRC over `[from, until)` with the 4 CRC bytes at `crcAt`
    * treated as zero (RFC 3533 §6). */
  def pageCrc(bytes: Array[Byte], from: Int, until: Int, crcAt: Int): Int = {
    var c = 0
    var i = from
    while (i < until) {
      c = crcByte(c, if (i >= crcAt && i < crcAt + 4) 0 else bytes(i))
      i += 1
    }
    c
  }

  final case class Page(granule: Long, packets: Seq[Int])

  /** One packet's lacing values: ⌊n/255⌋ 255s + final `n mod 255`. */
  private def lacing(n: Int): Seq[Int] =
    Seq.fill(n / 255)(255) :+ (n % 255)

  /** Deterministic fixture encoder. With `span`, a 300-byte packet
    * spans page 0 → page 1 (255 bytes laced 255 at page 0's tail, 45
    * bytes laced on page 1's head under the continuation flag). */
  def encode(serial: Long, pages: Seq[Page], span: Boolean): Array[Byte] = {
    require(pages.nonEmpty && (!span || pages.length >= 2), "fixture shape")
    val out = new java.io.ByteArrayOutputStream()
    pages.zipWithIndex.foreach { case (pg, j) =>
      val headIn = if (span && j == 1) Seq(45) else Seq.empty
      val tailOut = if (span && j == 0) Seq(255) else Seq.empty
      val lacings = headIn ++ pg.packets.flatMap(lacing) ++ tailOut
      require(lacings.length <= 255, "fixture: too many lacing values")
      val payloadLen = lacings.sum
      val page = new Array[Byte](27 + lacings.length + payloadLen)
      page(0) = 'O'; page(1) = 'g'; page(2) = 'g'; page(3) = 'S'
      page(4) = 0 // version
      var flags = 0
      if (span && j == 1) flags |= 0x1
      if (j == 0) flags |= 0x2
      if (j == pages.length - 1) flags |= 0x4
      page(5) = flags.toByte
      var v = pg.granule
      (0 until 8).foreach { k => page(6 + k) = (v & 0xFF).toByte; v >>>= 8 }
      var sv = serial
      (0 until 4).foreach { k => page(14 + k) = (sv & 0xFF).toByte; sv >>>= 8 }
      var sq = j.toLong
      (0 until 4).foreach { k => page(18 + k) = (sq & 0xFF).toByte; sq >>>= 8 }
      // CRC at 22..25 stays zero until computed below
      page(26) = lacings.length.toByte
      lacings.zipWithIndex.foreach { case (l, k) => page(27 + k) = l.toByte }
      var p = 27 + lacings.length
      var i = 0
      while (i < payloadLen) {
        page(p) = ((i * 7 + j * 11) & 0xFF).toByte; p += 1; i += 1
      }
      var c = pageCrc(page, 0, page.length, 22)
      (0 until 4).foreach { k => page(22 + k) = (c & 0xFF).toByte; c >>>= 8 }
      out.write(page, 0, page.length)
    }
    out.toByteArray
  }

  final case class Books(nPages: Long, nPackets: Long, lastGranule: Long,
                         payloadBytes: Long, nBytes: Long)

  private def le32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xFFL) | ((b(off + 1) & 0xFFL) << 8) |
      ((b(off + 2) & 0xFFL) << 16) | ((b(off + 3) & 0xFFL) << 24)

  private def le64(b: Array[Byte], off: Int): Long =
    le32(b, off) | (le32(b, off + 4) << 32)

  def parse(bytes: Array[Byte]): Books = {
    var off = 0
    var nPages = 0L
    var nPackets = 0L
    var payloadBytes = 0L
    var lastGranule = 0L
    var serial = -1L
    var pending = false // a packet is mid-flight across the page boundary
    var sawEos = false
    while (off < bytes.length) {
      require(!sawEos, s"page at $off: data after the EOS page")
      require(bytes.length - off >= 27, s"truncated page header at $off")
      require(bytes(off) == 'O' && bytes(off + 1) == 'g' &&
        bytes(off + 2) == 'g' && bytes(off + 3) == 'S',
        s"bad capture pattern at $off")
      require(bytes(off + 4) == 0, s"page at $off: unsupported version ${bytes(off + 4)}")
      val flags = bytes(off + 5) & 0xFF
      require(((flags & 0x1) != 0) == pending,
        s"page at $off: continuation flag ${(flags & 0x1) != 0} but " +
          s"previous page ${if (pending) "left" else "did not leave"} a packet open")
      require(((flags & 0x2) != 0) == (nPages == 0),
        s"page at $off: BOS flag on a non-first page (or missing on the first)")
      val granule = le64(bytes, off + 6)
      val ser = le32(bytes, off + 14)
      require(serial < 0 || ser == serial,
        s"page at $off: serial $ser changes mid-stream (was $serial)")
      serial = ser
      val seq = le32(bytes, off + 18)
      require(seq == nPages, s"page at $off: sequence $seq, expected $nPages")
      val nseg = bytes(off + 26) & 0xFF
      require(bytes.length - off >= 27 + nseg, s"page at $off: truncated lacing table")
      var pay = 0
      var k = 0
      while (k < nseg) { pay += bytes(off + 27 + k) & 0xFF; k += 1 }
      val total = 27 + nseg + pay
      require(off + total <= bytes.length,
        s"page at $off: payload runs past the buffer")
      val stored = le32(bytes, off + 22)
      val computed = pageCrc(bytes, off, off + total, off + 22) & 0xFFFFFFFFL
      require(stored == computed,
        f"page at $off: CRC $stored%08x, computed $computed%08x")
      k = 0
      while (k < nseg) {
        if ((bytes(off + 27 + k) & 0xFF) < 255) nPackets += 1
        k += 1
      }
      pending = nseg > 0 && (bytes(off + 27 + nseg - 1) & 0xFF) == 255
      payloadBytes += pay
      lastGranule = granule
      sawEos = (flags & 0x4) != 0
      nPages += 1
      off += total
    }
    require(nPages > 0, "no pages")
    require(sawEos, "stream ends without an EOS page")
    require(!pending, "stream ends with a packet still open")
    Books(nPages, nPackets, lastGranule, payloadBytes, bytes.length.toLong)
  }
}
