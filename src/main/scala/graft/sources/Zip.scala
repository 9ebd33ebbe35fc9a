package graft.sources

/** From-spec ZIP archive walk (PKWARE APPNOTE layout, STORED entries):
  * the front door for epub/docx/jar-shaped corpus payloads. The walk
  * is central-directory-first, the way a correct reader must operate:
  * find the end-of-central-directory record by scanning backward for
  * its signature (a trailing comment may displace it up to 64 KiB),
  * read the directory span, then validate every central entry against
  * its local file header (signature, name, sizes) and re-derive the
  * CRC-32 of the stored bytes — the reflected 0xEDB88320 CRC with
  * 0xFFFFFFFF init and final complement (APPNOTE §4.4.7).
  *
  * A stored CRC that does not re-derive QUARANTINES the entry (booked
  * `crcOk = false` — archive members in the wild rot one file at a
  * time); structure that breaks the walk — no EOCD, a directory span
  * outside the buffer, a local/central mismatch — rejects loudly. */
object Zip {

  private val Table: Array[Int] = Array.tabulate(256) { i =>
    var r = i
    var k = 0
    while (k < 8) {
      r = if ((r & 1) != 0) (r >>> 1) ^ 0xEDB88320 else r >>> 1
      k += 1
    }
    r
  }

  /** Reflected CRC-32 over `[from, until)` (APPNOTE §4.4.7). */
  def crc32(b: Array[Byte], from: Int, until: Int): Long = {
    var c = 0xFFFFFFFF
    var i = from
    while (i < until) {
      c = (c >>> 8) ^ Table((c ^ b(i)) & 0xFF)
      i += 1
    }
    (~c).toLong & 0xFFFFFFFFL
  }

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >>> 8) & 0xFF).toByte)

  private def le32(v: Long): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >>> 8) & 0xFF).toByte,
      ((v >>> 16) & 0xFF).toByte, ((v >>> 24) & 0xFF).toByte)

  final case class Entry(name: String, data: Array[Byte],
                         breakCrc: Boolean = false)

  /** Deterministic fixture encoder: STORED (method 0) entries, empty
    * extras/comments. `breakCrc` stores crc+1 (the quarantine path). */
  def encode(entries: Seq[Entry]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val central = new java.io.ByteArrayOutputStream()
    entries.foreach { e =>
      val name = e.name.getBytes("US-ASCII")
      val crc = (crc32(e.data, 0, e.data.length) +
        (if (e.breakCrc) 1 else 0)) & 0xFFFFFFFFL
      val off = out.size().toLong
      out.write(le32(0x04034b50L)) // local file header signature
      out.write(le16(20)); out.write(le16(0)); out.write(le16(0)) // ver/flags/method
      out.write(le16(0)); out.write(le16(0x21)) // dos time/date
      out.write(le32(crc))
      out.write(le32(e.data.length.toLong)) // compressed (stored)
      out.write(le32(e.data.length.toLong)) // uncompressed
      out.write(le16(name.length)); out.write(le16(0))
      out.write(name); out.write(e.data)
      central.write(le32(0x02014b50L)) // central directory signature
      central.write(le16(20)); central.write(le16(20))
      central.write(le16(0)); central.write(le16(0)) // flags, method
      central.write(le16(0)); central.write(le16(0x21))
      central.write(le32(crc))
      central.write(le32(e.data.length.toLong))
      central.write(le32(e.data.length.toLong))
      central.write(le16(name.length)); central.write(le16(0)); central.write(le16(0))
      central.write(le16(0)); central.write(le16(0)) // disk start, internal attrs
      central.write(le32(0L)) // external attrs
      central.write(le32(off))
      central.write(name)
    }
    val cdOff = out.size().toLong
    central.writeTo(out)
    val cdSize = out.size().toLong - cdOff
    out.write(le32(0x06054b50L)) // EOCD
    out.write(le16(0)); out.write(le16(0))
    out.write(le16(entries.length)); out.write(le16(entries.length))
    out.write(le32(cdSize)); out.write(le32(cdOff))
    out.write(le16(0)) // no comment
    out.toByteArray
  }

  final case class Member(name: String, size: Long, crcOk: Boolean)

  private def rle16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)

  private def rle32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xFFL) | ((b(off + 1) & 0xFFL) << 8) |
      ((b(off + 2) & 0xFFL) << 16) | ((b(off + 3) & 0xFFL) << 24)

  def walk(buf: Array[Byte]): Seq[Member] = {
    // EOCD: backward scan (comment up to 64 KiB may displace it)
    var eocd = -1
    var i = buf.length - 22
    val floor = math.max(0, buf.length - 22 - 0xFFFF)
    while (eocd < 0 && i >= floor) {
      if (rle32(buf, i) == 0x06054b50L &&
          22 + rle16(buf, i + 20) == buf.length - i) eocd = i
      else i -= 1
    }
    require(eocd >= 0, "no end-of-central-directory record")
    val n = rle16(buf, eocd + 10)
    val cdSize = rle32(buf, eocd + 12)
    val cdOff = rle32(buf, eocd + 16)
    require(cdOff + cdSize <= eocd,
      s"central directory [$cdOff, +$cdSize) overlaps the EOCD at $eocd")
    val out = Seq.newBuilder[Member]
    var p = cdOff.toInt
    (0 until n).foreach { _ =>
      require(eocd - p >= 46, s"truncated central entry at $p")
      require(rle32(buf, p) == 0x02014b50L, s"bad central signature at $p")
      require(rle16(buf, p + 10) == 0, s"entry at $p: not STORED")
      val crc = rle32(buf, p + 16)
      val csize = rle32(buf, p + 20)
      val usize = rle32(buf, p + 24)
      require(csize == usize, s"entry at $p: stored sizes disagree")
      val nameLen = rle16(buf, p + 28)
      val extraLen = rle16(buf, p + 30)
      val commentLen = rle16(buf, p + 32)
      val localOff = rle32(buf, p + 42)
      require(p + 46 + nameLen <= eocd, s"entry at $p: name runs past the directory")
      val name = new String(buf, p + 46, nameLen, "US-ASCII")
      // cross-check the local header the central entry points at
      val lo = localOff.toInt
      require(localOff + 30 + nameLen + csize <= cdOff,
        s"entry '$name': local data runs into the central directory")
      require(rle32(buf, lo) == 0x04034b50L, s"entry '$name': bad local signature")
      require(rle32(buf, lo + 18) == csize && rle32(buf, lo + 22) == usize,
        s"entry '$name': local/central size mismatch")
      require(rle16(buf, lo + 26) == nameLen &&
        new String(buf, lo + 30, nameLen, "US-ASCII") == name,
        s"entry '$name': local/central name mismatch")
      val dataOff = lo + 30 + nameLen + rle16(buf, lo + 28)
      require(dataOff.toLong + csize <= cdOff,
        s"entry '$name': data (after local extras) runs into the central directory")
      val computed = crc32(buf, dataOff, dataOff + csize.toInt)
      out += Member(name, usize, computed == crc)
      p += 46 + nameLen + extraLen + commentLen
    }
    require(p == (cdOff + cdSize).toInt,
      s"central directory walk ended at $p, expected ${cdOff + cdSize}")
    out.result()
  }
}
