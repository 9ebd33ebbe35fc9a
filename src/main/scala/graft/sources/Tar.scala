package graft.sources

/** From-spec POSIX ustar (tar) archive walk — IEEE 1003.1 "pax"
  * chapter's ustar layout: the WebDataset convention ships multimodal
  * training corpora as tar shards of per-sample member pairs, and the
  * shard-level bookkeeping pass (member counts, payload volume, header
  * integrity) is the first thing a 100 TB ingest runs on every shard.
  *
  * Each member is a 512-byte header (name, octal size/mode/mtime,
  * checksum, typeflag, "ustar" magic) followed by the data rounded up
  * to 512-byte blocks; the archive ends with two zero blocks. The
  * header checksum is the byte sum of the header with the checksum
  * field replaced by spaces, stored as six octal digits + NUL + space.
  *
  * A member whose checksum does not re-derive is QUARANTINED (booked
  * `checksumOk = false`, the walk advances by the declared size — GNU
  * tar's warn-and-continue behavior); structure that makes the walk
  * impossible — bad magic, a non-octal size, a member running past the
  * buffer, a missing end-of-archive marker — rejects loudly. */
object Tar {

  final case class Member(name: String, size: Long, checksumOk: Boolean)

  /** `width-1` octal digits + NUL (the ustar numeric-field layout). */
  private def octal(v: Long, width: Int): Array[Byte] = {
    require(v >= 0, "octal field")
    val s = java.lang.Long.toOctalString(v)
    require(s.length <= width - 1, s"value $v overflows a $width-byte octal field")
    (("0" * (width - 1 - s.length)) + s).getBytes("US-ASCII") :+ 0.toByte
  }

  private def put(h: Array[Byte], off: Int, s: String): Unit = {
    val b = s.getBytes("US-ASCII")
    System.arraycopy(b, 0, h, off, b.length)
  }

  /** One regular-file member: 512-byte ustar header + data + padding.
    * `breakChecksum` stores a deliberately wrong checksum (fixture for
    * the quarantine path). */
  def encodeMember(name: String, data: Array[Byte],
                   breakChecksum: Boolean = false): Array[Byte] = {
    require(name.length < 100, s"name '$name' exceeds the 100-byte field")
    val h = new Array[Byte](512)
    put(h, 0, name)
    System.arraycopy(octal(420, 8), 0, h, 100, 8) // mode 0644
    System.arraycopy(octal(0, 8), 0, h, 108, 8) // uid
    System.arraycopy(octal(0, 8), 0, h, 116, 8) // gid
    System.arraycopy(octal(data.length.toLong, 12), 0, h, 124, 12)
    System.arraycopy(octal(0, 12), 0, h, 136, 12) // mtime
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum = spaces for the sum
    h(156) = '0' // typeflag: regular file
    put(h, 257, "ustar")
    put(h, 263, "00")
    var sum = 0L
    (0 until 512).foreach(i => sum += h(i) & 0xFF)
    if (breakChecksum) sum += 1
    val c = octal(sum, 7) // six digits + NUL
    System.arraycopy(c, 0, h, 148, 7)
    h(155) = ' '.toByte
    val padded = (data.length + 511) / 512 * 512
    val out = new Array[Byte](512 + padded)
    System.arraycopy(h, 0, out, 0, 512)
    System.arraycopy(data, 0, out, 512, data.length)
    out
  }

  /** The end-of-archive marker: two zero blocks. */
  def trailer: Array[Byte] = new Array[Byte](1024)

  private def parseOctal(b: Array[Byte], off: Int, len: Int): Long = {
    var i = off
    val end = off + len
    while (i < end && b(i) == ' ') i += 1
    require(i < end && b(i) >= '0' && b(i) <= '7',
      s"numeric field at $off: no octal digits")
    var v = 0L
    while (i < end && b(i) >= '0' && b(i) <= '7') {
      v = v * 8 + (b(i) - '0'); i += 1
    }
    require(i >= end || b(i) == 0 || b(i) == ' ',
      s"numeric field at $off: trailing garbage")
    v
  }

  def walk(buf: Array[Byte]): Seq[Member] = {
    val out = Seq.newBuilder[Member]
    var off = 0
    var ended = false
    while (!ended) {
      require(buf.length - off >= 512, s"truncated header block at $off")
      if ((off until off + 512).forall(buf(_) == 0)) {
        require(buf.length - off >= 1024 &&
          (off + 512 until off + 1024).forall(buf(_) == 0),
          s"end-of-archive at $off: second zero block missing")
        require((off + 1024 until buf.length).forall(buf(_) == 0),
          s"data after the end-of-archive marker at ${off + 1024}")
        ended = true
      } else {
        require(buf(off + 257) == 'u' && buf(off + 258) == 's' &&
          buf(off + 259) == 't' && buf(off + 260) == 'a' &&
          buf(off + 261) == 'r',
          s"header at $off: bad ustar magic")
        val size = parseOctal(buf, off + 124, 12)
        var sum = 0L
        (0 until 512).foreach { i =>
          sum += (if (i >= 148 && i < 156) ' '.toByte else buf(off + i)) & 0xFF
        }
        val stored = parseOctal(buf, off + 148, 8)
        var nameEnd = off
        while (nameEnd < off + 100 && buf(nameEnd) != 0) nameEnd += 1
        val name = new String(buf, off, nameEnd - off, "US-ASCII")
        val advance = 512L + (size + 511) / 512 * 512
        require(off + advance <= buf.length,
          s"member '$name' at $off: size $size runs past the buffer")
        out += Member(name, size, stored == sum)
        off += advance.toInt
      }
    }
    out.result()
  }
}
