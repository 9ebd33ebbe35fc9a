package graft.sources

import java.nio.ByteBuffer

/** From-spec ISO Base Media File Format (MP4) box walk — ISO/IEC
  * 14496-12: the video-corpus bookkeeping pass that runs at ingest
  * scale WITHOUT touching a codec. Every box is `size(4) type(4)
  * payload`, big-endian; `size == 1` promotes to a 64-bit `largesize`
  * after the type; `size == 0` means "to end of file" and is legal
  * only for the LAST top-level box (§4.2). Containers (`moov`,
  * `trak`, `mdia`) nest plain boxes; full boxes (`mvhd`, `tkhd`,
  * `mdhd`, `hdlr`) carry version+flags, with version 1 widening the
  * time fields to 64 bits.
  *
  * The walk extracts the books a 100 TB media ingest keeps per file:
  * box count, movie timescale + duration (exact-integer ms), track
  * count split by handler type (`vide`/`soun`), `mdat` payload bytes.
  * Unknown box types are SKIPPED (the spec mandates readers ignore
  * boxes they don't know, §4.2) but their framing is still validated;
  * malformed framing — size under 8, a box running past its parent,
  * a truncated largesize, `size == 0` anywhere but the top-level tail
  * — rejects loudly: a books pass must balance exactly. */
object Mp4 {

  final case class Books(nBoxes: Long, timescale: Long, durationMs: Long,
                         nVideo: Long, nAudio: Long, mdatBytes: Long,
                         nBytes: Long)

  private def be32(v: Long): Array[Byte] =
    Array(((v >>> 24) & 0xFF).toByte, ((v >>> 16) & 0xFF).toByte,
      ((v >>> 8) & 0xFF).toByte, (v & 0xFF).toByte)

  private def fourcc(s: String): Array[Byte] = {
    require(s.length == 4, "fourcc")
    s.getBytes("US-ASCII")
  }

  private def box(typ: String, payload: Array[Byte]*): Array[Byte] = {
    val total = 8 + payload.map(_.length).sum
    val b = ByteBuffer.allocate(total)
    b.put(be32(total)).put(fourcc(typ))
    payload.foreach(b.put)
    b.array()
  }

  /** mvhd version 0 (100-byte payload): creation/modification zeroed,
    * rate 0x00010000, volume 0x0100, identity matrix, next_track_id. */
  private def mvhd(timescale: Long, duration: Long, nextTrack: Long): Array[Byte] = {
    val p = ByteBuffer.allocate(100)
    p.put(be32(0)) // version 0, flags 0
    p.put(be32(0)).put(be32(0)) // creation, modification
    p.put(be32(timescale)).put(be32(duration))
    p.put(be32(0x00010000L)) // rate 1.0
    p.put(Array(0x01.toByte, 0x00.toByte, 0x00.toByte, 0x00.toByte)) // volume + reserved
    p.put(new Array[Byte](8)) // reserved
    // identity matrix: 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000
    p.put(be32(0x10000L)).put(be32(0)).put(be32(0))
    p.put(be32(0)).put(be32(0x10000L)).put(be32(0))
    p.put(be32(0)).put(be32(0)).put(be32(0x40000000L))
    p.put(new Array[Byte](24)) // pre_defined
    p.put(be32(nextTrack))
    box("mvhd", p.array())
  }

  /** tkhd version 0 (84-byte payload), flags 7 (enabled|in-movie|in-preview). */
  private def tkhd(trackId: Long, duration: Long): Array[Byte] = {
    val p = ByteBuffer.allocate(84)
    p.put(Array(0.toByte, 0.toByte, 0.toByte, 7.toByte))
    p.put(be32(0)).put(be32(0)) // creation, modification
    p.put(be32(trackId)).put(be32(0)) // track id + reserved
    p.put(be32(duration))
    p.put(new Array[Byte](8)) // reserved
    p.put(new Array[Byte](8)) // layer/group + volume/reserved
    p.put(be32(0x10000L)).put(be32(0)).put(be32(0))
    p.put(be32(0)).put(be32(0x10000L)).put(be32(0))
    p.put(be32(0)).put(be32(0)).put(be32(0x40000000L))
    p.put(be32(0)).put(be32(0)) // width, height (fixed 16.16; 0 for audio)
    box("tkhd", p.array())
  }

  /** mdhd version 0 (24-byte payload): media timescale/duration,
    * language 'und' packed 5-bit (0x55C4). */
  private def mdhd(timescale: Long, duration: Long): Array[Byte] = {
    val p = ByteBuffer.allocate(24)
    p.put(be32(0))
    p.put(be32(0)).put(be32(0))
    p.put(be32(timescale)).put(be32(duration))
    p.put(Array(0x55.toByte, 0xC4.toByte, 0.toByte, 0.toByte))
    box("mdhd", p.array())
  }

  /** hdlr (25-byte payload): handler_type fourcc + empty NUL name. */
  private def hdlr(handler: String): Array[Byte] = {
    val p = ByteBuffer.allocate(25)
    p.put(be32(0)).put(be32(0)) // version/flags, pre_defined
    p.put(fourcc(handler))
    p.put(new Array[Byte](12)) // reserved
    p.put(0.toByte) // name = ""
    box("hdlr", p.array())
  }

  /** Fixed per-file layout constants the oracle replays:
    * ftyp 24 B; mvhd 108 B; per track: trak = 8 + tkhd 92 + mdia
    * (8 + mdhd 32 + hdlr 33) = 173 B. */
  val FtypBytes = 24
  val MvhdBytes = 108
  val TrakBytes = 173

  /** Deterministic fixture encoder. Tracks alternate vide/soun starting
    * at vide. `mdatMode`: 0 = plain 32-bit size, 1 = 64-bit largesize,
    * 2 = size 0 (to end of file). `freePayload < 0` omits the free box. */
  def encode(timescale: Long, duration: Long, nTracks: Int,
             freePayload: Int, mdatPayload: Int, mdatMode: Int): Array[Byte] = {
    require(nTracks >= 1 && mdatPayload >= 0 && mdatMode >= 0 && mdatMode <= 2)
    val ftyp = box("ftyp", fourcc("isom"), be32(0x200),
      fourcc("isom"), fourcc("mp41"))
    val traks = (1 to nTracks).map { t =>
      val h = if (t % 2 == 1) "vide" else "soun"
      box("trak", tkhd(t.toLong, duration),
        box("mdia", mdhd(timescale, duration), hdlr(h)))
    }
    val moov = box("moov",
      (mvhd(timescale, duration, nTracks + 1L) +: traks): _*)
    val free =
      if (freePayload < 0) Array.emptyByteArray
      else box("free", Array.tabulate(freePayload)(i => ((i * 29 + 3) & 0xFF).toByte))
    val fill = Array.tabulate(mdatPayload)(i => ((i * 13 + 5) & 0xFF).toByte)
    val mdat = mdatMode match {
      case 0 => box("mdat", fill)
      case 1 => // size = 1, then 64-bit largesize after the type
        val b = ByteBuffer.allocate(16 + mdatPayload)
        b.put(be32(1)).put(fourcc("mdat"))
        b.putLong(16L + mdatPayload).put(fill)
        b.array()
      case _ => // size = 0: to end of file (must be the last box)
        val b = ByteBuffer.allocate(8 + mdatPayload)
        b.put(be32(0)).put(fourcc("mdat")).put(fill)
        b.array()
    }
    ftyp ++ moov ++ free ++ mdat
  }

  private val Containers = Set("moov", "trak", "mdia", "minf", "stbl", "edts")

  private def u32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xFFL) << 24) | ((b(off + 1) & 0xFFL) << 16) |
      ((b(off + 2) & 0xFFL) << 8) | (b(off + 3) & 0xFFL)

  private def u64(b: Array[Byte], off: Int): Long = {
    val v = (u32(b, off) << 32) | u32(b, off + 4)
    require(v >= 0, s"box at $off: largesize overflows signed 64-bit")
    v
  }

  private final class State {
    var nBoxes = 0L
    var timescale = -1L
    var duration = -1L
    var nVideo = 0L
    var nAudio = 0L
    var mdatBytes = 0L
  }

  /** Walk one box scope `[off, end)`; `topLevel` gates `size == 0`. */
  private def walk(b: Array[Byte], off0: Int, end: Int, topLevel: Boolean,
                   st: State): Unit = {
    var off = off0
    while (off < end) {
      require(end - off >= 8, s"truncated box header at $off")
      val size0 = u32(b, off)
      val typ = new String(b, off + 4, 4, "US-ASCII")
      var hdr = 8
      val size: Long =
        if (size0 == 1) {
          require(end - off >= 16, s"box '$typ' at $off: truncated largesize")
          hdr = 16
          u64(b, off + 8)
        } else if (size0 == 0) {
          require(topLevel, s"box '$typ' at $off: size 0 outside the top level")
          (end - off).toLong
        } else size0
      require(size >= hdr, s"box '$typ' at $off: size $size under the $hdr-byte header")
      require(off + size <= end, s"box '$typ' at $off: size $size runs past the scope end $end")
      if (size0 == 0)
        require(off + size == end, s"box '$typ' at $off: size 0 must reach end of file")
      st.nBoxes += 1
      val pOff = off + hdr
      val pEnd = off + size.toInt
      typ match {
        case t if Containers(t) => walk(b, pOff, pEnd, topLevel = false, st)
        case "mvhd" =>
          require(st.timescale < 0, s"duplicate mvhd at $off")
          val ver = b(pOff) & 0xFF
          // all-ones duration is the spec's "unknown" sentinel (§8.2.1,
          // fragmented movies) — booked as -1, never as a real duration
          if (ver == 0) {
            require(pEnd - pOff >= 100, s"mvhd at $off: short v0 payload")
            st.timescale = u32(b, pOff + 12)
            val d = u32(b, pOff + 16)
            st.duration = if (d == 0xFFFFFFFFL) -1L else d
          } else if (ver == 1) {
            require(pEnd - pOff >= 112, s"mvhd at $off: short v1 payload")
            st.timescale = u32(b, pOff + 20)
            val at = pOff + 24
            if ((0 until 8).forall(i => b(at + i) == -1)) st.duration = -1L
            else {
              st.duration = u64(b, at)
              require(st.duration <= Long.MaxValue / 1000,
                s"mvhd at $off: duration ${st.duration} overflows ms arithmetic")
            }
          } else throw new IllegalArgumentException(s"mvhd at $off: version $ver")
          require(st.timescale > 0, s"mvhd at $off: zero timescale")
        case "hdlr" =>
          require(pEnd - pOff >= 24, s"hdlr at $off: short payload")
          new String(b, pOff + 8, 4, "US-ASCII") match {
            case "vide" => st.nVideo += 1
            case "soun" => st.nAudio += 1
            case _ => () // other handler types are legal, just not booked
          }
        case "mdat" => st.mdatBytes += (size - hdr)
        case _ => () // unknown box: framing validated above, content skipped
      }
      off += size.toInt
    }
  }

  def parse(bytes: Array[Byte]): Books = {
    val st = new State
    walk(bytes, 0, bytes.length, topLevel = true, st)
    require(st.timescale > 0, "no mvhd box — not a movie file")
    Books(st.nBoxes, st.timescale,
      if (st.duration < 0) -1L else st.duration * 1000L / st.timescale,
      st.nVideo, st.nAudio, st.mdatBytes, bytes.length.toLong)
  }
}
