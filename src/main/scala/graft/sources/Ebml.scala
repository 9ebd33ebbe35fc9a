package graft.sources

/** From-spec EBML / Matroska container walk — RFC 8794 (EBML) + the
  * Matroska element registry: the video-corpus bookkeeping pass that
  * runs at ingest scale WITHOUT a codec.
  *
  * EBML frames every element as `ID varint, size varint, payload`.
  * Varints carry their length in the leading-zero count of the first
  * byte; element IDs keep the marker bit (1–4 bytes), data sizes strip
  * it (1–8 bytes), and a size whose value bits are ALL ones means
  * "unknown size — extends to the end of the enclosing scope", legal
  * here only for the Segment (the element Matroska declares
  * unknown-sizeable and streams in practice). Size encodings may be
  * longer than minimal (RFC 8794 §6.1) — this fixture uses uniform
  * 2-byte sizes so the byte books are closed-form replayable.
  *
  * The walk books element/cluster/block counts, the last cluster
  * timestamp, and SimpleBlock payload volume; unknown element IDs are
  * skipped with their framing validated (§11.2 mandates readers skip
  * unknown elements), while malformed framing — a 0x00 varint lead
  * byte, an element running past its parent, an unknown size anywhere
  * but the Segment — rejects loudly. */
object Ebml {

  val IdEbml = 0x1A45DFA3L
  val IdEbmlVersion = 0x4286L
  val IdDocType = 0x4282L
  val IdSegment = 0x18538067L
  val IdInfo = 0x1549A966L
  val IdTimestampScale = 0x2AD7B1L
  val IdCluster = 0x1F43B675L
  val IdTimestamp = 0xE7L
  val IdSimpleBlock = 0xA3L

  final case class Cluster(timestamp: Long, blockPayloads: Seq[Int])

  private def idBytes(id: Long): Array[Byte] = {
    val len = if (id <= 0xFF) 1 else if (id <= 0xFFFF) 2
      else if (id <= 0xFFFFFF) 3 else 4
    Array.tabulate(len)(i => ((id >>> (8 * (len - 1 - i))) & 0xFF).toByte)
  }

  /** Uniform 2-byte size encoding: 0x40 marker + 14 value bits. */
  private def size2(n: Int): Array[Byte] = {
    require(n >= 0 && n < 0x3FFF, s"fixture size $n exceeds 2-byte varint")
    Array((0x40 | (n >>> 8)).toByte, (n & 0xFF).toByte)
  }

  private def be32(v: Long): Array[Byte] =
    Array(((v >>> 24) & 0xFF).toByte, ((v >>> 16) & 0xFF).toByte,
      ((v >>> 8) & 0xFF).toByte, (v & 0xFF).toByte)

  private def el(id: Long, payload: Array[Byte]): Array[Byte] =
    idBytes(id) ++ size2(payload.length) ++ payload

  /** Deterministic fixture encoder. `unknownSegmentSize` frames the
    * Segment with the 1-byte all-ones varint (0xFF = unknown size). */
  def encode(clusters: Seq[Cluster], unknownSegmentSize: Boolean): Array[Byte] = {
    val header = el(IdEbml,
      el(IdEbmlVersion, Array(1.toByte)) ++
        el(IdDocType, "matroska".getBytes("US-ASCII")))
    val info = el(IdInfo, el(IdTimestampScale, be32(1000000L)))
    val body = clusters.map { c =>
      val blocks = c.blockPayloads.zipWithIndex.map { case (db, b) =>
        val data = Array(0x81.toByte, // track 1 as a 1-byte varint
          ((b >>> 8) & 0xFF).toByte, (b & 0xFF).toByte, // relative timestamp
          0x80.toByte) ++ // keyframe flag
          Array.tabulate(db)(i => ((i * 19 + b * 7 + 3) & 0xFF).toByte)
        el(IdSimpleBlock, data)
      }
      el(IdCluster,
        el(IdTimestamp, be32(c.timestamp)) ++ blocks.flatten.toArray)
    }
    val segPayload = info ++ body.flatten.toArray
    val segment =
      if (unknownSegmentSize) idBytes(IdSegment) ++ Array(0xFF.toByte) ++ segPayload
      else el(IdSegment, segPayload)
    header ++ segment
  }

  final case class Books(nElements: Long, nClusters: Long, nBlocks: Long,
                         lastClusterTs: Long, blockBytes: Long, nBytes: Long)

  /** (value, bytesConsumed); IDs keep the marker bit. */
  private def readId(b: Array[Byte], off: Int, end: Int): (Long, Int) = {
    require(off < end, s"truncated element ID at $off")
    val f = b(off) & 0xFF
    require(f != 0, s"element ID at $off: 0x00 lead byte")
    val len =
      if ((f & 0x80) != 0) 1 else if ((f & 0x40) != 0) 2
      else if ((f & 0x20) != 0) 3 else if ((f & 0x10) != 0) 4
      else throw new IllegalArgumentException(s"element ID at $off: over 4 bytes")
    require(off + len <= end, s"truncated element ID at $off")
    var v = 0L
    (0 until len).foreach(i => v = (v << 8) | (b(off + i) & 0xFFL))
    (v, len)
  }

  /** Marker-stripped varint (value, bytesConsumed). */
  private def readVint(b: Array[Byte], off: Int, end: Int): (Long, Int) = {
    require(off < end, s"truncated size varint at $off")
    val f = b(off) & 0xFF
    require(f != 0, s"size varint at $off: 0x00 lead byte")
    var len = 1
    while ((f & (0x100 >>> len)) == 0) len += 1
    require(off + len <= end, s"truncated size varint at $off")
    var v = (f & (0xFF >>> len)).toLong
    (1 until len).foreach(i => v = (v << 8) | (b(off + i) & 0xFFL))
    (v, len)
  }

  /** (size or -1 for unknown, bytesConsumed). The all-value-bits-ones
    * "unknown" escape applies ONLY to element data sizes (RFC 8794
    * §6.2) — block track numbers use the raw [[readVint]], where
    * track 127 legitimately encodes as the all-ones byte 0xFF. */
  private def readSize(b: Array[Byte], off: Int, end: Int): (Long, Int) = {
    val (v, len) = readVint(b, off, end)
    val allOnes = (1L << (7 * len)) - 1
    (if (v == allOnes) -1L else v, len)
  }

  private def beUint(b: Array[Byte], off: Int, len: Int): Long = {
    require(len >= 1 && len <= 8, s"uint at $off: $len bytes")
    var v = 0L
    (0 until len).foreach(i => v = (v << 8) | (b(off + i) & 0xFFL))
    v
  }

  private final class State {
    var nElements = 0L
    var nClusters = 0L
    var nBlocks = 0L
    var lastClusterTs = -1L
    var blockBytes = 0L
    var docType: String = null
    var timestampScale = -1L
    var segments = 0
  }

  private def walk(b: Array[Byte], off0: Int, end: Int, topLevel: Boolean,
                   st: State): Unit = {
    var off = off0
    while (off < end) {
      val (id, idLen) = readId(b, off, end)
      val (sz, szLen) = readSize(b, off + idLen, end)
      val pOff = off + idLen + szLen
      val pEnd =
        if (sz < 0) {
          require(id == IdSegment,
            f"element 0x$id%X at $off: unknown size outside the Segment")
          require(topLevel, s"Segment at $off: not at the top level")
          end
        } else {
          require(pOff + sz <= end,
            f"element 0x$id%X at $off: size $sz runs past the scope end $end")
          pOff + sz.toInt
        }
      st.nElements += 1
      id match {
        case IdEbml => walk(b, pOff, pEnd, topLevel = false, st)
        case IdSegment =>
          require(topLevel, s"Segment at $off: not at the top level")
          st.segments += 1
          require(st.segments == 1, s"duplicate Segment at $off")
          walk(b, pOff, pEnd, topLevel = false, st)
        case IdInfo | IdCluster =>
          if (id == IdCluster) st.nClusters += 1
          walk(b, pOff, pEnd, topLevel = false, st)
        case IdDocType =>
          require(st.docType == null, s"duplicate DocType at $off")
          st.docType = new String(b, pOff, pEnd - pOff, "US-ASCII")
        case IdEbmlVersion =>
          require(beUint(b, pOff, pEnd - pOff) == 1L,
            s"EBMLVersion at $off: unsupported version")
        case IdTimestampScale =>
          st.timestampScale = beUint(b, pOff, pEnd - pOff)
        case IdTimestamp =>
          st.lastClusterTs = beUint(b, pOff, pEnd - pOff)
        case IdSimpleBlock =>
          val (track, tLen) = readVint(b, pOff, pEnd) // no "unknown" escape
          require(track >= 1, s"SimpleBlock at $off: track $track")
          require(pEnd - pOff >= tLen + 3,
            s"SimpleBlock at $off: truncated header")
          st.nBlocks += 1
          st.blockBytes += (pEnd - pOff - tLen - 3).toLong
        case _ => () // unknown element: framing validated above, skipped
      }
      off = pEnd
    }
  }

  def parse(bytes: Array[Byte]): Books = {
    val st = new State
    walk(bytes, 0, bytes.length, topLevel = true, st)
    require(st.docType == "matroska", s"DocType '${st.docType}' is not matroska")
    require(st.segments == 1, "no Segment element")
    require(st.timestampScale > 0, "no TimestampScale")
    Books(st.nElements, st.nClusters, st.nBlocks, st.lastClusterTs,
      st.blockBytes, bytes.length.toLong)
  }
}
