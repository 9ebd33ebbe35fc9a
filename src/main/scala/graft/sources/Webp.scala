package graft.sources

/** From-spec WebP container walk — RFC 9649 (WebP) over RIFC/RIFF
  * framing, with the three stored-image shapes: simple lossy ("VP8 ",
  * key-frame header per RFC 6386 §9.1), simple lossless ("VP8L",
  * 0x2F signature + 14-bit dimensions), and extended ("VP8X" canvas +
  * "ANIM"/"ANMF" animation frames, each embedding a bitstream chunk).
  *
  * RIFF grammar: "RIFF" + LE32 (file size − 8) + "WEBP", then chunks
  * of `fourcc, LE32 size, payload, pad byte if size is odd`. The walk
  * books the variant, canvas dimensions, alpha flag, chunk/frame
  * counts and byte volume — the image-corpus bookkeeping pass that
  * runs at ingest scale WITHOUT entropy-decoding a single macroblock.
  * Unknown chunks are skipped with framing validated; malformed
  * framing (RIFF size mismatch, truncated chunk, bad VP8 start code /
  * VP8L signature / VP8L version, an animation frame overflowing the
  * canvas) rejects loudly — a books pass must balance exactly. */
object Webp {

  final case class Books(variant: String, width: Long, height: Long,
                         hasAlpha: Long, nChunks: Long, nFrames: Long,
                         nBytes: Long)

  private def le32(v: Long): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >>> 8) & 0xFF).toByte,
      ((v >>> 16) & 0xFF).toByte, ((v >>> 24) & 0xFF).toByte)

  private def le24(v: Long): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >>> 8) & 0xFF).toByte,
      ((v >>> 16) & 0xFF).toByte)

  private def chunk(fourcc: String, payload: Array[Byte]): Array[Byte] = {
    val pad = if (payload.length % 2 == 1) Array(0.toByte) else Array.emptyByteArray
    fourcc.getBytes("US-ASCII") ++ le32(payload.length.toLong) ++ payload ++ pad
  }

  /** VP8 key-frame header (RFC 6386 §9.1): 24-bit LE frame tag
    * (frame_type 0 = key, version, show_frame, 19-bit first-partition
    * size), 0x9D012A start code, 14-bit width/height with 2-bit
    * scale fields — followed here by `junk` partition bytes. */
  private def vp8Payload(w: Int, h: Int, junk: Int): Array[Byte] = {
    val tag = (junk.toLong << 5) | (1L << 4) // show_frame, version 0, key
    le24(tag) ++ Array(0x9D.toByte, 0x01.toByte, 0x2A.toByte) ++
      Array((w & 0xFF).toByte, ((w >>> 8) & 0x3F).toByte,
        (h & 0xFF).toByte, ((h >>> 8) & 0x3F).toByte) ++
      Array.tabulate(junk)(i => ((i * 23 + 9) & 0xFF).toByte)
  }

  /** VP8L header (RFC 9649 §3): 0x2F signature, then a LE32 bit-packed
    * field of width−1 (14 bits), height−1 (14 bits), alpha (1), and a
    * 3-bit version that MUST be 0. */
  private def vp8lPayload(w: Int, h: Int, alpha: Boolean, junk: Int): Array[Byte] = {
    val bits = (w - 1).toLong | ((h - 1).toLong << 14) |
      (if (alpha) 1L << 28 else 0L)
    Array(0x2F.toByte) ++ le32(bits) ++
      Array.tabulate(junk)(i => ((i * 31 + 5) & 0xFF).toByte)
  }

  /** Deterministic fixture encoder. `variant`: 0 = simple lossy,
    * 1 = simple lossless, 2 = extended animation with `nFrames`
    * full-canvas VP8L frames; `junk(f)` sizes the trailing partition
    * bytes so odd chunk sizes exercise the pad rule. */
  def encode(variant: Int, w: Int, h: Int, alpha: Boolean, nFrames: Int,
             junk: Int => Int): Array[Byte] = {
    require(w >= 1 && w <= 0x4000 && h >= 1 && h <= 0x4000, "14-bit dims")
    val body: Array[Byte] = variant match {
      case 0 => chunk("VP8 ", vp8Payload(w, h, junk(0)))
      case 1 => chunk("VP8L", vp8lPayload(w, h, alpha, junk(0)))
      case 2 =>
        val flags = 0x02 | (if (alpha) 0x10 else 0) // animation | alpha
        val vp8x = chunk("VP8X",
          Array[Byte](flags.toByte, 0, 0, 0) ++ le24(w - 1L) ++ le24(h - 1L))
        val anim = chunk("ANIM", le32(0xFF000000L) ++ Array[Byte](0, 0))
        val frames = (0 until nFrames).flatMap { f =>
          val inner = chunk("VP8L", vp8lPayload(w, h, alpha, junk(f)))
          chunk("ANMF", le24(0) ++ le24(0) ++ le24(w - 1L) ++ le24(h - 1L) ++
            le24(100) ++ Array(0.toByte) ++ inner)
        }.toArray
        vp8x ++ anim ++ frames
      case _ => throw new IllegalArgumentException(s"variant $variant")
    }
    "RIFF".getBytes("US-ASCII") ++ le32(body.length + 4L) ++
      "WEBP".getBytes("US-ASCII") ++ body
  }

  private def rle32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xFFL) | ((b(off + 1) & 0xFFL) << 8) |
      ((b(off + 2) & 0xFFL) << 16) | ((b(off + 3) & 0xFFL) << 24)

  private def rle24(b: Array[Byte], off: Int): Long =
    (b(off) & 0xFFL) | ((b(off + 1) & 0xFFL) << 8) | ((b(off + 2) & 0xFFL) << 16)

  private final class State {
    var variant: String = null
    var width = -1L
    var height = -1L
    var alpha = 0L
    var nChunks = 0L
    var nFrames = 0L
  }

  private def parseVp8(b: Array[Byte], off: Int, end: Int): (Long, Long) = {
    require(end - off >= 10, s"VP8 chunk at $off: short key-frame header")
    val tag = rle24(b, off)
    require((tag & 0x1) == 0, s"VP8 chunk at $off: not a key frame")
    val partSize = tag >>> 5
    require((b(off + 3) & 0xFF) == 0x9D && (b(off + 4) & 0xFF) == 0x01 &&
      (b(off + 5) & 0xFF) == 0x2A, s"VP8 chunk at $off: bad start code")
    require(partSize <= end - off - 10,
      s"VP8 chunk at $off: first partition $partSize runs past the chunk")
    val w = rle32(b, off + 6) & 0x3FFF
    val h = (rle32(b, off + 6) >>> 16) & 0x3FFF
    (w, h)
  }

  private def parseVp8l(b: Array[Byte], off: Int, end: Int): (Long, Long, Long) = {
    require(end - off >= 5, s"VP8L chunk at $off: short header")
    require((b(off) & 0xFF) == 0x2F, s"VP8L chunk at $off: bad signature")
    val bits = rle32(b, off + 1)
    require(((bits >>> 29) & 0x7) == 0, s"VP8L chunk at $off: nonzero version")
    ((bits & 0x3FFF) + 1, ((bits >>> 14) & 0x3FFF) + 1, (bits >>> 28) & 0x1)
  }

  /** Walk one chunk scope; returns the offset after the last chunk. */
  private def walkChunks(b: Array[Byte], off0: Int, end: Int, inAnmf: Boolean,
                         st: State): Unit = {
    var off = off0
    while (off < end) {
      require(end - off >= 8, s"truncated chunk header at $off")
      val fourcc = new String(b, off, 4, "US-ASCII")
      val size = rle32(b, off + 4)
      val pOff = off + 8
      require(pOff + size <= end,
        s"chunk '$fourcc' at $off: size $size runs past the scope end $end")
      val pEnd = pOff + size.toInt
      st.nChunks += 1
      fourcc match {
        case "VP8 " =>
          val (w, h) = parseVp8(b, pOff, pEnd)
          if (inAnmf) st.nFrames += 1
          else {
            require(st.variant == null, s"second image chunk at $off")
            st.variant = "vp8"; st.width = w; st.height = h; st.nFrames = 1
          }
        case "VP8L" =>
          val (w, h, a) = parseVp8l(b, pOff, pEnd)
          if (inAnmf) st.nFrames += 1
          else {
            require(st.variant == null, s"second image chunk at $off")
            st.variant = "vp8l"; st.width = w; st.height = h
            st.alpha = a; st.nFrames = 1
          }
        case "VP8X" =>
          require(st.variant == null, s"VP8X at $off after an image chunk")
          require(size == 10, s"VP8X at $off: size $size, expected 10")
          st.variant = "vp8x"
          st.alpha = if ((b(pOff) & 0x10) != 0) 1L else 0L
          st.width = rle24(b, pOff + 4) + 1
          st.height = rle24(b, pOff + 7) + 1
        case "ANMF" =>
          require(st.variant == "vp8x", s"ANMF at $off without VP8X")
          require(size >= 16, s"ANMF at $off: short frame header")
          val fw = rle24(b, pOff + 6) + 1
          val fh = rle24(b, pOff + 9) + 1
          val fx = rle24(b, pOff) * 2
          val fy = rle24(b, pOff + 3) * 2
          require(fx + fw <= st.width && fy + fh <= st.height,
            s"ANMF at $off: frame ${fw}x$fh+$fx+$fy overflows the " +
              s"${st.width}x${st.height} canvas")
          walkChunks(b, pOff + 16, pEnd, inAnmf = true, st)
        case _ => () // ANIM, ICCP, EXIF, XMP, unknown: framing validated
      }
      off = pEnd + (size % 2).toInt // odd chunks carry a pad byte
    }
    require(off == end, s"chunk walk overran: $off past $end")
  }

  def parse(bytes: Array[Byte]): Books = {
    require(bytes.length >= 12, "short RIFF header")
    require(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' &&
      bytes(3) == 'F', "bad RIFF magic")
    require(new String(bytes, 8, 4, "US-ASCII") == "WEBP", "not a WEBP form")
    val declared = rle32(bytes, 4)
    require(declared + 8 == bytes.length,
      s"RIFF size $declared + 8 != ${bytes.length}")
    val st = new State
    walkChunks(bytes, 12, bytes.length, inAnmf = false, st)
    require(st.variant != null, "no image chunk")
    Books(st.variant, st.width, st.height, st.alpha, st.nChunks, st.nFrames,
      bytes.length.toLong)
  }
}
