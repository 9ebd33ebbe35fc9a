package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

/** AVI (RIFF) container with an MJPEG video stream, written from the
  * public container layout (Microsoft's AVI RIFF form: `RIFF('AVI '
  * LIST('hdrl' avih LIST('strl' strh strf)) LIST('movi' 00dc...)
  * idx1)`). MJPEG-in-AVI is the honest "real video" target here: each
  * `00dc` chunk is a complete baseline JPEG, so the per-frame decode
  * rides the existing from-spec [[Jpeg]] (ITU T.81) machinery and the
  * container layer is the same chunk-walk family as the WAV reader in
  * [[MediaCodec]].
  *
  * The decoder is strict about what it reads: chunk sizes are bounds-
  * checked (payloads are untrusted opaque columns), the stream must
  * declare `vids`/`MJPG`, the frame count must agree between `avih`,
  * `strh` and the actual `movi` walk, frame geometry must match `strf`,
  * and when an `idx1` index is present every entry is verified against
  * the discovered chunk offsets (accepting both index conventions found
  * in the wild: offsets relative to the `movi` fourcc, and absolute
  * file offsets).
  *
  * The reference engine has no media path; this backs the multimodal
  * video operators (m07/m13-style features over a container that exists
  * in the wild — m27). No counterpart file to cite.
  */
object Avi {

  final case class Video(width: Int, height: Int, fps: Int,
                         frames: IndexedSeq[MediaCodec.Image])

  // ------------------------------------------------------------ encode

  private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  private def u32(v: Long): Array[Byte] = {
    val b = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
    b.putInt((v & 0xFFFFFFFFL).toInt)
    b.array()
  }

  private def u16(v: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(2).order(ByteOrder.LITTLE_ENDIAN)
    b.putShort(v.toShort)
    b.array()
  }

  /** Encode pre-compressed JPEG frames as a canonical AVI: `hdrl` with
    * avih + one `vids/MJPG` stream, a `movi` list of `00dc` chunks
    * (2-byte aligned, as the RIFF spec requires), and an `idx1` index
    * with movi-relative offsets and AVIIF_KEYFRAME on every frame
    * (MJPEG frames are all intra-coded). */
  def encodeMjpeg(frames: Seq[Array[Byte]], w: Int, h: Int, fps: Int)
      : Array[Byte] = {
    require(fps > 0, "fps must be positive")
    val n = frames.length
    val maxFrame = if (n == 0) 0 else frames.map(_.length).max
    val avih = fourcc("avih") ++ u32(56) ++
      u32(1000000L / fps) ++ // dwMicroSecPerFrame
      u32(0) ++ // dwMaxBytesPerSec
      u32(0) ++ // dwPaddingGranularity
      u32(0x10) ++ // dwFlags = AVIF_HASINDEX
      u32(n) ++ // dwTotalFrames
      u32(0) ++ // dwInitialFrames
      u32(1) ++ // dwStreams
      u32(maxFrame) ++ // dwSuggestedBufferSize
      u32(w) ++ u32(h) ++
      u32(0) ++ u32(0) ++ u32(0) ++ u32(0) // dwReserved[4]
    val strh = fourcc("strh") ++ u32(56) ++
      fourcc("vids") ++ fourcc("MJPG") ++
      u32(0) ++ // dwFlags
      u16(0) ++ u16(0) ++ // wPriority, wLanguage
      u32(0) ++ // dwInitialFrames
      u32(1) ++ // dwScale
      u32(fps) ++ // dwRate (fps = rate/scale)
      u32(0) ++ // dwStart
      u32(n) ++ // dwLength (in frames)
      u32(maxFrame) ++ // dwSuggestedBufferSize
      u32(0xFFFFFFFFL) ++ // dwQuality = -1 (default)
      u32(0) ++ // dwSampleSize (0: varying-size samples)
      u16(0) ++ u16(0) ++ u16(w) ++ u16(h) // rcFrame
    val strf = fourcc("strf") ++ u32(40) ++
      u32(40) ++ u32(w) ++ u32(h) ++ // biSize, biWidth, biHeight
      u16(1) ++ u16(24) ++ // biPlanes, biBitCount
      fourcc("MJPG") ++ // biCompression
      u32(w.toLong * h * 3) ++ // biSizeImage
      u32(0) ++ u32(0) ++ u32(0) ++ u32(0) // ppm/clr fields
    val strl = fourcc("LIST") ++ u32(4 + strh.length + strf.length) ++
      fourcc("strl") ++ strh ++ strf
    val hdrl = fourcc("LIST") ++ u32(4 + avih.length + strl.length) ++
      fourcc("hdrl") ++ avih ++ strl
    // movi list + idx1 offsets (relative to the 'movi' fourcc)
    val movi = new ByteArrayOutputStream()
    val idx = new ByteArrayOutputStream()
    var rel = 4 // first chunk starts right after the 'movi' fourcc
    frames.foreach { f =>
      movi.write(fourcc("00dc"))
      movi.write(u32(f.length))
      movi.write(f)
      if ((f.length & 1) == 1) movi.write(0) // RIFF 2-byte alignment
      idx.write(fourcc("00dc"))
      idx.write(u32(0x10)) // AVIIF_KEYFRAME
      idx.write(u32(rel))
      idx.write(u32(f.length))
      rel += 8 + f.length + (f.length & 1)
    }
    val moviBytes = movi.toByteArray
    val idxBytes = idx.toByteArray
    val listMovi = fourcc("LIST") ++ u32(4 + moviBytes.length) ++
      fourcc("movi") ++ moviBytes
    val idx1 = fourcc("idx1") ++ u32(idxBytes.length) ++ idxBytes
    val body = hdrl ++ listMovi ++ idx1
    fourcc("RIFF") ++ u32(4 + body.length) ++ fourcc("AVI ") ++ body
  }

  // ------------------------------------------------------------ decode

  /** Decode an MJPEG AVI: walk the RIFF chunk tree, parse `avih`/
    * `strh`/`strf`, decode every `00dc`/`00db` chunk in `movi` through
    * [[Jpeg.decode]], and cross-check counts, geometry and (when
    * present) the `idx1` index. */
  def decodeMjpeg(bytes: Array[Byte]): Video = {
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bytes.length >= 12 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'A' && bytes(9) == 'V' && bytes(10) == 'I' && bytes(11) == ' ',
      "not a RIFF/AVI file")
    val riffEnd = {
      val sz = b.getInt(4).toLong & 0xFFFFFFFFL
      require(8 + sz <= bytes.length, "truncated RIFF body")
      (8 + sz).toInt
    }
    var totalFrames = -1L
    var strLength = -1L
    var scale = 0L
    var rate = 0L
    var width = 0
    var height = 0
    var sawVids = false
    var inVidsStream = false // last strh seen was the vids stream
    var moviFourccPos = -1
    val frameChunks = IndexedSeq.newBuilder[(Int, Int)] // (payload off, len)
    var idxEntries: IndexedSeq[(Long, Long)] = null // (offset, length)

    def chunkId(at: Int): String = new String(bytes, at, 4, "US-ASCII")

    def walk(from: Int, until: Int): Unit = {
      var pos = from
      while (pos + 8 <= until) {
        val id = chunkId(pos)
        val size = b.getInt(pos + 4).toLong & 0xFFFFFFFFL
        val body = pos + 8
        require(body + size <= until,
          s"bad AVI chunk '$id': size $size at offset $pos")
        id match {
          case "LIST" =>
            require(size >= 4, "LIST without a type")
            val listType = chunkId(body)
            if (listType == "movi") {
              moviFourccPos = body
              walkMovi(body + 4, body + size.toInt)
            } else walk(body + 4, body + size.toInt) // hdrl, strl, odml...
          case "avih" =>
            require(size >= 56, "avih too small")
            totalFrames = b.getInt(body + 16).toLong & 0xFFFFFFFFL
            width = b.getInt(body + 32)
            height = b.getInt(body + 36)
          case "strh" =>
            require(size >= 56, "strh too small")
            val fccType = chunkId(body)
            inVidsStream = fccType == "vids"
            if (inVidsStream) {
              val handler = chunkId(body + 4)
              require(handler == "MJPG" || handler == "mjpg",
                s"unsupported video handler '$handler'")
              sawVids = true
              scale = b.getInt(body + 20).toLong & 0xFFFFFFFFL
              rate = b.getInt(body + 24).toLong & 0xFFFFFFFFL
              strLength = b.getInt(body + 32).toLong & 0xFFFFFFFFL
            }
          case "strf" if inVidsStream =>
            require(size >= 40, "strf too small")
            val compression = chunkId(body + 16)
            require(compression == "MJPG" || compression == "mjpg",
              s"unsupported biCompression '$compression'")
          case "idx1" =>
            val n = (size / 16).toInt
            idxEntries = (0 until n).map { i =>
              val e = body + 16 * i
              require(chunkId(e).endsWith("dc") || chunkId(e).endsWith("db"),
                s"idx1 entry $i: unexpected ckid '${chunkId(e)}'")
              (b.getInt(e + 8).toLong & 0xFFFFFFFFL,
                b.getInt(e + 12).toLong & 0xFFFFFFFFL)
            }
          case _ => // JUNK, odml, vprp, ... — skipped per the container spec
        }
        pos = body + size.toInt + (size & 1).toInt
      }
    }

    def walkMovi(from: Int, until: Int): Unit = {
      var pos = from
      while (pos + 8 <= until) {
        val id = chunkId(pos)
        val size = b.getInt(pos + 4).toLong & 0xFFFFFFFFL
        val body = pos + 8
        require(body + size <= until,
          s"bad movi chunk '$id': size $size at offset $pos")
        if (id.endsWith("dc") || id.endsWith("db"))
          frameChunks += ((body, size.toInt))
        else if (id == "LIST") walkMovi(body + 4, body + size.toInt) // 'rec '
        pos = body + size.toInt + (size & 1).toInt
      }
    }

    walk(12, riffEnd)
    require(sawVids, "no vids/MJPG stream header")
    require(totalFrames >= 0, "missing avih header")
    val chunks = frameChunks.result()
    require(chunks.length.toLong == totalFrames &&
      (strLength < 0 || strLength == totalFrames),
      s"frame count mismatch: avih=$totalFrames strh=$strLength " +
        s"movi=${chunks.length}")
    if (idxEntries != null) {
      require(idxEntries.length == chunks.length,
        s"idx1 has ${idxEntries.length} entries for ${chunks.length} frames")
      idxEntries.zip(chunks).zipWithIndex.foreach {
        case (((off, len), (body, size)), i) =>
          // two conventions in the wild: offset of the chunk HEADER
          // relative to the 'movi' fourcc, or absolute in the file
          val headerPos = body - 8
          val relOk = moviFourccPos >= 0 &&
            off == (headerPos - moviFourccPos).toLong
          val absOk = off == headerPos.toLong
          require(relOk || absOk, s"idx1 entry $i: offset $off matches " +
            s"neither movi-relative ${headerPos - moviFourccPos} nor " +
            s"absolute $headerPos")
          require(len == size.toLong, s"idx1 entry $i: length $len != $size")
      }
    }
    val fps =
      if (scale > 0) {
        require(rate % scale == 0, s"non-integer fps $rate/$scale")
        (rate / scale).toInt
      } else 0
    val frames = chunks.map { case (off, len) =>
      val img = MediaCodec.decodeImage(
        java.util.Arrays.copyOfRange(bytes, off, off + len))
      require(img.width == width && img.height == height,
        s"frame geometry ${img.width}x${img.height} != header ${width}x$height")
      img
    }
    Video(width, height, fps, frames)
  }
}
