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
      : Array[Byte] =
    encodeMjpegAv(frames, w, h, fps, 0, Array.emptyShortArray)

  /** Encode an INTERLEAVED A/V container: the video strl plus an
    * `auds` PCM16 stream (stream 1), audio split into one `01wb` chunk
    * per video frame in presentation order — the classic capture-file
    * interleave — with every chunk indexed in `idx1`. Pass an empty
    * sample array for video-only (what [[encodeMjpeg]] does). */
  def encodeMjpegAv(frames: Seq[Array[Byte]], w: Int, h: Int, fps: Int,
                    sampleRate: Int, samples: Array[Short],
                    sliceSamples: Array[Int] = Array.empty): Array[Byte] = {
    require(fps > 0, "fps must be positive")
    val n = frames.length
    val hasAudio = samples.nonEmpty
    require(!hasAudio || sampleRate > 0, "audio needs a sample rate")
    require(!hasAudio || n > 0, "audio needs at least one video frame")
    require(sliceSamples.isEmpty || (sliceSamples.length == n &&
      sliceSamples.sum == samples.length && sliceSamples.forall(_ >= 0)),
      "explicit slice sizes must cover every frame and all samples")
    val maxFrame = if (n == 0) 0 else frames.map(_.length).max
    val avih = fourcc("avih") ++ u32(56) ++
      u32(1000000L / fps) ++ // dwMicroSecPerFrame
      u32(0) ++ // dwMaxBytesPerSec
      u32(0) ++ // dwPaddingGranularity
      u32(0x10) ++ // dwFlags = AVIF_HASINDEX
      u32(n) ++ // dwTotalFrames
      u32(0) ++ // dwInitialFrames
      u32(if (hasAudio) 2 else 1) ++ // dwStreams
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
    // audio stream 1: per-frame chunk sizes (even split, remainder to
    // the front chunks), WAVEFORMAT strf
    val perFrameSamples: Array[Int] =
      if (!hasAudio) Array.empty
      else if (sliceSamples.nonEmpty) sliceSamples
      else Array.tabulate(n)(i =>
        samples.length / n + (if (i < samples.length % n) 1 else 0))
    val strlA: Array[Byte] =
      if (!hasAudio) Array.empty
      else {
        val maxA = perFrameSamples.max * 2
        val strhA = fourcc("strh") ++ u32(56) ++
          fourcc("auds") ++ u32(0) ++ // handler 0 for PCM
          u32(0) ++ u16(0) ++ u16(0) ++ u32(0) ++
          u32(1) ++ // dwScale
          u32(sampleRate) ++ // dwRate (samples/sec = rate/scale)
          u32(0) ++
          u32(samples.length) ++ // dwLength in samples
          u32(maxA) ++
          u32(0xFFFFFFFFL) ++
          u32(2) ++ // dwSampleSize = block align
          u16(0) ++ u16(0) ++ u16(0) ++ u16(0)
        val strfA = fourcc("strf") ++ u32(16) ++
          u16(1) ++ u16(1) ++ // PCM, mono
          u32(sampleRate) ++ u32(sampleRate * 2) ++ // rate, avg bytes/sec
          u16(2) ++ u16(16) // block align, bits
        fourcc("LIST") ++ u32(4 + strhA.length + strfA.length) ++
          fourcc("strl") ++ strhA ++ strfA
      }
    val hdrl = fourcc("LIST") ++
      u32(4 + avih.length + strl.length + strlA.length) ++
      fourcc("hdrl") ++ avih ++ strl ++ strlA
    // movi list + idx1 offsets (relative to the 'movi' fourcc);
    // interleave: frame i's 00dc then its 01wb slice
    val movi = new ByteArrayOutputStream()
    val idx = new ByteArrayOutputStream()
    var rel = 4 // first chunk starts right after the 'movi' fourcc
    var audAt = 0
    def put(ckid: String, payload: Array[Byte]): Unit = {
      movi.write(fourcc(ckid))
      movi.write(u32(payload.length))
      movi.write(payload)
      if ((payload.length & 1) == 1) movi.write(0) // RIFF 2-byte alignment
      idx.write(fourcc(ckid))
      idx.write(u32(0x10)) // AVIIF_KEYFRAME
      idx.write(u32(rel))
      idx.write(u32(payload.length))
      rel += 8 + payload.length + (payload.length & 1)
    }
    frames.zipWithIndex.foreach { case (f, i) =>
      put("00dc", f)
      if (hasAudio) {
        val ns = perFrameSamples(i)
        val bb = ByteBuffer.allocate(ns * 2).order(ByteOrder.LITTLE_ENDIAN)
        (0 until ns).foreach(j => bb.putShort(samples(audAt + j)))
        audAt += ns
        put("01wb", bb.array())
      }
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

  /** A demuxed container: the MJPEG video track plus the PCM16 audio
    * track when an `auds` stream is present; `audioSlices` preserves
    * the per-`01wb`-chunk sample counts in movi order (the capture
    * interleave), which is what an A/V sync check reads. */
  final case class Av(video: Video, audio: Option[MediaCodec.Audio],
                      audioSlices: Seq[Int] = Nil)

  /** Decode an MJPEG AVI: walk the RIFF chunk tree, parse `avih`/
    * `strh`/`strf`, decode every `00dc`/`00db` chunk in `movi` through
    * [[Jpeg.decode]], and cross-check counts, geometry and (when
    * present) the `idx1` index. Any interleaved audio track is
    * ignored — [[decodeAv]] demuxes it too. */
  def decodeMjpeg(bytes: Array[Byte]): Video = decodeAv(bytes).video

  /** Demux video AND audio: same strict walk as [[decodeMjpeg]], plus
    * the `auds` stream header (PCM16 WAVEFORMAT in its `strf`) and the
    * concatenation of its `NNwb` chunks in movi order, cross-checked
    * against the stream header's sample count. */
  def decodeAv(bytes: Array[Byte]): Av = {
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
    var curStream = "" // fccType of the last strh seen ("" before any)
    var moviFourccPos = -1
    var audScale = 0L
    var audRate = 0L
    var audLength = -1L // strh dwLength: total samples
    var audSampleRate = 0 // from the WAVEFORMAT strf
    var audChannels = 0
    var sawAuds = false
    // every movi chunk in order (id, payload off, len) — idx1 covers all
    val moviChunks = IndexedSeq.newBuilder[(String, Int, Int)]
    var idxEntries: IndexedSeq[(String, Long, Long)] = null // (ckid, off, len)

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
            curStream = chunkId(body)
            if (curStream == "vids") {
              val handler = chunkId(body + 4)
              require(handler == "MJPG" || handler == "mjpg",
                s"unsupported video handler '$handler'")
              sawVids = true
              scale = b.getInt(body + 20).toLong & 0xFFFFFFFFL
              rate = b.getInt(body + 24).toLong & 0xFFFFFFFFL
              strLength = b.getInt(body + 32).toLong & 0xFFFFFFFFL
            } else if (curStream == "auds") {
              sawAuds = true
              audScale = b.getInt(body + 20).toLong & 0xFFFFFFFFL
              audRate = b.getInt(body + 24).toLong & 0xFFFFFFFFL
              audLength = b.getInt(body + 32).toLong & 0xFFFFFFFFL
            }
          case "strf" if curStream == "vids" =>
            require(size >= 40, "strf too small")
            val compression = chunkId(body + 16)
            require(compression == "MJPG" || compression == "mjpg",
              s"unsupported biCompression '$compression'")
          case "strf" if curStream == "auds" =>
            // WAVEFORMAT(EX): tag, channels, rate, avg bytes, align, bits
            require(size >= 16, "audio strf too small")
            val tag = b.getShort(body) & 0xFFFF
            require(tag == 1, s"only PCM audio (tag 1) supported, got $tag")
            audChannels = b.getShort(body + 2) & 0xFFFF
            audSampleRate = b.getInt(body + 4)
            val bits = b.getShort(body + 14) & 0xFFFF
            require(bits == 16, s"only 16-bit PCM supported, got $bits")
          case "idx1" =>
            val n = (size / 16).toInt
            idxEntries = (0 until n).map { i =>
              val e = body + 16 * i
              val ckid = chunkId(e)
              require(ckid.endsWith("dc") || ckid.endsWith("db") ||
                ckid.endsWith("wb"),
                s"idx1 entry $i: unexpected ckid '$ckid'")
              (ckid, b.getInt(e + 8).toLong & 0xFFFFFFFFL,
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
        if (id.endsWith("dc") || id.endsWith("db") || id.endsWith("wb"))
          moviChunks += ((id, body, size.toInt))
        else if (id == "LIST") walkMovi(body + 4, body + size.toInt) // 'rec '
        pos = body + size.toInt + (size & 1).toInt
      }
    }

    walk(12, riffEnd)
    require(sawVids, "no vids/MJPG stream header")
    require(totalFrames >= 0, "missing avih header")
    val all = moviChunks.result()
    val chunks = all.collect {
      case (id, off, len) if id.endsWith("dc") || id.endsWith("db") =>
        (off, len)
    }
    val audChunks = all.collect {
      case (id, off, len) if id.endsWith("wb") => (off, len)
    }
    require(chunks.length.toLong == totalFrames &&
      (strLength < 0 || strLength == totalFrames),
      s"frame count mismatch: avih=$totalFrames strh=$strLength " +
        s"movi=${chunks.length}")
    if (idxEntries != null) {
      require(idxEntries.length == all.length,
        s"idx1 has ${idxEntries.length} entries for ${all.length} movi chunks")
      idxEntries.zip(all).zipWithIndex.foreach {
        case (((ckid, off, len), (id, body, size)), i) =>
          require(ckid == id, s"idx1 entry $i: ckid '$ckid' != movi '$id'")
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
    val audio =
      if (!sawAuds) {
        require(audChunks.isEmpty, "audio chunks without an auds stream")
        None
      } else {
        require(audChannels == 1, s"$audChannels-channel AVI audio unsupported")
        val totalBytes = audChunks.map(_._2.toLong).sum
        require(totalBytes % 2 == 0, "odd PCM16 byte count")
        val samples = new Array[Short]((totalBytes / 2).toInt)
        var at = 0
        audChunks.foreach { case (off, len) =>
          var i = 0
          while (i < len / 2) {
            samples(at) = b.getShort(off + 2 * i)
            at += 1
            i += 1
          }
        }
        require(audLength < 0 || audLength == samples.length.toLong,
          s"audio sample count ${samples.length} != strh dwLength $audLength")
        // the stream header's rate/scale must agree with the WAVEFORMAT
        require(audScale == 0 ||
          audRate / audScale == audSampleRate.toLong,
          s"auds strh rate/scale ${audRate}/$audScale != strf $audSampleRate")
        Some(MediaCodec.Audio(audSampleRate, audChannels, samples))
      }
    Av(Video(width, height, fps, frames), audio,
      audChunks.map(_._2 / 2).toSeq)
  }
}
