package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM media codecs, written from the public file-format
  * specifications (same from-spec discipline as [[HDF5]] / [[Zarr]] —
  * this container ships no image/audio libraries, and none are needed
  * for these formats):
  *
  *  - BMP: 14-byte BITMAPFILEHEADER + 40-byte BITMAPINFOHEADER,
  *    uncompressed (BI_RGB) 24-bpp BGR / 32-bpp BGRA, rows padded to
  *    4 bytes, bottom-up (biHeight > 0) or top-down (biHeight < 0).
  *  - Netpbm: P5 (PGM, one gray byte per pixel) and P6 (PPM, RGB
  *    triplets), maxval ≤ 255, '#' comments and arbitrary whitespace in
  *    the header, raster row-major top-down.
  *  - WAV: RIFF container ('RIFF' size 'WAVE'), chunk walk with 2-byte
  *    alignment, 'fmt ' (PCM, mono, 16-bit LE) + 'data'. Unknown chunks
  *    (LIST, fact, …) are skipped, as the container spec requires.
  *
  * Decoders return channel-interleaved row-major TOP-DOWN pixels (RGB
  * for color, single byte for gray) regardless of on-disk layout, so
  * downstream feature extraction never sees BGR order, bottom-up rows or
  * scanline padding. The reference engine has no media path at all —
  * these back the multimodal columns the 100 TB training pipeline needs
  * (brief requirement; no counterpart file to cite).
  */
object MediaCodec {

  /** A decoded raster: `pixels` is row-major top-down, `channels`-way
    * interleaved (RGB or gray), one byte per channel. */
  final case class Image(width: Int, height: Int, channels: Int,
                         pixels: Array[Byte])

  /** A decoded 16-bit raster (scientific/medical imagery): `samples`
    * is row-major top-down, channel-interleaved, one Int in
    * [0, 65535] per sample. Produced by [[Png.decode16]]. */
  final case class Image16(width: Int, height: Int, channels: Int,
                           samples: Array[Int])

  /** Decoded PCM audio: 16-bit signed samples, channel-interleaved. */
  final case class Audio(sampleRate: Int, channels: Int,
                         samples: Array[Short])

  // ------------------------------------------------------------------ BMP

  private def bmpHeader(w: Int, h: Int, bpp: Int, imageSize: Int): ByteBuffer = {
    val b = ByteBuffer.allocate(54 + imageSize).order(ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte)
    b.putInt(54 + imageSize) // bfSize
    b.putShort(0).putShort(0) // bfReserved1/2
    b.putInt(54) // bfOffBits
    b.putInt(40) // biSize (BITMAPINFOHEADER)
    b.putInt(w).putInt(h) // biWidth, biHeight (>0: bottom-up)
    b.putShort(1) // biPlanes
    b.putShort(bpp.toShort) // biBitCount
    b.putInt(0) // biCompression = BI_RGB
    b.putInt(imageSize) // biSizeImage
    b.putInt(2835).putInt(2835) // 72 dpi in px/metre
    b.putInt(0).putInt(0) // biClrUsed, biClrImportant
    b
  }

  /** Encode RGB row-major top-down pixels as a 24-bpp bottom-up BMP
    * (BGR byte order, rows padded to 4 bytes — the classic layout). */
  def encodeBmp24(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3, "rgb length must be w*h*3")
    val stride = (w * 3 + 3) / 4 * 4
    val b = bmpHeader(w, h, 24, stride * h)
    var r = h - 1 // bottom-up: last source row first
    while (r >= 0) {
      var c = 0
      while (c < w) {
        val p = (r * w + c) * 3
        b.put(rgb(p + 2)).put(rgb(p + 1)).put(rgb(p)) // BGR
        c += 1
      }
      var pad = stride - w * 3
      while (pad > 0) { b.put(0.toByte); pad -= 1 }
      r -= 1
    }
    b.array()
  }

  /** Encode as 32-bpp bottom-up BMP (BGRA, alpha 0xFF; rows naturally
    * 4-byte aligned). */
  def encodeBmp32(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3, "rgb length must be w*h*3")
    val b = bmpHeader(w, h, 32, w * h * 4)
    var r = h - 1
    while (r >= 0) {
      var c = 0
      while (c < w) {
        val p = (r * w + c) * 3
        b.put(rgb(p + 2)).put(rgb(p + 1)).put(rgb(p)).put(0xFF.toByte)
        c += 1
      }
      r -= 1
    }
    b.array()
  }

  /** Encode gray bytes as an 8-bpp paletted bottom-up BMP: a 256-entry
    * grayscale BGRA color table (i,i,i,0) after the info header, one
    * index byte per pixel, rows padded to 4 bytes. */
  def encodeBmp8(w: Int, h: Int, gray: Array[Byte]): Array[Byte] = {
    require(gray.length == w * h, "gray length must be w*h")
    val stride = (w + 3) / 4 * 4
    val b = ByteBuffer.allocate(54 + 1024 + stride * h)
      .order(ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte)
    b.putInt(54 + 1024 + stride * h)
    b.putShort(0).putShort(0)
    b.putInt(54 + 1024) // bfOffBits: past the color table
    b.putInt(40).putInt(w).putInt(h)
    b.putShort(1).putShort(8).putInt(0).putInt(stride * h)
    b.putInt(2835).putInt(2835)
    b.putInt(256).putInt(0) // biClrUsed, biClrImportant
    var i = 0
    while (i < 256) { // grayscale BGRA table
      b.put(i.toByte).put(i.toByte).put(i.toByte).put(0.toByte)
      i += 1
    }
    var r = h - 1
    while (r >= 0) {
      var c = 0
      while (c < w) { b.put(gray(r * w + c)); c += 1 }
      var pad = stride - w
      while (pad > 0) { b.put(0.toByte); pad -= 1 }
      r -= 1
    }
    b.array()
  }

  /** Encode gray bytes as an 8-bpp BI_RLE8 bottom-up BMP (Microsoft
    * BMP spec, compression 1): every maximal horizontal run becomes one
    * encoded-mode pair (count, index) — runs past 255 split — each row
    * closes with the 00 00 end-of-line escape and the stream with
    * 00 01 end-of-bitmap. The decoder additionally accepts absolute
    * mode (00 n idx… with word padding) and the 00 02 dx dy delta,
    * which real encoders emit; fixtures pin those paths. */
  def encodeBmpRle8(w: Int, h: Int, gray: Array[Byte]): Array[Byte] = {
    require(gray.length == w * h, "gray length must be w*h")
    val stream = new java.io.ByteArrayOutputStream()
    var r = h - 1 // RLE bitmaps are bottom-up
    while (r >= 0) {
      var c = 0
      while (c < w) {
        val v = gray(r * w + c)
        var n = 1
        while (c + n < w && gray(r * w + c + n) == v && n < 255) n += 1
        stream.write(n)
        stream.write(v & 0xFF)
        c += n
      }
      stream.write(0); stream.write(0) // end of line
      r -= 1
    }
    stream.write(0); stream.write(1) // end of bitmap
    val rle = stream.toByteArray
    val b = ByteBuffer.allocate(54 + 1024 + rle.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte)
    b.putInt(54 + 1024 + rle.length)
    b.putShort(0).putShort(0)
    b.putInt(54 + 1024)
    b.putInt(40).putInt(w).putInt(h)
    b.putShort(1).putShort(8).putInt(1).putInt(rle.length) // BI_RLE8
    b.putInt(2835).putInt(2835)
    b.putInt(256).putInt(0)
    var i = 0
    while (i < 256) {
      b.put(i.toByte).put(i.toByte).put(i.toByte).put(0.toByte)
      i += 1
    }
    b.put(rle)
    b.array()
  }

  /** BI_RLE8 stream → 8-bpp index raster (top-down), all four forms:
    * encoded runs, absolute mode (word-aligned), end-of-line,
    * end-of-bitmap, and the 00 02 dx dy delta (skipped pixels keep
    * index 0, the de-facto convention). Strictly bounds-checked. */
  private def decodeRle8(bytes: Array[Byte], off: Int, end: Int,
                         w: Int, h: Int): Array[Byte] = {
    val idx = new Array[Byte](w * h) // top-down raster, default index 0
    var row = h - 1 // stream order is bottom-up
    var col = 0
    var p = off
    def put(v: Byte): Unit = {
      require(row >= 0 && col < w, s"RLE8 pixel out of bounds ($row,$col)")
      idx(row * w + col) = v
      col += 1
    }
    var done = false
    while (!done) {
      require(p + 2 <= end, "truncated RLE8 stream")
      val b0 = bytes(p) & 0xFF
      val b1 = bytes(p + 1) & 0xFF
      p += 2
      if (b0 > 0) { // encoded mode
        var n = b0
        while (n > 0) { put(b1.toByte); n -= 1 }
      } else b1 match {
        case 0 => // end of line
          require(row >= 0, "RLE8 EOL past the top row")
          row -= 1; col = 0
        case 1 => done = true // end of bitmap
        case 2 => // delta
          require(p + 2 <= end, "truncated RLE8 delta")
          val dx = bytes(p) & 0xFF
          val dy = bytes(p + 1) & 0xFF
          p += 2
          col += dx
          row -= dy // "up" in bottom-up coordinates
          require(col <= w && row >= -1, s"RLE8 delta out of bounds")
        case n => // absolute mode: n literal indices, word-aligned
          require(p + n + (n & 1) <= end, "truncated RLE8 absolute run")
          var i = 0
          while (i < n) { put(bytes(p + i)); i += 1 }
          p += n + (n & 1)
      }
    }
    idx
  }

  /** Decode an uncompressed or BI_RLE8 8/24/32-bpp BMP to top-down RGB.
    * Handles bottom-up (biHeight > 0) and top-down (biHeight < 0)
    * layouts, arbitrary bfOffBits, the 8-bpp paletted form (BGRA color
    * table after the info header, biClrUsed entries or the full 256),
    * and RLE8-compressed 8-bpp payloads (encoded/absolute/EOL/EOB/delta
    * forms — see [[encodeBmpRle8]]). */
  def decodeBmp(bytes: Array[Byte]): Image = {
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bytes.length >= 54 && b.get(0) == 'B' && b.get(1) == 'M',
      "not a BMP file")
    val dataOff = b.getInt(10)
    val biSize = b.getInt(14)
    require(biSize >= 40, s"BITMAPINFOHEADER (>=40 bytes) expected, got $biSize")
    val w = b.getInt(18)
    val rawH = b.getInt(22)
    val bottomUp = rawH > 0
    val h = math.abs(rawH)
    val bpp = b.getShort(28) & 0xFFFF
    val compression = b.getInt(30)
    require(compression == 0 || (compression == 1 && bpp == 8 && rawH > 0),
      s"only BI_RGB (0) or bottom-up 8-bpp BI_RLE8 (1) supported, " +
        s"got compression $compression at $bpp bpp")
    require(bpp == 8 || bpp == 24 || bpp == 32,
      s"only 8/24/32-bpp supported, got $bpp")
    require(w > 0 && h > 0 && w.toLong * h * 3 <= Int.MaxValue,
      s"bad BMP dimensions ${w}x$rawH")
    // 8-bpp: a BGRA color table sits right after the info header
    val palette: Array[Byte] =
      if (bpp != 8) null
      else {
        val clrUsed = b.getInt(46)
        val n = if (clrUsed > 0) clrUsed else 256
        val tblOffL = 14L + biSize // Long: a huge biSize must not wrap
        require(n <= 256 && tblOffL + n.toLong * 4 <= bytes.length,
          s"bad BMP color table ($n entries at $tblOffL)")
        val tblOff = tblOffL.toInt
        val p = new Array[Byte](256 * 3)
        var i = 0
        while (i < n) {
          p(i * 3) = bytes(tblOff + i * 4 + 2) // stored BGRA
          p(i * 3 + 1) = bytes(tblOff + i * 4 + 1)
          p(i * 3 + 2) = bytes(tblOff + i * 4)
          i += 1
        }
        p
      }
    if (compression == 1) {
      require(dataOff >= 0 && dataOff <= bytes.length,
        "bad BMP RLE8 data offset")
      val idx = decodeRle8(bytes, dataOff, bytes.length, w, h)
      val out = new Array[Byte](w * h * 3)
      var i = 0
      while (i < w * h) {
        val pi = (idx(i) & 0xFF) * 3
        out(i * 3) = palette(pi)
        out(i * 3 + 1) = palette(pi + 1)
        out(i * 3 + 2) = palette(pi + 2)
        i += 1
      }
      return Image(w, h, 3, out)
    }
    val bytesPerPx = bpp / 8
    val strideL = (w.toLong * bytesPerPx + 3) / 4 * 4
    require(dataOff >= 0 &&
      dataOff.toLong + strideL * h <= bytes.length, "truncated BMP pixel data")
    val stride = strideL.toInt // bounded by bytes.length via the require
    val out = new Array[Byte](w * h * 3)
    var r = 0
    while (r < h) {
      val srcRow = if (bottomUp) h - 1 - r else r
      var c = 0
      while (c < w) {
        val s = dataOff + srcRow * stride + c * bytesPerPx
        val d = (r * w + c) * 3
        if (palette != null) {
          val idx = (bytes(s) & 0xFF) * 3
          out(d) = palette(idx)
          out(d + 1) = palette(idx + 1)
          out(d + 2) = palette(idx + 2)
        } else {
          out(d) = bytes(s + 2) // R (stored BGR[A])
          out(d + 1) = bytes(s + 1)
          out(d + 2) = bytes(s)
        }
        c += 1
      }
      r += 1
    }
    Image(w, h, 3, out)
  }

  // --------------------------------------------------------------- Netpbm

  /** Encode gray bytes as PGM (P5). A comment line is emitted on purpose
    * so every decode exercises the header's comment grammar. */
  def encodePgm(w: Int, h: Int, gray: Array[Byte]): Array[Byte] = {
    require(gray.length == w * h, "gray length must be w*h")
    val hdr = s"P5\n# graft media codec\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](hdr.length + gray.length)
    System.arraycopy(hdr, 0, out, 0, hdr.length)
    System.arraycopy(gray, 0, out, hdr.length, gray.length)
    out
  }

  /** Encode RGB row-major top-down pixels as PPM (P6). */
  def encodePpm(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3, "rgb length must be w*h*3")
    val hdr = s"P6\n# graft media codec\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](hdr.length + rgb.length)
    System.arraycopy(hdr, 0, out, 0, hdr.length)
    System.arraycopy(rgb, 0, out, hdr.length, rgb.length)
    out
  }

  /** Decode P5/P6 (binary gray/RGB) and P2/P3 (ASCII gray/RGB). The
    * header is magic + three decimal tokens (width, height, maxval)
    * separated by whitespace, with '#' comments running to end-of-line;
    * in the binary forms ONE whitespace byte then separates maxval from
    * the raster, in the ASCII forms the raster is more decimal tokens. */
  def decodeNetpbm(bytes: Array[Byte]): Image = {
    require(bytes.length > 2 && bytes(0) == 'P' &&
      (bytes(1) == '2' || bytes(1) == '3' || bytes(1) == '5' || bytes(1) == '6'),
      "not a P2/P3/P5/P6 Netpbm file")
    val asciiForm = bytes(1) == '2' || bytes(1) == '3'
    val channels = if (bytes(1) == '6' || bytes(1) == '3') 3 else 1
    var pos = 2
    def nextToken(): Int = {
      // skip whitespace and comments
      var inComment = false
      while (pos < bytes.length &&
        (inComment || bytes(pos).toChar.isWhitespace || bytes(pos) == '#')) {
        if (bytes(pos) == '#') inComment = true
        else if (bytes(pos) == '\n') inComment = false
        pos += 1
      }
      require(pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9',
        "expected a decimal token in the Netpbm header/raster")
      var v = 0
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
        v = v * 10 + (bytes(pos) - '0'); pos += 1
        // dims/maxval/samples are all < 2^20; a longer token would wrap
        // Int and slip past the maxval check as garbage
        require(v < (1 << 20), "Netpbm decimal token out of range")
      }
      v
    }
    val w = nextToken()
    val h = nextToken()
    val maxval = nextToken()
    require(w > 0 && h > 0 &&
      w.toLong * h * channels <= Int.MaxValue, s"bad Netpbm dimensions ${w}x$h")
    require(maxval > 0 && maxval < 256, s"one-byte maxval expected, got $maxval")
    val n = w * h * channels
    if (asciiForm) {
      val out = new Array[Byte](n)
      var i = 0
      while (i < n) {
        val v = nextToken()
        require(v <= maxval, s"Netpbm ASCII sample $v exceeds maxval $maxval")
        out(i) = v.toByte
        i += 1
      }
      Image(w, h, channels, out)
    } else {
      pos += 1 // the single whitespace byte after maxval
      require(bytes.length >= pos + n, "truncated Netpbm raster")
      Image(w, h, channels, java.util.Arrays.copyOfRange(bytes, pos, pos + n))
    }
  }

  // ------------------------------------------------------------------ WAV

  /** Encode mono 16-bit PCM samples as a canonical RIFF/WAVE file. */
  def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataSize = samples.length * 2
    val b = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII"))
    b.putInt(36 + dataSize)
    b.put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII"))
    b.putInt(16) // PCM fmt chunk size
    b.putShort(1) // wFormatTag = PCM
    b.putShort(1) // nChannels = mono
    b.putInt(sampleRate)
    b.putInt(sampleRate * 2) // nAvgBytesPerSec
    b.putShort(2) // nBlockAlign
    b.putShort(16) // wBitsPerSample
    b.put("data".getBytes("US-ASCII"))
    b.putInt(dataSize)
    samples.foreach(b.putShort)
    b.array()
  }

  // ---------------------------------------------------------- IMA ADPCM

  /** IMA/DVI ADPCM step-size table (the public IMA "Recommended
    * Practices for Enhancing Digital Audio Compatibility" tables; WAVE
    * carries this codec as format tag 0x0011). All arithmetic is
    * exactly-specified integer math, so decodes replay bit-for-bit. */
  private[sources] val ImaStepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544,
    598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707,
    1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871,
    5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
    15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  private[sources] val ImaIndexTable: Array[Int] =
    Array(-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)

  /** One IMA ADPCM state step: decode nibble `n` against (pred, idx),
    * returning the new state. diff = (step>>3) + selected step halves,
    * sign in bit 3; predictor clamps to int16, index to [0, 88]. */
  private[sources] def imaStep(pred: Int, idx: Int, n: Int): (Int, Int) = {
    val step = ImaStepTable(idx)
    var diff = step >> 3
    if ((n & 1) != 0) diff += step >> 2
    if ((n & 2) != 0) diff += step >> 1
    if ((n & 4) != 0) diff += step
    val p0 = if ((n & 8) != 0) pred - diff else pred + diff
    val p = math.max(-32768, math.min(32767, p0))
    val i = math.max(0, math.min(88, idx + ImaIndexTable(n)))
    (p, i)
  }

  /** Decode the IMA ADPCM 'data' payload: a sequence of
    * `blockAlign`-byte blocks, each opening with one 4-byte header PER
    * CHANNEL (int16 LE initial predictor — which IS the block's first
    * output sample for that channel — uint8 initial step index,
    * reserved byte) followed by 4-bit codes two per byte, LOW nibble
    * first. Multi-channel data interleaves in 4-byte (8-nibble) groups
    * per channel, per the public IMA-in-WAVE layout; output samples
    * are channel-interleaved. A short final mono block decodes the
    * nibbles it actually carries. */
  private def decodeImaBlocks(bytes: Array[Byte], off: Int, size: Int,
      blockAlign: Int, channels: Int): Array[Short] = {
    require(blockAlign > 4 * channels, s"IMA ADPCM block align $blockAlign")
    val out = new scala.collection.mutable.ArrayBuffer[Short](
      size / blockAlign * ((blockAlign - 4 * channels) * 2 + channels) + 8)
    var bo = 0
    while (bo + 4 * channels <= size) {
      val here = math.min(blockAlign, size - bo)
      val pred = new Array[Int](channels)
      val idx = new Array[Int](channels)
      var c = 0
      while (c < channels) {
        pred(c) = ((bytes(off + bo + 4 * c) & 0xFF) |
          ((bytes(off + bo + 4 * c + 1) & 0xFF) << 8)).toShort.toInt
        idx(c) = bytes(off + bo + 4 * c + 2) & 0xFF
        require(idx(c) <= 88, s"IMA ADPCM step index ${idx(c)} > 88")
        out += pred(c).toShort
        c += 1
      }
      if (channels == 1) {
        var j = 4
        while (j < here) {
          val b = bytes(off + bo + j) & 0xFF
          val (p1, i1) = imaStep(pred(0), idx(0), b & 0x0F)
          pred(0) = p1; idx(0) = i1; out += p1.toShort
          val (p2, i2) = imaStep(pred(0), idx(0), b >> 4)
          pred(0) = p2; idx(0) = i2; out += p2.toShort
          j += 1
        }
      } else {
        // 4-byte groups per channel; each round of `channels` groups
        // yields 8 samples per channel, emitted interleaved
        val dataBytes = here - 4 * channels
        require(dataBytes % (4 * channels) == 0,
          s"IMA ADPCM stereo block data $dataBytes not group-aligned")
        val frame = new Array[Short](8 * channels)
        var g = 4 * channels
        while (g < here) {
          var c2 = 0
          while (c2 < channels) {
            var j = 0
            while (j < 4) {
              val b = bytes(off + bo + g + 4 * c2 + j) & 0xFF
              val (p1, i1) = imaStep(pred(c2), idx(c2), b & 0x0F)
              pred(c2) = p1; idx(c2) = i1
              frame((2 * j) * channels + c2) = p1.toShort
              val (p2, i2) = imaStep(pred(c2), idx(c2), b >> 4)
              pred(c2) = p2; idx(c2) = i2
              frame((2 * j + 1) * channels + c2) = p2.toShort
              j += 1
            }
            c2 += 1
          }
          out ++= frame
          g += 4 * channels
        }
      }
      bo += here
    }
    out.toArray
  }

  /** Encode mono 16-bit PCM as IMA ADPCM in a RIFF/WAVE container
    * (format tag 0x0011, cbSize=2 + wSamplesPerBlock, a 'fact' chunk
    * with the sample count, block-headered data). The quantizer tracks
    * the decoder's own state transition, so decode(encode(x)) drifts
    * only by the spec's quantization error and re-decoding is
    * bit-stable. The step index carries ACROSS blocks (each block
    * header snapshots it), as the reference encoders do. */
  def encodeWavImaAdpcm(sampleRate: Int, samples: Array[Short],
      samplesPerBlock: Int = 505): Array[Byte] = {
    require(samplesPerBlock >= 3 && samplesPerBlock % 2 == 1,
      "samplesPerBlock must be odd (header sample + nibble pairs)")
    require(samples.nonEmpty, "no samples")
    val blockAlign = 4 + (samplesPerBlock - 1) / 2
    val nBlocks = (samples.length + samplesPerBlock - 1) / samplesPerBlock
    val data = new java.io.ByteArrayOutputStream(nBlocks * blockAlign)
    var idx = 0
    var s = 0
    while (s < samples.length) {
      val n = math.min(samplesPerBlock, samples.length - s)
      var pred = samples(s).toInt
      data.write(pred & 0xFF); data.write((pred >> 8) & 0xFF)
      data.write(idx); data.write(0)
      var j = 1
      var lowNibble = -1
      while (j < samplesPerBlock) {
        // past the input tail, hold the predictor (silence pad)
        val target = if (s + j < samples.length) samples(s + j).toInt else pred
        val step = ImaStepTable(idx)
        var diff = target - pred
        var code = 0
        if (diff < 0) { code = 8; diff = -diff }
        if (diff >= step) { code |= 4; diff -= step }
        if (diff >= (step >> 1)) { code |= 2; diff -= step >> 1 }
        if (diff >= (step >> 2)) { code |= 1 }
        val (p1, i1) = imaStep(pred, idx, code)
        pred = p1; idx = i1
        if (lowNibble < 0) lowNibble = code
        else { data.write(lowNibble | (code << 4)); lowNibble = -1 }
        j += 1
      }
      // samplesPerBlock is odd, so the nibbles pair up exactly
      s += n
    }
    val db = data.toByteArray
    val b = ByteBuffer.allocate(12 + 8 + 20 + 8 + 4 + 8 + db.length +
      (db.length & 1)).order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII"))
    b.putInt(4 + 28 + 12 + 8 + db.length + (db.length & 1))
    b.put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII"))
    b.putInt(20) // 16 common + cbSize(2) + wSamplesPerBlock(2)
    b.putShort(0x11) // wFormatTag = IMA/DVI ADPCM
    b.putShort(1) // mono
    b.putInt(sampleRate)
    b.putInt(sampleRate * blockAlign / samplesPerBlock) // nAvgBytesPerSec
    b.putShort(blockAlign.toShort)
    b.putShort(4) // wBitsPerSample
    b.putShort(2) // cbSize
    b.putShort(samplesPerBlock.toShort)
    b.put("fact".getBytes("US-ASCII"))
    b.putInt(4); b.putInt(samples.length)
    b.put("data".getBytes("US-ASCII"))
    b.putInt(db.length)
    b.put(db)
    if ((db.length & 1) == 1) b.put(0.toByte) // RIFF 2-byte alignment
    b.array()
  }

  // ---------------------------------------------------------- G.711

  /** ITU-T G.711 µ-law expansion: 8-bit code → 16-bit linear, the
    * exactly-specified segment/mantissa arithmetic (BIAS = 0x84, eight
    * segments). Stateless per sample — unlike ADPCM there is no
    * predictor, so oracles replay it as plain CASE arithmetic. */
  private def ulaw2linear(code: Int): Int = {
    val u = ~code & 0xFF
    val t = (((u & 0xF) << 3) + 0x84) << ((u >> 4) & 7)
    if ((u & 0x80) != 0) 0x84 - t else t - 0x84
  }

  /** ITU-T G.711 A-law expansion: toggle the even bits (0x55), then
    * segment 0 is linear (step 16, offset 8), segments 1–7 double. */
  private def alaw2linear(code: Int): Int = {
    val a = code ^ 0x55
    val seg = (a >> 4) & 7
    val t = seg match {
      case 0 => ((a & 0xF) << 4) + 8
      case 1 => ((a & 0xF) << 4) + 0x108
      case _ => (((a & 0xF) << 4) + 0x108) << (seg - 1)
    }
    if ((a & 0x80) != 0) t else -t
  }

  /** Assemble a mono G.711 RIFF/WAVE file: the data chunk IS the 8-bit
    * code stream (format tag 7 = µ-law, 6 = A-law, one byte per
    * sample). Fixture-side twin of the tag-6/7 branch in
    * [[decodeWav]]; shares no expansion arithmetic with it. */
  def encodeWavG711(sampleRate: Int, codes: Array[Byte],
      aLaw: Boolean): Array[Byte] = {
    val b = ByteBuffer.allocate(12 + 8 + 18 + 8 + 4 + 8 + codes.length +
      (codes.length & 1)).order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII"))
    b.putInt(4 + 26 + 12 + 8 + codes.length + (codes.length & 1))
    b.put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII"))
    b.putInt(18) // 16 common + cbSize(2): tags != 1 carry cbSize
    b.putShort(if (aLaw) 6 else 7)
    b.putShort(1) // mono
    b.putInt(sampleRate)
    b.putInt(sampleRate) // nAvgBytesPerSec: 1 byte/sample
    b.putShort(1) // nBlockAlign
    b.putShort(8) // wBitsPerSample
    b.putShort(0) // cbSize
    b.put("fact".getBytes("US-ASCII"))
    b.putInt(4); b.putInt(codes.length)
    b.put("data".getBytes("US-ASCII"))
    b.putInt(codes.length)
    b.put(codes)
    if ((codes.length & 1) == 1) b.put(0.toByte) // RIFF 2-byte alignment
    b.array()
  }

  /** Decode a RIFF/WAVE file: walk the chunk list (2-byte alignment),
    * read 'fmt ' and 'data', skip everything else. Serves PCM16
    * (format tag 1), mono IMA/DVI ADPCM (format tag 0x0011) — the
    * deterministic-integer compressed-audio format whose decode
    * replays bit-for-bit — and G.711 µ-law/A-law (tags 7/6, the
    * telephony 2:1 codecs, stateless integer expansion). */
  def decodeWav(bytes: Array[Byte]): Audio = {
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bytes.length >= 12 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E',
      "not a RIFF/WAVE file")
    var pos = 12
    var sampleRate = 0
    var channels = 0
    var tag = -1
    var blockAlign = 0
    var fmtSeen = false
    var dataOff = -1
    var dataSize = 0
    while (pos + 8 <= bytes.length && (dataOff < 0 || !fmtSeen)) {
      val id = new String(bytes, pos, 4, "US-ASCII")
      val size = b.getInt(pos + 4)
      val body = pos + 8
      // payloads are untrusted opaque columns: a negative size would
      // stall the walk, an oversized one would run off the buffer
      require(size >= 0 && body + size.toLong <= bytes.length,
        s"bad RIFF chunk '$id': size $size at offset $pos")
      id match {
        case "fmt " =>
          require(size >= 16, "fmt chunk too small")
          tag = b.getShort(body) & 0xFFFF
          require(tag == 1 || tag == 6 || tag == 7 || tag == 0x11,
            s"only PCM (1), A-law (6), mu-law (7) or IMA ADPCM (0x11) " +
              s"supported, got $tag")
          channels = b.getShort(body + 2) & 0xFFFF
          sampleRate = b.getInt(body + 4)
          blockAlign = b.getShort(body + 12) & 0xFFFF
          val bits = b.getShort(body + 14) & 0xFFFF
          if (tag == 1) require(bits == 16,
            s"only 16-bit PCM supported, got $bits")
          else if (tag == 6 || tag == 7) {
            require(bits == 8, s"G.711 must be 8-bit, got $bits")
            require(channels == 1, s"G.711 path is mono, got $channels")
          } else {
            require(bits == 4, s"IMA ADPCM must be 4-bit, got $bits")
            require(channels == 1 || channels == 2,
              s"IMA ADPCM supports mono/stereo, got $channels channels")
          }
          fmtSeen = true
        case "data" =>
          dataOff = body; dataSize = size
        case _ => // LIST, fact, ... — skip per the container spec
      }
      pos = body + size + (size & 1) // chunks are 2-byte aligned
    }
    require(fmtSeen, "missing fmt chunk")
    require(dataOff >= 0, "missing data chunk")
    val samples =
      if (tag == 1) {
        val n = dataSize / 2
        val out = new Array[Short](n)
        var i = 0
        while (i < n) { out(i) = b.getShort(dataOff + i * 2); i += 1 }
        out
      } else if (tag == 6 || tag == 7) {
        val out = new Array[Short](dataSize)
        var i = 0
        while (i < dataSize) {
          val c = bytes(dataOff + i) & 0xFF
          out(i) = (if (tag == 7) ulaw2linear(c) else alaw2linear(c)).toShort
          i += 1
        }
        out
      } else decodeImaBlocks(bytes, dataOff, dataSize, blockAlign, channels)
    Audio(sampleRate, channels, samples)
  }

  /** Decode an audio payload by sniffing its magic bytes — the audio
    * twin of [[decodeImage]]: RIFF/WAVE PCM16 or FLAC ([[Flac]]), so
    * the audio operators stay format-blind and a mixed corpus decodes
    * through one seam. FLAC is lossless integer PCM, so every
    * per-sample oracle that replays the WAV arithmetic replays a FLAC
    * decode bit-for-bit. */
  def decodeAudio(bytes: Array[Byte]): Audio =
    if (bytes.length >= 4 && bytes(0) == 'f' && bytes(1) == 'L' &&
      bytes(2) == 'a' && bytes(3) == 'C') Flac.decode(bytes)
    else if (bytes.length >= 4 && bytes(0) == 'F' && bytes(1) == 'O' &&
      bytes(2) == 'R' && bytes(3) == 'M') Aiff.decode(bytes)
    else decodeWav(bytes)

  /** Apply an EXIF orientation (1..8) to a decoded raster — the
    * rotate/flip family phone cameras record instead of rewriting the
    * scan: 1 identity, 2 mirror-H, 3 rotate 180, 4 mirror-V,
    * 5 transpose, 6 rotate 90 CW, 7 transverse, 8 rotate 270 CW.
    * Orientations ≥ 5 swap the output dimensions. One pass, any
    * channel count; pure index remap, no resampling. */
  def applyOrientation(img: Image, o: Int): Image = {
    require(o >= 1 && o <= 8, s"EXIF orientation must be 1..8, got $o")
    if (o == 1) return img
    val (w, h, ch) = (img.width, img.height, img.channels)
    val (ow, oh) = if (o >= 5) (h, w) else (w, h)
    val out = new Array[Byte](img.pixels.length)
    var r = 0
    while (r < h) {
      var c = 0
      while (c < w) {
        var nr = 0; var nc = 0
        (o: @unchecked) match {
          case 2 => nr = r; nc = w - 1 - c
          case 3 => nr = h - 1 - r; nc = w - 1 - c
          case 4 => nr = h - 1 - r; nc = c
          case 5 => nr = c; nc = r
          case 6 => nr = c; nc = h - 1 - r
          case 7 => nr = w - 1 - c; nc = h - 1 - r
          case 8 => nr = w - 1 - c; nc = r
        }
        var k = 0
        while (k < ch) {
          out((nr * ow + nc) * ch + k) = img.pixels((r * w + c) * ch + k)
          k += 1
        }
        c += 1
      }
      r += 1
    }
    Image(ow, oh, ch, out)
  }

  /** Decode an image payload by sniffing its magic bytes — callers hold
    * opaque binary columns and must not need to trust a format tag. */
  def decodeImage(bytes: Array[Byte]): Image =
    if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M') decodeBmp(bytes)
    else if (bytes.length >= 2 && (bytes(0) & 0xFF) == 0xFF &&
      (bytes(1) & 0xFF) == 0xD8) Jpeg.decode(bytes)
    else if (bytes.length >= 4 && (bytes(0) & 0xFF) == 0x89 &&
      bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G') Png.decode(bytes)
    else if (bytes.length >= 4 && bytes(0) == 'G' && bytes(1) == 'I' &&
      bytes(2) == 'F' && bytes(3) == '8') Gif.decode(bytes)
    // TGA has no magic: strict header plausibility, checked LAST among
    // the binary formats (Netpbm's 'P' puts 0x35/0x36 where TGA keeps
    // colorMapType = 0, so the two cannot collide)
    else if (Tga.looksLikeTga(bytes)) Tga.decode(bytes)
    else decodeNetpbm(bytes)

  /** Walk a CONCATENATION of binary P5 frames — the minimal motion-PGM
    * "video" container (every frame is a self-describing PGM, frames
    * abut with no index): each header is parsed, its raster length
    * computed, and the walk advances to the next frame until the bytes
    * are exhausted. Frame geometry may vary frame to frame. */
  def decodePgmFrames(bytes: Array[Byte]): IndexedSeq[Image] = {
    val out = IndexedSeq.newBuilder[Image]
    var pos = 0
    def nextToken(): Int = {
      var inComment = false
      while (pos < bytes.length &&
        (inComment || bytes(pos).toChar.isWhitespace || bytes(pos) == '#')) {
        if (bytes(pos) == '#') inComment = true
        else if (bytes(pos) == '\n') inComment = false
        pos += 1
      }
      require(pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9',
        "expected a decimal token in a PGM frame header")
      var v = 0
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
        v = v * 10 + (bytes(pos) - '0'); pos += 1
        require(v < (1 << 20), "PGM frame header token out of range")
      }
      v
    }
    while (pos < bytes.length) {
      require(pos + 2 <= bytes.length && bytes(pos) == 'P' && bytes(pos + 1) == '5',
        s"expected a P5 frame at offset $pos")
      pos += 2
      val w = nextToken(); val h = nextToken(); val maxval = nextToken()
      require(w > 0 && h > 0 && maxval > 0 && maxval < 256,
        s"bad PGM frame ${w}x$h maxval=$maxval")
      pos += 1 // the single whitespace byte after maxval
      val n = w * h
      require(bytes.length >= pos + n, "truncated PGM frame raster")
      out += Image(w, h, 1, java.util.Arrays.copyOfRange(bytes, pos, pos + n))
      pos += n
    }
    out.result()
  }
}
