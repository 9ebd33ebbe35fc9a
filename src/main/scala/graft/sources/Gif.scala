package graft.sources

import java.io.ByteArrayOutputStream

/** GIF codec written from the public specification (GIF87a/GIF89a,
  * CompuServe "GRAPHICS INTERCHANGE FORMAT" + its Appendix F LZW
  * description) — the third real-world image container next to
  * [[Jpeg]] and [[Png]], and the one that puts a complete
  * variable-width LZW round under the oracle: palette indices survive
  * encode→decode bit-exactly, so per-pixel replay from document bytes
  * covers the dictionary build, code-width growth, clear-code reset
  * and sub-block framing end to end.
  *
  * Decoder: signature GIF87a/GIF89a, logical screen descriptor, global
  * color table, 0x21 extension blocks skipped by sub-block walk (so
  * 89a graphic-control/comment/application extensions pass through),
  * 0x2C image descriptor with optional LOCAL color table, full LZW
  * (variable width up to 12 bits, LSB-first bit packing, clear + EOI,
  * the `code == next free slot` K-ω-K case), trailer. Interlaced
  * images are rejected loudly (accepting them silently would scramble
  * rows). Output is channel-expanded through the palette: 3-channel
  * RGB, row-major top-down per the [[MediaCodec.Image]] convention.
  *
  * Encoder (fixture-side): GIF87a, 256-entry gray-ramp global table,
  * one non-interlaced image, REAL LZW compression (hash-keyed
  * dictionary, 12-bit cap, clear-and-reset when the table fills — not
  * a degenerate literal-only encoder, so decoding exercises
  * multi-symbol dictionary entries and mid-stream resets). Encoder and
  * decoder share no dictionary machinery — the encoder keys
  * string→code, the decoder code→(prefix, append) chains — and their
  * width schedules are offset by one as the format requires (the
  * decoder lags the encoder by exactly one table entry, so it grows
  * its width at slot 2^w − 1 where the encoder grows past 2^w − 1);
  * an off-by-one on either side breaks the round trip on any image
  * wide enough to cross a width boundary.
  *
  * No reference citation: the reference engine has no media path
  * (LLM-pipeline brief requirement, as with BMP/PNG/JPEG/WAV).
  */
object Gif {

  // ------------------------------------------------------------ encode

  /** LSB-first variable-width code packer feeding 255-byte sub-blocks. */
  private final class BitPacker(out: ByteArrayOutputStream) {
    private var acc = 0L
    private var nbits = 0
    private val block = new Array[Byte](255)
    private var blen = 0
    private def byteOut(b: Int): Unit = {
      block(blen) = b.toByte; blen += 1
      if (blen == 255) { out.write(blen); out.write(block, 0, blen); blen = 0 }
    }
    def put(code: Int, width: Int): Unit = {
      acc |= code.toLong << nbits; nbits += width
      while (nbits >= 8) { byteOut((acc & 0xFF).toInt); acc >>>= 8; nbits -= 8 }
    }
    def finish(): Unit = {
      if (nbits > 0) byteOut((acc & 0xFF).toInt)
      if (blen > 0) { out.write(blen); out.write(block, 0, blen) }
      out.write(0) // block terminator
    }
  }

  /** GIF-flavor LZW: min-code-size byte, then the compressed sub-block
    * stream. Dictionary keyed `(prefixCode << 8) | nextByte`. */
  private def lzwCompress(data: Array[Byte], minCodeSize: Int,
      out: ByteArrayOutputStream): Unit = {
    out.write(minCodeSize)
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val packer = new BitPacker(out)
    var dict = new java.util.HashMap[Integer, Integer]()
    var nextCode = eoi + 1
    var codeSize = minCodeSize + 1
    def reset(): Unit = {
      dict = new java.util.HashMap[Integer, Integer]()
      nextCode = eoi + 1; codeSize = minCodeSize + 1
    }
    packer.put(clear, codeSize)
    if (data.isEmpty) { packer.put(eoi, codeSize); packer.finish(); return }
    var cur = data(0) & 0xFF
    var i = 1
    while (i < data.length) {
      val b = data(i) & 0xFF
      val key = Integer.valueOf((cur << 8) | b)
      val hit = dict.get(key)
      if (hit != null) cur = hit.intValue()
      else {
        packer.put(cur, codeSize)
        dict.put(key, Integer.valueOf(nextCode))
        nextCode += 1
        // late change: width grows once a code that needs it EXISTS
        if (nextCode > (1 << codeSize) && codeSize < 12) codeSize += 1
        cur = b
        if (nextCode == 4096) { // table full: reset mid-stream
          packer.put(clear, codeSize); reset()
        }
      }
      i += 1
    }
    packer.put(cur, codeSize)
    packer.put(eoi, codeSize)
    packer.finish()
  }

  /** Encode a gray raster as GIF87a with a 256-entry gray-ramp global
    * color table; each pixel byte IS its palette index. */
  def encodeGray(w: Int, h: Int, pixels: Array[Byte]): Array[Byte] =
    encodeGrayFrames(w, h, Seq(pixels), animated = false)

  /** Encode full-frame gray rasters as an animated GIF89a (one graphic
    * control extension + image descriptor per frame, 4/100 s delay);
    * a single frame without `animated` emits plain GIF87a. */
  def encodeGrayFrames(w: Int, h: Int, frames: Seq[Array[Byte]],
      animated: Boolean = true): Array[Byte] = {
    require(w > 0 && w <= 0xFFFF && h > 0 && h <= 0xFFFF, s"geometry ${w}x$h")
    require(frames.nonEmpty, "at least one frame")
    frames.foreach(f => require(f.length == w * h, "pixel buffer size"))
    val out = new ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    out.write((if (animated) "GIF89a" else "GIF87a").getBytes("US-ASCII"))
    u16(w); u16(h)
    out.write(0xF7) // GCT present, color resolution 8, size 2^(7+1)=256
    out.write(0)    // background color index
    out.write(0)    // pixel aspect ratio
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
    frames.foreach { px =>
      if (animated) { // graphic control extension: no disposal, 40 ms
        out.write(0x21); out.write(0xF9); out.write(4)
        out.write(0x00); u16(4); out.write(0); out.write(0)
      }
      out.write(0x2C) // image descriptor
      u16(0); u16(0); u16(w); u16(h)
      out.write(0x00) // no local table, not interlaced
      lzwCompress(px, 8, out)
    }
    out.write(0x3B) // trailer
    out.toByteArray
  }

  // ------------------------------------------------------------ decode

  /** Decode the FIRST frame of a GIF payload to 3-channel RGB. */
  def decode(bytes: Array[Byte]): MediaCodec.Image = {
    val fs = decodeFrames(bytes, firstOnly = true)
    require(fs.nonEmpty, "GIF carries no image")
    fs.head
  }

  /** Decode every frame of a (possibly animated) GIF. Frames must be
    * FULL-frame at origin (0,0) — partial-frame animation would require
    * disposal-method compositing, which the fixtures never emit and a
    * silent accept would corrupt; such files are rejected loudly. */
  def decodeFrames(bytes: Array[Byte],
      firstOnly: Boolean = false): IndexedSeq[MediaCodec.Image] = {
    var pos = 0
    def u8(): Int = {
      require(pos < bytes.length, "truncated GIF"); val v = bytes(pos) & 0xFF
      pos += 1; v
    }
    def u16(): Int = { val lo = u8(); lo | (u8() << 8) }
    require(bytes.length >= 13, "truncated GIF")
    val sig = new String(bytes, 0, 6, "US-ASCII")
    require(sig == "GIF87a" || sig == "GIF89a", s"bad GIF signature '$sig'")
    pos = 6
    val screenW = u16(); val screenH = u16()
    val packed = u8()
    u8(); u8()   // background index, aspect
    def colorTable(sizeBits: Int): Array[Byte] = {
      val n = 1 << (sizeBits + 1)
      require(pos + 3 * n <= bytes.length, "truncated color table")
      val t = java.util.Arrays.copyOfRange(bytes, pos, pos + 3 * n)
      pos += 3 * n; t
    }
    val gct = if ((packed & 0x80) != 0) colorTable(packed & 0x07) else null
    def skipSubBlocks(): Unit = {
      var len = u8()
      while (len != 0) { pos += len; len = u8() }
    }
    val frames = IndexedSeq.newBuilder[MediaCodec.Image]
    var done = false
    while (!done) {
      u8() match {
        case 0x21 => u8(); skipSubBlocks() // extension
        case 0x3B => done = true           // trailer
        case 0x2C =>
          val left = u16(); val top = u16()
          val w = u16(); val h = u16()
          require(left == 0 && top == 0 && w == screenW && h == screenH,
            "partial-frame GIF (disposal compositing) not supported")
          val ip = u8()
          require((ip & 0x40) == 0, "interlaced GIF not supported")
          val lct = if ((ip & 0x80) != 0) colorTable(ip & 0x07) else null
          val table = if (lct != null) lct else gct
          require(table != null, "no color table for image data")
          val minCodeSize = u8()
          val dataBuf = new ByteArrayOutputStream()
          var blen = u8()
          while (blen != 0) {
            require(pos + blen <= bytes.length, "truncated image sub-block")
            dataBuf.write(bytes, pos, blen); pos += blen; blen = u8()
          }
          val idx = lzwDecode(dataBuf.toByteArray, minCodeSize, w * h)
          val nColors = table.length / 3
          val px = new Array[Byte](w * h * 3)
          var p = 0
          while (p < w * h) {
            val c = idx(p) & 0xFF
            require(c < nColors, s"palette index $c >= $nColors")
            px(3 * p) = table(3 * c)
            px(3 * p + 1) = table(3 * c + 1)
            px(3 * p + 2) = table(3 * c + 2)
            p += 1
          }
          frames += MediaCodec.Image(w, h, 3, px)
          if (firstOnly) done = true
        case b =>
          throw new IllegalArgumentException(f"unknown GIF block 0x$b%02x")
      }
    }
    frames.result()
  }

  /** LZW decode per the spec's Appendix F: the dictionary is
    * (prefixCode, appendByte) chains; `emit` walks a chain backwards
    * into `tail` and replays it forward. The decoder's width bump
    * fires when its OWN next free slot reaches 2^w — one table entry
    * earlier than the encoder's `> 2^w` rule — because the decoder
    * materializes each entry one code later than the encoder defined
    * it; the two schedules meet so that every code is read at exactly
    * the width it was written. */
  private def lzwDecode(data: Array[Byte], minCodeSize: Int,
      expected: Int): Array[Byte] = {
    require(minCodeSize >= 2 && minCodeSize <= 8, s"min code size $minCodeSize")
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val out = new Array[Byte](expected)
    var outLen = 0
    val prefix = new Array[Int](4096)
    val append = new Array[Byte](4096)
    val tail = new Array[Byte](4096)
    var nextCode = eoi + 1
    var codeSize = minCodeSize + 1
    var prev = -1
    var acc = 0L
    var nbits = 0
    var dpos = 0
    /** Append the string for `code` (which must be in the table) to the
      * output; returns its first byte. */
    def emit(code: Int): Byte = {
      var c = code
      var tlen = 0
      while (c > eoi) { tail(tlen) = append(c); tlen += 1; c = prefix(c) }
      require(c < clear, s"bad LZW chain head $c")
      require(outLen + tlen + 1 <= expected, "LZW output overruns raster")
      out(outLen) = c.toByte; outLen += 1
      var i = tlen - 1
      while (i >= 0) { out(outLen) = tail(i); outLen += 1; i -= 1 }
      c.toByte
    }
    while (true) {
      while (nbits < codeSize) {
        require(dpos < data.length, "LZW stream truncated")
        acc |= (data(dpos) & 0xFFL) << nbits; nbits += 8; dpos += 1
      }
      val code = (acc & ((1L << codeSize) - 1)).toInt
      acc >>>= codeSize; nbits -= codeSize
      if (code == clear) {
        nextCode = eoi + 1; codeSize = minCodeSize + 1; prev = -1
      } else if (code == eoi) {
        require(outLen == expected,
          s"LZW EOI after $outLen of $expected pixels")
        return out
      } else {
        val first: Byte =
          if (code < nextCode) emit(code)
          else {
            require(code == nextCode && prev >= 0,
              s"LZW code $code beyond table end $nextCode")
            // K-ω-K: the entry being defined is prev's string + its
            // own first byte
            val f = {
              var c = prev
              while (c > eoi) c = prefix(c)
              c.toByte
            }
            emit(prev)
            require(outLen + 1 <= expected, "LZW output overruns raster")
            out(outLen) = f; outLen += 1
            f
          }
        if (prev >= 0 && nextCode < 4096) {
          prefix(nextCode) = prev; append(nextCode) = first
          nextCode += 1
          if (nextCode == (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        prev = code
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
