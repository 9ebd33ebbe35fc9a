package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

/** From-spec baseline TIFF 6.0 (Adobe, public spec): uncompressed 8-bit
  * grayscale, single IFD, multi-strip, BOTH byte orders ("II" little /
  * "MM" big). TIFF is the one mainstream raster container whose header
  * is a typed TAG DIRECTORY rather than a fixed struct — decoding it is
  * a metadata walk (tag, type, count, inline-value-or-offset), which is
  * exactly the "opaque binary + typed metadata" seam the multimodal
  * pipeline needs. Implemented from the public specification; the
  * reference engine contains no raster codecs (brief requirement).
  */
object Tiff {

  private val RowsPerStrip = 4

  /** Encode gray pixels as a baseline uncompressed TIFF. */
  def encodeGray(w: Int, h: Int, gray: Array[Byte],
                 bigEndian: Boolean): Array[Byte] =
    encodeGrayC(w, h, gray, bigEndian, compression = 1, predictor = 1)

  /** Encode gray pixels as a TIFF with the spec's two integer codecs:
    * compression 1 (none), 5 (LZW, ch. 13 — MSB-first packing, early
    * code-width change, clear at table-full) or 32773 (PackBits, §9 —
    * each ROW compressed separately, runs never crossing rows), and
    * predictor 1 (none) or 2 (horizontal differencing, §14 — each row
    * differenced before compression). Strips of [[RowsPerStrip]] rows
    * force the offsets/counts arrays OUT OF LINE whenever the image has
    * more than one strip, so the decoder's inline-vs-offset branch is
    * exercised by real data; a one-strip image keeps them inline
    * (left-justified in the 4-byte value field, per spec). */
  def encodeGrayC(w: Int, h: Int, gray: Array[Byte], bigEndian: Boolean,
                  compression: Int, predictor: Int): Array[Byte] = {
    require(gray.length == w * h, s"pixel count ${gray.length} != $w x $h")
    require(Set(1, 5, 32773)(compression), s"compression $compression")
    require(predictor == 1 || predictor == 2, s"predictor $predictor")
    val nStrips = math.max(1, (h + RowsPerStrip - 1) / RowsPerStrip)
    val stripBytes: IndexedSeq[Array[Byte]] = (0 until nStrips).map { i =>
      val rows = math.min(RowsPerStrip, h - i * RowsPerStrip)
      val raw = new Array[Byte](rows * w)
      System.arraycopy(gray, i * RowsPerStrip * w, raw, 0, rows * w)
      if (predictor == 2) (0 until rows).foreach(r => diffRow(raw, r * w, w))
      compression match {
        case 1 => raw
        case 5 => lzwEncode(raw)
        case 32773 =>
          val out = new java.io.ByteArrayOutputStream()
          (0 until rows).foreach { r =>
            out.write(packBitsRow(raw, r * w, w))
          }
          out.toByteArray
      }
    }
    val stripLens = stripBytes.map(_.length)
    val pixelsAt = 8
    val arraysAt = pixelsAt + stripLens.sum
    val outOfLine = nStrips > 1
    val arrayBytes = if (outOfLine) 8 * nStrips else 0
    val ifdAt = arraysAt + arrayBytes
    val nTags = if (predictor == 2) 10 else 9
    val b = ByteBuffer.allocate(ifdAt + 2 + nTags * 12 + 4)
      .order(if (bigEndian) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
    b.put((if (bigEndian) "MM" else "II").getBytes("US-ASCII"))
    b.putShort(42)
    b.putInt(ifdAt)
    stripBytes.foreach(b.put)
    val stripOffsets = stripLens.scanLeft(pixelsAt)(_ + _).init
    if (outOfLine) {
      stripOffsets.foreach(b.putInt)
      stripLens.foreach(b.putInt)
    }
    b.putShort(nTags.toShort)
    // SHORT(3) inline values are left-justified in the value field for
    // BOTH byte orders (TIFF 6.0 p.15), hence putShort + 2 pad bytes
    def tagShort(tag: Int, v: Int): Unit = {
      b.putShort(tag.toShort).putShort(3).putInt(1)
      b.putShort(v.toShort).putShort(0)
    }
    def tagLong(tag: Int, v: Int): Unit = {
      b.putShort(tag.toShort).putShort(4).putInt(1).putInt(v)
    }
    def tagLongArr(tag: Int, inlineV: Int, offset: Int): Unit = {
      b.putShort(tag.toShort).putShort(4).putInt(nStrips)
      b.putInt(if (outOfLine) offset else inlineV)
    }
    // entries in ascending tag order, as the spec requires
    tagLong(256, w) // ImageWidth
    tagLong(257, h) // ImageLength
    tagShort(258, 8) // BitsPerSample
    tagShort(259, compression) // Compression
    tagShort(262, 1) // Photometric = BlackIsZero
    tagLongArr(273, stripOffsets.head, arraysAt) // StripOffsets
    tagShort(277, 1) // SamplesPerPixel
    tagLong(278, RowsPerStrip) // RowsPerStrip
    tagLongArr(279, stripLens.head, arraysAt + 4 * nStrips) // StripByteCounts
    if (predictor == 2) tagShort(317, 2) // Predictor = horizontal
    b.putInt(0) // no next IFD
    b.array()
  }

  /** In-place horizontal differencing of one row (predictor 2). */
  private def diffRow(a: Array[Byte], at: Int, w: Int): Unit = {
    var i = w - 1
    while (i > 0) { a(at + i) = (a(at + i) - a(at + i - 1)).toByte; i -= 1 }
  }

  /** PackBits-encode one row (TIFF 6.0 §9): literal runs ≤ 128, repeat
    * runs for ≥ 2 equal bytes; never crosses the row. */
  private[sources] def packBitsRow(a: Array[Byte], at: Int,
                                   w: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < w) {
      var run = 1
      while (i + run < w && run < 128 && a(at + i + run) == a(at + i)) run += 1
      if (run >= 2) {
        out.write(1 - run); out.write(a(at + i)); i += run
      } else {
        // literal: extend until a ≥3 repeat starts or 128 bytes written
        var lit = 1
        while (i + lit < w && lit < 128 &&
          !(i + lit + 2 < w && a(at + i + lit) == a(at + i + lit + 1) &&
            a(at + i + lit) == a(at + i + lit + 2))) lit += 1
        out.write(lit - 1)
        out.write(a, at + i, lit)
        i += lit
      }
    }
    out.toByteArray
  }

  /** PackBits-decode `len` source bytes into exactly `expected` output
    * bytes (row restarts are invisible to the decoder). */
  private[sources] def unpackBits(src: Array[Byte], from: Int, len: Int,
                                  expected: Int): Array[Byte] = {
    val out = new Array[Byte](expected)
    var i = from; var o = 0; val end = from + len
    while (o < expected) {
      require(i < end, s"PackBits: truncated stream at $o/$expected")
      val n = src(i); i += 1
      if (n >= 0) {
        val cnt = n + 1
        require(i + cnt <= end && o + cnt <= expected,
          s"PackBits: literal run $cnt overflows")
        System.arraycopy(src, i, out, o, cnt); i += cnt; o += cnt
      } else if (n != -128) { // -128 is a no-op per spec
        val cnt = 1 - n
        require(i < end && o + cnt <= expected,
          s"PackBits: repeat run $cnt overflows")
        java.util.Arrays.fill(out, o, o + cnt, src(i)); i += 1; o += cnt
      }
    }
    out
  }

  /** TIFF-variant LZW encode (ch. 13): 8-bit symbols, ClearCode 256,
    * EOI 257, MSB-first bit packing, EARLY code-width change (width
    * bumps when the next free code equals 2^width − 1), clear + reset
    * at table-full. */
  private[sources] def lzwEncode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var acc = 0L; var accBits = 0
    var width = 9
    def put(code: Int): Unit = {
      acc = (acc << width) | code.toLong; accBits += width
      while (accBits >= 8) {
        out.write(((acc >>> (accBits - 8)) & 0xFF).toInt); accBits -= 8
      }
    }
    var table = Map.empty[(Int, Int), Int]
    var next = 258
    put(256) // leading clear, as the spec requires
    var wCode = -1
    var i = 0
    while (i < data.length) {
      val c = data(i) & 0xFF
      if (wCode < 0) wCode = c
      else table.get((wCode, c)) match {
        case Some(code) => wCode = code
        case None =>
          put(wCode)
          table += ((wCode, c) -> next); next += 1
          if (next == (1 << width) - 1) {
            if (width < 12) width += 1
            else { put(256); table = Map.empty; next = 258; width = 9 }
          }
          wCode = c
      }
      i += 1
    }
    if (wCode >= 0) put(wCode)
    put(257) // EOI
    if (accBits > 0) // flush, zero-padded
      out.write(((acc << (8 - accBits)) & 0xFF).toInt)
    out.toByteArray
  }

  /** TIFF-variant LZW decode of `len` source bytes into exactly
    * `expected` output bytes. The decoder's table lags the encoder's by
    * one entry, so its early width change fires at 2^width − 2
    * (libtiff's convention, ch. 13). */
  private[sources] def lzwDecode(src: Array[Byte], from: Int, len: Int,
                                 expected: Int): Array[Byte] = {
    val out = new Array[Byte](expected)
    var o = 0
    var bitPos = from.toLong * 8
    val endBit = (from + len).toLong * 8
    var width = 9
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val stack = new Array[Byte](4096)
    var next = 258
    var old = -1
    def readCode(): Int = {
      require(bitPos + width <= endBit, s"LZW: truncated stream at $o/$expected")
      var v = 0; var got = 0
      while (got < width) {
        val idx = (bitPos >> 3).toInt
        val bitOff = (bitPos & 7).toInt
        val avail = 8 - bitOff
        val take = math.min(avail, width - got)
        v = (v << take) |
          (((src(idx) & 0xFF) >> (avail - take)) & ((1 << take) - 1))
        got += take; bitPos += take
      }
      v
    }
    def firstByte(c: Int): Byte = {
      var x = c
      while (x >= 258) x = prefix(x)
      x.toByte
    }
    def emit(c: Int): Unit = {
      var sp = 0; var x = c
      while (x >= 258) { stack(sp) = suffix(x); sp += 1; x = prefix(x) }
      stack(sp) = x.toByte; sp += 1
      require(o + sp <= expected, s"LZW: output overflows $expected bytes")
      while (sp > 0) { sp -= 1; out(o) = stack(sp); o += 1 }
    }
    var done = false
    while (!done && o < expected) {
      val code = readCode()
      if (code == 256) { next = 258; width = 9; old = -1 }
      else if (code == 257) done = true
      else {
        if (old < 0) {
          require(code < 256, s"LZW: first code after clear must be a " +
            s"literal, got $code")
          emit(code)
        } else if (code < next) {
          if (next < 4096) {
            prefix(next) = old; suffix(next) = firstByte(code); next += 1
          }
          emit(code)
        } else if (code == next && next < 4096) { // KwKwK
          prefix(next) = old; suffix(next) = firstByte(old); next += 1
          emit(code)
        } else {
          throw new IllegalArgumentException(
            s"LZW: code $code beyond table size $next (width $width)")
        }
        old = code
        if (next == (1 << width) - 2 && width < 12) width += 1
      }
    }
    require(o == expected, s"LZW: produced $o of $expected bytes")
    out
  }

  final case class Decoded(image: MediaCodec.Image, nTags: Int,
                           nStrips: Int, bigEndian: Boolean)

  /** Decode via the real IFD tag walk: byte-order mark, magic 42, entry
    * scan (tag, type, count, inline value or offset), strip gather. */
  def decode(bytes: Array[Byte]): Decoded = {
    require(bytes.length >= 8, "truncated TIFF header")
    val bigEndian = (bytes(0), bytes(1)) match {
      case ('M', 'M') => true
      case ('I', 'I') => false
      case _ => throw new IllegalArgumentException("not a TIFF: bad order mark")
    }
    val b = ByteBuffer.wrap(bytes)
      .order(if (bigEndian) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
    require(b.getShort(2) == 42, "not a TIFF: bad magic")
    val ifdAt = b.getInt(4)
    val nTags = b.getShort(ifdAt) & 0xFFFF
    var tags = Map.empty[Int, (Int, Int, Int)] // tag -> (type, count, valueFieldPos)
    (0 until nTags).foreach { i =>
      val at = ifdAt + 2 + 12 * i
      tags += (b.getShort(at) & 0xFFFF) ->
        ((b.getShort(at + 2) & 0xFFFF, b.getInt(at + 4), at + 8))
    }
    def scalar(tag: Int): Int = {
      val (tpe, count, pos) = tags(tag)
      require(count == 1, s"tag $tag: expected scalar, count $count")
      tpe match {
        case 3 => b.getShort(pos) & 0xFFFF // SHORT, left-justified
        case 4 => b.getInt(pos)
        case t => throw new IllegalArgumentException(s"tag $tag: type $t")
      }
    }
    def longArray(tag: Int): IndexedSeq[Int] = {
      val (tpe, count, pos) = tags(tag)
      require(tpe == 4, s"tag $tag: expected LONG array, type $tpe")
      if (count == 1) IndexedSeq(b.getInt(pos))
      else {
        val off = b.getInt(pos)
        (0 until count).map(j => b.getInt(off + 4 * j))
      }
    }
    val compression = scalar(259)
    require(compression == 1 || compression == 5 || compression == 32773,
      s"unsupported compression $compression (none/LZW/PackBits only)")
    val predictor = if (tags.contains(317)) scalar(317) else 1
    require(predictor == 1 || predictor == 2,
      s"unsupported predictor $predictor")
    require(scalar(258) == 8, "unsupported bit depth")
    require(scalar(277) == 1, "unsupported samples per pixel")
    val (w, h) = (scalar(256), scalar(257))
    val rps = if (tags.contains(278)) scalar(278) else h
    require(rps > 0, s"RowsPerStrip $rps")
    val offsets = longArray(273)
    val counts = longArray(279)
    require(offsets.length == counts.length, "strip offset/count mismatch")
    val pixels = new Array[Byte](w * h)
    var at = 0
    offsets.indices.foreach { i =>
      // IFD-supplied offsets/counts are untrusted: validate before the
      // copy so a malformed file fails with a descriptive error, not a
      // raw ArrayIndexOutOfBounds/NegativeArraySize from arraycopy
      val rows = math.min(rps, h - i * rps)
      require(rows > 0, s"strip $i: no rows (h=$h, RowsPerStrip=$rps)")
      val expected = rows * w
      require(counts(i) >= 0 && offsets(i) >= 0 &&
        offsets(i).toLong + counts(i) <= bytes.length &&
        at.toLong + expected <= pixels.length,
        s"strip $i: offset ${offsets(i)} count ${counts(i)} out of range " +
          s"(file ${bytes.length} bytes, raster ${pixels.length})")
      compression match {
        case 1 =>
          require(counts(i) == expected,
            s"strip $i: $expected raster bytes, ${counts(i)} stored")
          System.arraycopy(bytes, offsets(i), pixels, at, counts(i))
        case 5 =>
          System.arraycopy(
            lzwDecode(bytes, offsets(i), counts(i), expected),
            0, pixels, at, expected)
        case 32773 =>
          System.arraycopy(
            unpackBits(bytes, offsets(i), counts(i), expected),
            0, pixels, at, expected)
      }
      at += expected
    }
    require(at == w * h, s"strip bytes $at != $w x $h")
    if (predictor == 2) // undo horizontal differencing, row by row
      (0 until h).foreach { r =>
        var i = 1
        while (i < w) {
          pixels(r * w + i) =
            (pixels(r * w + i) + pixels(r * w + i - 1)).toByte
          i += 1
        }
      }
    Decoded(MediaCodec.Image(w, h, 1, pixels), nTags, offsets.length, bigEndian)
  }
}
