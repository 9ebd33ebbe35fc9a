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

  /** Encode gray pixels as a baseline TIFF. Strips of [[RowsPerStrip]]
    * rows force the offsets/counts arrays OUT OF LINE whenever the
    * image has more than one strip, so the decoder's inline-vs-offset
    * branch is exercised by real data; a one-strip image keeps them
    * inline (left-justified in the 4-byte value field, per spec). */
  def encodeGray(w: Int, h: Int, gray: Array[Byte],
                 bigEndian: Boolean): Array[Byte] = {
    require(gray.length == w * h, s"pixel count ${gray.length} != $w x $h")
    val nStrips = math.max(1, (h + RowsPerStrip - 1) / RowsPerStrip)
    val stripLens = (0 until nStrips).map { i =>
      val rows = math.min(RowsPerStrip, h - i * RowsPerStrip)
      rows * w
    }
    val pixelsAt = 8
    val arraysAt = pixelsAt + gray.length
    val outOfLine = nStrips > 1
    val arrayBytes = if (outOfLine) 8 * nStrips else 0
    val ifdAt = arraysAt + arrayBytes
    val nTags = 9
    val b = ByteBuffer.allocate(ifdAt + 2 + nTags * 12 + 4)
      .order(if (bigEndian) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
    b.put((if (bigEndian) "MM" else "II").getBytes("US-ASCII"))
    b.putShort(42)
    b.putInt(ifdAt)
    b.put(gray)
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
    tagShort(259, 1) // Compression = none
    tagShort(262, 1) // Photometric = BlackIsZero
    tagLongArr(273, stripOffsets.head, arraysAt) // StripOffsets
    tagShort(277, 1) // SamplesPerPixel
    tagLong(278, RowsPerStrip) // RowsPerStrip
    tagLongArr(279, stripLens.head, arraysAt + 4 * nStrips) // StripByteCounts
    b.putInt(0) // no next IFD
    b.array()
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
    require(scalar(259) == 1, "unsupported compression")
    require(scalar(258) == 8, "unsupported bit depth")
    require(scalar(277) == 1, "unsupported samples per pixel")
    val (w, h) = (scalar(256), scalar(257))
    val offsets = longArray(273)
    val counts = longArray(279)
    require(offsets.length == counts.length, "strip offset/count mismatch")
    val pixels = new Array[Byte](w * h)
    var at = 0
    offsets.indices.foreach { i =>
      // IFD-supplied offsets/counts are untrusted: validate before the
      // copy so a malformed file fails with a descriptive error, not a
      // raw ArrayIndexOutOfBounds/NegativeArraySize from arraycopy
      require(counts(i) >= 0 && offsets(i) >= 0 &&
        offsets(i).toLong + counts(i) <= bytes.length &&
        at.toLong + counts(i) <= pixels.length,
        s"strip $i: offset ${offsets(i)} count ${counts(i)} out of range " +
          s"(file ${bytes.length} bytes, raster ${pixels.length})")
      System.arraycopy(bytes, offsets(i), pixels, at, counts(i))
      at += counts(i)
    }
    require(at == w * h, s"strip bytes $at != $w x $h")
    Decoded(MediaCodec.Image(w, h, 1, pixels), nTags, offsets.length, bigEndian)
  }
}
