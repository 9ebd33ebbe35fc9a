package graft.sources

/** Truevision TGA codec, written from the public TGA 2.0 file-format
  * specification — the graphics-pipeline interchange format (textures,
  * render dumps) that still ships in real image corpora. Same from-spec
  * discipline as [[Jpeg]]/[[Png]]/[[Gif]]; the reference engine has no
  * media path at all (brief requirement; no counterpart file to cite).
  *
  * Supported: image types 2 (uncompressed truecolor) and 10 (RLE
  * truecolor) at 24/32 bpp, both row origins (bottom-up default,
  * top-down via descriptor bit 5), id field skipped, color maps
  * rejected. Pixels return as row-major TOP-DOWN RGB (alpha dropped) —
  * the [[MediaCodec.Image]] contract, so feature extraction never sees
  * BGR order or bottom-up rows.
  *
  * TGA has NO magic bytes: [[MediaCodec.decodeImage]] sniffs it LAST
  * with a strict header plausibility check (colorMapType 0, a known
  * image type, 24/32 bpp), which cannot collide with the earlier
  * magic-byte formats or with Netpbm ('P' at byte 0 puts 0x35/0x36 in
  * the colorMapType slot).
  */
object Tga {

  /** Strict plausibility sniff for the magic-less header. */
  def looksLikeTga(bytes: Array[Byte]): Boolean =
    bytes.length >= 18 && bytes(1) == 0 &&
      (bytes(2) == 2 || bytes(2) == 10) &&
      ((bytes(16) & 0xFF) == 24 || (bytes(16) & 0xFF) == 32)

  private def u16(bytes: Array[Byte], at: Int): Int =
    (bytes(at) & 0xFF) | ((bytes(at + 1) & 0xFF) << 8)

  def decode(bytes: Array[Byte]): MediaCodec.Image = {
    require(bytes.length >= 18, "truncated TGA header")
    val idLen = bytes(0) & 0xFF
    require(bytes(1) == 0, "TGA: color-mapped images unsupported")
    val imageType = bytes(2) & 0xFF
    require(imageType == 2 || imageType == 10,
      s"TGA: only truecolor types 2/10 supported, got $imageType")
    val w = u16(bytes, 12)
    val h = u16(bytes, 14)
    val depth = bytes(16) & 0xFF
    require(depth == 24 || depth == 32, s"TGA: depth $depth unsupported")
    require(w > 0 && h > 0 && w.toLong * h <= (1 << 26),
      s"TGA: implausible dimensions ${w}x$h")
    val topDown = (bytes(17) & 0x20) != 0
    val bpp = depth / 8
    var pos = 18 + idLen
    // decode into the file's row order first (BGR[A] stream order)
    val n = w * h
    val px = new Array[Byte](n * 3)
    var k = 0
    def putPixel(at: Int): Unit = {
      require(at + bpp <= bytes.length, "TGA: truncated pixel data")
      // file order is B, G, R [, A] — emit RGB
      px(k * 3) = bytes(at + 2)
      px(k * 3 + 1) = bytes(at + 1)
      px(k * 3 + 2) = bytes(at)
      k += 1
    }
    if (imageType == 2) {
      while (k < n) { putPixel(pos); pos += bpp }
    } else {
      while (k < n) {
        require(pos < bytes.length, "TGA: truncated RLE stream")
        val hdr = bytes(pos) & 0xFF
        pos += 1
        val count = (hdr & 0x7F) + 1
        require(k + count <= n, s"TGA: RLE packet overruns the raster")
        if ((hdr & 0x80) != 0) { // run packet: one pixel, repeated
          val at = pos
          require(at + bpp <= bytes.length, "TGA: truncated run pixel")
          var i = 0
          while (i < count) { putPixel(at); i += 1 }
          pos += bpp
        } else { // raw packet: count literal pixels
          var i = 0
          while (i < count) { putPixel(pos); pos += bpp; i += 1 }
        }
      }
    }
    // bottom-up (the default) flips to the top-down contract
    if (topDown) MediaCodec.Image(w, h, 3, px)
    else {
      val out = new Array[Byte](n * 3)
      var r = 0
      while (r < h) {
        System.arraycopy(px, (h - 1 - r) * w * 3, out, r * w * 3, w * 3)
        r += 1
      }
      MediaCodec.Image(w, h, 3, out)
    }
  }

  /** Fixture encoder: row-major TOP-DOWN RGB in, type 2 (uncompressed)
    * or type 10 (RLE with real run detection, runs capped at 128 and
    * never crossing a scanline) out, 24 bpp BGR, either row origin.
    * Shares no pixel-order arithmetic with [[decode]]. */
  def encode(w: Int, h: Int, rgb: Array[Byte], rle: Boolean,
      topDown: Boolean): Array[Byte] = {
    require(rgb.length == w * h * 3, "encode: need w*h*3 RGB bytes")
    val out = new java.io.ByteArrayOutputStream()
    out.write(0) // no id field
    out.write(0) // no color map
    out.write(if (rle) 10 else 2)
    (0 until 5).foreach(_ => out.write(0)) // color-map spec
    out.write(0); out.write(0) // x origin
    out.write(0); out.write(0) // y origin
    out.write(w & 0xFF); out.write((w >> 8) & 0xFF)
    out.write(h & 0xFF); out.write((h >> 8) & 0xFF)
    out.write(24)
    out.write(if (topDown) 0x20 else 0x00)
    // emit rows in FILE order: top-down as-is, else bottom-up
    val rows = if (topDown) 0 until h else (h - 1) to 0 by -1
    def bgr(row: Int, colIdx: Int): (Byte, Byte, Byte) = {
      val p = (row * w + colIdx) * 3
      (rgb(p + 2), rgb(p + 1), rgb(p))
    }
    rows.foreach { row =>
      if (!rle) {
        var c = 0
        while (c < w) {
          val (b, g, r) = bgr(row, c)
          out.write(b); out.write(g); out.write(r)
          c += 1
        }
      } else {
        var c = 0
        while (c < w) {
          val first = bgr(row, c)
          var run = 1
          while (c + run < w && run < 128 && bgr(row, c + run) == first)
            run += 1
          if (run >= 2) {
            out.write(0x80 | (run - 1))
            out.write(first._1); out.write(first._2); out.write(first._3)
            c += run
          } else {
            // literal packet: extend until the next run of >= 2 starts
            var lit = 1
            while (c + lit < w && lit < 128 &&
              !(c + lit + 1 < w && bgr(row, c + lit) == bgr(row, c + lit + 1)))
              lit += 1
            out.write(lit - 1)
            var i = 0
            while (i < lit) {
              val (b, g, r) = bgr(row, c + i)
              out.write(b); out.write(g); out.write(r)
              i += 1
            }
            c += lit
          }
        }
      }
    }
    out.toByteArray
  }
}
