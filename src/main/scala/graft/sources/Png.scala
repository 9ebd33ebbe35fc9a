package graft.sources

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater, Inflater}

/** PNG codec written from the public specification (RFC 2083 / ISO
  * 15948) — the LOSSLESS real-world image format next to [[Jpeg]]'s
  * lossy one, and the stronger oracle surface: arbitrary per-pixel
  * content survives encode→decode bit-exactly, so a DuckDB oracle can
  * replay EVERY pixel of a PNG-carried raster from document bytes,
  * covering the full inflate + scanline-reconstruction chain (all five
  * filter types incl. Paeth) rather than JPEG's flat-block subset.
  *
  * Decoder: signature, chunk walk with CRC-32 verification on every
  * chunk, IHDR (8- or 16-bit depth; color types 0 gray / 2 RGB / 3
  * palette (8-bit only, per spec) / 4 gray+alpha / 6 RGBA; interlace
  * 0), PLTE, multi-IDAT zlib inflate, per-scanline unfilter
  * (None/Sub/Up/Average/Paeth per the spec's reconstruction functions
  * — on BYTE planes with the pixel step in bytes, so 16-bit neighbors
  * sit channels·2 back), tRNS ignored, alpha channels dropped on
  * output (the m-family consumes opaque rasters), Adam7 interlace
  * (each of the 7 passes unfiltered as its own raster, then scattered
  * onto the full grid, spec §8.2). [[decode]] follows the
  * [[MediaCodec.Image]] convention (channels 1 gray or 3 RGB),
  * serving 16-bit files through their high bytes (the spec's §13.12
  * sample-depth rescale); [[decode16]] preserves full 16-bit
  * precision as [[MediaCodec.Image16]].
  *
  * Encoder (fixture-side): IHDR/IDAT/IEND for gray or RGB, one zlib
  * stream, filter type cycling `row % 5` so every fixture exercises
  * all five filters. The encode/decode pair shares no reconstruction
  * arithmetic — the encoder applies the spec's forward filters, the
  * decoder its inverse — so a transcription error in either side
  * breaks the round trip. No reference citation: the reference engine
  * has no media path (LLM-pipeline brief requirement). */
object Png {

  private val Signature: Array[Byte] =
    Array(0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  // ------------------------------------------------------------ encode

  private def chunk(o: ByteArrayOutputStream, tpe: String, body: Array[Byte]): Unit = {
    def u32(v: Long): Unit = {
      o.write(((v >> 24) & 0xFF).toInt); o.write(((v >> 16) & 0xFF).toInt)
      o.write(((v >> 8) & 0xFF).toInt); o.write((v & 0xFF).toInt)
    }
    u32(body.length.toLong)
    val tb = tpe.getBytes("US-ASCII")
    o.write(tb)
    o.write(body)
    val crc = new CRC32()
    crc.update(tb); crc.update(body)
    u32(crc.getValue)
  }

  /** Encode an 8-bit raster (channels 1 = gray, 3 = RGB) with the
    * row-cycling filter schedule (row r uses filter r mod 5). */
  def encode(w: Int, h: Int, channels: Int, pixels: Array[Byte]): Array[Byte] = {
    require(channels == 1 || channels == 3, s"channels $channels")
    require(pixels.length == w * h * channels, "pixel buffer size")
    val bpp = channels
    val stride = w * channels
    val raw = new Array[Byte]((stride + 1) * h)
    var y = 0
    while (y < h) {
      val f = y % 5
      raw(y * (stride + 1)) = f.toByte
      var x = 0
      while (x < stride) {
        val cur = pixels(y * stride + x) & 0xFF
        val left = if (x >= bpp) pixels(y * stride + x - bpp) & 0xFF else 0
        val up = if (y > 0) pixels((y - 1) * stride + x) & 0xFF else 0
        val ul = if (x >= bpp && y > 0) pixels((y - 1) * stride + x - bpp) & 0xFF else 0
        val enc = f match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - (left + up) / 2
          case 4 => cur - paeth(left, up, ul)
        }
        raw(y * (stride + 1) + 1 + x) = (enc & 0xFF).toByte
        x += 1
      }
      y += 1
    }
    val d = new Deflater()
    d.setInput(raw); d.finish()
    val comp = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) comp.write(buf, 0, d.deflate(buf))
    d.end()
    val o = new ByteArrayOutputStream()
    o.write(Signature)
    val ihdr = new Array[Byte](13)
    def put32(a: Array[Byte], off: Int, v: Int): Unit = {
      a(off) = ((v >> 24) & 0xFF).toByte; a(off + 1) = ((v >> 16) & 0xFF).toByte
      a(off + 2) = ((v >> 8) & 0xFF).toByte; a(off + 3) = (v & 0xFF).toByte
    }
    put32(ihdr, 0, w); put32(ihdr, 4, h)
    ihdr(8) = 8 // bit depth
    ihdr(9) = (if (channels == 1) 0 else 2).toByte // gray | truecolor
    ihdr(10) = 0; ihdr(11) = 0; ihdr(12) = 0 // deflate, adaptive, no interlace
    chunk(o, "IHDR", ihdr)
    chunk(o, "IDAT", comp.toByteArray)
    chunk(o, "IEND", Array.emptyByteArray)
    o.toByteArray
  }

  /** Adam7 pass grid (spec §8.2): (x0, y0, dx, dy) per pass. */
  private val Adam7: Array[(Int, Int, Int, Int)] = Array(
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

  /** Forward-filter one independent raster (a whole image or one Adam7
    * pass — the spec treats each pass as its own image for filtering)
    * into `out` at `off`, row r using filter r mod 5. Returns the
    * bytes written. */
  private def filterImage(pw: Int, ph: Int, bpp: Int, px: Array[Byte],
                          out: Array[Byte], off: Int): Int = {
    val stride = pw * bpp
    var y = 0
    while (y < ph) {
      val f = y % 5
      out(off + y * (stride + 1)) = f.toByte
      var x = 0
      while (x < stride) {
        val cur = px(y * stride + x) & 0xFF
        val left = if (x >= bpp) px(y * stride + x - bpp) & 0xFF else 0
        val up = if (y > 0) px((y - 1) * stride + x) & 0xFF else 0
        val ul = if (x >= bpp && y > 0) px((y - 1) * stride + x - bpp) & 0xFF else 0
        val enc = f match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - (left + up) / 2
          case 4 => cur - paeth(left, up, ul)
        }
        out(off + y * (stride + 1) + 1 + x) = (enc & 0xFF).toByte
        x += 1
      }
      y += 1
    }
    ph * (stride + 1)
  }

  /** Encode with Adam7 interlacing (IHDR interlace = 1): seven reduced
    * images, each filtered independently, one zlib stream. Empty passes
    * (reduced width or height 0) contribute no scanlines, per spec. */
  def encodeAdam7(w: Int, h: Int, channels: Int, pixels: Array[Byte]): Array[Byte] = {
    require(channels == 1 || channels == 3, s"channels $channels")
    require(pixels.length == w * h * channels, "pixel buffer size")
    val bpp = channels
    val total = Adam7.map { case (x0, y0, dx, dy) =>
      val pw = if (w > x0) (w - x0 + dx - 1) / dx else 0
      val ph = if (h > y0) (h - y0 + dy - 1) / dy else 0
      if (pw == 0 || ph == 0) 0 else ph * (pw * bpp + 1)
    }.sum
    val raw = new Array[Byte](total)
    var off = 0
    Adam7.foreach { case (x0, y0, dx, dy) =>
      val pw = if (w > x0) (w - x0 + dx - 1) / dx else 0
      val ph = if (h > y0) (h - y0 + dy - 1) / dy else 0
      if (pw > 0 && ph > 0) {
        val sub = new Array[Byte](pw * ph * bpp)
        var j = 0
        while (j < ph) {
          var i = 0
          while (i < pw) {
            var c = 0
            while (c < bpp) {
              sub((j * pw + i) * bpp + c) =
                pixels(((y0 + j * dy) * w + (x0 + i * dx)) * bpp + c)
              c += 1
            }
            i += 1
          }
          j += 1
        }
        off += filterImage(pw, ph, bpp, sub, raw, off)
      }
    }
    val d = new Deflater()
    d.setInput(raw); d.finish()
    val comp = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) comp.write(buf, 0, d.deflate(buf))
    d.end()
    val o = new ByteArrayOutputStream()
    o.write(Signature)
    val ihdr = new Array[Byte](13)
    def put32(a: Array[Byte], off2: Int, v: Int): Unit = {
      a(off2) = ((v >> 24) & 0xFF).toByte; a(off2 + 1) = ((v >> 16) & 0xFF).toByte
      a(off2 + 2) = ((v >> 8) & 0xFF).toByte; a(off2 + 3) = (v & 0xFF).toByte
    }
    put32(ihdr, 0, w); put32(ihdr, 4, h)
    ihdr(8) = 8
    ihdr(9) = (if (channels == 1) 0 else 2).toByte
    ihdr(10) = 0; ihdr(11) = 0; ihdr(12) = 1 // Adam7
    chunk(o, "IHDR", ihdr)
    chunk(o, "IDAT", comp.toByteArray)
    chunk(o, "IEND", Array.emptyByteArray)
    o.toByteArray
  }

  /** Spec §6: per-scanline reconstruction of one independent raster
    * (the whole image, one Adam7 pass, or one APNG frame) starting at
    * raw(off); bpp is the pixel step in BYTES. */
  private def unfilterRaster(raw: Array[Byte], off: Int, pw: Int, ph: Int,
      bpp: Int): Array[Byte] = {
    val st = pw * bpp
    val out = new Array[Byte](st * ph)
    var y = 0
    while (y < ph) {
      val f = raw(off + y * (st + 1)) & 0xFF
      require(f <= 4, s"PNG: filter type $f")
      var x = 0
      while (x < st) {
        val v = raw(off + y * (st + 1) + 1 + x) & 0xFF
        val left = if (x >= bpp) out(y * st + x - bpp) & 0xFF else 0
        val up = if (y > 0) out((y - 1) * st + x) & 0xFF else 0
        val ul = if (x >= bpp && y > 0) out((y - 1) * st + x - bpp) & 0xFF else 0
        val r = f match {
          case 0 => v
          case 1 => v + left
          case 2 => v + up
          case 3 => v + (left + up) / 2
          case 4 => v + paeth(left, up, ul)
        }
        out(y * st + x) = (r & 0xFF).toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** Paeth predictor (spec §6.6): nearest of left/up/upper-left to
    * the linear estimate, ties broken left, up, upper-left. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  // ------------------------------------------------------------ decode

  /** Everything up to the reconstructed (defiltered, de-interlaced)
    * byte planes, shared by the 8-bit and 16-bit entry points. */
  private final case class Raw(w: Int, h: Int, colorType: Int, depth: Int,
                               palette: Array[Byte], recon: Array[Byte])

  private def decodeRaw(bytes: Array[Byte]): Raw = {
    require(bytes.length > 8 && Signature.indices.forall(i => bytes(i) == Signature(i)),
      "PNG: bad signature")
    var pos = 8
    def u32(p: Int): Long =
      ((bytes(p) & 0xFFL) << 24) | ((bytes(p + 1) & 0xFFL) << 16) |
        ((bytes(p + 2) & 0xFFL) << 8) | (bytes(p + 3) & 0xFFL)
    var w = 0; var h = 0; var colorType = -1; var interlace = 0; var depth = 0
    var palette: Array[Byte] = null
    val idat = new ByteArrayOutputStream()
    var ihdrSeen = false; var iendSeen = false
    while (pos < bytes.length && !iendSeen) {
      require(pos + 12 <= bytes.length, "PNG: truncated chunk header")
      val len = u32(pos).toInt
      val tpe = new String(bytes, pos + 4, 4, "US-ASCII")
      val body = pos + 8
      require(body + len + 4 <= bytes.length, s"PNG: truncated $tpe chunk")
      val crc = new CRC32()
      crc.update(bytes, pos + 4, 4 + len)
      require(crc.getValue == u32(body + len),
        s"PNG: CRC mismatch in $tpe chunk")
      tpe match {
        case "IHDR" =>
          require(len == 13, "PNG: bad IHDR length")
          w = u32(body).toInt; h = u32(body + 4).toInt
          require(w > 0 && h > 0, "PNG: zero dimensions")
          depth = bytes(body + 8) & 0xFF
          colorType = bytes(body + 9) & 0xFF
          require(depth == 8 || depth == 16,
            s"PNG: bit depth $depth unsupported (8/16 only)")
          require(Set(0, 2, 3, 4, 6)(colorType), s"PNG: color type $colorType")
          require(depth == 8 || colorType != 3,
            "PNG: 16-bit palette images are not in-spec (§11.2.2)")
          require((bytes(body + 10) & 0xFF) == 0, "PNG: unknown compression")
          require((bytes(body + 11) & 0xFF) == 0, "PNG: unknown filter method")
          interlace = bytes(body + 12) & 0xFF
          require(interlace == 0 || interlace == 1,
            s"PNG: interlace method $interlace")
          ihdrSeen = true
        case "PLTE" =>
          require(len % 3 == 0 && len > 0, "PNG: bad PLTE length")
          palette = java.util.Arrays.copyOfRange(bytes, body, body + len)
        case "IDAT" =>
          require(ihdrSeen, "PNG: IDAT before IHDR")
          idat.write(bytes, body, len)
        case "IEND" => iendSeen = true
        case _ => // ancillary (tEXt, tRNS, gAMA, ...) — skipped per spec
      }
      pos = body + len + 4
    }
    require(ihdrSeen && iendSeen, "PNG: missing IHDR/IEND")
    val srcCh = colorType match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
    }
    // filters operate on BYTES with the pixel step in bytes (spec §9:
    // "bpp is the number of bytes per complete pixel") — for 16-bit
    // images the left neighbor is channels·2 bytes back, the classic
    // 16-bit implementation trap
    val bpp = srcCh * (depth / 8)
    val stride = w * bpp
    def unfilterImage(raw: Array[Byte], off: Int, pw: Int, ph: Int): Array[Byte] =
      unfilterRaster(raw, off, pw, ph, bpp)
    val rawLen =
      if (interlace == 0) (stride + 1) * h
      else Adam7.map { case (x0, y0, dx, dy) =>
        val pw = if (w > x0) (w - x0 + dx - 1) / dx else 0
        val ph = if (h > y0) (h - y0 + dy - 1) / dy else 0
        if (pw == 0 || ph == 0) 0 else ph * (pw * bpp + 1)
      }.sum
    val inf = new Inflater()
    inf.setInput(idat.toByteArray)
    val raw = new Array[Byte](rawLen)
    var got = 0
    while (got < raw.length && !inf.finished()) {
      val n = inf.inflate(raw, got, raw.length - got)
      // any zero-byte round means the stream cannot make progress —
      // truncated input (needsInput) or a preset-dictionary request
      // (needsDictionary, which PNG's zlib profile forbids, RFC 2083
      // §2.2); looping on either would spin forever
      require(n > 0, if (inf.needsDictionary())
        "PNG: IDAT requests a preset dictionary (forbidden by the spec)"
      else "PNG: truncated IDAT stream")
      got += n
    }
    inf.end()
    require(got == raw.length, s"PNG: inflated $got of ${raw.length} bytes")
    val recon =
      if (interlace == 0) unfilterImage(raw, 0, w, h)
      else {
        // Adam7 de-interlace: unfilter each pass independently, scatter
        // its pixels onto the full-grid positions (spec §8.2)
        val full = new Array[Byte](stride * h)
        var off = 0
        Adam7.foreach { case (x0, y0, dx, dy) =>
          val pw = if (w > x0) (w - x0 + dx - 1) / dx else 0
          val ph = if (h > y0) (h - y0 + dy - 1) / dy else 0
          if (pw > 0 && ph > 0) {
            val sub = unfilterImage(raw, off, pw, ph)
            off += ph * (pw * bpp + 1)
            var j = 0
            while (j < ph) {
              var i = 0
              while (i < pw) {
                var c = 0
                while (c < bpp) {
                  full(((y0 + j * dy) * w + (x0 + i * dx)) * bpp + c) =
                    sub((j * pw + i) * bpp + c)
                  c += 1
                }
                i += 1
              }
              j += 1
            }
          }
        }
        full
      }
    Raw(w, h, colorType, depth, palette, recon)
  }

  /** Decode to the 8-bit [[MediaCodec.Image]] convention. 16-bit files
    * route through the most-significant byte of each sample — the
    * spec's own 16→8 scaling (§13.12: left-bit-replication truncated to
    * 8 bits IS the high byte), so the sniffing decodeImage serves
    * 16-bit scientific imagery to 8-bit consumers without a special
    * case. Full-precision consumers use [[decode16]]. */
  def decode(bytes: Array[Byte]): MediaCodec.Image = {
    val r = decodeRaw(bytes)
    val (w, h, recon, palette) = (r.w, r.h, r.recon, r.palette)
    val sb = r.depth / 8 // bytes per sample; high byte first (big-endian)
    r.colorType match {
      case 0 if sb == 1 => MediaCodec.Image(w, h, 1, recon)
      case 2 if sb == 1 => MediaCodec.Image(w, h, 3, recon)
      case 0 =>
        val out = new Array[Byte](w * h)
        var i = 0
        while (i < w * h) { out(i) = recon(2 * i); i += 1 }
        MediaCodec.Image(w, h, 1, out)
      case 2 =>
        val out = new Array[Byte](w * h * 3)
        var i = 0
        while (i < w * h * 3) { out(i) = recon(2 * i); i += 1 }
        MediaCodec.Image(w, h, 3, out)
      case 3 =>
        require(palette != null, "PNG: palette image without PLTE")
        val out = new Array[Byte](w * h * 3)
        var i = 0
        while (i < w * h) {
          val idx = recon(i) & 0xFF
          require(3 * idx + 2 < palette.length, s"PNG: palette index $idx")
          out(3 * i) = palette(3 * idx)
          out(3 * i + 1) = palette(3 * idx + 1)
          out(3 * i + 2) = palette(3 * idx + 2)
          i += 1
        }
        MediaCodec.Image(w, h, 3, out)
      case 4 => // gray+alpha: alpha dropped (opaque-raster consumers)
        val out = new Array[Byte](w * h)
        var i = 0
        while (i < w * h) { out(i) = recon(2 * sb * i); i += 1 }
        MediaCodec.Image(w, h, 1, out)
      case 6 => // RGBA: alpha dropped
        val out = new Array[Byte](w * h * 3)
        var i = 0
        while (i < w * h) {
          out(3 * i) = recon(4 * sb * i)
          out(3 * i + 1) = recon(4 * sb * i + sb)
          out(3 * i + 2) = recon(4 * sb * i + 2 * sb)
          i += 1
        }
        MediaCodec.Image(w, h, 3, out)
    }
  }

  /** Full-precision decode of a 16-bit PNG (gray / RGB / gray+alpha /
    * RGBA; alpha dropped like [[decode]]): each sample is the
    * big-endian 2-byte value, returned as an Int in [0, 65535]. */
  def decode16(bytes: Array[Byte]): MediaCodec.Image16 = {
    val r = decodeRaw(bytes)
    require(r.depth == 16, s"PNG: decode16 on a ${r.depth}-bit file")
    val (w, h, recon) = (r.w, r.h, r.recon)
    def s16(byteOff: Int): Int =
      ((recon(byteOff) & 0xFF) << 8) | (recon(byteOff + 1) & 0xFF)
    r.colorType match {
      case 0 =>
        MediaCodec.Image16(w, h, 1, Array.tabulate(w * h)(i => s16(2 * i)))
      case 2 =>
        MediaCodec.Image16(w, h, 3,
          Array.tabulate(w * h * 3)(i => s16(2 * i)))
      case 4 =>
        MediaCodec.Image16(w, h, 1, Array.tabulate(w * h)(i => s16(4 * i)))
      case 6 =>
        MediaCodec.Image16(w, h, 3,
          Array.tabulate(w * h * 3)(i => s16(8 * (i / 3) + 2 * (i % 3))))
      case o => throw new IllegalArgumentException(
        s"PNG: color type $o cannot be 16-bit")
    }
  }

  // ------------------------------------------------------------ APNG

  /** One animation frame: a sub-rectangle raster placed at (x, y) on
    * the canvas. `disposeOp` 0 = NONE, 1 = BACKGROUND (region cleared
    * before the next frame); `blendOp` 0 = SOURCE, 1 = OVER (identical
    * for the opaque gray/RGB rasters this codec serves). */
  final case class ApngFrame(x: Int, y: Int, width: Int, height: Int,
                             pixels: Array[Byte], delayNum: Int = 1,
                             delayDen: Int = 10, disposeOp: Int = 0,
                             blendOp: Int = 0)

  private def deflateBytes(raw: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(raw); d.finish()
    val out = new ByteArrayOutputStream(raw.length / 2 + 32)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def inflateExact(data: Array[Byte], len: Int,
      what: String): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(data)
    val raw = new Array[Byte](len)
    var got = 0
    while (got < len && !inf.finished()) {
      val n = inf.inflate(raw, got, len - got)
      require(n > 0, s"PNG: truncated $what stream")
      got += n
    }
    inf.end()
    require(got == len, s"PNG: $what inflated $got of $len bytes")
    raw
  }

  /** Encode an ANIMATED PNG (the W3C PNG spec's acTL/fcTL/fdAT
    * extension): 8-bit gray or RGB, frame 0 full-canvas carried by the
    * default-image IDAT (so non-APNG decoders render it — [[decode]]
    * on this output returns frame 0), later frames as sub-rectangle
    * streams split across TWO fdAT chunks each (pinning reassembly).
    * fcTL and fdAT share one sequence counter per spec; every frame is
    * its own zlib stream with the row-cycling filter schedule. */
  def encodeApng(w: Int, h: Int, channels: Int, frames: Seq[ApngFrame],
      numPlays: Int = 0): Array[Byte] = {
    require(channels == 1 || channels == 3, s"channels $channels")
    require(frames.nonEmpty, "an animation needs at least one frame")
    val f0 = frames.head
    require(f0.x == 0 && f0.y == 0 && f0.width == w && f0.height == h,
      "frame 0 is the default image and must cover the canvas")
    frames.foreach { f =>
      require(f.x >= 0 && f.y >= 0 && f.x + f.width <= w &&
        f.y + f.height <= h, "frame rect outside the canvas")
      require(f.pixels.length == f.width * f.height * channels,
        "frame pixel buffer size")
      require(f.disposeOp == 0 || f.disposeOp == 1, "dispose op")
      require(f.blendOp == 0 || f.blendOp == 1, "blend op")
    }
    val bpp = channels
    def frameZ(f: ApngFrame): Array[Byte] = {
      val raw = new Array[Byte]((f.width * bpp + 1) * f.height)
      filterImage(f.width, f.height, bpp, f.pixels, raw, 0)
      deflateBytes(raw)
    }
    def u32be(v: Int): Array[Byte] = Array(
      ((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def fctl(seq: Int, f: ApngFrame): Array[Byte] =
      u32be(seq) ++ u32be(f.width) ++ u32be(f.height) ++
        u32be(f.x) ++ u32be(f.y) ++
        Array(((f.delayNum >> 8) & 0xFF).toByte, (f.delayNum & 0xFF).toByte,
          ((f.delayDen >> 8) & 0xFF).toByte, (f.delayDen & 0xFF).toByte,
          f.disposeOp.toByte, f.blendOp.toByte)
    val o = new ByteArrayOutputStream()
    o.write(Signature)
    val ihdr = new Array[Byte](13)
    System.arraycopy(u32be(w), 0, ihdr, 0, 4)
    System.arraycopy(u32be(h), 0, ihdr, 4, 4)
    ihdr(8) = 8
    ihdr(9) = (if (channels == 1) 0 else 2).toByte
    chunk(o, "IHDR", ihdr)
    chunk(o, "acTL", u32be(frames.length) ++ u32be(numPlays))
    var seq = 0
    chunk(o, "fcTL", fctl(seq, f0)); seq += 1
    chunk(o, "IDAT", frameZ(f0))
    frames.tail.foreach { f =>
      chunk(o, "fcTL", fctl(seq, f)); seq += 1
      val z = frameZ(f)
      val cut = z.length / 2
      chunk(o, "fdAT", u32be(seq) ++ z.take(cut)); seq += 1
      chunk(o, "fdAT", u32be(seq) ++ z.drop(cut)); seq += 1
    }
    chunk(o, "IEND", Array.emptyByteArray)
    o.toByteArray
  }

  /** Decode an animated PNG and COMPOSE it: returns (numPlays, one
    * canvas snapshot per frame). Chunk CRCs verified; fcTL/fdAT
    * sequence numbers must be consecutive from 0; frame rects must sit
    * inside the canvas; dispose 0 (NONE) keeps the canvas, dispose 1
    * (BACKGROUND) clears the frame's own region before the next frame;
    * dispose 2 (PREVIOUS) is rejected loudly. 8-bit gray/RGB,
    * non-interlaced. */
  def decodeApng(bytes: Array[Byte]): (Int, IndexedSeq[MediaCodec.Image]) = {
    require(bytes.length > 8 && Signature.indices.forall(i => bytes(i) == Signature(i)),
      "PNG: bad signature")
    var pos = 8
    def u32(p: Int): Long =
      ((bytes(p) & 0xFFL) << 24) | ((bytes(p + 1) & 0xFFL) << 16) |
        ((bytes(p + 2) & 0xFFL) << 8) | (bytes(p + 3) & 0xFFL)
    var w = 0; var h = 0; var colorType = -1
    var numFrames = -1; var numPlays = 0
    var nextSeq = 0
    // open frame state: (meta fcTL fields, accumulated zlib bytes)
    final case class Fc(fw: Int, fh: Int, x: Int, y: Int, dispose: Int)
    var frames = Vector.empty[(Fc, ByteArrayOutputStream)]
    var ihdrSeen = false; var iendSeen = false; var idatSeen = false
    while (pos < bytes.length && !iendSeen) {
      require(pos + 12 <= bytes.length, "PNG: truncated chunk header")
      val len = u32(pos).toInt
      val tpe = new String(bytes, pos + 4, 4, "US-ASCII")
      val body = pos + 8
      require(body + len + 4 <= bytes.length, s"PNG: truncated $tpe chunk")
      val crc = new CRC32()
      crc.update(bytes, pos + 4, 4 + len)
      require(crc.getValue == u32(body + len), s"PNG: CRC mismatch in $tpe")
      tpe match {
        case "IHDR" =>
          require(len == 13, "PNG: bad IHDR length")
          w = u32(body).toInt; h = u32(body + 4).toInt
          require(w > 0 && h > 0, "PNG: zero dimensions")
          require((bytes(body + 8) & 0xFF) == 8,
            "APNG: 8-bit frames only")
          colorType = bytes(body + 9) & 0xFF
          require(colorType == 0 || colorType == 2,
            s"APNG: gray/RGB only, got color type $colorType")
          require((bytes(body + 12) & 0xFF) == 0,
            "APNG: interlaced frames unsupported")
          ihdrSeen = true
        case "acTL" =>
          require(ihdrSeen && !idatSeen, "APNG: acTL must precede IDAT")
          require(len == 8, "APNG: bad acTL length")
          numFrames = u32(body).toInt
          numPlays = u32(body + 4).toInt
          require(numFrames > 0, "APNG: zero frames")
        case "fcTL" =>
          require(numFrames > 0, "APNG: fcTL before acTL")
          require(len == 26, "APNG: bad fcTL length")
          val seq = u32(body).toInt
          require(seq == nextSeq,
            s"APNG: fcTL sequence $seq, expected $nextSeq")
          nextSeq += 1
          val (fw, fh) = (u32(body + 4).toInt, u32(body + 8).toInt)
          val (x, y) = (u32(body + 12).toInt, u32(body + 16).toInt)
          val dispose = bytes(body + 24) & 0xFF
          val blend = bytes(body + 25) & 0xFF
          require(fw > 0 && fh > 0 && x >= 0 && y >= 0 &&
            x + fw <= w && y + fh <= h, "APNG: frame rect outside canvas")
          require(dispose <= 1,
            s"APNG: dispose op $dispose unsupported (NONE/BACKGROUND)")
          require(blend <= 1, s"APNG: blend op $blend")
          frames :+= ((Fc(fw, fh, x, y, dispose), new ByteArrayOutputStream()))
        case "IDAT" =>
          require(frames.nonEmpty,
            "APNG: default image outside the animation is unsupported " +
              "(no fcTL before IDAT)")
          require(frames.length == 1, "APNG: IDAT after an fdAT frame")
          frames.head._2.write(bytes, body, len)
          idatSeen = true
        case "fdAT" =>
          require(len >= 4, "APNG: fdAT too short")
          val seq = u32(body).toInt
          require(seq == nextSeq,
            s"APNG: fdAT sequence $seq, expected $nextSeq")
          nextSeq += 1
          require(frames.length >= 2, "APNG: fdAT before any frame fcTL")
          frames.last._2.write(bytes, body + 4, len - 4)
        case "IEND" => iendSeen = true
        case _ => // ancillary — skipped
      }
      pos = body + len + 4
    }
    require(ihdrSeen && iendSeen, "PNG: missing IHDR/IEND")
    require(numFrames == frames.length,
      s"APNG: acTL declares $numFrames frames, found ${frames.length}")
    val f0 = frames.head._1
    require(f0.x == 0 && f0.y == 0 && f0.fw == w && f0.fh == h,
      "APNG: frame 0 must cover the canvas")
    val bpp = if (colorType == 0) 1 else 3
    val canvas = new Array[Byte](w * h * bpp)
    val out = IndexedSeq.newBuilder[MediaCodec.Image]
    var prev: Fc = null
    frames.foreach { case (fc, z) =>
      if (prev != null && prev.dispose == 1) {
        // BACKGROUND: clear the previous frame's region
        var j = 0
        while (j < prev.fh) {
          java.util.Arrays.fill(canvas,
            ((prev.y + j) * w + prev.x) * bpp,
            ((prev.y + j) * w + prev.x + prev.fw) * bpp, 0.toByte)
          j += 1
        }
      }
      val raw = inflateExact(z.toByteArray, (fc.fw * bpp + 1) * fc.fh, "frame")
      val px = unfilterRaster(raw, 0, fc.fw, fc.fh, bpp)
      var j = 0
      while (j < fc.fh) {
        System.arraycopy(px, j * fc.fw * bpp, canvas,
          ((fc.y + j) * w + fc.x) * bpp, fc.fw * bpp)
        j += 1
      }
      out += MediaCodec.Image(w, h, bpp,
        java.util.Arrays.copyOf(canvas, canvas.length))
      prev = fc
    }
    (numPlays, out.result())
  }

  /** Encode a 16-bit raster (channels 1 = gray, 3 = RGB; samples in
    * [0, 65535], stored big-endian per spec §7.1) with the same
    * row-cycling filter schedule as [[encode]] — filters run on the
    * BYTE planes with the pixel step channels·2. */
  def encode16(w: Int, h: Int, channels: Int, samples: Array[Int]): Array[Byte] = {
    require(channels == 1 || channels == 3, s"channels $channels")
    require(samples.length == w * h * channels, "sample buffer size")
    val bpp = channels * 2
    val stride = w * bpp
    val px = new Array[Byte](stride * h)
    var i = 0
    while (i < samples.length) {
      require(samples(i) >= 0 && samples(i) <= 0xFFFF,
        s"sample ${samples(i)} out of 16-bit range")
      px(2 * i) = ((samples(i) >> 8) & 0xFF).toByte
      px(2 * i + 1) = (samples(i) & 0xFF).toByte
      i += 1
    }
    val raw = new Array[Byte]((stride + 1) * h)
    filterImage(w, h, bpp, px, raw, 0)
    val d = new Deflater()
    d.setInput(raw); d.finish()
    val comp = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) comp.write(buf, 0, d.deflate(buf))
    d.end()
    val o = new ByteArrayOutputStream()
    o.write(Signature)
    val ihdr = new Array[Byte](13)
    def put32(a: Array[Byte], off: Int, v: Int): Unit = {
      a(off) = ((v >> 24) & 0xFF).toByte; a(off + 1) = ((v >> 16) & 0xFF).toByte
      a(off + 2) = ((v >> 8) & 0xFF).toByte; a(off + 3) = (v & 0xFF).toByte
    }
    put32(ihdr, 0, w); put32(ihdr, 4, h)
    ihdr(8) = 16
    ihdr(9) = (if (channels == 1) 0 else 2).toByte
    ihdr(10) = 0; ihdr(11) = 0; ihdr(12) = 0
    chunk(o, "IHDR", ihdr)
    chunk(o, "IDAT", comp.toByteArray)
    chunk(o, "IEND", Array.emptyByteArray)
    o.toByteArray
  }
}
