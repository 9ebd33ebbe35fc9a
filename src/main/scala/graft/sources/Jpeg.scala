package graft.sources

import java.io.ByteArrayOutputStream

/** Baseline-sequential JPEG (JFIF) codec, written from the public ITU-T
  * T.81 specification — the same from-spec discipline as [[HDF5]] /
  * [[Zarr]] / [[MediaCodec]]. The DECODER is the production artifact: a
  * real multimodal corpus is JPEG-dominated, and every m-family operator
  * reaches it through [[MediaCodec.decodeImage]]'s magic-byte sniff. It
  * implements the full baseline process: marker parse (SOI/APPn/COM/
  * DQT 8- and 16-bit/DHT/SOF0/DRI/SOS/RSTn/EOI), canonical Huffman
  * decode built from DHT per Annex C, byte-unstuffing (FF 00), restart
  * intervals with DC-predictor reset and byte alignment, dequantize +
  * inverse zigzag (Figure A.6), separable 2-D IDCT (A.3.3) with the
  * DC-only fast path, sample-replication chroma upsampling for any
  * H/V ∈ {1,2}, YCbCr→RGB per JFIF, and edge crop of partial MCUs.
  *
  * The ENCODER exists to make fixtures (the container ships no media
  * files): it entropy-codes CALLER-SUPPLIED quantized coefficient
  * blocks, so spec tests can exercise the AC run-length path (ZRL,
  * mid-block EOB, byte stuffing) while the oracle-checked queries use
  * flat (DC-only) blocks whose decode is integer-exact: with
  * qtable[0] = 8 and DC coefficient v−128, a DC-only block inverts to
  * the constant v (IDCT of a lone DC is dc/8 + 128 level shift), and
  * constant chroma 128 makes YCbCr→RGB the identity — so a DuckDB
  * oracle can replay decoded pixels from document bytes with no JPEG
  * knowledge, and any bug in the Huffman/marker/restart/upsample chain
  * shifts real pixel values and fails the hash compare.
  *
  * The Huffman tables are GENERATED canonical tables (all-4-bit DC
  * symbols 0..11, all-8-bit AC symbols: EOB, ZRL, runs 0..15 × sizes
  * 1..8), not the Annex K defaults — the decoder must build whatever
  * DHT arrives, so fixtures with non-default tables exercise the
  * generic path. The reference engine has no media path at all (brief
  * requirement; no counterpart file to cite).
  */
object Jpeg {

  /** Zigzag scan order, T.81 Figure A.6: zigzag position → natural
    * (row-major) coefficient index. */
  private[sources] val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** A Huffman table spec: `bits(l)` = number of codes of length l+1
    * (16 entries), `vals` = symbols in code order. */
  final case class HuffSpec(bits: Array[Int], vals: Array[Int])

  /** Fixture DC table: 12 categories, all 4-bit codes (canonical codes
    * 0000..1011 — the all-ones code is never assigned, per Annex C). */
  private[sources] val DcSpec = HuffSpec(
    Array(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0),
    (0 to 11).toArray)

  /** Fixture AC table: EOB, ZRL and every (run ≤ 15, size ≤ 8) symbol,
    * all 8-bit codes (130 of 256 — the all-ones code is never used). */
  private[sources] val AcSpec = HuffSpec(
    Array(0, 0, 0, 0, 0, 0, 0, 130, 0, 0, 0, 0, 0, 0, 0, 0),
    (Array(0x00, 0xF0) ++
      (for (r <- 0 to 15; s <- 1 to 8) yield (r << 4) | s)).toArray)

  /** Progressive fixture AC table: [[AcSpec]] plus the EOBn symbols
    * (r<<4, r = 1..14) progressive EOB runs code with. 144 symbols,
    * all 8-bit. */
  private[sources] val AcProgSpec = HuffSpec(
    Array(0, 0, 0, 0, 0, 0, 0, 144, 0, 0, 0, 0, 0, 0, 0, 0),
    (Array(0x00, 0xF0) ++
      (for (r <- 0 to 15; s <- 1 to 8) yield (r << 4) | s) ++
      (1 to 14).map(_ << 4)).toArray)

  /** Annex C canonical code assignment: symbol → (code, length). */
  private def buildEncodeTable(spec: HuffSpec): Map[Int, (Int, Int)] = {
    var code = 0
    var vi = 0
    val out = Map.newBuilder[Int, (Int, Int)]
    for (l <- 1 to 16) {
      for (_ <- 0 until spec.bits(l - 1)) {
        out += spec.vals(vi) -> (code, l)
        vi += 1
        code += 1
      }
      code <<= 1
    }
    out.result()
  }

  /** Decoder-side canonical table (T.81 F.2.2.3 DECODE): per code
    * length, the min/max code value and the index of its first symbol. */
  private final class HuffDecoder(spec: HuffSpec) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    val vals: Array[Int] = spec.vals
    locally {
      var code = 0
      var vi = 0
      for (l <- 1 to 16) {
        if (spec.bits(l - 1) == 0) { minCode(l) = 0; maxCode(l) = -1 }
        else {
          valPtr(l) = vi
          minCode(l) = code
          code += spec.bits(l - 1); vi += spec.bits(l - 1)
          maxCode(l) = code - 1
        }
        code <<= 1
      }
    }
  }

  // ----------------------------------------------------------- bit I/O

  /** MSB-first bit writer with FF→FF 00 byte stuffing. */
  private final class BitWriter(out: ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        nbits += 1
        if (nbits == 8) {
          out.write(acc & 0xFF)
          if ((acc & 0xFF) == 0xFF) out.write(0x00)
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    /** Pad to a byte boundary with 1-bits (B.1.1.5 marker alignment). */
    def flushByte(): Unit = if (nbits > 0) put(0xFF, 8 - nbits)
  }

  /** MSB-first bit reader over entropy-coded data: unstuffs FF 00 and
    * refuses to read past a marker (a well-formed stream never does). */
  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    def bit(): Int = {
      if (nbits == 0) {
        require(pos < bytes.length, "JPEG: truncated entropy stream")
        var b = bytes(pos) & 0xFF
        pos += 1
        if (b == 0xFF) {
          require(pos < bytes.length, "JPEG: truncated after FF")
          val m = bytes(pos) & 0xFF
          require(m == 0x00,
            f"JPEG: marker FF$m%02X inside an entropy segment")
          pos += 1
          b = 0xFF
        }
        acc = b; nbits = 8
      }
      nbits -= 1
      (acc >> nbits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    /** Byte-align and consume an expected RSTn marker. */
    def restart(expected: Int): Unit = {
      nbits = 0
      require(pos + 1 < bytes.length, "JPEG: truncated at restart")
      require((bytes(pos) & 0xFF) == 0xFF &&
        (bytes(pos + 1) & 0xFF) == 0xD0 + expected,
        f"JPEG: expected RST$expected at offset $pos")
      pos += 2
    }
    def decode(t: HuffDecoder): Int = {
      var code = bit()
      var l = 1
      while (t.maxCode(l) < code || t.maxCode(l) == -1) {
        require(l < 16, "JPEG: invalid Huffman code")
        code = (code << 1) | bit()
        l += 1
      }
      t.vals(t.valPtr(l) + code - t.minCode(l))
    }
    /** EXTEND (F.2.2.1): map an s-bit magnitude to a signed value. */
    def receiveExtend(s: Int): Int = {
      if (s == 0) 0
      else {
        val v = bits(s)
        if (v < (1 << (s - 1))) v - (1 << s) + 1 else v
      }
    }
  }

  // -------------------------------------------------------------- IDCT

  /** ct(x)(u) = C(u)/2 · cos((2x+1)uπ/16) — the separable half of the
    * A.3.3 inverse transform. */
  private val CosT: Array[Array[Double]] = Array.tabulate(8, 8) { (x, u) =>
    val c = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    c / 2.0 * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  /** Inverse DCT + level shift + clamp of one dequantized block
    * (natural order) into an 8×8 byte block. DC-only blocks take the
    * exact flat path (every basis at u=v=0 is constant dc/8). */
  private def idctBlock(coef: Array[Int], out: Array[Int]): Unit = {
    var allZero = true
    var i = 1
    while (i < 64 && allZero) { if (coef(i) != 0) allZero = false; i += 1 }
    if (allZero) {
      val v = clamp(math.floor(coef(0) / 8.0 + 0.5).toInt + 128)
      java.util.Arrays.fill(out, v)
      return
    }
    val tmp = new Array[Double](64) // rows transformed: G(v,x)
    var v0 = 0
    while (v0 < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) { s += coef(v0 * 8 + u) * CosT(x)(u); u += 1 }
        tmp(v0 * 8 + x) = s
        x += 1
      }
      v0 += 1
    }
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var v1 = 0
        while (v1 < 8) { s += tmp(v1 * 8 + x) * CosT(y)(v1); v1 += 1 }
        out(y * 8 + x) = clamp(math.floor(s + 0.5).toInt + 128)
        x += 1
      }
      y += 1
    }
  }

  private def clamp(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  // ----------------------------------------------------------- encoder

  /** Quant table whose DC step of 8 makes a DC coefficient of v−128
    * decode to the exact flat value v (lone-DC IDCT is dc/8 + 128). */
  private[sources] val FlatQ: Array[Int] = Array.tabulate(64)(i => if (i == 0) 8 else 16)

  /** Fixed AC texture for oracle-checked queries: quantized
    * coefficients (natural index → value, dequantized against FlatQ's
    * AC step 16). Because the DCT is linear and the DC basis is
    * constant, a block with DC v−128 plus THIS pattern decodes to
    * exactly v + [[AcPatternPixels]](y·8+x) for every integer v that
    * keeps the sum inside [0,255]: round(v + p) = v + round(p) for
    * integer v, so the irrational AC contribution rounds to one fixed
    * integer LUT computable ONCE and embedded verbatim in BOTH the
    * Spark plan and the DuckDB oracle (the c08 ndcgDisc pattern) —
    * putting the real Huffman-AC / dequant / IDCT chain under the
    * row-hash oracle instead of only under spec tests. */
  val AcPatternCoefs: Map[Int, Int] = Map(1 -> 3, 8 -> -2, 17 -> 1)

  /** round(IDCT of the dequantized [[AcPatternCoefs]]) — the exact
    * per-pixel integer offsets. The distance-from-.5 guard makes the
    * "decoder's float error cannot flip a rounding" claim checkable:
    * the separable double IDCT differs from this direct evaluation by
    * ~1e-13, far below the enforced 1e-6 margin. */
  val AcPatternPixels: Array[Int] = {
    val out = new Array[Int](64)
    for (y <- 0 until 8; x <- 0 until 8) {
      var s = 0.0
      AcPatternCoefs.foreach { case (idx, q) =>
        val u = idx % 8; val v = idx / 8
        s += q.toDouble * FlatQ(idx) * CosT(x)(u) * CosT(y)(v)
      }
      val r = math.floor(s + 0.5)
      require(math.abs(s + 0.5 - math.rint(s + 0.5)) > 1e-6,
        s"AC pattern value $s too close to a rounding boundary at ($x,$y)")
      out(y * 8 + x) = r.toInt
    }
    require(out.min >= -64 && out.max <= 63,
      "AC pattern must fit the [64,191] flat-value head-room")
    out
  }

  /** Grayscale fixture whose raster block k is flat `blockVals(k)` PLUS
    * the fixed AC texture — decodes bit-exactly to
    * `blockVals(k) + AcPatternPixels(pixel)`. Values must stay in
    * [64, 191] so no pixel clamps. */
  def encodeGrayTextured(w: Int, h: Int, blockVals: Array[Int],
                         dri: Int = 0): Array[Byte] =
    encodeGrayCoeffs(w, h, blockVals.map { v =>
      require(v >= 64 && v <= 191, s"textured value $v outside [64,191]")
      val c = new Array[Int](64)
      c(0) = v - 128
      AcPatternCoefs.foreach { case (idx, q) => c(idx) = q }
      c
    }, FlatQ, dri)

  /** [[encodeGrayTextured]]'s PROGRESSIVE twin: the same textured
    * coefficient blocks through the six-scan SOF2 path — decodes to the
    * identical raster, so the two containers share one oracle. */
  def encodeGrayTexturedProgressive(w: Int, h: Int,
                                    blockVals: Array[Int]): Array[Byte] =
    encodeGrayProgressive(w, h, blockVals.map { v =>
      require(v >= 64 && v <= 191, s"textured value $v outside [64,191]")
      val c = new Array[Int](64)
      c(0) = v - 128
      AcPatternCoefs.foreach { case (idx, q) => c(idx) = q }
      c
    }, FlatQ)

  private def writeMarker(o: ByteArrayOutputStream, m: Int): Unit = {
    o.write(0xFF); o.write(m)
  }

  private def writeSeg(o: ByteArrayOutputStream, m: Int, body: Array[Int]): Unit = {
    writeMarker(o, m)
    val len = body.length + 2
    o.write(len >> 8); o.write(len & 0xFF)
    body.foreach(b => o.write(b & 0xFF))
  }

  private def dqtBody(id: Int, q: Array[Int]): Array[Int] =
    id +: Array.tabulate(64)(z => q(Zigzag(z)))

  private def dhtBody(cls: Int, id: Int, spec: HuffSpec): Array[Int] =
    ((cls << 4) | id) +: (spec.bits ++ spec.vals)

  private def category(v: Int): Int = {
    var a = math.abs(v)
    var s = 0
    while (a != 0) { a >>= 1; s += 1 }
    s
  }

  /** Entropy-code one block of quantized coefficients (natural order):
    * DC diff then run-length AC with ZRL and EOB (F.1.2). */
  private def encodeBlock(bw: BitWriter, coef: Array[Int], pred: Int,
                          dcT: Map[Int, (Int, Int)],
                          acT: Map[Int, (Int, Int)]): Int = {
    val diff = coef(0) - pred
    val s = category(diff)
    val (dcode, dlen) = dcT(s)
    bw.put(dcode, dlen)
    if (s > 0) bw.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
    var lastNz = 0
    var i = 63
    while (i > 0 && lastNz == 0) { if (coef(Zigzag(i)) != 0) lastNz = i; i -= 1 }
    var run = 0
    var z = 1
    while (z <= lastNz) {
      val c = coef(Zigzag(z))
      if (c == 0) run += 1
      else {
        while (run > 15) { val (zc, zl) = acT(0xF0); bw.put(zc, zl); run -= 16 }
        val sz = category(c)
        val (code, len) = acT((run << 4) | sz)
        bw.put(code, len)
        bw.put(if (c < 0) c + (1 << sz) - 1 else c, sz)
        run = 0
      }
      z += 1
    }
    if (lastNz < 63) { val (ec, el) = acT(0x00); bw.put(ec, el) }
    coef(0)
  }

  /** Encode a GRAYSCALE baseline JPEG from caller-supplied quantized
    * coefficient blocks (raster order, natural-order 64 coefficients
    * each, quantized against `q`). `dri` > 0 writes a DRI segment and
    * RSTn markers every `dri` MCUs (grayscale MCU = one block). */
  def encodeGrayCoeffs(w: Int, h: Int, blocks: Array[Array[Int]],
                       q: Array[Int] = FlatQ, dri: Int = 0): Array[Byte] = {
    val bx = (w + 7) / 8; val by = (h + 7) / 8
    require(blocks.length == bx * by, s"need ${bx * by} blocks")
    val o = new ByteArrayOutputStream()
    writeMarker(o, 0xD8) // SOI
    writeSeg(o, 0xE0, Array(0x4A, 0x46, 0x49, 0x46, 0x00, 1, 1, 0, 0, 1, 0, 1, 0, 0)) // JFIF APP0
    writeSeg(o, 0xDB, dqtBody(0, q))
    writeSeg(o, 0xC0, Array(8, h >> 8, h & 0xFF, w >> 8, w & 0xFF, 1, 1, 0x11, 0))
    writeSeg(o, 0xC4, dhtBody(0, 0, DcSpec))
    writeSeg(o, 0xC4, dhtBody(1, 0, AcSpec))
    if (dri > 0) writeSeg(o, 0xDD, Array(dri >> 8, dri & 0xFF))
    writeSeg(o, 0xDA, Array(1, 1, 0x00, 0, 63, 0))
    val dcT = buildEncodeTable(DcSpec); val acT = buildEncodeTable(AcSpec)
    var bw = new BitWriter(o)
    var pred = 0
    var rst = 0
    for (m <- blocks.indices) {
      if (dri > 0 && m > 0 && m % dri == 0) {
        bw.flushByte()
        writeMarker(o, 0xD0 + rst)
        rst = (rst + 1) % 8
        pred = 0
        bw = new BitWriter(o)
      }
      pred = encodeBlock(bw, blocks(m), pred, dcT, acT)
    }
    bw.flushByte()
    writeMarker(o, 0xD9) // EOI
    o.toByteArray
  }

  /** Grayscale fixture encode where raster block k is the flat value
    * `blockVals(k)` — decodes bit-exactly to those constants. */
  def encodeGrayFlat(w: Int, h: Int, blockVals: Array[Int], dri: Int = 0): Array[Byte] =
    encodeGrayCoeffs(w, h, blockVals.map { v =>
      require(v >= 0 && v <= 255, s"flat value $v out of range")
      val c = new Array[Int](64); c(0) = v - 128; c
    }, FlatQ, dri)

  // ------------------------------------------------------------ EXIF

  /** Minimal APP1 Exif segment: the "Exif\0\0" identifier followed by
    * a little-endian TIFF head whose IFD0 carries ONE tag — 0x0112
    * orientation (SHORT, count 1), per the public Exif 2.3 layout.
    * Fixture-side twin of [[exifOrientation]]; shares no parse code. */
  def encodeApp1Exif(orientation: Int): Array[Byte] = {
    require(orientation >= 1 && orientation <= 8,
      s"EXIF orientation must be 1..8, got $orientation")
    val tiff = java.nio.ByteBuffer.allocate(26)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    tiff.put('I'.toByte).put('I'.toByte).putShort(42).putInt(8) // IFD0 at 8
    tiff.putShort(1) // one directory entry
    tiff.putShort(0x0112).putShort(3).putInt(1) // orientation, SHORT, ×1
    tiff.putShort(orientation.toShort).putShort(0) // left-justified value
    tiff.putInt(0) // no next IFD
    val body = Array[Byte]('E', 'x', 'i', 'f', 0, 0) ++ tiff.array()
    val seg = java.nio.ByteBuffer.allocate(4 + body.length)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    seg.putShort(0xFFE1.toShort).putShort((body.length + 2).toShort).put(body)
    seg.array()
  }

  /** Splice an APPn segment directly after SOI — how cameras attach
    * metadata without re-entropy-coding the scan. */
  def spliceApp1(jpeg: Array[Byte], seg: Array[Byte]): Array[Byte] = {
    require(jpeg.length >= 2 && (jpeg(0) & 0xFF) == 0xFF &&
      (jpeg(1) & 0xFF) == 0xD8, "not a JPEG (missing SOI)")
    jpeg.take(2) ++ seg ++ jpeg.drop(2)
  }

  /** Read the EXIF orientation (IFD0 tag 0x0112) from a JPEG's APP1
    * segment; 1 (top-left, the identity) when absent — the header walk
    * mirrors [[decode]]'s marker loop but stops at the scan. Both TIFF
    * byte orders are honored (phones ship either). */
  def exifOrientation(bytes: Array[Byte]): Int = {
    var pos = 2
    while (pos + 4 <= bytes.length) {
      require((bytes(pos) & 0xFF) == 0xFF, "JPEG: bad marker in header walk")
      val m = bytes(pos + 1) & 0xFF
      if (m == 0xDA || m == 0xD9) return 1 // reached the scan: no EXIF
      val len = ((bytes(pos + 2) & 0xFF) << 8) | (bytes(pos + 3) & 0xFF)
      require(len >= 2 && pos + 2 + len <= bytes.length,
        s"JPEG: bad segment length $len at $pos")
      val body = pos + 4
      if (m == 0xE1 && len >= 16 &&
        bytes(body) == 'E' && bytes(body + 1) == 'x' &&
        bytes(body + 2) == 'i' && bytes(body + 3) == 'f' &&
        bytes(body + 4) == 0 && bytes(body + 5) == 0) {
        val t = body + 6 // TIFF head
        val le = bytes(t) == 'I'
        val bb = java.nio.ByteBuffer.wrap(bytes, t, len - 8).slice()
          .order(if (le) java.nio.ByteOrder.LITTLE_ENDIAN
            else java.nio.ByteOrder.BIG_ENDIAN)
        require(bb.getShort(2) == 42, "EXIF: bad TIFF magic")
        val ifd = bb.getInt(4)
        // IFD offset and entry count are untrusted: bound them against
        // the segment before indexing (the Tiff.decode validation
        // posture — descriptive failure, not a raw BufferUnderflow)
        // Long arithmetic: a hostile ifd near Int.MaxValue would wrap
        // `ifd + 2` negative and sneak past an Int-typed bound check
        require(ifd >= 8 && ifd.toLong + 2 <= bb.limit(),
          s"EXIF: IFD offset $ifd outside the APP1 segment")
        val n = bb.getShort(ifd) & 0xFFFF
        require(ifd.toLong + 2 + 12L * n <= bb.limit(),
          s"EXIF: $n IFD entries overflow the APP1 segment")
        var i = 0
        while (i < n) {
          val at = ifd + 2 + 12 * i
          if ((bb.getShort(at) & 0xFFFF) == 0x0112) {
            val o = bb.getShort(at + 8) & 0xFFFF
            require(o >= 1 && o <= 8, s"EXIF: orientation $o out of range")
            return o
          }
          i += 1
        }
        return 1
      }
      pos = body + len - 2
    }
    1
  }

  /** Encode a 3-component 4:2:0 YCbCr baseline JPEG whose luma blocks
    * (raster order over w/8 × h/8, w and h multiples of 16) are flat
    * values and whose chroma planes are the constants (cb, cr). MCU
    * interleave (2×2 luma + Cb + Cr) and restart handling follow
    * A.2.3; the raster→MCU block mapping happens here so decoders see
    * the spec ordering. */
  def encodeColor420Flat(w: Int, h: Int, lumaVals: Array[Int],
                         cb: Int, cr: Int, dri: Int = 0): Array[Byte] = {
    require(w % 16 == 0 && h % 16 == 0, "flat 4:2:0 fixture needs 16-aligned dims")
    val bx = w / 8; val by = h / 8
    require(lumaVals.length == bx * by, s"need ${bx * by} luma values")
    val o = new ByteArrayOutputStream()
    writeMarker(o, 0xD8)
    writeSeg(o, 0xE0, Array(0x4A, 0x46, 0x49, 0x46, 0x00, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    writeSeg(o, 0xDB, dqtBody(0, FlatQ))
    writeSeg(o, 0xDB, dqtBody(1, FlatQ))
    writeSeg(o, 0xC0, Array(8, h >> 8, h & 0xFF, w >> 8, w & 0xFF, 3,
      1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1))
    writeSeg(o, 0xC4, dhtBody(0, 0, DcSpec))
    writeSeg(o, 0xC4, dhtBody(1, 0, AcSpec))
    writeSeg(o, 0xC4, dhtBody(0, 1, DcSpec))
    writeSeg(o, 0xC4, dhtBody(1, 1, AcSpec))
    if (dri > 0) writeSeg(o, 0xDD, Array(dri >> 8, dri & 0xFF))
    writeSeg(o, 0xDA, Array(3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0))
    val dcT = buildEncodeTable(DcSpec); val acT = buildEncodeTable(AcSpec)
    var bw = new BitWriter(o)
    val preds = new Array[Int](3)
    var rst = 0
    val mcusX = w / 16; val mcusY = h / 16
    def flat(v: Int): Array[Int] = { val c = new Array[Int](64); c(0) = v - 128; c }
    var m = 0
    for (my <- 0 until mcusY; mx <- 0 until mcusX) {
      if (dri > 0 && m > 0 && m % dri == 0) {
        bw.flushByte()
        writeMarker(o, 0xD0 + rst)
        rst = (rst + 1) % 8
        java.util.Arrays.fill(preds, 0)
        bw = new BitWriter(o)
      }
      for (i <- 0 until 2; j <- 0 until 2)
        preds(0) = encodeBlock(bw,
          flat(lumaVals((2 * my + i) * bx + 2 * mx + j)), preds(0), dcT, acT)
      preds(1) = encodeBlock(bw, flat(cb), preds(1), dcT, acT)
      preds(2) = encodeBlock(bw, flat(cr), preds(2), dcT, acT)
      m += 1
    }
    bw.flushByte()
    writeMarker(o, 0xD9)
    o.toByteArray
  }

  /** Encode a GRAYSCALE PROGRESSIVE (SOF2) JPEG from quantized
    * coefficient blocks: six scans — DC first at Al=1 and its
    * refinement, then two spectral-selection AC bands ([1,5], [6,63])
    * each coded at Al=1 and refined to Al=0 — so a decoder must walk
    * DC successive approximation, band selection, EOB runs AND the
    * G.1.2.3 AC refinement protocol to reconstruct the raster. The
    * refinement emitter mirrors the decoder's traversal exactly
    * (per-span correction bits, EOB runs buffer whole blocks' bits);
    * encoder and decoder share no state, so the round trip is the
    * check. */
  def encodeGrayProgressive(w: Int, h: Int, blocks: Array[Array[Int]],
                            q: Array[Int] = FlatQ): Array[Byte] = {
    val bx = (w + 7) / 8; val by = (h + 7) / 8
    require(blocks.length == bx * by, s"need ${bx * by} blocks")
    val o = new ByteArrayOutputStream()
    writeMarker(o, 0xD8)
    writeSeg(o, 0xE0, Array(0x4A, 0x46, 0x49, 0x46, 0x00, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    writeSeg(o, 0xDB, dqtBody(0, q))
    writeSeg(o, 0xC2, Array(8, h >> 8, h & 0xFF, w >> 8, w & 0xFF, 1, 1, 0x11, 0))
    writeSeg(o, 0xC4, dhtBody(0, 0, DcSpec))
    writeSeg(o, 0xC4, dhtBody(1, 0, AcProgSpec))
    val dcT = buildEncodeTable(DcSpec); val acT = buildEncodeTable(AcProgSpec)
    def putExtend(bw: BitWriter, v: Int, sz: Int): Unit =
      bw.put(if (v < 0) v + (1 << sz) - 1 else v, sz)

    // ---- scan 1: DC first, Al = 1 (diff coding of c0 >> 1)
    writeSeg(o, 0xDA, Array(1, 1, 0x00, 0, 0, 0x01))
    var bw = new BitWriter(o)
    var pred = 0
    blocks.foreach { b =>
      val v = b(0) >> 1
      val diff = v - pred
      pred = v
      val sz = category(diff)
      val (code, len) = dcT(sz)
      bw.put(code, len)
      if (sz > 0) putExtend(bw, diff, sz)
    }
    bw.flushByte()

    // ---- scan 2: DC refinement, Ah = 1, Al = 0 (one raw bit each)
    writeSeg(o, 0xDA, Array(1, 1, 0x00, 0, 0, 0x10))
    bw = new BitWriter(o)
    blocks.foreach(b => bw.put(b(0) & 1, 1))
    bw.flushByte()

    /** EOBn: one code covers n blocks (n < 2^15): r = ⌊log₂ n⌋, then
      * n − 2^r in r extension bits. */
    def emitEobRun(bw2: BitWriter, n: Int): Unit = {
      require(n > 0 && n < 32768, s"EOB run $n out of range")
      var r = 0
      while ((2 << r) <= n) r += 1
      val (code, len) = acT(r << 4)
      bw2.put(code, len)
      if (r > 0) bw2.put(n - (1 << r), r)
    }

    def acFirstScan(ss: Int, se: Int, al: Int): Unit = {
      writeSeg(o, 0xDA, Array(1, 1, 0x00, ss, se, al))
      val bw2 = new BitWriter(o)
      var eobrun = 0
      blocks.foreach { b =>
        def v(k: Int): Int = {
          val c = b(Zigzag(k))
          if (c < 0) -((-c) >> al) else c >> al
        }
        val nz = (ss to se).filter(v(_) != 0)
        if (nz.isEmpty) eobrun += 1
        else {
          if (eobrun > 0) { emitEobRun(bw2, eobrun); eobrun = 0 }
          var run = 0
          var k = ss
          while (k <= nz.last) {
            val x = v(k)
            if (x == 0) run += 1
            else {
              while (run > 15) {
                val (zc, zl) = acT(0xF0); bw2.put(zc, zl); run -= 16
              }
              val sz = category(x)
              val (code, len) = acT((run << 4) | sz)
              bw2.put(code, len)
              putExtend(bw2, x, sz)
              run = 0
            }
            k += 1
          }
          if (nz.last < se) eobrun += 1
        }
      }
      if (eobrun > 0) emitEobRun(bw2, eobrun)
      bw2.flushByte()
    }

    /** AC refinement scan (Ah = al+1 → Al = al): mirrors the decoder's
      * G.1.2.3 traversal — correction bits interleave per span, EOB
      * runs buffer the covered blocks' trailing bits in block order. */
    def acRefineScan(ss: Int, se: Int, al: Int): Unit = {
      writeSeg(o, 0xDA, Array(1, 1, 0x00, ss, se, ((al + 1) << 4) | al))
      val bw2 = new BitWriter(o)
      val pending = scala.collection.mutable.ArrayBuffer.empty[Seq[Int]]
      def flushPending(): Unit = if (pending.nonEmpty) {
        emitEobRun(bw2, pending.size)
        pending.foreach(_.foreach(bit => bw2.put(bit, 1)))
        pending.clear()
      }
      blocks.foreach { b =>
        def mag(k: Int): Int = math.abs(b(Zigzag(k)))
        def hist(k: Int): Int = mag(k) >> (al + 1) // value known after the first scan
        def corrBit(k: Int): Int = (mag(k) >> al) & 1
        val newly = (ss to se).filter(k => hist(k) == 0 && (mag(k) >> al) == 1)
        if (newly.isEmpty) {
          pending += (ss to se).filter(hist(_) != 0).map(corrBit)
        } else {
          flushPending()
          var k = ss
          newly.foreach { j =>
            var r = (k until j).count(hist(_) == 0)
            // spans of 16 zero-history positions under ZRL, correction
            // bits interleaved exactly as the decoder walks them
            while (r > 15) {
              val (zc, zl) = acT(0xF0); bw2.put(zc, zl)
              var consumed = 0
              while (consumed < 16) {
                if (hist(k) != 0) bw2.put(corrBit(k), 1) else consumed += 1
                k += 1
              }
              r -= 16
            }
            val (code, len) = acT((r << 4) | 1)
            bw2.put(code, len)
            bw2.put(if (b(Zigzag(j)) > 0) 1 else 0, 1)
            while (k < j) {
              if (hist(k) != 0) bw2.put(corrBit(k), 1)
              k += 1
            }
            k = j + 1
          }
          if (k <= se) // trailing positions ride an EOB run
            pending += (k to se).filter(hist(_) != 0).map(corrBit)
        }
      }
      flushPending()
      bw2.flushByte()
    }

    acFirstScan(1, 5, 1)
    acFirstScan(6, 63, 1)
    acRefineScan(1, 5, 0)
    acRefineScan(6, 63, 0)
    writeMarker(o, 0xD9)
    o.toByteArray
  }

  // ----------------------------------------------------------- decoder

  private final case class Component(id: Int, hs: Int, vs: Int, tq: Int) {
    var dcTab: Int = 0
    var acTab: Int = 0
  }

  /** Decode a baseline-sequential (SOF0) or PROGRESSIVE (SOF2) JFIF
    * stream to a [[MediaCodec.Image]] (channels = 1 for grayscale, 3
    * for YCbCr→RGB). Multi-scan architecture: every scan accumulates
    * QUANTIZED coefficients into per-component block buffers
    * (progressive DC first/refine, AC spectral-selection first/refine
    * with EOB runs — T.81 G.1.2; baseline = one full-block scan), and
    * dequantization + IDCT run once at EOI. Arithmetic coding,
    * hierarchical and 12-bit streams are rejected loudly. */
  def decode(bytes: Array[Byte]): MediaCodec.Image = {
    require(bytes.length >= 4 && (bytes(0) & 0xFF) == 0xFF &&
      (bytes(1) & 0xFF) == 0xD8, "JPEG: missing SOI")
    var pos = 2
    val qtabs = new Array[Array[Int]](4)
    val dcTabs = new Array[HuffDecoder](4)
    val acTabs = new Array[HuffDecoder](4)
    var comps: Array[Component] = null
    var w = 0; var h = 0
    var dri = 0
    var progressive = false
    // per-component quantized-coefficient buffers over the MCU-padded
    // block grid (row-major, 64 ints per block)
    var coefs: Array[Array[Int]] = null
    var mcusX = 0; var mcusY = 0
    var hmax = 1; var vmax = 1

    def u16(p: Int): Int = ((bytes(p) & 0xFF) << 8) | (bytes(p + 1) & 0xFF)

    /** One entropy-coded scan. Returns the position just past its data. */
    def decodeScan(scanComps: Array[Component], ss: Int, se: Int,
                   ah: Int, al: Int, startPos: Int): Int = {
      val br = new BitReader(bytes, startPos)
      val interleaved = scanComps.length > 1
      val preds = new Array[Int](comps.length)
      var eobrun = 0
      var rst = 0
      def ciOf(c: Component): Int = comps.indexWhere(_.id == c.id)

      def fullBlock(c: Component, buf: Array[Int], off: Int, ci: Int): Unit = {
        val dcT = dcTabs(c.dcTab); val acT = acTabs(c.acTab)
        require(dcT != null && acT != null, "JPEG: missing Huffman table")
        val sbits = br.decode(dcT)
        preds(ci) += br.receiveExtend(sbits)
        buf(off) = preds(ci)
        var k = 1
        var eob = false
        while (k < 64 && !eob) {
          val rs = br.decode(acT)
          val r = rs >> 4; val sz = rs & 0x0F
          if (sz == 0) {
            if (r == 15) k += 16 // ZRL
            else eob = true
          } else {
            k += r
            require(k < 64, "JPEG: AC run past block end")
            buf(off + Zigzag(k)) = br.receiveExtend(sz)
            k += 1
          }
        }
      }

      def dcFirst(c: Component, buf: Array[Int], off: Int, ci: Int): Unit = {
        val dcT = dcTabs(c.dcTab)
        require(dcT != null, "JPEG: missing DC table")
        val sbits = br.decode(dcT)
        preds(ci) += br.receiveExtend(sbits)
        buf(off) = preds(ci) << al
      }

      def dcRefine(buf: Array[Int], off: Int): Unit =
        if (br.bit() == 1) buf(off) |= 1 << al

      def acFirst(c: Component, buf: Array[Int], off: Int): Unit = {
        if (eobrun > 0) { eobrun -= 1; return }
        val acT = acTabs(c.acTab)
        require(acT != null, "JPEG: missing AC table")
        var k = ss
        var done = false
        while (k <= se && !done) {
          val rs = br.decode(acT)
          val r = rs >> 4; val sz = rs & 0x0F
          if (sz == 0) {
            if (r == 15) k += 16 // ZRL inside the band
            else { // EOBn: run of 2^r + extension blocks ends here
              eobrun = (1 << r) - 1
              if (r > 0) eobrun += br.bits(r)
              done = true
            }
          } else {
            k += r
            require(k <= se, "JPEG: AC run past band end")
            buf(off + Zigzag(k)) = br.receiveExtend(sz) << al
            k += 1
          }
        }
      }

      /** AC successive-approximation refinement (G.1.2.3): newly
        * significant coefficients arrive as ±1·2^al after a run of
        * zero-HISTORY positions; every nonzero-history coefficient
        * passed on the way emits one correction bit. */
      def acRefine(c: Component, buf: Array[Int], off: Int): Unit = {
        val p1 = 1 << al
        val m1 = -1 << al
        def correct(z: Int): Unit = {
          if (br.bit() == 1) {
            val v = buf(off + z)
            if ((v & p1) == 0 && (-v & p1) == 0)
              buf(off + z) = if (v >= 0) v + p1 else v + m1
          }
        }
        var k = ss
        if (eobrun == 0) {
          val acT = acTabs(c.acTab)
          require(acT != null, "JPEG: missing AC table")
          var done = false
          while (k <= se && !done) {
            val rs = br.decode(acT)
            var r = rs >> 4; val sz = rs & 0x0F
            var newVal = 0
            if (sz == 0) {
              if (r < 15) {
                eobrun = (1 << r)
                if (r > 0) eobrun += br.bits(r)
                done = true // remaining band handled by the EOB branch
              }
              // r == 15: skip 16 zero-history positions below
            } else {
              require(sz == 1, "JPEG: refinement size must be 1")
              newVal = if (br.bit() == 1) p1 else m1
            }
            if (!done) {
              var placed = false
              while (k <= se && !placed) {
                val z = Zigzag(k)
                if (buf(off + z) != 0) correct(z)
                else {
                  if (r == 0) {
                    if (newVal != 0) buf(off + z) = newVal
                    placed = true
                  } else r -= 1
                }
                k += 1
              }
              require(placed || newVal == 0, "JPEG: refine run past band end")
            }
          }
        }
        if (eobrun > 0) {
          while (k <= se) {
            val z = Zigzag(k)
            if (buf(off + z) != 0) correct(z)
            k += 1
          }
          eobrun -= 1
        }
      }

      def decodeOne(c: Component, blockIdx: Int): Unit = {
        val ci = ciOf(c)
        val buf = coefs(ci)
        val off = blockIdx * 64
        if (!progressive) fullBlock(c, buf, off, ci)
        else if (ss == 0 && ah == 0) dcFirst(c, buf, off, ci)
        else if (ss == 0) dcRefine(buf, off)
        else if (ah == 0) acFirst(c, buf, off)
        else acRefine(c, buf, off)
      }

      def restartIfDue(unit: Int): Unit =
        if (dri > 0 && unit > 0 && unit % dri == 0) {
          br.restart(rst)
          rst = (rst + 1) % 8
          java.util.Arrays.fill(preds, 0)
          eobrun = 0
        }

      if (interleaved) {
        var m = 0
        while (m < mcusX * mcusY) {
          restartIfDue(m)
          val my = m / mcusX; val mx = m % mcusX
          scanComps.foreach { c =>
            val bw = mcusX * c.hs
            var bv = 0
            while (bv < c.vs) {
              var bh = 0
              while (bh < c.hs) {
                decodeOne(c, (my * c.vs + bv) * bw + mx * c.hs + bh)
                bh += 1
              }
              bv += 1
            }
          }
          m += 1
        }
      } else {
        // non-interleaved: the component's OWN block grid, no MCU padding
        val c = scanComps(0)
        val bw = mcusX * c.hs // padded stride
        val cw = (w * c.hs + hmax - 1) / hmax
        val ch = (h * c.vs + vmax - 1) / vmax
        val nbx = (cw + 7) / 8; val nby = (ch + 7) / 8
        var b = 0
        while (b < nbx * nby) {
          restartIfDue(b)
          decodeOne(c, (b / nbx) * bw + b % nbx)
          b += 1
        }
      }
      // scan forward past pad bits to the next marker
      var p = br.pos
      while (p + 1 < bytes.length &&
        !((bytes(p) & 0xFF) == 0xFF && (bytes(p + 1) & 0xFF) != 0x00 &&
          (bytes(p + 1) & 0xFF) != 0xFF)) p += 1
      p
    }

    var eoiSeen = false
    while (!eoiSeen) {
      require(pos + 2 <= bytes.length, "JPEG: truncated marker stream")
      require((bytes(pos) & 0xFF) == 0xFF, f"JPEG: expected marker at $pos")
      val m = bytes(pos + 1) & 0xFF
      if (m == 0xD9) { eoiSeen = true; pos += 2 }
      else {
        require(pos + 4 <= bytes.length, "JPEG: truncated marker stream")
        val len = u16(pos + 2)
        val body = pos + 4
        require(body + len - 2 <= bytes.length, "JPEG: truncated segment")
        m match {
          case 0xDB => // DQT: one or more tables
            var p = body
            while (p < body + len - 2) {
              val pq = (bytes(p) & 0xFF) >> 4
              val tq = bytes(p) & 0x0F
              require(pq <= 1, "JPEG: bad DQT precision")
              val q = new Array[Int](64)
              p += 1
              for (z <- 0 until 64) {
                q(Zigzag(z)) = if (pq == 0) bytes(p) & 0xFF else u16(p)
                p += (if (pq == 0) 1 else 2)
              }
              qtabs(tq) = q
            }
          case 0xC4 => // DHT: one or more tables
            var p = body
            while (p < body + len - 2) {
              val tc = (bytes(p) & 0xFF) >> 4
              val th = bytes(p) & 0x0F
              val bits = Array.tabulate(16)(i => bytes(p + 1 + i) & 0xFF)
              val n = bits.sum
              val vals = Array.tabulate(n)(i => bytes(p + 17 + i) & 0xFF)
              val dec = new HuffDecoder(HuffSpec(bits, vals))
              if (tc == 0) dcTabs(th) = dec else acTabs(th) = dec
              p += 17 + n
            }
          case 0xC0 | 0xC2 => // SOF0 baseline | SOF2 progressive
            require(comps == null, "JPEG: multiple SOF segments")
            progressive = m == 0xC2
            require((bytes(body) & 0xFF) == 8, "JPEG: only 8-bit precision")
            h = u16(body + 1); w = u16(body + 3)
            require(w > 0 && h > 0, "JPEG: zero dimensions")
            val nc = bytes(body + 5) & 0xFF
            require(nc == 1 || nc == 3, s"JPEG: $nc components unsupported")
            comps = Array.tabulate(nc) { i =>
              val p = body + 6 + 3 * i
              val c = Component(bytes(p) & 0xFF, (bytes(p + 1) & 0xFF) >> 4,
                bytes(p + 1) & 0x0F, bytes(p + 2) & 0xFF)
              require(c.hs >= 1 && c.hs <= 2 && c.vs >= 1 && c.vs <= 2,
                s"JPEG: sampling ${c.hs}x${c.vs} unsupported")
              c
            }
            hmax = comps.map(_.hs).max
            vmax = comps.map(_.vs).max
            mcusX = (w + 8 * hmax - 1) / (8 * hmax)
            mcusY = (h + 8 * vmax - 1) / (8 * vmax)
            coefs = comps.map(c =>
              new Array[Int](mcusX * c.hs * mcusY * c.vs * 64))
          case 0xC1 | 0xC3 | 0xC5 | 0xC6 | 0xC7 | 0xC9 | 0xCA | 0xCB |
               0xCD | 0xCE | 0xCF =>
            throw new IllegalArgumentException(
              f"JPEG: SOF$m%02X (unsupported coding process)")
          case 0xDD => dri = u16(body)
          case 0xDA => // SOS: scan header then entropy data
            require(comps != null, "JPEG: SOS before SOF")
            val ns = bytes(body) & 0xFF
            require(ns >= 1 && ns <= comps.length, "JPEG: bad scan comp count")
            val scanComps = Array.tabulate(ns) { i =>
              val cs = bytes(body + 1 + 2 * i) & 0xFF
              val c = comps.find(_.id == cs).getOrElse(
                throw new IllegalArgumentException(s"JPEG: unknown scan comp $cs"))
              c.dcTab = (bytes(body + 2 + 2 * i) & 0xFF) >> 4
              c.acTab = bytes(body + 2 + 2 * i) & 0x0F
              c
            }
            val ss = bytes(body + 1 + 2 * ns) & 0xFF
            val se = bytes(body + 2 + 2 * ns) & 0xFF
            val ahAl = bytes(body + 3 + 2 * ns) & 0xFF
            val (ah, al) = (ahAl >> 4, ahAl & 0x0F)
            if (!progressive)
              require(ss == 0 && se == 63 && ah == 0 && al == 0,
                "JPEG: baseline scan must cover the full block")
            else {
              require(se >= ss && se <= 63, "JPEG: bad spectral band")
              require(ss == 0 || ns == 1,
                "JPEG: progressive AC scans are single-component")
              if (ss == 0) require(se == 0, "JPEG: DC scan must have Se=0")
            }
            pos = decodeScan(scanComps, ss, se, ah, al, body + len - 2)
          case x if x >= 0xE0 && x <= 0xEF => // APPn
          case 0xFE => // COM
          case other =>
            throw new IllegalArgumentException(
              f"JPEG: marker FF$other%02X unsupported")
        }
        if (m != 0xDA) pos = body + len - 2
      }
    }
    require(comps != null, "JPEG: missing SOF")

    // dequantize + IDCT every block into per-component pixel planes
    val planes = comps.map(c => new Array[Int](mcusX * c.hs * 8 * mcusY * c.vs * 8))
    val dq = new Array[Int](64)
    val px = new Array[Int](64)
    var ci = 0
    while (ci < comps.length) {
      val c = comps(ci)
      val q = qtabs(c.tq)
      require(q != null, s"JPEG: missing quant table ${c.tq}")
      val bw = mcusX * c.hs; val bh = mcusY * c.vs
      val planeW = bw * 8
      var b = 0
      while (b < bw * bh) {
        val off = b * 64
        var i = 0
        while (i < 64) { dq(i) = coefs(ci)(off + i) * q(i); i += 1 }
        idctBlock(dq, px)
        val ox = (b % bw) * 8; val oy = (b / bw) * 8
        var yy = 0
        while (yy < 8) {
          var xx = 0
          while (xx < 8) {
            planes(ci)((oy + yy) * planeW + ox + xx) = px(yy * 8 + xx)
            xx += 1
          }
          yy += 1
        }
        b += 1
      }
      ci += 1
    }

    if (comps.length == 1) {
      val planeW = mcusX * comps(0).hs * 8
      val out = new Array[Byte](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          out(y * w + x) = planes(0)(y * planeW + x).toByte
          x += 1
        }
        y += 1
      }
      MediaCodec.Image(w, h, 1, out)
    } else {
      val out = new Array[Byte](w * h * 3)
      val pw = comps.map(c => mcusX * c.hs * 8)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          // sample-replication upsampling: src = x·Hi/Hmax, y·Vi/Vmax
          val yv = planes(0)((y * comps(0).vs / vmax) * pw(0) + x * comps(0).hs / hmax)
          val cb = planes(1)((y * comps(1).vs / vmax) * pw(1) + x * comps(1).hs / hmax)
          val cr = planes(2)((y * comps(2).vs / vmax) * pw(2) + x * comps(2).hs / hmax)
          val o = 3 * (y * w + x)
          out(o) = clamp(math.floor(yv + 1.402 * (cr - 128) + 0.5).toInt).toByte
          out(o + 1) = clamp(math.floor(
            yv - 0.344136 * (cb - 128) - 0.714136 * (cr - 128) + 0.5).toInt).toByte
          out(o + 2) = clamp(math.floor(yv + 1.772 * (cb - 128) + 0.5).toInt).toByte
          x += 1
        }
        y += 1
      }
      MediaCodec.Image(w, h, 3, out)
    }
  }
}
