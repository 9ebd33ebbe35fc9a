package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.{Deflater, Inflater}

/** Pure-JVM Blosc v1 frame codec — the numcodecs DEFAULT compressor for
  * Zarr v2 stores (`{"id": "blosc", "cname": "lz4", "shuffle": 1}`), so
  * real-world stores the reference's NCZarr path ingests
  * (HISTORY.md v1.9.0, oph_io_server_nc.c:2769 URL src_paths) are
  * overwhelmingly blosc-framed. Implemented from the public c-blosc 1.x
  * frame layout:
  *
  *   header(16) = version, versionlz, flags, typesize,
  *                nbytes(u32 LE), blocksize(u32 LE), cbytes(u32 LE)
  *   flags: bit0 byte-shuffle, bit1 memcpy (raw payload), bit2
  *          bit-shuffle, bit4 DONT_SPLIT, bits5-7 codec
  *          (0 blosclz, 1 lz4/lz4hc, 2 snappy, 3 zlib, 4 zstd)
  *   then (unless memcpy) u32-LE absolute block-start offsets, one per
  *   ceil(nbytes/blocksize) block; each block holds one stream — or
  *   `typesize` split streams when DONT_SPLIT is clear — each stream a
  *   u32-LE compressed size followed by its payload (size == raw size
  *   means the stream is stored raw; 0 means all zeros); byte-shuffle
  *   is applied per whole block after the streams are joined.
  *
  * Codecs: lz4/lz4hc (block format decoded here) and zlib. blosclz,
  * snappy, zstd and bit-shuffle are rejected with clear errors.
  * The encoder exists to build test fixtures and writer-side stores; it
  * emits the same frame shape c-blosc produces (shuffle + lz4,
  * optionally split streams).
  */
object Blosc {

  // ------------------------------------------------------------ decode

  /** Decompress one blosc frame to its raw bytes. */
  def decompress(src: Array[Byte]): Array[Byte] = {
    require(src.length >= 16, "blosc frame shorter than its header")
    val bb = ByteBuffer.wrap(src).order(ByteOrder.LITTLE_ENDIAN)
    val flags = src(2) & 0xFF
    val typesize = src(3) & 0xFF
    val nbytes = bb.getInt(4)
    val blocksize = bb.getInt(8)
    require(nbytes >= 0 && blocksize > 0, "corrupt blosc header")
    if ((flags & 0x02) != 0) // memcpy: payload stored raw after header
      return java.util.Arrays.copyOfRange(src, 16, 16 + nbytes)
    require((flags & 0x04) == 0, "blosc bit-shuffle not supported")
    val codec = flags >>> 5
    val dontSplit = (flags & 0x10) != 0
    val out = new Array[Byte](nbytes)
    val nblocks = (nbytes + blocksize - 1) / blocksize
    var j = 0
    while (j < nblocks) {
      val bstart = bb.getInt(16 + j * 4)
      val bsize = math.min(blocksize, nbytes - j * blocksize)
      val block =
        if (dontSplit || typesize <= 1 || bsize % typesize != 0)
          decodeStreams(src, bstart, bsize, 1, codec)
        else decodeStreams(src, bstart, bsize, typesize, codec)
      val shuffled = if ((flags & 0x01) != 0 && typesize > 1 &&
        bsize % typesize == 0) unshuffle(block, typesize) else block
      System.arraycopy(shuffled, 0, out, j * blocksize, bsize)
      j += 1
    }
    out
  }

  /** One block = `nstreams` independently compressed streams, each led
    * by its u32 compressed size. */
  private def decodeStreams(src: Array[Byte], start: Int, bsize: Int,
      nstreams: Int, codec: Int): Array[Byte] = {
    val out = new Array[Byte](bsize)
    val ebytes = bsize / nstreams
    var p = start
    var s = 0
    while (s < nstreams) {
      val cb = ((src(p) & 0xFF) | ((src(p + 1) & 0xFF) << 8) |
        ((src(p + 2) & 0xFF) << 16) | ((src(p + 3) & 0xFF) << 24))
      p += 4
      if (cb == 0) () // all-zero stream: out already zeroed
      else if (cb == ebytes) { // stored raw
        System.arraycopy(src, p, out, s * ebytes, ebytes); p += cb
      } else {
        codec match {
          case 1 => lz4Decompress(src, p, cb, out, s * ebytes, ebytes)
          case 3 => zlibInflate(src, p, cb, out, s * ebytes, ebytes)
          case 0 => throw new IllegalArgumentException(
            "blosclz codec not supported — re-encode with cname=lz4/zlib")
          case c => throw new IllegalArgumentException(
            s"blosc codec $c (snappy/zstd) not supported")
        }
        p += cb
      }
      s += 1
    }
    out
  }

  /** Byte-shuffle inverse: stream-of-first-bytes … → interleaved. */
  private def unshuffle(b: Array[Byte], es: Int): Array[Byte] = {
    val n = b.length / es
    val out = new Array[Byte](b.length)
    var j = 0
    var byteIdx = 0
    while (byteIdx < es) {
      var i = 0
      while (i < n) { out(i * es + byteIdx) = b(j); j += 1; i += 1 }
      byteIdx += 1
    }
    out
  }

  private def shuffle(b: Array[Byte], es: Int): Array[Byte] = {
    val n = b.length / es
    val out = new Array[Byte](b.length)
    var j = 0
    var byteIdx = 0
    while (byteIdx < es) {
      var i = 0
      while (i < n) { out(j) = b(i * es + byteIdx); j += 1; i += 1 }
      byteIdx += 1
    }
    out
  }

  private def zlibInflate(src: Array[Byte], off: Int, len: Int,
      dst: Array[Byte], dstOff: Int, dstLen: Int): Unit = {
    val inf = new Inflater()
    inf.setInput(src, off, len)
    var done = 0
    while (done < dstLen && !inf.finished()) {
      val k = inf.inflate(dst, dstOff + done, dstLen - done)
      if (k == 0 && inf.needsInput())
        throw new java.io.EOFException("truncated zlib stream in blosc block")
      done += k
    }
    inf.end()
    require(done == dstLen, s"zlib stream yielded $done of $dstLen bytes")
  }

  // ------------------------------------------------------ LZ4 (block)

  /** LZ4 block-format decode (the public spec: token of 4-bit literal /
    * match lengths with 255-terminated extensions, u16 LE match offset,
    * overlap-legal match copy; the final sequence is literals only). */
  def lz4Decompress(src: Array[Byte], srcOff: Int, srcLen: Int,
      dst: Array[Byte], dstOff: Int, dstLen: Int): Unit = {
    var s = srcOff
    val sEnd = srcOff + srcLen
    var d = dstOff
    val dEnd = dstOff + dstLen
    while (d < dEnd) {
      require(s < sEnd, "truncated LZ4 block")
      val token = src(s) & 0xFF; s += 1
      var litLen = token >>> 4
      if (litLen == 15) {
        var x = 0
        do { x = src(s) & 0xFF; s += 1; litLen += x } while (x == 255)
      }
      System.arraycopy(src, s, dst, d, litLen)
      s += litLen; d += litLen
      if (d >= dEnd || s >= sEnd) {
        require(d == dEnd, "LZ4 block ended mid-output")
        return
      }
      val offset = (src(s) & 0xFF) | ((src(s + 1) & 0xFF) << 8); s += 2
      require(offset > 0 && d - offset >= dstOff, "corrupt LZ4 offset")
      var matchLen = token & 0x0F
      if (matchLen == 15) {
        var x = 0
        do { x = src(s) & 0xFF; s += 1; matchLen += x } while (x == 255)
      }
      matchLen += 4
      var m = d - offset
      var i = 0
      while (i < matchLen) { dst(d) = dst(m); d += 1; m += 1; i += 1 }
    }
  }

  /** Greedy hash-chain-free LZ4 block encoder (matches ≥ 4 via a 4-byte
    * hash table; spec end-rules respected: last 5 bytes literal, no
    * match starting within 12 bytes of the end). Correct and compact
    * rather than fast — fixtures and writer-side stores only. */
  def lz4Compress(src: Array[Byte]): Array[Byte] = {
    val n = src.length
    val out = new java.io.ByteArrayOutputStream(n + n / 250 + 16)
    def writeLen(first: Int, len: Int): Unit = {
      // `first` already carries min(len,15); emit 255-run extension
      if (len >= 15) {
        var rem = len - 15
        while (rem >= 255) { out.write(255); rem -= 255 }
        out.write(rem)
      }
    }
    if (n == 0) { out.write(0); return out.toByteArray }
    val hashBits = 13
    val table = new Array[Int](1 << hashBits)
    java.util.Arrays.fill(table, -1)
    def hash4(i: Int): Int = {
      val v = (src(i) & 0xFF) | ((src(i + 1) & 0xFF) << 8) |
        ((src(i + 2) & 0xFF) << 16) | ((src(i + 3) & 0xFF) << 24)
      (v * -1640531535) >>> (32 - hashBits) // Knuth multiplicative
    }
    var anchor = 0
    var i = 0
    val matchLimit = n - 12 // spec: last match starts ≥12 bytes from end
    while (i < matchLimit) {
      val h = hash4(i)
      val cand = table(h)
      table(h) = i
      if (cand >= 0 && i - cand <= 0xFFFF &&
        src(cand) == src(i) && src(cand + 1) == src(i + 1) &&
        src(cand + 2) == src(i + 2) && src(cand + 3) == src(i + 3)) {
        var ml = 4
        val mlMax = n - 5 - i // keep the last 5 bytes literal
        while (ml < mlMax && src(cand + ml) == src(i + ml)) ml += 1
        val litLen = i - anchor
        val token = (math.min(litLen, 15) << 4) | math.min(ml - 4, 15)
        out.write(token)
        writeLen(token >>> 4, litLen)
        out.write(src, anchor, litLen)
        val off = i - cand
        out.write(off & 0xFF); out.write((off >>> 8) & 0xFF)
        writeLen(token & 0x0F, ml - 4)
        i += ml
        anchor = i
      } else i += 1
    }
    // final literal-only sequence
    val litLen = n - anchor
    val token = math.min(litLen, 15) << 4
    out.write(token)
    writeLen(token >>> 4, litLen)
    out.write(src, anchor, litLen)
    out.toByteArray
  }

  // ------------------------------------------------------------ encode

  /** Build a blosc v1 frame: lz4 (`codec=1`) or zlib (`codec=3`), byte
    * shuffle on `typesize`, optionally split into per-byte streams like
    * c-blosc does for lz4 when `blocksize/typesize ≥ 128`. Single
    * block (fixtures and chunk-sized writes). */
  def compress(raw: Array[Byte], typesize: Int, codec: Int = 1,
      doShuffle: Boolean = true, split: Boolean = false): Array[Byte] = {
    require(codec == 1 || codec == 3, "encoder supports lz4/zlib")
    val shuffled =
      if (doShuffle && typesize > 1 && raw.length % typesize == 0)
        shuffle(raw, typesize)
      else raw
    val doSplit = split && typesize > 1 && shuffled.length % typesize == 0
    val nstreams = if (doSplit) typesize else 1
    val ebytes = shuffled.length / math.max(nstreams, 1)
    val streams = (0 until nstreams).map { s =>
      val part = java.util.Arrays.copyOfRange(shuffled, s * ebytes,
        (s + 1) * ebytes)
      val comp = codec match {
        case 1 => lz4Compress(part)
        case 3 =>
          val d = new Deflater(6)
          d.setInput(part); d.finish()
          val o = new java.io.ByteArrayOutputStream(part.length / 2 + 32)
          val buf = new Array[Byte](8192)
          while (!d.finished()) o.write(buf, 0, d.deflate(buf))
          d.end(); o.toByteArray
      }
      if (comp.length < ebytes) comp else part // raw when not smaller
    }
    val payload = streams.map(_.length + 4).sum
    val total = 16 + 4 + payload // header + one block-start entry
    val out = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    var flags = codec << 5
    if (doShuffle && typesize > 1) flags |= 0x01
    if (!doSplit) flags |= 0x10 // DONT_SPLIT
    out.put(2.toByte)            // format version
    out.put(1.toByte)            // codec format version
    out.put(flags.toByte)
    out.put(typesize.toByte)
    out.putInt(raw.length)       // nbytes
    out.putInt(raw.length)       // blocksize: single block
    out.putInt(total)            // cbytes
    out.putInt(20)               // bstarts[0]: right after this table
    streams.indices.foreach { s =>
      val comp = streams(s)
      out.putInt(if (comp.length < ebytes || ebytes == 0) comp.length else ebytes)
      out.put(if (comp.length < ebytes) comp else
        java.util.Arrays.copyOfRange(shuffled, s * ebytes, (s + 1) * ebytes))
    }
    out.array()
  }
}
