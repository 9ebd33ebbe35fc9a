package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** The pure-JVM blosc/LZ4 codec: golden LZ4 byte vectors from the
  * public block-format spec, encoder/decoder round trips over every
  * frame shape (shuffle on/off, split streams, raw fallback, zlib
  * codec), and clear rejections for the unsupported corners. */
class BloscSpec extends AnyFunSuite {

  private def lz4RoundTrip(data: Array[Byte]): Unit = {
    val comp = Blosc.lz4Compress(data)
    val out = new Array[Byte](data.length)
    Blosc.lz4Decompress(comp, 0, comp.length, out, 0, out.length)
    assert(out.toSeq == data.toSeq)
  }

  test("golden bytes: hand-built LZ4 sequence with a match") {
    // token 0x54: 5 literals, match len 4+4=8; offset 5 → copies the
    // 5-byte literal run and then 3 more from the (overlapping) output
    // — the spec's overlap rule — then a final 2-literal sequence.
    val block = Array[Byte](
      0x54, 'a', 'b', 'c', 'd', 'e', 0x05, 0x00, // seq 1
      0x20, 'x', 'y')                            // final: 2 literals
      .map(_.toByte)
    val out = new Array[Byte](15)
    Blosc.lz4Decompress(block, 0, block.length, out, 0, 15)
    assert(new String(out) == "abcdeabcdeabcxy")
  }

  test("golden bytes: literal-length extension (255 continuation)") {
    // 270 literals: token 0xF0, ext 255, ext 0
    val lits = Array.tabulate(270)(i => (i % 251).toByte)
    val block = Array[Byte](0xF0.toByte, 0xFF.toByte, 0x00.toByte) ++ lits
    val out = new Array[Byte](270)
    Blosc.lz4Decompress(block, 0, block.length, out, 0, 270)
    assert(out.toSeq == lits.toSeq)
  }

  test("LZ4 round trip: compressible, incompressible, tiny, empty") {
    lz4RoundTrip(Array.fill(4096)(7.toByte))
    lz4RoundTrip(Array.tabulate(4096)(i => (i * 31 + i / 7).toByte))
    val rnd = new scala.util.Random(42)
    lz4RoundTrip(Array.fill(512)(rnd.nextInt().toByte))
    lz4RoundTrip("ab".getBytes)
    lz4RoundTrip(Array.empty[Byte])
    // repetitive text — exercises long matches and extensions
    lz4RoundTrip(("the quick brown fox " * 200).getBytes)
  }

  test("LZ4 compresses repetitive input substantially") {
    val data = ("spark" * 1000).getBytes
    assert(Blosc.lz4Compress(data).length < data.length / 10)
  }

  private def frameRoundTrip(raw: Array[Byte], typesize: Int, codec: Int,
      doShuffle: Boolean, split: Boolean): Unit = {
    val frame = Blosc.compress(raw, typesize, codec, doShuffle, split)
    assert(Blosc.decompress(frame).toSeq == raw.toSeq,
      s"typesize=$typesize codec=$codec shuffle=$doShuffle split=$split")
  }

  test("blosc frame round trips: all supported shapes") {
    val doubles = java.nio.ByteBuffer.allocate(800 * 8)
    (0 until 800).foreach(i => doubles.putDouble(i * 0.5))
    val raw = doubles.array()
    frameRoundTrip(raw, 8, 1, doShuffle = true, split = false)
    frameRoundTrip(raw, 8, 1, doShuffle = true, split = true)
    frameRoundTrip(raw, 8, 1, doShuffle = false, split = false)
    frameRoundTrip(raw, 8, 3, doShuffle = true, split = false)  // zlib
    frameRoundTrip(raw, 8, 3, doShuffle = true, split = true)
    frameRoundTrip(raw, 1, 1, doShuffle = false, split = false) // bytes
    val rnd = new scala.util.Random(7)
    frameRoundTrip(Array.fill(1024)(rnd.nextInt().toByte), 8, 1,
      doShuffle = true, split = true) // incompressible → raw streams
  }

  test("golden bytes: frame header fields") {
    val raw = Array.fill(256)(3.toByte)
    val f = Blosc.compress(raw, typesize = 8, codec = 1,
      doShuffle = true, split = false)
    assert(f(0) == 2)                 // format version
    assert((f(2) & 0x01) == 0x01)     // shuffle flag
    assert((f(2) & 0x10) == 0x10)     // DONT_SPLIT
    assert((f(2) >>> 5) == 1)         // lz4
    assert(f(3) == 8)                 // typesize
    def u32(off: Int) = (0 until 4).map(i => (f(off + i) & 0xFF) << (8 * i)).sum
    assert(u32(4) == 256)             // nbytes
    assert(u32(12) == f.length)       // cbytes
    assert(u32(16) == 20)             // bstarts[0]
  }

  test("memcpy flag: raw payload after the header") {
    val raw = "payload-bytes!!!".getBytes
    val f = new Array[Byte](16 + raw.length)
    f(0) = 2; f(2) = 0x02; f(3) = 1
    val bb = java.nio.ByteBuffer.wrap(f).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, raw.length); bb.putInt(8, raw.length)
    bb.putInt(12, f.length)
    System.arraycopy(raw, 0, f, 16, raw.length)
    assert(Blosc.decompress(f).toSeq == raw.toSeq)
  }

  test("snappy and zstd frames round trip; unknown codec ids rejected") {
    val doubles = java.nio.ByteBuffer.allocate(600 * 8)
    (0 until 600).foreach(i => doubles.putDouble(i * 0.75))
    val raw = doubles.array()
    for (codec <- Seq(2, 4); shuf <- Seq(true, false)) {
      val f = Blosc.compress(raw, 8, codec, doShuffle = shuf, split = false)
      assert(((f(2) & 0xFF) >>> 5) == codec)
      assert(Blosc.decompress(f).toSeq == raw.toSeq, s"codec=$codec shuffle=$shuf")
    }
    // undefined codec id fails loud
    val raw2 = Array.fill(64)(1.toByte)
    val f = Blosc.compress(raw2, 8, 1, doShuffle = false, split = false)
    f(2) = ((f(2) & 0x1F) | (6 << 5)).toByte
    val e = intercept[IllegalArgumentException](Blosc.decompress(f))
    assert(e.getMessage.contains("not supported"))
  }

  // ------------------------------------------------------- bit-shuffle

  test("golden bytes: bit-shuffle planes (es=1 and es=2, trimmed tail)") {
    // es=1, 8 elements: plane kk holds bit kk of each element, LSB-first
    val in1 = Array[Byte](0x80.toByte, 0, 0, 0, 0, 0, 1, 0)
    val s1 = Blosc.bitShuffle(in1, 1)
    // bit 7 of element 0 → plane 7, byte 0, bit 0; bit 0 of element 6 →
    // plane 0, byte 0, bit 6
    assert(s1(7) == 0x01.toByte && s1(0) == 0x40.toByte)
    assert(Blosc.bitUnshuffle(s1, 1).toSeq == in1.toSeq)
    // es=2, 9 elements: only the 8-element prefix is transformed, the
    // 9th element's 2 bytes are stored raw at the same offset
    val in2 = Array.tabulate(18)(i => (i * 37 + 5).toByte)
    val s2 = Blosc.bitShuffle(in2, 2)
    assert(s2(16) == in2(16) && s2(17) == in2(17))
    assert(Blosc.bitUnshuffle(s2, 2).toSeq == in2.toSeq)
  }

  test("bit-shuffle round trips for every typesize and ragged length") {
    val rnd = new scala.util.Random(13)
    for (es <- Seq(1, 2, 4, 8); n <- Seq(0, 1, 7, 8, 64, 100, 257)) {
      val raw = Array.fill(n * es + n % 3)(rnd.nextInt().toByte) // ragged
      assert(Blosc.bitUnshuffle(Blosc.bitShuffle(raw, es), es).toSeq ==
        raw.toSeq, s"es=$es len=${raw.length}")
    }
  }

  test("blosc frame with bit-shuffle flag round trips") {
    val doubles = java.nio.ByteBuffer.allocate(800 * 8)
    (0 until 800).foreach(i => doubles.putDouble(i * 0.5))
    val raw = doubles.array()
    for (codec <- Seq(0, 1, 3)) {
      val f = Blosc.compress(raw, 8, codec, doShuffle = false,
        split = false, bitShuf = true)
      assert((f(2) & 0x04) == 0x04)
      assert(Blosc.decompress(f).toSeq == raw.toSeq, s"codec=$codec")
    }
    // bit-shuffle genuinely helps smooth doubles compress
    val f = Blosc.compress(raw, 8, 1, doShuffle = false, split = false,
      bitShuf = true)
    assert(f.length < raw.length / 2)
  }

  // ----------------------------------------------------------- blosclz

  test("golden bytes: blosclz literal + near match") {
    // 5 literals "abcde", then a match of length 5 at distance 5
    val block = Array[Byte](0x04, 'a', 'b', 'c', 'd', 'e', 0x60, 0x04)
    val out = new Array[Byte](10)
    Blosc.blosclzDecompress(block, 0, block.length, out, 0, 10)
    assert(new String(out) == "abcdeabcde")
  }

  test("golden bytes: blosclz length extension and far distance") {
    // length extension: lenField 7 → len = 6 + ext + 3; ext = 0 → 9-byte
    // RLE (dist 1) after one literal
    val b1 = Array[Byte](0x00, 'z', 0xE0.toByte, 0x00, 0x00)
    val o1 = new Array[Byte](10)
    Blosc.blosclzDecompress(b1, 0, b1.length, o1, 0, 10)
    assert(new String(o1) == "z" * 10)
    // far escape: near field all-ones + code 255 → 16-bit BE offset,
    // distance = offset + 8191 + 1
    val n = 8232
    val lits = Array.tabulate(32)(i => ('a' + i % 26).toByte)
    val st = new java.io.ByteArrayOutputStream()
    st.write(31); st.write(lits, 0, 32)       // 32 literals
    // RLE run (dist 1) of 8192 bytes pushes the cursor past the near
    // range: lenField 7, ext sum = 8192 - 9 = 8183 = 32×255 + 23
    st.write(0xE0)
    var rem = 8183
    while (rem >= 255) { st.write(255); rem -= 255 }
    st.write(rem)
    st.write(0)                               // code 0 → dist 1
    // far match of 8 back to offset 0: dist = 8224 → fo = 32
    st.write((6 << 5) | 31)                   // len 8, near field all-ones
    st.write(255)                             // code 255 → far escape
    st.write(0); st.write(32)                 // fo = 32, big-endian
    val stream = st.toByteArray
    val out = new Array[Byte](n)
    Blosc.blosclzDecompress(stream, 0, stream.length, out, 0, n)
    assert(out.slice(0, 32).toSeq == lits.toSeq)
    assert(out.slice(32, 8224).forall(_ == lits(31))) // RLE of last lit
    assert(out.slice(8224, n).toSeq == lits.take(8).toSeq) // far copy
  }

  test("blosclz round trips: compressible, incompressible, far matches") {
    def rt(data: Array[Byte]): Unit = {
      val comp = Blosc.blosclzCompress(data)
      val out = new Array[Byte](data.length)
      if (data.nonEmpty)
        Blosc.blosclzDecompress(comp, 0, comp.length, out, 0, out.length)
      assert(out.toSeq == data.toSeq)
    }
    rt(Array.fill(4096)(7.toByte))
    rt(Array.tabulate(4096)(i => (i * 31 + i / 7).toByte))
    val rnd = new scala.util.Random(99)
    rt(Array.fill(512)(rnd.nextInt().toByte))
    rt("ab".getBytes)
    rt(("the quick brown fox " * 300).getBytes)
    // far-match shape: distinct head, long zero middle, repeated head
    val head = Array.tabulate(200)(i => ((i * 89 + 3) % 251).toByte)
    rt(head ++ Array.fill(8500)(0.toByte) ++ head)
    // frame-level
    val raw = ("blosclz-frame" * 500).getBytes
    val f = Blosc.compress(raw, 1, codec = 0, doShuffle = false)
    assert((f(2) >>> 5) == 0)
    assert(Blosc.decompress(f).toSeq == raw.toSeq)
    assert(f.length < raw.length / 4)
  }
}
