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

  test("clear rejections: bit-shuffle and blosclz") {
    val raw = Array.fill(64)(1.toByte)
    val f = Blosc.compress(raw, 8, 1, doShuffle = true, split = false)
    f(2) = (f(2) | 0x04).toByte // claim bit-shuffle
    val e1 = intercept[IllegalArgumentException](Blosc.decompress(f))
    assert(e1.getMessage.contains("bit-shuffle"))
    val g = Blosc.compress(raw, 8, 1, doShuffle = false, split = false)
    g(2) = (g(2) & 0x1F).toByte // codec 0 = blosclz
    val e2 = intercept[IllegalArgumentException](Blosc.decompress(g))
    assert(e2.getMessage.contains("blosclz"))
  }
}
