package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** The ZIP walk: CRC-32 interop with the JDK, the backward EOCD scan
  * under a trailing comment, local/central cross-checks, and loud
  * rejection of structure that breaks the walk. */
class ZipSpec extends AnyFunSuite {

  test("from-spec CRC-32 matches java.util.zip.CRC32 (interop pin)") {
    val data = Array.tabulate[Byte](731)(i => ((i * 37 + 11) & 0xFF).toByte)
    val jdk = new java.util.zip.CRC32()
    jdk.update(data)
    assert(Zip.crc32(data, 0, data.length) == jdk.getValue)
    assert(Zip.crc32(Array.emptyByteArray, 0, 0) == 0L)
  }

  test("round-trip: entries, sizes, CRC verdicts; JDK ZipInputStream reads ours") {
    val buf = Zip.encode(Seq(
      Zip.Entry("a.txt", "hello".getBytes("US-ASCII")),
      Zip.Entry("b.bin", Array.tabulate[Byte](300)(_.toByte), breakCrc = true),
      Zip.Entry("c.txt", Array.emptyByteArray)))
    val ms = Zip.walk(buf)
    assert(ms.map(m => (m.name, m.size, m.crcOk)) == Seq(
      ("a.txt", 5L, true), ("b.bin", 300L, false), ("c.txt", 0L, true)))
    // interop: the JDK's reader walks a clean archive of ours (it
    // rightly refuses the broken-CRC fixture entry above)
    val clean = Zip.encode(Seq(
      Zip.Entry("a.txt", "hello".getBytes("US-ASCII")),
      Zip.Entry("b.bin", Array.tabulate[Byte](300)(_.toByte)),
      Zip.Entry("c.txt", Array.emptyByteArray)))
    val zin = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(clean))
    val names = Iterator.continually(zin.getNextEntry)
      .takeWhile(_ != null).map(_.getName).toList
    assert(names == List("a.txt", "b.bin", "c.txt"))
  }

  test("a trailing comment displaces the EOCD; the backward scan finds it") {
    val base = Zip.encode(Seq(Zip.Entry("x.txt", "data".getBytes)))
    // splice a 40-byte comment: patch the EOCD comment length, append
    val withComment = base.clone()
    withComment(base.length - 2) = 40
    val full = withComment ++ Array.fill[Byte](40)('#')
    val ms = Zip.walk(full)
    assert(ms.map(_.name) == Seq("x.txt"))
  }

  test("structural violations reject loudly") {
    val good = Zip.encode(Seq(Zip.Entry("a.txt", "hello".getBytes)))
    def mutated(f: Array[Byte] => Unit): Array[Byte] = {
      val b = good.clone(); f(b); b
    }
    // no EOCD at all
    assert(intercept[IllegalArgumentException](
      Zip.walk(good.dropRight(22))).getMessage.contains("end-of-central"))
    // central signature corrupted (central starts after local 30+5+5)
    assert(intercept[IllegalArgumentException](
      Zip.walk(mutated(_(40) = 0))).getMessage.contains("central signature"))
    // local/central size mismatch (local csize at offset 18)
    assert(intercept[IllegalArgumentException](
      Zip.walk(mutated(_(18) = 99))).getMessage.contains("size mismatch"))
    // hostile local offset (central localOff at 40 + 42)
    assert(intercept[IllegalArgumentException](
      Zip.walk(mutated(_(40 + 42) = 0x7F))).getMessage.contains("runs into"))
    // a DEFLATE entry is out of scope and must say so (central method at 40+10)
    assert(intercept[IllegalArgumentException](
      Zip.walk(mutated(_(40 + 10) = 8))).getMessage.contains("STORED"))
  }
}
