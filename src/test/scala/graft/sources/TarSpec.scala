package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** The ustar walk: header layout vectors, block padding, checksum
  * quarantine, and loud rejection of structure that breaks the walk. */
class TarSpec extends AnyFunSuite {

  test("round-trip: members, sizes, padding, end-of-archive") {
    val a = Tar.encodeMember("a.txt", Array.fill[Byte](5)('x'))
    val b = Tar.encodeMember("b.bin", new Array[Byte](512)) // exact block
    val c = Tar.encodeMember("c.bin", Array.emptyByteArray) // size 0
    val buf = a ++ b ++ c ++ Tar.trailer
    assert(a.length == 512 + 512 && b.length == 512 + 512 && c.length == 512)
    val ms = Tar.walk(buf)
    assert(ms.map(m => (m.name, m.size, m.checksumOk)) == Seq(
      ("a.txt", 5L, true), ("b.bin", 512L, true), ("c.bin", 0L, true)))
  }

  test("interop: the JDK-independent header parses with GNU tar semantics") {
    // spot-check the fixed field offsets against the ustar layout
    val h = Tar.encodeMember("doc7.txt", Array.fill[Byte](3)('y'))
    assert(new String(h, 257, 5, "US-ASCII") == "ustar")
    assert(h(156) == '0')
    assert(new String(h, 124, 11, "US-ASCII") == "00000000003")
    assert(h(155) == ' ') // checksum field ends NUL + space
  }

  test("a wrong checksum quarantines the member; the walk continues") {
    val bad = Tar.encodeMember("bad.txt", Array.fill[Byte](10)('z'),
      breakChecksum = true)
    val good = Tar.encodeMember("good.txt", Array.fill[Byte](4)('w'))
    val ms = Tar.walk(bad ++ good ++ Tar.trailer)
    assert(ms.map(m => (m.name, m.checksumOk)) ==
      Seq(("bad.txt", false), ("good.txt", true)))
  }

  test("structural violations reject loudly") {
    val good = Tar.encodeMember("a.txt", Array.fill[Byte](5)('x')) ++ Tar.trailer
    def mutated(f: Array[Byte] => Unit): Array[Byte] = {
      val b = good.clone(); f(b); b
    }
    // bad magic
    assert(intercept[IllegalArgumentException](
      Tar.walk(mutated(_(257) = 'X'))).getMessage.contains("magic"))
    // non-octal size field
    assert(intercept[IllegalArgumentException](
      Tar.walk(mutated(_(124) = '9'))).getMessage.contains("octal"))
    // truncated mid-member (data runs past the buffer)
    assert(intercept[IllegalArgumentException](
      Tar.walk(good.dropRight(1200))).getMessage.contains("runs past"))
    // missing second zero block
    assert(intercept[IllegalArgumentException](
      Tar.walk(good.dropRight(512))).getMessage.contains("second zero block"))
    // data after the marker
    assert(intercept[IllegalArgumentException](
      Tar.walk(good ++ Array[Byte](1))).getMessage.contains("after the end"))
  }
}
