package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** The Ogg page walk: RFC 3533 CRC vectors, lacing arithmetic,
  * packet spanning under the continuation flag, and loud rejection of
  * every grammar violation the books must not silently absorb. */
class OggSpec extends AnyFunSuite {

  test("page CRC is the non-reflected 0x04c11db7 CRC with zero init") {
    // independent bit-by-bit reference implementation
    def ref(bytes: Array[Byte]): Int = {
      var c = 0
      bytes.foreach { b =>
        c ^= (b & 0xFF) << 24
        (0 until 8).foreach { _ =>
          c = if ((c & 0x80000000) != 0) (c << 1) ^ 0x04c11db7 else c << 1
        }
      }
      c
    }
    val data = Array.tabulate[Byte](53)(i => ((i * 37 + 11) & 0xFF).toByte)
    assert(Ogg.pageCrc(data, 0, data.length, Int.MaxValue) == ref(data))
  }

  test("round-trip: books balance, incl. a 255-multiple packet (zero lacing)") {
    val pages = Seq(Ogg.Page(480L, Seq(100, 255)), Ogg.Page(960L, Seq(510)))
    val bytes = Ogg.encode(7L, pages, span = false)
    val b = Ogg.parse(bytes)
    assert(b.nPages == 2)
    assert(b.nPackets == 3)
    assert(b.lastGranule == 960L)
    assert(b.payloadBytes == 100 + 255 + 510)
    assert(b.nBytes == bytes.length)
    // lacing counts: 100→1, 255→[255,0]=2, 510→[255,255,0]=3
    assert(bytes.length == (27 + 3) + (27 + 3) + 865)
  }

  test("a packet spanning two pages counts once, under the continuation flag") {
    val pages = Seq(Ogg.Page(100L, Seq(40)), Ogg.Page(200L, Seq(60)))
    val b = Ogg.parse(Ogg.encode(1L, pages, span = true))
    assert(b.nPackets == 3) // 40, 60, and the 300-byte spanner
    assert(b.payloadBytes == 40 + 60 + 300)
  }

  test("grammar violations reject loudly") {
    val good = Ogg.encode(5L, Seq(Ogg.Page(10L, Seq(30)), Ogg.Page(20L, Seq(30))),
      span = false)
    def mutated(f: Array[Byte] => Unit): Array[Byte] = {
      val b = good.clone(); f(b); b
    }
    val page2 = 27 + 1 + 30
    // flip a payload byte -> CRC mismatch
    assert(intercept[IllegalArgumentException](
      Ogg.parse(mutated(b => b(28) = (b(28) ^ 1).toByte)))
      .getMessage.contains("CRC"))
    // capture pattern
    assert(intercept[IllegalArgumentException](
      Ogg.parse(mutated(_(0) = 'X'))).getMessage.contains("capture"))
    // continuation flag without an open packet (re-CRC so CRC passes)
    val contFlag = mutated { b =>
      b(page2 + 5) = (b(page2 + 5) | 0x1).toByte
      b(page2 + 22) = 0; b(page2 + 23) = 0; b(page2 + 24) = 0; b(page2 + 25) = 0
      var c = Ogg.pageCrc(b, page2, b.length, page2 + 22)
      (0 until 4).foreach { k => b(page2 + 22 + k) = (c & 0xFF).toByte; c >>>= 8 }
    }
    assert(intercept[IllegalArgumentException](Ogg.parse(contFlag))
      .getMessage.contains("continuation"))
    // truncated final page
    assert(intercept[IllegalArgumentException](Ogg.parse(good.dropRight(3)))
      .getMessage.contains("past the buffer"))
    // missing EOS (drop the last page entirely)
    assert(intercept[IllegalArgumentException](Ogg.parse(good.take(page2)))
      .getMessage.contains("EOS"))
    // serial change mid-stream: splice another stream's second page
    // (same page geometry, so only the serial differs grammar-wise)
    val other = Ogg.encode(6L,
      Seq(Ogg.Page(10L, Seq(30)), Ogg.Page(20L, Seq(30))), span = false)
    assert(intercept[IllegalArgumentException](
      Ogg.parse(good.take(page2) ++ other.drop(page2)))
      .getMessage.contains("serial"))
  }
}
