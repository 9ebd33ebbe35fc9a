package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** The EBML walk: varint grammar, unknown-size Segment, unknown-element
  * skipping, and loud rejection of framing violations. */
class EbmlSpec extends AnyFunSuite {

  private val twoClusters = Seq(
    Ebml.Cluster(0L, Seq(20, 300)),
    Ebml.Cluster(40L, Seq(15)))

  test("round-trip: books balance with a sized Segment") {
    val bytes = Ebml.encode(twoClusters, unknownSegmentSize = false)
    val b = Ebml.parse(bytes)
    assert(b.nElements == 6 + (2 + 2) + (2 + 1))
    assert(b.nClusters == 2 && b.nBlocks == 3)
    assert(b.lastClusterTs == 40L)
    assert(b.blockBytes == 20 + 300 + 15)
    assert(b.nBytes == bytes.length)
    // closed form: 23 header + 6 seg hdr + 15 info + 13/cluster + 7/block + data
    assert(bytes.length == 23 + 6 + 15 + 13 * 2 + 7 * 3 + 335)
  }

  test("unknown-size Segment (0xFF) extends to end of buffer") {
    val sized = Ebml.encode(twoClusters, unknownSegmentSize = false)
    val unknown = Ebml.encode(twoClusters, unknownSegmentSize = true)
    assert(unknown.length == sized.length - 1) // 1-byte vs 2-byte size
    val b = Ebml.parse(unknown)
    assert(b.nClusters == 2 && b.nBlocks == 3 && b.nBytes == unknown.length)
  }

  test("unknown elements are skipped with framing validated") {
    val base = Ebml.encode(twoClusters, unknownSegmentSize = true)
    // append an unknown top-level element: ID 0xEC (Void), 2-byte size, 5 bytes
    // — inside the unknown-size Segment's scope, so it lands in the walk
    val void = Array[Byte](0xEC.toByte, 0x40.toByte, 0x05.toByte, 1, 2, 3, 4, 5)
    val b = Ebml.parse(base ++ void)
    assert(b.nElements == Ebml.parse(base).nElements + 1)
    assert(b.nBytes == base.length + void.length)
  }

  test("track 127 (the all-ones 1-byte VINT 0xFF) is a valid track number") {
    // the 'unknown' escape is for element data sizes only — rewrite the
    // fixture's track byte 0x81 -> 0xFF and the block must still parse
    val bytes = Ebml.encode(Seq(Ebml.Cluster(0L, Seq(25))),
      unknownSegmentSize = false)
    // SimpleBlock data starts after: 23 hdr + 6 seg + 15 info + 6 cluster
    // hdr + 7 timestamp el + 1 id + 2 size
    val at = 23 + 6 + 15 + 6 + 7 + 3
    assert(bytes(at) == 0x81.toByte) // track 1 in the fixture
    bytes(at) = 0xFF.toByte // track 127
    val b = Ebml.parse(bytes)
    assert(b.nBlocks == 1 && b.blockBytes == 25)
  }

  test("framing violations reject loudly") {
    val good = Ebml.encode(twoClusters, unknownSegmentSize = false)
    def mutated(f: Array[Byte] => Unit): Array[Byte] = {
      val b = good.clone(); f(b); b
    }
    // 0x00 varint lead byte (EBML header ID first byte)
    assert(intercept[IllegalArgumentException](
      Ebml.parse(mutated(_(0) = 0))).getMessage.contains("0x00 lead"))
    // truncated buffer
    assert(intercept[IllegalArgumentException](
      Ebml.parse(good.dropRight(4))).getMessage.contains("runs past"))
    // unknown size on a non-Segment: flip the EBML header's size to 0xFF
    assert(intercept[IllegalArgumentException](
      Ebml.parse(mutated { b => b(4) = 0xFF.toByte }))
      .getMessage.contains("unknown size outside"))
    // wrong DocType
    val webm = mutated { b =>
      // DocType payload starts after: 4 id + 2 size + 5 (version el) + 2 + 2
      val at = 4 + 2 + 5 + 4
      "webmXXXX".getBytes("US-ASCII").zipWithIndex.foreach {
        case (c, i) => b(at + i) = c
      }
    }
    assert(intercept[IllegalArgumentException](Ebml.parse(webm))
      .getMessage.contains("not matroska"))
    // two Segments
    val seg2 = good.drop(23) // strip the EBML header, keep the Segment
    assert(intercept[IllegalArgumentException](Ebml.parse(good ++ seg2))
      .getMessage.contains("duplicate Segment"))
  }
}
