package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** From-spec WARC/1.0 + gzip-member codec: round-trips, the
  * Content-Length framing bounds, and the resync walk over truncated
  * members — plus a deterministic fuzz arm over hostile inputs. */
class WarcSpec extends AnyFunSuite {

  private def rec(id: Long, body: String): Array[Byte] =
    Warc.encodeRecord("response",
      Seq("WARC-Target-URI" -> s"http://crawl.example/doc/$id"),
      body.getBytes("US-ASCII"))

  test("gzip member round-trips and reports the exact member end") {
    val p1 = "hello warc".getBytes("US-ASCII")
    val p2 = Array.tabulate[Byte](5000)(i => (i % 251).toByte)
    val buf = Warc.gzipMember(p1) ++ Warc.gzipMember(p2)
    val (d1, off1) = Warc.gunzipMember(buf, 0)
    assert(d1.toSeq == p1.toSeq)
    val (d2, off2) = Warc.gunzipMember(buf, off1)
    assert(d2.toSeq == p2.toSeq)
    assert(off2 == buf.length)
  }

  test("record round-trip: headers, type filter fields, body framing") {
    val r = Warc.parseRecord(rec(42, "HTTP/1.1 200 OK\r\n\r\n<html/>"))
    assert(r.warcType == "response")
    assert(r.targetUri == "http://crawl.example/doc/42")
    assert(new String(r.body, "US-ASCII").endsWith("<html/>"))
  }

  test("hostile Content-Length (2^40) is rejected before allocation") {
    val bytes = Warc.encodeRecord("response", Seq("WARC-Target-URI" -> "u"),
      "tiny".getBytes("US-ASCII"), declaredLength = Some(1L << 40))
    val e = intercept[IllegalArgumentException](Warc.parseRecord(bytes))
    assert(e.getMessage.contains("Content-Length"))
  }

  test("non-numeric and missing Content-Length are descriptive errors") {
    val noLen = ("WARC/1.0\r\nWARC-Type: response\r\n\r\n\r\n\r\n")
      .getBytes("US-ASCII")
    assert(intercept[IllegalArgumentException](Warc.parseRecord(noLen))
      .getMessage.contains("Content-Length"))
    val badLen = ("WARC/1.0\r\nContent-Length: zz\r\n\r\n\r\n\r\n")
      .getBytes("US-ASCII")
    assert(intercept[IllegalArgumentException](Warc.parseRecord(badLen))
      .getMessage.contains("non-numeric"))
  }

  test("walk resyncs past a truncated member without losing later records") {
    val good1 = Warc.gzipMember(rec(1, "a"))
    val bad = Warc.gzipMember(rec(2, "b" * 500)) // truncate below
    val good3 = Warc.gzipMember(rec(3, "c"))
    val buf = good1 ++ bad.take(bad.length / 2) ++ good3
    val out = Warc.walk(buf).toSeq
    val goods = out.collect { case Right(r) => r.targetUri }
    assert(goods.exists(_.endsWith("/1")) && goods.exists(_.endsWith("/3")))
    assert(!goods.exists(_.endsWith("/2")))
    assert(out.exists(_.isLeft)) // the truncation was reported, not dropped
  }

  test("walk books a WARC-malformed record at its true member boundary") {
    // member 2 is VALID gzip but hostile WARC: the walk must resume at
    // its exact end (no magic scan, no collateral loss of member 3)
    val hostile = Warc.gzipMember(Warc.encodeRecord("response",
      Seq("WARC-Target-URI" -> "http://crawl.example/doc/2"),
      "x".getBytes("US-ASCII"), declaredLength = Some(1L << 40)))
    val buf = Warc.gzipMember(rec(1, "a")) ++ hostile ++ Warc.gzipMember(rec(3, "c"))
    val out = Warc.walk(buf).toSeq
    assert(out.count(_.isLeft) == 1)
    assert(out.collect { case Right(r) => r.targetUri }.map(_.last) == Seq('1', '3'))
  }

  test("payload digest matches the WARC sha1:base32 convention") {
    // sha1("") is the classic test vector; base32 per RFC 4648
    assert(Warc.payloadDigest(Array.empty[Byte]) ==
      "sha1:3I42H3S6NNFQ2MSVX7XZKYAYSCX5QBYJ")
    // sha1("abc") = a9993e364706816aba3e25717850c26c9cd0d89d
    assert(Warc.payloadDigest("abc".getBytes("US-ASCII")) ==
      "sha1:VGMT4NSHA2AWVOR6EVYXQUGCNSONBWE5")
  }

  test("fuzz: bit-flipped and truncated shards never crash the walk") {
    val base = (1 to 20).map(i => Warc.gzipMember(rec(i.toLong, "d" * i)))
      .reduce(_ ++ _)
    var seed = 0x9E3779B97F4A7C15L
    def next(n: Int): Int = { // xorshift64*, deterministic
      seed ^= seed >>> 12; seed ^= seed << 25; seed ^= seed >>> 27
      (((seed * 0x2545F4914F6CDD1DL) >>> 33) % n).toInt
    }
    for (_ <- 1 to 200) {
      val b = base.clone()
      b(next(b.length)) = (b(next(b.length)) ^ (1 << next(8))).toByte
      val cut = if (next(4) == 0) next(b.length) else b.length
      // every record is either parsed or booked as a Left — never thrown
      Warc.walk(java.util.Arrays.copyOf(b, cut)).foreach(_ => ())
    }
  }
}
