package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** The from-spec UTF-8 repair decoder: WHATWG/Unicode maximal-subpart
  * fixtures (overlongs, surrogates, out-of-range, truncations), plus a
  * deterministic fuzz arm pinning bit-exact agreement with the JDK's
  * CharsetDecoder — an independent implementation of the same policy. */
class Utf8Spec extends AnyFunSuite {

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
  private def stats(xs: Int*): (Int, Int) = Utf8.decodeStats(bytes(xs: _*))

  test("valid 1/2/3/4-byte sequences decode to one codepoint each") {
    assert(stats(0x41) == (1, 0))
    assert(stats(0xC3, 0xA9) == (1, 0)) // é
    assert(stats(0xE2, 0x82, 0xAC) == (1, 0)) // €
    assert(stats(0xF0, 0x9F, 0x98, 0x80) == (1, 0)) // astral
    assert(Utf8.sanitize(bytes(0xF0, 0x9F, 0x98, 0x80)) == "😀")
  }

  test("maximal-subpart repairs: the Unicode best-practice table") {
    assert(stats(0xC0, 0xAF) == (2, 2)) // overlong lead is never valid
    assert(stats(0xE0, 0x80, 0xAF) == (3, 3)) // overlong E0: 3 subparts
    assert(stats(0xED, 0xA0, 0x80) == (3, 3)) // surrogate: ED A0 invalid
    assert(stats(0xF4, 0x90, 0x80, 0x80) == (4, 4)) // > U+10FFFF
    assert(stats(0x80, 0x80) == (2, 2)) // stray continuations: one each
    assert(stats(0xC3) == (1, 1)) // truncated tail
    assert(stats(0xE2, 0x82) == (1, 1)) // truncated 3-byte: ONE subpart
    assert(stats(0x41, 0xE2, 0x82, 0x42) == (3, 1)) // A, <repair>, B
  }

  test("fuzz: sanitize agrees bit-exactly with the JDK decoder") {
    // Known, deliberate deviation: for an ED lead followed by a
    // surrogate-range continuation (ED A0..BF …) the JDK books the pair
    // as ONE malformed unit, while WHATWG/Unicode best practice (and
    // Python, and the browsers) book the ED alone then re-process the
    // continuation — the hand fixtures above pin OUR (WHATWG) counts
    // for that class, so the fuzz alphabet simply excludes 0xED.
    var seed = 0x5DEECE66DL
    def next(n: Int): Int = {
      seed ^= seed >>> 12; seed ^= seed << 25; seed ^= seed >>> 27
      (((seed * 0x2545F4914F6CDD1DL) >>> 33) % n).toInt
    }
    for (trial <- 1 to 500) {
      val len = next(40)
      val b = Array.fill(len) {
        var v = next(256); while (v == 0xED) v = next(256); v.toByte
      }
      val ours = Utf8.sanitize(b)
      val jdk = new String(b, java.nio.charset.StandardCharsets.UTF_8)
      assert(ours == jdk,
        s"trial $trial diverged on ${b.map(x => f"${x & 0xFF}%02X").mkString(" ")}: " +
          s"ours=${ours.map(_.toInt)} jdk=${jdk.map(_.toInt)}")
    }
  }

  test("decodeStats counts match sanitize output") {
    val b = bytes(0x41, 0xF0, 0x9F, 0x98, 0x80, 0xED, 0xA0, 0x80, 0xC3)
    val (cps, repl) = Utf8.decodeStats(b)
    val s = Utf8.sanitize(b)
    assert(cps == s.codePointCount(0, s.length))
    assert(repl == s.count(_ == '�'))
  }
}
