package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** The RFC 3986 §6 canonicalizer: case/port, escapes, dot-segments,
  * query sort, fragment drop — and the p31 twin contract. */
class UrlSpec extends AnyFunSuite {

  test("scheme/host case and default ports") {
    assert(Url.canonicalize("HTTP://Example.COM:80/doc/1") ==
      "http://example.com/doc/1")
    assert(Url.canonicalize("https://EXAMPLE.com:443/x") ==
      "https://example.com/x")
    assert(Url.canonicalize("http://example.com:8080/x") ==
      "http://example.com:8080/x") // non-default port survives
  }

  test("percent-encoding: unreserved decoded, others uppercased") {
    assert(Url.canonicalize("http://a.com/doc/%7E5") == "http://a.com/doc/~5")
    assert(Url.canonicalize("http://a.com/p%2fq") == "http://a.com/p%2Fq")
    assert(Url.canonicalize("http://a.com/p%2") == "http://a.com/p%2") // malformed passes
  }

  test("dot-segment resolution (RFC 3986 5.2.4 cases)") {
    assert(Url.removeDotSegments("/a/b/c/./../../g") == "/a/g")
    assert(Url.removeDotSegments("/a/../../g") == "/g") // pops clamp at root
    assert(Url.removeDotSegments("/./doc/1") == "/doc/1")
    assert(Url.removeDotSegments("/a/..") == "/")
    assert(Url.canonicalize("http://a.com") == "http://a.com/") // empty path
  }

  test("query sort and fragment drop") {
    assert(Url.canonicalize("http://a.com/d?b=2&a=1#frag") ==
      "http://a.com/d?a=1&b=2")
    assert(Url.canonicalize("http://a.com/d?x=1") == "http://a.com/d?x=1")
    assert(Url.canonicalize("http://a.com/d#only") == "http://a.com/d")
  }

  test("every p31 twin pair collapses to one canonical") {
    val pairs = Seq(
      ("HTTP://Example.COM:80/doc/7", "http://example.com/./doc/7",
        "http://example.com/doc/7"),
      ("http://example.com/a/../v1/doc/7", "http://EXAMPLE.com/v1/./doc/7",
        "http://example.com/v1/doc/7"),
      ("http://example.com/doc/7?b=2&a=1#f",
        "HTTP://example.com:80/doc/7?a=1&b=2",
        "http://example.com/doc/7?a=1&b=2"),
      ("https://EXAMPLE.com:443/./doc/7", "https://example.com/doc/7#x",
        "https://example.com/doc/7"),
      ("http://example.com/doc/%7E7", "http://example.com/doc/~7",
        "http://example.com/doc/~7"),
      ("http://example.com/v5/./doc/7",
        "http://example.com/a/b/../../v5/doc/7",
        "http://example.com/v5/doc/7"))
    pairs.foreach { case (base, twin, canon) =>
      assert(Url.canonicalize(base) == canon, s"base $base")
      assert(Url.canonicalize(twin) == canon, s"twin $twin")
    }
    // the six canonical classes stay DISTINCT for one id
    assert(pairs.map(_._3).distinct.size == 6)
  }
}
