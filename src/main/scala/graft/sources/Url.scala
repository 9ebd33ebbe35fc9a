package graft.sources

/** From-spec URL canonicalization (RFC 3986 §6 syntax-based
  * normalization, plus the query-parameter sort every crawl frontier
  * adds): the step that lets a frontier recognize
  * `HTTP://Example.COM:80/a/../doc/1` and `http://example.com/doc/1`
  * as ONE fetch. Normalizations applied:
  *
  *  - scheme and host lowercased; default ports stripped (http:80,
  *    https:443);
  *  - percent-encoding: unreserved octets (ALPHA / DIGIT / - . _ ~)
  *    decoded, every other escape uppercased (%2f → %2F);
  *  - dot-segments resolved per RFC 3986 §5.2.4; empty path → "/";
  *  - query parameters split on '&' and sorted (the frontier canon —
  *    beyond the RFC, standard crawler practice); empty query dropped;
  *  - fragment dropped (it never reaches the server).
  */
object Url {
  private def isUnreserved(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
      (c >= '0' && c <= '9') || c == '-' || c == '.' || c == '_' || c == '~'

  /** Decode unreserved %XX escapes, uppercase the rest; malformed
    * escapes pass through untouched. */
  private[sources] def normEscapes(s: String): String = {
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length &&
          isHex(s.charAt(i + 1)) && isHex(s.charAt(i + 2))) {
        val v = Integer.parseInt(s.substring(i + 1, i + 3), 16)
        if (v < 128 && isUnreserved(v.toChar)) out.append(v.toChar)
        else out.append('%').append(s.substring(i + 1, i + 3).toUpperCase)
        i += 3
      } else { out.append(c); i += 1 }
    }
    out.toString
  }
  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  /** RFC 3986 §5.2.4 remove_dot_segments. */
  private[sources] def removeDotSegments(path: String): String = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var in = path
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../")) {
        in = "/" + in.substring(4)
        if (out.nonEmpty) out.remove(out.length - 1)
      } else if (in == "/..") {
        in = "/"
        if (out.nonEmpty) out.remove(out.length - 1)
      } else if (in == "." || in == "..") in = ""
      else {
        val next = in.indexOf('/', 1)
        val seg = if (next < 0) in else in.substring(0, next)
        out += seg
        in = if (next < 0) "" else in.substring(next)
      }
    }
    out.mkString
  }

  /** Canonical form (see object doc). Inputs without a `://` authority
    * split are returned escape-normalized only (opaque URIs). */
  def canonicalize(url: String): String = {
    val schemeEnd = url.indexOf("://")
    if (schemeEnd < 0) return normEscapes(url)
    val scheme = url.substring(0, schemeEnd).toLowerCase
    val rest = url.substring(schemeEnd + 3)
    val pathStart = rest.indexWhere(c => c == '/' || c == '?' || c == '#')
    val authority =
      (if (pathStart < 0) rest else rest.substring(0, pathStart)).toLowerCase
    val host = (scheme, authority) match {
      case ("http", a) if a.endsWith(":80") => a.dropRight(3)
      case ("https", a) if a.endsWith(":443") => a.dropRight(4)
      case (_, a) => a
    }
    val tail = if (pathStart < 0) "" else rest.substring(pathStart)
    val noFrag = { val h = tail.indexOf('#'); if (h < 0) tail else tail.substring(0, h) }
    val qAt = noFrag.indexOf('?')
    val rawPath = if (qAt < 0) noFrag else noFrag.substring(0, qAt)
    val rawQuery = if (qAt < 0) "" else noFrag.substring(qAt + 1)
    val path = {
      val p = removeDotSegments(normEscapes(
        if (rawPath.isEmpty) "/" else rawPath))
      if (p.isEmpty) "/" else p
    }
    val query =
      if (rawQuery.isEmpty) ""
      else "?" + rawQuery.split("&", -1).filter(_.nonEmpty)
        .map(normEscapes).sorted.mkString("&")
    scheme + "://" + host + path + query
  }
}
