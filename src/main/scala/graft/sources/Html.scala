package graft.sources

/** HTML text extraction (the crawl→corpus step every training-data
  * pipeline runs between WARC ingest and document processing) plus the
  * deterministic page synthesizer the qn20/t33 fixtures are built from.
  *
  * The extractor is a single-pass state machine, not a regex chain:
  * comments (`<!-- -->`) are dropped whole, `<script>`/`<style>`
  * ELEMENTS are dropped with their content (their body is code, not
  * text — and legally contains unescaped `<`), every other tag becomes
  * a single space (so `</h1><p>` still separates words), character
  * entities are decoded AFTER tag handling (so `&lt;p&gt;` in text can
  * never become markup — the order real extractors use), and finally
  * whitespace runs ({' ', '\t', '\r', '\n'}) collapse to single spaces
  * with the ends trimmed.
  *
  * Everything here is pure per-string computation: at 100 TB it runs
  * scan-parallel inside mapPartitions at decode speed, no shuffle. */
object Html {
  /** Minimal attribute-value escaping (the synth side of the entity
    * roundtrip): `&` first, then `<`, `>`, `"`. */
  def enc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;")
      .replace(">", "&gt;").replace("\"", "&quot;")

  /** Deterministic synthetic page for a document row. All markup is
    * ASCII and every entity decodes to an ASCII char, so the page's
    * byte length equals its char length whenever the inputs are ASCII —
    * the property the qn20 byte accounting (and its DuckDB oracle)
    * relies on. The extracted text of this page is exactly
    * `Doc {id} Document {id} {text} source "{source}" & lang {lang}`
    * (whitespace-collapsed) — replayable in SQL. */
  def synth(id: Long, lang: String, source: String, text: String): String =
    s"""<html><head><title>Doc $id</title>
<style type="text/css">body { color: #222; } p.main { margin: 0 auto; }</style>
<script type="text/javascript">var n = $id; if (n > 0 && n < 99) { n = n * 2; }</script>
</head><body>
<!-- synthetic crawl page: <p>markup inside a comment is NOT text</p> -->
<h1>&#68;ocument $id</h1>
<p class="main">${enc(text)}</p>
<p>source &quot;${enc(source)}&quot; &amp; lang ${enc(lang)}</p>
</body></html>"""

  /** Char count of [[synth]] that does not depend on the inputs: the
    * template carries the doc id THREE times (title, script, h1), so
    * len(synth) = synthFixedLen + 3·len(str(id)) + len(enc(text)) +
    * len(enc(source)) + len(enc(lang)). Computed once here and
    * interpolated verbatim into the qn20 oracle (the entLut idiom) so
    * the constant can never drift from the template. */
  val synthFixedLen: Long = synth(0L, "", "", "").length.toLong - 3L

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\r' || c == '\n'

  private def regionMatchesIgnoreCase(s: String, at: Int, what: String): Boolean =
    at + what.length <= s.length && s.regionMatches(true, at, what, 0, what.length)

  /** True when the char at `at` legally terminates a tag NAME (so
    * `<scriptx>` is an ordinary tag, not a script element). */
  private def nameEnd(s: String, at: Int): Boolean =
    at >= s.length || { val c = s.charAt(at)
      isWs(c) || c == '>' || c == '/' }

  /** Decode one entity starting at the '&' at `i`; returns the decoded
    * text and the index just past the ';', or None when the span is not
    * a well-formed entity (the '&' then passes through literally, as
    * browsers do). */
  private def entity(s: String, i: Int): Option[(String, Int)] = {
    val semi = s.indexOf(';', i + 1)
    if (semi < 0 || semi - i > 10 || semi == i + 1) None
    else {
      val name = s.substring(i + 1, semi)
      val decoded: Option[String] = name match {
        case "amp" => Some("&")
        case "lt" => Some("<")
        case "gt" => Some(">")
        case "quot" => Some("\"")
        case "apos" => Some("'")
        case "nbsp" => Some(" ")
        case _ if name.length > 1 && name.charAt(0) == '#' =>
          val digits = name.substring(1)
          val cp = try {
            if (digits.length > 1 && (digits.charAt(0) == 'x' || digits.charAt(0) == 'X'))
              java.lang.Integer.parseInt(digits.substring(1), 16)
            else java.lang.Integer.parseInt(digits)
          } catch { case _: NumberFormatException => -1 }
          if (cp > 0 && cp <= 0x10FFFF && !Character.isSurrogate(cp.toChar))
            Some(new String(Character.toChars(cp)))
          else None
        case _ => None
      }
      decoded.map((_, semi + 1))
    }
  }

  /** Extract the visible text of an HTML page (see object doc). */
  def extractText(html: String): String = {
    val n = html.length
    val sb = new StringBuilder(n / 4)
    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (regionMatchesIgnoreCase(html, i, "<!--")) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else if (regionMatchesIgnoreCase(html, i + 1, "script") &&
            nameEnd(html, i + 7)) {
          i = skipElement(html, i, "script")
        } else if (regionMatchesIgnoreCase(html, i + 1, "style") &&
            nameEnd(html, i + 6)) {
          i = skipElement(html, i, "style")
        } else {
          val e = html.indexOf('>', i + 1)
          i = if (e < 0) n else e + 1
        }
        sb.append(' ') // a tag separates words; collapse dedups later
      } else if (c == '&') {
        entity(html, i) match {
          case Some((txt, nxt)) => sb.append(txt); i = nxt
          case None => sb.append('&'); i += 1
        }
      } else { sb.append(c); i += 1 }
    }
    collapseWs(sb)
  }

  /** Skip a raw-text element (script/style) INCLUDING its content:
    * from the opening '<' to just past the matching close tag's '>'. */
  private def skipElement(html: String, at: Int, name: String): Int = {
    val n = html.length
    // past the opening tag's '>'
    val open = html.indexOf('>', at + 1)
    if (open < 0) return n
    var p = open + 1
    val close = "</" + name
    while (p < n) {
      if (html.charAt(p) == '<' && regionMatchesIgnoreCase(html, p, close) &&
          nameEnd(html, p + close.length)) {
        val e = html.indexOf('>', p + 1)
        return if (e < 0) n else e + 1
      }
      p += 1
    }
    n
  }

  private def collapseWs(sb: StringBuilder): String = {
    val out = new StringBuilder(sb.length)
    var inWs = false
    var i = 0
    while (i < sb.length) {
      val c = sb.charAt(i)
      if (isWs(c)) inWs = true
      else {
        if (inWs && out.nonEmpty) out.append(' ')
        out.append(c)
        inWs = false
      }
      i += 1
    }
    out.toString
  }
}
