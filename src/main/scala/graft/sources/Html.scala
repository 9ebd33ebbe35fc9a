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

  /** Deterministic page WITH site chrome (nav / related-links / footer
    * around the real content) — the t36 boilerplate-classification
    * fixture. Kept separate from [[synth]] so the qn20/t33 oracles'
    * extracted-text contract is untouched. Per-block constants the t36
    * oracle replays: nav text 15 / links 13, related 22 / 11, footer
    * 24 / 12; title and h1 are `Doc {id}`; the single content paragraph
    * is the entity-escaped document text. */
  def synthChrome(id: Long, text: String): String =
    s"""<html><head><title>Doc $id</title></head><body>
<div class="nav"><a href="/">Home</a> <a href="/about">About</a> <a href="/docs">Docs</a></div>
<h1>Doc $id</h1>
<p>${enc(text)}</p>
<div class="rel">Related: <a href="/d/1">one</a> <a href="/d/2">two</a> <a href="/d/3">three</a></div>
<div class="footer"><a href="/tos">Terms</a> | <a href="/priv">Privacy</a> (c) 2026</div>
</body></html>"""

  /** Per-block (visible chars, anchor chars) over a page — the raw
    * signal of jusText/readability-style boilerplate removal. Blocks
    * are segments between BLOCK-LEVEL tag boundaries; inside a block,
    * visible text accumulates like [[extractText]] (comments and
    * script/style dropped whole, inline tags become separators,
    * entities decoded after tag handling, whitespace collapsed), and
    * anchor chars are the summed collapsed lengths of `<a>` contents.
    * Empty blocks (chrome whitespace between structural tags) are
    * dropped. The keep-rule (2·link < text, integer-exact — no float
    * density) lives in the caller. */
  def blockStats(html: String): Seq[(Int, Int)] = {
    val n = html.length
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    val block = new StringBuilder
    val anchor = new StringBuilder
    var linkChars = 0
    var aDepth = 0
    def flushAnchor(): Unit =
      if (aDepth == 0 && anchor.nonEmpty) {
        linkChars += collapseWs(anchor).length; anchor.clear()
      }
    def flushBlock(): Unit = {
      // an unterminated anchor still contributes its text
      if (anchor.nonEmpty) { linkChars += collapseWs(anchor).length; anchor.clear() }
      aDepth = 0
      val t = collapseWs(block)
      if (t.nonEmpty) out += ((t.length, linkChars))
      block.clear(); linkChars = 0
    }
    def append(s: String): Unit = {
      block.append(s)
      if (aDepth > 0) anchor.append(s)
    }
    def appendC(ch: Char): Unit = {
      block.append(ch)
      if (aDepth > 0) anchor.append(ch)
    }
    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (regionMatchesIgnoreCase(html, i, "<!--")) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
          append(" ")
        } else if (regionMatchesIgnoreCase(html, i + 1, "script") &&
            nameEnd(html, i + 7)) {
          i = skipElement(html, i, "script"); append(" ")
        } else if (regionMatchesIgnoreCase(html, i + 1, "style") &&
            nameEnd(html, i + 6)) {
          i = skipElement(html, i, "style"); append(" ")
        } else {
          val close = i + 1 < n && html.charAt(i + 1) == '/'
          val nameAt = if (close) i + 2 else i + 1
          var e = nameAt
          while (e < n && Character.isLetterOrDigit(html.charAt(e))) e += 1
          val name = html.substring(nameAt, e).toLowerCase
          val tagEnd = html.indexOf('>', i + 1)
          if (BlockTags(name)) flushBlock()
          else if (name == "a") {
            if (close) { if (aDepth > 0) { aDepth -= 1; flushAnchor() } }
            else aDepth += 1
          }
          if (!BlockTags(name)) append(" ")
          i = if (tagEnd < 0) n else tagEnd + 1
        }
      } else if (c == '&') {
        entity(html, i) match {
          case Some((txt, nxt)) => append(txt); i = nxt
          case None => appendC('&'); i += 1
        }
      } else { appendC(c); i += 1 }
    }
    flushBlock()
    out.toSeq
  }

  private val BlockTags = Set("html", "head", "body", "title", "div", "p",
    "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol", "section",
    "article", "nav", "footer", "header", "table", "tr", "td", "br")

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
          // surrogate test on the full codepoint, not cp.toChar — the
          // char cast truncates astral codepoints to 16 bits and would
          // wrongly reject e.g. &#x1D800;
          if (cp > 0 && cp <= 0x10FFFF && !(cp >= 0xD800 && cp <= 0xDFFF))
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
