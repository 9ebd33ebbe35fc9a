package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** The HTML text extractor: hand fixtures for every state (comments,
  * raw-text elements, entities, whitespace) plus the synth→extract
  * contract t33's oracle replays. */
class HtmlSpec extends AnyFunSuite {

  test("tags separate words; whitespace collapses; ends trim") {
    assert(Html.extractText("<h1>A</h1><p>B</p>") == "A B")
    assert(Html.extractText("  <p>\n  x \t y  </p>  ") == "x y")
  }

  test("comments drop whole, including markup inside them") {
    assert(Html.extractText("a<!-- <p>hidden</p> \n more -->b") == "a b")
    assert(Html.extractText("a<!-- unterminated") == "a")
  }

  test("script/style drop with content; lookalike tags do not") {
    assert(Html.extractText(
      "<script>var a = '<p>not text</p>';</script>ok") == "ok")
    assert(Html.extractText("<style>p { color: red }</style>ok") == "ok")
    assert(Html.extractText("<SCRIPT>x</SCRIPT>ok") == "ok") // case-insensitive
    assert(Html.extractText("<scriptx>inner</scriptx>") == "inner")
    assert(Html.extractText("<script>never closed") == "")
  }

  test("entities decode after tag handling") {
    assert(Html.extractText("&lt;p&gt;") == "<p>") // never becomes a tag
    assert(Html.extractText("&amp;amp;") == "&amp;") // single decode pass
    assert(Html.extractText("&#68;oc &#x41; &nbsp;x") == "Doc A x")
    assert(Html.extractText("&quot;q&quot; &apos;a&apos;") == "\"q\" 'a'")
    // malformed entities pass through literally
    assert(Html.extractText("a & b &unknown; &#zz; &#;") ==
      "a & b &unknown; &#zz; &#;")
  }

  test("enc/extract roundtrip is the identity on hostile text") {
    val hostile = "a & b < c > \"d\" &amp; <script>e</script>"
    assert(Html.extractText("<p>" + Html.enc(hostile) + "</p>") == hostile)
  }

  test("synth extracts to exactly the string the t33 oracle rebuilds") {
    val (id, lang, source, text) = (7L, "en", "web", "hello  world & <tag>")
    val expected = s"Doc $id Document $id hello world & <tag> " +
      s"""source "$source" & lang $lang"""
    assert(Html.extractText(Html.synth(id, lang, source, text)) == expected)
  }

  test("blockStats: segmentation, anchor accounting, empty-block drop") {
    // two blocks; anchors counted per block, never leaking across
    val bs = Html.blockStats(
      "<div><a href=\"/x\">Home</a> page</div>\n<p>plain body</p>")
    assert(bs == Seq((9, 4), (10, 0))) // "Home page", "plain body"
    // whitespace-only segments between structural tags are dropped
    assert(Html.blockStats("<div>a</div>  \n  <div>b</div>").size == 2)
    // inline tags inside a block separate words but do not split it
    assert(Html.blockStats("<p>a<b>c</b>d</p>") == Seq((5, 0))) // "a c d"
    // an anchor spanning to block end still books its chars
    assert(Html.blockStats("<p><a>tail") == Seq((4, 4)))
  }

  test("synthChrome books the constants the t36 oracle replays") {
    val bs = Html.blockStats(Html.synthChrome(7L, "hello  world"))
    // title, nav, h1, p, rel, footer
    assert(bs == Seq((5, 0), (15, 13), (5, 0), (11, 0), (22, 11), (24, 12)))
    // empty text drops the paragraph block
    assert(Html.blockStats(Html.synthChrome(7L, "")).size == 5)
  }

  test("synthFixedLen decomposition holds for arbitrary inputs") {
    val (id, lang, source, text) = (1234L, "de", "s&p", "x<y>\"z\"")
    val len = Html.synth(id, lang, source, text).length.toLong
    assert(len == Html.synthFixedLen + 3 * id.toString.length +
      Html.enc(text).length + Html.enc(source).length + Html.enc(lang).length)
  }
}
