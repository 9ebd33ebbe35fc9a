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

  test("synthFixedLen decomposition holds for arbitrary inputs") {
    val (id, lang, source, text) = (1234L, "de", "s&p", "x<y>\"z\"")
    val len = Html.synth(id, lang, source, text).length.toLong
    assert(len == Html.synthFixedLen + 3 * id.toString.length +
      Html.enc(text).length + Html.enc(source).length + Html.enc(lang).length)
  }
}
