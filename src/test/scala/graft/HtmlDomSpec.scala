package graft

import graft.html.HtmlDom
import org.scalatest.funsuite.AnyFunSuite

class HtmlDomSpec extends AnyFunSuite {

  test("text_content concatenates descendant text in document order") {
    val root = HtmlDom.parse("<div>a<span>b<i>c</i></span>d</div>").get
    assert(root.textContent == "abcd")
  }

  test("comments are excluded, script/style text included (lxml semantics)") {
    val root = HtmlDom.parse("<div>a<!-- no -->b<style>.x{}</style></div>").get
    assert(root.textContent == "ab.x{}")
  }

  test("entities decode in text and attributes") {
    val root = HtmlDom.parse("""<div id="x&amp;y">&lt;tag&gt; &amp; &#65;&#x42;&nbsp;!</div>""").get
    assert(root.textContent == "<tag> & AB !")
    val el = root.findById("x&y")
    assert(el.isDefined)
  }

  test("HTML4 named entities decode like lxml (Latin-1, punctuation, Greek)") {
    val root = HtmlDom.parse(
      "<div>caf&eacute; &mdash; &hellip; &alpha;&Sigma;&sigma;&sigmaf; " +
        "&rsquo;&euro;&Omega;&rho; &notareal;</div>").get
    assert(root.textContent ==
      "café — … αΣσς ’€Ωρ &notareal;", root.textContent)
  }

  test("raw-text close needs a name boundary ('</styles>' stays raw text)") {
    // a prefix match would cut at '</styles' where lxml keeps scanning
    val root = HtmlDom.parse("<div><style>a</styles>b</style>c</div>").get
    assert(root.textContent == "a</styles>bc", root.textContent)
    // streaming parse agrees (the parity spec uses shared fixtures; this
    // pins the specific edge)
    val stream = HtmlDom.parseContainer(
      """<div id="t"><style>a</styles>b</style>c</div>""", "t")
    stream match {
      case HtmlDom.FoundContainer(c) =>
        assert(c.textContent == "a</styles>bc", c.textContent)
      case other => fail(s"container not found: $other")
    }
  }

  test("void and self-closing tags don't swallow siblings") {
    val root = HtmlDom.parse("<div>a<br>b<img src=x>c<span/>d</div>").get
    assert(root.textContent == "abcd")
  }

  test("unclosed tags recover; stray close tags ignored") {
    val root = HtmlDom.parse("<div><p>a<div>b</div></wat>c").get
    assert(root.textContent == "abc")
  }

  test("findById locates nested element") {
    val html = """<html><body><div><div id="mvcContainer-1286"><div>x</div></div></div></body></html>"""
    val root = HtmlDom.parse(html).get
    val el = root.findById("mvcContainer-1286")
    assert(el.isDefined && el.get.textContent == "x")
  }

  test("elementChildren is positional per tag") {
    val root = HtmlDom.parse("<div id=r><span>s</span><div>1</div><p>p</p><div>2</div></div>").get
    val r = root.findById("r").get
    val divs = r.elementChildren("div")
    assert(divs.map(_.textContent) == Seq("1", "2"))
  }

  test("empty / whitespace-only input returns None (lxml raises)") {
    assert(HtmlDom.parse("") == None)
    assert(HtmlDom.parse("   \n\t ") == None)
    assert(HtmlDom.parse(null) == None)
  }

  test("bare text (no element) is wrapped like lxml fromstring") {
    val root = HtmlDom.parse("   just text   ").get
    assert(root.textContent == "   just text   ")
    assert(root.findById("mvcContainer-1286").isEmpty)
  }

  test("attributes: quoted, single-quoted, unquoted, bare") {
    val root = HtmlDom.parse("""<div id="a" class='b c' data-x=7 hidden>t</div>""").get
    val el = root.findById("a").get
    assert(el.attrs == Map("id" -> "a", "class" -> "b c", "data-x" -> "7", "hidden" -> ""))
  }

  test("raw text inside script is not parsed as markup") {
    val root = HtmlDom.parse("<div><script>if (a<b) {x()}</script>t</div>").get
    assert(root.textContent == "if (a<b) {x()}t")
  }

  test("textContentNormalized == normalizeField ∘ textContentCleaned (fusion pin)") {
    import graft.text.PyText
    val label = PyText.AnswerLabel
    val labelWithNewline = label.replaceFirst(" ", "\n") // must still match post \n→' '
    val cases = Seq(
      "<div>plain text</div>",
      "<div>  edge   spaces \n and\truns  </div>",
      s"<div>$label after-label</div>",
      s"<div>before $label</div>",
      s"<div>$label</div>", // label-only → empty normalized, nonEmpty cleaned
      s"<div>a $labelWithNewline b</div>",
      s"<div>x${label}${label}y</div>", // adjacent labels
      "<div>  </div>", // NBSP-only → cleaned empty
      "<div></div>",
      "<div>a&amp;b &nbsp; c&#65;</div>",
      "<div>multi<span>nested $ text</span><i>\nnodes</i></div>",
      s"<div>half نظریه مشورتی اداره truncated</div>")
    cases.foreach { html =>
      val el = HtmlDom.parse(html).get
      val cleaned = el.textContentCleaned
      val expected = (PyText.normalizeField(cleaned), cleaned.nonEmpty)
      assert(el.textContentNormalized == expected, s"on: $html")
    }
    // spans from the streaming parse must behave identically
    val viaStream = HtmlDom.parseContainer(
      s"""<p>skip</p><div id="c">a $labelWithNewline b&amp;c  </div><p>after</p>""", "c")
      .asInstanceOf[HtmlDom.FoundContainer].el
    val cleanedS = viaStream.textContentCleaned
    assert(viaStream.textContentNormalized ==
      (PyText.normalizeField(cleanedS), cleanedS.nonEmpty))
  }
}
