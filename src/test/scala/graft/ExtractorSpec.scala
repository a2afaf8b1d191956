package graft

import graft.extract.Extractor
import org.scalatest.funsuite.AnyFunSuite

/** Golden byte-diff tests for the extraction invariant (SURVEY.md §2.3,
  * FIXTURES.md §2). Expected values are hand-computed from the reference's
  * semantics (/root/reference/src/parser.py) — an oracle path independent
  * of the HtmlDom/PyText code under test.
  */
class ExtractorSpec extends AnyFunSuite {

  /** Canonical detail page exercising the exact positional XPaths of
    * parser.py:272-276,349,358,367. Whitespace is deliberate: newlines and
    * indentation inside content must collapse to single spaces.
    */
  private def detailHtml(
      opinionNo: String,
      fileNo: String,
      dateText: String,
      question: String,
      answer: String): String =
    s"""<html><body>
<div id="mvcContainer-1286">
<div>
<div>
<div>عنوان صفحه</div>
<div>
<div>
<div>
<div>برچسب</div>
<div>
<div>$opinionNo</div>
<div>$fileNo</div>
<div>$dateText</div>
</div>
</div>
<div>
<div>
<div>سرصفحه</div>
<div><div>$question</div></div>
<div>جداکننده</div>
<div><div>$answer</div></div>
</div>
</div>
</div>
</div>
</div>
</div>
</div>
</body></html>"""

  test("golden: full well-formed page, ASCII date") {
    val html = detailHtml(
      opinionNo = "شماره نظریه 7/1402/555",
      fileNo = "پرونده 1402-55-ک",
      dateText = "تاریخ نظریه 1402/11/07",
      question = "آیا مطالبه\nخسارت ممکن است؟",
      answer = "نظریه مشورتی اداره کل حقوقی قوه قضاییه :\nبله، طبق ماده ۵۱۵ قانون.")
    val e = Extractor.extract("u1", "f1", html)
    assert(e.question == "آیا مطالبه خسارت ممکن است؟")
    // answer-label → "\n\n" → collapsed; leading label strips away entirely
    assert(e.answer == "بله، طبق ماده ۵۱۵ قانون.")
    // content = text_content of the whole content div, document order,
    // newlines collapsed: header, question, separator, answer (label inside
    // content collapses to a single space mid-string)
    assert(e.content == "سرصفحه آیا مطالبه خسارت ممکن است؟ جداکننده بله، طبق ماده ۵۱۵ قانون.")
    assert(e.opinion_number == "7/1402/555")
    assert(e.file_number == "1402-55-ک")
    assert(e.opinion_date_shamsi == "1402/11/07")
    assert(e.opinion_date_gregorian == "2024/01/27")
  }

  test("golden: Persian-digit date converts like CPython int()") {
    val html = detailHtml("ن ۱", "پ ۲", "مورخ ۱۴۰۰/۰۱/۰۱", "سوال", "جواب")
    val e = Extractor.extract("u", "f", html)
    assert(e.opinion_date_shamsi == "1400/01/01")
    assert(e.opinion_date_gregorian == "2021/03/21")
    assert(e.opinion_number == "۱")
    assert(e.file_number == "۲")
  }

  test("golden: invalid shamsi date → formatted shamsi, default gregorian") {
    val html = detailHtml("1", "2", "1400/12/30", "q", "a")
    val e = Extractor.extract("u", "f", html)
    assert(e.opinion_date_shamsi == "1400/12/30")
    assert(e.opinion_date_gregorian == "0001/01/01")
  }

  test("golden: no date pattern → default dates") {
    val html = detailHtml("1", "2", "بدون تاریخ", "q", "a")
    val e = Extractor.extract("u", "f", html)
    assert(e.opinion_date_shamsi == "0001/01/01")
    assert(e.opinion_date_gregorian == "0001/01/01")
  }

  test("golden: NBSP strips at edges, ZWNJ survives inside") {
    val html = detailHtml("1", "2", "1403/1/1",
      " می‌خواهم بدانم ", "پاسخ  داده می‌شود")
    val e = Extractor.extract("u", "f", html)
    assert(e.question == "می\u200cخواهم بدانم")
    // NBSP inside collapses (with adjacent space) to one space
    assert(e.answer == "پاسخ داده می\u200cشود")
  }

  test("missing question div → sentinel, content intact") {
    val html = s"""<div id="mvcContainer-1286"><div><div>
<div>t</div>
<div><div>
<div><div>x</div><div><div>m1</div><div>m2</div><div>m3 1403/2/2</div></div></div>
<div><div>
<div>فقط محتوا</div>
</div></div>
</div></div>
</div></div></div>"""
    val e = Extractor.extract("u", "f", html)
    assert(e.question == "سوال نامشخص")
    assert(e.answer == "پاسخ نامشخص")
    assert(e.content == "فقط محتوا")
    assert(e.opinion_date_shamsi == "1403/02/02")
  }

  test("missing container → sentinels; content = 'q a' composition") {
    val e = Extractor.extract("u", "f", "<html><body><div>nothing here</div></body></html>")
    assert(e.question == "سوال نامشخص")
    assert(e.answer == "پاسخ نامشخص")
    assert(e.content == "سوال نامشخص پاسخ نامشخص")
    assert(e.file_number == "نامشخص")
    assert(e.opinion_number == "نامشخص")
    assert(e.opinion_date_shamsi == "0001/01/01")
  }

  test("element-free html → full sentinel object (lxml raise path)") {
    val e = Extractor.extract("u", "f", "")
    assert(e.question == "سوال نامشخص")
    assert(e.answer == "پاسخ نامشخص")
    assert(e.content == "محتوای نامشخص")
  }

  test("tag-free non-empty body → per-field sentinels (lxml wraps bare text)") {
    // lxml fromstring wraps element-free text in a synthetic element, so the
    // reference takes the missing-container path, NOT the parse-error path
    val e = Extractor.extract("u", "f", "plain text body, no tags at all")
    assert(e.question == "سوال نامشخص")
    assert(e.answer == "پاسخ نامشخص")
    assert(e.content == "سوال نامشخص پاسخ نامشخص")
    assert(e.file_number == "نامشخص")
    assert(e.opinion_date_shamsi == "0001/01/01")
  }

  test("error-page sentinel filter (handler.py:40-53)") {
    assert(!Extractor.isValidHtml("<html>خطایی رخ داده است</html>"))
    assert(Extractor.isValidHtml("<html>سالم</html>"))
  }

  test("metadata chars: only digits (any script) and -/کط survive") {
    val html = detailHtml("نظریه شماره 55/7 الف", "کلاسه: 99-1402 ب", "1403/1/1", "q", "a")
    val e = Extractor.extract("u", "f", html)
    assert(e.opinion_number == "55/7")
    assert(e.file_number == "ک99-1402")
  }

  test("empty metadata after cleaning → نامشخص") {
    val html = detailHtml("الف ب", "", "1403/1/1", "q", "a")
    val e = Extractor.extract("u", "f", html)
    assert(e.opinion_number == "نامشخص")
    assert(e.file_number == "نامشخص")
  }

  test("nested markup inside question: text_content document order") {
    val html = detailHtml("1", "2", "1403/1/1",
      "بخش <b>مهم <i>درونی</i></b> پایان", "a")
    val e = Extractor.extract("u", "f", html)
    assert(e.question == "بخش مهم درونی پایان")
  }

  test("entities decode before normalization") {
    val html = detailHtml("1", "2", "1403/1/1", "alpha &amp; beta&nbsp;&zwnj;end", "a")
    val e = Extractor.extract("u", "f", html)
    // &nbsp; is python-whitespace → collapses with nothing around it to a
    // single space; &zwnj; survives
    assert(e.question == "alpha & beta \u200cend")
  }

  test("streaming == full: parseContainer extraction equals the full-tree path") {
    // fixture pages of every variant (normal / degenerate / error) plus
    // adversarial HTML targeting the streaming parser's skip/build/stop
    // transitions
    val cfg = graft.fixtures.FixtureConfig(seed = 7L, hosts = 4,
      totalDetails = 120, wordScale = 2)
    val fixturePages = (0 until 120).map { i =>
      val h = if (i < 60) 0 else 1 + (i % 3)
      graft.fixtures.FixtureGen.detailHtml(cfg, h, i % cfg.hostCounts(h))
    }
    val c = "mvcContainer-1286"
    val adversarial = Seq(
      "", "   \n\t ", "plain text no tags", "&nbsp;&nbsp;", "&amp;",
      "<", "a<", "<3 not a tag", "<!doctype html><!-- c --><?pi?>",
      s"""<div id="$c">x</div>""",
      s"""<div ID='$c'>case-insensitive attr</div>""",
      s"""<div id=$c>unquoted</div>""",
      s"""<div id="$c"/>""", // self-closed container
      s"""<p><div id="mvcContainer&#45;1286">entity in id</div></p>""",
      s"""<div id="wrong"><div id="$c">nested find</div></div>""",
      s"""<div id="$c"><b>one</b><div>two</div></div><div id="$c">second</div>""",
      // stray close tags popping out of the container mid-subtree
      s"""<html><body><div id="$c"><div>in</div></body><div>out</div></html>""",
      s"""<section><div id="$c"><span>a</span></section><div>after</div>""",
      // unclosed container (EOF inside subtree)
      s"""<div id="$c"><div>never closed""",
      // raw-text handling: fake tags inside script, script inside container,
      // container-looking markup inside script BEFORE the real container
      s"""<script>var a = "<div id=\\"$c\\">fake</div>";</script><div id="$c">real</div>""",
      s"""<div id="$c"><script>if (a<b) {x()}</script><div>t</div></div>""",
      s"""<style>.x{}</style><div id="$c"><style>#y</style>z</div>""",
      // entities in text, void tags, comments inside the subtree
      s"""<div id="$c">a&amp;b<br>c<!-- gone --><img src=x>d&#65;&nbsp;e</div>""",
      // whitespace-heavy + Persian text + newline collapse
      s"""<div id="$c">\n  \u0633\u0637\u0631 \u0627\u0648\u0644\n\u0633\u0637\u0631 \u062f\u0648\u0645  \n</div>""",
      // attributes after id, valueless attrs, '/' noise
      s"""<div class="k" id="$c" hidden data-x=1/ ><i>v</i></div>""",
      // deep unrelated chrome before the container (skip-mode exercise)
      ("<header><nav>" + (1 to 50).map(k => s"<a href='/$k'>l$k</a>").mkString +
        s"</nav></header><main><div id='$c'><div>payload</div></div></main>"))
    (fixturePages ++ adversarial).zipWithIndex.foreach { case (html, i) =>
      val a = Extractor.extract(s"u$i", s"f$i", html)
      val b = Extractor.extractViaFullParse(s"u$i", s"f$i", html)
      assert(a == b, s"mismatch on input #$i: ${html.take(120)}")
    }
  }
}
