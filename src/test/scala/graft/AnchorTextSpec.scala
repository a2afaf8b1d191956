package graft

import graft.frontier.AnchorText
import org.apache.spark.sql.functions._

/** AnchorText: extraction semantics on adversarial markup, aggregation
  * contracts, and the WindowGroupLimit pushdown plan shape.
  */
class AnchorTextSpec extends SparkTestBase {

  import spark.implicits._

  test("pageAnchors: resolution, filtering, nesting, entities, whitespace") {
    val html =
      """<html><body>
        |<a href="/abs">Abs <b>Bo</b>ld</a>
        |<a href="rel.html">  spaced
        |   text </a>
        |<a HREF="HTTP://Other.COM:80/x?b=2&amp;a=1#f">Ext &amp; more</a>
        |<a href="//cdn.ir/lib.js">scheme rel</a>
        |<a href="mailto:x@y.z">mail</a>
        |<a href="javascript:void(0)">js</a>
        |<a href="#frag">frag only</a>
        |<a href="">empty</a>
        |<a name="anchor-no-href">no href</a>
        |<a href="/icon"><img src="i.png"/></a>
        |</body></html>""".stripMargin
    val got = AnchorText.pageAnchors("http://h.ir/dir/page.html", html)
    val byDst = got.map(a => (a.dst_url, a.text)).toMap
    assert(byDst("http://h.ir/abs") == "Abs Bold") // nested tags flattened
    assert(byDst("http://h.ir/dir/rel.html") == "spaced text") // \s+ collapsed
    // uppercase HREF attr, entity in href AND text, canonicalized target
    // (default port stripped, host lowercased, query sorted, fragment cut)
    assert(byDst("http://other.com/x?a=1&b=2") == "Ext & more")
    assert(byDst("http://cdn.ir/lib.js") == "scheme rel")
    // fragment-only resolves to the page itself (self-link) — kept:
    // it IS an http link; the frontier's seen-set collapses it
    assert(byDst.contains("http://h.ir/dir/page.html"))
    assert(byDst("http://h.ir/icon") == "") // image link: empty text kept
    // mailto/javascript/empty-href/no-href never appear
    assert(!byDst.keys.exists(k => k.contains("mailto") || k.contains("javascript")))
    assert(got.size == 6)
  }

  test("pageAnchors: malformed html is lenient; no-element and null are empty") {
    assert(AnchorText.pageAnchors("http://h.ir/", null).isEmpty)
    assert(AnchorText.pageAnchors(null, "<a href='/x'>t</a>").isEmpty)
    assert(AnchorText.pageAnchors("http://h.ir/", "plain text no tags").isEmpty)
    // unclosed anchor still yields its href; text runs to document end
    val got = AnchorText.pageAnchors("http://h.ir/", "<a href='/x'>tail text")
    assert(got.map(_.dst_url) == Seq("http://h.ir/x"))
    assert(got.head.text == "tail text")
  }

  test("pageAnchors: text length cap") {
    val long = "w " * 400
    val got = AnchorText.pageAnchors("http://h.ir/",
      s"""<a href="/x">$long</a>""")
    assert(got.head.text.length == AnchorText.MaxTextLen)
  }

  test("anchors() reads binary html columns; topAnchors counts, ties, k-cut") {
    val pages = Seq(
      ("http://s1.com/a", """<a href="http://t.com/p">buy now</a><a href="http://t.com/p">buy now</a>"""),
      ("http://s2.com/b", """<a href="http://t.com/p">buy now</a><a href="http://t.com/p">cheap</a>"""),
      ("http://s3.com/c", """<a href="http://t.com/p">azerty</a><a href="http://t.com/q"><img/></a>""")
    ).toDF("url", "html")
      .withColumn("html", col("html").cast("binary")) // input_hint shape
    val anchors = AnchorText.anchors(pages).toDF()
    assert(anchors.count() == 6)
    val top = AnchorText.topAnchors(anchors, k = 2)
    val rows = top.collect().map(r => (r.getAs[String]("dst_url"),
      r.getAs[String]("text"), r.getAs[Long]("cnt"), r.getAs[Int]("rnk")))
    // t.com/p: buy now ×3 > {azerty, cheap} ×1 — tie broken text-asc, k=2
    // cuts at azerty; t.com/q's only anchor text is empty → dropped
    assert(rows.toSet == Set(
      ("http://t.com/p", "buy now", 3L, 1), ("http://t.com/p", "azerty", 1L, 2)))
    // rank-limit pushes below the exchange: hot targets are bounded
    // map-side (the curate_source_cap pattern)
    val plan = AnchorText.topAnchors(anchors, k = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("hostAnchorStats: Urls.host-compatible keys, counts") {
    val anchors = Seq(
      ("http://s.com/1", "http://T.com:80/a", "x"),
      ("http://s.com/2", "http://t.com/b", "y"),
      ("http://s.com/3", "https://u.com/c", "z")
    ).toDF("src_url", "dst_url", "text")
    val got = AnchorText.hostAnchorStats(anchors).collect()
      .map(r => (r.getAs[String]("host"), r.getAs[Long]("in_links"))).toMap
    // T.com:80 and t.com collapse to one host — frontier-join-compatible
    assert(got == Map("t.com" -> 2L, "u.com" -> 1L))
  }
}
