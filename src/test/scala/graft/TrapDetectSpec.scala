package graft

import graft.frontier.TrapDetect
import org.apache.spark.sql.functions._

/** TrapDetect: template abstraction, per-URL signals, the all-integer
  * host verdict, and the shuffle-free projection plan shape.
  */
class TrapDetectSpec extends SparkTestBase {

  import spark.implicits._

  test("urlSignals: templates, query key sets, structural signals") {
    val rows = TrapDetect.urlSignals(Seq(
      "http://h.ir/article/12345/comment-9",         // digits → {n}
      "http://h.ir/obj/deadbeef01/x",                // ≥8 hex chars → {hex}
      "http://h.ir/s?b=2&a=1&a=3",                   // keys sorted+deduped
      "http://h.ir/cal/2026/01/2026/01/2026/01",     // repeated segments
      "http://h.ir/a/b/c/d/e/f/g/h/i",               // depth 9 > 8
      "http://h.ir/f?p1=1&p2=2&p3=3&p4=4&p5=5&p6=6&p7=7", // 7 params > 6
      "http://h.ir/x" + ("y" * 520)                  // long
    ).toDF("url"), maxDepth = 8, minRepeats = 2, maxParams = 6, maxLen = 512)
      .collect().map(r => r.getAs[String]("url") ->
        ((r.getAs[String]("template"), r.getAs[String]("query_keys"),
          r.getAs[Boolean]("deep"), r.getAs[Boolean]("repeats"),
          r.getAs[Boolean]("many_params"), r.getAs[Boolean]("long_url")))).toMap

    assert(rows("http://h.ir/article/12345/comment-9")._1 == "/article/{n}/comment-{n}")
    assert(rows("http://h.ir/obj/deadbeef01/x")._1 == "/obj/{hex}{n}/x" ||
      rows("http://h.ir/obj/deadbeef01/x")._1 == "/obj/{hex}/x")
    assert(rows("http://h.ir/s?b=2&a=1&a=3")._2 == "a,b")
    val cal = rows("http://h.ir/cal/2026/01/2026/01/2026/01")
    assert(cal._4, "repeated calendar segments must flag") // repeats
    assert(rows("http://h.ir/a/b/c/d/e/f/g/h/i")._3) // deep
    assert(rows("http://h.ir/f?p1=1&p2=2&p3=3&p4=4&p5=5&p6=6&p7=7")._5)
    assert(rows.values.count(_._6) == 1) // exactly the long one
  }

  test("a '?' inside a fragment is not a query") {
    val rows = TrapDetect.urlSignals(Seq(
      "http://h.ir/p#a?x=1&y=2&z=3&w=4&v=5&u=6&t=7", // all fragment text
      "http://h.ir/p?x=1#frag?y=2&z=3"               // real query then fragment
    ).toDF("url")).collect().map(r => r.getAs[String]("url") ->
      ((r.getAs[String]("query_keys"), r.getAs[Boolean]("many_params")))).toMap
    assert(rows("http://h.ir/p#a?x=1&y=2&z=3&w=4&v=5&u=6&t=7") == (("", false)))
    assert(rows("http://h.ir/p?x=1#frag?y=2&z=3") == (("x", false)))
  }

  test("urlSignals is a shuffle-free projection") {
    val plan = TrapDetect.urlSignals(Seq("http://h.ir/a/1").toDF("url"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("trapHosts: explosion and signal-fraction routes; integer-exact") {
    // calendar trap: 200 urls, ONE template (all digits abstract away)
    val trapCal = (0 until 200).map(i =>
      s"http://cal.ir/d/${2000 + i / 12}/${1 + i % 12}")
    // faceted trap: 120 urls of one template, heavy param counts
    val trapFacet = (0 until 120).map(i =>
      s"http://shop.ir/list?a=$i&b=$i&c=$i&d=$i&e=$i&f=$i&g=$i")
    // healthy host: 150 urls over 100 authored templates (1-2 urls each)
    val healthy = (0 until 150).map(i =>
      s"http://news.ir/section$i/story-${i % 2}")
    // small host: explosive shape but under minUrls
    val small = (0 until 10).map(i => s"http://tiny.ir/p/$i")
    val urls = (trapCal ++ trapFacet ++ healthy ++ small).toDF("url")

    val got = TrapDetect.trapHosts(urls, minUrls = 100L, explosion = 50L)
      .collect().map(r => r.getAs[String]("host") ->
        ((r.getAs[Long]("n_urls"), r.getAs[Long]("n_templates"),
          r.getAs[Boolean]("exploded"), r.getAs[Boolean]("trap")))).toMap

    assert(got("cal.ir") == ((200L, 1L, true, true)))
    // shop.ir: 120 urls / 1 template → exploded AND ≥¼ flagged (7 params)
    assert(got("shop.ir")._3 && got("shop.ir")._4)
    // news.ir: "section{i}" abstracts i → templates collapse to
    // /section{n}/story-{n} — 150 urls, 1 template: looks exploded BY
    // DESIGN of the fixture... so use authored alpha names instead
    assert(got("tiny.ir")._4 == false, "under minUrls can never flag")
  }

  test("trapHosts: authored template diversity does not flag") {
    // 120 urls across 120 distinct ALPHA templates (no digits to abstract)
    val healthy = (0 until 120).map { i =>
      val c1 = ('a' + (i % 20)).toChar
      val c2 = ('a' + ((i / 20) % 6)).toChar
      s"http://news.ir/$c1$c2${"x" * (i % 3)}/story-$c1"
    }
    val got = TrapDetect.trapHosts(healthy.toDF("url"),
      minUrls = 100L, explosion = 50L).collect()
      .map(r => r.getAs[String]("host") ->
        ((r.getAs[Long]("n_templates"), r.getAs[Boolean]("trap")))).toMap
    assert(got("news.ir")._1 >= 80L)
    assert(!got("news.ir")._2)
  }
}
