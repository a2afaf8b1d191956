package graft

import graft.frontier.RobotsRules
import graft.sources.{SitemapEntry, Sitemaps}
import org.apache.spark.sql.functions._

/** Sitemaps source: urlset/sitemapindex parsing, gz blobs, file reads,
  * frontier seeding, and robots `Sitemap:` discovery.
  */
class SitemapsSpec extends SparkTestBase {

  import spark.implicits._

  private val urlset =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      |  <url>
      |    <loc>https://H.ir/p?a=1&amp;b=2</loc>
      |    <lastmod>2026-01-15</lastmod>
      |    <changefreq>daily</changefreq>
      |    <priority>0.8</priority>
      |  </url>
      |  <url><loc>https://h.ir/plain</loc></url>
      |  <url><lastmod>2026-01-01</lastmod></url>
      |  <url><loc>https://h.ir/badprio</loc><priority>often</priority></url>
      |</urlset>""".stripMargin

  test("urlset parse: entities, optional fields, missing-loc skip, bad priority") {
    val got = Sitemaps.parse("https://h.ir/sitemap.xml", urlset)
    assert(got.size == 3) // the loc-less entry is skipped
    val full = got.head
    assert(full.kind == "url")
    assert(full.loc == "https://H.ir/p?a=1&b=2") // entity decoded, NOT canonicalized
    assert(full.lastmod == "2026-01-15")
    assert(full.changefreq == "daily")
    assert(full.priority == 0.8)
    val plain = got(1)
    assert(plain.lastmod == null && plain.changefreq == null && plain.priority == null)
    assert(got(2).priority == null) // "often" is not a priority
  }

  test("sitemapindex parse; non-sitemap documents and null yield no entries") {
    val index =
      """<?xml version="1.0"?><sitemapindex>
        |  <sitemap><loc>https://h.ir/sitemap-1.xml.gz</loc><lastmod>2026-02-01</lastmod></sitemap>
        |  <sitemap><loc>https://h.ir/sitemap-2.xml.gz</loc></sitemap>
        |</sitemapindex>""".stripMargin
    val got = Sitemaps.parse("https://h.ir/sitemap.xml", index)
    assert(got.map(_.loc) ==
      Seq("https://h.ir/sitemap-1.xml.gz", "https://h.ir/sitemap-2.xml.gz"))
    assert(got.forall(_.kind == "sitemap"))
    // an html error page served at the sitemap url
    assert(Sitemaps.parse("u", "<html><body>404 not found</body></html>").isEmpty)
    assert(Sitemaps.parse("u", null).isEmpty)
    assert(Sitemaps.parse("u", "").isEmpty)
  }

  test("parseBlobs: plain and gzip blobs, null blob, distributed") {
    val gz = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(urlset.getBytes("UTF-8")); g.close()
      bos.toByteArray
    }
    val df = Seq(
      ("https://h.ir/sitemap.xml", urlset.getBytes("UTF-8")),
      ("https://h.ir/sitemap.xml.gz", gz),
      ("https://h.ir/null", null)
    ).toDF("url", "body")
    val got = Sitemaps.parseBlobs(spark, df).collect()
    assert(got.length == 6) // 3 entries from each non-null blob
    assert(got.count(_.sitemap_url.endsWith(".gz")) == 3)
    assert(got.filter(_.sitemap_url.endsWith(".gz")).map(_.loc).sorted.toSeq ==
      got.filter(_.sitemap_url.endsWith(".xml")).map(_.loc).sorted.toSeq)
  }

  test("read: file surface with gz auto-detect; missing path fails loudly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sitemaps").toFile
    try {
      java.nio.file.Files.write(new java.io.File(dir, "a.xml").toPath,
        urlset.getBytes("UTF-8"))
      val g = new java.util.zip.GZIPOutputStream(
        new java.io.FileOutputStream(new java.io.File(dir, "b.xml.gz")))
      g.write(urlset.getBytes("UTF-8")); g.close()
      val got = Sitemaps.read(spark, s"${dir.getAbsolutePath}/*.xml*").collect()
      assert(got.length == 6)
      intercept[java.io.FileNotFoundException] {
        Sitemaps.read(spark, s"${dir.getAbsolutePath}/nope/definitely-missing")
      }
      assert(Sitemaps.read(spark, s"${dir.getAbsolutePath}/zero-match-*.glob")
        .isEmpty)
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  test("seedFrontier: canonical keys, negated priority, 0.5 default, url-kind only") {
    val entries = Seq(
      SitemapEntry("s", "url", "HTTPS://H.ir:443/p?b=2&a=1#f", null, null, 0.9),
      SitemapEntry("s", "url", "https://h.ir/plain", null, null, null),
      SitemapEntry("s", "url", "ftp://h.ir/file", null, null, 0.9), // non-http drops
      SitemapEntry("s", "sitemap", "https://h.ir/child.xml", null, null, null)
    ).toDS()
    val got = Sitemaps.seedFrontier(entries).collect()
    assert(got.length == 2)
    val byUrl = got.map(e => e.url -> e).toMap
    val canon = byUrl("https://h.ir/p?a=1&b=2")
    assert(canon.priority == -0.9 && canon.host == "h.ir" &&
      canon.discovered_round == 0)
    assert(canon.url_key == graft.url.Urls.sha256Hex("https://h.ir/p?a=1&b=2"))
    assert(byUrl("https://h.ir/plain").priority == -0.5) // spec default
  }

  test("robots Sitemap: directives are collected group-independently") {
    val rules = RobotsRules.parseRobotsTxt(
      """Sitemap: https://h.ir/sitemap.xml
        |User-agent: googlebot
        |Disallow: /g
        |Sitemap: https://h.ir/sitemap-news.xml
        |User-agent: *
        |Disallow: /private
        |Crawl-delay: 2
        |""".stripMargin)
    assert(rules.sitemaps ==
      Seq("https://h.ir/sitemap.xml", "https://h.ir/sitemap-news.xml"))
    // the star group's rules are unaffected by the interleaved directives
    assert(rules.disallow == Seq("/private"))
    assert(rules.crawlDelayMs.contains(2000L))
  }
}
