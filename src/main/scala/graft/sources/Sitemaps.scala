package graft.sources

import graft.html.HtmlDom
import graft.url.Urls
import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.col

/** One sitemap record: a page URL from a urlset, or a child sitemap from
  * a sitemapindex (`kind` = "url" | "sitemap"). `loc` is kept RAW (entity-
  * decoded but not canonicalized) — canonicalization happens at frontier
  * seeding so the source surface stays a faithful read of the file.
  * Absent optional fields are null; `priority` is null when absent or
  * unparseable (the seeding default of 0.5 is applied there, per spec).
  */
final case class SitemapEntry(
    sitemap_url: String,
    kind: String,
    loc: String,
    lastmod: String,
    changefreq: String,
    priority: java.lang.Double)

/** Sitemap source (sitemaps.org protocol) — how real crawlers SEED a
  * frontier, and a surface the reference never had (it walks a site-native
  * paginated search API instead, /root/reference/src/handler.py). Robots
  * `Sitemap:` directives ([[graft.frontier.Politeness.parseRobotsTxt]])
  * point here; urlset entries become frontier entries with the publisher's
  * own priority signal, and sitemapindex children are emitted as rows the
  * crawl loop can enqueue (fetching them is the fetcher's job — this
  * module never does I/O beyond the given bytes/files).
  *
  * Parsing reuses [[HtmlDom]] (lenient tokenizer, entity decode — the
  * sitemap spec REQUIRES entity-escaped URLs, so `&amp;` in `<loc>` is
  * the normal case). Default-namespace documents (the sitemap.org schema)
  * parse as plain tags; namespace-PREFIXED tags (`<sm:url>`, nonstandard)
  * are not supported. CDATA is not supported (the spec mandates escaping).
  * Gzip sitemaps (`sitemap.xml.gz`) auto-detect via the same magic-byte
  * dispatch as WARC ([[WarcSource.openMaybeGz]]).
  */
object Sitemaps {

  /** Parse one sitemap document. Tolerant: a document that is neither a
    * urlset nor a sitemapindex (error page served at the sitemap URL —
    * common in the wild) yields no entries rather than an exception;
    * entries with a missing/empty `<loc>` are skipped.
    */
  def parse(sitemapUrl: String, xml: String): Seq[SitemapEntry] = {
    if (xml == null) return Nil
    HtmlDom.parse(xml) match {
      case None => Nil
      case Some(root) =>
        // the container may sit under the synthetic #document root or be
        // the root element itself after lenient parsing
        def findContainer(e: HtmlDom.Element): Option[HtmlDom.Element] =
          if (e.tag == "urlset" || e.tag == "sitemapindex") Some(e)
          else e.children.iterator
            .collect { case c: HtmlDom.Element => findContainer(c) }
            .collectFirst { case Some(x) => x }
        findContainer(root) match {
          case None => Nil
          case Some(container) =>
            val (childTag, kind) =
              if (container.tag == "urlset") ("url", "url")
              else ("sitemap", "sitemap")
            container.elementChildren(childTag).flatMap { entry =>
              def text(tag: String): String =
                entry.elementChildren(tag).headOption
                  .map(_.textContent.trim).filter(_.nonEmpty).orNull
              val loc = text("loc")
              if (loc == null) None
              else {
                val prio: java.lang.Double = text("priority") match {
                  case null => null
                  case p =>
                    try java.lang.Double.valueOf(p.toDouble)
                    catch { case _: NumberFormatException => null }
                }
                Some(SitemapEntry(sitemapUrl, kind, loc,
                  text("lastmod"), text("changefreq"), prio))
              }
            }
        }
    }
  }

  /** Distributed kernel: one row of (url, xml-bytes) per sitemap file —
    * blobs are the parallel unit, gz auto-detected. The typed flatMap
    * rides the scan (the WarcSource.parseRecords shape).
    */
  def parseBlobs(spark: SparkSession, df: DataFrame,
      urlCol: String = "url", bytesCol: String = "body"): Dataset[SitemapEntry] = {
    import spark.implicits._
    df.select(col(urlCol).cast("string"), col(bytesCol).cast("binary"))
      .as[(String, Array[Byte])]
      .flatMap { case (u, blob) =>
        if (blob == null) Iterator.empty
        else {
          val in = WarcSource.openMaybeGz(new ByteArrayInputStream(blob))
          val xml = new String(in.readAllBytes(), StandardCharsets.UTF_8)
          parse(u, xml).iterator
        }
      }
  }

  /** File surface: every file matching the glob is one sitemap (one unit
    * of work; a sitemap cannot be split below its XML framing). Missing
    * non-glob path fails loudly; an empty glob yields an empty dataset —
    * the WarcSource.read contract.
    */
  def read(spark: SparkSession, pathGlob: String,
      maxPartitions: Int = 0): Dataset[SitemapEntry] = {
    import spark.implicits._
    val (files, conf) = WarcSource.fileUnits(spark, pathGlob, maxPartitions,
      "sitemap")
    files.flatMap { f =>
      val path = new org.apache.hadoop.fs.Path(f)
      val in = WarcSource.openMaybeGz(path.getFileSystem(conf.value).open(path))
      val xml = try new String(in.readAllBytes(), StandardCharsets.UTF_8)
        finally in.close()
      parse(f, xml).iterator
    }
  }

  /** Frontier seeding: urlset entries → [[graft.model.FrontierEntry]]
    * rows at round 0 — loc canonicalized then keyed (the north-rule
    * seen-set contract), priority = NEGATED sitemap priority (the spec's
    * 0.5 default when absent; FrontierRound.schedule orders priority
    * ASCENDING, so the publisher's 1.0 crawls before its 0.1). Index
    * children are excluded here — they are fetch work, not frontier URLs.
    */
  def seedFrontier(entries: Dataset[SitemapEntry]): Dataset[graft.model.FrontierEntry] = {
    val spark = entries.sparkSession
    import spark.implicits._
    entries.filter(_.kind == "url").flatMap { e =>
      val canon = Urls.canonicalize(e.loc)
      if (!canon.startsWith("http://") && !canon.startsWith("https://")) None
      else {
        val prio = if (e.priority == null) 0.5 else e.priority.doubleValue()
        Some(graft.model.FrontierEntry(
          Urls.sha256Hex(canon), canon, Urls.host(canon), -prio, 0, 0))
      }
    }
  }
}
