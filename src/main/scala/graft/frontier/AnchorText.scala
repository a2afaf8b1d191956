package graft.frontier

import graft.html.HtmlDom
import graft.url.Urls
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One link occurrence: page → resolved canonical target, with the
  * anchor's whitespace-collapsed text (may be "" for image/icon links).
  */
final case class Anchor(src_url: String, dst_url: String, text: String)

/** Anchor-text extraction + aggregation — the classic web-ranking signal
  * the reference has no notion of (its outlinks are site-native id hrefs,
  * /root/reference/src/html_converter.py; it never reads link TEXT). At
  * corpus scale, what other pages call a target describes it better than
  * the target itself (the original PageRank-era observation), and the
  * aggregated (target, text, count) table is both a retrieval field and a
  * frontier-priority feature alongside [[LinkRank]].
  *
  * Scale shape:
  *  - extraction is a typed flatMap kernel riding the page scan (the same
  *    access pattern as the Extractor stage — no shuffle, no driver);
  *    hrefs resolve per RFC 3986 ([[Urls.resolve]]) and canonicalize, so
  *    dst_url joins the frontier's url_key space directly.
  *  - aggregation is ONE (dst, text) count agg; the top-k-per-target cut
  *    rides Spark's WindowGroupLimit rank-limit pushdown (the
  *    curate_source_cap pattern: a Partial limit below the exchange bounds
  *    hot targets — a nav link repeated on every page of a mega-site ships
  *    ≤ k·partitions rows, never the raw occurrence stream).
  */
object AnchorText {

  /** Spam anchors are unbounded ("click here " × 10^4); the signal lives
    * in the first phrase. Truncation BEFORE the count agg keeps grouping
    * keys bounded.
    */
  val MaxTextLen = 256

  /** All anchors of one page: every `<a href=…>` in document order,
    * resolved against the page url, http(s) only (mailto:/javascript:/
    * unresolvable drop), target canonicalized, text = lxml-style
    * text_content() whitespace-collapsed and length-capped.
    */
  def pageAnchors(pageUrl: String, html: String): Seq[Anchor] = {
    if (html == null || pageUrl == null) return Nil
    HtmlDom.parse(html) match {
      case None => Nil
      case Some(root) =>
        val out = scala.collection.mutable.ArrayBuffer[Anchor]()
        def walk(n: HtmlDom.Node): Unit = n match {
          case e: HtmlDom.Element =>
            if (e.tag == "a")
              e.attrs.get("href").map(_.trim).filter(_.nonEmpty).foreach { href =>
                // filter on the CANONICAL form: canonicalize lowercases the
                // scheme, so "HTTP://…" hrefs pass and opaque schemes
                // (mailto:, javascript: — passed through verbatim by
                // resolve) fail the prefix test
                val canon = Urls.canonicalize(Urls.resolve(pageUrl, href))
                if (canon.startsWith("http://") || canon.startsWith("https://")) {
                  val t = collapseWs(e.textContent)
                  out += Anchor(pageUrl, canon,
                    if (t.length > MaxTextLen) t.substring(0, MaxTextLen) else t)
                }
              }
            e.children.foreach(walk) // nested <a> (invalid but live) each count
          case _ => ()
        }
        walk(root)
        out.toSeq
    }
  }

  /** `\s+` → single space, trimmed — the same token boundary the
    * curate/tokenize stages use (NOTES_r4: two whitespace definitions in
    * one pipeline was a real bug class). Pattern precompiled: this runs
    * once per kept anchor in the corpus-scale kernel, and
    * String.replaceAll recompiles per call.
    */
  private val Ws = java.util.regex.Pattern.compile("\\s+")
  private def collapseWs(s: String): String =
    Ws.matcher(s).replaceAll(" ").trim

  /** Extraction over a pages frame (url + html string-or-binary column) —
    * a typed kernel on the scan, one output row per anchor occurrence.
    */
  def anchors(pages: DataFrame, urlCol: String = "url",
      htmlCol: String = "html"): Dataset[Anchor] = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages.select(col(urlCol).cast("string").as("u"),
        col(htmlCol).cast("string").as("h")).as[(String, String)]
      .flatMap { case (u, h) => pageAnchors(u, h) }
  }

  /** Top-k anchor texts per target with occurrence counts — the
    * aggregated retrieval/priority signal. Empty texts (icon links) drop;
    * ties break on text ascending so the cut is deterministic.
    * (dst_url, text, cnt, rnk), rnk 1..k per dst_url.
    */
  def topAnchors(anchors: DataFrame, k: Int = 5): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val w = Window.partitionBy(col("dst_url"))
      .orderBy(col("cnt").desc, col("text"))
    anchors.filter(col("text") =!= lit(""))
      .groupBy(col("dst_url"), col("text"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rnk", row_number().over(w))
      // rank-limit directly above the window → WindowGroupLimit pushdown
      // (Partial below the dst exchange); plan-asserted in AnchorTextSpec
      .filter(col("rnk") <= k)
  }

  /** Host-level anchor-term signal for [[LinkRank.prioritize]]-style use:
    * total in-link count and distinct anchor texts per target HOST —
    * host-cardinality output, joinable against hostRank's (host, rank).
    */
  def hostAnchorStats(anchors: DataFrame): DataFrame =
    anchors
      .select(Urls.hostColumn(col("dst_url")).as("host"), col("text"))
      .filter(col("host") =!= lit(""))
      .groupBy(col("host"))
      .agg(count(lit(1)).as("in_links"),
        approx_count_distinct(col("text")).as("anchor_texts_approx"))
}
