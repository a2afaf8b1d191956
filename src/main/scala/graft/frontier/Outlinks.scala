package graft.frontier

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** Outlink discovery from a fetched page body — the generalization of the
  * reference's listing-page processing (/root/reference/src/handler.py:
  * 302-326: ResultItem→IdeaPageInfo with DocumentUrl-as-id fallback;
  * pagination via `more` at handler.py:477-480) plus the regex fallback id
  * extractors (/root/reference/src/check_pages.py:98-171).
  *
  * Pure function shared by the Spark round job (typed flatMap) and the
  * scalar simulator, so ordering equivalence is definitional.
  *
  * Priority contract (lower fetches earlier): listing page p has priority
  * (p-1)*PageBlock — seeds carry 0 and are page 1 (FrontierCrawl
  * .seedFrontier) — the k-th result (0-based) on page p has
  * (p-1)*PageBlock + 1 + k, and the next listing page has p*PageBlock.
  * This reproduces the reference's sequential "page loop feeds a FIFO
  * queue" order (handler.py:457-481) deterministically.
  */
object Outlinks extends Serializable {

  val PageBlock = 1000000.0

  @transient private lazy val mapper = new ObjectMapper()

  private val PageParam = "[?&]page=(\\d+)".r
  private val HrefIdeaId = "href=\\\"([^\\\"]*IdeaId=\\d+[^\\\"]*)\\\"".r

  /** (outlinkUrl, priority) in discovery order. */
  def extract(pageUrl: String, body: String): Seq[(String, Double)] = {
    if (body == null) return Nil
    val trimmed = body.trim
    if (trimmed.startsWith("{")) extractFromListingJson(pageUrl, trimmed)
    else Nil // detail pages contribute no outlinks (reference semantics)
  }

  private def extractFromListingJson(pageUrl: String, json: String): Seq[(String, Double)] = {
    // a page number too large for Int must not NumberFormatException the
    // task (one pathological URL would abort the whole round job) — such
    // a URL falls back to page 1 ordering, still fetched
    val page = PageParam.findFirstMatchIn(pageUrl)
      .flatMap(m => scala.util.Try(m.group(1).toInt).toOption).getOrElse(1)
    val base = (page - 1) * PageBlock
    val node: JsonNode =
      try mapper.readTree(json)
      catch {
        case _: Exception =>
          // malformed JSON → regex fallback (check_pages.py:151,162)
          return HrefIdeaId.findAllMatchIn(json).map(_.group(1)).toSeq.distinct
            .zipWithIndex.map { case (u, i) => (u, base + 1 + i) }
      }
    val results = node.path("results")
    val links = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    if (results.isArray) {
      var i = 0
      while (i < results.size()) {
        val item = results.get(i)
        val docUrl = item.path("DocumentUrl")
        if (!docUrl.isMissingNode && !docUrl.isNull && docUrl.asText.nonEmpty)
          links += ((docUrl.asText, base + 1 + i))
        else {
          // reference fallback (handler.py:314-315 → get_idea_page:273):
          // an item with no DocumentUrl is STILL fetched, by IdeaId
          // against the site's detail endpoint — skipping it would
          // silently drop the document from the crawl
          val ideaId = item.path("IdeaId")
          if (!ideaId.isMissingNode && !ideaId.isNull && ideaId.asText.nonEmpty) {
            val h = graft.url.Urls.host(pageUrl)
            if (h.nonEmpty)
              links += ((s"https://$h/opinions/Detail?IdeaId=${ideaId.asText}",
                base + 1 + i))
          }
        }
        i += 1
      }
    }
    // pagination: while `more`, enqueue the next listing page
    if (node.path("more").asBoolean(false)) {
      val nextUrl = PageParam.findFirstMatchIn(pageUrl) match {
        case Some(m) =>
          pageUrl.substring(0, m.start) + pageUrl.charAt(m.start) + "page=" + (page + 1) +
            pageUrl.substring(m.end)
        case None =>
          pageUrl + (if (pageUrl.contains('?')) "&" else "?") + "page=" + (page + 1)
      }
      links += ((nextUrl, page * PageBlock))
    }
    links.toSeq
  }
}
