package graft.fixtures

import graft.model.PageRow
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Deterministic synthetic web universe (FIXTURES.md §1-§4): Common-Crawl-
  * style pages table `(url, warc_ts, html, text, lang)` holding listing
  * pages (JSON bodies shaped like the reference search API,
  * /root/reference/src/_core/schemas.py:63-68) and detail pages (HTML in
  * the exact mvcContainer-1286 shape, /root/reference/src/parser.py:272-276).
  *
  * Layout is CLOSED-FORM from (seed, hosts, totalDetails): every row is
  * computable from its global index alone, so generation distributes via
  * `spark.range(n).map(...)` with no shuffle and no driver-side loop —
  * the same formula drives the in-memory simulator universe. Hosts are
  * Zipf-skewed with host 0 a mega-host (~the skew-handling fixture).
  */
final case class FixtureConfig(
    seed: Long = 42L,
    hosts: Int = 8,
    totalDetails: Int = 200,
    pageSize: Int = 10,
    errorPagePerMille: Int = 20, // ‰ of detail pages that are error pages
    degeneratePerMille: Int = 30, // ‰ with missing question/answer divs
    // listing pagination shape: 1 = the reference's linear `more` chain
    // (handler.py:477-480); >1 = a tree where each listing links to
    // `paginationFanout` child listings — same total pages, log-depth
    // frontier, used by throughput benchmarks so rounds stay wide
    paginationFanout: Int = 1,
    // multiplies question/answer word counts (benchmarks use larger pages
    // to approximate real-web document sizes)
    wordScale: Int = 1,
    // share (per mille) of details on the mega-host h0 — 500 = the harsh
    // skew-test default; throughput benches use a realistic 100
    megaPerMille: Int = 500) {

  /** Zipf-ish weights: host 0 gets ~50%, rest 1/(k+1) normalized. */
  val hostCounts: Array[Int] = {
    require(hosts >= 1 && totalDetails >= hosts)
    val mega = math.max(1, (totalDetails.toLong * megaPerMille / 1000L).toInt)
    val rest = totalDetails - mega
    val weights = (1 until hosts).map(k => 1.0 / (k + 1))
    val wSum = weights.sum
    val counts = new Array[Int](hosts)
    counts(0) = mega
    var assigned = mega
    for (k <- 1 until hosts) {
      val c = math.max(1, math.round(rest * weights(k - 1) / wSum).toInt)
      counts(k) = c
      assigned += c
    }
    // fix rounding drift on the last host
    counts(hosts - 1) = math.max(1, counts(hosts - 1) + (totalDetails - assigned))
    counts
  }

  val detailOffsets: Array[Int] = hostCounts.scanLeft(0)(_ + _) // len hosts+1
  val listingCounts: Array[Int] =
    hostCounts.map(n => (n + pageSize - 1) / pageSize)
  val listingOffsets: Array[Int] = listingCounts.scanLeft(0)(_ + _)
  def totalListings: Int = listingOffsets(hosts)
  def totalRows: Int = totalDetails + totalListings

  def host(h: Int): String = s"h$h.example.ir"
  def detailId(h: Int, k: Int): Long = h.toLong * 10000000L + k
  def detailUrl(h: Int, k: Int): String =
    s"https://${host(h)}/opinions/Detail?IdeaId=${detailId(h, k)}"
  def listingUrl(h: Int, p: Int): String =
    s"https://${host(h)}/search?page=${p + 1}"
  def seeds: Seq[String] = (0 until hosts).map(h => listingUrl(h, 0))
}

object FixtureGen {

  /** splitmix64 — deterministic per-key randomness. */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private val questionWords = Array("آیا", "مطالبه", "خسارت", "قرارداد", "دادگاه",
    "صلاحیت", "ماده", "قانون", "مجازات", "اجرای", "حکم", "تجدیدنظر", "وکیل",
    "شاهد", "ملک", "اجاره", "دیه", "ارث", "چک", "سفته")
  private val answerWords = Array("مستفاد", "از", "ماده", "قانون", "مدنی",
    "مذکور", "امکان‌پذیر", "است", "نیست", "دادگاه", "صالح", "رسیدگی",
    "می‌کند", "وفق", "مقررات", "تبصره", "اصلاحی", "مصوب", "لازم‌الاجرا")

  private def words(pool: Array[String], seed: Long, n: Int): String = {
    val sb = new java.lang.StringBuilder
    var i = 0
    var s = seed
    while (i < n) {
      s = mix(s)
      if (i > 0) sb.append(if ((s & 15) == 0L) "\n" else " ")
      sb.append(pool(((s >>> 8) % pool.length).toInt.abs))
      i += 1
    }
    sb.toString
  }

  /** Detail-page HTML for global detail index i of host h. Variants (by
    * seeded hash): ~2% error pages (handler.py:40-53 filter fixture), ~3%
    * degenerate (missing question/answer divs → sentinel fallbacks).
    */
  def detailHtml(cfg: FixtureConfig, h: Int, k: Int): String = {
    val id = cfg.detailId(h, k)
    val r = mix(cfg.seed ^ id)
    val perMille = math.floorMod(r, 1000L).toInt
    if (perMille < cfg.errorPagePerMille)
      return s"<html><body><div>خطایی رخ داده است</div></body></html>"
    val degenerate = perMille < cfg.errorPagePerMille + cfg.degeneratePerMille
    val q = words(questionWords, r ^ 0x1111,
      (6 + math.floorMod(r >> 3, 9L).toInt) * cfg.wordScale)
    val a = words(answerWords, r ^ 0x2222,
      (10 + math.floorMod(r >> 7, 20L).toInt) * cfg.wordScale)
    val label = if ((r & 7) < 3) "نظریه مشورتی اداره کل حقوقی قوه قضاییه :\n" else ""
    val opNo = s"۷/${1380 + math.floorMod(r >> 11, 24L)}/${math.floorMod(r >> 17, 1000L)}"
    val fileNo = s"${1380 + math.floorMod(r >> 21, 24L)}-${math.floorMod(r >> 27, 200L)}-ک"
    val y = 1380 + math.floorMod(r >> 31, 24L).toInt
    val m = 1 + math.floorMod(r >> 36, 12L).toInt
    val d = 1 + math.floorMod(r >> 40, 29L).toInt
    val dateText = s"تاریخ نظریه: $y/$m/$d"
    val qaBlock =
      if (degenerate) s"<div>\n<div>سرصفحه $id</div>\n</div>"
      else
        s"""<div>
<div>سرصفحه $id</div>
<div><div>$q</div></div>
<div>جداکننده</div>
<div><div>$label$a</div></div>
</div>"""
    s"""<html><body>
<div id="mvcContainer-1286">
<div>
<div>
<div>عنوان $id</div>
<div>
<div>
<div>
<div>برچسب</div>
<div>
<div>$opNo</div>
<div>$fileNo</div>
<div>$dateText</div>
</div>
</div>
<div>
$qaBlock
</div>
</div>
</div>
</div>
</div>
</div>
</body></html>"""
  }

  /** Listing-page body: JSON shaped like the reference search response
    * (FIXTURES.md §3), with occasional null IdeaId (DocumentUrl fallback,
    * handler.py:314-315) and an embedded href for the regex fallback
    * extractor (check_pages.py:151,162).
    */
  def listingJson(cfg: FixtureConfig, h: Int, p: Int): String = {
    val n = cfg.hostCounts(h)
    val from = p * cfg.pageSize
    val until = math.min(from + cfg.pageSize, n)
    val more = cfg.paginationFanout == 1 && until < n
    val detailItems = (from until until).map { k =>
      val id = cfg.detailId(h, k)
      val r = mix(cfg.seed ^ (id + 7777))
      val idField = if (math.floorMod(r, 20L) == 0L) "null" else id.toString
      s"""{"IdeaId": $idField, "DocumentUrl": "${cfg.detailUrl(h, k)}", "Title": "نظریه $id", "Description": null, "AuthorName": null, "DisplayModifiedTime": null}"""
    }
    // tree pagination: listing p links its child listings as result rows
    val childItems =
      if (cfg.paginationFanout <= 1) Seq.empty
      else {
        val f = cfg.paginationFanout
        val nL = cfg.listingCounts(h)
        (p * f + 1 to p * f + f).filter(_ < nL).map { c =>
          s"""{"IdeaId": null, "DocumentUrl": "${cfg.listingUrl(h, c)}", "Title": "صفحه ${c + 1}", "Description": null, "AuthorName": null, "DisplayModifiedTime": null}"""
        }
      }
    val items = detailItems ++ childItems
    s"""{"results": [${items.mkString(", ")}], "totalHits": $n, "more": $more, "raw_html": "<a href=\\"${if (until > from) cfg.detailUrl(h, from) else ""}\\">x</a>"}"""
  }

  /** URL only for global index i (no page-body construction). */
  def urlOf(cfg: FixtureConfig, i: Long): String = {
    val ii = i.toInt
    if (ii < cfg.totalDetails) {
      val h = hostOf(cfg.detailOffsets, ii)
      cfg.detailUrl(h, ii - cfg.detailOffsets(h))
    } else {
      val li = ii - cfg.totalDetails
      val h = hostOf(cfg.listingOffsets, li)
      cfg.listingUrl(h, li - cfg.listingOffsets(h))
    }
  }

  /** Row for global index i: details first, then listings. */
  def row(cfg: FixtureConfig, i: Long): PageRow = {
    val ii = i.toInt
    if (ii < cfg.totalDetails) {
      val h = hostOf(cfg.detailOffsets, ii)
      val k = ii - cfg.detailOffsets(h)
      val html = detailHtml(cfg, h, k)
      PageRow(cfg.detailUrl(h, k), ts(cfg, i), utf8(html), null, "fa")
    } else {
      val li = ii - cfg.totalDetails
      val h = hostOf(cfg.listingOffsets, li)
      val p = li - cfg.listingOffsets(h)
      val body = listingJson(cfg, h, p)
      PageRow(cfg.listingUrl(h, p), ts(cfg, i), utf8(body), null, "fa")
    }
  }

  private def ts(cfg: FixtureConfig, i: Long): java.sql.Timestamp =
    new java.sql.Timestamp(1700000000000L + i * 1000L)

  private def utf8(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  private def hostOf(offsets: Array[Int], i: Int): Int = {
    // binary search in cumulative offsets
    var lo = 0
    var hi = offsets.length - 2
    while (lo < hi) {
      val mid = (lo + hi + 1) >>> 1
      if (offsets(mid) <= i) lo = mid else hi = mid - 1
    }
    lo
  }

  /** Distributed generation: no shuffle, no driver loop. */
  def pages(spark: SparkSession, cfg: FixtureConfig, partitions: Int = 32): Dataset[PageRow] = {
    import spark.implicits._
    spark.range(0, cfg.totalRows.toLong, 1, partitions).map(i => row(cfg, i))
  }

  /** In-memory universe url→html for the scalar simulator (small cfgs). */
  def universe(cfg: FixtureConfig): Map[String, String] =
    (0L until cfg.totalRows.toLong).map { i =>
      val r = row(cfg, i)
      r.url -> new String(r.html, java.nio.charset.StandardCharsets.UTF_8)
    }.toMap
}
