package graft.frontier

import graft.url.Urls
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Crawl-trap detection over the URL space — the defense a 10^10-URL
  * frontier needs that the reference (a single-site crawler with a finite
  * id space, /root/reference/src/handler.py) never did: calendars, session
  * ids, and faceted-search lattices generate unbounded URL sets that all
  * map to the same few content pages, and an unguarded scheduler drowns in
  * them (the Heritrix/Nutch "spider trap" problem).
  *
  * Everything is declarative and shuffle-minimal:
  *  - per-URL signals + the URL TEMPLATE (host + path with hex/digit runs
  *    abstracted, query reduced to its sorted key set) are pure codegen'd
  *    projections riding the scan — no UDF, no shuffle;
  *  - the host verdict is ONE groupBy(host) over those projections
  *    (host-cardinality output, ~10^7 rows at 10^10 urls — broadcastable
  *    back against the frontier for scheduling);
  *  - every threshold comparison is INTEGER arithmetic (n_urls >=
  *    explosion·n_templates, 4·signal_urls >= n_urls), so the verdict is
  *    bit-portable across engines — the DuckDB gate row reproduces it
  *    row-exactly, no double division anywhere.
  *
  * A flagged host is a SCHEDULING input, not a ban: feed it into
  * FrontierRound's per-host budgets (politeness already throttles per
  * host) or [[LinkRank.prioritize]]-style priority rewrites.
  */
object TrapDetect {

  /** Path component of an absolute URL ("" when none). */
  private def pathOf(url: Column): Column =
    regexp_extract(url, "://[^/?#]+(/[^?#]*)?", 1)

  /** Query string after the first '?' BEFORE any '#' — a '?' inside a
    * fragment is fragment text, not a query (pathOf is '#'-aware the same
    * way; the two must agree on where the hierarchical part ends). ""
    * when none.
    */
  private def queryOf(url: Column): Column =
    regexp_extract(url, "^[^#]*?\\?([^#]*)", 1)

  /** URL template: path with long hex runs (ids, hashes — ≥8 chars) →
    * "{hex}" then digit runs → "{n}". Two urls differing only in ids
    * share a template; a host whose url count explodes while its
    * template count stays flat is generating its url space.
    */
  def templateOf(url: Column): Column =
    regexp_replace(
      regexp_replace(pathOf(url), "[0-9a-fA-F]{8,}", "{hex}"),
      "[0-9]+", "{n}")

  /** Sorted distinct query KEY set ("a,b,sort" for "?b=2&a=1&sort=x&a=3")
    * — values are where traps vary, keys are the facet dimensions.
    */
  def queryKeysOf(url: Column): Column =
    array_join(
      array_sort(array_distinct(transform(
        filter(split(queryOf(url), "&"), p => p =!= lit("")),
        p => regexp_replace(p, "=.*", "")))),
      ",")

  /** Per-URL structural signals + template columns — a pure projection
    * (plan-asserted shuffle-free in TrapDetectSpec). Signals:
    * `deep` (> maxDepth path segments), `repeats` (≥ minRepeats path
    * segments repeated within the SAME path — /cal/2026/.../2026 loops),
    * `many_params` (> maxParams query params), `long_url`. `flagged` =
    * any of them.
    */
  def urlSignals(urls: DataFrame, urlCol: String = "url",
      maxDepth: Int = 8, minRepeats: Int = 2, maxParams: Int = 6,
      maxLen: Int = 512): DataFrame = {
    val u = col(urlCol)
    // project the arrays to attributes ONCE — each signal below reads the
    // attribute instead of re-running the regexp-backed split per use
    // (the repo-wide HOF/expression-reuse lesson, NOTES_r4)
    urls
      .withColumn("host", Urls.hostColumn(u))
      .withColumn("template", templateOf(u))
      .withColumn("query_keys", queryKeysOf(u))
      .withColumn("__segs", filter(split(pathOf(u), "/"), s => s =!= lit("")))
      .withColumn("__params", filter(split(queryOf(u), "&"), p => p =!= lit("")))
      .withColumn("deep", size(col("__segs")) > maxDepth)
      .withColumn("repeats",
        (size(col("__segs")) - size(array_distinct(col("__segs")))) >= minRepeats)
      .withColumn("many_params", size(col("__params")) > maxParams)
      .withColumn("long_url", length(u) > maxLen)
      .withColumn("flagged",
        col("deep") || col("repeats") || col("many_params") || col("long_url"))
      .drop("__segs", "__params")
  }

  /** Host verdicts: one aggregation over [[urlSignals]].
    * trap = n_urls >= minUrls AND (template explosion OR ≥¼ of the host's
    * urls carry a structural signal). All-integer decision logic.
    *
    * @param explosion  a host is template-exploded when
    *                   n_urls >= explosion · n_templates (its url space
    *                   is generated, not authored)
    */
  def trapHosts(urls: DataFrame, urlCol: String = "url",
      minUrls: Long = 100L, explosion: Long = 50L,
      maxDepth: Int = 8, minRepeats: Int = 2, maxParams: Int = 6,
      maxLen: Int = 512): DataFrame = {
    val s = urlSignals(urls, urlCol, maxDepth, minRepeats, maxParams, maxLen)
    s.groupBy(col("host"))
      .agg(
        count(lit(1)).as("n_urls"),
        countDistinct(col("template")).as("n_templates"),
        countDistinct(col("query_keys")).as("n_key_sets"),
        sum(when(col("flagged"), 1L).otherwise(0L)).as("signal_urls"))
      .withColumn("exploded",
        col("n_urls") >= lit(explosion) * col("n_templates"))
      .withColumn("trap",
        col("n_urls") >= minUrls &&
          (col("exploded") || lit(4L) * col("signal_urls") >= col("n_urls")))
  }
}
