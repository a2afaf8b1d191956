package graft.frontier

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Freshness-driven recrawl scheduling — the temporal axis of the
  * crawl-intelligence wave (anchors/rank say WHAT to fetch, politeness
  * says HOW FAST, traps say WHAT TO AVOID; this says WHEN TO COME BACK).
  * The reference crawls once and stops; a standing web-scale crawl
  * re-visits, and re-visiting uniformly wastes its fetch budget on pages
  * that never change while letting hubs go stale.
  *
  * Estimator: the Cho & Garcia-Molina Poisson change-rate MLE for
  * incomplete observation ("Estimating Frequency of Change", ACM TOIT
  * 2003): with n adjacent observation intervals, X of which showed a
  * changed content hash, and mean interval Δ rounds,
  * λ̂ = −ln((n − X + 0.5) / (n + 0.5)) / Δ — the +0.5 smoothing keeps the
  * estimator finite at X = n (a page that changed every single time we
  * looked). Staleness at the current round is then the Poisson
  * no-change complement p = 1 − exp(−λ̂ · age).
  *
  * Scale shape: ONE url_key-hash exchange for the adjacency window (at
  * rest the history table is bucketed by url_key, making even that
  * exchange free — the Curation.writeDedupBaseBucketed pattern), and the
  * per-url aggregation REUSES the window's partitioning — zero further
  * exchanges (plan-asserted in RecrawlSpec). Everything downstream is
  * url-count-sized, never history-sized. All arithmetic is deterministic
  * integer counts + ln/exp rounded to 6 dp at the source, so the whole
  * schedule reproduces row-exactly in any SQL engine.
  */
object Recrawl {

  /** Per-url change statistics from crawl history rows
    * (urlCol, roundCol, hashCol): n_obs = rounds with a successful fetch
    * (null hash = failed fetch — no content evidence, but the ATTEMPT is
    * kept: `last_attempt_round` covers it and an all-failures url still
    * emits a row, so the scheduler can see it), n_changes = changes
    * between consecutive OBSERVED hashes (failed rounds in between don't
    * break the chain), first/last observed round, and the smoothed change
    * rate λ̂ (6 dp; null without ≥2 observed rounds spanning > 0 rounds).
    *
    * Rounds are deduplicated first — one representative per (url, round),
    * the minimum non-null hash (nulls sort last, so a round counts as
    * failed only if EVERY row failed). Without this a same-round
    * duplicate pair would register a change across a zero-length
    * interval and inflate the MLE. The dedup, the pairing window, and
    * the aggregation all share the url partitioning: one exchange total.
    */
  def changeStats(history: DataFrame, urlCol: String = "url_key",
      roundCol: String = "round", hashCol: String = "content_hash",
      // when set, the named column (equal across a key's rows — e.g. the
      // url spelling behind a sha2 key) rides the SAME aggregation out as
      // `url`, so reseedFrontier needs no second history scan + join
      carryUrlCol: Option[String] = None): DataFrame = {
    val ord = Seq(col("__r").asc, col("__h").asc_nulls_last)
    val w = Window.partitionBy(col(urlCol)).orderBy(ord: _*)
    val baseCols = Seq(col(urlCol), col(roundCol).cast("long").as("__r"),
      col(hashCol).as("__h")) ++ carryUrlCol.map(c => col(c).as("__u"))
    val dedup = history
      .select(baseCols: _*)
      .withColumn("__pr", lag(col("__r"), 1).over(w))
      .filter(col("__pr").isNull || col("__pr") =!= col("__r"))
    val paired = dedup.withColumn("__prev",
      last(col("__h"), ignoreNulls = true)
        .over(w.rowsBetween(Window.unboundedPreceding, -1)))
    val aggs = Seq(
      count(col("__h")).as("n_obs"),
      sum(when(col("__h").isNotNull && col("__prev").isNotNull &&
        col("__prev") =!= col("__h"), 1L).otherwise(0L)).as("n_changes"),
      min(when(col("__h").isNotNull, col("__r"))).as("first_round"),
      max(when(col("__h").isNotNull, col("__r"))).as("last_round"),
      max(col("__r")).as("last_attempt_round")) ++
      carryUrlCol.map(_ => max(col("__u")).as("url"))
    paired
      .groupBy(col(urlCol))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("change_rate", {
        val n = (col("n_obs") - 1L).cast("double")
        val x = col("n_changes").cast("double")
        val gap = (col("last_round") - col("first_round")).cast("double") / n
        round(when(col("n_obs") >= 2L && col("last_round") > col("first_round"),
          -log((n - x + lit(0.5)) / (n + lit(0.5))) / gap), 6)
      })
  }

  /** Staleness + recrawl priority at `currentRound`: urls without a rate
    * estimate (single observed round) take `defaultRate`; never-observed
    * urls (every fetch failed) are maximally stale — p_stale 1.0, there
    * is no content knowledge at all; otherwise p_stale =
    * 1 − exp(−λ̂ · age) rounded 6 dp. `priority` is the negation — the
    * frontier's lower-is-better convention (seed pages are 0.0), so the
    * stalest page schedules first. Join the output back to the frontier
    * on url_key (both sides url-keyed; bucket them at rest for a
    * co-located join — this table is crawl-sized, NEVER broadcast it).
    */
  def recrawlPriority(stats: DataFrame, currentRound: Long,
      defaultRate: Double = 0.1): DataFrame = {
    require(defaultRate >= 0.0, s"defaultRate must be >= 0, got $defaultRate")
    val rate = coalesce(col("change_rate"), lit(defaultRate))
    val age = greatest(lit(currentRound) - col("last_round"), lit(0L)).cast("double")
    stats
      .withColumn("p_stale", when(col("n_obs") === 0L, lit(1.0))
        .otherwise(round(lit(1.0) - exp(-rate * age), 6)))
      .withColumn("priority", -col("p_stale"))
  }

  /** History rows from one crawl GENERATION's extracted output — a pure
    * projection of the per-round tables the store already commits:
    * url_key via sha2 (bit-identical to `Urls.sha256Hex`; extracted urls
    * are the scheduled urls, already canonical when they entered the
    * frontier), content_hash = md5 over the JSON encoding of the field
    * struct — field boundaries are QUOTED (a boundary shift like
    * ("abc","def") → ("abcd","ef") changes the hash where a bare concat
    * would not) and a field going null differs from going empty (to_json
    * omits null fields, keeps empty strings).
    * `generation` is the observation timestamp in whatever unit the
    * caller recrawls at (crawl-generation number, day index, …).
    *
    * CONTRACT: the hash format is part of the persisted-history contract
    * — changing it registers one spurious "change" per url at the format
    * boundary (inflating every change-rate estimate by one event).
    * If the format must evolve on a standing history, rehash the old
    * generations from their extracted tables rather than mixing formats.
    */
  def historyFromExtracted(extracted: DataFrame, generation: Long): DataFrame =
    extracted.select(
      sha2(col("url"), 256).as("url_key"),
      col("url"),
      lit(generation).as("round"),
      md5(to_json(struct(col("question"), col("answer"), col("content"))))
        .as("content_hash"))

  /** Seed the NEXT crawl generation from accumulated history (the union
    * of [[historyFromExtracted]] outputs across generations): change
    * stats → staleness priority → FrontierEntry rows, so a standing
    * crawl's re-fetch order is freshness-driven and the priority-queue
    * cap (`PolitenessConfig.maxUrlsPerRound`) spends each round's budget
    * on the stalest pages first. attempt/discovered_round restart at 0 —
    * a generation is a fresh crawl whose seen set starts empty.
    */
  def reseedFrontier(spark: org.apache.spark.sql.SparkSession,
      history: DataFrame, currentRound: Long,
      defaultRate: Double = 0.1): org.apache.spark.sql.Dataset[graft.model.FrontierEntry] = {
    import spark.implicits._
    // the url spelling rides the stats aggregation itself (carryUrlCol) —
    // ONE history scan, no second aggregation or url-count-sized join
    val pri = recrawlPriority(
      changeStats(history, carryUrlCol = Some("url")), currentRound, defaultRate)
    pri
      .select(col("url_key"), col("url"), col("priority"))
      .as[(String, String, Double)]
      .map { case (k, u, p) =>
        graft.model.FrontierEntry(k, u, graft.url.Urls.host(u), p, 0, 0)
      }
  }
}
