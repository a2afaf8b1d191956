package graft.frontier

import graft.model.FrontierEntry
import graft.store.FrontierStore
import graft.url.Urls
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-round crawl driver — the Spark analog of `crawl_all`
  * (/root/reference/src/handler.py:444-497): iterate frontier rounds until
  * the frontier drains or the round limit hits, committing an atomic
  * snapshot (frontier / seen / extracted / results / metrics) per round so
  * a killed job resumes from the last published manifest with lineage
  * intact (north_rule; reference analog: find_last_saved_page,
  * handler.py:553-599).
  *
  * Iterative-job hygiene: each round's frontier and seen set are
  * re-read from the committed parquet (or localCheckpoint when storeless),
  * truncating the logical plan so lineage doesn't grow across rounds.
  */
object FrontierCrawl {

  final case class CrawlResult(
      rounds: Int,
      seenKeys: DataFrame,
      schedule: DataFrame, // all rounds' scheduled rows with round column
      extracted: DataFrame,
      results: DataFrame,
      metrics: DataFrame)

  def seedFrontier(spark: SparkSession, seeds: Seq[String]): Dataset[FrontierEntry] = {
    import spark.implicits._
    // all seeds carry priority 0 (listing page 1); deterministic tiebreak
    // by url_key mirrors the simulator contract
    spark.createDataset(seeds.map { u =>
      val canon = Urls.canonicalize(u)
      FrontierEntry(Urls.sha256Hex(canon), canon, Urls.host(canon), 0.0, 0, 0)
    })
  }

  def run(
      spark: SparkSession,
      pages: DataFrame,
      seeds: Seq[String],
      store: Option[FrontierStore] = None,
      robots: RobotsRules = RobotsRules.empty,
      cfg: PolitenessConfig = PolitenessConfig(),
      maxRounds: Int = 100): CrawlResult = {
    import spark.implicits._

    // resume from the latest committed snapshot when present
    val (startRound, frontier0, seen0) = store.flatMap(_.latest()) match {
      case Some(snap) =>
        val st = store.get
        (snap.round + 1,
          st.read(snap, "frontier").as[FrontierEntry],
          Some(st.read(snap, "seen")))
      case None =>
        (0, seedFrontier(spark, seeds), None)
    }

    var round = startRound
    var frontier = frontier0
    var seen = seen0
    // running url_key count of `seen` (may overcount retries; used only to
    // size the bloom filter, where an upper bound is safe)
    var seenCount: Long = if (seen.isDefined) -1L else 0L
    var scheduleAll: Option[DataFrame] = None
    var extractedAll: Option[DataFrame] = None
    var resultsAll: Option[DataFrame] = None
    var metricsAll: Option[DataFrame] = None

    def appendOpt(acc: Option[DataFrame], df: DataFrame): Option[DataFrame] =
      Some(acc.map(_.union(df)).getOrElse(df))

    while (round < maxRounds && !frontier.isEmpty) {
      val out = FrontierRound.run(spark, pages, frontier, seen, round, robots,
        cfg, seenCount)
      if (seenCount >= 0L) seenCount += out.scheduledCount

      val scheduledR = out.scheduled.withColumn("round", lit(round))
      // no distinct: retries may duplicate keys, which is harmless for the
      // anti-join/bloom consumers and avoids an extra full shuffle per round
      val seenNext = seen match {
        case Some(s) => s.select($"url_key").union(out.newSeenKeys)
        case None => out.newSeenKeys
      }

      store match {
        case Some(st) =>
          // atomic multi-table snapshot; reading back truncates lineage
          val snap = st.commit(round, Map(
            "frontier" -> out.newFrontier.toDF(),
            "seen" -> seenNext,
            "extracted" -> out.extracted.toDF(),
            "results" -> out.results,
            "scheduled" -> scheduledR,
            "metrics" -> out.metrics.toDF()))
          frontier = st.read(snap, "frontier").as[FrontierEntry]
          seen = Some(st.read(snap, "seen"))
          scheduleAll = appendOpt(scheduleAll, st.read(snap, "scheduled"))
          extractedAll = appendOpt(extractedAll, st.read(snap, "extracted"))
          resultsAll = appendOpt(resultsAll, st.read(snap, "results"))
          metricsAll = appendOpt(metricsAll, st.read(snap, "metrics"))
        case None =>
          frontier = out.newFrontier.localCheckpoint(true).as[FrontierEntry]
          seen = Some(seenNext.localCheckpoint(true))
          scheduleAll = appendOpt(scheduleAll, scheduledR.localCheckpoint(true))
          // extraction is deferred to one crawl-end batch (below): a single
          // wide, perfectly-parallel stage instead of a small stage per
          // round — the round loop only materializes what the NEXT round
          // needs (frontier, seen, results-for-retries)
          resultsAll = appendOpt(resultsAll, out.results.localCheckpoint(true))
          metricsAll = appendOpt(metricsAll, out.metrics.toDF().localCheckpoint(true))
      }
      out.caches.foreach(_.unpersist(false))
      round += 1
    }

    // storeless mode: batch-extract every successfully fetched page once
    if (store.isEmpty && resultsAll.isDefined) {
      import graft.extract.Extractor
      val okUrls = resultsAll.get.filter(col("status") === "ok").select($"url")
      val extractedEnd = okUrls
        .join(pages.select($"url", $"html"), Seq("url"))
        .as[(String, Array[Byte])]
        .map { case (u, h) =>
          Extractor.extractBytes(u,
            Urls.ideaId(u).getOrElse(Urls.sha256Hex(u)), h)
        }
        .toDF()
      extractedAll = Some(extractedEnd)
    }

    val emptyKeys = spark.createDataset(Seq.empty[String]).toDF("url_key")
    CrawlResult(
      round - startRound,
      seen.getOrElse(emptyKeys),
      scheduleAll.getOrElse(spark.emptyDataFrame),
      extractedAll.getOrElse(spark.emptyDataFrame),
      resultsAll.getOrElse(spark.emptyDataFrame),
      metricsAll.getOrElse(spark.emptyDataFrame))
  }
}
