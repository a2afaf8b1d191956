package graft

import graft.fixtures.{FixtureConfig, FixtureGen}
import graft.streaming.StreamOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Structured Streaming parity tests: the streaming extraction stage must
  * equal the batch stage on the same pages; watermarked windows and
  * stateful politeness behave as specified.
  */
class StreamingSpec extends SparkTestBase {

  import spark.implicits._

  private val cfg = FixtureConfig(seed = 11L, hosts = 3, totalDetails = 30)

  test("foreachBatch incremental extract == batch extract on same pages") {
    implicit val sq = spark.sqlContext
    val rows = (0L until cfg.totalRows.toLong).map(i => FixtureGen.row(cfg, i))
    val stream = MemoryStream[graft.model.PageRow]
    val outDir = java.nio.file.Files.createTempDirectory("stream-out").toString
    val ckDir = java.nio.file.Files.createTempDirectory("stream-ck").toString

    val query = StreamOps.incrementalExtract(spark, stream.toDF(), outDir, ckDir)
    // two micro-batches (two "rounds" of arriving pages)
    stream.addData(rows.take(20))
    query.processAllAvailable()
    stream.addData(rows.drop(20))
    query.processAllAvailable()
    query.stop()

    val streamed = spark.read.parquet(outDir)
      .select("url", "content").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val batch = StreamOps.extractStage(spark,
      FixtureGen.pages(spark, cfg, 2).toDF())
      .select("url", "content").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("streaming curation: micro-batches fold into the curated store; replay idempotent") {
    import graft.ops.Curation
    implicit val sq = spark.sqlContext
    val ccfg = Curation.Config(langs = Set("latin"), minTokens = 5,
      maxTokens = 100, jaccardThreshold = 0.6)
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val other = "a completely different document about spark catalyst plans and shuffles here"
    val fresh2 = "entirely new batch two prose on cuckoo filters bloom sketches and seen sets"
    val b1 = Seq((1L, base), (2L, base), (3L, base + " " + base), (6L, other))
    val b2 = Seq((101L, base), (102L, base + " extra"), (104L, fresh2), (105L, fresh2))
    val b3 = Seq((201L, fresh2 + " tail"),
      (202L, "final wholly original doc mentioning broadcast joins and aqe"))

    val store = java.nio.file.Files.createTempDirectory("stream-curate").toString
    val ckpt = java.nio.file.Files.createTempDirectory("stream-curate-ck").toString
    val stream = MemoryStream[(Long, String)]
    val q = StreamOps.streamingCurate(
      stream.toDF().toDF("doc_id", "text"), store, ckpt, ccfg)
    stream.addData(b1: _*); q.processAllAvailable()
    stream.addData(b2: _*); q.processAllAvailable()
    stream.addData(b3: _*); q.processAllAvailable()
    q.stop()

    // streamed survivors == one batch curate over everything ingested
    val surv = StreamOps.readCuratedSurvivors(spark, store)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val batchAll = Curation.curate((b1 ++ b2 ++ b3).toDF("doc_id", "text"),
        "doc_id", "text", ccfg)
      .collect().map(_.getLong(0)).toSet
    assert(surv == batchAll)
    assert(surv == Set(1L, 6L, 104L, 202L))

    // the persisted base must carry content_hash so the next delta's
    // exact-dup check column-prunes instead of re-hashing corpus text
    assert(spark.read.parquet(s"$store/base/batch_id=0")
      .columns.contains("content_hash"))

    // REPLAY: re-fold micro-batch 1 (same batchId) directly — a crashed
    // attempt must not change the store (the corpus reads exclude the
    // batch's own partition, else every doc dies as a self-duplicate)
    StreamOps.foldCurateBatch(b2.toDF("doc_id", "text"), 1L, store, ccfg)
    val after = StreamOps.readCuratedSurvivors(spark, store)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(after == surv)

    // ---- compaction: identical fold results, bounded partition count ----
    def dirNames(root: String): Set[String] = {
      val d = new java.io.File(root)
      if (!d.exists) Set.empty else d.listFiles.map(_.getName).toSet
    }
    val store2 = java.nio.file.Files.createTempDirectory("stream-curate-c").toString
    Seq(b1, b2, b3).zipWithIndex.foreach { case (b, i) =>
      StreamOps.foldCurateBatch(b.toDF("doc_id", "text"), i.toLong, store2,
        ccfg, compactThreshold = 2)
    }
    val survC = StreamOps.readCuratedSurvivors(spark, store2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survC == surv, "compaction must not change the fold results")
    // base/index contents across the compaction boundary == uncompacted
    def baseIds(s: String) = {
      val fsroot = s"$s/base"
      val live = dirNames(fsroot).filter(n =>
        n.startsWith("compact_") || n.startsWith("batch_id="))
        .map(n => s"$fsroot/$n").toSeq
      spark.read.parquet(live: _*).select("doc_id").collect()
        .map(_.getLong(0)).toSet
    }
    // (store1 has only batch dirs; store2's newest compact dir + live
    // batch dirs must reproduce the same base row set)
    val live2 = {
      val names = dirNames(s"$store2/base")
      val gen = names.filter(_.startsWith("compact_"))
        .map(_.stripPrefix("compact_").toLong).max
      names.filter(n => n == s"compact_$gen" ||
        (n.startsWith("batch_id=") && n.stripPrefix("batch_id=").toLong > gen))
        .map(n => s"$store2/base/$n").toSeq
    }
    assert(spark.read.parquet(live2: _*).select("doc_id").collect()
      .map(_.getLong(0)).toSet == baseIds(store))
    // partition count is bounded: folded batch dirs were swept
    val baseDirs2 = dirNames(s"$store2/base")
    assert(baseDirs2.count(_.startsWith("batch_id=")) < 3,
      s"folded batch dirs must be swept: $baseDirs2")
    assert(baseDirs2.count(_.startsWith("compact_")) == 1)

    // replay ACROSS the compaction boundary: re-fold an already-compacted
    // batch id — readers ignore the stale dir, results unchanged
    StreamOps.foldCurateBatch(b2.toDF("doc_id", "text"), 1L, store2, ccfg,
      compactThreshold = 2)
    assert(StreamOps.readCuratedSurvivors(spark, store2)
      .select("doc_id").collect().map(_.getLong(0)).toSet == surv)

    // ---- CRASH MID-COMPACTION then replay: the batch must survive ----
    // Compaction folds only PRIOR batches (gen = batchId-1). Simulate the
    // worst crash window: batch 2's own writes landed, then the BASE
    // sub-table's fold renamed compact_1 into place and swept, but the
    // survivors/index folds never ran. The replay of batch 2 must then
    // read only batches 0-1 as prior corpus (if compact_1 held batch 2's
    // own rows, every doc would die as a self-duplicate and the replay
    // would overwrite batch 2's still-live survivors with empty data).
    val store3 = java.nio.file.Files.createTempDirectory("stream-curate-x").toString
    Seq(b1, b2, b3).zipWithIndex.foreach { case (b, i) =>
      StreamOps.foldCurateBatch(b.toDF("doc_id", "text"), i.toLong, store3, ccfg)
    }
    locally { // base-only partial compaction at batchId=2 (prior = 0,1)
      val prior = Seq(0L, 1L).map(i => s"$store3/base/batch_id=$i")
      spark.read.parquet(prior: _*).write.parquet(s"$store3/base/compact_1")
      prior.foreach { p =>
        new scala.reflect.io.Directory(new java.io.File(p)).deleteRecursively()
      }
    }
    StreamOps.foldCurateBatch(b3.toDF("doc_id", "text"), 2L, store3, ccfg,
      compactThreshold = 2)
    assert(StreamOps.readCuratedSurvivors(spark, store3)
      .select("doc_id").collect().map(_.getLong(0)).toSet == surv,
      "crash-window replay lost the batch's survivors")
  }

  test("foldCurateBatch: caller-supplied gate bound — both routes identical; observed count returned") {
    import graft.ops.Curation
    val ccfg = Curation.Config(langs = Set("latin"), minTokens = 5,
      maxTokens = 100, jaccardThreshold = 0.6)
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val fresh2 = "entirely new batch two prose on cuckoo filters bloom sketches and seen sets"
    val b1 = Seq((1L, base), (2L, base), (6L, base + " tail one"))
    val b2 = Seq((101L, base), (104L, fresh2), (105L, fresh2))

    def runFold(bound2: Option[Long]): (Set[Long], Seq[Long]) = {
      val store = java.nio.file.Files.createTempDirectory("fold-bound").toString
      val r1 = StreamOps.foldCurateBatch(b1.toDF("doc_id", "text"), 0L,
        store, ccfg)
      val r2 = StreamOps.foldCurateBatch(b2.toDF("doc_id", "text"), 1L,
        store, ccfg, deltaDocsBound = bound2)
      (StreamOps.readCuratedSurvivors(spark, store)
        .select("doc_id").collect().map(_.getLong(0)).toSet, Seq(r1, r2))
    }

    val (noBound, counts) = runFold(None)                // count-job gate
    val (broadcastRoute, _) = runFold(Some(12L))         // bound ≤ gate → broadcast
    val (shuffleRoute, _) = runFold(Some(3000000L))      // bound > gate → shuffle join
    assert(broadcastRoute == noBound,
      "bound-driven broadcast route changed the fold results")
    assert(shuffleRoute == noBound,
      "bound-driven shuffle route changed the fold results")

    // observed count = raw batch rows (pre-filter), riding the fold's own
    // jobs; -1 only when the runtime delivers no observed metrics
    if (graft.ObservedMetrics.observationsSupported)
      assert(counts == Seq(b1.size.toLong, b2.size.toLong),
        s"observed batch counts wrong: $counts")
    else assert(counts.forall(c => c == -1L))
  }

  test("watermarked windowed fetch-rate counts per host") {
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[graft.model.PageRow]
    val agg = StreamOps.fetchRateByHost(stream.toDF(), "1 minute", "2 minutes")
    val query = agg.writeStream.format("memory").queryName("rates")
      .outputMode(OutputMode.Append()).start()

    val base = 1700000040000L // minute-aligned so offsets map to windows predictably
    def page(host: String, i: Int, tsOffsetSec: Long) = graft.model.PageRow(
      s"https://$host/p$i", new java.sql.Timestamp(base + tsOffsetSec * 1000),
      Array.emptyByteArray, null, "fa")
    // h1: 3 pages in window 0; h2: 2 pages in window 0, 1 in window 1
    stream.addData(Seq(page("h1.ir", 1, 0), page("h1.ir", 2, 10), page("h1.ir", 3, 50),
      page("h2.ir", 4, 5), page("h2.ir", 5, 59), page("h2.ir", 6, 70)))
    query.processAllAvailable()
    // advance watermark far enough to close all windows
    stream.addData(Seq(page("h3.ir", 7, 600)))
    query.processAllAvailable()
    query.stop()

    val rates = spark.table("rates")
      .select("host", "pages").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(rates.contains(("h1.ir", 3L)))
    assert(rates.contains(("h2.ir", 2L)))
    assert(rates.contains(("h2.ir", 1L)))
  }

  test("streaming url dedup: first arrival survives, canonical-equal urls collide") {
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[graft.model.PageRow]
    val dedup = StreamOps.streamingNotSeen(stream.toDF(), "2 minutes")
    val query = dedup.writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append()).start()

    val base = 1700000040000L
    def page(url: String, off: Long) = graft.model.PageRow(
      url, new java.sql.Timestamp(base + off * 1000), Array.emptyByteArray, null, "fa")
    // u1 arrives twice in batch 1 (exact dup) and once more in batch 2;
    // u2's second form differs only pre-canonicalization (host case) —
    // url_key is over the canonical form, so it must collide too
    stream.addData(Seq(
      page("https://h1.ir/a?IdeaId=1", 0),
      page("https://h1.ir/a?IdeaId=1", 10),
      page("https://h2.ir/b", 5),
      page("HTTPS://H2.IR/b", 20)))
    query.processAllAvailable()
    stream.addData(Seq(
      page("https://h1.ir/a?IdeaId=1", 30), // still within watermark → dropped
      page("https://h3.ir/c", 40)))
    query.processAllAvailable()
    query.stop()

    val urls = spark.table("dedup_out").select("url").collect().map(_.getString(0))
    assert(urls.length == 3, urls.mkString(","))
    assert(urls.count(_.toLowerCase.contains("h2.ir")) == 1)
    assert(urls.exists(_.contains("h1.ir")) && urls.exists(_.contains("h3.ir")))
  }

  test("stateful politeness admission spans micro-batches") {
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[(String, String, Long)]
    val decisions = StreamOps.politenessAdmission(
      spark, stream.toDS(), minGapMs = 1000L, budget = 3L)
    val query = decisions.writeStream.format("memory").queryName("admissions")
      .outputMode(OutputMode.Update()).start()

    val t0 = 1000000L * 1000L // micros
    // batch 1: two requests 500ms apart → second rejected (gap)
    stream.addData(("h1", "u1", t0), ("h1", "u2", t0 + 500L * 1000L))
    query.processAllAvailable()
    // batch 2: state must remember the last admitted ts and count
    stream.addData(("h1", "u3", t0 + 1500L * 1000L), // gap ok → admitted (2nd)
      ("h1", "u4", t0 + 3000L * 1000L), // admitted (3rd)
      ("h1", "u5", t0 + 5000L * 1000L)) // budget 3 exhausted → rejected
    query.processAllAvailable()
    query.stop()

    val adm = spark.table("admissions")
      .select("url", "admitted").collect()
      .map(r => (r.getString(0), r.getBoolean(1))).toMap
    assert(adm == Map("u1" -> true, "u2" -> false, "u3" -> true,
      "u4" -> true, "u5" -> false))
  }
}
