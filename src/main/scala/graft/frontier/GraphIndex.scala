package graft.frontier

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental maintenance of the crawl-intelligence signal tables — the
  * anchor-text aggregate ([[AnchorText.topAnchors]]'s input) and the host
  * link graph ([[LinkRank.hostRank]]'s input) — so a daily crawl delta
  * never forces a full-corpus recompute. The reference has no notion of
  * either signal (its scheduler is discovery-order FIFO,
  * /root/reference/src/handler.py:444-497); at a 10^10-URL frontier both
  * signals are corpus-sized, and re-extracting/re-aggregating them per
  * ingest day (O(corpus + delta)) is exactly the disease the dedup suite's
  * persisted band index cured for near-dup detection
  * ([[graft.ops.Dedup.lshBandIndex]]) — the same cure applies.
  *
  * Storage shape — one COUNTED-KEY GENERATION TABLE per signal:
  *   `path/meta/`                      (buckets, the fixed partition fan)
  *   `path/agg/delta_id=N/<bk>=B/…`    one aggregated delta per append
  *   `path/agg/compact_C/<bk>=B/…`     folded generations (C = max folded N)
  * Counts merge ADDITIVELY, so an append aggregates ONLY its delta
  * (map-side combine, O(delta) rows written) and readers re-merge with one
  * sum over the live directories. Liveness is the streaming store's
  * newest-generation rule ([[graft.streaming.StreamOps]]): the newest
  * `compact_C` plus every `delta_id=N` with N > C; every data write lands
  * in a temp dir and RENAMES into place (atomic on local/HDFS), so a crash
  * mid-append or mid-compaction leaves only ignored `_tmp_*` dirs and
  * readers never see partial rows. Compaction bounds the multi-path read
  * as deltas accumulate and sweeps superseded dirs after its rename.
  *
  * The bucket partition column (`ab` = pmod(xxhash64(dst_url), buckets);
  * `eb` over src hosts) is a fixed table property like the BM25 index's
  * `tb`: a point probe for known targets ([[anchorsFor]]) reads only the
  * targets' buckets via PartitionFilters — at 100 TB the retrieval-field
  * read touches buckets⁻¹ of the table, never scans it.
  */
object GraphIndex {

  // ==================== generic counted-key generation table =============

  private val CompactPrefix = "compact_"
  private val DeltaPrefix = "delta_id="

  private def fsOf(spark: SparkSession, path: String) =
    org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)

  /** Highest compaction generation under `aggDir` (-1 if none). */
  private def maxCompactGen(fs: org.apache.hadoop.fs.FileSystem,
      aggDir: String): Long = {
    val p = new org.apache.hadoop.fs.Path(aggDir)
    if (!fs.exists(p)) -1L
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.startsWith(CompactPrefix))
      .map(_.stripPrefix(CompactPrefix).toLong)
      .foldLeft(-1L)(math.max)
  }

  /** Live part dirs: newest compact generation + every later delta. */
  private def livePaths(fs: org.apache.hadoop.fs.FileSystem,
      aggDir: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(aggDir)
    if (!fs.exists(p)) return Seq.empty
    val gen = maxCompactGen(fs, aggDir)
    val names = fs.listStatus(p).toSeq.map(_.getPath)
    val compacted = names.filter(_.getName == s"$CompactPrefix$gen")
    val deltas = names
      .filter(_.getName.startsWith(DeltaPrefix))
      .filter(_.getName.stripPrefix(DeltaPrefix).toLong > gen)
    (compacted ++ deltas).map(_.toString)
  }

  /** Next delta id: above every on-disk delta AND the compact generation —
    * a crashed append's surviving `_tmp` dir can never collide because
    * temp dirs rename to their FINAL id atomically, and a crashed
    * compaction's partial `_tmp_compact_*` is ignored by liveness.
    */
  private def nextDeltaId(fs: org.apache.hadoop.fs.FileSystem,
      aggDir: String): Long = {
    val p = new org.apache.hadoop.fs.Path(aggDir)
    val maxDelta =
      if (!fs.exists(p)) -1L
      else fs.listStatus(p).toSeq.map(_.getPath.getName)
        .filter(_.startsWith(DeltaPrefix))
        .map(_.stripPrefix(DeltaPrefix).toLong)
        .foldLeft(-1L)(math.max)
    math.max(maxDelta, maxCompactGen(fs, aggDir)) + 1L
  }

  /** Write one aggregated frame as part dir `name` under `aggDir`,
    * partitioned by `bucketCol`, via temp + atomic rename.
    */
  private def writePart(spark: SparkSession, df: DataFrame, aggDir: String,
      name: String, bucketCol: String): Unit = {
    import org.apache.hadoop.fs.Path
    val fs = fsOf(spark, aggDir)
    val tmp = new Path(s"$aggDir/_tmp_$name")
    fs.delete(tmp, true)
    df.write.partitionBy(bucketCol).parquet(tmp.toString)
    val dst = new Path(s"$aggDir/$name")
    fs.delete(dst, true)
    require(fs.rename(tmp, dst), s"index part rename failed for $dst")
  }

  /** Meta = (buckets). Written once at init; append/probe derive the fan
    * from the index itself instead of trusting a caller parameter — the
    * parameter-mismatch corruption class [[graft.ops.Search.bm25IndexAppend]]
    * guards against cannot arise when there is no parameter.
    */
  private def writeMeta(spark: SparkSession, path: String,
      buckets: Int): Unit = {
    import spark.implicits._
    Seq(buckets).toDF("buckets").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  private def readBuckets(spark: SparkSession, path: String,
      caller: String): Int = {
    val metaPath = new org.apache.hadoop.fs.Path(s"$path/meta")
    require(fsOf(spark, path).exists(metaPath),
      s"$caller: no index at $path (init it first)")
    spark.read.parquet(s"$path/meta").head.getAs[Int]("buckets")
  }

  /** Aggregate + append one delta of (key…, already-counted or raw) rows.
    * `counted` rows carry a `cnt` to sum; raw rows count occurrences.
    */
  private def appendCore(delta: DataFrame, path: String, keyCols: Seq[String],
      bucketCol: String, bucketOf: org.apache.spark.sql.Column,
      fresh: Boolean, buckets: Int): Unit = {
    val spark = delta.sparkSession
    if (fresh) writeMeta(spark, path, buckets)
    val fan = if (fresh) buckets else readBuckets(spark, path, "indexAppend")
    val agg = delta
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("cnt"))
      .withColumn(bucketCol, pmod(bucketOf, lit(fan.toLong)))
    val aggDir = s"$path/agg"
    val id = nextDeltaId(fsOf(spark, aggDir), aggDir)
    writePart(spark, agg, aggDir, s"$DeltaPrefix$id", bucketCol)
  }

  /** Union of the live part dirs, each read under ITS OWN root: a single
    * multi-path read would run partition discovery over a mix of
    * `delta_id=N` and `compact_C` dir names and reject the layout as
    * conflicting; per-root reads each discover only the `ab=`/`eb=` level,
    * and filters (the probe's bucket predicate) push into every branch.
    */
  private def readLive(spark: SparkSession, path: String): DataFrame = {
    val aggDir = s"$path/agg"
    val live = livePaths(fsOf(spark, aggDir), aggDir)
    require(live.nonEmpty, s"no live index partitions under $path")
    live.map(spark.read.parquet(_)).reduce(_ unionAll _)
  }

  /** Merged view: live parts, counts summed per key. The groupBy shuffles
    * only the AGGREGATED live rows (bounded by distinct keys, not
    * occurrences); a freshly compacted table reads one dir and the sum is
    * a map-side pass-through.
    */
  private def readCore(spark: SparkSession, path: String,
      keyCols: Seq[String], bucketCol: String): DataFrame =
    readLive(spark, path)
      .groupBy((keyCols :+ bucketCol).map(col): _*)
      .agg(sum(col("cnt")).as("cnt"))

  /** Fold every live part into one `compact_<maxLiveDelta>` dir, then
    * sweep superseded dirs. Readers resolve by the newest-generation rule
    * throughout, so every crash state is either "old parts still live" or
    * "new generation live, stale dirs pending sweep".
    */
  private def compactCore(spark: SparkSession, path: String,
      keyCols: Seq[String], bucketCol: String): Unit = {
    import org.apache.hadoop.fs.Path
    val aggDir = s"$path/agg"
    val fs = fsOf(spark, aggDir)
    val live = livePaths(fs, aggDir)
    if (live.isEmpty) return
    val gen = nextDeltaId(fs, aggDir) - 1L
    val folded = live.map(spark.read.parquet(_)).reduce(_ unionAll _)
      .groupBy((keyCols :+ bucketCol).map(col): _*)
      .agg(sum(col("cnt")).as("cnt"))
    writePart(spark, folded, aggDir, s"$CompactPrefix$gen", bucketCol)
    fs.listStatus(new Path(aggDir)).foreach { st =>
      val n = st.getPath.getName
      val stale =
        (n.startsWith(DeltaPrefix) &&
          n.stripPrefix(DeltaPrefix).toLong <= gen) ||
        (n.startsWith(CompactPrefix) && n != s"$CompactPrefix$gen")
      if (stale) fs.delete(st.getPath, true)
    }
  }

  // ==================== anchor-signal index ===============================

  /** Create the anchor index from a first batch of anchor occurrences
    * ((src_url, dst_url, text) rows, [[AnchorText.anchors]]' shape).
    * Empty texts (icon links) drop here — [[AnchorText.topAnchors]]
    * semantics — so the stored aggregate is exactly the signal table.
    */
  def anchorIndexInit(anchors: DataFrame, path: String,
      buckets: Int = 64): Unit = {
    require(buckets >= 1, s"buckets must be >= 1: $buckets")
    appendCore(anchors.filter(col("text") =!= lit("")), path,
      Seq("dst_url", "text"), "ab", xxhash64(col("dst_url")),
      fresh = true, buckets = buckets)
  }

  /** O(delta) maintenance: aggregate ONLY the new batch's anchors and
    * append them as a new generation — the existing table is never read.
    */
  def anchorIndexAppend(anchors: DataFrame, path: String): Unit =
    appendCore(anchors.filter(col("text") =!= lit("")), path,
      Seq("dst_url", "text"), "ab", xxhash64(col("dst_url")),
      fresh = false, buckets = -1)

  /** Fold accumulated deltas into one generation (bounds the read fan). */
  def anchorIndexCompact(spark: SparkSession, path: String): Unit =
    compactCore(spark, path, Seq("dst_url", "text"), "ab")

  /** Merged (dst_url, text, cnt) — equals the batch aggregation of every
    * anchor ever appended (spec-pinned).
    */
  def anchorStats(spark: SparkSession, path: String): DataFrame =
    readCore(spark, path, Seq("dst_url", "text"), "ab")
      .select(col("dst_url"), col("text"), col("cnt"))

  /** Top-k anchor texts per target from the index —
    * [[AnchorText.topAnchors]] over the cumulative corpus, without
    * re-extracting or re-aggregating it.
    */
  def topAnchorsIndexed(spark: SparkSession, path: String,
      k: Int = 5): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("dst_url")).orderBy(col("cnt").desc, col("text"))
    anchorStats(spark, path)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }

  /** Point probe: top-k anchors for KNOWN targets. The targets' bucket set
    * is |targets| ints computed driver-side (the bm25TopKIndexed /
    * IVF-probe pattern) so it becomes a PartitionFilters predicate — the
    * read touches only those `ab=` directories.
    */
  def anchorsFor(spark: SparkSession, path: String, targets: Seq[String],
      k: Int = 5): DataFrame = {
    require(targets.nonEmpty, "anchorsFor needs at least one target")
    require(k >= 1, s"k must be >= 1: $k")
    import spark.implicits._
    val fan = readBuckets(spark, path, "anchorsFor")
    // one tiny local job maps the driver-side target list through the SAME
    // hash the writer used (Spark's xxhash64 — not reimplemented here)
    val abs = targets.toDF("dst_url")
      .select(pmod(xxhash64(col("dst_url")), lit(fan.toLong)).as("ab"))
      .distinct().collect().map(_.getLong(0)).toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("dst_url")).orderBy(col("cnt").desc, col("text"))
    readLive(spark, path)
      .filter(col("ab").isin(abs: _*))
      .filter(col("dst_url").isin(targets: _*))
      .groupBy(col("dst_url"), col("text"))
      .agg(sum(col("cnt")).as("cnt"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }

  // ==================== host link-graph index =============================

  /** Create the host-edge index from a first batch of url-level edges.
    * Hosts derive exactly as [[LinkRank.hostRank]] does (Urls.host
    * semantics, self-loops and unparseable hosts drop), so the maintained
    * graph feeds the same rank.
    */
  def hostEdgeIndexInit(urlEdges: DataFrame, path: String,
      buckets: Int = 64, srcCol: String = "src_url",
      dstCol: String = "dst_url"): Unit = {
    require(buckets >= 1, s"buckets must be >= 1: $buckets")
    appendCore(hostPairs(urlEdges, srcCol, dstCol), path,
      Seq("src", "dst"), "eb", xxhash64(col("src")),
      fresh = true, buckets = buckets)
  }

  /** O(delta) maintenance of the host graph from a crawl delta's edges. */
  def hostEdgeIndexAppend(urlEdges: DataFrame, path: String,
      srcCol: String = "src_url", dstCol: String = "dst_url"): Unit =
    appendCore(hostPairs(urlEdges, srcCol, dstCol), path,
      Seq("src", "dst"), "eb", xxhash64(col("src")),
      fresh = false, buckets = -1)

  def hostEdgeIndexCompact(spark: SparkSession, path: String): Unit =
    compactCore(spark, path, Seq("src", "dst"), "eb")

  /** Merged (src, dst, weight) host edges — weight = cumulative url-level
    * link occurrences (kept for weighted consumers; [[hostRankIndexed]]
    * uses the pair set, matching hostRank's distinct-edge convention).
    */
  def hostEdges(spark: SparkSession, path: String): DataFrame =
    readCore(spark, path, Seq("src", "dst"), "eb")
      .select(col("src"), col("dst"), col("cnt").as("weight"))

  /** [[LinkRank.hostRank]] over the MAINTAINED graph: rank the cumulative
    * host edges without touching a page or url-level edge again. Combined
    * with [[LinkRank.pageRankWarm]] (seed from yesterday's ranks) the
    * daily cost is O(delta) maintenance + a few host-sized power
    * iterations — never O(corpus).
    */
  def hostRankIndexed(spark: SparkSession, path: String, iters: Int = 3,
      damping: Double = 0.85,
      init: Option[DataFrame] = None): DataFrame = {
    val e = hostEdges(spark, path).select(col("src"), col("dst"))
    val ranks = init match {
      case Some(prev) => LinkRank.pageRankWarm(e, prev, iters, damping)
      case None => LinkRank.pageRank(e, iters, damping)
    }
    ranks.select(col("node").as("host"), col("rank"))
  }

  private def hostPairs(urlEdges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val hostOf = (c: String) => graft.url.Urls.hostColumn(col(c))
    urlEdges
      .select(hostOf(srcCol).as("src"), hostOf(dstCol).as("dst"))
      .filter(col("src") =!= col("dst") &&
        col("src") =!= lit("") && col("dst") =!= lit(""))
  }
}
