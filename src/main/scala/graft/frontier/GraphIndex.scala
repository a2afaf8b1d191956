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
  // Liveness/id allocation is the repo-wide newest-generation rule,
  // shared with the streaming curation store: graft.store.Generations.
  // Writer contract: SINGLE WRITER per index path (the bm25IndexCompact
  // contract) — concurrent appenders that race to the same delta id now
  // fail loudly at the rename instead of silently replacing each other.

  private val DeltaPrefix = "delta_id="

  private def fsOf(spark: SparkSession, path: String) =
    org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)

  /** Write one aggregated frame as part dir `name` under `aggDir`,
    * partitioned by `bucketCol`, via temp + atomic rename. An EMPTY frame
    * is written unpartitioned (same columns — `bucketCol` becomes a plain
    * data column of the one schema-bearing empty file): a partitioned
    * write of zero rows leaves a data-less dir that poisons every later
    * read with UNABLE_TO_INFER_SCHEMA. The rename target must not exist —
    * a collision means a competing writer or a caller bug, and replacing
    * the committed dir would be silent data loss.
    */
  private def writePart(spark: SparkSession, df: DataFrame, aggDir: String,
      name: String, bucketCol: String, isEmpty: Boolean): Unit = {
    import org.apache.hadoop.fs.Path
    val fs = fsOf(spark, aggDir)
    val tmp = new Path(s"$aggDir/_tmp_$name")
    fs.delete(tmp, true)
    if (isEmpty) df.coalesce(1).write.parquet(tmp.toString)
    else df.write.partitionBy(bucketCol).parquet(tmp.toString)
    val dst = new Path(s"$aggDir/$name")
    require(!fs.exists(dst),
      s"index part $dst already exists — concurrent writer or stale retry; " +
        "refusing to replace committed data")
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

  /** Aggregate + append one delta of raw occurrence rows. `fresh` RESETS
    * the index: any existing generations are deleted before the new meta
    * lands — re-initializing over live data with a different fan would
    * otherwise leave old-fan rows silently invisible to the bucket probe
    * (the exact parameter-mismatch class the meta exists to kill).
    * An EMPTY aggregated delta appends nothing (the table is unchanged by
    * definition); an empty FRESH init writes one schema-bearing empty part
    * so readers see an empty index, not a crash.
    */
  private def appendCore(delta: DataFrame, path: String, keyCols: Seq[String],
      bucketCol: String, bucketOf: org.apache.spark.sql.Column,
      fresh: Boolean, buckets: Int): Unit = {
    val spark = delta.sparkSession
    if (fresh) {
      fsOf(spark, path).delete(new org.apache.hadoop.fs.Path(path), true)
      writeMeta(spark, path, buckets)
    }
    val fan = if (fresh) buckets else readBuckets(spark, path, "indexAppend")
    val agg = delta
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("cnt"))
      // partition readback infers int from the dir names; the empty-part
      // branch stores the column as DATA, so write it as int there too or
      // the union's widening cast would sit above the scan and block the
      // probe's PartitionFilters pushdown
      .withColumn(bucketCol, pmod(bucketOf, lit(fan.toLong)).cast("int"))
      .cache()
    try {
      val empty = agg.isEmpty
      if (!empty || fresh) {
        val aggDir = s"$path/agg"
        val id = graft.store.Generations.nextDeltaId(
          fsOf(spark, aggDir), aggDir, DeltaPrefix)
        writePart(spark, agg, aggDir, s"$DeltaPrefix$id", bucketCol, empty)
      }
    } finally agg.unpersist()
  }

  /** Union of the live part dirs, each read under ITS OWN root: a single
    * multi-path read would run partition discovery over a mix of
    * `delta_id=N` and `compact_C` dir names and reject the layout as
    * conflicting; per-root reads each discover only the `ab=`/`eb=` level,
    * and filters (the probe's bucket predicate) push into every branch.
    */
  private def readLive(spark: SparkSession, path: String): DataFrame = {
    val aggDir = s"$path/agg"
    val live = graft.store.Generations.livePaths(
      fsOf(spark, aggDir), aggDir, DeltaPrefix)
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
    import graft.store.Generations
    val aggDir = s"$path/agg"
    val fs = fsOf(spark, aggDir)
    val live = Generations.livePaths(fs, aggDir, DeltaPrefix)
    val prevGen = Generations.maxCompactGen(fs, aggDir)
    val gen = Generations.nextDeltaId(fs, aggDir, DeltaPrefix) - 1L
    def sweepStale(): Unit =
      fs.listStatus(new Path(aggDir)).foreach { st =>
        val n = st.getPath.getName
        val keep = s"${Generations.CompactPrefix}${math.max(gen, prevGen)}"
        val stale =
          (n.startsWith(DeltaPrefix) &&
            n.stripPrefix(DeltaPrefix).toLong <= gen) ||
          (n.startsWith(Generations.CompactPrefix) && n != keep)
        if (stale) fs.delete(st.getPath, true)
      }
    // nothing newer than the standing compact generation: folding would
    // rewrite compact_N onto ITSELF (gen == prevGen), whose delete+rename
    // crash window could unlink the only live generation. Just finish any
    // pending sweep (a prior compaction may have crashed post-rename).
    if (live.isEmpty || gen == prevGen) { sweepStale(); return }
    val folded = live.map(spark.read.parquet(_)).reduce(_ unionAll _)
      .groupBy((keyCols :+ bucketCol).map(col): _*)
      .agg(sum(col("cnt")).as("cnt"))
      .cache()
    try {
      writePart(spark, folded, aggDir,
        s"${Generations.CompactPrefix}$gen", bucketCol, folded.isEmpty)
      sweepStale()
    } finally folded.unpersist()
  }

  // ==================== anchor-signal index ===============================

  /** Create the anchor index from a first batch of anchor occurrences
    * ((src_url, dst_url, text) rows, [[AnchorText.anchors]]' shape).
    * Empty texts (icon links) drop here — [[AnchorText.topAnchors]]
    * semantics — so the stored aggregate is exactly the signal table.
    * RESETS any existing index at `path` (the bm25IndexBuild overwrite
    * semantics): mixing generations bucketed under different fans would
    * silently corrupt the probe.
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
    * Hosts derive via [[LinkRank.hostEdgesOf]] — the same code hostRank
    * runs, so the maintained graph feeds the same rank by construction.
    * RESETS any existing index at `path` (see [[anchorIndexInit]]).
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
      dstCol: String): DataFrame =
    LinkRank.hostEdgesOf(urlEdges, srcCol, dstCol)
}
