package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines
  * (builder-prompt first-class components; reference analogs: the exact
  * duplicate-key detection + keep-first delete of
  * /root/reference/src/dedupe_id_ara.py:66-217).
  *
  * All operators are declarative DataFrame plans: hash-partial aggregation,
  * window keep-first, and LSH band self-joins — no driver-side loops, no
  * collect; at 100 TB the band join shuffles only (band, signature) pairs.
  */
object Dedup {

  /** Exact duplicate groups by content hash (A1 generalized):
    * groupBy(hash).count >= 2. keep_id uses the SAME nulls-first
    * (isNotNull, id) key as [[exactKeepFirst]] — plain min(id) skips
    * nulls, so a {null, 5} group would report keeper 5 while keepFirst
    * actually keeps the null-id row; a pipeline reporting via one and
    * deleting via the other would name a keeper it deleted. keep_id is
    * null exactly when the surviving row's id is null.
    */
  def exactDupGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(count(lit(1)).as("dup_count"),
        min_by(col(idCol),
          struct(col(idCol).isNotNull.cast("int"), col(idCol))).as("keep_id"))
      .filter(col("dup_count") >= 2)

  /** Keep-first dedup (W1 made deterministic): one row per content hash,
    * lowest id wins — reference kept ES's arbitrary first hit
    * (dedupe_id_ara.py:183-188); we fix the tiebreak.
    *
    * Two-phase `min_by` aggregation, NOT a `row_number` window: a window
    * partitioned by content hash must co-locate and sort every copy of a
    * hot hash on one task — a boilerplate page duplicated 10^8 times at
    * 100 TB is a straggler/OOM. `min_by(struct(row), id)` gets map-side
    * partial aggregation (each input partition reduces its local copies to
    * one survivor candidate before the exchange), so the shuffle carries at
    * most one row per (input partition × hash) and the hot key reduces in
    * parallel. idCol must be unique (it is the keep-first key), which makes
    * the min_by deterministic.
    */
  def exactKeepFirst(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    require(!df.columns.contains("__content_hash") && !df.columns.contains("__keep"),
      "exactKeepFirst reserves the __content_hash/__keep temp names")
    val rowStruct = struct(df.columns.map(col).toIndexedSeq: _*)
    // min_by IGNORES rows whose ordering key is null — a null idCol row
    // would silently vanish from its group, where the prior row_number
    // window kept it nulls-first. The (isNotNull, id) struct key restores
    // nulls-first exactly: null ids sort as (0, null), before every (1, x).
    val keepKey = struct(col(idCol).isNotNull.cast("int"), col(idCol))
    df.groupBy(md5(col(textCol)).as("__content_hash"))
      .agg(min_by(rowStruct, keepKey).as("__keep"))
      .select(df.columns.map(c => col("__keep").getField(c).as(c)).toIndexedSeq: _*)
  }

  /** MinHash + LSH banding candidate pairs with verified shingle-Jaccard.
    *
    * Per-row signature math (shingle → minhash → band hashes) runs in a
    * typed map (tight JVM loops, see Sketches); the candidate generation is
    * a declarative self-join keyed on (band, band_hash) and the verify step
    * re-joins the shingle table for candidates only. At scale the shuffle
    * carries (band, hash, id) triples — never the documents.
    *
    * EAGER: the shingle table must be cached across the band + verify
    * joins; to avoid leaking that cache to callers (a curation sweep over
    * thresholds would accumulate executor storage) the verified pairs are
    * materialized with localCheckpoint and the cache is released before
    * returning. Pair output is tiny relative to the corpus (deduped
    * candidates only), so the checkpoint is cheap at any scale.
    * `eager = false` skips the checkpoint and returns the LIVE plan (for
    * plan audits/composition); no cache is taken in that mode — the shingle
    * table recomputes per action, which is the explicit trade for getting
    * an inspectable plan with nothing left behind on executors.
    */
  def minhashLshPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      numHashes: Int = 64,
      bands: Int = 16,
      jaccardThreshold: Double = 0.5,
      shingleSize: Int = 3,
      eager: Boolean = true): DataFrame = {
    val (verified, release) = batchPairsCore(df, textCol, idCol, numHashes,
      bands, jaccardThreshold, shingleSize, cacheShingles = eager)
    if (!eager) verified
    else {
      val out = verified.localCheckpoint(true)
      release()
      out
    }
  }

  /** [[minhashLshPairs]] with the verified pair frame left LAZY and the
    * shingle table cached — the batch twin of
    * [[minhashLshPairsIncrementalLazy]]: the caller folds the pair
    * pipeline into its own single materialization (e.g.
    * [[keepClusterRepresentatives]]' edges checkpoint evaluates band join +
    * verify exactly once — one job instead of pairs-checkpoint +
    * edges-checkpoint). Call `release()` after the frame's one consumer
    * has materialized (drops the shingle cache).
    */
  def minhashLshPairsLazy(
      df: DataFrame,
      textCol: String,
      idCol: String,
      numHashes: Int = 64,
      bands: Int = 16,
      jaccardThreshold: Double = 0.5,
      shingleSize: Int = 3): (DataFrame, () => Unit) =
    batchPairsCore(df, textCol, idCol, numHashes, bands, jaccardThreshold,
      shingleSize, cacheShingles = true)

  private def batchPairsCore(
      df: DataFrame,
      textCol: String,
      idCol: String,
      numHashes: Int,
      bands: Int,
      jaccardThreshold: Double,
      shingleSize: Int,
      cacheShingles: Boolean): (DataFrame, () => Unit) = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val spark = df.sparkSession
    import spark.implicits._

    val shingled0 = shingleTable(df, textCol, idCol, shingleSize)
    val shingled = if (cacheShingles) shingled0.cache() else shingled0

    val banded = bandTable(shingled, numHashes, bands)

    val candidates = banded.as("l")
      .join(banded.as("r"), Seq("band", "band_hash"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")

    val verified = candidates
      .join(shingled.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(shingled.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .as[(Long, Long, Array[String], Array[String])]
      .map { case (idB, idA, shA, shB) =>
        (idA, idB, Sketches.jaccard(shA, shB))
      }
      .toDF("id_a", "id_b", "jaccard")
      .filter(col("jaccard") >= jaccardThreshold)
      .withColumn("jaccard", round(col("jaccard"), 6))
    (verified, () => if (cacheShingles) { shingled.unpersist(false); () })
  }

  /** LSH band index of a corpus: one (band, band_hash, id) row per band of
    * each document's minhash signature — the PERSISTED artifact that makes
    * near-dup detection incremental. At 100 TB the corpus is indexed once
    * (and appended to as batches land); writing this frame bucketed by
    * (band, band_hash) lets every future delta probe join it without the
    * corpus ever being re-shingled or re-shuffled.
    */
  def lshBandIndex(
      df: DataFrame,
      textCol: String,
      idCol: String,
      numHashes: Int = 64,
      bands: Int = 16,
      shingleSize: Int = 3): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    bandTable(shingleTable(df, textCol, idCol, shingleSize), numHashes, bands)
  }

  /** (id, sh) shingle rows — the ONE place the shingle pipeline lives: the
    * batch, index, and incremental operators' bit-equality contract depends
    * on them sharing this and [[bandTable]] exactly.
    */
  private def shingleTable(df: DataFrame, textCol: String, idCol: String,
      shingleSize: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(textCol).as("t"))
      .as[(Long, String)]
      .map { case (id, t) =>
        (id, Sketches.shingles(if (t == null) "" else t, shingleSize)) }
      .toDF("id", "sh")
      .filter(size(col("sh")) > 0)
  }

  /** (band, band_hash, id) rows from a shingle table — shared minhash +
    * banding kernel (see [[shingleTable]]).
    */
  private def bandTable(shingled: DataFrame, numHashes: Int,
      bands: Int): DataFrame = {
    val spark = shingled.sparkSession
    import spark.implicits._
    shingled.as[(Long, Array[String])]
      .flatMap { case (id, sh) =>
        Sketches.bandHashes(Sketches.minhashSignature(sh, numHashes), bands)
          .iterator.zipWithIndex.map { case (h, b) => (b, h, id) }
      }
      .toDF("band", "band_hash", "id")
  }

  /** Incremental near-dup pairs: a NEW batch against a persisted band index
    * — the operation a daily ingest actually performs at 100 TB, where
    * re-running pair detection over the cumulative corpus
    * (O(corpus + delta) per day) is not an option.
    *
    * Shuffle shape: the delta's band table is broadcast into the index join,
    * so the corpus-sized `bandIndex` NEVER shuffles (with the index written
    * bucketed by (band, band_hash) the probe is also scan-pruned); the
    * within-delta self-join shuffles only delta bands. Verification
    * re-shingles candidate docs ONLY: delta texts (cached, they are the
    * small batch) plus the corpus rows semi-joined down to candidate index
    * ids. Emits (id_a, id_b, jaccard) with id_a < id_b, restricted to pairs
    * touching the delta; identical hash seeds make the result bit-equal to
    * the batch operator's pairs on corpus ∪ delta filtered to delta ids
    * (spec-pinned).
    *
    * EAGER like [[minhashLshPairs]]: returns a localCheckpoint so the
    * delta-shingle cache is released before returning.
    */
  def minhashLshPairsIncremental(
      corpus: DataFrame,
      bandIndex: DataFrame,
      delta: DataFrame,
      textCol: String,
      idCol: String,
      numHashes: Int = 64,
      bands: Int = 16,
      jaccardThreshold: Double = 0.5,
      shingleSize: Int = 3,
      eager: Boolean = true,
      maxBroadcastDeltaDocs: Long = 2000000L,
      knownDeltaDocs: Option[Long] = None): DataFrame =
    if (!eager)
      incrementalPairsCore(corpus, bandIndex, delta, textCol, idCol,
        numHashes, bands, jaccardThreshold, shingleSize, cacheDelta = false,
        maxBroadcastDeltaDocs, knownDeltaDocs)._1
    else {
      val (verified, release) = incrementalPairsCore(corpus, bandIndex,
        delta, textCol, idCol, numHashes, bands, jaccardThreshold,
        shingleSize, cacheDelta = true, maxBroadcastDeltaDocs,
        knownDeltaDocs)
      val out = verified.localCheckpoint(true)
      release()
      out
    }

  /** [[minhashLshPairsIncremental]] with the verified pair frame left
    * LAZY: the caller folds it into its OWN single materialization (the
    * curateDelta fold hands it to keepClusterRepresentatives, whose edges
    * checkpoint then evaluates band join + verify exactly once — one job
    * instead of pairs-checkpoint + edges-checkpoint). The count gate +
    * shingle cache behave like the eager mode; call `release()` after the
    * frame's one consumer materialized (it drops the shingle cache).
    *
    * `knownDeltaDocs`: a caller-supplied UPPER BOUND on the delta's row
    * count — when given, the broadcast gate compares it instead of
    * running the count job (one job off a fixed-cost-bound fold). A
    * too-HIGH bound only routes to the always-correct shuffle join; a
    * bound below the true size is caught by a free plan-estimate veto
    * when the optimizer can size the delta, and otherwise fails LOUDLY
    * at Spark's broadcast-size cap — never silently wrong. Stream
    * callers pass the previous batch's observed count with headroom
    * (the steady-batch contract; see
    * [[graft.streaming.StreamOps.foldCurateBatch]]).
    */
  def minhashLshPairsIncrementalLazy(
      corpus: DataFrame,
      bandIndex: DataFrame,
      delta: DataFrame,
      textCol: String,
      idCol: String,
      numHashes: Int = 64,
      bands: Int = 16,
      jaccardThreshold: Double = 0.5,
      shingleSize: Int = 3,
      maxBroadcastDeltaDocs: Long = 2000000L,
      knownDeltaDocs: Option[Long] = None): (DataFrame, () => Unit) =
    incrementalPairsCore(corpus, bandIndex, delta, textCol, idCol,
      numHashes, bands, jaccardThreshold, shingleSize, cacheDelta = true,
      maxBroadcastDeltaDocs, knownDeltaDocs)

  private def incrementalPairsCore(
      corpus: DataFrame,
      bandIndex: DataFrame,
      delta: DataFrame,
      textCol: String,
      idCol: String,
      numHashes: Int,
      bands: Int,
      jaccardThreshold: Double,
      shingleSize: Int,
      cacheDelta: Boolean,
      maxBroadcastDeltaDocs: Long,
      knownDeltaDocs: Option[Long] = None): (DataFrame, () => Unit) = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val spark = delta.sparkSession
    import spark.implicits._

    val deltaSh0 = shingleTable(delta, textCol, idCol, shingleSize)
    val deltaSh = if (cacheDelta) deltaSh0.cache() else deltaSh0

    // cached alongside the shingles: the band table has TWO distribution
    // shapes downstream (the broadcast probe side and the shuffled
    // within-delta self-join — exchange reuse covers l/r but not the
    // broadcast), so uncached the minhash flatMap runs twice per fold
    val deltaBanded0 = bandTable(deltaSh, numHashes, bands)
    val deltaBanded = if (cacheDelta) deltaBanded0.cache() else deltaBanded0

    // delta vs index: broadcast the batch-sized delta bands — the
    // corpus-sized index side stays exchange-free. The hint is GATED on
    // the measured delta size (the count also populates the shingle
    // cache): an unbounded hint on a corpus-sized "delta" is a
    // driver/broadcast-limit OOM, and such a batch belongs to
    // [[minhashLshPairs]] anyway — above the gate the join degrades to a
    // shuffle of both sides instead of failing. A caller-supplied
    // `knownDeltaDocs` upper bound replaces the count job entirely (the
    // shingle cache then populates during the fold's first scan instead
    // of here; see the Lazy variant's Scaladoc for the bound contract).
    // In eager=false (live-plan audit / composition) mode no job may run
    // at build time and nothing is cached to absorb a count, so the gate
    // falls back to the optimizer's size ESTIMATE — conservative enough
    // to keep a corpus-sized parquet "delta" off the broadcast path while
    // the documented small-batch contract still audits with the hint.
    val deltaBands = deltaBanded.withColumnRenamed("id", "delta_id")
    val deltaSmall = knownDeltaDocs match {
      case Some(bound) =>
        // the caller's bound replaces the count JOB, but a computable plan
        // estimate still gets a free VETO: a stream's backlog-drain batch
        // can exceed the steady-batch bound by far more than the
        // contract's headroom, and the forced broadcast the measured gate
        // exists to prevent would come back as a query crash. Estimates
        // at/above ~1 PiB are the optimizer's "unknown" default leaking
        // through (LogicalRDD etc.) and carry no signal — only a real
        // estimate may veto.
        val est = delta.queryExecution.optimizedPlan.stats.sizeInBytes
        bound <= maxBroadcastDeltaDocs &&
          (est >= BigInt(1L << 50) ||
            est <= BigInt(maxBroadcastDeltaDocs) * 512L)
      case None =>
        if (cacheDelta) deltaSh.count() <= maxBroadcastDeltaDocs
        else delta.queryExecution.optimizedPlan.stats.sizeInBytes <=
          maxBroadcastDeltaDocs * 512L
    }
    val probeSide = if (deltaSmall) broadcast(deltaBands) else deltaBands
    val vsIndex = bandIndex
      .join(probeSide, Seq("band", "band_hash"))
      .select(least(col("delta_id"), col("id")).as("id_a"),
        greatest(col("delta_id"), col("id")).as("id_b"))
      .filter(col("id_a") < col("id_b"))

    val within = deltaBanded.as("l")
      .join(deltaBanded.as("r"), Seq("band", "band_hash"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .filter(col("id_a") < col("id_b"))

    val candidates = vsIndex.unionByName(within).dropDuplicates("id_a", "id_b")

    // shingles for candidate ids only: delta side from the cache, index side
    // re-derived from the corpus slice the candidates name (left_semi keeps
    // the corpus scan pruned to candidate ids). NOT distinct'd: both
    // consumers (the delta-id anti-join and the corpus semi-join) are
    // duplicate-indifferent, and the distinct cost an exchange of the
    // candidate-id set per fold
    val candIds = candidates
      .select(explode(array(col("id_a"), col("id_b"))).as("id"))
    val indexIds = candIds.join(deltaSh.select("id"), Seq("id"), "left_anti")
    val prunedCorpus = corpus
      .select(col(idCol).cast("long").as("id"), col(textCol).as("t"))
      .join(indexIds, Seq("id"), "left_semi")
    val corpusSh = shingleTable(prunedCorpus, "t", "id", shingleSize)
    val allSh = deltaSh.unionByName(corpusSh)

    val verified = candidates
      .join(allSh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(allSh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .as[(Long, Long, Array[String], Array[String])]
      .map { case (idB, idA, shA, shB) =>
        (idA, idB, Sketches.jaccard(shA, shB))
      }
      .toDF("id_a", "id_b", "jaccard")
      .filter(col("jaccard") >= jaccardThreshold)
      .withColumn("jaccard", round(col("jaccard"), 6))
    (verified, () => if (cacheDelta) {
      deltaSh.unpersist(false); deltaBanded.unpersist(false); ()
    })
  }

  /** SimHash near-dup candidate pairs: 64-bit simhash per doc (typed map),
    * split into `maxHamming + 1` bit blocks — the pigeonhole count that
    * GUARANTEES two hashes within the hamming budget share at least one
    * block (a fixed 4-block layout silently loses recall for any
    * maxHamming > 3: one differing bit per block and the pair never
    * becomes a candidate). Default maxHamming = 3 keeps the classic
    * 4 × 16-bit layout. Verify is exact via bit_count(xor).
    *
    * Token-free docs (simhash 0) are excluded — they are not near-dups of
    * each other, and at corpus scale a shared all-zero hash degenerates
    * into an O(n²) pair blowup.
    */
  def simhashPairs(df: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 31,
      s"need 0 <= maxHamming <= 31 (got $maxHamming; blocks need >= 2 bits)")
    val nBlocks = maxHamming + 1
    val width = 64 / nBlocks
    val spark = df.sparkSession
    import spark.implicits._
    val withHash = df.select(col(idCol).cast("long").as("id"), col(textCol).as("t"))
      .as[(Long, String)]
      .map { case (id, t) =>
        val tokens = Sketches.tokenize(if (t == null) "" else t)
        (id, Sketches.simhash64(if (t == null) "" else t), tokens.nonEmpty)
      }
      .toDF("id", "sh64", "has_tokens")
      .filter(col("has_tokens"))
      .drop("has_tokens")
    val blockCols = (0 until nBlocks).map { b =>
      val start = b * width
      val len = if (b == nBlocks - 1) 64 - start else width // last takes remainder
      val mask = if (len >= 64) -1L else (1L << len) - 1
      struct(lit(b).as("block"),
        shiftright(col("sh64"), start).bitwiseAND(lit(mask)).as("block_val"))
    }
    val blocked = withHash
      .select(col("id"), col("sh64"), explode(array(blockCols: _*)).as("bb"))
      .select(col("id"), col("sh64"),
        col("bb.block").as("block"), col("bb.block_val").as("block_val"))
    val l = blocked.select(col("block"), col("block_val"), col("id").as("id_a"), col("sh64").as("h_a"))
    val r = blocked.select(col("block"), col("block_val"), col("id").as("id_b"), col("sh64").as("h_b"))
    l.join(r, Seq("block", "block_val"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count(col("h_a").bitwiseXOR(col("h_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Connected-component cluster assignment over near-duplicate candidate
    * pairs: every doc reachable through a chain of pairs gets the cluster's
    * smallest id as its representative (the transitive closure step a real
    * dedup pipeline needs on top of pair generation — two docs can be dups
    * of a third without being a pair themselves).
    *
    * Smallest-label propagation as a DataFrame loop: each iteration joins
    * current labels across edges and takes the min — O(cluster diameter)
    * iterations, each one shuffle on id; labels are localCheckpoint-ed so
    * lineage stays flat. Near-dup clusters in practice have tiny diameters
    * (dup chains, not long paths), so this converges in a few rounds even
    * at 100 TB. No driver-side graph state.
    *
    * Returns (id, cluster_rep) for every id appearing in `pairs`.
    */
  def clusterAssign(pairs: DataFrame, maxIter: Int = 20): DataFrame =
    clusterAssignEdges(edgesOf(pairs).localCheckpoint(true), maxIter)

  /** Undirected both-direction edge set of a pair frame — ONE scan of
    * `pairs` (explode, not a self-union), so a LAZY pair pipeline folded
    * in here evaluates once when the caller materializes the edges.
    *
    * NOT distinct'd: both consumers are duplicate-indifferent (the label
    * init is its own distinct, the per-iteration neighbor pass is a
    * min-aggregation), every in-repo pair producer emits unique (id_a,
    * id_b) rows already, and the distinct cost a full edge exchange
    * before the checkpoint. A caller passing duplicated pairs only pays
    * proportionally larger per-iteration joins — results unchanged.
    */
  private def edgesOf(pairs: DataFrame): DataFrame =
    pairs
      .select(explode(array(
        struct(col("id_a").as("src"), col("id_b").as("dst")),
        struct(col("id_b").as("src"), col("id_a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))

  /** [[clusterAssign]] over an already-materialized edge frame (the
    * iteration loop re-reads it once per iteration, so it must be a
    * checkpoint/cache, not a live plan).
    */
  private def clusterAssignEdges(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val spark = edges.sparkSession
    // NOT checkpointed: the init label set is consumed exactly once (the
    // first iteration's join computes the distinct as part of that job) —
    // a barrier here was one more sequential job in a loop whose cost IS
    // job latency; from iteration 1 on, `labels` is the checkpointed
    // `updated` frame
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("cluster_rep", col("id"))
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      // candidate label for dst = min label among its neighbors ∪ itself
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("id", "src"), Seq("src"))
        .groupBy(col("dst").as("id"))
        .agg(min(col("cluster_rep")).as("neighbor_min"))
      // checkpoint the joined frame ONCE, and ride the convergence count
      // on an Observation DELIVERED BY that checkpoint — recounting the
      // checkpointed frame was one extra job per iteration, and
      // re-deriving the join two (2-3x the barriers in a loop that is
      // pure fixed cost); 30s-timeout fallback to the explicit count if
      // a runtime ever stops reporting observed metrics
      val obs = new org.apache.spark.sql.Observation()
      val updated = labels.join(viaNeighbors, Seq("id"), "left")
        .select(col("id"),
          least(col("cluster_rep"), coalesce(col("neighbor_min"), col("cluster_rep")))
            .as("new_rep"),
          col("cluster_rep"))
        .observe(obs, sum(when(col("new_rep") =!= col("cluster_rep"), 1L)
          .otherwise(0L)).as("changed"))
        .localCheckpoint(true)
      // the checkpoint above has COMPLETED, so a timeout here means the
      // runtime doesn't report observed metrics at all — latch (via the
      // shared helper) so an N-iteration propagation stalls once, not N
      // times
      changed = graft.ObservedMetrics.longField(obs, "changed") {
        updated.filter(col("new_rep") =!= col("cluster_rep")).count()
      }
      labels = updated.select(col("id"), col("new_rep").as("cluster_rep"))
      iter += 1
    }
    if (changed > 0)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"clusterAssign: label propagation NOT converged after $maxIter " +
          s"iterations ($changed labels still changing) — some near-dup " +
          "chains longer than maxIter keep multiple representatives; " +
          "raise maxIter for adversarially deep pair graphs")
    labels
  }

  /** Keep one representative row per near-dup cluster: docs named in
    * `pairs` survive only if they are their cluster's smallest id; docs in
    * no pair survive unchanged.
    *
    * Near-dup-FREE inputs are the common case on clean data (a fresh
    * unique micro-batch folds in with zero candidate pairs), and the label
    * propagation + anti-join machinery still costs ~6 job launches over 0
    * pairs — so an empty edge set short-circuits to `df` unchanged. The
    * emptiness probe rides the edges checkpoint's own observation: one
    * job serves probe + propagation input, and `pairs` may be a lazy
    * verify pipeline (it evaluates exactly once, inside that job).
    */
  def keepClusterRepresentatives(df: DataFrame, pairs: DataFrame,
      idCol: String): DataFrame = {
    // ONE eager job: the edges checkpoint carries a row-count observation,
    // so the empty-pairs probe and the cluster machinery share the same
    // materialization (the former separate isEmpty job is gone) — and a
    // LAZY `pairs` pipeline (curateDeltaWithBase hands the un-checkpointed
    // verify frame straight in) evaluates exactly once, here
    val obs = new org.apache.spark.sql.Observation()
    val edges = edgesOf(pairs)
      .observe(obs, count(lit(1)).as("rows"))
      .localCheckpoint(true)
    val rows = graft.ObservedMetrics.longField(obs, "rows") { edges.count() }
    if (rows == 0L) return df
    val losers = clusterAssignEdges(edges)
      .filter(col("id") =!= col("cluster_rep"))
      .select(col("id").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** Embedding-cosine near-duplicate pairs — the 100 TB path: RHP-LSH
    * bucketing generates candidates (band join carries (t, sig, id) only),
    * exact cosine verifies at `minCosine`. Identical/near-identical vectors
    * collide in every table, so recall at high thresholds is ~1. Compose
    * with [[clusterAssign]] / [[keepClusterRepresentatives]] to collapse
    * the pair graph into surviving documents.
    */
  def embeddingNearDupPairs(
      corpus: DataFrame,
      minCosine: Double = 0.95,
      bits: Int = 8,
      tables: Int = 6,
      dim: Int = 64,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      seed: Long = 42L): DataFrame =
    Ann.lshCandidatePairs(corpus, bits, tables, dim, minCosine, idCol, vecCol, seed)

  /** Corpus-wide paragraph-level exact dedup (CCNet/FineWeb line dedup):
    * split every document on `sep`, keep each distinct line only at its
    * FIRST occurrence over the whole corpus (ordered by (idCol, position) —
    * document order, so the winner is deterministic), and reassemble the
    * surviving lines back into documents. Within-document repeated lines
    * dedup too (the boilerplate case: nav bars, footers, cookie banners
    * repeated across a crawl). Documents whose every line loses disappear
    * from the output — an exact copy of an earlier doc contributes nothing.
    *
    * Output: (idCol, textCol, n_lines_kept).
    *
    * Scale shape — two exchanges, no joins:
    *  1. hash exchange on the line content for the keep-first window. The
    *     `row_number <= 1` filter triggers Spark's rank-limit pushdown, so
    *     a WindowGroupLimit(Partial) prunes every map partition to one
    *     candidate per line BEFORE the shuffle — the 10^9-occurrence
    *     boilerplate line ships ≤ one row per input partition, never a
    *     hot reducer (same mechanism as [[Curation.capPerSource]]).
    *  2. hash exchange on idCol for the reassembly aggregation.
    * Lines shorter than `minLineChars` bypass dedup entirely (kept
    * verbatim) — the CCNet guard against deleting every blank line or
    * "###" separator corpus-wide; the bypass branch never enters the
    * window shuffle, preserving the group-limit pushdown on the long side.
    *
    * NOTE: with `minLineChars > 0` the line table feeds two branches, so
    * the INPUT plan evaluates twice per action — persist/checkpoint a
    * derived input (e.g. curation output) before calling. The default
    * `minLineChars = 0` path folds the empty bypass to a LocalRelation
    * and scans once.
    */
  def paragraphDedup(df: DataFrame, textCol: String, idCol: String,
      sep: String = "\n", minLineChars: Int = 0): DataFrame = {
    val lines = df.select(col(idCol),
      posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
        .as(Seq("__idx", "__line")))
    val (eligible, bypass) =
      if (minLineChars > 0)
        (lines.filter(length(col("__line")) >= minLineChars),
          lines.filter(length(col("__line")) < minLineChars))
      else (lines, lines.limit(0))
    val w = Window.partitionBy(col("__line")).orderBy(col(idCol), col("__idx"))
    val kept = eligible
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= 1)
      .drop("__rn")
      .unionByName(bypass)
    kept
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("__idx"), col("__line")))).as("__o"),
        count(lit(1)).cast("int").as("n_lines_kept"))
      .select(col(idCol),
        array_join(transform(col("__o"), x => x.getField("__line")), sep).as(textCol),
        col("n_lines_kept"))
  }

  /** Corpus-wide exact-substring dedup at word-k-gram granularity (the
    * ExactSubstr operator of Lee et al. 2021, "Deduplicating Training Data
    * Makes Language Models Better" — arXiv:2107.06499 — re-expressed
    * declaratively instead of via a suffix array): any k-word span whose
    * exact text occurs more than once in the corpus is removed at every
    * occurrence EXCEPT the first (ordered by (idCol, position) — document
    * order, deterministic). Overlapping duplicated k-grams union into one
    * removed region, so a repeated passage of length L ≥ k is excised as a
    * whole at its non-first occurrences; within-document repetition dedups
    * the same way. Documents are re-assembled from surviving words —
    * whitespace normalizes to single spaces (word-level operator), empty
    * and fully-covered documents vanish.
    *
    * Output: (idCol, textCol, n_words_kept).
    *
    * Scale shape — window-free, every stage linear in corpus tokens:
    *  1. k-grams build array-locally as md5 keys in one rolling pass
    *     ([[gramMd5sUdf]] — bit-equal to the former zip_with ngram build +
    *     md5 projection, spec-pinned), so the gram exchange carries
    *     (id, pos, hash) — never k-word strings.
    *  2. the winner per repeated gram is a map-side-combining
    *     min(struct(id, pos)) aggregation filtered to count ≥ 2 — a
    *     10^9-occurrence boilerplate gram partial-aggregates to one row per
    *     map partition, never a hot reducer (no rn>1 window, which has no
    *     group-limit pushdown on the loser side).
    *  3. occurrences join winners on the gram hash to identify losers; the
    *     hot gram IS skewed here by nature (its losers are real rows that
    *     must be enumerated), and the winner side is one row per gram —
    *     exactly the shape AQE skew-join splits.
    *  4. loser spans explode to covered positions (k rows per loser, loser
    *     volume only) and anti-join the exploded word stream on the UNIQUE
    *     key (id, position) — skew-impossible — then one groupBy(id)
    *     reassembles. The explode mirrors [[Tokenize.encode]]'s accepted
    *     corpus shape.
    *
    * EAGER (the [[minhashLshPairs]] pattern): the gram table feeds both the
    * winner aggregation and the loser join — uncached, the input plan would
    * evaluate 3× per action (fatal when the input is a derived pipeline,
    * e.g. curation output; 3 scans even off parquet). With `eager = true`
    * grams persist across the two consumers, the loser set (dup volume
    * only — small) materializes via localCheckpoint, and the cache is
    * released before returning; the input then evaluates exactly twice
    * (gram build + word reassembly). `eager = false` returns the fully
    * live plan for audits/composition.
    */
  /** md5 hex of every word k-gram in one pass: out(i) =
    * md5(ws(i) + " " + ... + ws(i+k-1)), lowercase 32-hex — bit-identical
    * to `transform(wordNgrams(ws, k), g => md5(g))` (FunctionsSpec pins
    * the equivalence) at ~10x less per-row cost: the zip_with-chained
    * ngram build runs k-1 interpreted lambda passes over the array and
    * then a per-element md5 expression, where this loop reuses one
    * rolling StringBuilder and a per-thread digest. Empty below k words,
    * exactly like wordNgrams.
    */
  private val Md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val HexChars = "0123456789abcdef".toCharArray
  private[graft] def gramMd5sUdf(k: Int) = udf((ws: Seq[String]) => {
    if (ws == null || ws.length < k) Array.empty[String]
    else {
      val words = ws.toArray
      val n = words.length - k + 1
      val out = new scala.collection.mutable.ArrayBuffer[String](n)
      val md = Md5Local.get()
      val sb = new java.lang.StringBuilder(k * 12)
      var i = 0
      while (i < n) {
        sb.setLength(0)
        var ok = true
        var j = 0
        while (j < k && ok) {
          val w = words(i + j)
          // a null word nulls every gram touching it in the reference
          // concat chain — drop those windows, like wordNgramsUdf
          if (w == null) ok = false
          else {
            if (j > 0) sb.append(' ')
            sb.append(w)
          }
          j += 1
        }
        if (ok) {
          val d = md.digest(
            sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          val hx = new Array[Char](32)
          var b = 0
          while (b < 16) {
            val v = d(b) & 0xff
            hx(b * 2) = HexChars(v >>> 4)
            hx(b * 2 + 1) = HexChars(v & 0xf)
            b += 1
          }
          out += new String(hx)
        }
        i += 1
      }
      out.toArray
    }
  })

  def spanDedup(df: DataFrame, textCol: String, idCol: String,
      k: Int = 8, eager: Boolean = true): DataFrame = {
    require(k >= 2, s"spanDedup needs k >= 2 (got $k)")
    val words = df
      .select(col(idCol),
        filter(split(col(textCol), "\\s+"), w => length(w) > 0).as("__ws"))
      .filter(size(col("__ws")) > 0)
    val gramsBase = words
      .select(col(idCol),
        posexplode(gramMd5sUdf(k)(col("__ws"))).as(Seq("__pos", "__gh")))
    val grams = if (eager) gramsBase.persist() else gramsBase
    val winners = grams
      .groupBy(col("__gh"))
      .agg(min(struct(col(idCol), col("__pos"))).as("__win"),
        count(lit(1)).as("__n"))
      .filter(col("__n") >= 2)
      .select(col("__gh"), col("__win"))
    val losersPlan = grams
      .join(winners, "__gh")
      .filter(struct(col(idCol), col("__pos")) =!= col("__win"))
      .select(col(idCol), col("__pos"))
    val losers =
      if (eager) {
        val l = losersPlan.localCheckpoint(true)
        grams.unpersist()
        l
      } else losersPlan
    // NOT distinct'd: overlapping loser spans cover positions repeatedly,
    // but the consumer is a LEFT ANTI join — duplicate build rows change
    // nothing, and the distinct cost a full extra exchange of the covered
    // set (≤ k× loser volume, loser-sized either way)
    val covered = losers
      .select(col(idCol).as("__cid"),
        explode(sequence(col("__pos"), col("__pos") + lit(k - 1))).as("__cp"))
    val wordRows = words
      .select(col(idCol), posexplode(col("__ws")).as(Seq("__wp", "__word")))
    wordRows
      .join(covered,
        col(idCol) === col("__cid") && col("__wp") === col("__cp"),
        "left_anti")
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("__wp"), col("__word")))).as("__o"),
        count(lit(1)).cast("int").as("n_words_kept"))
      .select(col(idCol),
        array_join(transform(col("__o"), x => x.getField("__word")), " ").as(textCol),
        col("n_words_kept"))
  }

  /** Exact n-gram (character) Jaccard similarity — an ALL-PAIRS cartesian
    * product, usable only as the small-scale oracle twin of the LSH
    * operators (ground truth for recall checks). To make misuse at scale
    * impossible the operator REFUSES inputs above `maxRows` (the one
    * up-front count is cheap at any legal size); use minhashLshPairs for
    * real dedup.
    */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
      n: Int = 3, threshold: Double = 0.4, maxRows: Long = 10000L): DataFrame = {
    val rows = df.count()
    require(rows <= maxRows,
      s"ngramJaccardPairs is an all-pairs oracle op capped at $maxRows rows " +
        s"(got $rows); use minhashLshPairs for dedup at scale")
    // lower(text) projected to an attribute first: a lambda-captured
    // expression is re-evaluated per array element (see CharLm.charNgrams)
    val withGrams = df
      .select(col(idCol).as("id"), lower(col(textCol)).as("__t"))
      .select(col("id"), array_distinct(CharLm.charNgrams(col("__t"), n)).as("grams"))
    val l = withGrams.select(col("id").as("id_a"), col("grams").as("g_a"))
    val r = withGrams.select(col("id").as("id_b"), col("grams").as("g_b"))
    l.crossJoin(r)
      .filter(col("id_a") < col("id_b"))
      .withColumn("jaccard",
        size(array_intersect(col("g_a"), col("g_b"))).cast("double") /
          size(array_union(col("g_a"), col("g_b"))))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }
}
