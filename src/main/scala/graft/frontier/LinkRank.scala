package graft.frontier

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Link-graph PageRank for frontier prioritization — a beyond-reference
  * crawl operator: the reference schedules purely by discovery order +
  * politeness (/root/reference/src/handler.py:444-497 drains a FIFO of
  * listing pages), which at a 10^10-URL frontier starves high-value hubs
  * behind long spam tails. Ranking the HOST graph (hosts are the natural
  * politeness/priority unit — FrontierRound.schedule budgets per host) and
  * feeding the score into FrontierEntry.priority makes the scheduler
  * crawl-important-first at no extra per-round cost.
  *
  * Spark-first shape (fixed-iteration power method, all declarative):
  *  - nodes/out-degrees/edges are computed ONCE and cached; every
  *    iteration is a shuffle-on-`src` join (ranks ⋈ edges) plus a
  *    shuffle-on-`dst` aggregation — the two unavoidable exchanges of
  *    distributed PageRank. Edge/rank frames are hash-partitioned on the
  *    join key so AQE reuses the layout across iterations.
  *  - dangling mass (nodes with no out-edges) and the node count N ride
  *    the plan as broadcast one-row frames (crossJoin(broadcast(...))) —
  *    no per-iteration driver collect; the whole computation stays lazy
  *    until the caller materializes it.
  *  - lineage is truncated every `checkpointInterval` iterations
  *    (localCheckpoint): an iterative plan otherwise doubles per round and
  *    the analyzer/optimizer cost grows superlinearly (the classic
  *    iterative-DataFrame trap; at 50 iterations an untruncated plan is
  *    minutes of driver time before the first task).
  *
  * Determinism: with fixed `iters` the result is a pure function of the
  * graph — each iteration is one grouped double sum, reproducible across
  * engines to ~1e-15, far inside the round-6 gate tolerance.
  */
object LinkRank {

  /** Fixed-iteration PageRank over an edge list.
    *
    * @param edges    (srcCol, dstCol) pairs; duplicates collapse (a link
    *                 appearing twice contributes once, the web convention)
    * @param iters    power-method iterations (fixed, not convergence-tested
    *                 — keeps the result engine-portable and the job count
    *                 bounded by design)
    * @param damping  teleport factor d: rank = (1-d)/N + d·(inflow +
    *                 dangling/N)
    * @return (node, rank) — ranks sum to 1 up to float noise
    */
  def pageRank(
      edges: DataFrame,
      iters: Int = 3,
      damping: Double = 0.85,
      srcCol: String = "src",
      dstCol: String = "dst",
      checkpointInterval: Int = 5,
      // false returns the last iteration as a LAZY plan (no eager final
      // checkpoint) — for callers composing the ranks into a larger query
      // that materializes once, and for plan audits
      truncateFinal: Boolean = true): DataFrame = {
    require(iters >= 0, s"iters must be >= 0: $iters")
    val spark = edges.sparkSession

    // distinct edges, computed once; both per-iteration exchanges key on
    // this frame's columns. cache() not localCheckpoint: the frame is read
    // 2·iters times but its lineage is one scan + one exchange.
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().cache()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().cache()
    // out-degree per linking node; nodes absent here are dangling
    val outDeg = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("out_deg")).cache()
    // N as a broadcast one-row frame — no driver-side count job
    val nRow = broadcast(nodes.agg(count(lit(1)).as("n")))

    // rank_0 = 1/N, with out_deg joined on once (left: dangling keep null)
    var ranks = nodes.crossJoin(nRow)
      .select(col("node"), (lit(1.0) / col("n").cast("double")).as("rank"))
      .join(outDeg, Seq("node"), "left")
      .localCheckpoint(true) // also materializes the three caches above

    for (i <- 1 to iters) {
      // inflow per node: sum over in-edges of rank(src)/out_deg(src)
      val contribs = ranks.filter(col("out_deg").isNotNull)
        .join(e, ranks("node") === e("src"))
        .select(col("dst").as("node"),
          (col("rank") / col("out_deg").cast("double")).as("w"))
        .groupBy("node").agg(sum(col("w")).as("inflow"))
      // dangling mass this iteration, as a broadcast scalar frame.
      // coalesce: an empty aggregation (no dangling nodes) yields NULL sum
      val dangling = broadcast(ranks.filter(col("out_deg").isNull)
        .agg(coalesce(sum(col("rank")), lit(0.0)).as("dangling")))
      val next = ranks.select(col("node"), col("out_deg"))
        .join(contribs, Seq("node"), "left")
        .crossJoin(nRow).crossJoin(dangling)
        .select(col("node"),
          (lit(1.0 - damping) / col("n").cast("double") +
            lit(damping) * (coalesce(col("inflow"), lit(0.0)) +
              col("dangling") / col("n").cast("double"))).as("rank"),
          col("out_deg"))
      // truncate lineage periodically and (by default) at the end — the
      // returned frame must not carry an iters-deep plan into the caller's
      // query
      ranks =
        if (i % math.max(checkpointInterval, 1) == 0 ||
            (i == iters && truncateFinal))
          next.localCheckpoint(true)
        else next
    }
    val out = ranks.select(col("node"), col("rank"))
    // with a lazy tail (truncateFinal = false) the returned plan still
    // reads the edge/degree caches — they stay pinned for the caller's
    // materialization (blocks evict LRU; an explicit release would force
    // a full recompute of every un-truncated iteration)
    if (truncateFinal) { e.unpersist(); nodes.unpersist(); outDeg.unpersist() }
    out
  }

  /** PageRank over the HOST graph of url-level edges: urls collapse to
    * their hosts, self-loops (intra-host links) drop, and the host scores
    * come back as (host, rank) — the frontier-priority signal
    * (FrontierEntry.priority is per-url; hosts are where crawl value
    * concentrates and what the politeness scheduler budgets).
    */
  def hostRank(
      urlEdges: DataFrame,
      iters: Int = 3,
      damping: Double = 0.85,
      srcCol: String = "src_url",
      dstCol: String = "dst_url"): DataFrame = {
    val hostOf = (c: String) => regexp_extract(col(c), "://([^/?#]+)", 1)
    val hostEdges = urlEdges
      .select(hostOf(srcCol).as("src"), hostOf(dstCol).as("dst"))
      .filter(col("src") =!= col("dst"))
    pageRank(hostEdges, iters, damping).select(
      col("node").as("host"), col("rank"))
  }

  /** Re-prioritize a frontier by host rank: priority becomes the host's
    * NEGATED rank (FrontierRound.schedule orders priority ASCENDING —
    * reference semantics, lower = sooner), unknown hosts keep their
    * current priority. One broadcast-able join — the rank table is
    * host-cardinality, tiny next to the frontier.
    */
  def prioritize(frontier: DataFrame, hostRanks: DataFrame): DataFrame = {
    val ranked = hostRanks.select(col("host"), col("rank").as("__hr"))
    frontier.join(broadcast(ranked), Seq("host"), "left")
      .withColumn("priority",
        when(col("__hr").isNotNull, -col("__hr")).otherwise(col("priority")))
      // the equi-join hoists the key column to the front — restore the
      // caller's order so the frame stays schedule()-shape-compatible
      .select(frontier.columns.map(col).toIndexedSeq: _*)
  }
}
