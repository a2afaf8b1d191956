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
  *  - the node count N is ONE bounded scalar job at build time (a value
  *    that never changes; a per-iteration 1-row frame costs a crossJoin +
  *    its own AQE stage each iteration), and the per-iteration dangling
  *    mass rides the previous iteration's checkpoint as an Observation
  *    (the repo's free-rider pattern) injected as a literal — the only
  *    per-iteration driver traffic is that one observed double.
  *  - every iteration materializes (localCheckpoint): iteration i+1 reads
  *    iteration i THREE times (dangling mass, inflow join, carry-through
  *    select), so a lazy chain recomputes each earlier iteration ~3^k
  *    times — measured 76s for what is ~4s checkpointed at 4M edges —
  *    and the plan itself grows superlinearly (the classic
  *    iterative-DataFrame trap). A power iteration is an inherent
  *    barrier anyway: one truncating job per iteration is the honest
  *    per-iteration cost, O(nodes) memory writes.
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
      // false returns the LAST iteration as a lazy plan (its inputs are
      // still checkpointed) — for callers composing the ranks into a
      // larger query that materializes once, and for plan audits
      truncateFinal: Boolean = true): DataFrame =
    pageRankCore(edges, iters, damping, srcCol, dstCol, truncateFinal, None)

  /** WARM-START power iterations: seed rank_0 from a previous run's
    * (node, rank) instead of uniform — the incremental-rank path for a
    * maintained graph ([[GraphIndex.hostRankIndexed]]): after a daily
    * delta perturbs the graph, yesterday's ranks are already near the new
    * fixed point, so a couple of iterations recover the accuracy a cold
    * start needs many for (spec-pinned: closer to the deep-iteration
    * reference than a cold start at equal iters, and a fixed point stays
    * fixed). Seeding: known nodes take their previous rank, NEW nodes take
    * 1/N, and the vector renormalizes to unit mass (one bounded node-sized
    * scalar job) — the fixed point itself is init-independent, so this
    * only moves the starting distance. `init` must be unique per node
    * (any pageRank output is); null ranks read as missing.
    */
  def pageRankWarm(
      edges: DataFrame,
      init: DataFrame,
      iters: Int = 3,
      damping: Double = 0.85,
      srcCol: String = "src",
      dstCol: String = "dst",
      truncateFinal: Boolean = true): DataFrame =
    pageRankCore(edges, iters, damping, srcCol, dstCol, truncateFinal,
      Some(init))

  private def pageRankCore(
      edges: DataFrame,
      iters: Int,
      damping: Double,
      srcCol: String,
      dstCol: String,
      truncateFinal: Boolean,
      init: Option[DataFrame]): DataFrame = {
    require(iters >= 0, s"iters must be >= 0: $iters")
    val spark = edges.sparkSession

    // distinct edges, hash-partitioned on src and sorted ONCE, cached: the
    // cached relation's outputPartitioning/ordering satisfy the
    // per-iteration sort-merge join's requirements, so the (corpus-sized)
    // edge table never re-shuffles or re-sorts — only the node-sized rank
    // frame moves each iteration. The merge hint at the join site matters:
    // left to its stats Spark BROADCASTS the edge cache instead (measured:
    // a 92 MiB single-threaded driver broadcast PER ITERATION at 4M edges
    // — the web graph shipped through the driver iters times).
    //
    // ONE exchange, not two: dedup and src-partitioning fuse by
    // aggregating the (map-side-combined) distinct dst set per src and
    // exploding it back — explode preserves the agg's hashpartitioning(src),
    // where `.distinct().repartition(src)` shuffled the edge table twice
    // (once on (src, dst), once on src). Per-src dst sets are bounded by a
    // page/host's out-degree (the production unit is the HOST graph,
    // hostEdgesOf) — ≤ distinct linked hosts, not corpus-sized.
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .groupBy(col("src")).agg(collect_set(col("dst")).as("__ds"))
      .select(col("src"), explode(col("__ds")).as("dst"))
      .sortWithinPartitions("src")
      .cache()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().cache()
    // out-degree per linking node; nodes absent here are dangling
    val outDeg = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("out_deg")).cache()
    // N: one bounded scalar job (also materializes the nodes cache) — a
    // per-iteration 1-row N frame costs a crossJoin + its own AQE stage
    // every iteration for a value that never changes
    val n = nodes.count()
    if (n == 0L) {
      val out = nodes.select(col("node"), lit(0.0).as("rank"))
      e.unpersist(); nodes.unpersist(); outDeg.unpersist()
      return out
    }
    val nD = n.toDouble

    // the dangling mass each iteration needs is a FREE RIDER on the
    // previous iteration's checkpoint job (the repo's observation-ride
    // pattern): sum(rank where dangling) is observed while the checkpoint
    // materializes and injected into the next plan as a literal — the
    // per-iteration dangling aggregation + broadcast stages disappear.
    // Attached only when a next iteration will READ it (i < iters): an
    // observation on a never-materialized plan leaks its listener.
    def withDm(df: DataFrame, wantDm: Boolean)
        : (DataFrame, Option[org.apache.spark.sql.Observation]) =
      if (!wantDm) (df, None)
      else {
        val o = new org.apache.spark.sql.Observation()
        (df.observe(o,
          sum(when(col("out_deg").isNull, col("rank"))).as("dm")), Some(o))
      }

    // rank_0 = 1/N (cold) or the normalized warm seed, with out_deg joined
    // on once (left: dangling keep null)
    val seeded = init match {
      case None => nodes.select(col("node"), lit(1.0 / nD).as("rank"))
      case Some(prev) =>
        val p = prev.select(col("node"), col("rank").cast("double").as("__r0"))
        // node-sized; truncated HERE so the caller's (arbitrary, lazy)
        // seed plan and this join run ONCE — the mass scalar below and
        // the r0 checkpoint both read the truncated frame
        val raw = nodes.join(p, Seq("node"), "left")
          .select(col("node"),
            coalesce(col("__r0"), lit(1.0 / nD)).as("rank"))
          .localCheckpoint(true)
        // renormalize to unit mass — one bounded node-sized scalar job
        // (the same cost class as the nodes.count() above); a degenerate
        // seed (all zero/NaN) fails loudly rather than ranking garbage
        val s = raw.agg(sum(col("rank"))).head.getDouble(0)
        require(!s.isNaN && !s.isInfinite && s > 0.0,
          s"pageRankWarm: seed mass must be positive and finite, got $s")
        raw.select(col("node"), (col("rank") / lit(s)).as("rank"))
    }
    val (r0, o0) = withDm(seeded.join(outDeg, Seq("node"), "left"),
      wantDm = iters >= 1)
    // materialize EVERY iteration (see the object Scaladoc: three
    // downstream readers per iteration make a lazy chain recompute
    // upstream iterations exponentially); the final frame may stay lazy
    // on request — its inputs are already truncated
    var ranks =
      if (iters >= 1 || truncateFinal) r0.localCheckpoint(true) else r0
    var obs = o0
    // call-local observation latch: the await runs AFTER the checkpoint
    // completed, so a timeout means this runtime isn't delivering observed
    // metrics for checkpoint actions — without the latch every remaining
    // iteration would stall the full timeout while the <1s fallback job
    // sits ready. Local (not the ObservedMetrics process-wide latch) so a
    // one-off listener-bus stall doesn't disable the ride for the rest of
    // the process.
    var obsLive = true

    for (i <- 1 to iters) {
      val prev = ranks
      def dmFallback: Double = {
        val v = prev.agg(
          sum(when(col("out_deg").isNull, col("rank")))).head.get(0)
        if (v == null) 0.0 else v.asInstanceOf[Number].doubleValue()
      }
      val dangling =
        if (!obsLive || obs.isEmpty) dmFallback
        else graft.ObservedMetrics.doubleField(obs.get, "dm",
          latchOnTimeout = false) { obsLive = false; dmFallback }
      // inflow per node: sum over in-edges of rank(src)/out_deg(src)
      val contribs = ranks.filter(col("out_deg").isNotNull)
        .join(e.hint("merge"), ranks("node") === e("src"))
        .select(col("dst").as("node"),
          (col("rank") / col("out_deg").cast("double")).as("w"))
        .groupBy("node").agg(sum(col("w")).as("inflow"))
      val next = ranks.select(col("node"), col("out_deg"))
        .join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit((1.0 - damping) / nD) +
            lit(damping) * (coalesce(col("inflow"), lit(0.0)) +
              lit(dangling / nD))).as("rank"),
          col("out_deg"))
      val (nx, no) = withDm(next, wantDm = i < iters && obsLive)
      ranks =
        if (i < iters || truncateFinal) nx.localCheckpoint(true)
        else nx
      obs = no
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
    pageRank(hostEdgesOf(urlEdges, srcCol, dstCol), iters, damping).select(
      col("node").as("host"), col("rank"))
  }

  /** Collapse url-level edges to HOST edges — THE host-graph derivation,
    * shared by [[hostRank]] and [[GraphIndex.hostEdgeIndexInit]] so the
    * maintained graph and the batch graph cannot drift.
    *
    * MUST be Urls.host semantics (via its declarative twin — codegen'd,
    * no UDF): the frontier's host column is Urls.host of the canonical
    * url (FrontierRound.scala:113), and prioritize joins on it — a
    * case/port/userinfo-keeping derivation here would silently never
    * match ("Example.com:8443" vs "example.com") and split one host's
    * rank mass across several graph nodes. Unparseable urls ("" host)
    * drop: they are not crawlable hosts and "" would aggregate them all
    * into one bogus mega-node. Self-loops (intra-host links) drop.
    */
  def hostEdgesOf(urlEdges: DataFrame, srcCol: String = "src_url",
      dstCol: String = "dst_url"): DataFrame = {
    val hostOf = (c: String) => graft.url.Urls.hostColumn(col(c))
    urlEdges
      .select(hostOf(srcCol).as("src"), hostOf(dstCol).as("dst"))
      .filter(col("src") =!= col("dst") &&
        col("src") =!= lit("") && col("dst") =!= lit(""))
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
