package graft.frontier

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Redirect-chain resolution over observed (url → Location) pairs — the
  * 3xx bookkeeping a crawl accumulates (the reference follows redirects
  * inline per-request via its HTTP client and keeps no map; at frontier
  * scale the redirect graph is data, and the seen-set/dedup layers need
  * every url's FINAL target: a chain crawled from two entry points must
  * collapse to one page).
  *
  * Algorithm: POINTER DOUBLING (path halving) with a DONE/ACTIVE split.
  * Iteration k advances every still-active chain up to 2^k hops by
  * joining it against the full current mapping (m′(u) = m(m(u))), so
  * `rounds = r` bounds chains at 2^r hops in r shuffle joins instead of
  * 2^r sequential self-joins. A row whose jump lands on a terminal —
  * either no mapping entry for its cursor, or an entry already resolved
  * (done rows carry their FINAL target, so resolution propagates in one
  * hop) — retires into a done set and never ships through a join again:
  * on real redirect data (chains are overwhelmingly 1-2 hops) the active
  * side collapses geometrically after the first iteration. The done side
  * still serves as join TARGETS (frozen rows in the b-side union — no
  * recompute; each part is checkpointed once), but once the active
  * frontier fits the broadcast gate its distinct cursor set semi-filters
  * the union MAP-SIDE, so the join shuffles only probe-able rows — BOTH
  * join sides then track the unresolved frontier, not the map (above the
  * gate the plan degrades to the always-correct full-map shuffle). An
  * all-retired frontier exits the loop early: remaining rounds and the
  * terminal check are skipped outright.
  * Each iteration's join materializes once (localCheckpoint) and feeds
  * both the retire and continue filters — the two-reader lineage trap.
  *
  * Chains still pointing at a redirecting url after the budget — true
  * cycles included (a cycle never terminates, so its hop count saturates
  * at exactly 2^r, deterministically) — come back `resolved = false`
  * with a null final.
  *
  * Determinism: a src observed with MULTIPLE locations (re-crawl saw a
  * changed redirect) collapses to min(location) so the resolution is a
  * pure function of the input multiset; engines agree row-exactly.
  */
object Redirects {

  /** @return (url, final_url, hops, resolved) — final_url null and hops
    *         = 2^rounds when unresolved (cycle or chain longer than the
    *         budget); hops = true chain length otherwise.
    *
    * @param maxBroadcastCursors when the active frontier is at or under
    *        this many rows, its distinct cursor set broadcasts and
    *        SEMI-FILTERS the b-side union map-side — the full map then
    *        never re-ships through the join shuffle once most rows have
    *        retired (the realistic regime after iteration 1). Above the
    *        bound the plan degrades to the always-correct full-map
    *        shuffle. 0 disables.
    */
  def resolve(redirects: DataFrame, rounds: Int = 4,
      srcCol: String = "src_url", dstCol: String = "location",
      maxBroadcastCursors: Long = 100000L): DataFrame = {
    require(rounds >= 0 && rounds <= 20, s"rounds out of range: $rounds")
    // deterministic collapse; null src/dst are noise, but self-loops are
    // NOT dropped — they are cycles and must resolve as such
    val edges = redirects
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull)
      .groupBy(col(srcCol).as("src"))
      .agg(min(col(dstCol)).as("dst"))
      .localCheckpoint(true)

    var active = edges.select(col("src").as("url"), col("dst").as("cur"),
      lit(1L).as("hops"))
    // invariant: every done row's cur IS its terminal (base case: the
    // cursor had no mapping entry; inductive: it copied a done row's cur)
    val doneParts = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var exhausted = false
    for (_ <- 1 to rounds if !exhausted) {
      active = active.localCheckpoint(true)
      // counting the pinned frame is one cheap job; it buys the early
      // exit (every row retired ⇒ remaining rounds AND the terminal
      // check are no-ops) and gates the cursor broadcast
      val activeCount = active.count()
      if (activeCount == 0L) exhausted = true
      else {
        val bFull = (doneParts.toSeq.map(_.withColumn("b_done", lit(true)))
            :+ active.withColumn("b_done", lit(false)))
          .reduce(_ unionByName _)
        // only rows some active cursor can probe need to enter the join:
        // semi-filter the union against the broadcast cursor set, so the
        // shuffled build side is active-sized, not map-sized
        val b0 =
          if (maxBroadcastCursors > 0L && activeCount <= maxBroadcastCursors)
            bFull.join(
              broadcast(active.select(col("cur").as("__ac")).distinct()),
              col("url") === col("__ac"), "left_semi")
          else bFull
        val b = b0.select(col("url").as("b_src"), col("cur").as("b_cur"),
          col("hops").as("b_hops"), col("b_done"))
        val j = active.join(b, col("cur") === col("b_src"), "left")
          .select(col("url"),
            coalesce(col("b_cur"), col("cur")).as("cur"),
            (col("hops") + coalesce(col("b_hops"), lit(0L))).as("hops"),
            // retired: the cursor was terminal (no entry) or resolves
            // through an already-done row
            (col("b_src").isNull || col("b_done")).as("retired"))
          .localCheckpoint(true) // one materialization feeds both filters
        doneParts += j.filter(col("retired")).drop("retired")
        active = j.filter(!col("retired")).drop("retired")
      }
    }
    // rows still active after the budget: their cursor may or may not be
    // terminal — one last membership test against the (active-sized,
    // shrunken) remainder decides resolved/unresolved
    val tail = active
      .join(edges.select(col("src").as("t_src")), col("cur") === col("t_src"),
        "left")
      .select(col("url"),
        when(col("t_src").isNull, col("cur")).as("final_url"),
        col("hops"),
        col("t_src").isNull.as("resolved"))
    val done = doneParts.map(_.select(col("url"), col("cur").as("final_url"),
      col("hops"), lit(true).as("resolved")))
    (done :+ tail).reduce(_ unionByName _)
  }
}
