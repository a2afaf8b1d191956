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
  * Algorithm: POINTER DOUBLING (path halving), the classic parallel
  * technique — iteration k advances every chain up to 2^k hops by joining
  * the current mapping with itself (m' (u) = m(m(u))), so a `rounds = r`
  * call bounds chains at 2^r hops in r shuffle joins instead of 2^r
  * sequential self-joins. Each iteration localCheckpoints (the iterative-
  * DataFrame lineage trap, same as LinkRank/clusterAssign). Chains still
  * pointing at a redirecting url after the budget — true cycles included
  * (a cycle never terminates, so its hop count saturates at exactly 2^r,
  * deterministically) — come back `resolved = false` with a null final.
  *
  * Determinism: a src observed with MULTIPLE locations (re-crawl saw a
  * changed redirect) collapses to min(location) so the resolution is a
  * pure function of the input multiset; engines agree row-exactly.
  */
object Redirects {

  /** @return (url, final_url, hops, resolved) — final_url null and hops
    *         = 2^rounds when unresolved (cycle or chain longer than the
    *         budget); hops = true chain length otherwise.
    */
  def resolve(redirects: DataFrame, rounds: Int = 4,
      srcCol: String = "src_url", dstCol: String = "location"): DataFrame = {
    require(rounds >= 0 && rounds <= 20, s"rounds out of range: $rounds")
    // deterministic collapse + drop null/self-noise is NOT dropped:
    // self-loops are cycles and must resolve as such
    val edges = redirects
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull)
      .groupBy(col(srcCol).as("src"))
      .agg(min(col(dstCol)).as("dst"))
      .localCheckpoint(true)

    var m = edges.select(col("src").as("url"), col("dst").as("cur"),
      lit(1L).as("hops"))
    for (_ <- 1 to rounds) {
      m = m.localCheckpoint(true)
      val jumped = m.as("a").join(
        m.select(col("url").as("b_src"), col("cur").as("b_cur"),
          col("hops").as("b_hops")).as("b"),
        col("a.cur") === col("b_src"), "left")
      m = jumped.select(col("a.url").as("url"),
        coalesce(col("b_cur"), col("a.cur")).as("cur"),
        (col("a.hops") + coalesce(col("b_hops"), lit(0L))).as("hops"))
    }
    // terminal ⇔ the cursor is not itself a redirecting url
    m.join(edges.select(col("src").as("t_src")), col("cur") === col("t_src"),
        "left")
      .select(col("url"),
        when(col("t_src").isNull, col("cur")).as("final_url"),
        col("hops"),
        col("t_src").isNull.as("resolved"))
  }
}
