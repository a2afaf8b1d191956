package graft

import graft.frontier.LinkRank
import graft.ops.Sketches
import org.apache.spark.sql.functions._

/** LinkRank (frontier-priority PageRank): parity with a scalar reference
  * implementation on graphs with dangling nodes, mass conservation, host
  * aggregation, and the frontier re-prioritization contract.
  */
class LinkRankSpec extends SparkTestBase {

  import spark.implicits._

  /** Scalar PageRank mirroring LinkRank.pageRank's semantics exactly:
    * distinct edges, rank = (1-d)/N + d·(inflow + dangling/N).
    */
  private def scalarPageRank(edges: Seq[(Long, Long)], iters: Int,
      d: Double): Map[Long, Double] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    val n = nodes.size.toDouble
    val outDeg = e.groupBy(_._1).map { case (s, es) => (s, es.size.toDouble) }
    var rank = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val dangling = nodes.filterNot(outDeg.contains).map(rank).sum
      val inflow = e.groupBy(_._2).map { case (dst, es) =>
        (dst, es.map { case (s, _) => rank(s) / outDeg(s) }.sum)
      }
      rank = nodes.map { nd =>
        nd -> ((1.0 - d) / n + d * (inflow.getOrElse(nd, 0.0) + dangling / n))
      }.toMap
    }
    rank
  }

  /** Deterministic pseudo-random graph: 30 linking nodes, 45 targets —
    * targets 30-44 never link out, so dangling mass is nonzero every
    * iteration. Duplicate edges planted to exercise the distinct.
    */
  private def randomEdges: Seq[(Long, Long)] =
    (0 until 120).map { i =>
      val src = (Sketches.mix(i * 31L) >>> 8) % 30L
      val dst = (Sketches.mix(i * 131L + 7L) >>> 8) % 45L
      (src.abs, dst.abs)
    } ++ Seq((0L, 1L), (0L, 1L)) // duplicates collapse

  test("pageRank matches the scalar reference on a dangling-heavy graph") {
    val expected = scalarPageRank(randomEdges, iters = 4, d = 0.85)
    val got = LinkRank.pageRank(randomEdges.toDF("src", "dst"), iters = 4)
      .collect().map(r => (r.getAs[Long]("node"), r.getAs[Double]("rank"))).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (node, r) =>
      assert(math.abs(r - expected(node)) < 1e-12,
        s"node=$node got=$r expected=${expected(node)}")
    }
    // mass conservation: dangling redistribution keeps sum(rank) == 1
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
  }

  test("pageRank iters=0 is the uniform start; hubs outrank leaves after iterating") {
    // star graph: every leaf links to the hub
    val star = (1L to 9L).map(i => (i, 0L))
    val uniform = LinkRank.pageRank(star.toDF("src", "dst"), iters = 0)
      .collect().map(_.getAs[Double]("rank"))
    assert(uniform.forall(r => math.abs(r - 0.1) < 1e-12))
    val ranked = LinkRank.pageRank(star.toDF("src", "dst"), iters = 3)
      .collect().map(r => (r.getAs[Long]("node"), r.getAs[Double]("rank"))).toMap
    assert((1L to 9L).forall(i => ranked(0L) > ranked(i)), s"hub must dominate: $ranked")
  }

  test("lazy final iteration (truncateFinal=false) changes nothing") {
    val eager = LinkRank.pageRank(randomEdges.toDF("src", "dst"), iters = 5)
      .collect()
      .map(r => (r.getAs[Long]("node"), r.getAs[Double]("rank"))).toMap
    val lazyTail = LinkRank.pageRank(randomEdges.toDF("src", "dst"), iters = 5,
      truncateFinal = false).collect()
      .map(r => (r.getAs[Long]("node"), r.getAs[Double]("rank"))).toMap
    assert(eager.keySet == lazyTail.keySet)
    // semantically identical; exact bit-equality is NOT guaranteed — the
    // inflow sum's shuffle-merge order differs between the checkpointed and
    // lazy materializations, so double addition can differ by ~1 ulp
    // (observed: ...94064 vs ...940639). 1e-12 is ~1e3 ulps of headroom.
    eager.foreach { case (n, r) =>
      assert(math.abs(r - lazyTail(n)) < 1e-12, s"node=$n $r vs ${lazyTail(n)}")
    }
  }

  test("hostRank collapses urls to hosts and drops intra-host self-loops") {
    val urlEdges = Seq(
      ("http://a.com/1", "http://b.com/x"),
      ("http://a.com/2", "http://b.com/y"), // same host edge → one distinct
      ("http://a.com/3", "http://a.com/4"), // self-loop → dropped
      ("http://b.com/x", "http://c.com/")
    ).toDF("src_url", "dst_url")
    val got = LinkRank.hostRank(urlEdges, iters = 2)
      .collect().map(r => (r.getAs[String]("host"), r.getAs[Double]("rank"))).toMap
    val expected = scalarPageRank(Seq((1L, 2L), (2L, 3L)), iters = 2, d = 0.85)
    assert(got.keySet == Set("a.com", "b.com", "c.com"))
    assert(math.abs(got("a.com") - expected(1L)) < 1e-12)
    assert(math.abs(got("b.com") - expected(2L)) < 1e-12)
    assert(math.abs(got("c.com") - expected(3L)) < 1e-12)
  }

  test("prioritize + capped schedule: the ranked hub crawls first") {
    // the full chain link graph → hostRank → prioritize → priority-queue
    // schedule: without a global capacity, host scores never compete
    // (budgets are per-host); with maxUrlsPerRound they decide who
    // fetches THIS round
    import graft.frontier.{FrontierRound, PolitenessConfig, RobotsRules}
    // hub receives every host's link and spreads its own mass over all
    // of them (a single out-edge would funnel the hub's whole rank into
    // one target, making THAT host the top — the classic sink shape)
    val urlEdges = ((1 to 20).map(i => (s"http://s$i.ir/p", "http://hub.ir/home"))
      ++ (1 to 20).map(i => ("http://hub.ir/home", s"http://s$i.ir/p")))
      .toDF("src_url", "dst_url")
    val ranks = LinkRank.hostRank(urlEdges, iters = 2)
    val frontier = Seq(
      ("k1", "http://hub.ir/a", "hub.ir", 0.0, 0, 0),
      ("k2", "http://cold.ir/b", "cold.ir", 0.0, 0, 0),
      ("k3", "http://s1.ir/c", "s1.ir", 0.0, 0, 0)
    ).toDF("url_key", "url", "host", "priority", "attempt", "discovered_round")
    val prioritized = LinkRank.prioritize(frontier, ranks)
      .as[graft.model.FrontierEntry]
    val plan = FrontierRound.schedule(spark, prioritized, RobotsRules.empty,
      PolitenessConfig(maxUrlsPerRound = 1L))
    val got = plan.scheduled.collect()
    assert(got.length == 1)
    assert(got.head.getAs[String]("host") == "hub.ir") // highest in-link mass
    // the cut hosts defer — they re-compete next round, never drop
    assert(plan.deferred.collect().map(_.host).toSet == Set("cold.ir", "s1.ir"))
  }

  test("prioritize rewrites priority to -hostRank, keeping unknown hosts") {
    val frontier = Seq(
      ("k1", "http://a.com/1", "a.com", 5.0),
      ("k2", "http://z.com/1", "z.com", 7.0)
    ).toDF("url_key", "url", "host", "priority")
    val ranks = Seq(("a.com", 0.4)).toDF("host", "rank")
    val got = LinkRank.prioritize(frontier, ranks)
      .collect().map(r => (r.getAs[String]("url_key"), r.getAs[Double]("priority"))).toMap
    assert(got("k1") == -0.4) // ranked host: crawls sooner (ascending order)
    assert(got("k2") == 7.0) // unknown host: untouched
    // schema unchanged — the frame stays schedule()-compatible
    assert(LinkRank.prioritize(frontier, ranks).columns.toSeq ==
      frontier.columns.toSeq)
  }

  /** Scalar mirror of pageRankWarm's seeding: known nodes take the seed,
    * missing nodes 1/N, then the vector renormalizes to unit mass.
    */
  private def scalarWarm(edges: Seq[(Long, Long)], seed: Map[Long, Double],
      iters: Int, d: Double): Map[Long, Double] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    val n = nodes.size.toDouble
    val outDeg = e.groupBy(_._1).map { case (s, es) => (s, es.size.toDouble) }
    val raw = nodes.map(nd => nd -> seed.getOrElse(nd, 1.0 / n)).toMap
    val s0 = raw.values.sum
    var rank = raw.map { case (k, v) => (k, v / s0) }
    for (_ <- 1 to iters) {
      val dangling = nodes.filterNot(outDeg.contains).map(rank).sum
      val inflow = e.groupBy(_._2).map { case (dst, es) =>
        (dst, es.map { case (s, _) => rank(s) / outDeg(s) }.sum)
      }
      rank = nodes.map { nd =>
        nd -> ((1.0 - d) / n + d * (inflow.getOrElse(nd, 0.0) + dangling / n))
      }.toMap
    }
    rank
  }

  test("pageRankWarm matches the scalar warm reference on a partial, " +
      "unnormalized seed") {
    // seed covers only half the nodes, sums to ~3 (not 1), and includes a
    // node NOT in the graph (must be ignored) and a null rank (reads as
    // missing)
    val seed = (0L to 20L).map(i => (i, 0.3 / (i + 1))).toMap
    val seedDf = (seed.toSeq.map { case (n, r) => (n, Some(r)) } ++
      Seq((999999L, Some(0.5)), (21L, Option.empty[Double])))
      .toDF("node", "rank")
    val distinctNodes = {
      val e = randomEdges.distinct
      (e.map(_._1) ++ e.map(_._2)).distinct.size.toDouble
    }
    val expected = scalarWarm(randomEdges,
      seed ++ Map(21L -> (1.0 / distinctNodes)), iters = 3, d = 0.85)
    // the scalar mirror has no notion of the off-graph node — pageRankWarm
    // drops it in the nodes join; 21's null rank falls back to 1/N, which
    // the mirror expresses explicitly above
    val got = LinkRank.pageRankWarm(randomEdges.toDF("src", "dst"), seedDf,
        iters = 3)
      .collect().map(r => (r.getAs[Long]("node"), r.getAs[Double]("rank"))).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (n, r) =>
      assert(math.abs(r - expected(n)) < 1e-12, s"node=$n $r vs ${expected(n)}")
    }
    assert(math.abs(got.values.sum - 1.0) < 1e-9) // mass conserved
  }

  test("pageRankWarm: uniform seed reproduces the cold start; a fixed " +
      "point stays fixed; warm start converges faster after a delta") {
    val g = randomEdges.toDF("src", "dst")
    val cold = LinkRank.pageRank(g, iters = 3)
      .collect().map(r => (r.getAs[Long]("node"), r.getAs[Double]("rank"))).toMap
    val uniformSeed = cold.keySet.toSeq.map(n => (n, 1.0)).toDF("node", "rank")
    val viaUniform = LinkRank.pageRankWarm(g, uniformSeed, iters = 3)
      .collect().map(r => (r.getAs[Long]("node"), r.getAs[Double]("rank"))).toMap
    viaUniform.foreach { case (n, r) =>
      assert(math.abs(r - cold(n)) < 1e-12, s"node=$n $r vs ${cold(n)}")
    }
    // fixed point: one more warm iteration from a deep run moves nothing
    // beyond the power method's own residual at that depth
    val ref = LinkRank.pageRank(g, iters = 60)
    val refMap = ref.collect()
      .map(r => (r.getAs[Long]("node"), r.getAs[Double]("rank"))).toMap
    val stepped = LinkRank.pageRankWarm(g, ref, iters = 1)
      .collect().map(r => (r.getAs[Long]("node"), r.getAs[Double]("rank"))).toMap
    stepped.foreach { case (n, r) =>
      assert(math.abs(r - refMap(n)) < 1e-4, s"node=$n $r vs ${refMap(n)}")
    }
    // incremental-rank scenario: a delta perturbs the graph; yesterday's
    // ranks are a better start than uniform at equal iteration count
    val delta = (0 until 20).map { i =>
      val src = (Sketches.mix(i * 977L + 5L) >>> 8) % 45L
      val dst = (Sketches.mix(i * 499L + 11L) >>> 8) % 45L
      (src.abs, dst.abs)
    }
    val g2 = (randomEdges ++ delta).toDF("src", "dst")
    val ref2 = LinkRank.pageRank(g2, iters = 60)
      .collect().map(r => (r.getAs[Long]("node"), r.getAs[Double]("rank"))).toMap
    def l1(m: Map[Long, Double]): Double =
      ref2.map { case (n, r) => math.abs(m.getOrElse(n, 0.0) - r) }.sum
    val warm2 = LinkRank.pageRankWarm(g2, ref, iters = 2).collect()
      .map(r => (r.getAs[Long]("node"), r.getAs[Double]("rank"))).toMap
    val cold2 = LinkRank.pageRank(g2, iters = 2).collect()
      .map(r => (r.getAs[Long]("node"), r.getAs[Double]("rank"))).toMap
    assert(l1(warm2) < l1(cold2),
      s"warm ${l1(warm2)} should beat cold ${l1(cold2)} at equal iters")
  }

  test("pageRankWarm: a degenerate seed (zero mass) fails loudly") {
    val g = randomEdges.toDF("src", "dst")
    val zero = (0L to 44L).map(n => (n, 0.0)).toDF("node", "rank")
    val e = intercept[IllegalArgumentException] {
      LinkRank.pageRankWarm(g, zero, iters = 1).collect()
    }
    assert(e.getMessage.contains("seed mass"))
  }
}
