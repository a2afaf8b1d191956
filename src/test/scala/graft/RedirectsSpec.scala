package graft

import graft.frontier.Redirects
import org.apache.spark.sql.functions._

/** Redirects: pointer-doubling resolution vs a scalar reference walk,
  * cycle saturation, budget exhaustion, and input-noise handling.
  */
class RedirectsSpec extends SparkTestBase {

  import spark.implicits._

  private def scalarResolve(edges: Map[String, String], maxHops: Int,
      u: String): (Option[String], Long) = {
    var cur = edges(u); var hops = 1L
    while (hops < maxHops && edges.contains(cur)) { cur = edges(cur); hops += 1 }
    if (edges.contains(cur)) (None, hops + 1) // budget hit mid-chain
    else (Some(cur), hops)
  }

  test("chains of every length resolve exactly; parity with scalar walk") {
    // chains of length 1..7 (terminal t), sharing no nodes
    val edges = (1 to 7).flatMap { len =>
      (0 until len).map(p => (s"c$len/p$p", if (p == len - 1) s"c$len/t" else s"c$len/p${p + 1}"))
    }
    val m = edges.toMap
    val got = Redirects.resolve(edges.toDF("src_url", "location"), rounds = 3)
      .collect().map(r => r.getAs[String]("url") ->
        ((Option(r.getAs[String]("final_url")), r.getAs[Long]("hops"),
          r.getAs[Boolean]("resolved")))).toMap
    assert(got.size == edges.size)
    edges.foreach { case (src, _) =>
      val (fin, hops) = scalarResolve(m, 8, src)
      assert(got(src)._1 == fin && got(src)._2 == hops && got(src)._3,
        s"$src: got ${got(src)} want ($fin, $hops)")
    }
  }

  test("cycles and over-budget chains saturate at exactly 2^rounds, unresolved") {
    val cycle = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("self", "self"))
    // a 12-hop chain under a rounds=3 (8-hop) budget
    val long = (0 until 12).map(p => (s"L/p$p", if (p == 11) "L/t" else s"L/p${p + 1}"))
    val got = Redirects.resolve((cycle ++ long).toDF("src_url", "location"),
      rounds = 3).collect().map(r => r.getAs[String]("url") ->
        ((r.getAs[String]("final_url"), r.getAs[Long]("hops"),
          r.getAs[Boolean]("resolved")))).toMap
    Seq("a", "b", "c", "self").foreach { u =>
      assert(got(u) == ((null, 8L, false)), s"$u: ${got(u)}")
    }
    // L/p0 is 12 hops from terminal: unresolved at 8; L/p4 is 8 hops: resolved
    assert(got("L/p0") == ((null, 8L, false)))
    assert(got("L/p4") == (("L/t", 8L, true)))
    assert(got("L/p5") == (("L/t", 7L, true)))
  }

  test("multi-location srcs collapse to min(location); nulls drop") {
    val edges = Seq(("u", "z-later"), ("u", "m-first"), ("x", null),
      (null, "y")).toDF("src_url", "location")
    val got = Redirects.resolve(edges, rounds = 2).collect()
      .map(r => (r.getAs[String]("url"), r.getAs[String]("final_url"))).toMap
    assert(got == Map("u" -> "m-first")) // null-src and null-dst rows gone
  }

  test("rounds = 0 is the raw one-hop map") {
    val got = Redirects.resolve(Seq(("a", "b"), ("b", "c")).toDF("src_url", "location"),
      rounds = 0).collect().map(r => (r.getAs[String]("url"),
        (r.getAs[String]("final_url"), r.getAs[Long]("hops"),
          r.getAs[Boolean]("resolved")))).toMap
    assert(got("a") == ((null, 1L, false))) // b still redirects
    assert(got("b") == (("c", 1L, true)))
  }
}
