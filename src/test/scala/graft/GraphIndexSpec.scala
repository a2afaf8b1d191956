package graft

import graft.frontier.{AnchorText, GraphIndex, LinkRank}
import org.apache.spark.sql.functions._

/** GraphIndex (incremental anchor-signal / host-graph maintenance):
  * incremental == batch parity, compaction + crash-artifact liveness,
  * partition-pruned point probes, and loud failure contracts.
  */
class GraphIndexSpec extends SparkTestBase {

  import spark.implicits._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString + "/idx"

  /** Deterministic anchor occurrences: 40 targets, skewed texts (target
    * t draws from 3 candidate texts with different multiplicities), plus
    * empty-text icon links that must never reach the index.
    */
  private def anchorRows: Seq[(String, String, String)] =
    (0 until 400).map { i =>
      val t = i % 40
      val text =
        if (i % 7 == 0) "" // icon link
        else s"label ${t} v${i % 3}"
      (s"http://src${i % 11}.ir/p$i", s"http://t.ir/d$t", text)
    }

  private def anchorsDf(rows: Seq[(String, String, String)]) =
    rows.toDF("src_url", "dst_url", "text")

  /** Batch twin of the index's merged view (topAnchors' input agg). */
  private def batchStats(rows: Seq[(String, String, String)]) =
    rows.filter(_._3.nonEmpty).groupBy(r => (r._2, r._3))
      .map { case ((d, t), occ) => (d, t, occ.size.toLong) }.toSet

  private def statsSet(df: org.apache.spark.sql.DataFrame) =
    df.select("dst_url", "text", "cnt").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet

  private def topSet(df: org.apache.spark.sql.DataFrame) =
    df.select("dst_url", "text", "cnt", "rnk").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3)))
      .toSet

  test("anchor index: init + appends merge to the batch aggregation; " +
      "topAnchorsIndexed == topAnchors") {
    val path = tmp("graft-anchor-idx")
    val (a, rest) = anchorRows.splitAt(150)
    val (b, c) = rest.splitAt(150)
    GraphIndex.anchorIndexInit(anchorsDf(a), path, buckets = 8)
    GraphIndex.anchorIndexAppend(anchorsDf(b), path)
    GraphIndex.anchorIndexAppend(anchorsDf(c), path)
    assert(statsSet(GraphIndex.anchorStats(spark, path)) ==
      batchStats(anchorRows))
    val batchTop = topSet(AnchorText.topAnchors(
      anchorsDf(anchorRows).select("dst_url", "text"), k = 2))
    assert(topSet(GraphIndex.topAnchorsIndexed(spark, path, k = 2)) ==
      batchTop)
  }

  test("anchor index: compaction preserves the merged view, sweeps stale " +
      "dirs, and later appends keep working") {
    val path = tmp("graft-anchor-compact")
    val (a, b) = anchorRows.splitAt(200)
    GraphIndex.anchorIndexInit(anchorsDf(a), path, buckets = 4)
    GraphIndex.anchorIndexAppend(anchorsDf(b), path)
    val before = statsSet(GraphIndex.anchorStats(spark, path))
    GraphIndex.anchorIndexCompact(spark, path)
    assert(statsSet(GraphIndex.anchorStats(spark, path)) == before)
    // exactly one live dir remains: the compact generation
    val names = new java.io.File(s"$path/agg").listFiles().map(_.getName)
      .filterNot(_.startsWith("_")).toSeq
    assert(names == Seq("compact_1"), s"unexpected dirs: $names")
    // a post-compaction append allocates ABOVE the compact generation and
    // the merged view stays the batch aggregation of everything
    GraphIndex.anchorIndexAppend(anchorsDf(b), path)
    val again = batchStats(anchorRows ++ b)
    assert(statsSet(GraphIndex.anchorStats(spark, path)) == again)
    GraphIndex.anchorIndexCompact(spark, path)
    assert(statsSet(GraphIndex.anchorStats(spark, path)) == again)
  }

  test("anchor index: crash artifacts (_tmp_* dirs) are invisible to " +
      "readers and to delta-id allocation") {
    val path = tmp("graft-anchor-crash")
    GraphIndex.anchorIndexInit(anchorsDf(anchorRows), path, buckets = 4)
    val before = statsSet(GraphIndex.anchorStats(spark, path))
    // simulate a crashed append AND a crashed compaction: partial temp
    // dirs with real parquet rows inside
    anchorsDf(anchorRows.take(5)).groupBy("dst_url", "text")
      .agg(count(lit(1)).as("cnt")).withColumn("ab", lit(0L))
      .write.partitionBy("ab").parquet(s"$path/agg/_tmp_delta_id=7")
    anchorsDf(anchorRows.take(5)).groupBy("dst_url", "text")
      .agg(count(lit(1)).as("cnt")).withColumn("ab", lit(0L))
      .write.partitionBy("ab").parquet(s"$path/agg/_tmp_compact_9")
    assert(statsSet(GraphIndex.anchorStats(spark, path)) == before)
    // the next real append still lands and merges correctly
    GraphIndex.anchorIndexAppend(anchorsDf(anchorRows.take(50)), path)
    assert(statsSet(GraphIndex.anchorStats(spark, path)) ==
      batchStats(anchorRows ++ anchorRows.take(50)))
  }

  test("anchorsFor: point probe equals the filtered top-k and carries an " +
      "ab PartitionFilter") {
    val path = tmp("graft-anchor-probe")
    val (a, b) = anchorRows.splitAt(200)
    GraphIndex.anchorIndexInit(anchorsDf(a), path, buckets = 16)
    GraphIndex.anchorIndexAppend(anchorsDf(b), path)
    val targets = Seq("http://t.ir/d3", "http://t.ir/d17")
    val probe = GraphIndex.anchorsFor(spark, path, targets, k = 2)
    val expected = topSet(GraphIndex.topAnchorsIndexed(spark, path, k = 2))
      .filter(r => targets.contains(r._1))
    assert(topSet(probe) == expected)
    val planStr = probe.queryExecution.executedPlan.toString
    // a NON-EMPTY PartitionFilters payload referencing the ab attribute —
    // bare contains("PartitionFilters: [") is satisfied by the empty list
    // every unpruned scan prints, and bare contains("ab") by the partition
    // schema, so the old form passed even with pruning broken
    assert("""PartitionFilters: \[[^\]]*ab#\d+""".r
        .findFirstIn(planStr).isDefined,
      s"no ab predicate inside PartitionFilters in:\n${planStr.take(1500)}")
  }

  test("empty deltas: an all-icon-link append is a no-op (no data-less " +
      "dir poisons later reads); an empty fresh init reads as empty") {
    val path = tmp("graft-anchor-empty")
    val icons = anchorRows.map { case (s, d, _) => (s, d, "") }
    // empty FRESH init: readers see an empty index, not a crash
    GraphIndex.anchorIndexInit(anchorsDf(icons.take(20)), path, buckets = 4)
    assert(GraphIndex.anchorStats(spark, path).isEmpty)
    assert(GraphIndex.topAnchorsIndexed(spark, path, k = 2).isEmpty)
    // real rows append fine on top of the empty generation
    GraphIndex.anchorIndexAppend(anchorsDf(anchorRows.take(100)), path)
    assert(statsSet(GraphIndex.anchorStats(spark, path)) ==
      batchStats(anchorRows.take(100)))
    // an EMPTY append is a no-op: no new dir, every reader still green
    val dirsBefore = new java.io.File(s"$path/agg").listFiles()
      .map(_.getName).filterNot(_.startsWith("_")).sorted.toSeq
    GraphIndex.anchorIndexAppend(anchorsDf(icons.take(30)), path)
    val dirsAfter = new java.io.File(s"$path/agg").listFiles()
      .map(_.getName).filterNot(_.startsWith("_")).sorted.toSeq
    assert(dirsAfter == dirsBefore, s"empty append wrote: $dirsAfter")
    assert(statsSet(GraphIndex.anchorStats(spark, path)) ==
      batchStats(anchorRows.take(100)))
    // compaction over a mix that includes the empty generation works and
    // the probe still prunes + answers through it
    GraphIndex.anchorIndexCompact(spark, path)
    assert(statsSet(GraphIndex.anchorStats(spark, path)) ==
      batchStats(anchorRows.take(100)))
  }

  test("re-init RESETS the index: a new bucket fan never coexists with " +
      "old-fan generations (the silent-miss corruption class)") {
    val path = tmp("graft-anchor-reinit")
    GraphIndex.anchorIndexInit(anchorsDf(anchorRows), path, buckets = 8)
    // re-bootstrap with a DIFFERENT fan over the same path
    val half = anchorRows.take(200)
    GraphIndex.anchorIndexInit(anchorsDf(half), path, buckets = 16)
    // merged view is ONLY the re-init batch (old generations gone) …
    assert(statsSet(GraphIndex.anchorStats(spark, path)) == batchStats(half))
    // … and the pruned point probe finds rows bucketed under the NEW fan
    val targets = Seq("http://t.ir/d3")
    val probe = topSet(GraphIndex.anchorsFor(spark, path, targets, k = 3))
    val expected = topSet(GraphIndex.topAnchorsIndexed(spark, path, k = 3))
      .filter(r => targets.contains(r._1))
    assert(probe == expected && probe.nonEmpty)
  }

  test("compaction with nothing newer than the standing generation is a " +
      "no-op that never rewrites compact_N onto itself") {
    val path = tmp("graft-anchor-recompact")
    GraphIndex.anchorIndexInit(anchorsDf(anchorRows), path, buckets = 4)
    GraphIndex.anchorIndexCompact(spark, path)
    val before = statsSet(GraphIndex.anchorStats(spark, path))
    val dir = new java.io.File(s"$path/agg")
    val mtimes = dir.listFiles().map(f => f.getName -> f.lastModified).toMap
    // immediate re-compaction: no fold, no delete+rename crash window on
    // the only live generation — the dir set and the data are untouched
    GraphIndex.anchorIndexCompact(spark, path)
    val after = dir.listFiles().map(f => f.getName -> f.lastModified).toMap
    assert(after == mtimes, s"re-compaction touched dirs: $after vs $mtimes")
    assert(statsSet(GraphIndex.anchorStats(spark, path)) == before)
  }

  test("append to a missing index fails loudly; probes on an empty path " +
      "fail loudly") {
    val path = tmp("graft-anchor-missing")
    val e1 = intercept[IllegalArgumentException] {
      GraphIndex.anchorIndexAppend(anchorsDf(anchorRows.take(5)), path)
    }
    assert(e1.getMessage.contains("no index at"))
    val e2 = intercept[IllegalArgumentException] {
      GraphIndex.anchorsFor(spark, path, Seq("http://t.ir/d1"))
    }
    assert(e2.getMessage.contains("no index at"))
  }

  /** Url-level edges over 12 hosts with duplicates, self-loops (same
    * host), an unparseable src that must drop, and a HUB (h0 receives a
    * third of all links) — a skewed fixed point, so convergence tests
    * have something to converge TO (a regular graph's fixed point is the
    * uniform start itself).
    */
  private def urlEdges: Seq[(String, String)] =
    (0 until 300).map { i =>
      val s = i % 12
      val d = if (i % 3 == 0) 0 else (i * 7 + 3) % 12
      (s"http://h$s.ir/p$i", s"http://h$d.ir/q${i % 5}")
    } ++ Seq(("not a url", "http://h1.ir/x"))

  test("host-edge index: init + append == hostRank over the full url " +
      "edges; weights count url-level occurrences") {
    val path = tmp("graft-hostedge-idx")
    val (a, b) = urlEdges.splitAt(150)
    GraphIndex.hostEdgeIndexInit(a.toDF("src_url", "dst_url"), path,
      buckets = 8)
    GraphIndex.hostEdgeIndexAppend(b.toDF("src_url", "dst_url"), path)
    val full = LinkRank.hostRank(urlEdges.toDF("src_url", "dst_url"),
        iters = 4)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    val inc = GraphIndex.hostRankIndexed(spark, path, iters = 4)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(inc.keySet == full.keySet)
    inc.foreach { case (h, r) =>
      assert(math.abs(r - full(h)) < 1e-12, s"host=$h inc=$r full=${full(h)}")
    }
    // weight = cumulative url-level occurrences of the host pair
    val w = GraphIndex.hostEdges(spark, path).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    def host(u: String): String = {
      val i = u.indexOf("//")
      if (i < 0) "" else u.substring(i + 2).takeWhile(_ != '/')
    }
    val expected = urlEdges
      .map { case (s, d) => (host(s), host(d)) }
      .filter { case (s, d) => s.nonEmpty && d.nonEmpty && s != d }
      .groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    assert(w == expected)
    // compaction keeps the rank identical
    GraphIndex.hostEdgeIndexCompact(spark, path)
    val afterCompact = GraphIndex.hostRankIndexed(spark, path, iters = 4)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(afterCompact == inc)
  }

  test("hostRankIndexed warm start: seeding from previous ranks converges " +
      "through the index path") {
    val path = tmp("graft-hostedge-warm")
    val (a, b) = urlEdges.splitAt(150)
    GraphIndex.hostEdgeIndexInit(a.toDF("src_url", "dst_url"), path,
      buckets = 8)
    val prev = GraphIndex.hostRankIndexed(spark, path, iters = 30)
      .select(col("host").as("node"), col("rank"))
    GraphIndex.hostEdgeIndexAppend(b.toDF("src_url", "dst_url"), path)
    val ref = GraphIndex.hostRankIndexed(spark, path, iters = 60)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    def l1(df: org.apache.spark.sql.DataFrame): Double =
      df.collect().map(r => math.abs(r.getDouble(1) - ref(r.getString(0)))).sum
    val warm = l1(GraphIndex.hostRankIndexed(spark, path, iters = 2,
      init = Some(prev)))
    val cold = l1(GraphIndex.hostRankIndexed(spark, path, iters = 2))
    assert(warm < cold,
      s"warm start ($warm) should beat cold start ($cold) at equal iters")
  }
}
