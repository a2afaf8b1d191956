package graft

import org.apache.spark.sql.SparkSession

/** N-vs-4N scaling evidence for the QUERY suite's heavy tail (the
  * LLM-pipeline operators) — the crawl path has ScalingBench; this gives
  * the same treatment to the heaviest SparkEntry queries: each query runs
  * warm then probe-gated at local[4] and local[16] on the same sf dir, and
  * the JSON reports per-query efficiency t_N / (4 · t_4N) plus the F/W
  * decomposition (t = F + W/cores solved from the two points: W =
  * 16(t4 − t16)/3, F = t4 − W/4) so a low efficiency can be attributed to
  * fixed job/driver cost vs core-bound work, exactly like ScalingBench §B.
  *
  * Run via scripts/bench.sh (raw JVM — a live sbt poisons timings):
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 scripts/bench.sh graft.QueryScale
  */
object QueryScale {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir",
        if (new java.io.File("/dev/shm").canWrite) s"/dev/shm/graft-qscale-$cores"
        else System.getProperty("java.io.tmpdir"))
      .config("spark.sql.autoBroadcastJoinThreshold", (256L * 1024 * 1024).toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val queries = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq("pipeline_curate_delta", "search_bm25_topk",
        "dedup_incremental_lsh", "pipeline_curate_stream", "search_bm25_phrase"))

    // ONE FRESH SESSION PER (query, cores): the heavy queries
    // localCheckpoint intermediates that live for the session — a shared
    // session times later queries against the earlier ones' resident
    // blocks and eviction churn (observed: search_bm25_topk 31s polluted
    // vs 6.4s in a clean session at local[4]). Session startup is outside
    // the timed region; the in-session warm run covers JIT + footers.
    def measure(cores: Int, name: String): (Double, Boolean) = {
      val spark = session(cores)
      try {
        try SparkEntry.queries(name)(spark, sfDir).count()
        catch { case e: Throwable =>
          Console.err.println(s"[qscale] warm $name failed: ${e.getMessage}")
        }
        BenchGate.gated(s"qscale:$name@$cores", cores,
          maxAttempts = 4, cooldownMs = 8000L, probeMinOf = 1, maxWaits = 8) {
          val t0 = System.nanoTime()
          try SparkEntry.queries(name)(spark, sfDir).count()
          catch { case _: Throwable => -1L }
          (System.nanoTime() - t0) / 1e9
        }
      } finally spark.stop()
    }

    val at4 = queries.map(q => q -> measure(4, q)).toMap
    val at16 = queries.map(q => q -> measure(16, q)).toMap

    val rows = queries.map { q =>
      val (t4, c4) = at4(q)
      val (t16, c16) = at16(q)
      val w = 16.0 * (t4 - t16) / 3.0
      val f = t4 - w / 4.0
      val eff = t4 / (4.0 * t16)
      s"""{"query":"$q","t_n":$t4,"t_4n":$t16,"eff":$eff,"fixed_s":$f,"work_core_s":$w,"certified_n":$c4,"certified_4n":$c16}"""
    }
    println(s"""{"metric":"query_scaling","sf":"$sfDir","rows":${rows.mkString("[", ",", "]")}}""")
  }
}
