package graft

import graft.fixtures.{FixtureConfig, FixtureGen}
import graft.frontier.{FrontierCrawl, PolitenessConfig, RobotsRules}
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Per-stage decomposition of the multi-round politeness DRAIN (the shape
  * ProfileRound does not cover: many small rounds, per-round fixed cost
  * dominating). A SparkListener records every stage's callsite, wall
  * interval, and summed task time across the whole drain; stages aggregate
  * by callsite so "which line of the round costs the wall time" reads off
  * directly. The interval-union gap (drain wall not covered by ANY running
  * stage) isolates pure driver latency — planning, commit, listener waits —
  * that no stage accounts for. Diagnostic tooling for the scaling work, not
  * part of the driver contract.
  */
object ProfileDrain {

  private final case class StageRow(
      id: Int, name: String, submitted: Long, completed: Long, tasks: Int)

  def main(args: Array[String]): Unit = {
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val details = sys.env.getOrElse("SPARK_GRAFT_DRAIN_DETAILS", "20000").toInt
    val spark = Bench.benchSession(cores,
      aqe = sys.env.getOrElse("SPARK_GRAFT_DRAIN_AQE", "true").toBoolean)

    val stageRows = mutable.ArrayBuffer.empty[StageRow]
    val taskTime = mutable.HashMap.empty[Int, Long]
    // (jobId, description-or-first-stage, submitted, completed)
    val jobRows = mutable.ArrayBuffer.empty[(Int, String, Long, Long)]
    val jobMeta = mutable.HashMap.empty[Int, (String, Long)]
    val lock = new Object
    @volatile var recording = false
    val listener = new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        if (recording) lock.synchronized {
          val i = e.stageInfo
          stageRows += StageRow(i.stageId, i.name,
            i.submissionTime.getOrElse(-1L), i.completionTime.getOrElse(-1L),
            i.numTasks)
        }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (recording) lock.synchronized {
          taskTime(e.stageId) =
            taskTime.getOrElse(e.stageId, 0L) + e.taskInfo.duration
        }
      override def onJobStart(e: SparkListenerJobStart): Unit =
        if (recording) lock.synchronized {
          val name = Option(e.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .orElse(e.stageInfos.lastOption.map(_.name)).getOrElse("?")
          jobMeta(e.jobId) = (name, e.time)
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        if (recording) lock.synchronized {
          jobMeta.remove(e.jobId).foreach { case (name, t0) =>
            jobRows += ((e.jobId, name, t0, e.time))
          }
        }
    }
    spark.sparkContext.addSparkListener(listener)

    // fixture + politeness identical to Bench.crawlDrain;
    // SPARK_GRAFT_DRAIN_BUCKETED=1 swaps the pages side to the bucketed
    // at-scale shape (merge-hint fetch join, no per-round broadcast build)
    val bucketed = sys.env.get("SPARK_GRAFT_DRAIN_BUCKETED").contains("1")
    val cfg = FixtureConfig(seed = 42L, hosts = 32, totalDetails = details,
      paginationFanout = 8)
    val dir = java.nio.file.Files.createTempDirectory("graft-profile-drain").toString
    val pages =
      if (bucketed) {
        val tbl = "graft_profile_drain_pages"
        graft.sources.PagesTable.writeBucketed(spark,
          FixtureGen.pages(spark, cfg, cores).toDF(), tbl, dir + "/tbl",
          buckets = Bench.BenchBuckets)
        spark.table(tbl)
      } else {
        FixtureGen.pages(spark, cfg, cores).write.mode("overwrite").parquet(dir)
        spark.read.parquet(dir)
      }
    val pol = PolitenessConfig(defaultBudget = Int.MaxValue / 2,
      defaultDelayMs = 0L, maxRetries = 0, saltBuckets = cores,
      fetchJoinHint = if (bucketed) Some("merge") else None,
      seenJoinHint = Some("shuffle_hash"),
      bloomBuildParallelism = cores)

    // phase-timed replica of FrontierCrawl.run's storeless loop (same
    // calls, same order) so the per-round driver gap decomposes into run()
    // plan construction / checkpoint actions / observation reads / bloom
    // merge / unpersist without touching the production loop
    def drainTimed(): Double = {
      import graft.frontier.FrontierRound
      import spark.implicits._
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      val phase = mutable.LinkedHashMap.empty[String, Long]
      def lap[T](name: String)(body: => T): T = {
        val t0 = System.nanoTime(); val r = body
        phase(name) = phase.getOrElse(name, 0L) + (System.nanoTime() - t0); r
      }
      val tAll = System.nanoTime()
      var frontier = FrontierCrawl.seedFrontier(spark, cfg.seeds)
      var seen: Option[org.apache.spark.sql.DataFrame] = None
      var seenBloom: Option[org.apache.spark.util.sketch.BloomFilter] = None
      var seenCount = 0L
      var frontierRows = -1L
      var round = 0
      while (round < 50 &&
          (if (frontierRows >= 0L) frontierRows > 0L else !frontier.isEmpty)) {
        val out = lap("run_plan_build") {
          FrontierRound.run(spark, pages, frontier, seen, round,
            RobotsRules.empty, pol, seenCount, seenBloom,
            frontierSizeBound = frontierRows, bloomRidesCheckpoint = true)
        }
        if (round == 2 && sys.env.get("SPARK_GRAFT_DRAIN_EXPLAIN").contains("1"))
          out.newFrontier.explain("formatted")
        // mirrors FrontierCrawl: frontier checkpoint ∥ round checkpoint
        // (the two laps overlap — their sum exceeds the wall on purpose;
        // ck_wave is the wall of the combined wave). The Future measures
        // its own duration LOCALLY and the main thread folds it into
        // `phase` after Await — LinkedHashMap is not thread-safe and a
        // concurrent insert from the Future thread could corrupt it
        val tWave = System.nanoTime()
        val fCk = Future {
          val t0 = System.nanoTime()
          val r = out.checkpointRound()
          (r, System.nanoTime() - t0)
        }
        frontier = lap("ck_frontier") {
          frontier.sparkSession.sparkContext.setJobDescription(s"frontier r$round")
          val f = out.newFrontier.localCheckpoint(true)
          frontier.sparkSession.sparkContext.setJobDescription(null)
          f.as[graft.model.FrontierEntry]
        }
        val (ck, ckNanos) = Await.result(fCk, Duration.Inf)
        phase("ck_round") = phase.getOrElse("ck_round", 0L) + ckNanos
        phase("ck_wave") = phase.getOrElse("ck_wave", 0L) +
          (System.nanoTime() - tWave)
        val fBloom = Future(out.seenBloomAfter())
        seen = lap("seen_union_plan") {
          Some(seen.map(_.union(ck.seenDelta)).getOrElse(ck.seenDelta))
        }
        lap("sched_count") { seenCount += out.scheduledCount() }
        frontierRows = lap("obs_frontier") {
          ObservedMetrics.longField(out.frontierObservation, "rows") { -1L }
        }
        seenBloom = lap("bloom_await") { Await.result(fBloom, Duration.Inf) }
        lap("unpersist") { out.caches.foreach(_.unpersist(false)) }
        round += 1
      }
      val secs = (System.nanoTime() - tAll) / 1e9
      println(f"[drain] rounds=$round; per-phase totals:")
      phase.foreach { case (k, v) => println(f"  $k%-18s ${v / 1e9}%7.2fs") }
      secs
    }

    def drain(): Double = {
      val t0 = System.nanoTime()
      val result = FrontierCrawl.run(spark, pages, cfg.seeds, None,
        RobotsRules.empty, pol, maxRounds = 50)
      result.extracted.count()
      result.results.count()
      (System.nanoTime() - t0) / 1e9
    }

    val warm = drain() // JIT + parquet footers, unrecorded
    spark.sqlContext.clearCache(); System.gc()
    recording = true
    val secs =
      if (sys.env.get("SPARK_GRAFT_DRAIN_TIMED").contains("1")) drainTimed()
      else drain()
    recording = false
    Thread.sleep(1500) // let the listener bus drain

    val rows = lock.synchronized { stageRows.toVector }
    val tt = lock.synchronized { taskTime.toMap }
    println(f"[drain] cores=$cores details=$details warm=$warm%.2fs measured=$secs%.2fs stages=${rows.size}")

    // interval-union coverage: wall seconds during which >=1 stage ran
    val ivs = rows.filter(r => r.submitted > 0 && r.completed > 0)
      .map(r => (r.submitted, r.completed)).sortBy(_._1)
    var covered = 0L
    var curS = Long.MinValue; var curE = Long.MinValue
    ivs.foreach { case (s, e) =>
      if (s > curE) { covered += curE - curS max 0L; curS = s; curE = e }
      else if (e > curE) curE = e
    }
    covered += (curE - curS) max 0L
    println(f"[drain] stage-covered wall ${covered / 1e3}%.2fs; uncovered (pure driver) ${secs - covered / 1e3}%.2fs")

    // aggregate by callsite
    val byName = rows.groupBy(_.name).map { case (name, rs) =>
      val wall = rs.map(r => (r.completed - r.submitted) max 0L).sum / 1e3
      val task = rs.map(r => tt.getOrElse(r.id, 0L)).sum / 1e3
      (name, rs.size, wall, task, rs.map(_.tasks).sum)
    }.toVector.sortBy(-_._3)
    println(f"${"stage (callsite)"}%-68s ${"n"}%4s ${"wall_s"}%8s ${"task_s"}%8s ${"tasks"}%6s")
    byName.take(30).foreach { case (name, n, wall, task, tasks) =>
      println(f"${name.take(68)}%-68s $n%4d $wall%8.2f $task%8.2f $tasks%6d")
    }

    // chronological job timeline with inter-job driver gaps: where the
    // uncovered time actually sits (gap BEFORE each job = planning /
    // optimization / driver bookkeeping for it)
    val jobs = lock.synchronized { jobRows.toVector }.sortBy(_._3)
    println(f"%njob timeline (gap = idle driver ms before the job; overlapping jobs clamp to 0):")
    var prevEnd = jobs.headOption.map(_._3).getOrElse(0L)
    var gapTotal = 0L
    jobs.foreach { case (id, name, s, e) =>
      val gap = (s - prevEnd) max 0L
      gapTotal += gap
      println(f"  job $id%3d gap ${gap}%5dms run ${e - s}%5dms  ${name.take(80)}")
      prevEnd = math.max(prevEnd, e)
    }
    println(f"[drain] inter-job gap total ${gapTotal / 1e3}%.2fs over ${jobs.size} jobs")
    spark.stop()
    try {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    } catch { case _: Throwable => }
  }
}
