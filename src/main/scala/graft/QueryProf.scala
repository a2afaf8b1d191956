package graft

import org.apache.spark.scheduler._
import scala.collection.mutable

/** Per-query job/stage profiler (round-6 optimization tooling): runs named
  * SparkEntry queries under the bench session and prints every Spark job
  * and stage the query launched — wall time, task count, stage name — so
  * fixed-cost structure (checkpoint barriers, AQE query stages, broadcast
  * builds) is visible instead of guessed.
  *
  * Usage: SPARK_GRAFT_QUERIES=a,b SPARK_GRAFT_CPUS=32 \
  *   scripts/bench.sh graft.QueryProf [sfDir]
  * Not part of the frozen driver contract (Bench/Verify untouched).
  */
object QueryProf {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Bench.benchSession(cpus, localDirName = "graft-queryprof")
    val names = sys.env.getOrElse("SPARK_GRAFT_QUERIES", "")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    require(names.nonEmpty, "set SPARK_GRAFT_QUERIES=name1,name2")
    val runs = sys.env.getOrElse("SPARK_GRAFT_PROF_RUNS", "1").toInt

    final case class J(jobId: Int, start: Long, var end: Long = -1L)
    val jobs = mutable.LinkedHashMap[Int, J]()
    val stages = mutable.LinkedHashMap[Int, String]() // log lines by stageId
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.synchronized { jobs(e.jobId) = J(e.jobId, e.time) }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized { jobs.get(e.jobId).foreach(_.end = e.time) }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        jobs.synchronized {
          val si = e.stageInfo
          val dur = (for (s <- si.submissionTime; c <- si.completionTime)
            yield (c - s) / 1e3).getOrElse(-1.0)
          val exec = si.taskMetrics.executorRunTime / 1e3
          stages(si.stageId) =
            f"  stage ${si.stageId}%4d ${dur}%7.3fs tasks=${si.numTasks}%4d execSum=${exec}%7.2fs  ${si.name.take(90)}"
        }
    }
    spark.sparkContext.addSparkListener(listener)

    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      fn(spark, sfDir).count() // warm (JIT + codegen + footers), uncounted
      for (r <- 1 to runs) {
        jobs.synchronized { jobs.clear(); stages.clear() }
        Thread.sleep(300)
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(400) // let listener drain
        println(f"%n=== $name run$r  wall=${wall}%.3fs ===")
        jobs.synchronized {
          jobs.values.foreach { j =>
            val dur = if (j.end > 0) (j.end - j.start) / 1e3 else -1.0
            println(f"  job ${j.jobId}%4d  ${dur}%7.3fs")
          }
          stages.values.foreach(println)
        }
      }
    }
    spark.stop()
  }
}
