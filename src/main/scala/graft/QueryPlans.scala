package graft

import java.nio.file.{Files, Paths}

/** Dump `explain("formatted")` for named SparkEntry queries into a
  * directory (round-6 plans deliverable): one `<query><suffix>.txt` per
  * query. Not part of the frozen driver contract.
  *
  * Usage: SPARK_GRAFT_QUERIES=a,b scripts/bench.sh graft.QueryPlans \
  *   <outDir> <suffix> [sfDir]
  */
object QueryPlans {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = if (args.length > 1) args(1) else "_plan"
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Bench.benchSession(cpus, localDirName = "graft-queryplans")
    Files.createDirectories(Paths.get(outDir))
    val names = sys.env.getOrElse("SPARK_GRAFT_QUERIES", "")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        Files.writeString(Paths.get(s"$outDir/$name$suffix.txt"), plan)
        println(s"[plans] wrote $name")
      } catch { case e: Throwable =>
        println(s"[plans] $name FAILED: $e")
      }
    }
    spark.stop()
  }
}
