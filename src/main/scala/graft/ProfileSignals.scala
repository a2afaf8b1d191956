package graft

import org.apache.spark.sql.functions._
import graft.ops.TextStats

/** Micro-profile of the per-row text-signal expressions feeding the
  * curation gates (round-6 optimization tooling, not driver contract):
  * times each projection/filter shape over the pipeline_curate corpus
  * construction so the interpreted-HOF cost (and any per-filter
  * re-evaluation) is measured, not guessed.
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.ProfileSignals [sfDir]"
  */
object ProfileSignals {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Bench.benchSession(cpus, localDirName = "graft-profsignals")
    import spark.implicits._

    // the pipeline_curate corpus construction (forest texts), checkpointed
    // so the timings below exclude construction
    val ids = spark.read.parquet(s"$sfDir/orders.parquet")
      .filter(col("o_orderkey") < 40000)
      .select(col("o_orderkey").cast("long").as("doc_id"))
    def forest(offset: Long, seed: String) = ids.as[Long]
      .map { id0 => val id = id0 + offset; (id, SparkEntry.forestText(id, seed)) }
      .toDF("doc_id", "text")
    val d = forest(0L, "-")
      .union(forest(10000000L, "-x-"))
      .union(forest(20000000L, "-y-"))
      .union(forest(30000000L, "-z-"))
      .union(forest(40000000L, "-w-"))
      .repartition(cpus)
      .localCheckpoint(true)
    val n = d.count()
    println(s"[signals] corpus rows = $n")

    // executor-CPU-sum timing (scheduling/wall noise swamps single short
    // jobs at this scale): sum of stage executorRunTime during the action
    val execSum = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          execSum.addAndGet(e.stageInfo.taskMetrics.executorRunTime)
      })
    def time(label: String)(f: => Unit): Unit = {
      f // warm
      Thread.sleep(200) // let the warm run's stage events drain
      execSum.set(0L)
      val t0 = System.nanoTime()
      f
      val t1 = System.nanoTime()
      Thread.sleep(200)
      val cpuSec = execSum.get() / 1e3 // executorRunTime is in ms
      println(f"[signals] $label%-46s wall=${(t1 - t0) / 1e9}%7.3fs cpu=$cpuSec%8.3fs  (${cpuSec * 1e6 / n}%8.2f cpu-us/row)")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    time("baseline: md5 only") {
      noop(d.select(md5(col("text")).as("h")))
    }
    time("tokenCountWs") {
      noop(d.select(TextStats.tokenCountWs(col("text")).as("x")))
    }
    time("langIdByScript") {
      noop(d.select(TextStats.langIdByScript(col("text")).as("x")))
    }
    time("qualityFeatures") {
      noop(d.select(TextStats.qualityFeatures(col("text")).as("x")))
    }
    time("qualityScore") {
      noop(d.select(TextStats.qualityScore(col("text")).as("x")))
    }
    time("repetitionSignals (1 eval, project)") {
      noop(d.select(TextStats.repetitionSignals(col("text")).as("x")))
    }
    val rep = TextStats.repetitionSignals(col("text"))
    time("gates: 3 filters on getField (dedupBase shape)") {
      noop(d
        .filter(rep.getField("dup_line_frac") <= 0.4)
        .filter(rep.getField("top_word_frac") <= 0.9)
        .filter(rep.getField("dup_3gram_frac") <= 0.4)
        .select(col("doc_id")))
    }
    time("gates: 1 filter, one conjunction") {
      noop(d
        .filter(rep.getField("dup_line_frac") <= 0.4 &&
          rep.getField("top_word_frac") <= 0.9 &&
          rep.getField("dup_3gram_frac") <= 0.4)
        .select(col("doc_id")))
    }
    time("gates: project struct then filter fields") {
      noop(d
        .withColumn("__rep", rep)
        .filter(col("__rep").getField("dup_line_frac") <= 0.4 &&
          col("__rep").getField("top_word_frac") <= 0.9 &&
          col("__rep").getField("dup_3gram_frac") <= 0.4)
        .select(col("doc_id")))
    }
    // the composed pipeline_curate_quality shape EXACTLY as the gate query
    // builds it: base checkpoint + expression-derived copies unioned, then
    // Curation.curate with quality gates and nearDup=false
    val base4k = forest(0L, "-").localCheckpoint(true)
    val exactCopies = base4k.select((col("doc_id") + 10000000L).as("doc_id"), col("text"))
    val doubled = base4k.select((col("doc_id") + 20000000L).as("doc_id"),
      concat(col("text"), lit(" "), col("text")).as("text"))
    val spam = base4k.select((col("doc_id") + 60000000L).as("doc_id"),
      array_join(array_repeat(substring(col("text"), 1, 8), 40), " ").as("text"))
    val lineDup = base4k.select((col("doc_id") + 70000000L).as("doc_id"),
      concat(substring(col("text"), 1, 179), lit("\n"),
        substring(col("text"), 1, 179)).as("text"))
    val qualityIn = base4k.union(exactCopies).union(doubled).union(spam).union(lineDup)
    time("composed quality query (union of expr copies)") {
      noop(graft.ops.Curation.curate(qualityIn, "doc_id", "text",
        graft.ops.Curation.Config(langs = Set("latin"), minTokens = 10,
          maxTokens = 200, nearDup = false, maxDupLineFrac = 0.4,
          maxTopWordFrac = 0.9, maxDup3gramFrac = 0.4)))
    }
    time("composed quality query (checkpointed union input)") {
      noop(graft.ops.Curation.curate(qualityIn.localCheckpoint(true),
        "doc_id", "text",
        graft.ops.Curation.Config(langs = Set("latin"), minTokens = 10,
          maxTokens = 200, nearDup = false, maxDupLineFrac = 0.4,
          maxTopWordFrac = 0.9, maxDup3gramFrac = 0.4)))
    }
    time("full dedupBase quality-gate stack (annotate+filters)") {
      noop(d
        .select(col("doc_id"), col("text"),
          TextStats.langIdByScript(col("text")).as("lang"),
          TextStats.tokenCountWs(col("text")).as("n_tokens"))
        .filter(col("lang").isin("latin"))
        .filter(col("n_tokens").between(10, 200))
        .filter(rep.getField("dup_line_frac") <= 0.4)
        .filter(rep.getField("top_word_frac") <= 0.9)
        .filter(rep.getField("dup_3gram_frac") <= 0.4)
        .select(col("doc_id")))
    }
    spark.stop()
  }
}
