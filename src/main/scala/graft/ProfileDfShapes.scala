package graft

import org.apache.spark.sql.functions._

/** A/B of the BM25 docfreq derivation shapes (round-6 tooling): lazy
  * qstats groupBy+broadcast over the SAME lazy tf frame vs a
  * checkpointed tf. Captures the EXECUTED plan via a
  * QueryExecutionListener (a `df.write` creates its own QueryExecution,
  * so `df.queryExecution` would show the never-executed initial plan)
  * and times every shape end-to-end INCLUDING construction-time
  * checkpoint jobs, so the comparison answers the two questions that
  * matter: does AQE reuse the tf exchange between the two lazy
  * consumers at runtime, and what does each shape cost wall-clock.
  */
object ProfileDfShapes {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Bench.benchSession(cpus, localDirName = "graft-dfshapes")
    import spark.implicits._

    @volatile var lastPlan: String = ""
    spark.listenerManager.register(
      new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit =
          lastPlan = qe.executedPlan.toString
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            exception: Exception): Unit = ()
      })

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    def fl = docs.select(col("doc_id").as("id"),
        explode(array(
          struct(lit("question").as("field"), lower(col("text")).as("txt")),
          struct(lit("answer").as("field"), lower(col("text")).as("txt")),
          struct(lit("content").as("field"), lower(col("text")).as("txt")))).as("f"))
      .select(col("id"), col("f.field").as("field"), col("f.txt").as("txt"))
    def tok = fl
      .select(col("id"), col("field"),
        filter(split(col("txt"), " "), t => length(t) > 0).as("__toks"))
      .select(col("id"), col("field"), size(col("__toks")).as("dl"),
        explode(col("__toks")).as("term"))
    val qterms = Seq("spark", "shuffle", "hash", "join", "table", "the",
      "data").toDF("term")
    def tfLazy = tok.join(broadcast(qterms), Seq("term"))
      .groupBy("field", "id", "term")
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))

    // build() constructs the WHOLE frame (including any eager
    // checkpoint) inside the timed region
    def run(label: String, build: () => org.apache.spark.sql.DataFrame): Unit = {
      build().write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      val df = build()
      df.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // listener delivery
      val fin = lastPlan
      val scans = fin.linesIterator.count(_.contains("Scan parquet"))
      val reused = fin.linesIterator.count(l =>
        l.contains("ReusedExchange") || l.contains("ReusedQueryStage") ||
          l.contains("reused"))
      println(f"[dfshapes] $label%-28s wall=$dt%6.3fs executedScans=$scans reusedNodes=$reused")
    }

    run("B lazy qstats bcast join", () => {
      val tf = tfLazy
      val qstats = tf.groupBy("field", "term").agg(count(lit(1)).as("df"))
      tf.join(broadcast(qstats), Seq("field", "term"))
    })
    run("C checkpointed tf", () => {
      val tfC = tfLazy.localCheckpoint(true)
      val qstats = tfC.groupBy("field", "term").agg(count(lit(1)).as("df"))
      tfC.join(broadcast(qstats), Seq("field", "term"))
    })
    spark.stop()
  }
}
