package graft

import org.apache.spark.sql.functions._

/** Scratch A/B of the BM25 docfreq derivation shapes (round-6 tooling):
  * window-over-tf vs qstats-groupBy + broadcast join over the SAME lazy
  * tf frame — prints the FINAL adaptive plan after execution so AQE
  * stage reuse (or its absence) is observable, plus wall time.
  */
object ProfileDfShapes {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Bench.benchSession(cpus, localDirName = "graft-dfshapes")
    import spark.implicits._

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    // a three-field view like searchDocs3
    val fl = docs.select(col("doc_id").as("id"),
        explode(array(
          struct(lit("question").as("field"), lower(col("text")).as("txt")),
          struct(lit("answer").as("field"), lower(col("text")).as("txt")),
          struct(lit("content").as("field"), lower(col("text")).as("txt")))).as("f"))
      .select(col("id"), col("f.field").as("field"), col("f.txt").as("txt"))
    val tok = fl
      .select(col("id"), col("field"),
        filter(split(col("txt"), " "), t => length(t) > 0).as("__toks"))
      .select(col("id"), col("field"), size(col("__toks")).as("dl"),
        explode(col("__toks")).as("term"))
    val qterms = Seq("spark", "shuffle", "hash", "join", "table", "the",
      "data").toDF("term")
    val tf = tok.join(broadcast(qterms), Seq("term"))
      .groupBy("field", "id", "term")
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))

    def run(label: String, df: org.apache.spark.sql.DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      val fin = df.queryExecution.executedPlan.toString
      val scans = fin.linesIterator.count(_.contains("Scan parquet"))
      val reused = fin.linesIterator.count(l =>
        l.contains("ReusedExchange") || l.contains("TableCacheQueryStage") ||
          l.contains("ReusedQueryStage"))
      println(f"[dfshapes] $label%-28s wall=$dt%6.3fs scansInFinalPlan=$scans reusedNodes=$reused")
    }

    // A: window form
    val a = tf.withColumn("df", count(lit(1)).over(
      org.apache.spark.sql.expressions.Window.partitionBy(col("field"), col("term"))))
    run("A window df", a)

    // B: qstats groupBy + broadcast join over the same lazy tf
    val qstats = tf.groupBy("field", "term").agg(count(lit(1)).as("df"))
    val b = tf.join(broadcast(qstats), Seq("field", "term"))
    run("B qstats bcast join", b)

    // C: qstats over a checkpointed tf (explicit single evaluation)
    val tfC = tf.localCheckpoint(true)
    val qstatsC = tfC.groupBy("field", "term").agg(count(lit(1)).as("df"))
    val c = tfC.join(broadcast(qstatsC), Seq("field", "term"))
    run("C checkpointed tf", c)

    spark.stop()
  }
}
