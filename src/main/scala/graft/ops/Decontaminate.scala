package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the training-data gate that removes
  * documents overlapping an evaluation set (the n-gram membership test of
  * GPT-3 appendix C / PaLM / Llama data cards: a doc is contaminated when
  * it shares any length-n word gram with a benchmark text; n = 13 is the
  * published convention for web corpora).
  *
  * Scale shape: benchmarks are tiny next to the corpus (10^5-10^6 grams vs
  * 10^12 docs), so the benchmark side ALWAYS broadcasts — the corpus scan
  * stays shuffle-free: explode grams → broadcast left-semi/left join →
  * per-doc count whose partial aggregation collapses to one row per doc
  * per partition before the only (id-keyed, rows = documents) exchange.
  * Gram strings never leave their executor; only the benchmark's distinct
  * grams transit the broadcast.
  */
object Decontaminate {

  /** Lowercased word array of `text` (split on non-word runs) — the
    * canonical form both sides of the membership test share.
    */
  private def wordsOf(text: Column): Column =
    filter(split(lower(text), "\\W+"), w => length(w) > 0)

  /** The benchmark's distinct word n-grams — build once per benchmark and
    * reuse across corpus batches (tiny: bounded by total benchmark words).
    */
  def benchmarkGrams(benchmark: DataFrame, textCol: String, n: Int): DataFrame =
    benchmark
      .select(wordsOf(col(textCol)).as("__w"))
      .select(explode(TextStats.wordNgrams(col("__w"), n)).as("gram"))
      .distinct()

  /** Per-document contamination stats against `benchGrams` (a
    * [[benchmarkGrams]] frame): total n-grams, how many hit the benchmark
    * set, and the contaminated flag (any hit). Docs with fewer than n
    * words have zero grams and are never contaminated — the convention
    * that keeps short docs out of the blast radius.
    */
  def contaminationStats(docs: DataFrame, benchGrams: DataFrame,
      idCol: String, textCol: String, n: Int = 13): DataFrame =
    docs
      .select(col(idCol), wordsOf(col(textCol)).as("__w"))
      .select(col(idCol), explode_outer(TextStats.wordNgrams(col("__w"), n)).as("gram"))
      .join(broadcast(benchGrams.withColumn("__hit", lit(1))), Seq("gram"), "left")
      .groupBy(col(idCol))
      .agg(
        count(col("gram")).as("n_grams"),
        count(col("__hit")).as("n_contaminated"))
      .withColumn("contaminated", col("n_contaminated") > 0)

  /** The decontamination filter itself: drop every doc sharing at least
    * `minHits` n-grams with the benchmark (minHits = 1 is the published
    * any-overlap rule; raise it to tolerate incidental collisions on
    * short n). Returns surviving docs with their original columns.
    */
  def removeContaminated(docs: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int = 13,
      minHits: Long = 1L): DataFrame = {
    val bg = benchmarkGrams(benchmark, textCol, n)
    val dirty = contaminationStats(docs, bg, idCol, textCol, n)
      .filter(col("n_contaminated") >= minHits)
      .select(col(idCol))
    docs.join(dirty, Seq(idCol), "left_anti")
  }
}
