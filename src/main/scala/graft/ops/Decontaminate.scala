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
    filter(split(lower(text), "[^\\p{L}\\p{N}]+"), w => length(w) > 0)

  /** The benchmark's distinct word n-grams — build once per benchmark and
    * reuse across corpus batches (tiny: bounded by total benchmark words).
    *
    * Benchmark rows SHORTER than n words would contribute zero n-grams
    * and be silently unprotected (most short-answer benchmarks are under
    * the published n = 13) — so rows with `minShortLen ≤ words < n`
    * contribute their FULL word sequence as one gram at its own length.
    * Rows below `minShortLen` are ignored by design: a uni/bi-gram
    * membership test would contaminate essentially every document.
    */
  def benchmarkGrams(benchmark: DataFrame, textCol: String, n: Int,
      minShortLen: Int = 5): DataFrame = {
    val words = benchmark.select(wordsOf(col(textCol)).as("__w"))
    val full = words
      .select(explode(TextStats.wordNgrams(col("__w"), n)).as("gram"))
    val short = words
      .filter(size(col("__w")) >= minShortLen && size(col("__w")) < n)
      .select(array_join(col("__w"), " ").as("gram"))
    full.unionByName(short).distinct()
  }

  /** The distinct short-row gram lengths of a benchmark (words in
    * [minShortLen, n)) — the extra gram lengths [[contaminationStats]]
    * must generate on the doc side to match [[benchmarkGrams]]' full-row
    * grams. Benchmark-sized aggregation; the collect is a handful of ints.
    */
  def benchmarkShortLens(benchmark: DataFrame, textCol: String, n: Int,
      minShortLen: Int = 5): Seq[Int] =
    benchmark
      .select(size(wordsOf(col(textCol))).as("__n"))
      .filter(col("__n") >= minShortLen && col("__n") < n)
      .distinct().collect().map(_.getInt(0)).toSeq.sorted

  /** Per-document contamination stats against `benchGrams` (a
    * [[benchmarkGrams]] frame): total grams, how many hit the benchmark
    * set, and the contaminated flag (any hit). Docs with fewer than n
    * words have zero n-grams — pass the benchmark's [[benchmarkShortLens]]
    * as `extraLens` to also test the short full-row grams (n_grams then
    * counts all generated lengths). Docs shorter than every generated
    * length are never contaminated — the convention that keeps short docs
    * out of the blast radius.
    */
  def contaminationStats(docs: DataFrame, benchGrams: DataFrame,
      idCol: String, textCol: String, n: Int = 13,
      extraLens: Seq[Int] = Nil): DataFrame = {
    val lens = (n +: extraLens).distinct
    val gramsOf =
      if (lens.size == 1) TextStats.wordNgrams(col("__w"), n)
      else flatten(array(lens.map(l => TextStats.wordNgrams(col("__w"), l)): _*))
    docs
      .select(col(idCol), wordsOf(col(textCol)).as("__w"))
      .select(col(idCol), explode_outer(gramsOf).as("gram"))
      .join(broadcast(benchGrams.withColumn("__hit", lit(1))), Seq("gram"), "left")
      .groupBy(col(idCol))
      .agg(
        count(col("gram")).as("n_grams"),
        count(col("__hit")).as("n_contaminated"))
      .withColumn("contaminated", col("n_contaminated") > 0)
  }

  /** The decontamination filter itself: drop every doc sharing at least
    * `minHits` grams with the benchmark (minHits = 1 is the published
    * any-overlap rule; raise it to tolerate incidental collisions on
    * short n). Short benchmark rows are protected via their full-row
    * grams (see [[benchmarkGrams]]). Returns surviving docs with their
    * original columns.
    */
  def removeContaminated(docs: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int = 13,
      minHits: Long = 1L, minShortLen: Int = 5): DataFrame = {
    val bg = benchmarkGrams(benchmark, textCol, n, minShortLen)
    val lens = benchmarkShortLens(benchmark, textCol, n, minShortLen)
    val dirty = contaminationStats(docs, bg, idCol, textCol, n, lens)
      .filter(col("n_contaminated") >= minHits)
      .select(col(idCol))
    docs.join(dirty, Seq(idCol), "left_anti")
  }
}
