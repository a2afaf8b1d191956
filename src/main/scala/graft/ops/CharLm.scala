package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Character-n-gram language-model quality scoring — the CCNet-style
  * perplexity gate of web-scale curation pipelines (Wenzek et al. 2020:
  * docs are ranked by LM perplexity and the worst tail dropped; the LM
  * here is a corpus-trained MLE char-n-gram model, the offline stand-in
  * for a pretrained KenLM).
  *
  * Scale shape: training is ONE corpus shuffle (the gram count groupBy,
  * map-side combined) — the model itself is bounded by charset^n rows
  * (tens of thousands for char trigrams) regardless of corpus size, so it
  * always BROADCASTS on the scoring path; scoring's only shuffle is the
  * per-doc partial mean, rows = documents.
  */
object CharLm {

  /** Whitespace-collapsed lowercase canonical form (the same text
    * normalization the fingerprint/dedup ops use).
    */
  def canon(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** All overlapping character n-grams of `t` AS-IS (no canonicalization;
    * empty array when shorter than n; null text yields the empty array,
    * exactly like the expression form's otherwise branch). One rolling
    * pass over CODE POINTS — bit-identical to the former
    * `transform(sequence(1, length-n+1), i => substr(i, n))` expression
    * (FunctionsSpec pins the parity: Spark length()/substr() count code
    * points, so the window walks a precomputed code-point offset table,
    * not UTF-16 units), which evaluated one interpreted substr per array
    * element (~len per row per pass).
    */
  def charNgrams(t: Column, n: Int): Column = charNgramsUdf(n)(t)

  private[graft] def charNgramsUdf(n: Int) = udf((s: String) => {
    if (s == null) Array.empty[String]
    else {
      // code-point start offsets: off(i) = UTF-16 index of the i-th code
      // point; nCp+1 entries so gram i spans off(i)..off(i+n)
      val len = s.length
      var nCp = 0
      var i = 0
      while (i < len) { nCp += 1; i += Character.charCount(s.codePointAt(i)) }
      if (nCp < n) Array.empty[String]
      else {
        val off = new Array[Int](nCp + 1)
        i = 0; var c = 0
        while (i < len) {
          off(c) = i; c += 1; i += Character.charCount(s.codePointAt(i))
        }
        off(nCp) = len
        val out = new Array[String](nCp - n + 1)
        var g = 0
        while (g < out.length) {
          out(g) = s.substring(off(g), off(g + n))
          g += 1
        }
        out
      }
    }
  })

  /** Train an MLE char-n-gram model over `docs`:
    * P(c_n | c_1..c_{n-1}) = count(ngram) / count(prefix over ngram
    * starts). Returns (gram, logp) — natural-log conditional
    * probabilities.
    */
  def train(docs: DataFrame, textCol: String, n: Int = 3): DataFrame = {
    val grams = docs.select(canon(col(textCol)).as("__t"))
      .select(explode(charNgrams(col("__t"), n)).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("c"))
    val prefix = grams.groupBy(substring(col("gram"), 1, n - 1).as("p"))
      .agg(sum(col("c")).as("pc"))
    grams.join(prefix, substring(col("gram"), 1, n - 1) === col("p"))
      .select(col("gram"),
        log(col("c").cast("double") / col("pc").cast("double")).as("logp"))
  }

  /** Score documents under a trained model: per-doc mean log-probability
    * of its n-grams (`floorLogp` for grams unseen in training — the
    * smoothing floor that makes cross-corpus scoring total). Every input
    * doc appears in the output; docs shorter than n grams get a null
    * mean and n_grams = 0. avg_logp is rounded to 6 dp at the source so
    * the score is engine-stable (summation order differs per engine).
    */
  def score(docs: DataFrame, model: DataFrame, idCol: String, textCol: String,
      n: Int = 3, floorLogp: Double = math.log(1e-9)): DataFrame =
    docs.select(col(idCol), canon(col(textCol)).as("__t"))
      .select(col(idCol), explode_outer(charNgrams(col("__t"), n)).as("gram"))
      .join(broadcast(model), Seq("gram"), "left")
      .groupBy(col(idCol))
      .agg(
        round(avg(when(col("gram").isNotNull,
          coalesce(col("logp"), lit(floorLogp)))), 6).as("avg_logp"),
        count(col("gram")).as("n_grams"))

  /** The CCNet perplexity gate as a composable pipeline stage: keep docs
    * whose mean log-probability under `model` is at least `minAvgLogp`
    * (docs too short to score — null avg — are kept iff `keepShort`).
    * Survivor ids semi-join back to `docs`, so the full doc rows transit
    * one id-keyed exchange and the text column never rides the gram
    * explode's aggregation.
    */
  def filterByScore(docs: DataFrame, model: DataFrame, idCol: String,
      textCol: String, minAvgLogp: Double, keepShort: Boolean = true,
      n: Int = 3, floorLogp: Double = math.log(1e-9)): DataFrame = {
    val scores = score(docs, model, idCol, textCol, n, floorLogp)
    val keep = scores.filter(
      if (keepShort) col("avg_logp").isNull || col("avg_logp") >= minAvgLogp
      else col("avg_logp") >= minAvgLogp)
    docs.join(keep.select(col(idCol)), Seq(idCol), "left_semi")
  }
}
