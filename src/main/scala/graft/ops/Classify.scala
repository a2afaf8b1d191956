package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Supervised document classification — the model-based quality/domain
  * filter of modern curation pipelines (FineWeb-Edu, DCLM: a small
  * classifier trained on labeled seed docs scores the full corpus and a
  * threshold keeps the best tail). The offline stand-in for a fasttext
  * classifier is multinomial Naive Bayes over whitespace tokens: training
  * is pure counting (one corpus-shuffle aggregation), the model is bounded
  * by vocab × labels regardless of corpus size, and scoring is a
  * broadcast-join + per-doc partial-aggregated sum — the CharLm.score
  * scale shape, exactly reproducible in any SQL engine.
  *
  * Tokenization is the pipeline-unified one (lowercase, `\s+` split,
  * empties dropped) so a classifier gate composes with curate → tokenize
  * without a second token definition.
  *
  * Scale shape: train = one (label, token) groupBy (map-side combined) +
  * label-sized joins — the vocab/doc scalars ride 1-row aggregate frames
  * cross-joined in (bounded by construction: each side is exactly one
  * row), so training launches no eager driver job. Scoring explodes
  * tokens, crossJoins the LABEL set (bounded: the priors frame has one
  * row per label), broadcast-joins the likelihood table, and reduces per
  * (doc, label) with map-side partial aggregation — the only shuffle is
  * docs × labels rows. Scores round to 6 dp at the source (summation
  * order differs per engine; the CharLm convention).
  */
object Classify {

  /** (likelihoods: label, token, loglik; priors: label, logprior,
    * unseen_loglik). Both bounded: vocab × labels and labels rows.
    */
  final case class NbModel(likelihoods: DataFrame, priors: DataFrame)

  private def tokens(text: Column): Column = TextStats.wsTokensLower(text)

  /** Train multinomial NB with add-`alpha` smoothing over a shared vocab:
    * loglik(t|L) = ln((c(L,t) + α) / (Σ_t c(L,t) + α·V)),
    * unseen_loglik(L) = ln(α / (Σ_t c(L,t) + α·V)),
    * logprior(L) = ln(docs_L / docs_total). V = distinct tokens across the
    * whole training set (the shared-vocabulary multinomial denominator).
    */
  def trainNb(labeled: DataFrame, textCol: String, labelCol: String,
      alpha: Double = 1.0): NbModel = {
    require(alpha > 0.0, s"alpha must be positive, got $alpha")
    val counts = labeled
      .select(col(labelCol).as("label"), explode(tokens(col(textCol))).as("token"))
      .groupBy(col("label"), col("token"))
      .agg(count(lit(1)).as("c"))
    // 1-row frames cross-joined below — lazy scalars, no eager job
    val vocab = counts.agg(countDistinct(col("token")).cast("double").as("__v"))
    val nDocs = labeled.agg(count(lit(1)).cast("double").as("__n"))
    val totals = counts.groupBy(col("label")).agg(sum(col("c")).cast("double").as("__tc"))
    val lik = counts
      .join(totals, Seq("label"))
      .crossJoin(vocab) // 1 row by construction
      .select(col("label"), col("token"),
        log((col("c").cast("double") + lit(alpha)) /
          (col("__tc") + lit(alpha) * col("__v"))).as("loglik"))
    // LEFT join: a label whose training docs are all token-free has no
    // counts/totals rows but must still exist in the model (its token mass
    // is pure smoothing — unseen_loglik = ln(1/V), the uniform floor);
    // an inner join here silently made such a label unpredictable
    val priors = labeled
      .groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).cast("double").as("__dn"))
      .join(totals, Seq("label"), "left")
      .crossJoin(vocab) // 1 row
      .crossJoin(nDocs) // 1 row
      .select(col("label"),
        log(col("__dn") / col("__n")).as("logprior"),
        log(lit(alpha) / (coalesce(col("__tc"), lit(0.0)) +
          lit(alpha) * col("__v"))).as("unseen_loglik"))
    NbModel(lik, priors)
  }

  /** Per-(doc, label) log-score: logprior + Σ_tokens loglik (unseen tokens
    * take the label's smoothing floor). Every input doc appears once per
    * label; token-free docs score exactly their logprior with n_tokens 0.
    * `score` is rounded to 6 dp at the source (engine-stable).
    */
  def scoreNb(docs: DataFrame, model: NbModel, idCol: String,
      textCol: String): DataFrame =
    docs
      .select(col(idCol), explode_outer(tokens(col(textCol))).as("token"))
      .crossJoin(broadcast(model.priors)) // one row per LABEL — bounded
      .join(broadcast(model.likelihoods), Seq("label", "token"), "left")
      .groupBy(col(idCol), col("label"))
      .agg(
        round(
          max(col("logprior")) + coalesce(
            sum(when(col("token").isNotNull,
              coalesce(col("loglik"), col("unseen_loglik")))),
            lit(0.0)),
          6).as("score"),
        count(col("token")).as("n_tokens"))

  /** Argmax over [[scoreNb]]: one row per doc with the winning label.
    * Ties on the (rounded) score break to the lexicographically LARGEST
    * label — struct max orders (score, label) — so the prediction is
    * deterministic and engine-portable.
    */
  def classifyNb(docs: DataFrame, model: NbModel, idCol: String,
      textCol: String): DataFrame =
    scoreNb(docs, model, idCol, textCol)
      .groupBy(col(idCol))
      .agg(max(struct(col("score"), col("label"))).as("__w"))
      .select(col(idCol), col("__w.label").as("predicted"),
        col("__w.score").as("score"))

  /** The classifier gate as a composable pipeline stage: keep docs whose
    * predicted label is `keepLabel` (optionally also requiring the winning
    * score ≥ `minScore` — NB log-scores are length-dependent, so a
    * threshold usually pairs with same-length corpora or a downstream
    * calibration). Survivor ids semi-join back so full doc rows transit
    * one id-keyed exchange (the CharLm.filterByScore pattern).
    */
  def filterByClass(docs: DataFrame, model: NbModel, idCol: String,
      textCol: String, keepLabel: String,
      minScore: Double = Double.NegativeInfinity): DataFrame = {
    val keep = classifyNb(docs, model, idCol, textCol)
      .filter(col("predicted") === lit(keepLabel) && col("score") >= lit(minScore))
    docs.join(keep.select(col(idCol)), Seq(idCol), "left_semi")
  }
}
