package graft

import graft.ops.Classify
import org.apache.spark.sql.functions._

/** Naive Bayes classifier vs an independent scalar reference: the
  * distributed trainer/scorer must reproduce hand-computed multinomial NB
  * exactly (1e-9 — scores are rounded to 6 dp at the source, the parity
  * bound just needs to sit below that).
  */
class ClassifySpec extends SparkTestBase {

  import spark.implicits._

  // small labeled corpus with informative tokens, an ambiguous doc, an
  // empty doc, and an unseen-token doc
  private val labeled = Seq(
    (0L, "spam buy pills buy", "bad"),
    (1L, "spam click here click", "bad"),
    (2L, "essay on history topics", "good"),
    (3L, "science essay with data", "good"),
    (4L, "history of science", "good")
  )
  private val toScore = Seq(
    (10L, "buy pills"), // bad-looking
    (11L, "science essay"), // good-looking
    (12L, ""), // token-free: score == logprior
    (13L, "zzz qqq") // all tokens unseen: logprior + 2*floor
  )

  /** Scalar multinomial NB with add-alpha smoothing, shared vocab. */
  private def refModel(docs: Seq[(Long, String, String)], alpha: Double) = {
    def toks(t: String) = t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    val byLabel = docs.groupBy(_._3)
    val counts: Map[(String, String), Long] = docs
      .flatMap(d => toks(d._2).map(t => (d._3, t)))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val vocab = counts.keySet.map(_._2)
    val v = vocab.size.toDouble
    val totals = counts.groupBy(_._1._1).map { case (l, m) => l -> m.values.sum.toDouble }
    val lik = counts.map { case ((l, t), c) =>
      (l, t) -> math.log((c + alpha) / (totals(l) + alpha * v))
    }
    val priors = byLabel.map { case (l, ds) =>
      l -> math.log(ds.size.toDouble / docs.size.toDouble)
    }
    val unseen = totals.map { case (l, tc) => l -> math.log(alpha / (tc + alpha * v)) }
    (lik, priors, unseen)
  }

  private def refScore(text: String, label: String,
      lik: Map[(String, String), Double], priors: Map[String, Double],
      unseen: Map[String, Double]): Double = {
    val ts = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
    priors(label) + ts.map(t => lik.getOrElse((label, t), unseen(label))).sum
  }

  test("trainNb/scoreNb reproduce the scalar reference exactly") {
    val model = Classify.trainNb(labeled.toDF("doc_id", "text", "label"), "text", "label")
    val (lik, priors, unseen) = refModel(labeled, 1.0)

    val gotLik = model.likelihoods.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(gotLik.keySet == lik.keySet)
    gotLik.foreach { case (k, v) => assert(math.abs(v - lik(k)) < 1e-12, s"$k") }

    val gotPriors = model.priors.collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(gotPriors.keySet == priors.keySet)
    gotPriors.foreach { case (l, (p, u)) =>
      assert(math.abs(p - priors(l)) < 1e-12 && math.abs(u - unseen(l)) < 1e-12)
    }

    val scored = Classify.scoreNb(toScore.toDF("doc_id", "text"), model, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(scored.size == toScore.size * priors.size) // every doc × every label
    for ((id, text) <- toScore; l <- priors.keys) {
      val want = BigDecimal(refScore(text, l, lik, priors, unseen))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(scored((id, l)) - want) < 1e-9, s"doc $id label $l")
    }
  }

  test("classifyNb: informative docs go to the right class; token-free doc scores its prior") {
    val model = Classify.trainNb(labeled.toDF("doc_id", "text", "label"), "text", "label")
    val pred = Classify.classifyNb(toScore.toDF("doc_id", "text"), model, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pred(10L) == "bad")
    assert(pred(11L) == "good")
    // empty + all-unseen docs: prior and floor favor "good" (3/5 prior,
    // comparable totals) — pin the deterministic outcome
    assert(pred(12L) == "good")
    val (_, priors, _) = refModel(labeled, 1.0)
    val s12 = Classify.scoreNb(toScore.toDF("doc_id", "text"), model, "doc_id", "text")
      .filter($"doc_id" === 12L && $"label" === "good").head()
    assert(math.abs(s12.getDouble(2) - BigDecimal(priors("good"))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(s12.getLong(3) == 0L) // n_tokens
  }

  test("tie-break: equal scores pick the lexicographically largest label") {
    // two labels trained on ONE identical doc each — every score ties by
    // symmetry (priors 1/2 and 1/2, same counts)
    val sym = Seq((0L, "x y", "a"), (1L, "x y", "b")).toDF("doc_id", "text", "label")
    val model = Classify.trainNb(sym, "text", "label")
    val pred = Classify.classifyNb(Seq((9L, "x")).toDF("doc_id", "text"),
      model, "doc_id", "text").head()
    assert(pred.getString(1) == "b")
  }

  test("a label whose training docs are all token-free survives into the model") {
    // review-wave regression: priors inner-joined totals, so the 'empty'
    // label vanished and could never be predicted
    val lbl = Seq((0L, "", "empty"), (1L, "x y", "full")).toDF("doc_id", "text", "label")
    val model = Classify.trainNb(lbl, "text", "label")
    val priors = model.priors.collect().map(r => r.getString(0) ->
      (r.getDouble(1), r.getDouble(2))).toMap
    assert(priors.keySet == Set("empty", "full"))
    // empty label's token mass is pure smoothing: unseen = ln(1/V), V = 2
    assert(math.abs(priors("empty")._2 - math.log(1.0 / 2.0)) < 1e-12)
    // a token-free doc can be predicted 'empty'... here priors tie (1/2
    // each) so the tie-break picks 'full'; an unseen-token doc prefers
    // 'empty' (its floor ln(1/2) beats full's ln(1/(2+2)))
    val pred = Classify.classifyNb(Seq((9L, "zzz")).toDF("doc_id", "text"),
      model, "doc_id", "text").head()
    assert(pred.getString(1) == "empty")
  }

  test("scoring plan: model sides broadcast; only score-agg/argmax exchanges") {
    // the repeated at-scale path scores against a MATERIALIZED model
    // (trained once, persisted/checkpointed) — pin the model frames so the
    // assertion sees the scoring plan, not training's model-sized exchanges
    val m0 = Classify.trainNb(labeled.toDF("doc_id", "text", "label"), "text", "label")
    val model = Classify.NbModel(
      m0.likelihoods.localCheckpoint(true), m0.priors.localCheckpoint(true))
    val plan = Classify.classifyNb(toScore.toDF("doc_id", "text"), model,
      "doc_id", "text").queryExecution.executedPlan.toString
    // priors fan-out (one row per label) and likelihood lookup both broadcast
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
    // corpus text never shuffles: the only hash exchanges are the
    // (doc, label) score aggregation and the per-doc argmax
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 2, plan)
  }

  test("filterByClass keeps exactly the predicted-label survivors") {
    val model = Classify.trainNb(labeled.toDF("doc_id", "text", "label"), "text", "label")
    val kept = Classify.filterByClass(toScore.toDF("doc_id", "text"), model,
      "doc_id", "text", keepLabel = "good")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(11L, 12L, 13L))
  }
}
