package graft.frontier

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Adaptive per-host politeness backoff from observed fetch outcomes —
  * the feedback loop the reference handles by hand-tuned constants
  * (/root/reference/src/handler.py: fixed worker count + fixed delays):
  * a host answering with errors/timeouts should see its per-round budget
  * SHRINK before the crawler hammers it further (the standard
  * Heritrix/Nutch politeness-backoff behavior).
  *
  * Deterministic integer semantics (engine-portable, oracle-exact): per
  * host over the results window, k = (4 · error_rows) DIV total_rows
  * (the error-rate quartile, 0..4) and the budget halves k times,
  * floored: budget = max(minBudget, base >> k). A clean host (k = 0)
  * emits NO row — the output carries ONLY overrides, so it stays small
  * (hosts currently failing), collectable, and broadcastable into
  * [[RobotsRules]].
  */
object AdaptiveBudgets {

  /** Per-host budget overrides from a results frame carrying (host,
    * status) rows; `okStatus` rows count as healthy, everything else as
    * an error. ONE groupBy(host) — host-cardinality output filtered to
    * overrides only.
    */
  def fromResults(results: DataFrame, base: Int, minBudget: Int = 1,
      hostCol: String = "host", statusCol: String = "status",
      okStatus: String = "ok"): DataFrame = {
    require(base >= 1 && minBudget >= 1 && minBudget <= base,
      s"bad budgets: base=$base min=$minBudget")
    results
      .groupBy(col(hostCol).as("host"))
      .agg(count(lit(1)).as("n"),
        sum(when(col(statusCol) === okStatus, 0L).otherwise(1L)).as("errors"))
      // integral DIV, not Column./ (always double): the quartile must be
      // exact integer arithmetic for the oracle to reproduce it bit-wise
      .withColumn("k", expr("(4 * errors) DIV n"))
      .withColumn("budget",
        expr(s"greatest($minBudget, shiftright($base, CAST(k AS INT)))"))
      .filter(col("budget") < base) // overrides only: clean hosts emit nothing
      .select(col("host"), col("n"), col("errors"), col("budget"))
  }

  /** Fold collected overrides into a RobotsRules: an explicit
    * robots-specified budget stays AUTHORITATIVE (the site operator said
    * so); adaptive overrides fill the rest. The map is host-bounded by
    * construction (overrides = currently-failing hosts).
    */
  def mergeInto(rules: RobotsRules, overrides: Map[String, Int]): RobotsRules =
    RobotsRules(overrides.foldLeft(rules.byHost) { case (m, (host, b)) =>
      val prev = m.getOrElse(host, HostRules(None, None, Seq.empty))
      if (prev.budget.isDefined) m // explicit robots budget wins
      else m.updated(host, prev.copy(budget = Some(b)))
    })
}
