package graft

import graft.frontier.{AdaptiveBudgets, HostRules, PolitenessConfig, RobotsRules}

/** AdaptiveBudgets: quartile backoff arithmetic, overrides-only output,
  * and the robots-authoritative merge.
  */
class AdaptiveBudgetsSpec extends SparkTestBase {

  import spark.implicits._

  test("quartile backoff: halvings by error rate, floored, overrides only") {
    val results = (
      (1 to 20).map(i => ("clean.ir", "ok")) ++                // k=0 → no row
      (1 to 15).map(_ => ("mild.ir", "ok")) ++                 // 5/20 errors
      (1 to 5).map(_ => ("mild.ir", "error_page")) ++          //  → k=1 → 8>>1=4... base 8 → 4
      (1 to 10).map(_ => ("half.ir", "ok")) ++                 // 10/20 → k=2 → 2
      (1 to 10).map(_ => ("half.ir", "missing")) ++
      (1 to 20).map(_ => ("dead.ir", "missing"))               // 20/20 → k=4 → floor
    ).toDF("host", "status")
    val got = AdaptiveBudgets.fromResults(results, base = 8, minBudget = 1)
      .collect().map(r => r.getAs[String]("host") -> r.getAs[Int]("budget")).toMap
    assert(got == Map("mild.ir" -> 4, "half.ir" -> 2, "dead.ir" -> 1))
  }

  test("mergeInto: robots-explicit budgets stay authoritative; others fill in") {
    val rules = RobotsRules(Map(
      "explicit.ir" -> HostRules(None, Some(9), Seq.empty),
      "ruled.ir" -> HostRules(Some(100L), None, Seq("/x"))))
    val merged = AdaptiveBudgets.mergeInto(rules,
      Map("explicit.ir" -> 2, "ruled.ir" -> 3, "new.ir" -> 1))
    val cfg = PolitenessConfig(defaultBudget = 10)
    assert(merged.budget("explicit.ir", cfg) == 9) // robots wins
    assert(merged.budget("ruled.ir", cfg) == 3) // filled, other rules kept
    assert(merged.byHost("ruled.ir").disallow == Seq("/x"))
    assert(merged.budget("new.ir", cfg) == 1)
    assert(merged.budget("unknown.ir", cfg) == 10)
  }
}
