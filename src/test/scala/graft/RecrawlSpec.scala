package graft

import graft.frontier.Recrawl
import org.apache.spark.sql.functions._

/** Recrawl scheduling vs a scalar reference of the Cho–Garcia-Molina
  * estimator, plus the single-exchange plan contract.
  */
class RecrawlSpec extends SparkTestBase {

  import spark.implicits._

  // handmade history: u0 changes every observation, u1 never, u2 half the
  // time with a gap pattern, u3 single observation, u4 has a null-hash
  // (failed fetch) row that must be ignored, u5 all same round
  private val history = Seq(
    ("u0", 0L, "a"), ("u0", 2L, "b"), ("u0", 4L, "c"), ("u0", 6L, "d"),
    ("u1", 0L, "x"), ("u1", 3L, "x"), ("u1", 9L, "x"),
    ("u2", 0L, "p"), ("u2", 1L, "p"), ("u2", 5L, "q"), ("u2", 8L, "q"),
    ("u3", 4L, "z"),
    ("u4", 0L, "m"), ("u4", 2L, null), ("u4", 7L, "n"),
    ("u5", 3L, "s"), ("u5", 3L, "t")
  ).toDF("url_key", "round", "content_hash")

  private def refRate(n: Int, x: Int, gapSum: Long): Option[Double] =
    if (n < 1 || gapSum <= 0) None
    else Some(BigDecimal(-math.log((n - x + 0.5) / (n + 0.5)) / (gapSum.toDouble / n))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)

  test("changeStats matches the scalar estimator on every shape") {
    val got = Recrawl.changeStats(history).collect()
      .map(r => r.getString(0) -> r).toMap
    // u0: 4 obs, 3 intervals, 3 changes, span 6
    assert(got("u0").getLong(1) == 4 && got("u0").getLong(2) == 3)
    assert(math.abs(got("u0").getDouble(5) - refRate(3, 3, 6).get) < 1e-9)
    // u1: never changes — rate = -ln((3+0.5)/(3.5))=0? n=2,x=0: -ln(2.5/2.5)=0
    assert(got("u1").getLong(2) == 0 && got("u1").getDouble(5) == 0.0)
    // u2: 4 obs, changes at 1->5 only (p,p,q,q) => x=1, span 8
    assert(got("u2").getLong(2) == 1)
    assert(math.abs(got("u2").getDouble(5) - refRate(3, 1, 8).get) < 1e-9)
    // u3: single obs — null rate
    assert(got("u3").getLong(1) == 1 && got("u3").isNullAt(5))
    // u4: null-hash row dropped — 2 obs (rounds 0,7), 1 change
    assert(got("u4").getLong(1) == 2 && got("u4").getLong(2) == 1 &&
      got("u4").getLong(3) == 0 && got("u4").getLong(4) == 7)
    assert(math.abs(got("u4").getDouble(5) - refRate(1, 1, 7).get) < 1e-9)
    // u5: two obs in one round — no interval evidence, null rate; the
    // duplicate-round pairing is still total (ordered by hash: s then t)
    assert(got("u5").getLong(1) == 2 && got("u5").getLong(2) == 1 &&
      got("u5").isNullAt(5))
  }

  test("recrawlPriority: staleness orders urls correctly; default rate for unknowns") {
    val pri = Recrawl.recrawlPriority(Recrawl.changeStats(history),
      currentRound = 10L, defaultRate = 0.05)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Double]("p_stale"), r.getAs[Double]("priority"))).toMap
    // never-changing u1 has rate 0 => p_stale 0 (age 1 doesn't matter)
    assert(pri("u1")._1 == 0.0)
    // always-changing u0 (age 4) is very stale and schedules before u2
    assert(pri("u0")._1 > pri("u2")._1)
    // priority is the negation (lower = schedules first)
    assert(pri("u0")._2 == -pri("u0")._1)
    // single-obs u3: default rate, age 6 => 1 - exp(-0.3)
    val want = BigDecimal(1.0 - math.exp(-0.05 * 6))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(pri("u3")._1 - want) < 1e-9)
  }

  test("changeStats is a single-exchange plan (agg reuses the window partitioning)") {
    val plan = Recrawl.changeStats(history).queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, plan)
  }
}
