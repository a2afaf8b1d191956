package graft

import org.apache.spark.sql.Observation

/** The one place the "ride a count on an Observation" pattern reads its
  * result. Three call sites (the crawl loop's frontier-drained test, the
  * round's lazy schedule count, clusterAssign's convergence count) grew
  * hand-rolled copies of `Await.result(obs.future, 30s)` with DIVERGING
  * timeout policies — this centralizes the wait, the null handling (a sum
  * over zero rows observes null), and the unsupported-runtime latch.
  *
  * Latch semantics: when `latchOnTimeout` and the wait times out, a
  * process-wide flag flips and EVERY subsequent read (any site) goes
  * straight to its fallback — a runtime that doesn't deliver observed
  * metrics for these action types won't start doing so mid-process, and
  * without the latch an iterative caller would stall the full timeout on
  * every iteration. Pass `latchOnTimeout = false` from sites that await
  * an action that may legitimately still be RUNNING (e.g. the bloom
  * build's cache-population guard waits for the round's big job): there a
  * timeout means "slow job", not "unsupported runtime", and the fallback
  * is already correct.
  */
object ObservedMetrics {
  @volatile private var supported = true

  /** True until a latching read has timed out (test/diagnostic hook). */
  def observationsSupported: Boolean = supported

  // one body for every typed reader — the wait/null/latch logic MUST NOT
  // fork per numeric type (this module exists because call sites diverged)
  private def read[T](obs: Observation, field: String, timeoutSecs: Int,
      latchOnTimeout: Boolean, conv: Number => T, zero: T)(fallback: => T): T =
    if (!supported) fallback
    else
      try {
        val row = scala.concurrent.Await.result(obs.future,
          scala.concurrent.duration.Duration(timeoutSecs,
            java.util.concurrent.TimeUnit.SECONDS))
        val v = row.get(row.fieldIndex(field))
        if (v == null) zero else conv(v.asInstanceOf[Number])
      } catch {
        case _: java.util.concurrent.TimeoutException =>
          if (latchOnTimeout) supported = false
          fallback
      }

  def longField(obs: Observation, field: String, timeoutSecs: Int = 30,
      latchOnTimeout: Boolean = true)(fallback: => Long): Long =
    read(obs, field, timeoutSecs, latchOnTimeout, _.longValue(), 0L)(fallback)

  /** Double twin of [[longField]] (LinkRank's per-iteration dangling-mass
    * ride). Same null ⇒ 0 and latch semantics.
    */
  def doubleField(obs: Observation, field: String, timeoutSecs: Int = 30,
      latchOnTimeout: Boolean = true)(fallback: => Double): Double =
    read(obs, field, timeoutSecs, latchOnTimeout, _.doubleValue(), 0.0)(fallback)
}
