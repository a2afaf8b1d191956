package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-mix construction — deterministic, engine-portable sampling:
  * per-source mixture weighting (the Pile/Dolma-style recipe of "x% of
  * domain A, y% of B") and train/val/test splitting. Every decision is a
  * pure function of (id, salt) via an md5 unit draw, so a re-run, a
  * different engine, or an incremental batch makes the SAME decisions —
  * no RNG state, no sampling drift between corpus versions, and a doc's
  * split never changes when the corpus grows (the property
  * `df.sample()`/rand() cannot give). All pure codegen'd projections:
  * sampling a 100 TB corpus is one shuffle-free scan.
  */
object Mix {

  /** Deterministic U[0,1) draw from (id, salt): the first 8 md5 hex chars
    * as uint32 / 2^32. Exact in IEEE doubles (integer ≤ 2^32 divided by a
    * power of two), so engine comparisons against literal thresholds are
    * reproducible bit-for-bit. Distinct salts give independent draws —
    * use one salt per decision so e.g. sampling and splitting don't
    * correlate.
    */
  def unitDraw(id: Column, salt: String): Column =
    conv(substring(md5(concat(id.cast("string"), lit(salt))), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)

  /** Weighted per-source downsampling: keep each doc with its source's
    * probability (sources absent from `weights` keep `defaultWeight`).
    * The weight table rides the plan as a literal CASE chain — nothing
    * broadcasts, nothing shuffles.
    */
  def sampleBySource(docs: DataFrame, weights: Map[String, Double],
      sourceCol: String, idCol: String, defaultWeight: Double = 1.0,
      salt: String = "mix"): DataFrame = {
    require(weights.values.forall(w => w >= 0.0 && w <= 1.0) &&
      defaultWeight >= 0.0 && defaultWeight <= 1.0)
    val w = weights.foldLeft(lit(defaultWeight)) { case (acc, (s, p)) =>
      when(col(sourceCol) === s, lit(p)).otherwise(acc)
    }
    docs.filter(unitDraw(col(idCol), salt) < w)
  }

  /** Train/val/test labels by cumulative unit-draw fractions: a doc's
    * label is stable under corpus growth and identical across engines.
    */
  def assignSplit(docs: DataFrame, idCol: String, valFrac: Double,
      testFrac: Double, salt: String = "split"): DataFrame = {
    require(valFrac >= 0 && testFrac >= 0 && valFrac + testFrac <= 1.0)
    val u = unitDraw(col(idCol), salt)
    docs.withColumn("split",
      when(u < valFrac, lit("val"))
        .when(u < valFrac + testFrac, lit("test"))
        .otherwise(lit("train")))
  }
}
