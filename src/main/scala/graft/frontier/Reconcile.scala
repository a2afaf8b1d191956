package graft.frontier

import graft.extract.Extractor
import graft.url.Urls
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Two-phase reconcile job — the composed library form of the reference's
  * check-and-repair pass (/root/reference/src/check_pages.py:553-712):
  * missing = expected − indexed (J5's split), refetch the missing from the
  * pages table, re-extract and verify, fold the recovered rows back in, and
  * iterate until the missing set stops shrinking (only genuinely
  * unfetchable URLs remain) or `maxPhases` hits. SURVEY.md §3.3 calls this
  * the blueprint of the round loop; here it is its own entry point over any
  * (expected, indexed) pair — e.g. a corrupted results table after a
  * partial failure.
  *
  * Every step is an anti-join / join on url: at scale the expected and
  * indexed tables shuffle once per phase and the pages side joins on its
  * own partitioning (or broadcast of the missing side, which is small by
  * construction after phase 1).
  */
object Reconcile {

  final case class ReconcileReport(
      phases: Int,
      recoveredCount: Long,
      stillMissing: Long, // urls absent from pages or error pages — unfixable
      recovered: DataFrame, // Extracted-shaped rows recovered by the job
      indexedAfter: DataFrame) // url column: indexed0 ∪ recovered

  def run(
      spark: SparkSession,
      pages: DataFrame, // (url, html, ...)
      expectedUrls: DataFrame, // single column url
      indexed0: DataFrame, // single column url (possibly corrupted/partial)
      maxPhases: Int = 2): ReconcileReport = {
    import spark.implicits._

    var indexed = indexed0.select(col("url")).localCheckpoint(true)
    var recovered: Option[DataFrame] = None
    var phase = 0
    var prevMissing = Long.MaxValue
    var missingNow = -1L

    while (phase < maxPhases && missingNow != 0L && missingNow < prevMissing) {
      prevMissing = if (missingNow < 0) Long.MaxValue else missingNow
      val missing = expectedUrls.select(col("url"))
        .join(indexed, Seq("url"), "left_anti")
      // refetch: join the pages table, classify, re-extract the fetchable
      val refetched = missing
        .join(pages.select(col("url"), col("html")), Seq("url"), "left")
        .withColumn("status",
          when(col("html").isNull, lit("missing"))
            .when(decode(col("html"), "UTF-8").contains(Extractor.ErrorSentinel),
              lit("error_page"))
            .otherwise(lit("ok")))
      val recoveredNow = refetched.filter(col("status") === "ok")
        .select(col("url"), col("html"))
        .as[(String, Array[Byte])]
        .map { case (u, h) =>
          Extractor.extractBytes(u, Urls.ideaId(u).getOrElse(Urls.sha256Hex(u)), h)
        }
        .toDF()
        .localCheckpoint(true)
      recovered = Some(recovered.map(_.union(recoveredNow)).getOrElse(recoveredNow))
      indexed = indexed.union(recoveredNow.select(col("url"))).localCheckpoint(true)
      // re-verify: what is STILL not indexed after the repair
      missingNow = expectedUrls.select(col("url"))
        .join(indexed, Seq("url"), "left_anti").count()
      phase += 1
    }

    val rec = recovered.getOrElse(
      spark.emptyDataset[graft.model.Extracted].toDF())
    ReconcileReport(phase, rec.count(), math.max(missingNow, 0L), rec, indexed)
  }
}
