package graft

import graft.fixtures.{FixtureConfig, FixtureGen}
import graft.sources.PagesTable
import org.apache.spark.sql.functions._

/** Bucketed pages table: the fetch join must not exchange the pages side
  * once the table is bucketed by url — the plan shape that survives when
  * the schedule outgrows broadcast at 10^10-URL scale.
  */
class BucketedPagesSpec extends SparkTestBase {

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("fetch join on a bucketed pages table exchanges only the schedule side") {
    import spark.implicits._
    val cfg = FixtureConfig(seed = 7L, hosts = 4, totalDetails = 400)
    val raw = FixtureGen.pages(spark, cfg, partitions = 4).toDF()
    val path = java.nio.file.Files.createTempDirectory("graft-bucketed").toString
    PagesTable.writeBucketed(spark, raw, "pages_bucketed", path, buckets = 8)

    // plain filter on the schedule side — contributes no exchange of its own
    val schedule = raw.select($"url").filter(length($"url") % 2 === 0)

    def fetchJoin(pages: org.apache.spark.sql.DataFrame) =
      schedule.join(pages.select($"url", $"html"), Seq("url"))

    // count Exchange NODES (formatted explain prints each node twice:
    // once in the tree, once as a "(N) Exchange" detail header)
    def exchanges(p: String) = """\(\d+\) Exchange""".r.findAllIn(p).size

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      val bucketedPlan = planOf(fetchJoin(spark.table("pages_bucketed")))
      val plainPlan = planOf(fetchJoin(raw))
      assert(bucketedPlan.contains("Bucketed: true"), s"scan not bucketed:\n$bucketedPlan")
      assert(exchanges(plainPlan) == 2, s"plain join should shuffle both sides:\n$plainPlan")
      assert(exchanges(bucketedPlan) == 1,
        s"bucketed join must exchange only the schedule side:\n$bucketedPlan")

      // results identical either way
      val a = fetchJoin(spark.table("pages_bucketed")).count()
      val b = fetchJoin(raw).count()
      assert(a == b && a > 0)

      // cross-session rebinding: drop the catalog entry, re-attach via
      // external DDL, and the exchange-free plan survives
      val bound = PagesTable.bind(spark, "pages_bucketed", path, buckets = 8)
      val reboundPlan = planOf(fetchJoin(bound))
      assert(exchanges(reboundPlan) == 1,
        s"rebound table lost its bucket spec:\n$reboundPlan")
      assert(fetchJoin(bound).count() == a)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS pages_bucketed")
    }
  }
}
