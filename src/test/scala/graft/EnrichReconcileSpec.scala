package graft

import graft.frontier.Reconcile
import graft.ops.Embeddings
import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets

/** Embedding-enricher envelope (batch/retry/schema) + the two-phase
  * reconcile job.
  */
class EnrichReconcileSpec extends SparkTestBase {

  test("embeddings: deterministic stub, unit norm, stable across runs") {
    import spark.implicits._
    val df = (1 to 50).map(i => (i.toLong, s"text number $i")).toDF("id", "t")
    val a = Embeddings.enrich(df, "t", "id", dim = 16, batchSize = 8)
      .as[(Long, Array[Float])].collect().toMap
    val b = Embeddings.enrich(df.repartition(5), "t", "id", dim = 16, batchSize = 3)
      .as[(Long, Array[Float])].collect().toMap
    assert(a.keySet == (1 to 50).map(_.toLong).toSet)
    (1 to 50).map(_.toLong).foreach { id =>
      assert(a(id).toSeq == b(id).toSeq, s"batching/partitioning changed vector $id")
      val norm = math.sqrt(a(id).map(x => x.toDouble * x).sum)
      assert(math.abs(norm - 1.0) < 1e-3)
    }
  }

  test("embeddings: transient client failures are retried, then propagate") {
    import spark.implicits._
    val df = (1 to 20).map(i => (i.toLong, s"t$i")).toDF("id", "t")

    // fails the first call per JVM-task invocation, then succeeds
    val flaky: Seq[String] => Seq[Array[Float]] = {
      val failed = new java.util.concurrent.atomic.AtomicBoolean(false)
      texts =>
        if (failed.compareAndSet(false, true))
          throw new RuntimeException("transient")
        else Embeddings.stubClient(4)(texts)
    }
    val ok = Embeddings.enrich(df.repartition(1), "t", "id", dim = 4,
      batchSize = 100, maxRetries = 2, client = flaky)
    assert(ok.count() == 20)

    val alwaysFail: Seq[String] => Seq[Array[Float]] =
      _ => throw new RuntimeException("permanent")
    val err = intercept[Exception] {
      Embeddings.enrich(df.repartition(1), "t", "id", dim = 4,
        batchSize = 100, maxRetries = 1, client = alwaysFail).count()
    }
    assert(err.getMessage != null)
  }

  test("reconcile: corrupted index recovers all fetchable urls in <= 2 phases") {
    import spark.implicits._
    def url(i: Int) = s"https://h0.example.ir/opinions/Detail?IdeaId=$i"
    def body(i: Int, err: Boolean) =
      (if (err) "<html>خطایی رخ داده است</html>"
       else s"<html><body><div>doc $i</div></body></html>").getBytes(StandardCharsets.UTF_8)

    // pages: 1-20 ok, 21-22 error pages; expected additionally wants 23-24
    // (absent from pages entirely)
    val pages = ((1 to 20).map(i => (url(i), body(i, err = false))) ++
      (21 to 22).map(i => (url(i), body(i, err = true))))
      .toDF("url", "html")
    val expected = (1 to 24).map(url).toDF("url")
    // corrupted index: only urls 1-10 present
    val indexed0 = (1 to 10).map(url).toDF("url")

    val rep = Reconcile.run(spark, pages, expected, indexed0, maxPhases = 3)
    assert(rep.recoveredCount == 10) // 11-20 recovered
    assert(rep.stillMissing == 4) // 21-22 error pages + 23-24 absent
    assert(rep.phases == 2) // phase 1 repairs, phase 2 verifies no shrink
    val after = rep.indexedAfter.collect().map(_.getString(0)).toSet
    assert(after == (1 to 20).map(url).toSet)
    // recovered rows are real extraction output keyed by IdeaId
    val recIds = rep.recovered.select(col("file_id")).collect().map(_.getString(0)).toSet
    assert(recIds == (11 to 20).map(_.toString).toSet)
  }

  test("J7 upsert: matched keys replaced, new keys appended, rest kept") {
    import spark.implicits._
    val base = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30)).toDF("k", "v", "n")
    val updates = Seq((2L, "B2", 99), (4L, "d", 40)).toDF("k", "v", "n")
    val merged = graft.ops.Merge.upsertByKey(base, updates, "k")
      .as[(Long, String, Int)].collect().sortBy(_._1).toSeq
    assert(merged == Seq((1L, "a", 10), (2L, "B2", 99), (3L, "c", 30), (4L, "d", 40)))

    // store-level: upsert against the latest snapshot survives commit/read
    val root = java.nio.file.Files.createTempDirectory("graft-upsert").toString
    val store = new graft.store.FrontierStore(spark, root)
    store.commit(0, Map("docs" -> base))
    val v1 = store.mergedWithLatest("docs", updates, "k")
    store.commit(1, Map("docs" -> v1))
    val back = store.read(store.latest().get, "docs")
      .as[(Long, String, Int)].collect().sortBy(_._1).toSeq
    assert(back == Seq((1L, "a", 10), (2L, "B2", 99), (3L, "c", 30), (4L, "d", 40)))
  }

  test("round observation: free-rider metrics match exact counts") {
    import spark.implicits._
    def url(i: Int) = s"https://h${i % 3}.example.ir/opinions/Detail?IdeaId=$i"
    val pages = (1 to 30)
      .map(i => (url(i), s"<html><body><div>d$i</div></body></html>"
        .getBytes(StandardCharsets.UTF_8)))
      .toDF("url", "html")
    val frontier = graft.frontier.FrontierRound.toFrontier(spark,
      (1 to 40).map(i => (url(i), 1.0)).toDF("url", "priority"), 0)
    val out = graft.frontier.FrontierRound.run(spark, pages, frontier, None, 0,
      cfg = graft.frontier.PolitenessConfig(defaultBudget = 1000, saltBuckets = 4))
    val n = out.results.count()
    val m = out.observation.get
    assert(m("scheduled") == n)
    assert(m("fetched_ok") == 30L)
    val exactHosts = out.results.select(countDistinct(col("host"))).collect()(0).getLong(0)
    val approxHosts = m("hosts_approx").asInstanceOf[Long]
    assert(math.abs(approxHosts - exactHosts) <= math.max(1L, exactHosts / 10))
    out.caches.foreach(_.unpersist(false))
  }
}
