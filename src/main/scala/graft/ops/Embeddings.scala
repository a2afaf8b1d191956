package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Pluggable batch embedding enricher — the Spark re-expression of the
  * reference's async embedding client (/root/reference/src/embedding.py:
  * 13-254: batch the texts, call the service, retry transient failures,
  * attach vectors). The service itself does not exist in this sandbox, so
  * the default client is a DETERMINISTIC STUB (hash-seeded unit vector);
  * everything Spark-side — per-partition batching, the bounded-retry
  * envelope, the output schema — is real and spec-tested, and a real
  * client is a drop-in `Seq[String] => Seq[Array[Float]]`.
  *
  * mapPartitions keeps the batching executor-local: at 100 TB each
  * partition issues |partition|/batchSize sequential calls with no driver
  * involvement and no shuffle (narrow dependency).
  */
object Embeddings {

  /** Deterministic stub client: splitmix64-expanded, L2-normalized vector
    * per text. Stable across JVMs/runs (seeded by FNV-1a of the text).
    */
  def stubClient(dim: Int): Seq[String] => Seq[Array[Float]] = texts =>
    texts.map { t =>
      var z = Sketches.hashString(if (t == null) "" else t)
      val v = new Array[Float](dim)
      var i = 0
      var norm = 0.0
      while (i < dim) {
        // Sketches.mix IS splitmix64 (golden-ratio step + finalizer) — one
        // shared implementation, stream identical to the prior inline copy
        val x = Sketches.mix(z)
        z += 0x9e3779b97f4a7c15L
        v(i) = ((x.toDouble / Long.MaxValue.toDouble)).toFloat
        norm += v(i).toDouble * v(i)
        i += 1
      }
      val inv = (1.0 / math.sqrt(math.max(norm, 1e-12))).toFloat
      i = 0
      while (i < dim) { v(i) *= inv; i += 1 }
      v
    }

  /** Enrich (id, text) rows with an embedding column. `client` is called
    * once per ≤batchSize texts; a failed call is retried up to `maxRetries`
    * times (embedding.py's bounded-retry loop) before the error propagates
    * and fails the task — Spark then retries the task, matching the
    * reference's fail-the-batch behavior.
    */
  def enrich(
      df: DataFrame,
      textCol: String,
      idCol: String,
      dim: Int = 64,
      batchSize: Int = 32,
      maxRetries: Int = 2,
      client: Seq[String] => Seq[Array[Float]] = null): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val c = if (client == null) stubClient(dim) else client
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          val texts = batch.map(_._2)
          var attempt = 0
          var out: Seq[Array[Float]] = null
          var lastErr: Throwable = null
          while (out == null && attempt <= maxRetries) {
            // a null RETURN counts as a failed attempt too — a client that
            // reports failure by returning null (instead of throwing) must
            // not spin this loop forever inside the task
            try {
              out = c(texts)
              if (out == null) {
                lastErr = new IllegalStateException("embedding client returned null")
                attempt += 1
              }
            } catch { case scala.util.control.NonFatal(e) => lastErr = e; attempt += 1 }
          }
          if (out == null) throw lastErr
          require(out.length == batch.length,
            s"embedding client returned ${out.length} vectors for ${batch.length} texts")
          batch.iterator.zip(out.iterator).map { case ((id, _), v) => (id, v) }
        }
      }
      .toDF(idCol, "embedding")
  }
}
