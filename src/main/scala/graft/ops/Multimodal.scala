package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: treat image/audio/video payloads as opaque
  * binary columns with typed metadata, processed in partition-sized batches.
  *
  * The actual media decode is STUBBED (deterministically) — no image/audio
  * libraries exist in this container — but the Spark-side contract is real
  * and tested: schema, batch shape (mapPartitions with per-partition
  * codec-init amortization, the same pattern the reference uses to batch
  * embedding calls, /root/reference/src/processor.py:108-176), and
  * deterministic output so downstream ops (dedup by content hash,
  * similarity over extracted features) compose.
  */
object Multimodal {

  final case class MediaMeta(
      media_type: String, // "image" | "audio" | "video"
      width: Int,
      height: Int,
      duration_ms: Long,
      codec: String)

  final case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      content_sha256: String,
      n_bytes: Long,
      // STUB: stands in for decoded-pixel / waveform features; derived
      // deterministically from payload bytes so tests are exact
      feature: Array[Float])

  /** Attach a deterministic fake binary payload to a documents table —
    * fixture plumbing for pipelines whose real input carries media bytes.
    */
  def withFakePayload(df: DataFrame, idCol: String = "doc_id"): DataFrame =
    df.withColumn("media_type",
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(xxhash64(col(idCol)), lit(3)) + 1).cast("int")))
      .withColumn("payload", sha2(concat(col(idCol).cast("string"), lit("-payload")), 256)
        .cast("binary"))

  /** Decode + feature-extract stage. Real shape, stub decode:
    * mapPartitions so a real codec would be initialized once per partition
    * and fed record batches — swap `stubDecode` for the actual library
    * call on a cluster that has one.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame,
      featureDim: Int = 8): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media_type"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init (real codec handle would live here)
        val digest = java.security.MessageDigest.getInstance("SHA-256")
        it.map { case (id, mt, payload) =>
          val sha = digest.digest(payload).map(b => f"${b & 0xff}%02x").mkString
          MediaFeatures(id, mt, sha, payload.length.toLong,
            stubDecode(payload, featureDim))
        }
      }
  }

  /** Deterministic stand-in for pixel/waveform feature extraction. */
  private def stubDecode(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var i = 0
    while (i < dim) {
      var h = 1125899906842597L
      var j = i
      while (j < payload.length) { h = 31 * h + payload(j); j += dim }
      out(i) = ((h >>> 16) % 1000L) / 1000.0f
      i += 1
    }
    out
  }
}
