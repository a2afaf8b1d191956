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

  /** Attach deterministic fake media METADATA (dims, duration, codec) —
    * the typed columns a real ingest carries next to the payload.
    */
  def withFakeMeta(df: DataFrame, idCol: String = "doc_id"): DataFrame =
    withFakePayload(df, idCol)
      .withColumn("width", ((pmod(xxhash64(col(idCol), lit(1)), lit(8)) + 1) * 160).cast("int"))
      .withColumn("height", ((pmod(xxhash64(col(idCol), lit(2)), lit(8)) + 1) * 90).cast("int"))
      .withColumn("duration_ms",
        when(col("media_type") === "image", lit(0L))
          .otherwise((pmod(xxhash64(col(idCol), lit(3)), lit(20)) + 1) * 1000L))
      .withColumn("codec",
        when(col("media_type") === "image", lit("png"))
          .when(col("media_type") === "audio", lit("opus"))
          .otherwise(lit("h264")))

  /** Frame sampling for video rows: one output row per sampled timestamp
    * (every `everyMs`, starting at 0, inclusive of t=0). The EXPLODE is
    * fully declarative — `posexplode(sequence(...))` over the metadata
    * duration, codegen'd, no UDF — so Catalyst prunes/pushes around it and
    * the payload column is carried, not shuffled, until a downstream op
    * needs it. The per-frame decode is the stub (a real pipeline swaps the
    * frame-payload expression for a codec call inside the downstream
    * feature stage; frame extraction itself stays this plan shape).
    *
    * Output: (doc_id, frame_idx, frame_ts_ms, frame_payload).
    */
  def sampleFrames(media: DataFrame, everyMs: Long = 1000L): DataFrame =
    media.filter(col("media_type") === "video" && col("duration_ms") > 0)
      .select(col("doc_id"), col("payload"), col("duration_ms"),
        // sample in [0, duration): a clip of duration d has no frame AT
        // t = d — a real decoder would hit EOF there — so the last sampled
        // timestamp is the largest multiple of everyMs strictly below d
        posexplode(sequence(lit(0L),
          floor((col("duration_ms") - 1) / lit(everyMs)).cast("long"))))
      .withColumn("frame_idx", col("pos").cast("int"))
      .withColumn("frame_ts_ms", col("col") * lit(everyMs))
      // STUB decode: deterministic per-frame bytes derived from payload+idx
      .withColumn("frame_payload",
        sha2(concat(col("payload"), col("frame_idx").cast("string")), 256).cast("binary"))
      .select(col("doc_id"), col("frame_idx"), col("frame_ts_ms"), col("frame_payload"))

  /** Resize stage for image rows: mapPartitions batch shape (a real image
    * library initializes its decoder once per partition and processes the
    * partition as a batch — same contract as [[extractFeatures]]); the
    * pixel resample is the stub. Metadata is updated for real: downstream
    * consumers see the target dims.
    */
  def resizeImages(spark: SparkSession, media: DataFrame,
      targetW: Int, targetH: Int): DataFrame = {
    import spark.implicits._
    media.filter(col("media_type") === "image")
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init (real decoder/encoder handle would live here)
        val digest = java.security.MessageDigest.getInstance("SHA-256")
        it.map { case (id, payload) =>
          // STUB resample: deterministic bytes keyed by payload + dims
          val resized = digest.digest(
            payload ++ s"-${targetW}x$targetH".getBytes("UTF-8"))
          (id, targetW, targetH, resized)
        }
      }
      .toDF("doc_id", "width", "height", "payload")
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
