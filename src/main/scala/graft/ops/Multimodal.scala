package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
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

  /** REAL byte-level image-header decode — no stub. Format dispatch on
    * magic bytes and dimension extraction straight from the binary payload
    * column, entirely in JVM expressions (no UDF, no shuffle — a narrow
    * projection that stays in the scan stage). At 100 TB this is the
    * "read metadata without decoding pixels" pass an ingest runs before
    * size-partitioning / filtering a media corpus.
    *
    * Formats:
    *  - PNG — IHDR chunk at fixed offset: big-endian u32 dims at bytes
    *    17-24 (codegen'd hex/conv/substring).
    *  - GIF87a/89a — logical screen descriptor: little-endian u16 dims at
    *    bytes 7-10 (codegen'd; the LE decode is a hex byte-swap).
    *  - JPEG — dims live in the SOF frame header at a VARIABLE offset, so
    *    the parser walks FF-marker segments as a bounded `aggregate` fold
    *    over the state (offset, w, h): skip each non-SOF segment by its
    *    big-endian length field, stop at the first SOF0-SOF15 (minus
    *    DHT/JPG/DAC which reuse the C4/C8/CC codes). SOF precedes SOS in
    *    every legal stream, so entropy-coded scan data is never touched;
    *    `maxJpegSegments` bounds the fold (JFIF/EXIF + quant + Huffman
    *    preambles fit in well under 32 segments). The fold is a
    *    higher-order function (CodegenFallback, still expression-tree —
    *    no UDF, nothing leaves the row).
    *
    * Unknown/corrupt/truncated payloads yield img_format="unknown" or
    * null dims — never an error. Output: input columns + img_format,
    * img_width, img_height. Validated in OpsSpec against REAL bytes
    * encoded by the JDK's own ImageIO writers.
    */
  def imageMeta(df: DataFrame, payloadCol: String = "payload",
      maxJpegSegments: Int = 32): DataFrame = {
    require(!df.columns.contains("__jd"),
      "imageMeta uses __jd as a scratch column; rename the input's __jd")
    val p = col(payloadCol)
    val fmt =
      when(hex(substring(p, 1, 8)) === "89504E470D0A1A0A", "png")
        .when(hex(substring(p, 1, 6)).isin("474946383961", "474946383761"), "gif")
        .when(hex(substring(p, 1, 2)) === "FFD8", "jpeg")
        .otherwise("unknown")
    def beU32(pos: Int): Column =
      conv(hex(substring(p, pos, 4)), 16, 10).cast("int")
    def leU16(pos: Int): Column = leUInt(p, lit(pos), 2).cast("int")
    val pngOk = length(p) >= 24 && hex(substring(p, 13, 4)) === "49484452"
    val gifOk = length(p) >= 10
    val jd = col("__jd")
    val width =
      when(col("img_format") === "png" && pngOk, beU32(17))
        .when(col("img_format") === "gif" && gifOk, leU16(7))
        .when(col("img_format") === "jpeg" && jd.getField("w") >= 0,
          jd.getField("w"))
    val height =
      when(col("img_format") === "png" && pngOk, beU32(21))
        .when(col("img_format") === "gif" && gifOk, leU16(9))
        .when(col("img_format") === "jpeg" && jd.getField("w") >= 0,
          jd.getField("h"))
    df.withColumn("img_format", fmt)
      // project the fold ONCE to a temp column: width/height each read a
      // field of it, and a HOF re-evaluates per consumer if left inline
      .withColumn("__jd",
        when(col("img_format") === "jpeg", jpegSof(p, maxJpegSegments)))
      .withColumn("img_width", width)
      .withColumn("img_height", height)
      .drop("__jd")
  }

  /** SOF0-SOF15 marker codes minus C4 (DHT), C8 (JPG ext), CC (DAC). */
  private val JpegSofMarkers = Seq(
    0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
    0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF)

  /** The bounded JPEG segment walk: folds (off, w, h) over up to
    * `maxSegments` steps; off starts at 3 (1-based position of the first
    * post-SOI marker byte), w = -1 means "SOF not found yet", a null off
    * is the stuck/corrupt state (non-FF where a marker must be, or not
    * enough bytes left for a SOF read). `p` MUST be an attribute — a HOF
    * lambda re-evaluates captured non-attribute expressions per element.
    */
  private def jpegSof(p: Column, maxSegments: Int): Column = {
    def state(off: Column, w: Column, h: Column): Column =
      struct(off.cast("long").as("off"), w.cast("int").as("w"),
        h.cast("int").as("h"))
    val fail = state(lit(null), lit(-1), lit(-1))
    aggregate(
      sequence(lit(1), lit(maxSegments)),
      state(lit(3L), lit(-1), lit(-1)),
      (st, _) => {
        val off = st.getField("off")
        val iOff = off.cast("int")
        val marker = conv(hex(p.substr(iOff + 1, lit(1))), 16, 10).cast("int")
        val segLen = conv(hex(p.substr(iOff + 2, lit(2))), 16, 10).cast("long")
        when(st.getField("w") >= 0, st) // found: carry through remaining steps
          .when(off.isNull || off + 8L > length(p).cast("long") ||
            hex(p.substr(iOff, lit(1))) =!= "FF", fail)
          .when(marker.isin(JpegSofMarkers: _*),
            // SOF layout: FF Cx len(2) precision(1) height(2 BE) width(2 BE)
            state(off,
              conv(hex(p.substr(iOff + 7, lit(2))), 16, 10),
              conv(hex(p.substr(iOff + 5, lit(2))), 16, 10)))
          .otherwise(state(off + 2L + segLen, lit(-1), lit(-1)))
      })
  }

  /** REAL byte-level audio-header decode — the WAV/RIFF sibling of
    * [[imageMeta]]. Walks RIFF chunks (id, little-endian u32 size, padded
    * to even) from byte 13 as a bounded `aggregate` fold collecting BOTH
    * the `fmt ` chunk (audio format tag, channels, sample rate, bits per
    * sample at fixed offsets within the chunk) and the `data` chunk size,
    * from which duration follows: data bytes / (rate · channels · bits/8).
    * Same scale shape as imageMeta: narrow projection, no UDF, no shuffle;
    * non-RIFF/corrupt payloads yield audio_format="unknown"/null fields.
    * Output: input columns + audio_format, audio_channels,
    * audio_sample_rate, audio_bits, audio_duration_ms. Validated in
    * OpsSpec against REAL bytes from the JDK's javax.sound.sampled writer.
    */
  def audioMeta(df: DataFrame, payloadCol: String = "payload",
      maxChunks: Int = 16): DataFrame = {
    require(!df.columns.contains("__wd"),
      "audioMeta uses __wd as a scratch column; rename the input's __wd")
    val p = col(payloadCol)
    val isWav = length(p) >= 44 &&
      hex(substring(p, 1, 4)) === "52494646" && // "RIFF"
      hex(substring(p, 9, 4)) === "57415645" // "WAVE"
    val fmt = when(isWav, "wav").otherwise("unknown")
    val st = col("__wd")
    val found = st.getField("ch") >= 0
    def f(field: String): Column =
      when(col("audio_format") === "wav" && found, st.getField(field))
    val denom = st.getField("rate") * st.getField("ch") *
      (st.getField("bits") / 8)
    df.withColumn("audio_format", fmt)
      .withColumn("__wd", when(isWav, wavChunks(p, maxChunks)))
      .withColumn("audio_channels", f("ch"))
      .withColumn("audio_sample_rate", f("rate").cast("int"))
      .withColumn("audio_bits", f("bits"))
      .withColumn("audio_duration_ms",
        when(col("audio_format") === "wav" && found &&
          st.getField("dsz") >= 0 && denom > 0,
          // Column./ is double division; floor restores integral ms
          floor(st.getField("dsz") * 1000L / denom).cast("long")))
      .drop("__wd")
  }

  /** The bounded RIFF chunk walk: state (off, ch, rate, bits, dsz); ch/dsz
    * = -1 until their chunks are seen, null off = stuck/corrupt. `p` MUST
    * be an attribute (HOF lambda capture rule, see [[jpegSof]]).
    */
  /** Little-endian unsigned int read off a binary column: bytes at 1-based
    * `pos` .. pos+n-1, least-significant first (hex byte-swap, one conv).
    * Shared by the GIF screen descriptor and every RIFF field.
    */
  private def leUInt(p: Column, pos: Column, n: Int): Column =
    conv(concat((n to 1 by -1).map(i => hex(p.substr(pos + (i - 1), lit(1)))): _*),
      16, 10).cast("long")

  private def wavChunks(p: Column, maxChunks: Int): Column = {
    def leU(pos: Column, n: Int): Column = leUInt(p, pos, n)
    def state(off: Column, ch: Column, rate: Column, bits: Column,
        dsz: Column): Column =
      struct(off.cast("long").as("off"), ch.cast("int").as("ch"),
        rate.cast("long").as("rate"), bits.cast("int").as("bits"),
        dsz.cast("long").as("dsz"))
    val fail = state(lit(null), lit(-1), lit(-1), lit(-1), lit(-1))
    aggregate(
      sequence(lit(1), lit(maxChunks)),
      state(lit(13L), lit(-1), lit(-1), lit(-1), lit(-1)), // first chunk after RIFF hdr
      (st, _) => {
        val off = st.getField("off")
        val iOff = off.cast("int")
        val id = hex(p.substr(iOff, lit(4)))
        val size = leU(iOff + 4, 4)
        // RIFF pads odd-sized chunks to even
        val next = off + 8L + size + pmod(size, lit(2L))
        val done = st.getField("ch") >= 0 && st.getField("dsz") >= 0
        when(done, st)
          .when(off.isNull || off + 8L > length(p).cast("long") + 1L, fail)
          .when(id === "666D7420" && off + 24L <= length(p).cast("long") + 1L,
            // "fmt ": tag u16 @+8 (unused), ch u16 @+10, rate u32 @+12,
            // byterate u32 @+16, align u16 @+20, bits u16 @+22
            state(next, leU(iOff + 10, 2), leU(iOff + 12, 4),
              leU(iOff + 22, 2), st.getField("dsz")))
          .when(id === "64617461", // "data": size is the sample byte count
            state(next, st.getField("ch"), st.getField("rate"),
              st.getField("bits"), size))
          .otherwise(state(next, st.getField("ch"), st.getField("rate"),
            st.getField("bits"), st.getField("dsz")))
      })
  }

  /** REAL byte-level video-container metadata — the MP4/ISO-BMFF sibling
    * of [[imageMeta]]/[[audioMeta]], replacing the video half of the stub
    * surface. One bounded `aggregate` fold walks the box tree: every box
    * is [u32 BE size][4-byte type] (size 1 → a u64 "largesize" follows;
    * size 0 → box runs to EOF), container boxes' children start right
    * after the header, and siblings are contiguous — so the walk ENTERS
    * the two containers on the metadata path (`moov`, `trak`) and SKIPS
    * every other box by its declared size (`mdat` before `moov`, the
    * common non-faststart layout, costs one step). Captured:
    *  - `mvhd` (moov child): movie timescale + duration (version 0/1
    *    layouts), → video_duration_ms = duration·1000/timescale;
    *  - the first `tkhd` whose 16.16-fixed width is nonzero (audio traks
    *    carry 0×0) → video_width/height.
    * Pixel/sample data is never touched — the fold reads a few dozen
    * header bytes no matter the payload size, the same "metadata without
    * decoding" scale shape as the image/audio passes. Non-MP4, corrupt,
    * or truncated payloads yield video_format="unknown"/null fields.
    * Output: input columns + video_format, video_width, video_height,
    * video_duration_ms. Validated in OpsSpec against hand-muxed
    * structurally-valid boxes (both mvhd/tkhd versions, extended sizes,
    * audio-before-video trak order, truncation).
    */
  def videoMeta(df: DataFrame, payloadCol: String = "payload",
      maxBoxes: Int = 64): DataFrame = {
    require(!df.columns.contains("__vd"),
      "videoMeta uses __vd as a scratch column; rename the input's __vd")
    val p = col(payloadCol)
    val isMp4 = length(p) >= 16 && hex(substring(p, 5, 4)) === "66747970" // "ftyp"
    val st = col("__vd")
    val tsFound = st.getField("ts") > 0
    val dimFound = st.getField("w") > 0
    df.withColumn("video_format", when(isMp4, "mp4").otherwise("unknown"))
      .withColumn("__vd", when(isMp4, mp4Boxes(p, maxBoxes)))
      .withColumn("video_width",
        when(col("video_format") === "mp4" && dimFound,
          st.getField("w").cast("int")))
      .withColumn("video_height",
        when(col("video_format") === "mp4" && dimFound,
          st.getField("h").cast("int")))
      .withColumn("video_duration_ms",
        when(col("video_format") === "mp4" && tsFound &&
          st.getField("dur") >= 0,
          // Column./ is double division; floor restores integral ms
          floor(st.getField("dur") * 1000L / st.getField("ts")).cast("long")))
      .drop("__vd")
  }

  /** The bounded ISO-BMFF box walk: state (off, ts, dur, w, h); ts/w = -1
    * until mvhd / a video tkhd is seen, null off = walk ended (EOF,
    * truncation, or an undersized box — found fields survive). `p` MUST be
    * an attribute (HOF lambda capture rule, see [[jpegSof]]).
    */
  private def mp4Boxes(p: Column, maxBoxes: Int): Column = {
    def beU(pos: Column, n: Int): Column =
      conv(hex(p.substr(pos, lit(n))), 16, 10).cast("long")
    def state(off: Column, ts: Column, dur: Column, w: Column,
        h: Column): Column =
      struct(off.cast("long").as("off"), ts.cast("long").as("ts"),
        dur.cast("long").as("dur"), w.cast("long").as("w"),
        h.cast("long").as("h"))
    aggregate(
      sequence(lit(1), lit(maxBoxes)),
      state(lit(1L), lit(-1L), lit(-1L), lit(-1L), lit(-1L)),
      (st, _) => {
        val off = st.getField("off")
        val iOff = off.cast("int")
        val eof = length(p).cast("long") + 1L // 1-based one-past-end
        val size32 = beU(iOff, 4)
        val typ = hex(p.substr(iOff + 4, lit(4)))
        val hdr = when(size32 === 1L, 16L).otherwise(lit(8L))
        val size = when(size32 === 1L, beU(iOff + 8, 8))
          .when(size32 === 0L, eof - off)
          .otherwise(size32)
        val next = off + size
        val pay = iOff + hdr.cast("int") // 1-based payload (version byte) pos
        val v1 = beU(pay, 1) === 1L
        val ended = state(lit(null), st.getField("ts"), st.getField("dur"),
          st.getField("w"), st.getField("h"))
        val done = st.getField("ts") > 0L && st.getField("w") > 0L
        val tkhdW = when(v1, beU(pay + 88, 2)).otherwise(beU(pay + 76, 2))
        val tkhdH = when(v1, beU(pay + 92, 2)).otherwise(beU(pay + 80, 2))
        when(done || off.isNull, st)
          .when(off + 8L > eof || size < hdr, ended)
          // containers are ENTERED with only their header present — a
          // truncated payload still yields every field read before the cut
          .when(typ.isin("6D6F6F76", "7472616B"), // moov, trak: enter
            state(off + hdr, st.getField("ts"), st.getField("dur"),
              st.getField("w"), st.getField("h")))
          .when(next > eof, ended) // leaf/capture box extends past the cut
          .when(typ === "6D766864" && // mvhd: timescale + duration, v0/v1
            size >= hdr + when(v1, 32L).otherwise(lit(20L)), // undersized → skip
            state(next,
              when(v1, beU(pay + 20, 4)).otherwise(beU(pay + 12, 4)),
              when(v1, beU(pay + 24, 8)).otherwise(beU(pay + 16, 4)),
              st.getField("w"), st.getField("h")))
          .when(typ === "746B6864" && st.getField("w") <= 0L &&
            size >= hdr + when(v1, 96L).otherwise(lit(84L)) && tkhdW > 0L,
            // tkhd with nonzero 16.16 width = the first video trak
            state(next, st.getField("ts"), st.getField("dur"), tkhdW, tkhdH))
          .otherwise(state(next, st.getField("ts"), st.getField("dur"),
            st.getField("w"), st.getField("h")))
      })
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
