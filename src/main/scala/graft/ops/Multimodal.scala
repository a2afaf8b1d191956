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
          // JPEG B.1.1.2: optional 0xFF fill bytes before any marker —
          // advance one byte, don't misread the marker as a length
          .when(marker === 255, state(off + 1L, lit(-1), lit(-1)))
          .when(marker.isin(JpegSofMarkers: _*),
            // SOF layout: FF Cx len(2) precision(1) height(2 BE) width(2 BE)
            state(off,
              conv(hex(p.substr(iOff + 7, lit(2))), 16, 10),
              conv(hex(p.substr(iOff + 5, lit(2))), 16, 10)))
          .otherwise(state(off + 2L + segLen, lit(-1), lit(-1)))
      })
  }

  /** EXIF orientation (TIFF tag 0x0112, values 1-8) straight from a JPEG's
    * APP1 payload — the rotate/flip flag an image-ingest pass needs BEFORE
    * any pixel work (a resize that ignores it silently transposes 6/8-
    * oriented phone photos). Two bounded folds, same scale shape as
    * [[imageMeta]] (narrow projection riding the scan; no UDF, no
    * shuffle, pixels never touched):
    *  1. the FF-marker walk of [[jpegSof]], but targeting the APP1 segment
    *     whose payload starts "Exif  " (non-Exif APP1s — XMP —
    *     are skipped by length like any other segment; SOS/EOI stop the
    *     walk: no EXIF can follow entropy-coded data);
    *  2. a walk of IFD0's 12-byte entries under the TIFF byte-order mark
    *     ("II" little / "MM" big — both real: phone makers split roughly
    *     down the middle), reading the SHORT value of the first 0x0112
    *     entry. The IFD header (byte order, magic 42, IFD0 offset, entry
    *     count) is projected ONCE to a scratch attribute so the fold's
    *     lambda reads struct fields, not re-evaluated captures (the HOF
    *     capture rule, see [[jpegSof]]).
    *
    * Missing APP1 / non-Exif / corrupt TIFF / absent tag / out-of-range
    * values yield null — never an error. Output: input columns +
    * img_orientation (int 1-8 or null).
    */
  def exifOrientation(df: DataFrame, payloadCol: String = "payload",
      maxSegments: Int = 32, maxIfdEntries: Int = 32): DataFrame = {
    require(!df.columns.contains("__xa") && !df.columns.contains("__xb"),
      "exifOrientation uses __xa/__xb as scratch columns; rename the input's")
    val p = col(payloadCol)
    val isJpeg = length(p) >= 4 && hex(substring(p, 1, 2)) === "FFD8"
    val base = col("__xa")
    def u16e(pos: Column, le: Column): Column =
      when(le, leUInt(p, pos.cast("int"), 2)).otherwise(beUInt(p, pos, 2))
    def u32e(pos: Column, le: Column): Column =
      when(le, leUInt(p, pos.cast("int"), 4)).otherwise(beUInt(p, pos, 4))
    // TIFF/IFD0 header, validated: byte order mark, magic 42, and the
    // entry table's first byte in bounds
    val leF = hex(p.substr(base.cast("int"), lit(2))) === "4949"
    val ifdOff = u32e(base + 4L, leF)
    val entStart = base + ifdOff + 2L
    val header = when(
      base.isNotNull &&
        hex(p.substr(base.cast("int"), lit(2))).isin("4949", "4D4D") &&
        u16e(base + 2L, leF) === 42L &&
        entStart <= length(p).cast("long"),
      struct(leF.as("le"), u16e(base + ifdOff, leF).as("cnt"),
        entStart.as("ent")))
    val xb = col("__xb")
    val orient = aggregate(
      sequence(lit(0), lit(maxIfdEntries - 1)),
      lit(-1L),
      (st, i) => {
        val le = xb.getField("le")
        val entPos = xb.getField("ent") + i.cast("long") * 12L
        // value read honors the entry's TYPE: SHORT (3) is the spec'd
        // layout, LONG (4) appears in the wild (a BE LONG's low half
        // lives in the LAST two value bytes, so a u16 read would see 0);
        // anything else → -2 (found-but-unreadable → null downstream)
        val typ = u16e(entPos + 2L, le)
        val value = coalesce(
          when(typ === 3L, u16e(entPos + 8L, le))
            .when(typ === 4L, u32e(entPos + 8L, le)),
          lit(-2L))
        when(st >= 0L, st) // found: carry
          .when(i.cast("long") >= xb.getField("cnt") ||
            entPos + 11L > length(p).cast("long"), st)
          .when(u16e(entPos, le) === 0x0112L, value)
          .otherwise(st)
      })
    df.withColumn("__xa", when(isJpeg, exifTiffBase(p, maxSegments)))
      .withColumn("__xb", header)
      .withColumn("img_orientation",
        when(xb.isNotNull, when(orient.between(1L, 8L), orient.cast("int"))))
      .drop("__xa", "__xb")
  }

  /** The APP1/Exif variant of the [[jpegSof]] walk: returns the 1-based
    * offset of the TIFF byte-order mark (APP1 payload + 6, past
    * "Exif  "), or null. Negative state = found (carry flag).
    */
  private def exifTiffBase(p: Column, maxSegments: Int): Column = {
    val res = aggregate(
      sequence(lit(1), lit(maxSegments)),
      lit(3L),
      (st, _) => {
        val off = st
        val marker = beUInt(p, off + 1L, 1)
        val segLen = beUInt(p, off + 2L, 2)
        when(st.isNull || st < 0L, st)
          .when(off + 4L > length(p).cast("long") ||
            beUInt(p, off, 1) =!= 255L, lit(null).cast("long"))
          // 0xFF fill bytes before a marker (JPEG B.1.1.2): advance one
          .when(marker === 255L, off + 1L)
          .when(marker === 0xE1L &&
            hex(p.substr((off + 4L).cast("int"), lit(6))) === "457869660000" &&
            off + 18L <= length(p).cast("long"), // TIFF header must fit
            -(off + 10L))
          .when(marker === 0xDAL || marker === 0xD9L, lit(null).cast("long"))
          .otherwise(off + 2L + segLen)
      })
    when(res < 0L, -res)
  }

  /** REAL byte-level audio-header decode — the WAV/RIFF sibling of
    * [[imageMeta]]. Walks RIFF chunks (id, little-endian u32 size, padded
    * to even) from byte 13 as a bounded `aggregate` fold collecting BOTH
    * the `fmt ` chunk (audio format tag, channels, sample rate, bits per
    * sample at fixed offsets within the chunk) and the `data` chunk size,
    * from which duration follows: data bytes / (rate · channels · bits/8).
    * Same scale shape as imageMeta: narrow projection, no UDF, no shuffle;
    * non-RIFF/corrupt payloads yield audio_format="unknown"/null fields.
    *
    * MPEG audio (mp3): the ID3v2 envelope's syncsafe size is skipped
    * exactly, a bounded sync scan ([[mp3FrameOff]]) locates the first
    * legal frame header, and version/layer/bitrate-index/sample-rate-index/
    * channel-mode decode straight from its 4 bytes (the classic bitrate
    * and sample-rate tables as array literals — V1 L1-L3, V2/V2.5 L1 and
    * the shared L2/L3 table). audio_duration_ms for mp3 prefers the
    * EXACT frame count from a Xing/Info or VBRI header in the first
    * frame (frames · samples-per-frame ÷ rate — the headers every VBR
    * encoder writes precisely because per-frame scanning is a decode-
    * shaped pass), falling back to the CBR ESTIMATE bytes·8/kbps over
    * the payload from the first frame (a trailing 128-byte ID3v1 tag is
    * excluded; rarer APE/Lyrics3 trailers are not) — exact for untrailed
    * CBR streams, approximate for tag-less VBR. Free-format streams
    * (bitrate index 0) give null bitrate and estimate — unless a VBR
    * header dates the stream exactly, in which case the average bitrate
    * over the exact duration is published like for any other VBR stream.
    *
    * Output: input columns + audio_format, audio_channels,
    * audio_sample_rate, audio_bits (PCM only — frame-based codecs carry
    * none), audio_bitrate_kbps (mp3 only; the AVERAGE bytes·8/duration
    * when a VBR header dates the stream exactly, else the first frame's
    * header value), audio_vbr (Xing/VBRI present), audio_duration_ms.
    * Validated in OpsSpec against REAL bytes from the JDK's
    * javax.sound.sampled writer (WAV) and hand-muxed spec-exact frames
    * (mp3, incl. Xing/Info/VBRI and truncated-header fallbacks).
    */
  def audioMeta(df: DataFrame, payloadCol: String = "payload",
      maxChunks: Int = 16, maxMp3SyncScan: Int = 64): DataFrame = {
    require(!df.columns.contains("__wd"),
      "audioMeta uses __wd as a scratch column; rename the input's __wd")
    require(!df.columns.contains("__md"),
      "audioMeta uses __md as a scratch column; rename the input's __md")
    val p = col(payloadCol)
    val isWav = length(p) >= 44 &&
      hex(substring(p, 1, 4)) === "52494646" && // "RIFF"
      hex(substring(p, 9, 4)) === "57415645" // "WAVE"
    // MPEG audio: an ID3v2 envelope or a bare frame-sync prefix. The
    // frame itself is located by the bounded sync scan (mp3FrameOff).
    val isMp3 = !isWav && length(p) >= 4 &&
      (hex(substring(p, 1, 3)) === "494433" || // "ID3"
        (beUInt(p, lit(1), 1) === 255 &&
          beUInt(p, lit(2), 1).bitwiseAND(0xE0) === 0xE0))
    val fmt = when(isWav, "wav").when(isMp3, "mp3").otherwise("unknown")
    val st = col("__wd")
    val found = st.getField("ch") >= 0
    def f(field: String): Column =
      when(col("audio_format") === "wav" && found, st.getField(field))
    val denom = st.getField("rate") * st.getField("ch") *
      (st.getField("bits") / 8)

    // mp3 header fields — direct byte reads at the found frame offset
    // (plain projections over the scan's scratch column, not HOF lambdas)
    val off = col("__md")
    val mOk = col("audio_format") === "mp3" && off.isNotNull
    def b(i: Int): Column = beUInt(p, off + i, 1).cast("int")
    val verBits = shiftright(b(1), 3).bitwiseAND(3) // 0=V2.5 2=V2 3=V1
    val layerBits = shiftright(b(1), 1).bitwiseAND(3) // 1=L3 2=L2 3=L1
    val brIdx = shiftright(b(2), 4).bitwiseAND(15).cast("int")
    val srIdx = shiftright(b(2), 2).bitwiseAND(3).cast("int")
    val mode = shiftright(b(3), 6).bitwiseAND(3)
    // brIdx 15 is scan-rejected; 0 = free-format → null index → null
    // (ANSI-safe: element_at on a null index returns null, never errors)
    def kbps(vals: Int*): Column =
      element_at(array(vals.map(lit): _*),
        when(brIdx.between(1, 14), brIdx))
    val bitrate =
      when(verBits === 3 && layerBits === 3,
        kbps(32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448))
        .when(verBits === 3 && layerBits === 2,
          kbps(32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384))
        .when(verBits === 3 && layerBits === 1,
          kbps(32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320))
        .when(layerBits === 3, // V2/V2.5 L1
          kbps(32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256))
        .otherwise( // V2/V2.5 L2+L3 share one table
          kbps(8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160))
    val srBase = element_at(array(lit(44100), lit(48000), lit(32000)), srIdx + 1)
    val srDiv = when(verBits === 3, 1).when(verBits === 2, 2).otherwise(4)
    val mp3Rate = floor(srBase / srDiv).cast("int")
    val mp3Ch = when(mode === 3, 1).otherwise(2).cast("int")
    // CBR estimate over the bytes from the first frame to EOF: bytes·8
    // bits / (kbps kbit/s) = ms. The ubiquitous 128-byte ID3v1 "TAG"
    // trailer is excluded (it is metadata, not audio); other trailing
    // tags (APE/Lyrics3) are rare enough to stay inside the estimate's
    // stated tolerance.
    val id3v1 = length(p) >= 128 &&
      hex(p.substr(length(p) - 127, lit(3))) === "544147"
    val audioBytes = length(p).cast("long") -
      when(id3v1, 128L).otherwise(0L) - off + 1L
    val mp3Dur = floor(audioBytes * 8 / bitrate).cast("long")

    // VBR headers make the duration EXACT (frame count × samples/frame ÷
    // rate) instead of the CBR estimate. "Xing"/"Info" sits after the
    // first frame's side info (MPEG1: mono 17 / else 32 bytes; MPEG2/2.5:
    // mono 9 / else 17), which itself sits after the optional 2-byte
    // CRC-16 (protection bit 0 = CRC present); flags bit 0 gates the
    // frame-count field. "VBRI" (Fraunhofer) sits at the fixed 32-byte
    // offset, frames at +14. Truncated FIELDS fail the length guard and
    // fall back to the CBR estimate — never a partial read — while a
    // readable tag magic alone still classifies the stream as VBR
    // (same policy for Xing and VBRI).
    val sideInfo = when(verBits === 3,
      when(mode === 3, 17).otherwise(32))
      .otherwise(when(mode === 3, 9).otherwise(17))
    val crcLen = when(b(1).bitwiseAND(1) === 0, 2).otherwise(0)
    val xOff = off + 4L + crcLen + sideInfo
    val xTag = hex(p.substr(xOff, lit(4)))
    val isXingTag = xTag === "58696E67" // "Xing" (VBR)
    val isInfoTag = xTag === "496E666F" // "Info" (CBR, still exact frames)
    val xingOk = (isXingTag || isInfoTag) &&
      length(p).cast("long") >= xOff + 11L &&
      beUInt(p, xOff + 4L, 4).bitwiseAND(1L) === 1L
    val xFrames = beUInt(p, xOff + 8L, 4)
    val vOff = off + 36L
    val isVbriTag = hex(p.substr(vOff, lit(4))) === "56425249" // "VBRI"
    val vbriOk = isVbriTag && length(p).cast("long") >= vOff + 17L
    val vFrames = beUInt(p, vOff + 14L, 4)
    // frames = 0 is a corrupt/placeholder header: fall back to the
    // estimate rather than publishing a 0 ms duration
    val frames = when(xingOk, xFrames).when(vbriOk, vFrames)
    val spf = when(layerBits === 3, 384) // L1
      .when(layerBits === 2, 1152) // L2
      .otherwise(when(verBits === 3, 1152).otherwise(576)) // L3 V1 / V2+
    val vbrDur = when(frames > 0 && mp3Rate > 0,
      floor(frames * spf * 1000L / mp3Rate).cast("long"))
    val isVbr = isXingTag || isVbriTag
    // with an exact duration in hand the average bitrate beats the first
    // frame's header value (arbitrary in a VBR stream)
    val avgKbps = when(isVbr && vbrDur > 0L,
      floor(audioBytes * 8 / vbrDur).cast("int"))

    df.withColumn("audio_format", fmt)
      .withColumn("__wd", when(isWav, wavChunks(p, maxChunks)))
      .withColumn("__md",
        when(col("audio_format") === "mp3", mp3FrameOff(p, maxMp3SyncScan)))
      .withColumn("audio_channels", coalesce(f("ch"), when(mOk, mp3Ch)))
      .withColumn("audio_sample_rate",
        coalesce(f("rate").cast("int"), when(mOk, mp3Rate)))
      .withColumn("audio_bits", f("bits")) // frame-based codecs have none
      .withColumn("audio_bitrate_kbps",
        when(mOk, coalesce(avgKbps, bitrate)))
      .withColumn("audio_vbr",
        when(mOk, isVbr).when(col("audio_format") === "wav" && found, false))
      .withColumn("audio_duration_ms",
        coalesce(
          when(col("audio_format") === "wav" && found &&
            st.getField("dsz") >= 0 && denom > 0,
            // Column./ is double division; floor restores integral ms
            floor(st.getField("dsz") * 1000L / denom).cast("long")),
          when(mOk, coalesce(vbrDur, mp3Dur))))
      .drop("__wd", "__md")
  }

  /** Bounded MPEG-audio frame-sync scan: returns the 1-based offset of the
    * first LEGAL frame header (11 sync bits, non-reserved version/layer,
    * bitrate index ≠ 15, sample-rate index ≠ 3) after the optional ID3v2
    * envelope (whose syncsafe-u32 size is skipped exactly), or null. The
    * scan tolerates up to `maxScan` bytes of padding/garbage between the
    * tag and the first frame — the common encoder layout is zero.
    */
  private def mp3FrameOff(p: Column, maxScan: Int): Column = {
    def u8(pos: Column): Column = beUInt(p, pos, 1).cast("int")
    val id3 = hex(p.substr(lit(1), lit(3))) === "494433"
    val syncsafe =
      shiftleft(u8(lit(7)).bitwiseAND(0x7F).cast("long"), 21) +
        shiftleft(u8(lit(8)).bitwiseAND(0x7F).cast("long"), 14) +
        shiftleft(u8(lit(9)).bitwiseAND(0x7F).cast("long"), 7) +
        u8(lit(10)).bitwiseAND(0x7F).cast("long")
    val start = when(id3 && length(p) >= 10, syncsafe + 11L)
      .when(!id3, lit(1L))
    // state: null = stuck, positive = next candidate offset, NEGATIVE =
    // found at -state (the carry flag, same trick as jpegSof's w >= 0)
    val res = aggregate(
      sequence(lit(1), lit(maxScan)),
      start,
      (st, _) => {
        val q = st.cast("int")
        val h1 = u8(q + 1)
        val ver = shiftright(h1, 3).bitwiseAND(3)
        val layer = shiftright(h1, 1).bitwiseAND(3)
        val h2 = u8(q + 2)
        val brIdx = shiftright(h2, 4).bitwiseAND(15)
        val srIdx = shiftright(h2, 2).bitwiseAND(3)
        val legal = u8(q) === 255 && h1.bitwiseAND(0xE0) === 0xE0 &&
          ver =!= 1 && layer =!= 0 && brIdx =!= 15 && srIdx =!= 3
        when(st.isNull || st < 0L, st)
          .when(st + 3L > length(p).cast("long"), lit(null).cast("long"))
          .when(legal, -st)
          .otherwise(st + 1L)
      })
    when(res < 0L, -res)
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

  /** Big-endian unsigned int read off a binary column (1-based `pos`). */
  private def beUInt(p: Column, pos: Column, n: Int): Column =
    conv(hex(p.substr(pos.cast("int"), lit(n))), 16, 10).cast("long")

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
