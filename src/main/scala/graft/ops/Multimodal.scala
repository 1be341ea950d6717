package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame, Row}

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: opaque `binary` payload columns + typed metadata structs,
  * with decode/feature-extraction as partition-batched functions.
  *
  * The Spark-side plumbing (schema, batching, partition sizing) is
  * real and tested. Decoding itself is REAL for WAV PCM, PNG, JPEG,
  * GIF and BMP ([[MediaDecode]], pure JDK: hand-rolled PCM/Inflater
  * walks plus the JDK's own `javax.imageio` codecs —
  * [[decodeFeatures]]); only formats that need codec libraries this
  * environment lacks (MP3/MP4) remain behind the deterministic
  * [[decodeFeaturesStub]] — swap its body for a real decoder
  * (JNI/FFI) without touching the plan shape.
  */
object Multimodal {

  /** Magic-byte MIME sniffing over the first payload bytes — pure
    * columnar expression (codegen'd), no UDF. */
  def sniffMime(payload: Column): Column = {
    val prefix = lower(hex(substring(payload, 1, 12)))
    when(prefix.startsWith("ffd8ff"), lit("image/jpeg"))
      .when(prefix.startsWith("89504e47"), lit("image/png"))
      .when(prefix.startsWith("47494638"), lit("image/gif"))
      // RIFF containers disambiguate on the form tag at bytes 9-12 —
      // a blanket RIFF -> wav would misclassify every WebP/AVI in a
      // crawl; an unrecognized or truncated form falls through to
      // octet-stream
      .when(prefix.startsWith("52494646") &&
        substring(prefix, 17, 8) === "57454250", lit("image/webp")) // WEBP
      .when(prefix.startsWith("52494646") &&
        substring(prefix, 17, 8) === "57415645", lit("audio/wav")) // WAVE
      .when(prefix.startsWith("52494646") &&
        substring(prefix, 17, 8) === "41564920", lit("video/x-msvideo")) // AVI
      .when(prefix.startsWith("664c6143"), lit("audio/flac")) // fLaC
      .when(prefix.startsWith("49492a00") ||
        prefix.startsWith("4d4d002a"), lit("image/tiff")) // II*\0 | MM\0*
      .when(prefix.startsWith("424d"), lit("image/bmp")) // BM
      .when(substring(prefix, 9, 8) === "66747970", lit("video/mp4")) // ....ftyp
      .when(prefix.startsWith("494433"), lit("audio/mpeg")) // ID3
      // bare MPEG-audio frame sync (11 set bits): ff + high-3-bits-set
      // second byte — ID3-less streams are common in a crawl. Checked
      // AFTER every specific magic; the ambiguity (any binary opening
      // ff ex/fx) is the standard sniffing trade.
      .when(prefix.startsWith("ff") &&
        substring(prefix, 3, 1).isin("e", "f"), lit("audio/mpeg"))
      .when(prefix.startsWith("4f676753"), lit("audio/ogg")) // OggS
      .when(prefix.startsWith("1a45dfa3"), lit("video/x-matroska")) // EBML
      .otherwise(lit("application/octet-stream"))
  }

  /** Attach a typed metadata struct for a binary payload column. */
  def withMediaMeta(df: DataFrame, payloadCol: String, metaCol: String = "media_meta"): DataFrame =
    df.withColumn(metaCol, struct(
      sniffMime(col(payloadCol)).as("mime"),
      octet_length(col(payloadCol)).cast(LongType).as("size_bytes"),
      md5(col(payloadCol)).as("content_md5")))

  /** Header-level dimensions/rate — REAL parsing (PNG/GIF/BMP/JPEG
    * headers, WAV fmt chunk, FLAC STREAMINFO, WebP VP8/VP8L/VP8X;
    * pure byte arithmetic, codegen'd native expression, no codec
    * library): the pre-decode resolution / sample-rate gate a
    * pipeline runs BEFORE paying for the real decoder at corpus
    * scale. NULL struct for unrecognized/truncated/malformed
    * payloads — never a throw. */
  def mediaDims(payload: Column): Column =
    graft.functions.exprs.media_dims(payload)

  /** Container-level MP4/ISO-BMFF metadata — REAL box-walk parsing
    * (`ftyp` brand, `mvhd` timescale/duration, `tkhd` track count +
    * presentation dims; native codegen'd expression, no demuxer
    * library): the pre-decode gate a video pipeline runs before any
    * frame extraction. NULL struct for non-MP4/malformed payloads —
    * never a throw. */
  def mp4Meta(payload: Column): Column =
    graft.functions.exprs.mp4_meta(payload)

  /** REAL frame/sample sampling for MP4 payloads: per-sample byte
    * ranges + keyframe flags from the sample tables (stsz/stsc/stco/
    * co64/stss — no decoding, no demuxer library), the layout a
    * pipeline uses to range-fetch keyframes. Supersedes
    * [[frameSampleStub]] for MP4; the stub remains only as the
    * byte-stride fallback for container-less payloads. */
  def mp4Samples(payload: Column): Column =
    graft.functions.exprs.mp4_samples(payload)

  /** Stream-level MP3 metadata — REAL frame-header walking (ID3v2
    * skip, sync scan, the standard bitrate/sample-rate tables,
    * per-frame lengths → frame count, duration, VBR flag; native
    * codegen'd expression, no codec library): the audio-corpus triage
    * gate. NULL for non-MP3/malformed payloads — never a throw. */
  def mp3Meta(payload: Column): Column =
    graft.functions.exprs.mp3_meta(payload)

  /** Container-level Ogg metadata — REAL page walking (capture
    * pattern, lacing sums, granule positions, Vorbis/Opus id headers
    * → codec/channels/rate/duration; native codegen'd expression, no
    * codec library): the Ogg-side audio triage gate. NULL for
    * non-Ogg/malformed payloads — never a throw. */
  def oggMeta(payload: Column): Column =
    graft.functions.exprs.ogg_meta(payload)

  /** Container-level Matroska/WebM metadata — REAL EBML walking
    * (DocType, segment Info timescale/duration, track entries →
    * codec ids, dims, audio rate/channels; clusters skipped by size;
    * native codegen'd expression, no demuxer library): the
    * video-corpus triage gate. NULL for non-EBML/malformed payloads —
    * never a throw. */
  def mkvMeta(payload: Column): Column =
    graft.functions.exprs.mkv_meta(payload)

  /** ONE-CALL crawl triage: sniff the container and dispatch to the
    * right native parser, normalized into a single struct —
    * `(mime, kind, codec, width, height, sample_rate, channels,
    * duration_s)` — so a pipeline filters/buckets a mixed-modality
    * payload column without format-specific branching. Pure columnar
    * composition of [[sniffMime]] + the codegen'd parsers; fields that
    * don't apply (or that the format doesn't carry) are NULL, and a
    * malformed payload of a recognized magic yields NULL parser fields
    * under each parser's never-throw contract. Kinds: image / audio /
    * video / unknown. */
  def triage(payload: Column): Column = {
    val mime = sniffMime(payload)
    val dims = mediaDims(payload)
    val mp3 = mp3Meta(payload)
    val mp4 = mp4Meta(payload)
    val ogg = oggMeta(payload)
    val mkv = mkvMeta(payload)
    val nullI = lit(null).cast(IntegerType)
    val nullD = lit(null).cast(DoubleType)
    val nullS = lit(null).cast(StringType)
    val isImage = mime.startsWith("image/")
    val isWavish = mime.isin("audio/wav", "audio/flac")
    struct(
      mime.as("mime"),
      when(isImage, lit("image"))
        .when(mime.startsWith("audio/"), lit("audio"))
        .when(mime.startsWith("video/"), lit("video"))
        .otherwise(lit("unknown")).as("kind"),
      when(mime === "audio/mpeg",
          concat(lit("mpeg"), mp3.getField("mpeg_version"),
            lit("-layer"), mp3.getField("layer")))
        .when(mime === "audio/ogg", ogg.getField("codec"))
        .when(mime === "video/x-matroska",
          coalesce(mkv.getField("video_codec"), mkv.getField("audio_codec")))
        .when(mime === "video/mp4", mp4.getField("major_brand"))
        .otherwise(nullS).as("codec"),
      when(isImage, dims.getField("width"))
        .when(mime === "video/x-matroska", mkv.getField("width"))
        .when(mime === "video/mp4", mp4.getField("width"))
        .otherwise(nullI).as("width"),
      when(isImage, dims.getField("height"))
        .when(mime === "video/x-matroska", mkv.getField("height"))
        .when(mime === "video/mp4", mp4.getField("height"))
        .otherwise(nullI).as("height"),
      when(isWavish, dims.getField("sample_rate"))
        .when(mime === "audio/mpeg", mp3.getField("sample_rate"))
        .when(mime === "audio/ogg", ogg.getField("sample_rate"))
        .when(mime === "video/x-matroska",
          mkv.getField("audio_rate").cast(IntegerType))
        .otherwise(nullI).as("sample_rate"),
      when(isWavish, dims.getField("channels"))
        .when(mime === "audio/mpeg", mp3.getField("channels"))
        .when(mime === "audio/ogg", ogg.getField("channels"))
        .when(mime === "video/x-matroska", mkv.getField("audio_channels"))
        .otherwise(nullI).as("channels"),
      when(mime === "audio/mpeg", mp3.getField("duration_s"))
        .when(mime === "audio/ogg", ogg.getField("duration_s"))
        .when(mime === "video/x-matroska", mkv.getField("duration_s"))
        .when(mime === "video/mp4", mp4.getField("duration_s"))
        .otherwise(nullD).as("duration_s"))
  }

  val featureSchema: ArrayType = ArrayType(FloatType, containsNull = false)

  /** Schema of [[decodeFeatures]]' output struct: one union row per
    * payload — `kind` discriminates, the other fields are NULL when
    * they don't apply (wav fields for png rows and vice versa), and
    * the whole struct is NULL for undecodable payloads. */
  val decodedSchema: StructType = StructType(Seq(
    StructField("kind", StringType),
    StructField("sample_rate", IntegerType), // wav
    StructField("channels", IntegerType),    // wav / png channel count
    StructField("n_frames", LongType),       // wav
    StructField("duration_s", DoubleType),   // wav
    StructField("peak", DoubleType),         // wav
    StructField("rms", DoubleType),          // wav
    StructField("width", IntegerType),       // png
    StructField("height", IntegerType),      // png
    StructField("mean_px", DoubleType),      // png
    StructField("min_px", IntegerType),      // png
    StructField("max_px", IntegerType)))     // png

  /** REAL decode + feature-extract over binary payloads, batched per
    * partition: WAV PCM → sample stats (RMS / peak / duration),
    * depth-8 PNG → Inflater + unfilter → pixel stats, and
    * JPEG/GIF/BMP (plus palette/16-bit/interlaced PNG) → pixel stats
    * through the JDK's own `javax.imageio` codecs — all pure JDK
    * ([[MediaDecode]]); only genuinely codec-library formats
    * (MP3/MP4) yield a NULL struct — never a throw. Dispatch is by
    * magic bytes, not a MIME column, so a mislabeled payload decodes
    * by what it IS.
    *
    * mapPartitions, not a per-row UDF, deliberately: decoder state
    * (here just buffers; in a JNI/FFI decoder, library handles and
    * model weights) amortizes per partition, and the iterator
    * discipline keeps batch memory bounded — the same plumbing
    * [[decodeFeaturesStub]] pioneered, now carrying real decoders
    * (oracle-gated end to end by q_multimodal_decode).
    */
  def decodeFeatures(
      df: DataFrame, payloadCol: String,
      outCol: String = "decoded"): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField(outCol, decodedSchema))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { row =>
        val bytes = row.getAs[Array[Byte]](payloadIdx)
        val decoded: Row =
          MediaDecode.wavStats(bytes).map(w =>
            Row("wav", w.sampleRate, w.channels, w.nFrames, w.durationS,
              w.peak, w.rms, null, null, null, null, null))
          .orElse(MediaDecode.pngStats(bytes).map(p =>
            Row("png", null, p.channels, null, null, null, null,
              p.width, p.height, p.meanPx, p.minPx, p.maxPx)))
          .orElse(MediaDecode.imageStats(bytes).map(p =>
            Row(p.kind, null, p.channels, null, null, null, null,
              p.width, p.height, p.meanPx, p.minPx, p.maxPx)))
          .orNull
        Row.fromSeq(row.toSeq :+ decoded)
      }
    }(enc)
  }

  /** Decode + feature-extract over binary payloads, batched per
    * partition (the shape a real image/audio decoder needs: amortized
    * library init per partition, bounded batch memory).
    *
    * STUB for the formats [[decodeFeatures]] cannot decode pure-JDK
    * (MP3/MP4 need codec libraries this environment lacks): emits a
    * deterministic fake feature vector derived from the payload
    * bytes. Replace the `fakeFeatures` body with the real decoder;
    * everything else (schema, partitioning, iterator discipline) is
    * production plumbing — WAV, PNG, JPEG, GIF and BMP are REAL in
    * [[decodeFeatures]].
    */
  def decodeFeaturesStub(
      df: DataFrame, payloadCol: String, dim: Int = 16,
      outCol: String = "features"): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField(outCol, featureSchema))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      // per-partition init happens here (decoder handles, model load, ...)
      rows.map { row =>
        val bytes = row.getAs[Array[Byte]](payloadIdx)
        Row.fromSeq(row.toSeq :+ fakeFeatures(bytes, dim))
      }
    }(enc)
  }

  /** Deterministic fake "decoder": hash-seeded pseudo-features. */
  private def fakeFeatures(bytes: Array[Byte], dim: Int): Seq[Float] = {
    val seed = if (bytes == null) 0L else java.util.Arrays.hashCode(bytes).toLong
    val rnd = new scala.util.Random(seed)
    Seq.fill(dim)(rnd.nextFloat())
  }

  /** Frame-sampling plan for video payloads: emits (frame_index,
    * byte_offset) pairs every `everyNBytes` — stands in for keyframe
    * offsets until a real demuxer is plugged in. Columnar, no UDF. */
  def frameSampleStub(payload: Column, everyNBytes: Int): Column =
    transform(
      sequence(lit(0),
        greatest(floor(octet_length(payload) / everyNBytes).cast(IntegerType) - 1, lit(0))),
      i => struct(i.as("frame_index"), (i * everyNBytes).as("byte_offset")))
}
