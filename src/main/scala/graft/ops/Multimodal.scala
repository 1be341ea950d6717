package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame, Row}

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: opaque `binary` payload columns + typed metadata structs,
  * with decode/feature-extraction as partition-batched functions.
  *
  * The Spark-side plumbing (schema, batching, partition sizing) is real
  * and tested; the actual media decoding is STUBBED with a deterministic
  * fake (no image/audio libraries in this environment) — swap
  * [[decodeFeaturesStub]]'s body for a real decoder (JNI/FFI) without
  * touching the plan shape.
  */
object Multimodal {

  /** Magic-byte MIME sniffing over the first payload bytes — pure
    * columnar expression (codegen'd), no UDF. */
  def sniffMime(payload: Column): Column = {
    val prefix = lower(hex(substring(payload, 1, 8)))
    when(prefix.startsWith("ffd8ff"), lit("image/jpeg"))
      .when(prefix.startsWith("89504e47"), lit("image/png"))
      .when(prefix.startsWith("47494638"), lit("image/gif"))
      .when(prefix.startsWith("52494646"), lit("audio/wav")) // RIFF
      .when(substring(prefix, 9, 8) === "66747970", lit("video/mp4")) // ....ftyp
      .when(prefix.startsWith("494433"), lit("audio/mpeg")) // ID3
      .otherwise(lit("application/octet-stream"))
  }

  /** Attach a typed metadata struct for a binary payload column. */
  def withMediaMeta(df: DataFrame, payloadCol: String, metaCol: String = "media_meta"): DataFrame =
    df.withColumn(metaCol, struct(
      sniffMime(col(payloadCol)).as("mime"),
      octet_length(col(payloadCol)).cast(LongType).as("size_bytes"),
      md5(col(payloadCol)).as("content_md5")))

  /** Header-level dimensions/rate — REAL parsing (PNG/GIF/BMP/JPEG
    * headers, WAV fmt chunk; pure byte arithmetic, codegen'd native
    * expression, no codec library): the pre-decode resolution /
    * sample-rate gate a pipeline runs BEFORE paying for
    * [[decodeFeaturesStub]]'s real decoder at corpus scale. NULL struct
    * for unrecognized/truncated/malformed payloads — never a throw. */
  def mediaDims(payload: Column): Column =
    graft.functions.exprs.media_dims(payload)

  val featureSchema: ArrayType = ArrayType(FloatType, containsNull = false)

  /** Decode + feature-extract over binary payloads, batched per
    * partition (the shape a real image/audio decoder needs: amortized
    * library init per partition, bounded batch memory).
    *
    * STUB: emits a deterministic fake feature vector derived from the
    * payload bytes. Replace the `fakeFeatures` body with the real
    * decoder; everything else (schema, partitioning, iterator
    * discipline) is production plumbing.
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
