package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Stream-level MP3 (MPEG audio) metadata from a binary payload —
  * REAL frame-header walking (pure byte arithmetic, no codec
  * library): skip an ID3v2 tag (syncsafe size), then walk every
  * frame — 11-bit sync, version/layer bits, the standard bitrate and
  * sample-rate tables, per-frame length `coef * bitrate / samplerate
  * + padding` — and report layer, first-frame bitrate, sample rate,
  * channel count, frame count, the summed duration
  * (`samples_per_frame / sample_rate` per frame) and whether the
  * stream is VBR (frame bitrates differ). The audio-corpus triage
  * gate that runs before any decoder.
  *
  * NULL for payloads that don't start (post-ID3) with a valid frame,
  * or whose first frame has free/bad bitrate or reserved fields;
  * walking stops cleanly at the first non-frame byte (trailing
  * garbage or a truncated last frame is tolerated, not an error).
  * Never throws: crawl bytes are hostile by default.
  */
case class Mp3Meta(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"mp3_meta expects binary, got ${other.simpleString}")
    }

  override def dataType: DataType = Mp3MetaUtil.schema
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "mp3_meta"

  override protected def nullSafeEval(input: Any): Any =
    Mp3MetaUtil.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.Mp3MetaUtil$$.MODULE$$.parse($c);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Mp3MetaUtil {

  val schema: StructType = StructType(Seq(
    StructField("mpeg_version", StringType),
    StructField("layer", IntegerType),
    StructField("bitrate_kbps", IntegerType), // first frame
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("duration_s", DoubleType),
    StructField("vbr", BooleanType)))

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff

  // bitrate tables in kbps, indexed [version-group][layer][idx 1..14]
  // (idx 0 = free, 15 = bad — both rejected). Version group 0 = MPEG1,
  // 1 = MPEG2/2.5 (identical tables).
  private val bitrates: Array[Array[Array[Int]]] = Array(
    Array( // MPEG1: layer I, II, III
      Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
      Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
      Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)),
    Array( // MPEG2/2.5: layer I, then II==III
      Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
      Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
      Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)))

  // sample rates by version bits (00=2.5, 10=2, 11=1), idx 0..2
  private val sampleRates: Array[Array[Int]] = Array(
    Array(11025, 12000, 8000),  // 2.5
    null,                       // reserved
    Array(22050, 24000, 16000), // 2
    Array(44100, 48000, 32000)) // 1

  private val MaxFrames = 1 << 20

  /** Null when no leading valid frame — never throws. */
  def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 4) return null
    var off = 0
    // ID3v2: "ID3" ver(2) flags(1) syncsafe size(4); the v2.4 footer
    // flag (0x10) adds a 10-byte footer NOT counted in the size
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      val size = ((u8(b, 6) & 0x7f) << 21) | ((u8(b, 7) & 0x7f) << 14) |
        ((u8(b, 8) & 0x7f) << 7) | (u8(b, 9) & 0x7f)
      val footer = if ((u8(b, 5) & 0x10) != 0) 10 else 0
      val skip = 10L + size + footer
      if (skip > b.length - 4) return null
      off = skip.toInt
    }

    var verStr: UTF8String = null
    var layerOut = 0
    var firstKbps = 0
    var rateOut = 0
    var channelsOut = 0
    var nFrames = 0
    var samplesOut = 0
    var vbr = false

    while (off + 4 <= b.length && nFrames < MaxFrames) {
      if (u8(b, off) != 0xff || (u8(b, off + 1) & 0xe0) != 0xe0)
        return finish(verStr, layerOut, firstKbps, rateOut, channelsOut,
          nFrames, samplesOut, vbr)
      val verBits = (u8(b, off + 1) >> 3) & 3    // 00=2.5 01=res 10=2 11=1
      val layerBits = (u8(b, off + 1) >> 1) & 3  // 01=III 10=II 11=I
      val brIdx = (u8(b, off + 2) >> 4) & 0xf
      val srIdx = (u8(b, off + 2) >> 2) & 3
      val padding = (u8(b, off + 2) >> 1) & 1
      val chBits = (u8(b, off + 3) >> 6) & 3
      if (verBits == 1 || layerBits == 0 || brIdx == 0 || brIdx == 15 || srIdx == 3)
        return finish(verStr, layerOut, firstKbps, rateOut, channelsOut,
          nFrames, samplesOut, vbr)
      val layer = 4 - layerBits // 1, 2, 3
      val vGroup = if (verBits == 3) 0 else 1
      val kbps = bitrates(vGroup)(layer - 1)(brIdx)
      val rate = sampleRates(verBits)(srIdx)
      val samplesPerFrame =
        if (layer == 1) 384
        else if (layer == 2) 1152
        else if (verBits == 3) 1152 else 576 // layer III: V1 vs V2/2.5
      val frameLen =
        if (layer == 1) (12 * kbps * 1000 / rate + padding) * 4
        else samplesPerFrame / 8 * kbps * 1000 / rate + padding
      if (frameLen < 4) return null // cannot advance — malformed
      if (nFrames == 0) {
        verStr = UTF8String.fromString(
          if (verBits == 3) "1" else if (verBits == 2) "2" else "2.5")
        layerOut = layer
        firstKbps = kbps
        rateOut = rate
        samplesOut = samplesPerFrame
        channelsOut = if (chBits == 3) 1 else 2
      } else {
        // a stream that changes version/layer/rate mid-way is not one
        // stream — stop at the boundary; differing bitrates are VBR
        if (layer != layerOut || rate != rateOut)
          return finish(verStr, layerOut, firstKbps, rateOut, channelsOut,
            nFrames, samplesOut, vbr)
        if (kbps != firstKbps) vbr = true
      }
      nFrames += 1
      off += frameLen
    }
    finish(verStr, layerOut, firstKbps, rateOut, channelsOut,
      nFrames, samplesOut, vbr)
  }

  /** duration in closed form — `n_frames * samples_per_frame / rate`
    * (rate and frame type are constant within one stream: the walk
    * stops at any boundary), so an oracle can reproduce the exact
    * IEEE result without replaying a sequential fold. */
  private def finish(
      ver: UTF8String, layer: Int, kbps: Int, rate: Int, channels: Int,
      nFrames: Int, samplesPerFrame: Int, vbr: Boolean): InternalRow =
    if (nFrames == 0) null
    else InternalRow(ver, layer, kbps, rate, channels, nFrames,
      nFrames.toDouble * samplesPerFrame / rate, vbr)
}
