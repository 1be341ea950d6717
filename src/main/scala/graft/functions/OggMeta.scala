package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Container-level Ogg metadata from a binary payload — REAL page
  * walking (pure byte arithmetic, no codec library): verify each
  * page's `OggS` capture pattern and stream-structure version, sum
  * the segment-table lacing values to find the page length, track the
  * last non-unset granule position, and read the codec id header from
  * the first (BOS) page's payload — Vorbis (`\x01vorbis`: channels,
  * sample rate) or Opus (`OpusHead`: channels, pre-skip, input rate;
  * the granule clock is fixed at 48 kHz regardless). Duration comes
  * closed-form from the last granule position — Vorbis:
  * `granule / sample_rate`; Opus: `(granule - pre_skip) / 48000` —
  * so an oracle reproduces the exact IEEE result without walking.
  * The audio-corpus triage gate that runs before any decoder.
  *
  * Multiplexed (multi-serial) files report the first BOS stream's
  * codec and the file's last granule — single-stream triage
  * semantics, the overwhelmingly common crawl shape.
  *
  * NULL for payloads whose first page is not a valid Ogg page; the
  * walk stops cleanly at the first invalid or truncated page
  * (trailing garbage tolerated, like [[Mp3Meta]]). An unrecognized
  * BOS packet keeps the page stats and reports codec `unknown` with
  * null audio fields. Never throws: crawl bytes are hostile by
  * default.
  */
case class OggMeta(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"ogg_meta expects binary, got ${other.simpleString}")
    }

  override def dataType: DataType = OggMetaUtil.schema
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ogg_meta"

  override protected def nullSafeEval(input: Any): Any =
    OggMetaUtil.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.OggMetaUtil$$.MODULE$$.parse($c);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object OggMetaUtil {

  val schema: StructType = StructType(Seq(
    StructField("codec", StringType),
    StructField("channels", IntegerType),
    StructField("sample_rate", IntegerType), // opus: input rate
    StructField("pre_skip", IntegerType),    // opus only; 0 for vorbis
    StructField("n_pages", IntegerType),
    StructField("last_granule", LongType),
    StructField("duration_s", DoubleType)))

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff

  private def le16(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8)

  private def le32(b: Array[Byte], i: Int): Long =
    (u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16)).toLong |
      (u8(b, i + 3).toLong << 24)

  private def le64(b: Array[Byte], i: Int): Long =
    le32(b, i) | (le32(b, i + 4) << 32)

  private val MaxPages = 1 << 20

  /** Null when the first page is not a valid Ogg page — never throws. */
  def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 28) return null

    var codec: UTF8String = null
    var channels = 0
    var rate = 0L
    var preSkip = 0
    var haveAudio = false

    var off = 0
    var nPages = 0
    var lastGranule = Long.MinValue
    while (off + 27 <= b.length && nPages < MaxPages) {
      if (!(b(off) == 'O' && b(off + 1) == 'g' && b(off + 2) == 'g' &&
        b(off + 3) == 'S' && b(off + 4) == 0)) {
        if (nPages == 0) return null else return finish(
          codec, channels, rate, preSkip, haveAudio, nPages, lastGranule)
      }
      val granule = le64(b, off + 6)
      val nSegs = u8(b, off + 26)
      if (off + 27 + nSegs > b.length)
        return finish(codec, channels, rate, preSkip, haveAudio, nPages, lastGranule)
      var payload = 0
      var s = 0
      while (s < nSegs) { payload += u8(b, off + 27 + s); s += 1 }
      val body = off + 27 + nSegs
      if (body + payload > b.length) // truncated final page: stop clean
        return finish(codec, channels, rate, preSkip, haveAudio, nPages, lastGranule)

      if (nPages == 0) {
        // BOS payload = the codec identification header
        if (payload >= 16 && b(body) == 1 && b(body + 1) == 'v' &&
          b(body + 2) == 'o' && b(body + 3) == 'r' && b(body + 4) == 'b' &&
          b(body + 5) == 'i' && b(body + 6) == 's' &&
          le32(b, body + 7) == 0L) {
          val ch = u8(b, body + 11)
          val r = le32(b, body + 12)
          // rate is unsigned le32; a value past Int.MaxValue is no
          // real audio rate and would overflow the int output column
          if (ch > 0 && r > 0 && r <= Int.MaxValue) {
            codec = UTF8String.fromString("vorbis")
            channels = ch; rate = r; preSkip = 0; haveAudio = true
          }
        } else if (payload >= 19 && b(body) == 'O' && b(body + 1) == 'p' &&
          b(body + 2) == 'u' && b(body + 3) == 's' && b(body + 4) == 'H' &&
          b(body + 5) == 'e' && b(body + 6) == 'a' && b(body + 7) == 'd') {
          val ch = u8(b, body + 9)
          if (ch > 0) {
            codec = UTF8String.fromString("opus")
            channels = ch
            preSkip = le16(b, body + 10)
            rate = le32(b, body + 12)
            haveAudio = true
          }
        }
        if (codec == null) codec = UTF8String.fromString("unknown")
      }

      // granule -1 (all ones) marks "no packet ends on this page"
      if (granule != -1L) lastGranule = granule
      nPages += 1
      off = body + payload
    }
    finish(codec, channels, rate, preSkip, haveAudio, nPages, lastGranule)
  }

  private def finish(
      codec: UTF8String, channels: Int, rate: Long, preSkip: Int,
      haveAudio: Boolean, nPages: Int, lastGranule: Long): InternalRow = {
    if (nPages == 0) return null
    val haveGranule = lastGranule != Long.MinValue
    val isOpus = haveAudio && codec != null && codec.toString == "opus"
    val duration: Any =
      if (!haveAudio || !haveGranule) null
      else if (isOpus) (lastGranule - preSkip).toDouble / 48000.0
      else if (rate > 0) lastGranule.toDouble / rate else null
    InternalRow(
      codec,
      if (haveAudio) channels else null,
      // OpusHead's input rate is informational and may hold any le32;
      // past Int.MaxValue it can't be represented — NULL, not negative
      if (haveAudio && rate <= Int.MaxValue) rate.toInt else null,
      if (haveAudio) preSkip else null,
      nPages,
      if (haveGranule) lastGranule else null,
      duration)
  }
}
