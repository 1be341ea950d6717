package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Container-level Matroska/WebM metadata from a binary payload —
  * REAL EBML walking (pure byte arithmetic, no demuxer library):
  * variable-length id/size decoding, the EBML header's DocType,
  * Segment → Info (TimestampScale, Duration → seconds in closed form
  * `duration * timescale / 1e9`) and Segment → Tracks → TrackEntry
  * (track count, first video track's codec id and pixel dimensions,
  * first audio track's codec id, sampling frequency and channels).
  * Clusters — the media payload, virtually the whole file — are
  * SKIPPED by their declared size, so triage cost is bounded by the
  * metadata, not the media. The video-corpus triage gate that runs
  * before any decoder.
  *
  * NULL for payloads that don't open with the EBML magic; the walk
  * stops cleanly at the first malformed or truncated element (partial
  * results from the elements already walked are kept — trailing
  * garbage is tolerated, like [[Mp3Meta]]). An element of UNKNOWN
  * size other than the Segment itself ends the walk (it cannot be
  * skipped). Never throws: crawl bytes are hostile by default.
  */
case class MkvMeta(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"mkv_meta expects binary, got ${other.simpleString}")
    }

  override def dataType: DataType = MkvMetaUtil.schema
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "mkv_meta"

  override protected def nullSafeEval(input: Any): Any =
    MkvMetaUtil.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.MkvMetaUtil$$.MODULE$$.parse($c);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MkvMetaUtil {

  val schema: StructType = StructType(Seq(
    StructField("doc_type", StringType),
    StructField("timescale_ns", LongType),
    StructField("duration_s", DoubleType),
    StructField("n_tracks", IntegerType),
    StructField("video_codec", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("audio_codec", StringType),
    StructField("audio_rate", DoubleType),
    StructField("audio_channels", IntegerType)))

  // element ids as read (marker bits included — the conventional form)
  private val IdEbml = 0x1A45DFA3L
  private val IdDocType = 0x4282L
  private val IdSegment = 0x18538067L
  private val IdInfo = 0x1549A966L
  private val IdTimestampScale = 0x2AD7B1L
  private val IdDuration = 0x4489L
  private val IdTracks = 0x1654AE6BL
  private val IdTrackEntry = 0xAEL
  private val IdTrackType = 0x83L
  private val IdCodecId = 0x86L
  private val IdVideo = 0xE0L
  private val IdPixelWidth = 0xB0L
  private val IdPixelHeight = 0xBAL
  private val IdAudio = 0xE1L
  private val IdSamplingFrequency = 0xB5L
  private val IdChannels = 0x9FL
  private val IdCluster = 0x1F43B675L

  private val MaxElements = 1 << 16
  private val Unknown = -1L // size: all value bits set
  private val Bad = -2L

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff

  private def vintLen(first: Int): Int = {
    if (first == 0) return -1
    var mask = 0x80
    var len = 1
    while ((first & mask) == 0) { mask >>= 1; len += 1 }
    len
  }

  /** EBML id (marker bits kept), or Bad; ids are 1..4 bytes. */
  private def readId(b: Array[Byte], off: Int): Long = {
    if (off >= b.length) return Bad
    val len = vintLen(u8(b, off))
    if (len < 1 || len > 4 || off + len > b.length) return Bad
    var v = 0L
    var i = 0
    while (i < len) { v = (v << 8) | u8(b, off + i); i += 1 }
    v
  }

  private def idLen(id: Long): Int =
    if (id <= 0xFFL) 1 else if (id <= 0xFFFFL) 2
    else if (id <= 0xFFFFFFL) 3 else 4

  /** EBML size (marker bit stripped): value, Unknown, or Bad. */
  private def readSize(b: Array[Byte], off: Int): Long = {
    if (off >= b.length) return Bad
    val len = vintLen(u8(b, off))
    if (len < 1 || len > 8 || off + len > b.length) return Bad
    var v = (u8(b, off) & (0xff >> len)).toLong
    var i = 1
    while (i < len) { v = (v << 8) | u8(b, off + i); i += 1 }
    // all value bits set = unknown size
    val allOnes = (1L << (7 * len)) - 1
    if (v == allOnes) Unknown else v
  }

  private def sizeLen(b: Array[Byte], off: Int): Int = vintLen(u8(b, off))

  private def readUint(b: Array[Byte], off: Int, len: Long): Long = {
    if (len < 1 || len > 8) return -1L
    var v = 0L
    var i = 0
    while (i < len) { v = (v << 8) | u8(b, off + i); i += 1 }
    v
  }

  private def readFloat(b: Array[Byte], off: Int, len: Long): Double =
    if (len == 4) java.lang.Float.intBitsToFloat(readUint(b, off, 4).toInt).toDouble
    else if (len == 8) java.lang.Double.longBitsToDouble(readUint(b, off, 8))
    else Double.NaN

  private final class State {
    var elements = 0
    var docType: UTF8String = null
    var timescale = 1000000L // Matroska default
    var durationRaw = Double.NaN
    var nTracks = 0
    var videoCodec: UTF8String = null
    var width = -1
    var height = -1
    var audioCodec: UTF8String = null
    var audioRate = Double.NaN
    var audioChannels = -1
  }

  /** Null unless the payload opens with a well-formed EBML header —
    * never throws. */
  def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 5) return null
    if (readId(b, 0) != IdEbml) return null
    val st = new State

    var off = 0
    var ok = true
    while (ok && off < b.length && st.elements < MaxElements) {
      st.elements += 1
      val id = readId(b, off)
      if (id == Bad) ok = false
      else {
        val sOff = off + idLen(id)
        val size = readSize(b, sOff)
        if (size == Bad) ok = false
        else {
          val body = sOff + sizeLen(b, sOff)
          // top-level sizes CLAMP to the payload instead of failing: a
          // truncated download still carries its front-of-file
          // metadata, and triage keeps whatever was walkable (child
          // scanners stop at the first child overrunning the clamp)
          val end =
            if (size == Unknown || size > b.length - body) b.length
            else body + size.toInt
          if (id == IdEbml) scanLeaves(b, body, end, st)
          else if (id == IdSegment) scanSegment(b, body, end, st)
          else if (size == Unknown) ok = false // cannot skip
          off = end
        }
      }
    }
    finish(st)
  }

  private def scanSegment(b: Array[Byte], start: Int, end: Int, st: State): Unit = {
    var off = start
    var ok = true
    while (ok && off < end && st.elements < MaxElements) {
      st.elements += 1
      val id = readId(b, off)
      if (id == Bad) ok = false
      else {
        val sOff = off + idLen(id)
        val size = readSize(b, sOff)
        if (size == Bad || size == Unknown) ok = false // children are sized
        else {
          val body = sOff + sizeLen(b, sOff)
          if (size > end - body) ok = false
          else {
            val cEnd = body + size.toInt
            if (id == IdInfo) scanLeaves(b, body, cEnd, st)
            else if (id == IdTracks) scanTracks(b, body, cEnd, st)
            // clusters and everything else: skip by size
            off = cEnd
          }
        }
      }
    }
  }

  private def scanTracks(b: Array[Byte], start: Int, end: Int, st: State): Unit = {
    var off = start
    var ok = true
    while (ok && off < end && st.elements < MaxElements) {
      st.elements += 1
      val id = readId(b, off)
      if (id == Bad) ok = false
      else {
        val sOff = off + idLen(id)
        val size = readSize(b, sOff)
        if (size == Bad || size == Unknown) ok = false
        else {
          val body = sOff + sizeLen(b, sOff)
          if (size > end - body) ok = false
          else {
            val cEnd = body + size.toInt
            if (id == IdTrackEntry) {
              st.nTracks += 1
              scanTrackEntry(b, body, cEnd, st)
            }
            off = cEnd
          }
        }
      }
    }
  }

  private def scanTrackEntry(b: Array[Byte], start: Int, end: Int, st: State): Unit = {
    var trackType = -1L
    var codec: UTF8String = null
    var w = -1L; var h = -1L
    var rate = Double.NaN; var ch = -1L

    var off = start
    var ok = true
    while (ok && off < end && st.elements < MaxElements) {
      st.elements += 1
      val id = readId(b, off)
      if (id == Bad) ok = false
      else {
        val sOff = off + idLen(id)
        val size = readSize(b, sOff)
        if (size == Bad || size == Unknown) ok = false
        else {
          val body = sOff + sizeLen(b, sOff)
          if (size > end - body) ok = false
          else {
            val cEnd = body + size.toInt
            if (id == IdTrackType) trackType = readUint(b, body, size)
            else if (id == IdCodecId)
              codec = UTF8String.fromBytes(b, body, size.toInt)
            else if (id == IdVideo || id == IdAudio) {
              var p = body
              var okInner = true
              while (okInner && p < cEnd && st.elements < MaxElements) {
                st.elements += 1
                val lid = readId(b, p)
                if (lid == Bad) okInner = false
                else {
                  val lsOff = p + idLen(lid)
                  val lsize = readSize(b, lsOff)
                  if (lsize == Bad || lsize == Unknown) okInner = false
                  else {
                    val lBody = lsOff + sizeLen(b, lsOff)
                    if (lsize > cEnd - lBody) okInner = false
                    else {
                      if (lid == IdPixelWidth) w = readUint(b, lBody, lsize)
                      else if (lid == IdPixelHeight) h = readUint(b, lBody, lsize)
                      else if (lid == IdSamplingFrequency) rate = readFloat(b, lBody, lsize)
                      else if (lid == IdChannels) ch = readUint(b, lBody, lsize)
                      p = lBody + lsize.toInt
                    }
                  }
                }
              }
            }
            off = cEnd
          }
        }
      }
    }
    // first track of each kind wins (triage reports the primary streams)
    if (trackType == 1L && st.videoCodec == null) {
      st.videoCodec = if (codec != null) codec else UTF8String.fromString("unknown")
      if (w > 0) st.width = w.toInt
      if (h > 0) st.height = h.toInt
    } else if (trackType == 2L && st.audioCodec == null) {
      st.audioCodec = if (codec != null) codec else UTF8String.fromString("unknown")
      if (!rate.isNaN) st.audioRate = rate
      if (ch > 0) st.audioChannels = ch.toInt
    }
  }

  /** DocType (in the EBML header), TimestampScale and Duration (in
    * Info) are flat leaves — one shared scanner. */
  private def scanLeaves(
      b: Array[Byte], start: Int, end: Int, st: State): Unit = {
    var off = start
    var ok = true
    while (ok && off < end && st.elements < MaxElements) {
      st.elements += 1
      val id = readId(b, off)
      if (id == Bad) ok = false
      else {
        val sOff = off + idLen(id)
        val size = readSize(b, sOff)
        if (size == Bad || size == Unknown) ok = false
        else {
          val body = sOff + sizeLen(b, sOff)
          if (size > end - body) ok = false
          else {
            if (id == IdDocType && st.docType == null)
              st.docType = UTF8String.fromBytes(b, body, size.toInt)
            else if (id == IdTimestampScale) {
              val v = readUint(b, body, size)
              if (v > 0) st.timescale = v
            } else if (id == IdDuration) {
              val v = readFloat(b, body, size)
              if (!v.isNaN) st.durationRaw = v
            }
            off = body + size.toInt
          }
        }
      }
    }
  }

  private def finish(st: State): InternalRow =
    InternalRow(
      st.docType,
      st.timescale,
      if (st.durationRaw.isNaN) null
      else st.durationRaw * st.timescale / 1e9,
      st.nTracks,
      st.videoCodec,
      if (st.width > 0) st.width else null,
      if (st.height > 0) st.height else null,
      st.audioCodec,
      if (st.audioRate.isNaN) null else st.audioRate,
      if (st.audioChannels > 0) st.audioChannels else null)
}
