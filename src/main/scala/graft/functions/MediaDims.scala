package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._

/** Header-level media dimensions from a binary payload — REAL parsing
  * (pure byte arithmetic, no codec library): PNG IHDR, GIF screen
  * descriptor, BMP info header, JPEG SOF segment walk, WAV fmt chunk,
  * FLAC STREAMINFO, WebP VP8/VP8L/VP8X, TIFF IFD (both endians).
  * Returns struct(width, height, sample_rate, channels) with NULL
  * fields where the format has no such notion, and a NULL struct for
  * anything unrecognized, truncated, or malformed — never a throw:
  * payload bytes at crawl scale are hostile by default.
  *
  * This is the pre-decode filter a 100 TB image/audio pipeline runs
  * FIRST: resolution/sample-rate gating drops payloads before the
  * expensive decode stage ([[graft.ops.Multimodal.decodeFeaturesStub]])
  * ever sees them. Codegen'd single pass over the leading bytes.
  */
case class MediaDims(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"media_dims expects binary, got ${other.simpleString}")
    }

  override def dataType: DataType = MediaDimsUtil.schema
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "media_dims"

  override protected def nullSafeEval(input: Any): Any =
    MediaDimsUtil.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.MediaDimsUtil$$.MODULE$$.parse($c);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MediaDimsUtil {

  val schema: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType)))

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) | (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)

  private def dims(w: Long, h: Long): InternalRow =
    // a "dimension" past Int.MaxValue is a malformed header, not an image
    if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) null
    else InternalRow(w.toInt, h.toInt, null, null)

  /** Null on anything unrecognized/truncated/malformed — never throws. */
  def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 10) return null // GIF's descriptor is the shortest parseable header
    // PNG: 89 50 4E 47 0D 0A 1A 0A, IHDR length+type at 8, w/h BE32 at 16/20
    if (b.length >= 24 && u8(b, 0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
      b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
      return dims(be32(b, 16), be32(b, 20))
    // GIF87a/89a: logical screen w/h LE16 at 6/8
    if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
      (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      return dims(le16(b, 6), le16(b, 8))
    // BMP: "BM", BITMAPINFOHEADER (size >= 40): w/h signed LE32 at 18/22
    // (height may be negative = top-down; magnitude is the dimension)
    if (b.length >= 26 && b(0) == 'B' && b(1) == 'M' && le32(b, 14) >= 40) {
      val w = le32(b, 18).toInt // reinterpret as signed
      val h = le32(b, 22).toInt
      return dims(w.toLong, math.abs(h.toLong))
    }
    // TIFF: II*\0 (little-endian) or MM\0* (big-endian), then the
    // first IFD walked for ImageWidth (tag 256) / ImageLength (257) —
    // SHORT and LONG value types, value left-justified in the 4-byte
    // field; IFD offset and entry count distrusted
    if (b.length >= 8 &&
      ((b(0) == 'I' && b(1) == 'I' && u8(b, 2) == 0x2a && u8(b, 3) == 0) ||
        (b(0) == 'M' && b(1) == 'M' && u8(b, 2) == 0 && u8(b, 3) == 0x2a))) {
      val littleEndian = b(0) == 'I'
      def r16(i: Int): Int = if (littleEndian) le16(b, i) else be16(b, i)
      def r32(i: Int): Long = if (littleEndian) le32(b, i) else be32(b, i)
      val ifd = r32(4)
      if (ifd < 8 || ifd > b.length - 2) return null
      val i0 = ifd.toInt
      val n = r16(i0)
      if (n <= 0 || n > 4096) return null
      if (i0 + 2 + n * 12 > b.length) return null
      var w = -1L
      var h = -1L
      var e = 0
      while (e < n) {
        val off = i0 + 2 + e * 12
        val tag = r16(off)
        if (tag == 256 || tag == 257) {
          if (r32(off + 4) != 1L) return null // count must be 1
          val v = r16(off + 2) match {
            case 3 => r16(off + 8).toLong // SHORT, left-justified
            case 4 => r32(off + 8) // LONG
            case _ => return null
          }
          if (tag == 256) w = v else h = v
        }
        e += 1
      }
      return dims(w, h) // -1 when a tag is absent → null via the bound
    }
    // FLAC: "fLaC" then metadata blocks; STREAMINFO (type 0, 34-byte
    // payload) is mandatory-first per spec — sample rate is 20 bits
    // at payload+10, channels-1 the next 3 bits
    if (b.length >= 4 + 4 + 21 && b(0) == 'f' && b(1) == 'L' &&
      b(2) == 'a' && b(3) == 'C') {
      if ((u8(b, 4) & 0x7f) != 0) return null // STREAMINFO must be first
      val blockLen = (u8(b, 5) << 16) | (u8(b, 6) << 8) | u8(b, 7)
      if (blockLen != 34) return null
      val rate = (u8(b, 18) << 12) | (u8(b, 19) << 4) | (u8(b, 20) >> 4)
      val channels = ((u8(b, 20) >> 1) & 7) + 1
      if (rate <= 0) return null // 0 is invalid per spec
      return InternalRow(null, null, rate, channels)
    }
    // WebP: RIFF....WEBP, then one of three first-chunk formats —
    // "VP8 " lossy (sync 9d 01 2a, 14-bit LE dims), "VP8L" lossless
    // (0x2f signature, width-1/height-1 packed 14+14 bits LE), "VP8X"
    // extended (24-bit LE canvas dims minus one)
    if (b.length >= 20 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'E' && b(10) == 'B' && b(11) == 'P') {
      val sz = le32(b, 16)
      if (sz < 0 || sz > b.length - 20) return null // chunk size distrusted
      if (b(12) == 'V' && b(13) == 'P' && b(14) == '8' && b(15) == ' ') {
        // frame tag (3) + sync (3) + w/h LE16 (14 bits each)
        if (sz < 10 || b.length < 30) return null
        if (u8(b, 23) != 0x9d || u8(b, 24) != 0x01 || u8(b, 25) != 0x2a) return null
        return dims((le16(b, 26) & 0x3fff).toLong, (le16(b, 28) & 0x3fff).toLong)
      }
      if (b(12) == 'V' && b(13) == 'P' && b(14) == '8' && b(15) == 'L') {
        if (sz < 5 || b.length < 25 || u8(b, 20) != 0x2f) return null
        val packed = le32(b, 21)
        return dims((packed & 0x3fff) + 1, ((packed >> 14) & 0x3fff) + 1)
      }
      if (b(12) == 'V' && b(13) == 'P' && b(14) == '8' && b(15) == 'X') {
        if (sz < 10 || b.length < 30) return null
        val w = (u8(b, 24) | (u8(b, 25) << 8) | (u8(b, 26) << 16)).toLong + 1
        val h = (u8(b, 27) | (u8(b, 28) << 8) | (u8(b, 29) << 16)).toLong + 1
        return dims(w, h)
      }
      return null
    }
    // WAV: RIFF....WAVE, then chunk walk for "fmt " (channels LE16 at
    // data+2, sample rate LE32 at data+4)
    if (b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') {
      var off = 12
      var guard = 0
      while (off + 8 <= b.length && guard < 64) {
        val size = le32(b, off + 4)
        if (b(off) == 'f' && b(off + 1) == 'm' && b(off + 2) == 't' && b(off + 3) == ' ') {
          if (size < 16 || off + 8 + 8 > b.length) return null
          val channels = le16(b, off + 10)
          val rate = le32(b, off + 12)
          if (channels <= 0 || rate <= 0 || rate > Int.MaxValue) return null
          return InternalRow(null, null, rate.toInt, channels)
        }
        // a chunk size beyond the remaining payload is truncation or a
        // crafted header — and the bound also keeps the Int offset
        // arithmetic overflow-free (a size near Int.MaxValue would wrap
        // `off` negative and index out of bounds: never-throw contract)
        if (size < 0 || size > b.length - off - 8) return null
        off += 8 + size.toInt + (size.toInt & 1) // chunks are word-aligned
        guard += 1
      }
      return null
    }
    // JPEG: FF D8, then segment walk to the first frame header (SOF0-15
    // except DHT/JPG/DAC markers C4/C8/CC): h BE16 at seg+5, w at seg+7
    if (u8(b, 0) == 0xff && u8(b, 1) == 0xd8) {
      var off = 2
      var guard = 0
      while (off + 4 <= b.length && guard < 1024) {
        if (u8(b, off) != 0xff) return null // lost marker sync
        val marker = u8(b, off + 1)
        if (marker == 0xff) { off += 1 } // fill byte
        else if (marker == 0x00) return null // stuffed byte: lost sync
        else if (marker == 0xd8 || marker == 0x01 || // TEM is standalone like RSTn
          (marker >= 0xd0 && marker <= 0xd7)) { off += 2 }
        else if (marker == 0xd9 || marker == 0xda) return null // EOI/SOS before SOF
        else {
          val len = be16(b, off + 2)
          if (len < 2) return null // malformed: len counts itself
          if (marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
            // a prefix-fetched payload may cut INSIDE the SOF segment;
            // the dims bytes at off+5..off+8 are all the frame header
            // this parser needs, so only bound those — but the declared
            // segment length must still COVER them (len >= 7), else the
            // "dims" would be the next segment's bytes, not the frame's
            if (len < 7 || off + 9 > b.length) return null
            return dims(be16(b, off + 7), be16(b, off + 5))
          }
          // skipped segments must lie within the payload: past-the-end
          // is truncation (no SOF reachable) → NULL, and the bound
          // keeps `off += 2 + len` overflow-free near Int.MaxValue
          if (len > b.length - off - 2) return null
          off += 2 + len
        }
        guard += 1
      }
      return null
    }
    null
  }
}
