package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Container-level MP4/ISO-BMFF metadata from a binary payload — REAL
  * parsing (pure byte arithmetic, no demuxer library): the box walk a
  * video pipeline runs BEFORE paying for a real decoder. Parses
  * `ftyp` (major brand), `moov/mvhd` (timescale, duration — v0 and
  * v1), and every `moov/trak/tkhd` (track count; presentation width/
  * height from the video track's 16.16 fixed-point fields). Returns
  * struct(major_brand, duration_s, timescale, n_tracks, width,
  * height) with NULL width/height when no track carries dims, and a
  * NULL struct for anything unrecognized, truncated, or malformed —
  * never a throw: crawl bytes are hostile by default.
  *
  * The reference reads media only as opaque streams (ref
  * `FileSystemSource.groovy`); container parsing is part of the
  * beyond-reference multimodal brief. Codegen'd single pass; box
  * sizes are distrusted (bounds-checked against the payload, 64-bit
  * `largesize` supported, guarded iteration).
  */
case class Mp4Meta(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"mp4_meta expects binary, got ${other.simpleString}")
    }

  override def dataType: DataType = Mp4MetaUtil.schema
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "mp4_meta"

  override protected def nullSafeEval(input: Any): Any =
    Mp4MetaUtil.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.Mp4MetaUtil$$.MODULE$$.parse($c);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-sample layout of an MP4's FIRST sampled track — REAL sample-
  * table parsing (`stbl`: `stsz` sizes, `stsc` sample-to-chunk runs,
  * `stco`/`co64` chunk offsets, `stss` sync samples), the demuxer-free
  * frame sampler a video pipeline uses to fetch keyframes by byte
  * range without decoding: returns array<struct(sample_index, offset,
  * size, keyframe)> with 1-based indices and absolute file offsets
  * (chunk offset + sum of earlier sample sizes in the chunk). A
  * missing `stss` means every sample is a sync sample (ISO 14496-12).
  * NULL for non-MP4, malformed/truncated tables, counts that lie
  * about their box size, or inconsistent chunk maps — never a throw. */
case class Mp4Samples(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"mp4_samples expects binary, got ${other.simpleString}")
    }

  override def dataType: DataType = Mp4MetaUtil.samplesSchema
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "mp4_samples"

  override protected def nullSafeEval(input: Any): Any =
    Mp4MetaUtil.parseSamples(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.Mp4MetaUtil$$.MODULE$$.parseSamples($c);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Mp4MetaUtil {

  val samplesSchema: ArrayType = ArrayType(StructType(Seq(
    StructField("sample_index", IntegerType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("size", IntegerType, nullable = false),
    StructField("keyframe", BooleanType, nullable = false))),
    containsNull = false)

  val schema: StructType = StructType(Seq(
    StructField("major_brand", StringType),
    StructField("duration_s", DoubleType),
    StructField("timescale", IntegerType),
    StructField("n_tracks", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)

  private def fourcc(b: Array[Byte], i: Int, t: String): Boolean =
    b(i) == t.charAt(0) && b(i + 1) == t.charAt(1) &&
      b(i + 2) == t.charAt(2) && b(i + 3) == t.charAt(3)

  /** Box header at `off` within [off, end): returns (payloadStart,
    * boxEnd) or null on malformed/truncated sizes. size==0 ("to end
    * of enclosing") and size==1 (64-bit largesize) per ISO 14496-12. */
  private def boxBounds(b: Array[Byte], off: Int, end: Int): (Int, Int) = {
    if (off + 8 > end) return null
    val size32 = be32(b, off)
    if (size32 == 0L) return (off + 8, end)
    if (size32 == 1L) {
      if (off + 16 > end) return null
      val large = be64(b, off + 8)
      if (large < 16 || large > (end - off).toLong) return null
      return (off + 16, off + large.toInt)
    }
    if (size32 < 8 || size32 > (end - off).toLong) return null
    (off + 8, off + size32.toInt)
  }

  /** Null on anything unrecognized/truncated/malformed — never throws. */
  def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 16) return null
    // the first box must be ftyp (ISO brand declaration) — this is
    // also the format sniff: anything else is not an MP4 we claim
    if (!fourcc(b, 4, "ftyp")) return null

    var brand: UTF8String = null
    var timescale = 0L
    var duration = -1L
    var nTracks = 0
    var width = 0L
    var height = 0L
    var sawMvhd = false

    var off = 0
    var guard = 0
    while (off + 8 <= b.length) {
      guard += 1
      // a crafted payload with thousands of tiny boxes must reject,
      // not silently truncate the walk (n_tracks would undercount)
      if (guard > 4096) return null
      val bounds = boxBounds(b, off, b.length)
      if (bounds == null) return null
      val (payload, boxEnd) = bounds
      if (fourcc(b, off + 4, "ftyp")) {
        if (payload + 4 > boxEnd) return null
        brand = UTF8String.fromBytes(java.util.Arrays.copyOfRange(b, payload, payload + 4))
      } else if (fourcc(b, off + 4, "moov")) {
        // walk moov children
        var c = payload
        var cg = 0
        while (c + 8 <= boxEnd) {
          cg += 1
          if (cg > 4096) return null
          val cb = boxBounds(b, c, boxEnd)
          if (cb == null) return null
          val (cp, ce) = cb
          if (fourcc(b, c + 4, "mvhd")) {
            if (cp + 4 > ce) return null
            val ver = u8(b, cp)
            if (ver == 0) {
              if (cp + 20 > ce) return null
              timescale = be32(b, cp + 12)
              duration = be32(b, cp + 16)
            } else if (ver == 1) {
              if (cp + 32 > ce) return null
              timescale = be32(b, cp + 20)
              duration = be64(b, cp + 24)
            } else return null
            if (timescale <= 0 || timescale > Int.MaxValue || duration < 0)
              return null
            sawMvhd = true
          } else if (fourcc(b, c + 4, "trak")) {
            nTracks += 1
            // find tkhd among trak children
            var t = cp
            var tg = 0
            while (t + 8 <= ce) {
              tg += 1
              if (tg > 4096) return null
              val tb = boxBounds(b, t, ce)
              if (tb == null) return null
              val (tp, te) = tb
              if (fourcc(b, t + 4, "tkhd")) {
                if (tp + 4 > te) return null
                val ver = u8(b, tp)
                val (wOff, hOff) =
                  if (ver == 0) (tp + 76, tp + 80)
                  else if (ver == 1) (tp + 88, tp + 92)
                  else return null
                if (hOff + 4 > te) return null
                // 16.16 fixed point presentation size; audio tracks
                // carry 0x0 — keep the PAIR from the largest-area
                // track (independent per-field maxima would fabricate
                // a resolution no track has when two video tracks
                // differ in aspect)
                val w = be32(b, wOff) >> 16
                val h = be32(b, hOff) >> 16
                if (w * h > width * height) { width = w; height = h }
              }
              t = te
            }
          }
          c = ce
        }
      }
      off = boxEnd
    }
    if (brand == null || !sawMvhd) return null
    if (width > Int.MaxValue || height > Int.MaxValue) return null
    InternalRow(
      brand,
      duration.toDouble / timescale,
      timescale.toInt,
      nTracks,
      if (width > 0) width.toInt else null,
      if (height > 0) height.toInt else null)
  }

  // hostile bound: a crafted stsz declaring 2^31 samples must not
  // allocate gigabytes of layout rows
  private val MaxSamples = 65536

  /** Walk to the first trak's stbl and lay out every sample. Null on
    * anything malformed — never throws. */
  def parseSamples(b: Array[Byte]): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    if (b == null || b.length < 16) return null
    if (!fourcc(b, 4, "ftyp")) return null

    // locate moov → first trak → mdia → minf → stbl by descending
    // through the container chain (each step: first matching child)
    def findChild(t: String, from: Int, end: Int): (Int, Int) = {
      var off = from
      var guard = 0
      while (off + 8 <= end && guard < 4096) {
        guard += 1
        val bd = boxBounds(b, off, end)
        if (bd == null) return null
        if (fourcc(b, off + 4, t)) return bd
        off = bd._2
      }
      null
    }
    val moov = findChild("moov", 0, b.length)
    if (moov == null) return null
    // first SAMPLED track: a metadata-only lead trak (no mdia/minf/
    // stbl chain) must not mask a valid sampled track behind it
    var stbl: (Int, Int) = null
    var tOff = moov._1
    var tGuard = 0
    while (stbl == null && tGuard < 64) {
      tGuard += 1
      val trak = findChild("trak", tOff, moov._2)
      if (trak == null) return null
      val mdia = findChild("mdia", trak._1, trak._2)
      val minf = if (mdia == null) null else findChild("minf", mdia._1, mdia._2)
      val found = if (minf == null) null else findChild("stbl", minf._1, minf._2)
      if (found != null) stbl = found else tOff = trak._2
    }
    if (stbl == null) return null

    // full-box payload cursor: ver/flags(4) then entry_count(4); the
    // declared count is distrusted against the box's actual size
    def entries(bd: (Int, Int), entryBytes: Int): (Int, Int) = {
      val (p, e) = bd
      if (p + 8 > e) return null
      val n = be32(b, p + 4)
      if (n < 0 || n > MaxSamples) return null
      if (p + 8 + n * entryBytes.toLong > e) return null // count lies
      (p + 8, n.toInt)
    }

    // stsz: fixed sample_size or per-sample table
    val stsz = findChild("stsz", stbl._1, stbl._2)
    if (stsz == null) return null
    val (szP, szE) = stsz
    if (szP + 12 > szE) return null
    val fixedSize = be32(b, szP + 4)
    val sampleCount = be32(b, szP + 8)
    if (sampleCount < 0 || sampleCount > MaxSamples) return null
    if (fixedSize < 0 || fixedSize > Int.MaxValue) return null
    if (fixedSize == 0 && szP + 12 + sampleCount * 4 > szE) return null
    val n = sampleCount.toInt
    def sizeOf(i: Int): Long = // 0-based
      if (fixedSize != 0) fixedSize else be32(b, szP + 12 + i * 4)

    // stco / co64 chunk offsets
    val stco = findChild("stco", stbl._1, stbl._2)
    val co64 = if (stco == null) findChild("co64", stbl._1, stbl._2) else null
    if (stco == null && co64 == null) return null
    val chunkBytes = if (stco != null) 4 else 8
    val co = entries(if (stco != null) stco else co64, chunkBytes)
    if (co == null) return null
    val (coP, nChunks) = co
    def chunkOffset(c: Int): Long = // 0-based
      if (chunkBytes == 4) be32(b, coP + c * 4) else be64(b, coP + c * 8)

    // stsc runs: (first_chunk 1-based, samples_per_chunk, desc_index)
    val stsc = findChild("stsc", stbl._1, stbl._2)
    if (stsc == null) return null
    val sc = entries(stsc, 12)
    if (sc == null) return null
    val (scP, nRuns) = sc
    if (nRuns == 0 && n > 0) return null

    // stss sync table (absent = every sample is a keyframe)
    val stss = findChild("stss", stbl._1, stbl._2)
    val sync: java.util.HashSet[Int] =
      if (stss == null) null
      else {
        val ss = entries(stss, 4)
        if (ss == null) return null
        val (ssP, nSync) = ss
        val set = new java.util.HashSet[Int](nSync * 2)
        var i = 0
        while (i < nSync) { set.add(be32(b, ssP + i * 4).toInt); i += 1 }
        set
      }

    // lay out samples chunk by chunk through the stsc runs
    val out = new Array[Any](n)
    var sample = 0 // 0-based
    var run = 0
    var chunk = 0 // 0-based current chunk
    while (sample < n) {
      if (run >= nRuns) return null
      val firstChunk = be32(b, scP + run * 12).toInt - 1
      val perChunk = be32(b, scP + run * 12 + 4)
      if (firstChunk < 0 || firstChunk >= nChunks || perChunk <= 0 ||
        perChunk > MaxSamples) return null
      val runEnd = // last chunk (exclusive) this run covers
        if (run + 1 < nRuns) be32(b, scP + (run + 1) * 12).toInt - 1 else nChunks
      if (runEnd <= firstChunk || runEnd > nChunks) return null
      if (chunk < firstChunk) chunk = firstChunk
      while (chunk < runEnd && sample < n) {
        val base = chunkOffset(chunk)
        // distrust the chunk map like every other table here: a co64
        // entry with the top bit set reads as a negative Long, and a
        // size run overflowing past Long.MaxValue would emit absurd
        // absolute offsets — inconsistent container ⇒ NULL, not rows
        if (base < 0) return null
        var within = 0L
        var k = 0
        while (k < perChunk && sample < n) {
          val sz = sizeOf(sample)
          if (sz < 0 || sz > Int.MaxValue) return null
          if (base + within < 0) return null // offset overflow
          out(sample) = InternalRow(
            sample + 1,
            base + within,
            sz.toInt,
            sync == null || sync.contains(sample + 1))
          within += sz
          sample += 1
          k += 1
        }
        chunk += 1
      }
      run += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}
