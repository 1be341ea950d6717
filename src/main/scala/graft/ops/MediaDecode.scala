package graft.ops

/** Pure-JDK media DECODERS (not just header parsers — see
  * [[graft.functions.MediaDims]] for the pre-decode header gate):
  * WAV PCM → sample statistics, PNG → Inflater + per-scanline
  * unfilter → pixel statistics, and JPEG/GIF/BMP (plus the PNG
  * variants the hand-rolled path declines: palette, 16-bit,
  * interlaced) → pixel statistics through `javax.imageio` — the
  * JDK's own codecs, still zero external libraries. Only genuinely
  * codec-library formats (MP3/MP4 demux+decode) return None — the
  * plumbing ([[Multimodal.decodeFeatures]]) treats undecodable as
  * NULL, never a throw.
  *
  * Hostile-input contract (same as MediaDims): every read is
  * bounds-checked, every size field distrusted, truncation and
  * malformed structure → None. Reference behavior: gratum reads media
  * only as opaque streams (ref `FileSystemSource.groovy`); decoding is
  * part of the beyond-reference multimodal brief.
  */
object MediaDecode {

  /** WAV PCM sample statistics. `peak`/`rms` are over samples
    * normalized to [-1, 1); `durationS` counts frames (all channels
    * advance together). */
  final case class WavStats(
      sampleRate: Int, channels: Int, bitsPerSample: Int,
      nFrames: Long, durationS: Double, peak: Double, rms: Double)

  /** PNG pixel statistics over the UNFILTERED bytes of every channel
    * (depth-8 gray / RGB / gray+alpha / RGBA). */
  final case class PngStats(
      width: Int, height: Int, channels: Int,
      meanPx: Double, minPx: Int, maxPx: Int)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    (u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16)).toLong |
      (u8(b, i + 3).toLong << 24)
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i + 3) | (u8(b, i + 2) << 8) | (u8(b, i + 1) << 16)).toLong |
      (u8(b, i).toLong << 24)

  /** Decode a RIFF/WAVE PCM payload (integer PCM, 8/16/24/32-bit).
    * Also decodes the other pure-arithmetic WAVE encodings a crawl
    * actually contains: IEEE float (format 3, 32/64-bit — non-finite
    * samples → None, a corrupt stream must not poison the stats) and
    * G.711 A-law / µ-law telephony audio (formats 6/7, the CCITT
    * reference expansion tables as closed-form byte arithmetic).
    * None on anything else: compressed formats, missing/short chunks,
    * a data chunk whose declared size overruns the payload
    * (truncation), or zero frames. */
  /** RIFF/WAVE header walk shared by [[wavStats]] and
    * [[wavEnergyHash]]: (format, channels, rate, bits, dataOff,
    * dataSize), size fields distrusted. */
  private def wavHeader(b: Array[Byte]): Option[(Int, Int, Int, Int, Int, Int)] = {
    if (b == null || b.length < 44) return None
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return None
    var off = 12
    var fmt: Option[(Int, Int, Int, Int)] = None // (format, channels, rate, bits)
    var data: Option[(Int, Int)] = None // (offset, size)
    var guard = 0
    while (off + 8 <= b.length && guard < 4096 && (fmt.isEmpty || data.isEmpty)) {
      val id = new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val size = le32(b, off + 4)
      // distrust the size field: beyond-payload = truncated/crafted
      if (size < 0 || size > b.length - off - 8) return None
      if (id == "fmt ") {
        if (size < 16) return None
        val audioFormat = le16(b, off + 8)
        val channels = le16(b, off + 10)
        val rate = le32(b, off + 12)
        val bits = le16(b, off + 22)
        if (channels <= 0 || rate <= 0 || rate > Int.MaxValue) return None
        val bitsOk = audioFormat match {
          case 1 => bits == 8 || bits == 16 || bits == 24 || bits == 32
          case 3 => bits == 32 || bits == 64 // IEEE float/double
          case 6 | 7 => bits == 8 // G.711 A-law / mu-law
          case _ => false
        }
        if (!bitsOk) return None
        fmt = Some((audioFormat, channels, rate.toInt, bits))
      } else if (id == "data") {
        data = Some((off + 8, size.toInt))
      }
      off += 8 + size.toInt + (size.toInt & 1) // chunks are word-aligned
      guard += 1
    }
    for (f <- fmt; d <- data) yield (f._1, f._2, f._3, f._4, d._1, d._2)
  }

  def wavStats(b: Array[Byte]): Option[WavStats] = {
    wavHeader(b) match {
      case Some((format, channels, rate, bits, dOff, dSize)) =>
        val bytesPer = bits / 8
        val frameBytes = bytesPer * channels
        val nFrames = dSize.toLong / frameBytes
        val nSamples = nFrames * channels
        if (nFrames == 0L) return None
        var peak = 0.0
        var sumSq = 0.0
        val scale = bits match {
          case 8  => 128.0
          case 16 => 32768.0
          case 24 => 8388608.0
          case _  => 2147483648.0
        }
        val end = dOff + (nSamples * bytesPer).toInt
        var p = dOff
        while (p < end) {
          val norm: Double = format match {
            case 1 =>
              val raw: Double = bits match {
                case 8  => (u8(b, p) - 128).toDouble // 8-bit WAV is unsigned
                case 16 => le16(b, p).toShort.toDouble
                case 24 =>
                  val v = u8(b, p) | (u8(b, p + 1) << 8) | (u8(b, p + 2) << 16)
                  ((v << 8) >> 8).toDouble // sign-extend 24 bits
                case _ => le32(b, p).toInt.toDouble
              }
              raw / scale
            case 3 =>
              val f =
                if (bits == 32) java.lang.Float.intBitsToFloat(le32(b, p).toInt).toDouble
                else java.lang.Double.longBitsToDouble(
                  le32(b, p) | (le32(b, p + 4) << 32))
              if (!java.lang.Double.isFinite(f)) return None
              f // already normalized; legal floats may exceed |1.0|
            case 6 => alawToLinear(u8(b, p)) / 32768.0
            case _ => ulawToLinear(u8(b, p)) / 32768.0
          }
          val a = math.abs(norm)
          if (a > peak) peak = a
          sumSq += norm * norm
          p += bytesPer
        }
        // finite-huge float samples (legal IEEE, absurd audio) can
        // overflow the sum of squares — a corrupt stream must reject,
        // not emit Infinity stats
        if (!java.lang.Double.isFinite(sumSq) || !java.lang.Double.isFinite(peak))
          return None
        Some(WavStats(rate, channels, bits, nFrames,
          nFrames.toDouble / rate, peak, math.sqrt(sumSq / nSamples)))
      case _ => None
    }
  }

  /** Energy-envelope hash of a WAV payload — the audio analog of
    * [[pngDHash]]: the PCM frame axis splits into `nBits + 1`
    * equal-share windows, per-window energy = Σ sample² over every
    * channel, one bit per adjacent window pair: 1 iff the EARLIER
    * window is louder. GAIN-INVARIANT (a volume-adjusted copy scales
    * every energy by one constant, moving zero bits) and robust to
    * re-encoding noise — Hamming distance over these bits is the
    * audio near-dup signal, paired at scale by the same banding as
    * SimHash/dHash ([[graft.ops.Dedup.audioNearDups]]).
    *
    * Exactness: 8/16-bit PCM and G.711 accumulate in the raw INTEGER
    * domain (Long cannot overflow: sample² ≤ 2^30, data ≤ 2^31
    * bytes) with cross-multiplied window comparisons — bit-exact,
    * engine-replayable. 24/32-bit and float formats accumulate in
    * double (spec-pinned, not oracle-gated). None when the payload is
    * not a decodable WAV or has fewer frames than windows. */
  def wavEnergyHash(b: Array[Byte], nBits: Int = 64): Option[Array[Int]] = {
    val h = wavHeader(b) match { case Some(x) => x; case None => return None }
    val (format, channels, _, bits, dOff, dSize) = h
    val bytesPer = bits / 8
    val frameBytes = bytesPer * channels
    val nFrames = (dSize / frameBytes).toInt
    val gw = nBits + 1
    if (nFrames < gw) return None
    val intExact = (format == 1 && bits <= 16) || format == 6 || format == 7
    val sumsL = new Array[Long](gw)
    val sumsD = new Array[Double](gw)
    val counts = new Array[Long](gw)
    var f = 0
    while (f < nFrames) {
      val w = (f.toLong * gw / nFrames).toInt
      var c = 0
      while (c < channels) {
        val p = dOff + (f.toLong * channels + c).toInt * bytesPer
        if (intExact) {
          val raw: Long = format match {
            case 1 if bits == 8 => (u8(b, p) - 128).toLong
            case 1 => le16(b, p).toShort.toLong
            case 6 => alawToLinear(u8(b, p)).toLong
            case _ => ulawToLinear(u8(b, p)).toLong
          }
          sumsL(w) += raw * raw
        } else {
          val v: Double = format match {
            case 1 if bits == 24 =>
              val x = u8(b, p) | (u8(b, p + 1) << 8) | (u8(b, p + 2) << 16)
              ((x << 8) >> 8).toDouble
            case 1 => le32(b, p).toInt.toDouble
            case _ =>
              if (bits == 32) java.lang.Float.intBitsToFloat(le32(b, p).toInt).toDouble
              else java.lang.Double.longBitsToDouble(
                le32(b, p) | (le32(b, p + 4) << 32))
          }
          if (!java.lang.Double.isFinite(v)) return None
          sumsD(w) += v * v
        }
        c += 1
      }
      counts(w) += channels
      f += 1
    }
    // hostile-input discipline matching wavStats: per-sample finiteness
    // is checked above, but legal huge finite floats can still overflow
    // a window's Σv² to Infinity — a non-finite SUM means the signature
    // would be garbage, so reject the payload rather than emit it
    if (!intExact) {
      var k = 0
      while (k < gw) {
        if (!java.lang.Double.isFinite(sumsD(k))) return None
        k += 1
      }
    }
    val out = new Array[Int](nBits)
    var i = 0
    while (i < nBits) {
      // mean(i) > mean(i+1) without division; window sizes differ by
      // at most one frame, but cross-multiply anyway — BigInt keeps
      // the integer path exact (64 comparisons per file, not per
      // sample, so the cost is noise)
      val gt =
        if (intExact)
          BigInt(sumsL(i)) * counts(i + 1) > BigInt(sumsL(i + 1)) * counts(i)
        else sumsD(i) * counts(i + 1) > sumsD(i + 1) * counts(i)
      out(i) = if (gt) 1 else 0
      i += 1
    }
    Some(out)
  }

  /** G.711 µ-law byte → linear 16-bit sample (CCITT reference
    * expansion, closed form). */
  def ulawToLinear(v: Int): Int = {
    val u = ~v & 0xff
    val t = (((u & 0x0f) << 3) + 0x84) << ((u & 0x70) >> 4)
    if ((u & 0x80) != 0) 0x84 - t else t - 0x84
  }

  /** G.711 A-law byte → linear 16-bit sample (CCITT reference
    * expansion; sign bit SET is positive after the 0x55 toggle). */
  def alawToLinear(v: Int): Int = {
    val a = v ^ 0x55
    val seg = (a & 0x70) >> 4
    val t0 = (a & 0x0f) << 4
    val t =
      if (seg == 0) t0 + 8
      else (t0 + 0x108) << (seg - 1)
    if ((a & 0x80) != 0) t else -t
  }

  private val pngChannels = Map(0 -> 1, 2 -> 3, 4 -> 2, 6 -> 4)

  /** Decode a PNG payload: IHDR → concatenated IDAT zlib stream →
    * Inflater → per-scanline unfilter (None/Sub/Up/Average/Paeth) →
    * statistics over the raw channel bytes. Depth-8, non-interlaced,
    * non-palette only (palette/16-bit/interlace → None — they need no
    * codec library either, but are not worth the surface until a
    * corpus needs them). Chunk CRCs are NOT verified: corruption
    * surfaces as an inflate/size failure (→ None), and a stats pass
    * has no integrity contract to uphold. The zlib container is read
    * with Inflater(nowrap) after validating the 2-byte header, so the
    * trailing adler32 is not required — a prefix-fetched payload cut
    * after the last IDAT's data still decodes. */
  /** Fully decoded PNG pixel grid (the byte-walk + Inflater +
    * unfilter pipeline behind [[pngStats]]): `px` is row-major
    * channel-interleaved, `stride = width * channels`. */
  final case class PngPixels(
      width: Int, height: Int, channels: Int, px: Array[Int])

  def pngStats(b: Array[Byte]): Option[PngStats] =
    pngPixels(b).map { p =>
      var sum = 0L; var min = 255; var max = 0
      var i = 0
      while (i < p.px.length) {
        val v = p.px(i)
        sum += v
        if (v < min) min = v
        if (v > max) max = v
        i += 1
      }
      PngStats(p.width, p.height, p.channels,
        sum.toDouble / p.px.length, min, max)
    }

  def pngPixels(b: Array[Byte]): Option[PngPixels] = {
    if (b == null || b.length < 8 + 25) return None
    val sig = Array[Int](0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    var k = 0
    while (k < 8) { if (u8(b, k) != sig(k)) return None; k += 1 }
    // IHDR must be first (spec) — 13-byte payload
    if (be32(b, 8) != 13L || !chunkTypeIs(b, 12, "IHDR")) return None
    val width = be32(b, 16)
    val height = be32(b, 20)
    val bitDepth = u8(b, 24)
    val colorType = u8(b, 25)
    val interlace = u8(b, 28)
    if (width <= 0 || height <= 0 || width > Int.MaxValue || height > Int.MaxValue)
      return None
    if (bitDepth != 8 || interlace != 0) return None
    val channels = pngChannels.getOrElse(colorType, return None)
    // bound the decode buffer: a crafted IHDR declaring a huge image
    // must not allocate gigabytes before inflate fails — cap at 64 MiB
    val rowBytes = 1L + width * channels
    val rawSize = rowBytes * height
    if (rawSize > 64L * 1024 * 1024) return None

    // walk chunks, concatenating IDAT payloads
    val zlib = new java.io.ByteArrayOutputStream()
    var off = 33 // 8 sig + 25 IHDR chunk
    var guard = 0
    var done = false
    while (!done && off + 8 <= b.length && guard < 65536) {
      val len = be32(b, off)
      if (len < 0 || len > b.length - off - 8) return None // truncated chunk
      if (chunkTypeIs(b, off + 4, "IDAT")) zlib.write(b, off + 8, len.toInt)
      else if (chunkTypeIs(b, off + 4, "IEND")) done = true
      off += 12 + len.toInt // len + type + data + crc
      guard += 1
    }
    val z = zlib.toByteArray
    if (z.length < 3) return None
    if ((z(0) & 0x0f) != 8) return None // CM must be deflate
    if ((z(1) & 0x20) != 0) return None // FDICT unsupported
    val inf = new java.util.zip.Inflater(true)
    val raw = new Array[Byte](rawSize.toInt)
    try {
      inf.setInput(z, 2, z.length - 2)
      var got = 0
      while (got < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, got, raw.length - got)
        // any zero-progress state (short stream, or the pathological
        // needs-dictionary answer FDICT=0 should preclude) → None
        // rather than risking a spin on crafted bytes
        if (n == 0) return None
        got += n
      }
      if (got < raw.length) return None
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally inf.end()

    // unfilter scanlines in place into pixel bytes
    val w = width.toInt; val h = height.toInt
    val stride = w * channels
    val px = new Array[Int](stride * h)
    var y = 0
    while (y < h) {
      val rowOff = (y * (stride + 1)).toInt
      val filter = u8(raw, rowOff)
      if (filter > 4) return None
      var x = 0
      while (x < stride) {
        val cur = u8(raw, rowOff + 1 + x)
        val left = if (x >= channels) px(y * stride + x - channels) else 0
        val up = if (y > 0) px((y - 1) * stride + x) else 0
        val upLeft = if (y > 0 && x >= channels) px((y - 1) * stride + x - channels) else 0
        val recon = filter match {
          case 0 => cur
          case 1 => cur + left
          case 2 => cur + up
          case 3 => cur + ((left + up) >> 1)
          case 4 => cur + paeth(left, up, upLeft)
        }
        px(y * stride + x) = recon & 0xff
        x += 1
      }
      y += 1
    }
    Some(PngPixels(w, h, channels, px))
  }

  /** Perceptual difference-hash over a decoded pixel grid:
    * grayscale (ITU-R BT.601 integer luma `(299R+587G+114B)/1000` for
    * color, the gray channel for gray/gray+alpha, alpha ignored),
    * area-average to a `(hashW+1) x hashH` cell grid (exact rational
    * comparison — no per-cell division rounding), one bit per
    * horizontally-adjacent cell pair: bit = 1 iff left cell is
    * BRIGHTER than its right neighbor. Row-major bit order (y outer,
    * x inner), `hashW * hashH` bits. Returns None when the image is
    * smaller than the cell grid (an empty cell has no brightness). */
  def dHashFromPixels(
      p: PngPixels, hashW: Int, hashH: Int): Option[Array[Int]] = {
    val gw = hashW + 1
    if (p.width < gw || p.height < hashH) return None
    // per-cell brightness sums and pixel counts: cell (cx, cy) covers
    // [floor(cx*W/gw), floor((cx+1)*W/gw)) x [floor(cy*H/gh), ...)
    val sums = new Array[Long](gw * hashH)
    val counts = new Array[Long](gw * hashH)
    val ch = p.channels
    var y = 0
    while (y < p.height) {
      val cy = (y.toLong * hashH / p.height).toInt
      var x = 0
      while (x < p.width) {
        val cx = (x.toLong * gw / p.width).toInt
        val base = (y * p.width + x) * ch
        val lum =
          if (ch >= 3)
            (299 * p.px(base) + 587 * p.px(base + 1) + 114 * p.px(base + 2)) / 1000
          else p.px(base) // gray / gray+alpha: channel 0 is the gray
        val cell = cy * gw + cx
        sums(cell) += lum
        counts(cell) += 1L
        x += 1
      }
      y += 1
    }
    val bits = new Array[Int](hashW * hashH)
    var cy = 0
    while (cy < hashH) {
      var cx = 0
      while (cx < hashW) {
        val l = cy * gw + cx
        val r = l + 1
        // mean(l) > mean(r) without division: cross-multiplied exact.
        // BigInt, not Long — a gigapixel image with a tiny hash grid
        // makes 255·n² exceed 2^63 (the wavEnergyHash discipline; 64
        // comparisons per image, the cost is noise)
        bits(cy * hashW + cx) =
          if (BigInt(sums(l)) * counts(r) > BigInt(sums(r)) * counts(l)) 1
          else 0
        cx += 1
      }
      cy += 1
    }
    Some(bits)
  }

  /** [[dHashFromPixels]] over PNG bytes ([[pngPixels]] decode). */
  def pngDHash(
      b: Array[Byte], hashW: Int = 8, hashH: Int = 8): Option[Array[Int]] =
    pngPixels(b).flatMap(dHashFromPixels(_, hashW, hashH))

  /** Shared envelope→bits kernel (the [[wavEnergyHash]] shape over an
    * arbitrary per-item value sequence): values split into `nBits + 1`
    * equal-share windows, one bit per adjacent pair — 1 iff the
    * EARLIER window's mean is greater (BigInt cross-multiplied,
    * exact). None when there are fewer values than windows. */
  private[graft] def envelopeBits(
      values: Array[Long], nBits: Int): Option[Array[Int]] = {
    val gw = nBits + 1
    val n = values.length
    if (n < gw) return None
    val sums = new Array[Long](gw)
    val counts = new Array[Long](gw)
    var i = 0
    while (i < n) {
      val w = (i.toLong * gw / n).toInt
      sums(w) += values(i)
      counts(w) += 1L
      i += 1
    }
    val out = new Array[Int](nBits)
    var k = 0
    while (k < nBits) {
      out(k) =
        if (BigInt(sums(k)) * counts(k + 1) > BigInt(sums(k + 1)) * counts(k)) 1
        else 0
      k += 1
    }
    Some(out)
  }

  /** Structural fingerprint of an MP4 payload — the VIDEO near-dup
    * signature: the per-sample coded-size sequence from the REAL
    * sample-table walk ([[graft.functions.Mp4MetaUtil.parseSamples]]:
    * stsz/stsc/stco/stss) run through [[envelopeBits]]. Coded frame
    * sizes track content complexity over time; a re-MUXED or
    * retagged copy preserves the sample table exactly (Hamming 0)
    * and a lightly-trimmed copy moves few bits. NOT robust to
    * re-ENCODING (a different encoder re-costs every frame) — pair
    * with embedding near-dup when re-encodes must match. None for
    * non-MP4 bytes or fewer samples than windows. */
  def mp4StructureHash(b: Array[Byte], nBits: Int = 64): Option[Array[Int]] = {
    val arr = graft.functions.Mp4MetaUtil.parseSamples(b)
    if (arr == null) return None
    val n = arr.numElements()
    val sizes = new Array[Long](n)
    var i = 0
    while (i < n) {
      sizes(i) = arr.getStruct(i, 4).getInt(2).toLong
      i += 1
    }
    envelopeBits(sizes, nBits)
  }

  /** Image pixel statistics for the ImageIO-backed formats. `channels`
    * is the color model's component count (3 for RGB/indexed, 4 with
    * alpha); `meanPx`/`minPx`/`maxPx` are over the RESOLVED R, G, B
    * values of every pixel (palette looked up, alpha ignored) so an
    * indexed GIF and the 24-bit BMP of the same image agree. */
  final case class ImageStats(
      kind: String, width: Int, height: Int, channels: Int,
      meanPx: Double, minPx: Int, maxPx: Int)

  private def imageKind(b: Array[Byte]): String =
    if (b.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a') "gif"
    else if (b.length >= 2 && b(0) == 'B' && b(1) == 'M') "bmp"
    else if (b.length >= 3 && u8(b, 0) == 0xff && u8(b, 1) == 0xd8 &&
      u8(b, 2) == 0xff) "jpeg"
    else if (b.length >= 8 && u8(b, 0) == 0x89 && b(1) == 'P') "png"
    else null

  // ImageIO statics, once per JVM: no disk spill on executors (the
  // default cache writes temp files per read) and no display probe
  private lazy val imageIoReady: Boolean = {
    if (System.getProperty("java.awt.headless") == null)
      System.setProperty("java.awt.headless", "true")
    javax.imageio.ImageIO.setUseCache(false)
    true
  }

  /** Decode an image payload through the JDK's own codecs
    * (`javax.imageio`: JPEG, GIF, BMP, PNG) and return pixel
    * statistics. None for unrecognized magic bytes, malformed or
    * truncated payloads, or images past the 16M-pixel decode bound —
    * checked against the reader's LAZY header dims BEFORE any pixel
    * decode, so a crafted tiny payload declaring 20000x20000 never
    * allocates the gigabytes (the decompression-bomb shape a crawled
    * corpus will contain). Never throws. */
  def imageStats(b: Array[Byte]): Option[ImageStats] = {
    if (b == null || b.length < 8) return None
    val kind = imageKind(b)
    if (kind == null || !imageIoReady) return None
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(b))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) { iis.close(); return None }
      val reader = readers.next()
      val img =
        try {
          reader.setInput(iis, true, true)
          // header-only dims — the bound gates the pixel allocation
          val hw = reader.getWidth(0); val hh = reader.getHeight(0)
          if (hw <= 0 || hh <= 0 || hw.toLong * hh > 16L * 1024 * 1024) return None
          reader.read(0)
        } finally { reader.dispose(); iis.close() }
      if (img == null) return None
      val w = img.getWidth; val h = img.getHeight
      if (w <= 0 || h <= 0 || w.toLong * h > 16L * 1024 * 1024) return None
      val channels = img.getColorModel.getNumComponents
      var sum = 0L; var mn = 255; var mx = 0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          var shift = 16
          while (shift >= 0) {
            val v = (rgb >> shift) & 0xff
            sum += v
            if (v < mn) mn = v
            if (v > mx) mx = v
            shift -= 8
          }
          x += 1
        }
        y += 1
      }
      Some(ImageStats(kind, w, h, channels,
        sum.toDouble / (3L * w * h), mn, mx))
    } catch {
      // beyond NonFatal: a broken ImageIO SPI registration throws
      // ServiceConfigurationError and a missing native codec lib
      // throws UnsatisfiedLinkError — for a decode probe both mean
      // "undecodable here", not "kill the task"
      case scala.util.control.NonFatal(_) => None
      case _: java.util.ServiceConfigurationError => None
      case _: LinkageError => None
    }
  }

  private def chunkTypeIs(b: Array[Byte], off: Int, t: String): Boolean =
    off + 4 <= b.length &&
      b(off) == t.charAt(0) && b(off + 1) == t.charAt(1) &&
      b(off + 2) == t.charAt(2) && b(off + 3) == t.charAt(3)

  private def paeth(a: Int, bb: Int, c: Int): Int = {
    val p = a + bb - c
    val pa = math.abs(p - a); val pb = math.abs(p - bb); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) bb else c
  }
}
