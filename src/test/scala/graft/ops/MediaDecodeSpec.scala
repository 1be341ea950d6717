package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Byte-level verification of the pure-JDK decoders: WAV PCM stats
  * against hand-computed references at every supported bit depth, PNG
  * pixel stats against encoder round-trips built with the JDK's own
  * Deflater — REAL compressed streams with every filter predictor
  * (0–4), not just the stored-block shape the gate query assembles —
  * plus truncation / malformation / fuzz (None, never a throw). The
  * end-to-end Spark plumbing is gated by q_multimodal_decode. */
class MediaDecodeSpec extends AnyFunSuite {

  private def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  // ---------- WAV builders ----------

  private def le16(v: Int) = b(v & 0xff, (v >>> 8) & 0xff)
  private def le32(v: Int) =
    b(v & 0xff, (v >>> 8) & 0xff, (v >>> 16) & 0xff, (v >>> 24) & 0xff)

  private def wav(rate: Int, channels: Int, bits: Int, data: Array[Byte],
      audioFormat: Int = 1): Array[Byte] = {
    val blockAlign = channels * bits / 8
    "RIFF".getBytes ++ le32(36 + data.length) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(audioFormat) ++ le16(channels) ++
      le32(rate) ++ le32(rate * blockAlign) ++ le16(blockAlign) ++ le16(bits) ++
      "data".getBytes ++ le32(data.length) ++ data
  }

  test("wav 16-bit mono: exact rms/peak/duration") {
    // samples +16384 (=0.5), -16384: peak 0.5, rms 0.5, 2 frames @ 8000
    val data = le16(16384) ++ le16(-16384 & 0xffff)
    val s = MediaDecode.wavStats(wav(8000, 1, 16, data)).get
    assert(s.sampleRate == 8000 && s.channels == 1 && s.bitsPerSample == 16)
    assert(s.nFrames == 2L)
    assert(s.durationS == 2.0 / 8000)
    assert(s.peak == 0.5)
    assert(s.rms == 0.5)
  }

  test("wav 8-bit unsigned: 128 is silence, 0/255 near full-scale") {
    val s = MediaDecode.wavStats(wav(44100, 1, 8, b(128, 128, 128, 128))).get
    assert(s.peak == 0.0 && s.rms == 0.0)
    val loud = MediaDecode.wavStats(wav(44100, 1, 8, b(0, 255))).get
    assert(loud.peak == 1.0) // (0-128)/128 = -1
    assert(math.abs(loud.rms - math.sqrt((1.0 + (127.0 / 128) * (127.0 / 128)) / 2)) < 1e-15)
  }

  test("wav 24-bit sign extension and 32-bit scale") {
    // 24-bit sample 0x800000 = -8388608 → norm -1.0
    val s24 = MediaDecode.wavStats(wav(48000, 1, 24, b(0, 0, 0x80))).get
    assert(s24.peak == 1.0 && s24.rms == 1.0)
    // 32-bit sample Int.MinValue → -1.0
    val s32 = MediaDecode.wavStats(wav(48000, 1, 32, le32(Int.MinValue))).get
    assert(s32.peak == 1.0)
  }

  test("wav stereo: frames count channel groups, rms spans all samples") {
    // L=0.5, R=0 per frame, 3 frames
    val frame = le16(16384) ++ le16(0)
    val s = MediaDecode.wavStats(wav(16000, 2, 16, frame ++ frame ++ frame)).get
    assert(s.nFrames == 3L && s.channels == 2)
    assert(s.durationS == 3.0 / 16000)
    assert(s.rms == math.sqrt(0.25 / 2)) // half the samples at 0.5, half 0
  }

  test("wav IEEE float (format 3): samples pass through unscaled; non-finite → None") {
    def f32(v: Float) = le32(java.lang.Float.floatToIntBits(v))
    val data = f32(0.5f) ++ f32(-0.25f) ++ f32(0.0f) ++ f32(1.25f) // |s|>1 is legal
    val st = MediaDecode.wavStats(wav(48000, 1, 32, data, audioFormat = 3))
      .getOrElse(fail("float wav did not decode"))
    assert(st.nFrames == 4 && st.bitsPerSample == 32)
    assert(st.peak == 1.25)
    assert(st.rms == math.sqrt((0.25 + 0.0625 + 0.0 + 1.5625) / 4))
    // doubles (64-bit float) decode too
    def f64(v: Double) = {
      val bits = java.lang.Double.doubleToLongBits(v)
      le32(bits.toInt) ++ le32((bits >>> 32).toInt)
    }
    val st64 = MediaDecode.wavStats(
      wav(8000, 1, 64, f64(0.5) ++ f64(-0.5), audioFormat = 3))
      .getOrElse(fail("double wav did not decode"))
    assert(st64.peak == 0.5 && st64.rms == 0.5)
    // a NaN sample poisons nothing: the whole payload is rejected
    assert(MediaDecode.wavStats(
      wav(8000, 1, 32, f32(0.5f) ++ f32(Float.NaN), audioFormat = 3)).isEmpty)
    assert(MediaDecode.wavStats(
      wav(8000, 1, 32, f32(Float.PositiveInfinity), audioFormat = 3)).isEmpty)
    // finite-huge doubles whose squares overflow are corrupt too
    assert(MediaDecode.wavStats(
      wav(8000, 1, 64, f64(1e300) ++ f64(0.5), audioFormat = 3)).isEmpty)
  }

  test("wav G.711 mu-law and A-law expand through the CCITT reference tables") {
    // mu-law: 0xFF and 0x7F encode silence; 0x00 is max negative
    assert(MediaDecode.ulawToLinear(0xFF) == 0)
    assert(MediaDecode.ulawToLinear(0x7F) == 0)
    assert(MediaDecode.ulawToLinear(0x00) == -32124)
    assert(MediaDecode.ulawToLinear(0x80) == 32124)
    // A-law: 0x55 -> -8, 0xD5 -> +8, 0x2A -> -32256 (max magnitude)
    assert(MediaDecode.alawToLinear(0x55) == -8)
    assert(MediaDecode.alawToLinear(0xD5) == 8)
    assert(MediaDecode.alawToLinear(0x2A) == -32256)
    assert(MediaDecode.alawToLinear(0xAA) == 32256)
    // end-to-end: stats equal the hand-expanded samples
    val bytes = b(0x00, 0xFF, 0x9A, 0x42)
    val exp = Seq(0x00, 0xFF, 0x9A, 0x42).map(MediaDecode.ulawToLinear)
    val st = MediaDecode.wavStats(wav(8000, 1, 8, bytes, audioFormat = 7))
      .getOrElse(fail("mu-law wav did not decode"))
    assert(st.nFrames == 4 && st.bitsPerSample == 8)
    assert(st.peak == exp.map(v => math.abs(v / 32768.0)).max)
    assert(st.rms == math.sqrt(exp.map(v => (v / 32768.0) * (v / 32768.0)).sum / 4))
    val stA = MediaDecode.wavStats(wav(8000, 1, 8, bytes, audioFormat = 6))
      .getOrElse(fail("A-law wav did not decode"))
    val expA = Seq(0x00, 0xFF, 0x9A, 0x42).map(MediaDecode.alawToLinear)
    assert(stA.peak == expA.map(v => math.abs(v / 32768.0)).max)
  }

  test("wav hostile: non-PCM, truncated data, oversized chunk, zero frames → None") {
    assert(MediaDecode.wavStats(wav(8000, 1, 16, le16(1), audioFormat = 2)).isEmpty) // ADPCM
    assert(MediaDecode.wavStats(wav(8000, 1, 16, le16(1), audioFormat = 3)).isEmpty) // float must be 32/64-bit
    assert(MediaDecode.wavStats(wav(8000, 1, 16, le16(1), audioFormat = 7)).isEmpty) // mu-law must be 8-bit
    val good = wav(8000, 1, 16, le16(1) ++ le16(2))
    assert(MediaDecode.wavStats(good.dropRight(3)).isEmpty) // data chunk overruns payload
    assert(MediaDecode.wavStats(wav(8000, 1, 16, Array.emptyByteArray)).isEmpty) // 0 frames
    val crafted = good.clone()
    crafted(40) = 0xff.toByte; crafted(41) = 0xff.toByte // data size lies huge
    crafted(42) = 0xff.toByte; crafted(43) = 0x7f.toByte
    assert(MediaDecode.wavStats(crafted).isEmpty)
    assert(MediaDecode.wavStats(null).isEmpty)
    assert(MediaDecode.wavStats("RIFFxxxxWAVE".getBytes).isEmpty)
  }

  // ---------- PNG builders (real Deflater stream) ----------

  private def be32(v: Int) =
    b(v >>> 24, (v >>> 16) & 0xff, (v >>> 8) & 0xff, v & 0xff)

  private def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val crc = new java.util.zip.CRC32()
    crc.update(typ.getBytes); crc.update(data)
    be32(data.length) ++ typ.getBytes ++ data ++ be32(crc.getValue.toInt)
  }

  /** Spec-valid PNG (correct CRCs and adler) from raw scanlines
    * (each: filter byte + w*channels filtered bytes). */
  private def png(w: Int, h: Int, colorType: Int, scanlines: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(scanlines); d.finish()
    val buf = new Array[Byte](scanlines.length + 64)
    val n = d.deflate(buf)
    d.end()
    b(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      chunk("IHDR", be32(w) ++ be32(h) ++ b(8, colorType, 0, 0, 0)) ++
      chunk("IDAT", buf.take(n)) ++
      chunk("IEND", Array.emptyByteArray)
  }

  test("png gray, filter 0: exact stats") {
    val s = MediaDecode.pngStats(png(3, 2, 0, b(0, 10, 20, 30, 0, 40, 50, 60))).get
    assert(s.width == 3 && s.height == 2 && s.channels == 1)
    assert(s.minPx == 10 && s.maxPx == 60)
    assert(s.meanPx == 210.0 / 6)
  }

  test("png filters 1-4 reconstruct: Sub, Up, Average, Paeth") {
    // 2x2 gray, pixels row0=(100, 103), row1=(110, 117)
    // row0 Sub: filter 1, bytes (100, 3); row1 Paeth: filter 4
    // paeth(left, up, upleft): for x=0: paeth(0,100,0)=100 → byte 10
    // for x=1: left=110, up=103, upleft=100 → p=113, pa=3,pb=10,pc=13 → a=110 → byte 7
    val s = MediaDecode.pngStats(png(2, 2, 0, b(1, 100, 3, 4, 10, 7))).get
    assert(s.minPx == 100 && s.maxPx == 117)
    assert(s.meanPx == (100 + 103 + 110 + 117) / 4.0)
    // Up (2) and Average (3): row1 from row0=(8, 16)
    // Up: byte = cur-up → (2, 4) gives (10, 20); Avg: x=0 avg(0,8)=4, x=1 avg(12,16)=14
    val s2 = MediaDecode.pngStats(png(2, 3, 0,
      b(0, 8, 16, 2, 2, 4, 3, 6, 0))).get
    // row2 Average: x=0: cur 6 + (0+10)/2 = 11; x=1: cur 0 + (11+20)/2 = 15
    assert(s2.minPx == 8 && s2.maxPx == 20)
    assert(s2.meanPx == (8 + 16 + 10 + 20 + 11 + 15) / 6.0)
  }

  test("png rgb and rgba channel counts") {
    val rgb = MediaDecode.pngStats(png(2, 1, 2, b(0, 1, 2, 3, 4, 5, 6))).get
    assert(rgb.channels == 3 && rgb.meanPx == 21.0 / 6 && rgb.maxPx == 6)
    val rgba = MediaDecode.pngStats(png(1, 1, 6, b(0, 9, 8, 7, 255))).get
    assert(rgba.channels == 4 && rgba.maxPx == 255 && rgba.minPx == 7)
  }

  test("png multiple IDAT chunks concatenate") {
    val full = png(3, 1, 0, b(0, 5, 6, 7))
    // split the single IDAT into two: rebuild chunks around the zlib bytes
    val sig = full.take(8); val ihdr = full.slice(8, 8 + 25)
    val idatLen = ((full(33) & 0xff) << 24) | ((full(34) & 0xff) << 16) |
      ((full(35) & 0xff) << 8) | (full(36) & 0xff)
    val z = full.slice(41, 41 + idatLen)
    val split = sig ++ ihdr ++ chunk("IDAT", z.take(3)) ++
      chunk("IDAT", z.drop(3)) ++ chunk("IEND", Array.emptyByteArray)
    val s = MediaDecode.pngStats(split).get
    assert(s.meanPx == 6.0 && s.minPx == 5 && s.maxPx == 7)
  }

  test("png hostile: palette, 16-bit, interlaced, truncated IDAT, bad filter, giant IHDR → None") {
    assert(MediaDecode.pngStats(png(1, 1, 3, b(0, 0))).isEmpty) // palette color type
    val p16 = png(1, 1, 0, b(0, 0))
    p16(24 /*bit depth*/ ) = 16
    assert(MediaDecode.pngStats(p16).isEmpty)
    val inter = png(1, 1, 0, b(0, 0))
    inter(28 /*interlace*/ ) = 1
    assert(MediaDecode.pngStats(inter).isEmpty)
    val good = png(4, 4, 0, Array.tabulate(20)(i => if (i % 5 == 0) 0 else i).map(_.toByte))
    assert(MediaDecode.pngStats(good.dropRight(20)).isEmpty) // truncated mid-IDAT
    assert(MediaDecode.pngStats(png(2, 1, 0, b(9, 1, 2))).isEmpty) // filter type 9
    val giant = png(1, 1, 0, b(0, 0))
    giant(16) = 0x7f; giant(17) = 0xff.toByte // width 2^31-ish → decode bound
    assert(MediaDecode.pngStats(giant).isEmpty)
    assert(MediaDecode.pngStats(null).isEmpty)
  }

  test("fuzz: 2000 random/truncated payloads never throw") {
    val rnd = new scala.util.Random(42)
    val seeds = Seq(
      wav(8000, 2, 16, le16(5) ++ le16(6)),
      png(3, 3, 2, Array.tabulate(30)(i => if (i % 10 == 0) 0 else i).map(_.toByte)))
    (0 until 2000).foreach { i =>
      val payload =
        if (i % 2 == 0) { // mutated valid payload
          val base = seeds(rnd.nextInt(seeds.length)).clone()
          (0 until 1 + rnd.nextInt(4)).foreach { _ =>
            base(rnd.nextInt(base.length)) = rnd.nextInt(256).toByte
          }
          base.take(1 + rnd.nextInt(base.length))
        } else { // pure noise
          val a = new Array[Byte](rnd.nextInt(64)); rnd.nextBytes(a); a
        }
      MediaDecode.wavStats(payload) // must not throw
      MediaDecode.pngStats(payload)
    }
  }

  // ---------- ImageIO-backed image stats ----------

  private def encode(img: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, bos), s"JDK cannot encode $fmt")
    bos.toByteArray
  }

  private def rgbImage(w: Int, h: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 40) % 256 << 16) | ((y * 50) % 256 << 8) | 77)
    img
  }

  /** Hand-assembled GIF89a: 256-entry palette `i -> (i, 2i%256,
    * 3i%256)`, pixel indices LZW-coded as fixed-width 9-bit literal
    * codes with a clear code before every 250 literals (the classic
    * uncompressed-GIF trick — a real LZW decoder still has to resolve
    * the code stream). Built by hand because the JDK GIF WRITER
    * corrupts some image sizes (5x3, 16x4 observed); the READER —
    * which is the only side this engine ships — is fine. */
  private def handGif(w: Int, h: Int, px: (Int, Int) => Int): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    o.write("GIF89a".getBytes("US-ASCII"))
    o.write(w & 0xff); o.write(w >> 8); o.write(h & 0xff); o.write(h >> 8)
    o.write(0xF7); o.write(0); o.write(0)
    for (i <- 0 until 256) { o.write(i); o.write((2 * i) & 0xff); o.write((3 * i) & 0xff) }
    o.write(0x2C); o.write(0); o.write(0); o.write(0); o.write(0)
    o.write(w & 0xff); o.write(w >> 8); o.write(h & 0xff); o.write(h >> 8)
    o.write(0); o.write(8) // no local table; LZW min code size 8
    val codes = scala.collection.mutable.ArrayBuffer[Int]()
    var sinceClear = Int.MaxValue
    for (y <- 0 until h; x <- 0 until w) {
      if (sinceClear >= 250) { codes += 256; sinceClear = 0 }
      codes += px(x, y); sinceClear += 1
    }
    codes += 257
    val data = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L; var nBits = 0
    codes.foreach { c =>
      bitBuf |= c.toLong << nBits; nBits += 9
      while (nBits >= 8) { data.write((bitBuf & 0xff).toInt); bitBuf >>>= 8; nBits -= 8 }
    }
    if (nBits > 0) data.write((bitBuf & 0xff).toInt)
    val bytes = data.toByteArray
    var off = 0
    while (off < bytes.length) { // 255-byte sub-blocks
      val n = math.min(255, bytes.length - off)
      o.write(n); o.write(bytes, off, n); off += n
    }
    o.write(0); o.write(0x3B)
    o.toByteArray
  }

  // ---------- perceptual dHash ----------

  /** filter-0 scanlines for a w x h gray image from a pixel formula. */
  private def grayScan(w: Int, h: Int)(px: (Int, Int) => Int): Array[Byte] =
    (0 until h).flatMap(y =>
      0.toByte +: (0 until w).map(x => px(x, y).toByte)).toArray

  test("pngDHash: 9x8 gray = direct pixel comparisons, row-major bit order") {
    def px(x: Int, y: Int) = (x * 40 + y * 5 + 7) % 256 // wraps within a row
    val bits = MediaDecode.pngDHash(png(9, 8, 0, grayScan(9, 8)(px))).get
    assert(bits.length == 64)
    val want = for (y <- 0 until 8; x <- 0 until 8)
      yield if (px(x, y) > px(x + 1, y)) 1 else 0
    assert(bits.toSeq == want)
    // a monotone gradient has wrap points where %256 resets — both
    // bit values must occur (guards an all-zeros degenerate hash)
    assert(bits.contains(1) && bits.contains(0))
  }

  test("pngDHash: area-average downsample — 2x-replicated image hashes identically") {
    def px(x: Int, y: Int) = (x * 37 + y * 11) % 251
    val small = MediaDecode.pngDHash(png(9, 8, 0, grayScan(9, 8)(px))).get
    val big = MediaDecode.pngDHash(
      png(18, 16, 0, grayScan(18, 16)((x, y) => px(x / 2, y / 2)))).get
    assert(small.toSeq == big.toSeq)
  }

  test("pngDHash: RGB luma — r=g=b image hashes like its gray twin; alpha ignored") {
    def px(x: Int, y: Int) = (x * 13 + y * 29) % 256
    val gray = MediaDecode.pngDHash(png(9, 8, 0, grayScan(9, 8)(px))).get
    val rgbScan = (0 until 8).flatMap(y =>
      0.toByte +: (0 until 9).flatMap { x =>
        val v = px(x, y).toByte; Seq(v, v, v)
      }).toArray
    val rgb = MediaDecode.pngDHash(png(9, 8, 2, rgbScan)).get
    assert(gray.toSeq == rgb.toSeq)
    val rgbaScan = (0 until 8).flatMap(y =>
      0.toByte +: (0 until 9).flatMap { x =>
        val v = px(x, y).toByte
        Seq(v, v, v, ((x * 91 + y) % 256).toByte) // noisy alpha, ignored
      }).toArray
    val rgba = MediaDecode.pngDHash(png(9, 8, 6, rgbaScan)).get
    assert(gray.toSeq == rgba.toSeq)
  }

  test("pngDHash: too-small images and junk bytes → None, never a throw") {
    // 8x8 is one column short of the 9x8 cell grid
    assert(MediaDecode.pngDHash(png(8, 8, 0, grayScan(8, 8)((x, y) => x + y))).isEmpty)
    assert(MediaDecode.pngDHash(Array[Byte](1, 2, 3)).isEmpty)
    assert(MediaDecode.pngDHash("not a png at all".getBytes).isEmpty)
  }

  // ---------- audio energy hash ----------

  private def pcm16(samples: Seq[Int]): Array[Byte] =
    samples.flatMap(s => Seq((s & 0xff).toByte, ((s >> 8) & 0xff).toByte)).toArray

  test("wavEnergyHash: golden window comparisons; gain invariance; None arms") {
    // 130 mono 16-bit samples → 65 two-frame windows, 64 bits
    def s(k: Int) = ((k * k * 7 + 13) % 65536) - 32768
    val samples = (0 until 130).map(s)
    val bits = MediaDecode.wavEnergyHash(wav(8000, 1, 16, pcm16(samples))).get
    assert(bits.length == 64)
    def e(w: Int): Long = {
      val a = s(2 * w).toLong; val b2 = s(2 * w + 1).toLong
      a * a + b2 * b2
    }
    val want = (0 until 64).map(w => if (e(w) > e(w + 1)) 1 else 0)
    assert(bits.toSeq == want)
    assert(bits.contains(0) && bits.contains(1))
    // GAIN INVARIANCE: halving the volume moves zero bits
    val half = MediaDecode.wavEnergyHash(
      wav(8000, 1, 16, pcm16(samples.map(_ / 2)))).get
    // (integer halving is not an exact scale; allow the few bits where
    // truncation flips a near-tie, but the envelope must survive)
    val moved = bits.zip(half).count { case (a, b) => a != b }
    assert(moved <= 4, s"gain change moved $moved bits")
    // an EXACT scale (x2 from a half-range base) moves zero bits
    val base = samples.map(_ / 2)
    val b1 = MediaDecode.wavEnergyHash(wav(8000, 1, 16, pcm16(base))).get
    val b2x = MediaDecode.wavEnergyHash(wav(8000, 1, 16, pcm16(base.map(_ * 2)))).get
    assert(b1.toSeq == b2x.toSeq)
    // stereo: both channels contribute to the frame window
    val stereo = (0 until 130).flatMap(k => Seq(s(k), -s(k)))
    assert(MediaDecode.wavEnergyHash(wav(8000, 2, 16, pcm16(stereo))).isDefined)
    // too few frames / junk → None
    assert(MediaDecode.wavEnergyHash(wav(8000, 1, 16, pcm16(Seq.fill(64)(5)))).isEmpty)
    assert(MediaDecode.wavEnergyHash("RIFFjunk".getBytes).isEmpty)
    assert(MediaDecode.wavEnergyHash(Array[Byte](1, 2)).isEmpty)
    // the double-accumulation path matches wavStats' hostile-input
    // discipline: per-sample-finite values whose window Σv² overflows
    // to Infinity reject the payload (no garbage signature)
    def f64(v: Double) = {
      val bits = java.lang.Double.doubleToLongBits(v)
      le32(bits.toInt) ++ le32((bits >>> 32).toInt)
    }
    val huge = (0 until 8).flatMap(_ => f64(1e200)).toArray
    assert(MediaDecode.wavEnergyHash(
      wav(8000, 1, 64, huge, audioFormat = 3), nBits = 2).isEmpty)
    // a finite float payload still hashes through the same path
    val okF = (0 until 8).flatMap(k => f64(k.toDouble)).toArray
    assert(MediaDecode.wavEnergyHash(
      wav(8000, 1, 64, okF, audioFormat = 3), nBits = 2).isDefined)
  }

  test("imageStats: hand-built multi-row GIF decodes palette-exact through real LZW") {
    val w = 19; val h = 17 // 323 px: forces a mid-stream clear code
    def pix(x: Int, y: Int) = (x * 13 + y * 41) % 256
    var sum = 0L; var mn = 255; var mx = 0
    for (y <- 0 until h; x <- 0 until w; c <- 1 to 3) {
      val v = (c * pix(x, y)) % 256
      sum += v; mn = math.min(mn, v); mx = math.max(mx, v)
    }
    val st = MediaDecode.imageStats(handGif(w, h, pix))
      .getOrElse(fail("hand gif did not decode"))
    assert(st.kind == "gif" && st.width == w && st.height == h && st.channels == 3)
    assert(st.meanPx == sum.toDouble / (3 * w * h))
    assert(st.minPx == mn && st.maxPx == mx)
  }

  test("imageStats: BMP round-trip is stat-exact (24-bit lossless)") {
    val img = rgbImage(5, 3)
    var sum = 0L; var mn = 255; var mx = 0
    for (y <- 0 until 3; x <- 0 until 5; s <- Seq(16, 8, 0)) {
      val v = (img.getRGB(x, y) >> s) & 0xff
      sum += v; mn = math.min(mn, v); mx = math.max(mx, v)
    }
    val st = MediaDecode.imageStats(encode(img, "bmp"))
      .getOrElse(fail("bmp did not decode"))
    assert(st.kind == "bmp")
    assert(st.width == 5 && st.height == 3)
    assert(st.meanPx == sum.toDouble / 45)
    assert(st.minPx == mn && st.maxPx == mx)
  }

  test("imageStats: JPEG decodes; uniform image stays near its color (lossy codec)") {
    val img = new java.awt.image.BufferedImage(
      8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8) img.setRGB(x, y, 0x808080)
    val st = MediaDecode.imageStats(encode(img, "jpg"))
      .getOrElse(fail("jpeg did not decode"))
    assert(st.kind == "jpeg" && st.width == 8 && st.height == 8)
    assert(math.abs(st.meanPx - 128.0) < 2.0) // DCT round-trip error only
    assert(st.minPx >= 120 && st.maxPx <= 136)
  }

  test("imageStats: palette PNG falls through the hand-rolled decoder to ImageIO") {
    // an indexed PNG (the JDK writes TYPE_BYTE_INDEXED as palette)
    val img = new java.awt.image.BufferedImage(
      4, 2, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED)
    for (y <- 0 until 2; x <- 0 until 4) img.setRGB(x, y, 0xFF0000)
    val bytes = encode(img, "png")
    assert(MediaDecode.pngStats(bytes).isEmpty) // hand path declines palette
    val st = MediaDecode.imageStats(bytes).getOrElse(fail("palette png did not decode"))
    assert(st.kind == "png" && st.width == 4 && st.height == 2)
    // indexed red: nearest palette entry may not be exactly FF0000
    assert(st.maxPx >= 200 && st.minPx <= 60)
  }

  test("imageStats hostile: noise, truncation, non-image magic, huge declared dims → None") {
    assert(MediaDecode.imageStats(null).isEmpty)
    assert(MediaDecode.imageStats(Array.emptyByteArray).isEmpty)
    assert(MediaDecode.imageStats("not an image at all".getBytes).isEmpty)
    // decompression bomb: a FEW-KB payload whose header declares a
    // ~1.6 GB image — the header-dims bound must reject it BEFORE the
    // pixel buffer is allocated (an OOM here is a test failure)
    val bombPng = {
      val zipped = {
        val d = new java.util.zip.Deflater()
        d.setInput(new Array[Byte](64 * 1024)); d.finish()
        val out = new Array[Byte](4096)
        val n = d.deflate(out); d.end(); out.take(n)
      }
      val crc = new Array[Byte](4)
      def be32b(v: Int) = b(v >>> 24, (v >>> 16) & 0xff, (v >>> 8) & 0xff, v & 0xff)
      b(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
        be32b(13) ++ "IHDR".getBytes ++
        be32b(24000) ++ be32b(24000) ++ b(8, 6, 0, 0, 0) ++ crc ++
        be32b(zipped.length) ++ "IDAT".getBytes ++ zipped ++ crc ++
        be32b(0) ++ "IEND".getBytes ++ crc
    }
    assert(bombPng.length < 8192)
    assert(MediaDecode.imageStats(bombPng).isEmpty) // 576M px > 16M bound
    val bombGif = handGif(5, 1, (x, _) => x)
    // image-descriptor dims live after the 13-byte header, 768-byte
    // palette, and the descriptor's 5 lead bytes (0x2C + left + top)
    val idOff = 13 + 768 + 5
    bombGif(idOff) = 0xff.toByte; bombGif(idOff + 1) = 0x7f.toByte     // w=32767
    bombGif(idOff + 2) = 0xff.toByte; bombGif(idOff + 3) = 0x7f.toByte // h=32767
    assert(MediaDecode.imageStats(bombGif).isEmpty)
    val gif = encode(rgbImage(5, 3), "gif")
    assert(MediaDecode.imageStats(gif.take(gif.length / 2)).isEmpty)
    val bmp = encode(rgbImage(5, 3), "bmp")
    assert(MediaDecode.imageStats(bmp.take(20)).isEmpty)
    // wav payloads belong to wavStats, not the image path
    assert(MediaDecode.imageStats(wav(8000, 1, 16, le16(5))).isEmpty)
    val rnd = new scala.util.Random(7)
    (0 until 500).foreach { i =>
      val base = (if (i % 2 == 0) gif else bmp).clone()
      (0 until 1 + rnd.nextInt(4)).foreach { _ =>
        base(rnd.nextInt(base.length)) = rnd.nextInt(256).toByte
      }
      MediaDecode.imageStats(base.take(1 + rnd.nextInt(base.length))) // must not throw
    }
  }
}
