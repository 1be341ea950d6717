package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Golden-bytes parity for the header-level media parser: handcrafted
  * minimal-but-valid headers per format (the same bytes any spec-
  * compliant encoder writes), plus truncation/malformation/fuzz — the
  * expression must return exact dimensions on valid headers and NULL
  * (never a throw) on everything else. */
class MediaDimsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-media-dims")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  private def png(w: Int, h: Int): Array[Byte] =
    b(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a,  // signature
      0, 0, 0, 13) ++ "IHDR".getBytes ++              // IHDR length + type
      b(w >>> 24, (w >>> 16) & 0xff, (w >>> 8) & 0xff, w & 0xff,
        h >>> 24, (h >>> 16) & 0xff, (h >>> 8) & 0xff, h & 0xff,
        8, 2, 0, 0, 0)                                 // bit depth etc.

  private def gif(w: Int, h: Int): Array[Byte] =
    "GIF89a".getBytes ++ b(w & 0xff, w >>> 8, h & 0xff, h >>> 8, 0, 0, 0)

  private def bmp(w: Int, h: Int): Array[Byte] =
    "BM".getBytes ++ b(0, 0, 0, 0, 0, 0, 0, 0, 54, 0, 0, 0,  // size/resv/offset
      40, 0, 0, 0,                                            // BITMAPINFOHEADER
      w & 0xff, (w >>> 8) & 0xff, (w >>> 16) & 0xff, (w >>> 24) & 0xff,
      h & 0xff, (h >>> 8) & 0xff, (h >>> 16) & 0xff, (h >>> 24) & 0xff,
      1, 0, 24, 0)

  private def jpeg(w: Int, h: Int): Array[Byte] =
    b(0xff, 0xd8,                    // SOI
      0xff, 0xe0, 0, 16) ++ "JFIF".getBytes ++ b(0, 1, 1, 0, 0, 1, 0, 1, 0, 0) ++ // APP0
      b(0xff, 0xc4, 0, 4, 0, 0,      // DHT (must be skipped, not read as SOF)
        0xff, 0xc0, 0, 17, 8,        // SOF0, precision
        h >>> 8, h & 0xff, w >>> 8, w & 0xff, 3, 0, 0x11, 0, 1, 0x11, 1, 2, 0x11, 1)

  private def wav(rate: Int, channels: Int): Array[Byte] =
    "RIFF".getBytes ++ b(36, 0, 0, 0) ++ "WAVE".getBytes ++
      "JUNK".getBytes ++ b(4, 0, 0, 0, 0, 0, 0, 0) ++  // a chunk to walk over
      "fmt ".getBytes ++ b(16, 0, 0, 0, 1, 0, channels, 0,
        rate & 0xff, (rate >>> 8) & 0xff, (rate >>> 16) & 0xff, rate >>> 24,
        0, 0, 0, 0, 0, 0, 0, 0)

  private def parse(payloads: Seq[Array[Byte]]) =
    payloads.toDF("p").select(exprs.media_dims($"p").as("d"))
      .select($"d.width", $"d.height", $"d.sample_rate", $"d.channels").collect()

  test("valid headers parse to exact dimensions per format") {
    val rows = parse(Seq(
      png(1920, 1080), gif(320, 200), bmp(640, 480), jpeg(4032, 3024),
      wav(44100, 2)))
    def d(i: Int) = (0 to 3).map(j => if (rows(i).isNullAt(j)) None else Some(rows(i).getInt(j)))
    assert(d(0) == Seq(Some(1920), Some(1080), None, None))
    assert(d(1) == Seq(Some(320), Some(200), None, None))
    assert(d(2) == Seq(Some(640), Some(480), None, None))
    assert(d(3) == Seq(Some(4032), Some(3024), None, None))
    assert(d(4) == Seq(None, None, Some(44100), Some(2)))
  }

  test("top-down BMP (negative height) reports the magnitude") {
    val neg = bmp(16, -32 & 0xffffffff) // height -32 as unsigned LE32
    val r = parse(Seq(neg)).head
    assert(r.getInt(0) == 16 && r.getInt(1) == 32)
  }

  test("truncated, malformed, and fuzzed payloads yield NULL, never throw") {
    val cases: Seq[Array[Byte]] = Seq(
      Array.empty[Byte],
      png(8, 8).take(20),                  // truncated IHDR
      jpeg(10, 10).take(9),                // truncated before SOF
      b(0xff, 0xd8, 0xff, 0xda, 0, 2),     // SOS before any SOF
      b(0xff, 0xd8, 0x00, 0x01, 2, 3),     // lost marker sync
      wav(44100, 2).take(14),              // truncated chunk header
      "RIFFxxxxWAVE".getBytes,             // no fmt chunk
      gif(5, 5).take(7),                   // truncated screen descriptor...
      "GIF85a::::::".getBytes,             // bad version
      Array.fill(64)(0x5a.toByte),         // junk
      png(0, 10),                          // zero dimension = malformed
      null)
    val rows = cases.toDF("p").select(exprs.media_dims($"p").as("d")).collect()
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.isNullAt(0), s"case $i should parse to NULL")
    }
  }

  test("crafted chunk/segment sizes near Int.MaxValue yield NULL, never an index crash") {
    // WAV chunk whose declared size would wrap the Int offset negative
    val hugeWav = "RIFF".getBytes ++ b(36, 0, 0, 0) ++ "WAVE".getBytes ++
      "JUNK".getBytes ++ b(0xee, 0xff, 0xff, 0x7f)  // size = 0x7FFFFFEE
    // JPEG APP1 whose declared length runs past the payload end (the
    // common truncated-prefix-fetch shape)
    val truncJpeg = b(0xff, 0xd8, 0xff, 0xe1, 0xff, 0xfe) ++ Array.fill(40)(0.toByte)
    val rows = Seq(hugeWav, truncJpeg).toDF("p")
      .select(exprs.media_dims($"p").as("d")).collect()
    rows.foreach(r => assert(r.isNullAt(0)))
  }

  test("jpeg prefix-fetched mid-SOF still parses once the dims bytes are present") {
    // a crawl that fetches only the first N bytes can cut INSIDE the
    // SOF segment; dims live at SOF+5..SOF+8 and that is all we need
    val full = jpeg(800, 600)
    val cut = full.take(full.length - 6) // drop the SOF component tail
    val r = parse(Seq(cut)).head
    assert(r.getInt(0) == 800 && r.getInt(1) == 600, s"got $r")
  }

  test("gif truncated to 10 bytes still has its descriptor — parses") {
    // 10 bytes covers w/h: the parser needs only the leading fields
    val r = parse(Seq(gif(7, 9).take(10))).head
    assert(r.getInt(0) == 7 && r.getInt(1) == 9)
  }

  test("randomized dimensions parse exactly across the format boundary values") {
    val rnd = new scala.util.Random(7)
    (0 until 50).foreach { _ =>
      // JPEG/GIF fields are u16 (boundary 65535); PNG/BMP are 32-bit
      val w16 = 1 + rnd.nextInt(65535); val h16 = 1 + rnd.nextInt(65535)
      val w32 = 1 + rnd.nextInt(1 << 24); val h32 = 1 + rnd.nextInt(1 << 24)
      val rows = parse(Seq(png(w32, h32), gif(w16, h16), bmp(w32, h32), jpeg(w16, h16)))
      assert(rows(0).getInt(0) == w32 && rows(0).getInt(1) == h32, s"png $w32 x $h32")
      assert(rows(1).getInt(0) == w16 && rows(1).getInt(1) == h16, s"gif $w16 x $h16")
      assert(rows(2).getInt(0) == w32 && rows(2).getInt(1) == h32, s"bmp $w32 x $h32")
      assert(rows(3).getInt(0) == w16 && rows(3).getInt(1) == h16, s"jpeg $w16 x $h16")
    }
    // u16 boundary explicitly
    val r = parse(Seq(jpeg(65535, 65535), gif(65535, 65535)))
    assert(r(0).getInt(0) == 65535 && r(1).getInt(1) == 65535)
  }

  test("progressive JPEG (SOF2 frame header) parses after skipped APP0/DHT segments") {
    val prog = b(0xff, 0xd8,                                 // SOI
      0xff, 0xe0, 0, 4, 0, 0,                                // APP0 len 4
      0xff, 0xc4, 0, 4, 0, 0,                                // DHT skipped
      0xff, 0xc2, 0, 11, 8, 1, 0x00, 2, 0x80, 1, 0x11, 0, 1) // SOF2: h=256 w=640
    val r = parse(Seq(prog)).head
    assert(r.getInt(0) == 640 && r.getInt(1) == 256, s"got $r")
  }

  test("flac STREAMINFO: sample rate (20 bits) and channels (3 bits)") {
    // 44100 Hz stereo: rate<<12 layout — bytes 18..20 carry
    // rrrrrrrr rrrrrrrr rrrrcccb (c = channels-1, b = bps-1 high bit)
    def flac(rate: Int, channels: Int): Array[Byte] =
      "fLaC".getBytes ++ b(0x80, 0, 0, 34) ++ // last-block STREAMINFO, len 34
        b(0x10, 0, 0x10, 0, 0, 0, 0, 0, 0, 0) ++ // block/frame sizes
        b(rate >>> 12, (rate >>> 4) & 0xff,
          ((rate & 0xf) << 4) | ((channels - 1) << 1)) ++
        new Array[Byte](21) // bps low bits, total samples, md5
    val r = parse(Seq(flac(44100, 2))).head
    assert(r.isNullAt(0) && r.isNullAt(1))
    assert(r.getInt(2) == 44100 && r.getInt(3) == 2)
    val mono = parse(Seq(flac(8000, 1))).head
    assert(mono.getInt(2) == 8000 && mono.getInt(3) == 1)
    // hostile: wrong first block type, wrong length, zero rate, truncated
    val wrongType = flac(44100, 2); wrongType(4) = 0x84.toByte
    assert(MediaDimsUtil.parse(wrongType) == null)
    val wrongLen = flac(44100, 2); wrongLen(7) = 20
    assert(MediaDimsUtil.parse(wrongLen) == null)
    assert(MediaDimsUtil.parse(flac(0, 2)) == null)
    assert(MediaDimsUtil.parse(flac(44100, 2).take(15)) == null)
  }

  test("webp VP8 / VP8L / VP8X dims; RIFF container distrusted") {
    def le32b(v: Int) = b(v & 0xff, (v >>> 8) & 0xff, (v >>> 16) & 0xff, (v >>> 24) & 0xff)
    def webp(chunk: String, payload: Array[Byte]): Array[Byte] =
      "RIFF".getBytes ++ le32b(12 + payload.length) ++ "WEBP".getBytes ++
        chunk.getBytes ++ le32b(payload.length) ++ payload
    // VP8 lossy: 3-byte frame tag, sync 9d 01 2a, 14-bit LE dims
    val vp8 = webp("VP8 ", b(0x30, 0x01, 0x00, 0x9d, 0x01, 0x2a,
      0x40, 0x01, /*w=320*/ 0xf0, 0x00 /*h=240*/))
    val r8 = parse(Seq(vp8)).head
    assert(r8.getInt(0) == 320 && r8.getInt(1) == 240)
    // VP8L lossless: 0x2f then (w-1) | (h-1)<<14 packed LE32
    val packed = (1919 | (1079 << 14))
    val vp8l = webp("VP8L", b(0x2f) ++ le32b(packed))
    val rl = parse(Seq(vp8l)).head
    assert(rl.getInt(0) == 1920 && rl.getInt(1) == 1080)
    // VP8X extended: flags+reserved then 24-bit LE canvas dims minus 1
    val vp8x = webp("VP8X", b(0x02, 0, 0, 0,
      0xff, 0x0f, 0x00, /*w=4096*/ 0xff, 0x07, 0x00 /*h=2048*/))
    val rx = parse(Seq(vp8x)).head
    assert(rx.getInt(0) == 4096 && rx.getInt(1) == 2048)
    // hostile: bad sync, lying chunk size, unknown first chunk, truncation
    val badSync = vp8.clone(); badSync(23) = 0x00
    assert(MediaDimsUtil.parse(badSync) == null)
    val lying = vp8.clone(); lying(16) = 0x7f
    assert(MediaDimsUtil.parse(lying) == null)
    assert(MediaDimsUtil.parse(webp("ALPH", b(1, 2, 3, 4, 5, 6, 7, 8, 9, 10))) == null)
    assert(MediaDimsUtil.parse(vp8l.take(22)) == null)
  }

  test("tiff IFD dims: both endians, SHORT and LONG types, hostile tables") {
    def tiff(le: Boolean, w: Int, h: Int, shortType: Boolean): Array[Byte] = {
      def p16(v: Int) = if (le) b(v & 0xff, v >>> 8) else b(v >>> 8, v & 0xff)
      def p32(v: Int) =
        if (le) b(v & 0xff, (v >>> 8) & 0xff, (v >>> 16) & 0xff, v >>> 24)
        else b(v >>> 24, (v >>> 16) & 0xff, (v >>> 8) & 0xff, v & 0xff)
      def entry(tag: Int, v: Int) =
        if (shortType) p16(tag) ++ p16(3) ++ p32(1) ++ p16(v) ++ p16(0)
        else p16(tag) ++ p16(4) ++ p32(1) ++ p32(v)
      (if (le) "II".getBytes ++ b(0x2a, 0) else "MM".getBytes ++ b(0, 0x2a)) ++
        p32(8) ++ // IFD at offset 8
        p16(2) ++ entry(256, w) ++ entry(257, h) ++ p32(0)
    }
    for (le <- Seq(true, false); st <- Seq(true, false)) {
      val r = parse(Seq(tiff(le, 1234, 987, st))).head
      assert(r.getInt(0) == 1234 && r.getInt(1) == 987,
        s"le=$le short=$st got $r")
    }
    // hostile: lying IFD offset, zero/huge entry count, truncated
    // entries, missing height tag, unsupported RATIONAL type
    val good = tiff(le = true, 10, 20, shortType = true)
    val lyingIfd = good.clone(); lyingIfd(4) = 0x7f
    assert(MediaDimsUtil.parse(lyingIfd) == null)
    val zeroCount = good.clone(); zeroCount(8) = 0
    assert(MediaDimsUtil.parse(zeroCount) == null)
    assert(MediaDimsUtil.parse(good.dropRight(10)) == null)
    val noHeight = good.clone(); noHeight(10 + 12) = 99 // retag 257 -> junk
    assert(MediaDimsUtil.parse(noHeight) == null)
    val rational = good.clone(); rational(12) = 5 // type RATIONAL
    assert(MediaDimsUtil.parse(rational) == null)
  }

  test("random-bytes fuzz: 2000 arrays incl. magic-prefixed tails never throw") {
    val rnd = new scala.util.Random(42)
    val magics = Seq(
      b(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a), "GIF89a".getBytes,
      "BM".getBytes, b(0xff, 0xd8), "RIFF".getBytes, "fLaC".getBytes,
      // the WebP branch's dense index arithmetic needs the form tag
      // present (a bare RIFF magic forms WEBP with probability 2^-32)
      "RIFF".getBytes ++ b(0, 0, 0, 0) ++ "WEBP".getBytes,
      "RIFF".getBytes ++ b(0, 0, 0, 0) ++ "WEBPVP8 ".getBytes,
      "RIFF".getBytes ++ b(0, 0, 0, 0) ++ "WEBPVP8L".getBytes,
      "II".getBytes ++ b(0x2a, 0), "MM".getBytes ++ b(0, 0x2a),
      Array.empty[Byte])
    val payloads = (0 until 2000).map { i =>
      val tail = Array.fill(rnd.nextInt(64))(rnd.nextInt(256).toByte)
      magics(i % magics.size) ++ tail
    }
    // direct driver-side loop: exercises the interpreted eval path too
    payloads.foreach(p => MediaDimsUtil.parse(p))
    val n = payloads.toDF("p").select(exprs.media_dims($"p").as("d")).count()
    assert(n == 2000)
  }

  test("media_dims is SQL-registered (registerAll + GraftExtensions share one registry)") {
    GraftFunctions.registerAll(spark)
    val r = Seq(Tuple1(png(12, 34))).toDF("p")
      .createOrReplaceTempView("media_dims_probe")
    val row = spark.sql(
      "SELECT media_dims(p).width AS w, media_dims(p).height AS h FROM media_dims_probe")
      .head()
    assert(row.getInt(0) == 12 && row.getInt(1) == 34)
  }
}
