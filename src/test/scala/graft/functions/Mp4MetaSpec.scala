package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Golden-bytes parity for the MP4/ISO-BMFF box walk: handcrafted
  * minimal-but-valid containers (the same box layout any compliant
  * muxer writes) across mvhd/tkhd versions 0 and 1 and the 64-bit
  * largesize form, plus truncation/size-lies/fuzz — exact metadata on
  * valid containers, NULL (never a throw) on everything else. */
class Mp4MetaSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-mp4-meta")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
  private def be32(v: Long): Array[Byte] =
    b((v >>> 24).toInt & 0xff, (v >>> 16).toInt & 0xff, (v >>> 8).toInt & 0xff, v.toInt & 0xff)
  private def be64(v: Long): Array[Byte] = be32(v >>> 32) ++ be32(v & 0xFFFFFFFFL)

  private def box(tpe: String, payload: Array[Byte]): Array[Byte] =
    be32(payload.length + 8L) ++ tpe.getBytes("US-ASCII") ++ payload

  private def ftyp(brand: String = "isom"): Array[Byte] =
    box("ftyp", brand.getBytes("US-ASCII") ++ be32(0x200) ++ "isom".getBytes)

  private def mvhd0(timescale: Long, duration: Long): Array[Byte] =
    box("mvhd", b(0, 0, 0, 0) ++ be32(0) ++ be32(0) ++
      be32(timescale) ++ be32(duration) ++ new Array[Byte](80))

  private def mvhd1(timescale: Long, duration: Long): Array[Byte] =
    box("mvhd", b(1, 0, 0, 0) ++ be64(0) ++ be64(0) ++
      be32(timescale) ++ be64(duration) ++ new Array[Byte](80))

  private def tkhd0(w: Int, h: Int): Array[Byte] =
    box("tkhd", b(0, 0, 0, 0) ++ new Array[Byte](72) ++
      be32(w.toLong << 16) ++ be32(h.toLong << 16))

  private def tkhd1(w: Int, h: Int): Array[Byte] =
    box("tkhd", b(1, 0, 0, 0) ++ new Array[Byte](84) ++
      be32(w.toLong << 16) ++ be32(h.toLong << 16))

  private def trak(tkhd: Array[Byte]): Array[Byte] = box("trak", tkhd)

  private def mp4(boxes: Array[Byte]*): Array[Byte] = boxes.reduce(_ ++ _)

  private def parse(bytes: Array[Byte]) = Mp4MetaUtil.parse(bytes)

  test("v0 container: brand, duration, track count, video dims") {
    val m = mp4(ftyp(), box("moov",
      mvhd0(1000, 7500) ++ trak(tkhd0(1920, 1080)) ++ trak(tkhd0(0, 0))))
    val r = parse(m)
    assert(r != null)
    assert(r.getUTF8String(0).toString == "isom")
    assert(r.getDouble(1) == 7.5)
    assert(r.getInt(2) == 1000)
    assert(r.getInt(3) == 2) // video + audio trak
    assert(r.getInt(4) == 1920 && r.getInt(5) == 1080)
  }

  test("v1 mvhd/tkhd (64-bit times) parse identically") {
    val m = mp4(ftyp("mp42"), box("moov",
      mvhd1(90000, 123456789L) ++ trak(tkhd1(640, 360))))
    val r = parse(m)
    assert(r != null)
    assert(r.getUTF8String(0).toString == "mp42")
    assert(r.getDouble(1) == 123456789L.toDouble / 90000)
    assert(r.getInt(3) == 1)
    assert(r.getInt(4) == 640 && r.getInt(5) == 360)
  }

  test("largesize (size==1 + 64-bit) and unknown boxes are walked, audio-only has NULL dims") {
    val inner = mvhd0(600, 1200) ++ trak(tkhd0(0, 0))
    val largeMoov = be32(1) ++ "moov".getBytes ++ be64(inner.length + 16L) ++ inner
    val m = mp4(ftyp(), box("free", new Array[Byte](11)), largeMoov,
      box("mdat", b(1, 2, 3)))
    val r = parse(m)
    assert(r != null)
    assert(r.getDouble(1) == 2.0)
    assert(r.getInt(3) == 1)
    assert(r.isNullAt(4) && r.isNullAt(5)) // no video track
  }

  test("hostile: truncation, size lies, missing mvhd, non-mp4, absurd fields → NULL") {
    val good = mp4(ftyp(), box("moov", mvhd0(1000, 5000) ++ trak(tkhd0(64, 48))))
    assert(parse(good) != null)
    assert(parse(null) == null)
    assert(parse(Array.emptyByteArray) == null)
    assert(parse("not an mp4 at all......".getBytes) == null)
    assert(parse(good.take(20)) == null) // truncated mid-ftyp payload is fine; mid-moov:
    assert(parse(good.dropRight(10)) == null) // moov size now overruns payload
    val lyingSize = good.clone()
    lyingSize(0) = 0x7f // ftyp size lies huge
    assert(parse(lyingSize) == null)
    assert(parse(mp4(ftyp())) == null) // no moov/mvhd
    assert(parse(mp4(ftyp(), box("moov", mvhd0(0, 5000)))) == null) // timescale 0
    assert(parse(mp4(ftyp(), box("moov",
      mvhd0(1000, 5000).updated(8, 9.toByte)))) == null) // mvhd version 9
  }

  test("fuzz: 1500 mutated/truncated/random payloads never throw") {
    val rnd = new scala.util.Random(1234)
    val seeds = Seq(
      mp4(ftyp(), box("moov", mvhd0(1000, 7500) ++ trak(tkhd0(1920, 1080)))),
      mp4(ftyp("mp42"), box("moov", mvhd1(90000, 42L) ++ trak(tkhd1(640, 360)))))
    (0 until 1500).foreach { i =>
      val payload =
        if (i % 3 == 0) { val a = new Array[Byte](rnd.nextInt(96)); rnd.nextBytes(a); a }
        else {
          val base = seeds(rnd.nextInt(seeds.length)).clone()
          (0 until 1 + rnd.nextInt(5)).foreach(_ =>
            base(rnd.nextInt(base.length)) = rnd.nextInt(256).toByte)
          base.take(1 + rnd.nextInt(base.length))
        }
      parse(payload) // must not throw
    }
  }

  // ---------- sample tables (mp4_samples) ----------

  private def fbox(t: String, payload: Array[Byte], ver: Int = 0): Array[Byte] =
    box(t, b(ver, 0, 0, 0) ++ payload)

  private def stsz(sizes: Seq[Long], fixed: Long = 0): Array[Byte] =
    fbox("stsz", be32(fixed) ++ be32(sizes.length.toLong) ++
      (if (fixed == 0) sizes.flatMap(be32(_)).toArray else Array.emptyByteArray))

  private def stsc(runs: Seq[(Long, Long)]): Array[Byte] =
    fbox("stsc", be32(runs.length.toLong) ++
      runs.flatMap { case (fc, spc) => be32(fc) ++ be32(spc) ++ be32(1) }.toArray)

  private def stco(offs: Seq[Long]): Array[Byte] =
    fbox("stco", be32(offs.length.toLong) ++ offs.flatMap(be32(_)).toArray)

  private def co64(offs: Seq[Long]): Array[Byte] =
    fbox("co64", be32(offs.length.toLong) ++ offs.flatMap(be64).toArray)

  private def stss(samples: Seq[Long]): Array[Byte] =
    fbox("stss", be32(samples.length.toLong) ++ samples.flatMap(be32(_)).toArray)

  private def sampledMp4(stbl: Array[Byte]): Array[Byte] =
    mp4(ftyp(), box("moov", mvhd0(1000, 5000) ++
      box("trak", tkhd0(64, 48) ++ box("mdia", box("minf", box("stbl", stbl))))))

  private def rows(bytes: Array[Byte]): Seq[(Int, Long, Int, Boolean)] = {
    val a = Mp4MetaUtil.parseSamples(bytes)
    assert(a != null, "expected a sample layout")
    (0 until a.numElements()).map { i =>
      val r = a.getStruct(i, 4)
      (r.getInt(0), r.getLong(1), r.getInt(2), r.getBoolean(3))
    }
  }

  test("mp4_samples: one chunk, per-sample sizes, stss keyframes") {
    val m = sampledMp4(
      stsz(Seq(10, 20, 30)) ++ stsc(Seq((1L, 3L))) ++ stco(Seq(1000)) ++
        stss(Seq(1, 3)))
    assert(rows(m) == Seq(
      (1, 1000L, 10, true), (2, 1010L, 20, false), (3, 1030L, 30, true)))
  }

  test("mp4_samples: stsc runs across chunks; missing stss = all keyframes") {
    // 5 samples: chunk1 holds 2 (run (1,2)), chunks 2..3 hold 3 and
    // then the remaining 0-padded run (run (2,3))
    val m = sampledMp4(
      stsz(Seq(5, 6, 7, 8, 9)) ++ stsc(Seq((1L, 2L), (2L, 3L))) ++
        stco(Seq(100, 2000)))
    assert(rows(m) == Seq(
      (1, 100L, 5, true), (2, 105L, 6, true),
      (3, 2000L, 7, true), (4, 2007L, 8, true), (5, 2015L, 9, true)))
  }

  test("mp4_samples: fixed sample size and 64-bit chunk offsets") {
    val big = 0x1_0000_0000L + 64 // needs co64
    val m = sampledMp4(
      stsz(Seq(0, 0), fixed = 16) ++ stsc(Seq((1L, 2L))) ++ co64(Seq(big)))
    assert(rows(m) == Seq((1, big, 16, true), (2, big + 16, 16, true)))
  }

  test("mp4_samples hostile: lying counts, missing boxes, short runs → NULL; fuzz never throws") {
    val good = sampledMp4(
      stsz(Seq(10, 20)) ++ stsc(Seq((1L, 2L))) ++ stco(Seq(500)))
    assert(Mp4MetaUtil.parseSamples(good) != null)
    assert(Mp4MetaUtil.parseSamples(null) == null)
    // stsz count lies past its box
    val lying = sampledMp4(
      fbox("stsz", be32(0) ++ be32(1000)) ++ stsc(Seq((1L, 2L))) ++ stco(Seq(500)))
    assert(Mp4MetaUtil.parseSamples(lying) == null)
    // no stco/co64
    assert(Mp4MetaUtil.parseSamples(
      sampledMp4(stsz(Seq(10)) ++ stsc(Seq((1L, 1L))))) == null)
    // stsc runs cover no samples
    assert(Mp4MetaUtil.parseSamples(
      sampledMp4(stsz(Seq(10)) ++ fbox("stsc", be32(0)) ++ stco(Seq(1)))) == null)
    val rnd = new scala.util.Random(77)
    (0 until 800).foreach { i =>
      val base = good.clone()
      (0 until 1 + rnd.nextInt(5)).foreach(_ =>
        base(rnd.nextInt(base.length)) = rnd.nextInt(256).toByte)
      Mp4MetaUtil.parseSamples(base.take(1 + rnd.nextInt(base.length))) // no throw
    }
  }

  test("SQL registration and Column form agree (interpreted == codegen'd plan)") {
    GraftFunctions.registerAll(spark)
    val m = mp4(ftyp(), box("moov", mvhd0(1000, 2500) ++ trak(tkhd0(320, 240))))
    val df = Seq(Tuple1(m)).toDF("payload")
    val viaCol = df.select(exprs.mp4_meta(col("payload")).as("m"))
      .selectExpr("m.major_brand", "m.duration_s", "m.n_tracks", "m.width").head()
    val viaSql = df.createOrReplaceTempView("t_mp4")
    val r2 = spark.sql(
      "SELECT mp4_meta(payload).duration_s, mp4_meta(payload).height FROM t_mp4").head()
    assert(viaCol.getString(0) == "isom")
    assert(viaCol.getDouble(1) == 2.5 && r2.getDouble(0) == 2.5)
    assert(viaCol.getInt(2) == 1 && viaCol.getInt(3) == 320)
    assert(r2.getInt(1) == 240)
  }

  test("mp4StructureHash: coded-size envelope bits; re-mux invariance; None arms") {
    // 130 samples, one chunk — windows are exactly two samples each
    def sz(k: Int): Long = (k * k * 7 + 3) % 180 + 1
    val sizes = (1 to 130).map(sz)
    val m = sampledMp4(stsz(sizes) ++ stsc(Seq((1L, 130L))) ++ stco(Seq(4096)))
    val bits = graft.ops.MediaDecode.mp4StructureHash(m).get
    assert(bits.length == 64)
    def tot(w: Int) = sz(2 * w + 1) + sz(2 * w + 2)
    val want = (0 until 64).map(w => if (tot(w) > tot(w + 1)) 1 else 0)
    assert(bits.toSeq == want)
    assert(bits.contains(0) && bits.contains(1))
    // RE-MUX invariance: different chunking and offsets, same sizes ->
    // identical fingerprint (coded sizes survive a remux exactly)
    val remuxed = sampledMp4(stsz(sizes) ++
      stsc(Seq((1L, 65L), (2L, 65L))) ++ stco(Seq(900, 777777)))
    assert(graft.ops.MediaDecode.mp4StructureHash(remuxed).get.toSeq == bits.toSeq)
    // fewer samples than windows / junk -> None
    val small = sampledMp4(stsz(Seq.fill(64)(10L)) ++
      stsc(Seq((1L, 64L))) ++ stco(Seq(100)))
    assert(graft.ops.MediaDecode.mp4StructureHash(small).isEmpty)
    assert(graft.ops.MediaDecode.mp4StructureHash("not an mp4".getBytes).isEmpty)
  }
}
