package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Golden-bytes parity for the EBML walker: handcrafted Matroska/WebM
  * trees (vint ids/sizes, nested master elements, uint/float leaves,
  * cluster skipping, unknown-size segments), plus hostile inputs —
  * exact metadata on valid trees, NULL (never a throw) without the
  * EBML magic, clean partial results at truncation. */
class MkvMetaSpec extends AnyFunSuite {

  private def hx(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  /** Master/leaf element with a 1-byte size encoding (content < 127 B). */
  private def el(idHex: String, content: Array[Byte]): Array[Byte] = {
    require(content.length < 127)
    hx(idHex) ++ Array((0x80 | content.length).toByte) ++ content
  }

  /** Element with a 2-byte size encoding — also exercises multi-byte
    * vint size decoding. */
  private def elBig(idHex: String, content: Array[Byte]): Array[Byte] = {
    require(content.length < 16000)
    hx(idHex) ++ Array((0x40 | (content.length >> 8)).toByte,
      (content.length & 0xff).toByte) ++ content
  }

  private def be(v: Long, n: Int): Array[Byte] =
    (0 until n).map(i => ((v >> (8 * (n - 1 - i))) & 0xff).toByte).toArray

  private def f32(v: Float): Array[Byte] =
    be(java.lang.Float.floatToIntBits(v).toLong & 0xffffffffL, 4)

  private def f64(v: Double): Array[Byte] =
    be(java.lang.Double.doubleToLongBits(v), 8)

  private def header(docType: String): Array[Byte] =
    el("1a45dfa3", el("4282", docType.getBytes))

  private def info(tsNs: Long, dur: Array[Byte]): Array[Byte] =
    el("1549a966", el("2ad7b1", be(tsNs, 3)) ++ el("4489", dur))

  private def videoTrack(codec: String, w: Int, h: Int): Array[Byte] =
    el("ae", el("83", Array[Byte](1)) ++ el("86", codec.getBytes) ++
      el("e0", el("b0", be(w, 2)) ++ el("ba", be(h, 2))))

  private def audioTrack(codec: String, rate: Float, ch: Int): Array[Byte] =
    el("ae", el("83", Array[Byte](2)) ++ el("86", codec.getBytes) ++
      el("e1", el("b5", f32(rate)) ++ el("9f", Array(ch.toByte))))

  test("matroska: doctype, timescale, duration, tracks, dims, audio") {
    val seg = el("18538067",
      info(1000000L, f32(90000f)) ++
        el("1654ae6b", videoTrack("V_VP9", 1920, 1080) ++
          audioTrack("A_OPUS", 48000f, 2)) ++
        el("1f43b675", hx("deadbeef"))) // cluster: must be skipped
    val r = MkvMetaUtil.parse(header("matroska") ++ seg)
    assert(r != null)
    assert(r.getUTF8String(0).toString == "matroska")
    assert(r.getLong(1) == 1000000L)
    assert(r.getDouble(2) == 90.0) // 90000 * 1e6 / 1e9
    assert(r.getInt(3) == 2)
    assert(r.getUTF8String(4).toString == "V_VP9")
    assert(r.getInt(5) == 1920 && r.getInt(6) == 1080)
    assert(r.getUTF8String(7).toString == "A_OPUS")
    assert(r.getDouble(8) == 48000.0 && r.getInt(9) == 2)
  }

  test("webm doctype, float64 duration, default timescale when absent") {
    val seg = el("18538067",
      el("1549a966", el("4489", f64(2500.5))) ++ // no TimestampScale
        el("1654ae6b", videoTrack("V_VP8", 640, 360)))
    val r = MkvMetaUtil.parse(header("webm") ++ seg)
    assert(r != null)
    assert(r.getUTF8String(0).toString == "webm")
    assert(r.getLong(1) == 1000000L) // Matroska default
    assert(r.getDouble(2) == 2500.5 * 1000000L / 1e9)
    assert(r.getInt(3) == 1)
    assert(r.isNullAt(7) && r.isNullAt(8) && r.isNullAt(9)) // no audio
  }

  test("unknown-size segment walks to EOF") {
    // size 0x01ffffffffffffff = 7-byte vint with all value bits set
    val children = info(2000000L, f32(1000f)) ++
      el("1654ae6b", audioTrack("A_FLAC", 44100f, 1))
    val seg = hx("18538067") ++ hx("01ffffffffffffff") ++ children
    val r = MkvMetaUtil.parse(header("matroska") ++ seg)
    assert(r != null)
    assert(r.getLong(1) == 2000000L)
    assert(r.getDouble(2) == 1000.0 * 2000000L / 1e9)
    assert(r.getUTF8String(7).toString == "A_FLAC")
    assert(r.getDouble(8) == 44100.0 && r.getInt(9) == 1)
  }

  test("first track of each kind wins; later tracks still counted") {
    val seg = el("18538067",
      el("1654ae6b",
        videoTrack("V_AV1", 320, 240) ++ videoTrack("V_VP8", 64, 48) ++
          audioTrack("A_VORBIS", 8000f, 1) ++ audioTrack("A_OPUS", 48000f, 2)))
    val r = MkvMetaUtil.parse(header("matroska") ++ seg)
    assert(r != null)
    assert(r.getInt(3) == 4)
    assert(r.getUTF8String(4).toString == "V_AV1" && r.getInt(5) == 320)
    assert(r.getUTF8String(7).toString == "A_VORBIS" && r.getInt(9) == 1)
  }

  test("truncated tree keeps what was walked; no duration -> null") {
    val seg = el("18538067",
      info(1000000L, f32(5000f)) ++
        el("1654ae6b", videoTrack("V_VP9", 1280, 720)))
    val full = header("matroska") ++ seg
    val r = MkvMetaUtil.parse(full.dropRight(10)) // cuts into the track
    assert(r != null)
    assert(r.getUTF8String(0).toString == "matroska")
    assert(r.getDouble(2) == 5.0) // Info was intact
    val noDur = MkvMetaUtil.parse(header("webm") ++
      el("18538067", el("1549a966", el("2ad7b1", be(1000000L, 3)))))
    assert(noDur != null && noDur.isNullAt(2))
  }

  test("randomized roundtrip: 300 generated valid trees parse back exactly") {
    val rnd = new scala.util.Random(77L)
    val codecsV = Seq("V_VP8", "V_VP9", "V_AV1", "V_MPEG4/ISO/AVC")
    val codecsA = Seq("A_OPUS", "A_VORBIS", "A_FLAC", "A_AAC")
    (0 until 300).foreach { i =>
      val webm = rnd.nextBoolean()
      val ts = 100000L + rnd.nextInt(5000000)
      // float32-exact integer durations
      val dur = (1 + rnd.nextInt(1 << 22)).toFloat
      val vC = codecsV(rnd.nextInt(4))
      val aC = codecsA(rnd.nextInt(4))
      val w0 = 16 + rnd.nextInt(4000); val h0 = 16 + rnd.nextInt(3000)
      val rate = Seq(8000f, 16000f, 22050f, 44100f, 48000f, 96000f)(rnd.nextInt(6))
      val ch = 1 + rnd.nextInt(8)
      val audioFirst = rnd.nextBoolean()
      val tracks =
        if (audioFirst) audioTrack(aC, rate, ch) ++ videoTrack(vC, w0, h0)
        else videoTrack(vC, w0, h0) ++ audioTrack(aC, rate, ch)
      val clusters = (0 until rnd.nextInt(3)).map { _ =>
        val junk = new Array[Byte](rnd.nextInt(100)); rnd.nextBytes(junk)
        el("1f43b675", junk)
      }
      val seg = elBig("18538067",
        info(ts, f32(dur)) ++ el("1654ae6b", tracks) ++
          clusters.foldLeft(Array.emptyByteArray)(_ ++ _))
      val r = MkvMetaUtil.parse(header(if (webm) "webm" else "matroska") ++ seg)
      assert(r != null, s"case $i: parse returned null")
      assert(r.getUTF8String(0).toString == (if (webm) "webm" else "matroska"))
      assert(r.getLong(1) == ts, s"case $i timescale")
      assert(r.getDouble(2) == dur.toDouble * ts / 1e9, s"case $i duration")
      assert(r.getInt(3) == 2, s"case $i tracks")
      assert(r.getUTF8String(4).toString == vC, s"case $i vcodec")
      assert(r.getInt(5) == w0 && r.getInt(6) == h0, s"case $i dims")
      assert(r.getUTF8String(7).toString == aC, s"case $i acodec")
      assert(r.getDouble(8) == rate.toDouble && r.getInt(9) == ch, s"case $i audio")
    }
  }

  test("hostile inputs: null / short / non-ebml / bit-flips never throw") {
    assert(MkvMetaUtil.parse(null) == null)
    assert(MkvMetaUtil.parse(Array.emptyByteArray) == null)
    assert(MkvMetaUtil.parse("RIFFxxxxWAVE".getBytes) == null)
    assert(MkvMetaUtil.parse(hx("1a45dfa2") ++ new Array[Byte](16)) == null)
    val seed = header("matroska") ++ el("18538067",
      info(1000000L, f32(90000f)) ++
        el("1654ae6b", videoTrack("V_VP9", 1920, 1080) ++
          audioTrack("A_OPUS", 48000f, 2)) ++
        el("1f43b675", hx("deadbeef")))
    val rnd = new scala.util.Random(20260814L)
    (0 until 500).foreach { _ =>
      val mutated = seed.clone()
      (0 until 1 + rnd.nextInt(4)).foreach(_ =>
        mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte)
      MkvMetaUtil.parse(mutated.take(1 + rnd.nextInt(mutated.length))) // must not throw
    }
  }
}
