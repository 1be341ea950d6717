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
