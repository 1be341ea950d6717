package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Golden-bytes parity for the MP3 frame walker: handcrafted frames
  * across versions/layers (the same headers any encoder emits),
  * ID3v2 skipping, VBR detection, clean stops at garbage/boundary,
  * plus truncation/fuzz — exact metadata on valid streams, NULL
  * (never a throw) on everything else. */
class Mp3MetaSpec extends AnyFunSuite {

  private def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  /** One MPEG frame: header + zero body of the exact computed length. */
  private def frame(
      verBits: Int, layerBits: Int, brIdx: Int, srIdx: Int,
      padding: Int = 0, chBits: Int = 0): Array[Byte] = {
    val b1 = 0xe0 | (verBits << 3) | (layerBits << 1) | 1
    val b2 = (brIdx << 4) | (srIdx << 2) | (padding << 1)
    val b3 = chBits << 6
    val hdr = Array(0xff.toByte, b1.toByte, b2.toByte, b3.toByte)
    // recompute the expected length the same way a decoder does
    val v1 = verBits == 3
    val layer = 4 - layerBits
    val kbpsV1 = Seq(
      Seq(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
      Seq(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
      Seq(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320))
    val kbpsV2 = Seq(
      Seq(0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
      Seq(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
      Seq(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160))
    val rates = Map(3 -> Seq(44100, 48000, 32000), 2 -> Seq(22050, 24000, 16000),
      0 -> Seq(11025, 12000, 8000))
    val kbps = (if (v1) kbpsV1 else kbpsV2)(layer - 1)(brIdx)
    val rate = rates(verBits)(srIdx)
    val spf = if (layer == 1) 384 else if (layer == 2) 1152
      else if (v1) 1152 else 576
    val len = if (layer == 1) (12 * kbps * 1000 / rate + padding) * 4
      else spf / 8 * kbps * 1000 / rate + padding
    hdr ++ new Array[Byte](len - 4)
  }

  test("MPEG1 Layer III CBR: frames, bitrate, rate, mono, duration") {
    val bytes = frame(3, 1, 9, 0, chBits = 3) ++ frame(3, 1, 9, 0, padding = 1, chBits = 3) ++
      frame(3, 1, 9, 0, chBits = 3)
    val r = Mp3MetaUtil.parse(bytes)
    assert(r != null)
    assert(r.getUTF8String(0).toString == "1")
    assert(r.getInt(1) == 3)           // layer
    assert(r.getInt(2) == 128)         // idx 9 in V1-LIII
    assert(r.getInt(3) == 44100)
    assert(r.getInt(4) == 1)           // mono
    assert(r.getInt(5) == 3)
    assert(r.getDouble(6) == 3.0 * 1152 / 44100)
    assert(!r.getBoolean(7))
  }

  test("VBR detection and ID3v2 skip") {
    val id3 = "ID3".getBytes ++ b(4, 0, 0, 0, 0, 0, 10) ++ new Array[Byte](10)
    val bytes = id3 ++ frame(3, 1, 9, 1) ++ frame(3, 1, 12, 1) ++ frame(3, 1, 9, 1)
    val r = Mp3MetaUtil.parse(bytes)
    assert(r != null)
    assert(r.getInt(3) == 48000 && r.getInt(4) == 2 && r.getInt(5) == 3)
    assert(r.getBoolean(7)) // vbr
  }

  test("MPEG2 Layer III (576 samples/frame) and Layer I length formula") {
    val r2 = Mp3MetaUtil.parse(frame(2, 1, 5, 2) ++ frame(2, 1, 5, 2))
    assert(r2 != null)
    assert(r2.getUTF8String(0).toString == "2")
    assert(r2.getInt(2) == 40 && r2.getInt(3) == 16000)
    assert(r2.getDouble(6) == 2.0 * 576 / 16000)
    val r1 = Mp3MetaUtil.parse(frame(3, 3, 5, 0))
    assert(r1 != null)
    assert(r1.getInt(1) == 1 && r1.getInt(2) == 160)
    assert(r1.getDouble(6) == 384.0 / 44100)
  }

  test("walk stops cleanly at garbage / stream boundary; leading garbage is NULL") {
    val good = frame(3, 1, 9, 0) ++ frame(3, 1, 9, 0)
    val r = Mp3MetaUtil.parse(good ++ "trailing junk".getBytes)
    assert(r != null && r.getInt(5) == 2)
    // a rate change is a new stream — stop at the boundary
    val mixed = frame(3, 1, 9, 0) ++ frame(3, 1, 9, 1)
    val rm = Mp3MetaUtil.parse(mixed)
    assert(rm != null && rm.getInt(5) == 1)
    assert(Mp3MetaUtil.parse("not audio".getBytes ++ good) == null)
    assert(Mp3MetaUtil.parse(null) == null)
    assert(Mp3MetaUtil.parse(b(0xff, 0xfb)) == null)
    // free bitrate (idx 0) and reserved sample rate (idx 3) reject
    assert(Mp3MetaUtil.parse(frame(3, 1, 9, 0).updated(2, 0x00.toByte)) == null)
    assert(Mp3MetaUtil.parse(frame(3, 1, 9, 0).updated(2, 0x9c.toByte)) == null)
    // ID3 size lying past the payload
    val lyingId3 = "ID3".getBytes ++ b(4, 0, 0, 0x7f, 0x7f, 0x7f, 0x7f)
    assert(Mp3MetaUtil.parse(lyingId3 ++ good) == null)
  }

  test("fuzz: 1500 mutated/truncated/random payloads never throw") {
    val rnd = new scala.util.Random(99)
    val seeds = Seq(
      frame(3, 1, 9, 0) ++ frame(3, 1, 9, 0),
      frame(2, 1, 5, 2) ++ frame(2, 1, 6, 2),
      frame(3, 3, 5, 0))
    (0 until 1500).foreach { i =>
      val payload =
        if (i % 3 == 0) { val a = new Array[Byte](rnd.nextInt(96)); rnd.nextBytes(a); a }
        else {
          val base = seeds(rnd.nextInt(seeds.length)).clone()
          (0 until 1 + rnd.nextInt(5)).foreach(_ =>
            base(rnd.nextInt(base.length)) = rnd.nextInt(256).toByte)
          base.take(1 + rnd.nextInt(base.length))
        }
      Mp3MetaUtil.parse(payload) // must not throw
    }
  }
}
