package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Golden-bytes parity for the Ogg page walker: handcrafted Vorbis /
  * Opus streams (the same byte layouts any muxer emits), lacing sums,
  * granule tracking, clean stops at truncation/garbage, plus hostile
  * inputs — exact metadata on valid streams, NULL (never a throw)
  * when the first page is invalid. */
class OggMetaSpec extends AnyFunSuite {

  private def le(v: Long, n: Int): Array[Byte] =
    (0 until n).map(i => ((v >> (8 * i)) & 0xff).toByte).toArray

  private def page(
      hdrType: Int, granule: Long, serial: Long, seq: Long,
      segments: Seq[Array[Byte]]): Array[Byte] =
    "OggS".getBytes ++ Array[Byte](0, hdrType.toByte) ++ le(granule, 8) ++
      le(serial, 4) ++ le(seq, 4) ++ le(0, 4) ++
      Array(segments.length.toByte) ++ segments.map(_.length.toByte) ++
      segments.flatten

  private def vorbisId(ch: Int, rate: Long): Array[Byte] =
    Array[Byte](1) ++ "vorbis".getBytes ++ le(0, 4) ++ Array(ch.toByte) ++
      le(rate, 4) ++ new Array[Byte](12) ++ Array(0xb8.toByte, 1.toByte)

  private def opusId(ch: Int, preSkip: Int, rate: Long): Array[Byte] =
    "OpusHead".getBytes ++ Array[Byte](1, ch.toByte) ++ le(preSkip, 2) ++
      le(rate, 4) ++ le(0, 2) ++ Array[Byte](0)

  test("vorbis: codec, channels, rate, pages, granule, duration") {
    val bytes = page(2, 0, 7, 0, Seq(vorbisId(2, 44100))) ++
      page(0, 22050, 7, 1, Seq(new Array[Byte](11))) ++
      page(4, 88200, 7, 2, Seq(new Array[Byte](3)))
    val r = OggMetaUtil.parse(bytes)
    assert(r != null)
    assert(r.getUTF8String(0).toString == "vorbis")
    assert(r.getInt(1) == 2)
    assert(r.getInt(2) == 44100)
    assert(r.getInt(3) == 0)       // pre_skip
    assert(r.getInt(4) == 3)       // n_pages
    assert(r.getLong(5) == 88200L)
    assert(r.getDouble(6) == 88200.0 / 44100) // exactly 2 s
  }

  test("opus: pre-skip subtracted on the fixed 48 kHz granule clock") {
    val bytes = page(2, 0, 9, 0, Seq(opusId(1, 312, 16000))) ++
      page(4, 48312, 9, 1, Seq(new Array[Byte](5)))
    val r = OggMetaUtil.parse(bytes)
    assert(r != null)
    assert(r.getUTF8String(0).toString == "opus")
    assert(r.getInt(1) == 1)
    assert(r.getInt(2) == 16000)   // INPUT rate, informational
    assert(r.getInt(3) == 312)
    assert(r.getDouble(6) == (48312.0 - 312) / 48000) // exactly 1 s
  }

  test("multi-segment lacing sums decide the page length") {
    // one page whose body is three segments; a follow-up page right
    // after must be found exactly at the lacing sum
    val bytes = page(2, 0, 1, 0,
      Seq(vorbisId(1, 8000), new Array[Byte](255), new Array[Byte](17))) ++
      page(4, 4000, 1, 1, Seq(Array[Byte](1, 2, 3)))
    val r = OggMetaUtil.parse(bytes)
    assert(r != null && r.getInt(4) == 2 && r.getLong(5) == 4000L)
  }

  test("granule -1 (no packet ends) pages do not move last_granule") {
    val bytes = page(2, 0, 1, 0, Seq(vorbisId(1, 8000))) ++
      page(0, -1L, 1, 1, Seq(new Array[Byte](8)))
    val r = OggMetaUtil.parse(bytes)
    assert(r != null && r.getInt(4) == 2 && r.getLong(5) == 0L)
  }

  test("unrecognized BOS packet: codec unknown, audio fields null, pages counted") {
    val bytes = page(2, 0, 3, 0, Seq("notacodecheader!".getBytes)) ++
      page(4, 999, 3, 1, Seq(new Array[Byte](4)))
    val r = OggMetaUtil.parse(bytes)
    assert(r != null)
    assert(r.getUTF8String(0).toString == "unknown")
    assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3))
    assert(r.getInt(4) == 2 && r.getLong(5) == 999L)
    assert(r.isNullAt(6)) // no rate -> no duration
  }

  test("trailing garbage and truncated last page stop cleanly") {
    val good = page(2, 0, 5, 0, Seq(vorbisId(2, 48000))) ++
      page(4, 96000, 5, 1, Seq(new Array[Byte](6)))
    val garbage = OggMetaUtil.parse(good ++ "garbage-bytes".getBytes)
    assert(garbage != null && garbage.getInt(4) == 2 &&
      garbage.getLong(5) == 96000L)
    val truncated = OggMetaUtil.parse(
      good ++ page(4, 144000, 5, 2, Seq(new Array[Byte](200))).dropRight(150))
    assert(truncated != null && truncated.getInt(4) == 2 &&
      truncated.getLong(5) == 96000L)
  }

  test("hostile inputs: null / short / non-ogg / bit-flips never throw") {
    assert(OggMetaUtil.parse(null) == null)
    assert(OggMetaUtil.parse(Array.emptyByteArray) == null)
    assert(OggMetaUtil.parse("OggX".getBytes ++ new Array[Byte](40)) == null)
    assert(OggMetaUtil.parse(new Array[Byte](64)) == null)
    val seed = page(2, 0, 5, 0, Seq(vorbisId(2, 48000))) ++
      page(4, 96000, 5, 1, Seq(new Array[Byte](6)))
    val rnd = new scala.util.Random(20260814L)
    (0 until 500).foreach { _ =>
      val mutated = seed.clone()
      (0 until 1 + rnd.nextInt(4)).foreach(_ =>
        mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte)
      OggMetaUtil.parse(mutated.take(1 + rnd.nextInt(mutated.length))) // must not throw
    }
  }
}
