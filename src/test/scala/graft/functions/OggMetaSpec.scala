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

  test("randomized roundtrip: 300 generated valid streams parse back exactly") {
    val rnd = new scala.util.Random(99L)
    (0 until 300).foreach { i =>
      val opus = rnd.nextBoolean()
      val ch = 1 + rnd.nextInt(8)
      val rate = Seq(8000L, 11025L, 16000L, 22050L, 24000L, 44100L, 48000L, 96000L)(rnd.nextInt(8))
      val preSkip = rnd.nextInt(4000)
      val serial = rnd.nextInt(1 << 30).toLong
      val granule = rnd.nextInt(1 << 30).toLong + preSkip
      val nDataPages = 1 + rnd.nextInt(5)
      val id = if (opus) opusId(ch, preSkip, rate) else vorbisId(ch, rate)
      val pages = page(2, 0, serial, 0, Seq(id)) +:
        (1 to nDataPages).map { p =>
          val segs = (0 until 1 + rnd.nextInt(3)).map(_ => new Array[Byte](rnd.nextInt(200)))
          // monotone granules; only the final page carries the last one
          val g = if (p == nDataPages) granule else granule * p / (nDataPages + 1)
          page(if (p == nDataPages) 4 else 0, g, serial, p.toLong, segs)
        }
      val r = OggMetaUtil.parse(pages.reduce(_ ++ _))
      assert(r != null, s"case $i: parse returned null")
      assert(r.getUTF8String(0).toString == (if (opus) "opus" else "vorbis"), s"case $i codec")
      assert(r.getInt(1) == ch, s"case $i channels")
      assert(r.getInt(2) == rate.toInt, s"case $i rate")
      assert(r.getInt(3) == (if (opus) preSkip else 0), s"case $i preskip")
      assert(r.getInt(4) == 1 + nDataPages, s"case $i pages")
      assert(r.getLong(5) == granule, s"case $i granule")
      val expectedDur = if (opus) (granule - preSkip).toDouble / 48000.0
        else granule.toDouble / rate
      assert(r.getDouble(6) == expectedDur, s"case $i duration")
    }
  }

  test("unsigned rate past Int.MaxValue: vorbis rejected, opus NULLs sample_rate") {
    // rate is an unsigned le32 — a hostile 0xFFFFFFFF must not appear
    // as a NEGATIVE sample_rate (nor mint a bogus vorbis duration)
    val v = OggMetaUtil.parse(
      page(2, 0, 7, 0, Seq(vorbisId(2, 0xFFFFFFFFL))) ++
        page(4, 48000, 7, 1, Seq(new Array[Byte](3))))
    assert(v != null)
    // no real audio id → unknown codec, audio fields null, pages counted
    assert(v.isNullAt(1) && v.isNullAt(2) && v.isNullAt(6))
    assert(v.getInt(4) == 2)
    // opus: the id header's input rate is informational — audio stands,
    // sample_rate NULL, duration still on the fixed 48 kHz clock
    val o = OggMetaUtil.parse(
      page(2, 0, 7, 0, Seq(opusId(2, 312, 0xFFFFFFFFL))) ++
        page(4, 48312, 7, 1, Seq(new Array[Byte](3))))
    assert(o != null)
    assert(o.getUTF8String(0).toString == "opus")
    assert(o.getInt(1) == 2 && o.isNullAt(2))
    assert(o.getDouble(6) == (48312 - 312).toDouble / 48000.0)
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
