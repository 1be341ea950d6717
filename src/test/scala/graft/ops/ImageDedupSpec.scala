package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Image near-dup pairing: dHash signatures through the SimHash
  * banding machinery ([[Dedup.imageNearDups]]). The images are
  * spec-valid PNGs built with a real Deflater; perturbed copies of a
  * base image must pair (pigeonhole: bands > differing bits), images
  * from a different base must not. */
class ImageDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-image-dedup")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  private def be32(v: Int) =
    b(v >>> 24, (v >>> 16) & 0xff, (v >>> 8) & 0xff, v & 0xff)

  private def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val crc = new java.util.zip.CRC32()
    crc.update(typ.getBytes); crc.update(data)
    be32(data.length) ++ typ.getBytes ++ data ++ be32(crc.getValue.toInt)
  }

  private def grayPng(w: Int, h: Int)(px: (Int, Int) => Int): Array[Byte] = {
    val scan = (0 until h).flatMap(y =>
      0.toByte +: (0 until w).map(x => px(x, y).toByte)).toArray
    val d = new java.util.zip.Deflater()
    d.setInput(scan); d.finish()
    val buf = new Array[Byte](scan.length + 64)
    val n = d.deflate(buf)
    d.end()
    b(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      chunk("IHDR", be32(w) ++ be32(h) ++ b(8, 0, 0, 0, 0)) ++
      chunk("IDAT", buf.take(n)) ++
      chunk("IEND", Array.emptyByteArray)
  }

  test("imageNearDups: perturbed copies pair within groups, never across; junk drops out") {
    // group A: monotone-increasing gradient, k-th variant brightens
    // ONE pixel — ≤2 dHash bits move per variant, ≤4 between variants
    def baseA(x: Int, y: Int) = x * 18 + y * 4 + 10  // < 200, no wrap
    def baseB(x: Int, y: Int) = (8 - x) * 18 + y * 4 + 10 // reversed: ~all bits differ
    val rows: Seq[(Long, Array[Byte])] =
      (0 until 4).map(k => (1L + k,
        grayPng(9, 8)((x, y) => baseA(x, y) + (if (x == k && y == k) 45 else 0)))) ++
      (0 until 4).map(k => (11L + k,
        grayPng(9, 8)((x, y) => baseB(x, y) + (if (x == k && y == k) 45 else 0)))) ++
      Seq((99L, "definitely not a png".getBytes)) // no signature, silent drop
    val df = rows.toDF("id", "png")
    val pairs = Dedup.imageNearDups(df, "id", "png", maxHamming = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val withinA = (for (i <- 1L to 4L; j <- 1L to 4L if i < j) yield (i, j)).toSet
    val withinB = (for (i <- 11L to 14L; j <- 11L to 14L if i < j) yield (i, j)).toSet
    assert(pairs == withinA ++ withinB, pairs)
    // hamming column is real and within the screen bound
    val maxHam = Dedup.imageNearDups(df, "id", "png", maxHamming = 5)
      .agg(max("hamming")).head().getInt(0)
    assert(maxHam <= 5)
    // identical images at distance 0 pair too
    val clones = Seq((1L, grayPng(9, 8)(baseA)), (2L, grayPng(9, 8)(baseA)))
      .toDF("id", "png")
    assert(Dedup.imageNearDups(clones, "id", "png")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
    // bands must divide the bit count — loud
    intercept[IllegalArgumentException](
      Dedup.imageNearDups(df, "id", "png", bands = 7))
    // the Pipeline verb routes through the same op
    val viaVerb = graft.etl.Pipeline.of("imgs", df)
      .imageNearDups("id", "png")
      .toDF.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaVerb == pairs)
  }

  private def le16b(v: Int) = b(v & 0xff, (v >> 8) & 0xff)
  private def le32b(v: Int) = b(v & 0xff, (v >> 8) & 0xff, (v >> 16) & 0xff, (v >> 24) & 0xff)

  private def wav16(samples: Seq[Int]): Array[Byte] = {
    val data = samples.flatMap(s => Seq((s & 0xff).toByte, ((s >> 8) & 0xff).toByte)).toArray
    "RIFF".getBytes ++ le32b(36 + data.length) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32b(16) ++ le16b(1) ++ le16b(1) ++
      le32b(8000) ++ le32b(16000) ++ le16b(2) ++ le16b(16) ++
      "data".getBytes ++ le32b(data.length) ++ data
  }

  test("audioNearDups: gain-scaled and perturbed copies pair; a different envelope does not") {
    // base envelope: loud/soft alternating blocks of 10 samples
    def baseA(k: Int) = if ((k / 10) % 2 == 0) 4000 + (k % 7) * 11 else 300 + (k % 5)
    def baseB(k: Int) = if ((k / 10) % 2 == 1) 4000 + (k % 7) * 11 else 300 + (k % 5)
    val rows: Seq[(Long, Array[Byte])] = Seq(
      1L -> wav16((0 until 200).map(baseA)),
      2L -> wav16((0 until 200).map(k => baseA(k) * 2)),      // exact gain x2
      3L -> wav16((0 until 200).map(k => baseA(k) + (if (k == 57) 90 else 0))), // tiny blip
      11L -> wav16((0 until 200).map(baseB)),                 // shifted envelope
      99L -> "not audio".getBytes)                            // silent drop
    val pairs = Dedup.audioNearDups(rows.toDF("id", "wav"), "id", "wav",
      maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)), pairs)
    // the exact-gain copy sits at Hamming distance ZERO
    val zero = Dedup.audioNearDups(rows.toDF("id", "wav"), "id", "wav")
      .filter(col("id1") === 1L && col("id2") === 2L)
      .head().getInt(2)
    assert(zero == 0)
    intercept[IllegalArgumentException](
      Dedup.audioNearDups(rows.toDF("id", "wav"), "id", "wav", bands = 7))
  }

  private def be32b4(v: Long) =
    b((v >>> 24).toInt, (v >>> 16).toInt & 0xff, (v >>> 8).toInt & 0xff, v.toInt & 0xff)
  private def mbox(t: String, payload: Array[Byte]): Array[Byte] =
    be32b4(payload.length + 8L) ++ t.getBytes ++ payload
  private def fmbox(t: String, payload: Array[Byte]): Array[Byte] =
    mbox(t, b(0, 0, 0, 0) ++ payload)

  private def mp4Of(sizes: Seq[Long], chunkOffsets: Seq[Long] = Seq(4096L)): Array[Byte] = {
    val perChunk = sizes.length / chunkOffsets.length
    val stsz = fmbox("stsz", be32b4(0) ++ be32b4(sizes.length.toLong) ++
      sizes.flatMap(be32b4).toArray)
    val stsc = fmbox("stsc", be32b4(chunkOffsets.length.toLong) ++
      chunkOffsets.indices.flatMap(i =>
        be32b4(i + 1L) ++ be32b4(perChunk.toLong) ++ be32b4(1L)).toArray)
    val stco = fmbox("stco", be32b4(chunkOffsets.length.toLong) ++
      chunkOffsets.flatMap(be32b4).toArray)
    mbox("ftyp", "isom".getBytes ++ be32b4(0x200L)) ++
      mbox("moov", mbox("trak", mbox("mdia", mbox("minf",
        mbox("stbl", stsz ++ stsc ++ stco)))))
  }

  test("videoNearDups: re-muxed and trimmed copies pair; a different size envelope does not") {
    def baseA(k: Int): Long = if ((k / 10) % 2 == 0) 3000 + k % 9 else 200 + k % 5
    def baseB(k: Int): Long = if ((k / 10) % 2 == 1) 3000 + k % 9 else 200 + k % 5
    val sizesA = (0 until 200).map(baseA)
    val rows: Seq[(Long, Array[Byte])] = Seq(
      1L -> mp4Of(sizesA),
      2L -> mp4Of(sizesA, chunkOffsets = Seq(100L, 999999L)), // re-mux: same sizes
      3L -> mp4Of(sizesA.updated(57, 3900L)),                 // one re-costed frame
      11L -> mp4Of((0 until 200).map(baseB)),                 // shifted envelope
      99L -> "not an mp4".getBytes)                           // silent drop
    val pairs = Dedup.videoNearDups(rows.toDF("id", "mp4"), "id", "mp4",
      maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)), pairs)
    // the re-muxed copy sits at Hamming distance ZERO
    val zero = Dedup.videoNearDups(rows.toDF("id", "mp4"), "id", "mp4")
      .filter(col("id1") === 1L && col("id2") === 2L).head().getInt(2)
    assert(zero == 0)
    // the Pipeline verb routes through the same op
    val viaVerb = graft.etl.Pipeline.of("vids", rows.toDF("id", "mp4"))
      .videoNearDups("id", "mp4", maxHamming = 6)
      .toDF.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaVerb == pairs)
    intercept[IllegalArgumentException](
      Dedup.videoNearDups(rows.toDF("id", "mp4"), "id", "mp4", bands = 7))
  }

  test("cross-corpus media dedup: catalog hits drop, others survive, widths probed") {
    // IMAGE: catalog ships baseA's signature only; the crawl holds a
    // lightly-perturbed re-ship of baseA (drop), a reversed gradient
    // (keep), and junk bytes (keep — no signature, no verdict)
    def baseA(x: Int, y: Int) = x * 18 + y * 4 + 10
    def baseB(x: Int, y: Int) = (8 - x) * 18 + y * 4 + 10
    val catalog = Dedup.imageSignatureCatalog(
      Seq((100L, grayPng(9, 8)(baseA))).toDF("id", "png"), "id", "png")
    val corpus = Seq(
      (1L, grayPng(9, 8)((x, y) => baseA(x, y) + (if (x == 2 && y == 2) 45 else 0))),
      (2L, grayPng(9, 8)(baseB)),
      (99L, "not a png".getBytes)).toDF("id", "png")
    val pairs = Dedup.crossCorpusImageNearDups(
      corpus, catalog, "id", "sig", "id", "png", maxHamming = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 100L)), pairs)
    val kept = Dedup.crossCorpusImageDedup(
      corpus, catalog, "id", "sig", "id", "png", maxHamming = 5)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 99L), kept)
    // a catalog built at a different signature width fails loudly
    // instead of silently never colliding
    val e = intercept[IllegalArgumentException](
      Dedup.crossCorpusImageDedup(corpus, catalog, "id", "sig", "id", "png",
        hashW = 4, hashH = 4, bands = 4).collect())
    assert(e.getMessage.contains("64 bits"), e.getMessage)
    // the Pipeline verb routes through the same op
    val viaVerb = graft.etl.Pipeline.of("imgs", corpus)
      .dedupImagesAgainst(catalog, "id", "sig", "id", "png", maxHamming = 5)
      .toDF.select("id").collect().map(_.getLong(0)).toSet
    assert(viaVerb == kept)
    // the catalog-update loop: only survivors' signatures merge in
    // (junk has none), and the merged set is distinct by SIGNATURE —
    // re-shipping an identical-signature image does not grow it
    val merged = Dedup.updateSignatureCatalog(catalog,
      Dedup.imageSignatureCatalog(
        corpus.filter(col("id") =!= 1L), "id", "png"))
    assert(merged.count() == 2) // baseA (catalog) + baseB (survivor)
    val again = Dedup.updateSignatureCatalog(merged,
      Dedup.imageSignatureCatalog(
        Seq((500L, grayPng(9, 8)(baseB))).toDF("id", "png"), "id", "png"))
    assert(again.count() == 2)

    // AUDIO: a gain-doubled re-ship of the catalog clip drops (the
    // hash is gain-invariant), the shifted envelope survives
    def sa(k: Int) = if ((k / 10) % 2 == 0) 4000 + (k % 7) * 11 else 300 + (k % 5)
    def sb(k: Int) = if ((k / 10) % 2 == 1) 4000 + (k % 7) * 11 else 300 + (k % 5)
    val acat = Dedup.audioSignatureCatalog(
      Seq((100L, wav16((0 until 200).map(sa)))).toDF("id", "wav"), "id", "wav")
    val acorp = Seq(
      (1L, wav16((0 until 200).map(k => sa(k) * 2))),
      (2L, wav16((0 until 200).map(sb))),
      (99L, "not audio".getBytes)).toDF("id", "wav")
    val akept = graft.etl.Pipeline.of("auds", acorp)
      .dedupAudioAgainst(acat, "id", "sig", "id", "wav")
      .toDF.select("id").collect().map(_.getLong(0)).toSet
    assert(akept == Set(2L, 99L), akept)

    // VIDEO: a re-MUX of the catalog video drops (same coded sizes,
    // different chunking), the shifted envelope survives
    def va(k: Int): Long = if ((k / 10) % 2 == 0) 3000 + k % 9 else 200 + k % 5
    def vb(k: Int): Long = if ((k / 10) % 2 == 1) 3000 + k % 9 else 200 + k % 5
    val vcat = Dedup.videoSignatureCatalog(
      Seq((100L, mp4Of((0 until 200).map(va)))).toDF("id", "mp4"), "id", "mp4")
    val vcorp = Seq(
      (1L, mp4Of((0 until 200).map(va), chunkOffsets = Seq(100L, 999999L))),
      (2L, mp4Of((0 until 200).map(vb))),
      (99L, "not an mp4".getBytes)).toDF("id", "mp4")
    val vkept = graft.etl.Pipeline.of("vids", vcorp)
      .dedupVideoAgainst(vcat, "id", "sig", "id", "mp4")
      .toDF.select("id").collect().map(_.getLong(0)).toSet
    assert(vkept == Set(2L, 99L), vkept)
  }
}
