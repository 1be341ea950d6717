package graft.sources

import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Corruption policy of the archive sources: strict mode (the
  * reference contract) fails the load with a typed format error;
  * lenient mode — the crawl-grade policy — keeps every entry decoded
  * before the corruption and completes the job. At 100 TB one
  * truncated archive in a million files must not kill the ingest. */
class CorruptArchiveSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-corrupt-archive")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** zip with entries a, b (decodable) and c whose DEFLATE data is
    * bit-flipped after the fact — a, b stream fine, c's read throws. */
  private def corruptZip(): Array[Byte] = {
    val rnd = new scala.util.Random(7L)
    val baos = new ByteArrayOutputStream()
    val zout = new ZipOutputStream(baos)
    def put(name: String, content: Array[Byte]): Unit = {
      zout.putNextEntry(new ZipEntry(name)); zout.write(content); zout.closeEntry()
    }
    put("a.txt", "alpha".getBytes)
    put("b.txt", "bravo".getBytes)
    val big = new Array[Byte](2000); rnd.nextBytes(big) // incompressible
    put("c.bin", big)
    zout.close()
    val bytes = baos.toByteArray
    // locate c's local header (3rd PK\x03\x04) and trash its data
    var found = 0
    var i = 0
    var cHdr = -1
    while (i < bytes.length - 4 && cHdr < 0) {
      if (bytes(i) == 'P' && bytes(i + 1) == 'K' && bytes(i + 2) == 3 && bytes(i + 3) == 4) {
        found += 1
        if (found == 3) cHdr = i
      }
      i += 1
    }
    assert(cHdr > 0, "fixture bug: third local header not found")
    (cHdr + 60 until cHdr + 120).foreach(j => bytes(j) = (bytes(j) ^ 0x5a).toByte)
    bytes
  }

  test("corrupt zip: strict fails typed; lenient keeps the decoded prefix") {
    val dir = Files.createTempDirectory("graft-corrupt-zip").toString
    val out = new FileOutputStream(s"$dir/corrupt.zip")
    out.write(corruptZip()); out.close()

    val strict = intercept[Exception] {
      Sources.zipEntries(spark, dir).toDF.count()
    }
    // the root cause must be the typed zip error, not an index/NPE bug
    def causes(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(causes(strict).exists(_.isInstanceOf[java.io.IOException]),
      s"expected an IOException cause chain, got: ${causes(strict).map(_.getClass.getName)}")

    val rows = Sources.zipEntries(spark, dir, lenient = true).toDF
      .select("entry", "content").collect()
      .map(r => (r.getString(0), new String(r.getAs[Array[Byte]](1))))
    assert(rows.toSeq.sortBy(_._1) == Seq("a.txt" -> "alpha", "b.txt" -> "bravo"),
      s"lenient mode must keep the pre-corruption entries, got ${rows.toSeq}")
  }

  test("undetectable file: strict fails typed; lenient skips it, reads the rest") {
    val dir = Files.createTempDirectory("graft-corrupt-arch").toString
    // one good zip + one garbage file in the same glob
    val zb = new ByteArrayOutputStream()
    val zo = new ZipOutputStream(zb)
    zo.putNextEntry(new ZipEntry("ok.txt")); zo.write("fine".getBytes); zo.closeEntry()
    zo.close()
    Files.write(java.nio.file.Paths.get(s"$dir/good.zip"), zb.toByteArray)
    Files.write(java.nio.file.Paths.get(s"$dir/garbage.zip"),
      "this is not an archive at all, not even close".getBytes)

    intercept[Exception] { Sources.archiveEntries(spark, dir).toDF.count() }

    val rows = Sources.archiveEntries(spark, dir, lenient = true).toDF
      .select("entry").collect().map(_.getString(0))
    assert(rows.toSeq == Seq("ok.txt"))
  }
}
