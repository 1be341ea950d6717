package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** WARC source: golden records (response with HTTP split, warcinfo
  * without), multi-record files, per-record gzip members, corruption
  * policy (strict typed / lenient prefix), hostile fuzz. */
class WarcSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-warc-test")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def record(
      recType: String, uri: Option[String], block: Array[Byte]): Array[Byte] = {
    val head = new StringBuilder
    head ++= "WARC/1.0\r\n"
    head ++= s"WARC-Type: $recType\r\n"
    uri.foreach(u => head ++= s"WARC-Target-URI: $u\r\n")
    head ++= "WARC-Date: 2026-02-03T04:05:06Z\r\n"
    head ++= "Content-Type: application/http; msgtype=response\r\n"
    head ++= s"Content-Length: ${block.length}\r\n\r\n"
    head.toString.getBytes("ISO-8859-1") ++ block ++
      "\r\n\r\n".getBytes("ISO-8859-1")
  }

  private def httpBlock(status: String, body: String): Array[Byte] =
    (s"HTTP/1.1 $status\r\nContent-Type: text/html\r\nX-Y: z\r\n\r\n")
      .getBytes("ISO-8859-1") ++ body.getBytes("UTF-8")

  test("golden: response records split HTTP; warcinfo keeps raw block only") {
    val dir = Files.createTempDirectory("graft-warc-golden").toString
    val bytes =
      record("warcinfo", None, "software: graft-test\r\n".getBytes) ++
      record("response", Some("http://a.test/1"), httpBlock("200 OK", "hello world")) ++
      record("response", Some("http://a.test/2"), httpBlock("404 Not Found", "")) ++
      record("response", Some("http://a.test/3"), "not an http block".getBytes)
    Files.write(Paths.get(dir, "crawl.warc"), bytes)
    val rows = Warc.read(spark, dir).collect()
      .sortBy(r => Option(r.getString(2)).getOrElse(""))
    assert(rows.length == 4)
    val info = rows.head // no uri sorts first
    assert(info.getString(1) == "warcinfo" && info.isNullAt(2))
    assert(info.isNullAt(7) && info.isNullAt(8))
    assert(new String(info.getAs[Array[Byte]](6)).startsWith("software:"))
    val r1 = rows(1)
    assert(r1.getString(2) == "http://a.test/1")
    assert(r1.getString(3) == "2026-02-03T04:05:06Z")
    assert(r1.getInt(7) == 200)
    assert(new String(r1.getAs[Array[Byte]](8), "UTF-8") == "hello world")
    assert(rows(2).getInt(7) == 404 &&
      rows(2).getAs[Array[Byte]](8).isEmpty)
    val nonHttp = rows(3)
    assert(nonHttp.isNullAt(7) && nonHttp.isNullAt(8))
    assert(new String(nonHttp.getAs[Array[Byte]](6)) == "not an http block")
  }

  test("warc.gz: concatenated per-record gzip members decode as one stream") {
    val dir = Files.createTempDirectory("graft-warc-gz").toString
    def gz(b: Array[Byte]): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(b); g.close()
      bos.toByteArray
    }
    val bytes =
      gz(record("response", Some("http://b.test/1"), httpBlock("200 OK", "alpha"))) ++
      gz(record("response", Some("http://b.test/2"), httpBlock("200 OK", "bravo")))
    Files.write(Paths.get(dir, "crawl.warc.gz"), bytes)
    val bodies = Warc.read(spark, dir).collect()
      .map(r => new String(r.getAs[Array[Byte]](8), "UTF-8")).sorted
    assert(bodies.toSeq == Seq("alpha", "bravo"))
  }

  test("WET (conversion records): extracted-text payloads read as raw blocks") {
    // Common Crawl's WET files are the same framing with
    // WARC-Type: conversion and a text/plain block — the generic
    // record reader must surface them with the block as payload and
    // no HTTP split
    val dir = Files.createTempDirectory("graft-warc-wet").toString
    val wet = "Extracted text.\nSecond line.".getBytes("UTF-8")
    val head = ("WARC/1.0\r\nWARC-Type: conversion\r\n" +
      "WARC-Target-URI: http://wet.test/page\r\n" +
      "WARC-Date: 2026-02-03T04:05:06Z\r\n" +
      "Content-Type: text/plain\r\n" +
      s"Content-Length: ${wet.length}\r\n\r\n").getBytes("ISO-8859-1")
    Files.write(Paths.get(dir, "crawl.warc"),
      head ++ wet ++ "\r\n\r\n".getBytes("ISO-8859-1"))
    val r = Warc.read(spark, dir).collect().head
    assert(r.getString(1) == "conversion")
    assert(r.getString(2) == "http://wet.test/page")
    assert(r.getString(4) == "text/plain")
    assert(new String(r.getAs[Array[Byte]](6), "UTF-8") ==
      "Extracted text.\nSecond line.")
    assert(r.isNullAt(7) && r.isNullAt(8)) // no HTTP split for WET
  }

  test("folded (LWS continuation) headers extend the previous value") {
    val dir = Files.createTempDirectory("graft-warc-fold").toString
    val block = "body".getBytes
    val head = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: http://fold.test/very\r\n" +
      "\t/long/path\r\n" + // folded continuation of the URI
      s"Content-Length: ${block.length}\r\n\r\n").getBytes("ISO-8859-1")
    Files.write(Paths.get(dir, "crawl.warc"),
      head ++ block ++ "\r\n\r\n".getBytes("ISO-8859-1"))
    val r = Warc.read(spark, dir).collect().head
    assert(r.getString(2) == "http://fold.test/very /long/path")
    assert(new String(r.getAs[Array[Byte]](6)) == "body")
  }

  test("corruption: strict fails typed; lenient keeps the decoded prefix") {
    val dir = Files.createTempDirectory("graft-warc-corrupt").toString
    val good = record("response", Some("http://c.test/1"), httpBlock("200 OK", "keep"))
    // second record lies about its Content-Length
    val bad = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "Content-Length: 999999\r\n\r\nshort").getBytes("ISO-8859-1")
    Files.write(Paths.get(dir, "crawl.warc"), good ++ bad)
    val strict = intercept[Exception] { Warc.read(spark, dir).count() }
    def causes(t: Throwable) =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(causes(strict).exists(_.isInstanceOf[java.io.IOException]))
    val kept = Warc.read(spark, dir, lenient = true).collect()
    assert(kept.length == 1 &&
      new String(kept.head.getAs[Array[Byte]](8), "UTF-8") == "keep")
  }

  test("hostile fuzz: mutations and garbage fail typed or parse, never unclean") {
    val seed = record("response", Some("http://d.test/1"),
      httpBlock("200 OK", "x" * 50)) ++
      record("metadata", None, "k: v\r\n".getBytes)
    val rnd = new scala.util.Random(20260814L)
    (0 until 600).foreach { i =>
      val m =
        if (i % 4 == 0) { val a = new Array[Byte](rnd.nextInt(300)); rnd.nextBytes(a); a }
        else {
          val c = seed.clone()
          (0 until 1 + rnd.nextInt(6)).foreach(_ =>
            c(rnd.nextInt(c.length)) = rnd.nextInt(256).toByte)
          c.take(1 + rnd.nextInt(c.length))
        }
      try { Warc.parseFile("fuzz", m, lenient = false); () }
      catch {
        case _: java.io.IOException => ()
        case t: Throwable =>
          fail(s"case $i: uncontrolled ${t.getClass.getName}: ${t.getMessage}")
      }
      assert(Warc.parseFile("fuzz", m, lenient = true) != null)
    }
  }
}
