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

  test("readStream: streamed records == batch records, with a stateless prep verb chained") {
    // the live-crawl drop-directory shape: the SAME parser behind the
    // file-stream source, each file once, stateless prep chaining
    // unchanged (here: response filter + body decode + mojibake repair)
    val dir = Files.createTempDirectory("graft-warc-stream").toString
    def gz(b: Array[Byte]): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(b); g.close()
      bos.toByteArray
    }
    val mangled = new String(
      "café".getBytes("UTF-8"), java.nio.charset.Charset.forName("windows-1252"))
    Files.write(Paths.get(dir, "a.warc"),
      record("warcinfo", None, "software: graft-test\r\n".getBytes) ++
      record("response", Some("http://s.test/1"), httpBlock("200 OK", s"$mangled one")))
    Files.write(Paths.get(dir, "b.warc.gz"),
      gz(record("response", Some("http://s.test/2"), httpBlock("200 OK", "two"))) ++
      gz(record("response", Some("http://s.test/3"), httpBlock("404 Not Found", "three"))))

    import org.apache.spark.sql.functions._
    def prep(df: org.apache.spark.sql.DataFrame) = df
      .filter(col("record_type") === "response" && col("http_status") === 200)
      .select(col("target_uri"),
        graft.ops.TextOps.fixMojibake(
          col("http_body").cast("string")).as("text"))
    val streamed = graft.streaming.Streams.runBounded(
      prep(Warc.readStream(spark, dir)))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val batch = prep(Warc.read(spark, dir))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(streamed == batch)
    assert(streamed == Set(
      ("http://s.test/1", "café one"), ("http://s.test/2", "two")))
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

  test("warc.gz: garbage BETWEEN members fails strict typed, lenient keeps prefix members") {
    // the JDK's GZIPInputStream treats a garbage next-member header as
    // clean EOF — the hand-walked member decoder must instead fail
    // typed (strict) or keep exactly the fully-decoded prefix (lenient)
    def gz(b: Array[Byte]): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(b); g.close()
      bos.toByteArray
    }
    val m1 = gz(record("response", Some("http://g.test/1"), httpBlock("200 OK", "one")))
    val m2 = gz(record("response", Some("http://g.test/2"), httpBlock("200 OK", "two")))
    val junk = Array.tabulate[Byte](16)(i => (i * 37 + 5).toByte) // not 1f 8b
    val torn = m1 ++ junk ++ m2
    val e = intercept[java.io.IOException] { Warc.parseFile("t", torn, lenient = false) }
    assert(e.getMessage.contains("gzip member"))
    val kept = Warc.parseFile("t", torn, lenient = true)
    assert(kept.length == 1 &&
      new String(kept.head.getAs[Array[Byte]](8), "UTF-8") == "one")
    // a TRUNCATED second member: same policy
    val trunc = m1 ++ m2.take(m2.length - 5)
    intercept[java.io.IOException] { Warc.parseFile("t", trunc, lenient = false) }
    assert(Warc.parseFile("t", trunc, lenient = true).length == 1)
    // a bit-flip INSIDE a member's deflate data: CRC or stream breaks
    val flipped = (m1 ++ m2).clone()
    flipped(m1.length + 14) = (flipped(m1.length + 14) ^ 0x55).toByte
    intercept[java.io.IOException] { Warc.parseFile("t", flipped, lenient = false) }
    assert(Warc.parseFile("t", flipped, lenient = true).length == 1)
  }

  test("linkRequests correlates request/response pairs in EITHER pointer direction") {
    val dir = Files.createTempDirectory("graft-warc-link").toString
    def rec(typ: String, rid: String, conc: Option[String], uri: String,
        block: Array[Byte]): Array[Byte] = {
      val head = new StringBuilder
      head ++= s"WARC/1.0\r\nWARC-Type: $typ\r\n"
      head ++= s"WARC-Record-ID: <urn:uuid:$rid>\r\n"
      conc.foreach(c => head ++= s"WARC-Concurrent-To: <urn:uuid:$c>\r\n")
      head ++= s"WARC-Target-URI: $uri\r\nContent-Length: ${block.length}\r\n\r\n"
      head.toString.getBytes("ISO-8859-1") ++ block ++ "\r\n\r\n".getBytes("ISO-8859-1")
    }
    val bytes =
      // capture 1: request points at response (Common Crawl direction)
      rec("request", "r1-req", Some("r1-resp"), "http://l.test/1", "GET1".getBytes) ++
      rec("response", "r1-resp", None, "http://l.test/1", httpBlock("200 OK", "one")) ++
      // capture 2: response points at request (the other legal direction)
      rec("response", "r2-resp", Some("r2-req"), "http://l.test/2", httpBlock("200 OK", "two")) ++
      rec("request", "r2-req", None, "http://l.test/2", "GET2".getBytes) ++
      // response with NO captured request: left join keeps it, req_* NULL
      rec("response", "r3-resp", None, "http://l.test/3", httpBlock("200 OK", "three")) ++
      // capture 4: MUTUAL pointers — BOTH records carry
      // WARC-Concurrent-To naming the other (ISO 28500-legal); the
      // key-set intersection matches twice and must collapse to ONE row
      rec("request", "r4-req", Some("r4-resp"), "http://l.test/4", "GET4".getBytes) ++
      rec("response", "r4-resp", Some("r4-req"), "http://l.test/4", httpBlock("200 OK", "four"))
    Files.write(Paths.get(dir, "crawl.warc"), bytes)
    val warc = Warc.read(spark, dir)
    // record_id / concurrent_to surfaced with brackets stripped
    val ids = warc.collect().map(r => (r.getString(9), Option(r.getString(10)))).toMap
    assert(ids.contains("urn:uuid:r1-req") &&
      ids("urn:uuid:r1-req").contains("urn:uuid:r1-resp"))
    val linked = Warc.linkRequests(warc).collect()
      .sortBy(r => r.getString(2))
    assert(linked.length == 4)
    assert(new String(linked(0).getAs[Array[Byte]]("http_body"), "UTF-8") == "one")
    assert(linked(0).getAs[String]("req_record_id") == "urn:uuid:r1-req")
    assert(new String(linked(0).getAs[Array[Byte]]("req_payload")) == "GET1")
    assert(linked(1).getAs[String]("req_record_id") == "urn:uuid:r2-req")
    assert(new String(linked(1).getAs[Array[Byte]]("req_payload")) == "GET2")
    assert(linked(2).isNullAt(linked(2).fieldIndex("req_record_id")))
    assert(linked(2).isNullAt(linked(2).fieldIndex("req_payload")))
    assert(linked(3).getAs[String]("req_record_id") == "urn:uuid:r4-req")
    assert(new String(linked(3).getAs[Array[Byte]]("req_payload")) == "GET4")
  }

  test("property: 300 random multi-record WARCs roundtrip; truncations keep a typed prefix") {
    // the Ogg/EBML-style generator treatment for WARC: random header
    // sets, LWS folding, record types incl. WET conversion, random
    // binary blocks, random gzip member grouping; every generated file
    // must parse back EXACTLY, and every truncation must fail typed
    // (strict) or keep a clean record prefix (lenient)
    val rnd = new scala.util.Random(20260812L)
    def gz(b: Array[Byte]): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(b); g.close()
      bos.toByteArray
    }
    (0 until 300).foreach { i =>
      val nRec = 1 + rnd.nextInt(6)
      val recs = (0 until nRec).map { j =>
        val typ = Seq("response", "request", "conversion",
          "metadata", "warcinfo")(rnd.nextInt(5))
        val uriParts =
          if (rnd.nextInt(4) == 0) None
          else Some((s"http://p$i.test/$j", if (rnd.nextInt(3) == 0)
            Some("seg" * (1 + rnd.nextInt(3))) else None))
        val body = new Array[Byte](rnd.nextInt(200)); rnd.nextBytes(body)
        val block = if (typ == "response" && rnd.nextBoolean())
          "HTTP/1.1 200 OK\r\nX-A: b\r\n\r\n".getBytes("ISO-8859-1") ++ body
          else body
        val head = new StringBuilder
        head ++= "WARC/1.0\r\n"
        head ++= s"WARC-Type: $typ\r\n"
        uriParts.foreach { case (base, fold) =>
          fold match {
            case Some(tail) => // LWS-folded URI: continuation line
              head ++= s"WARC-Target-URI: $base\r\n ${tail}\r\n"
            case None => head ++= s"WARC-Target-URI: $base\r\n"
          }
        }
        (0 until rnd.nextInt(3)).foreach(k =>
          head ++= s"X-Custom-$k: v${rnd.nextInt(1000)}\r\n")
        head ++= s"Content-Length: ${block.length}\r\n\r\n"
        val expectUri = uriParts.map { case (b, f) =>
          f.map(t => s"$b $t").getOrElse(b) }
        val bytes = head.toString.getBytes("ISO-8859-1") ++ block ++
          (if (rnd.nextInt(8) == 0 && j == nRec - 1) Array.emptyByteArray
           else "\r\n\r\n".getBytes("ISO-8859-1"))
        (typ, expectUri, block, bytes)
      }
      val plain = recs.flatMap(_._4).toArray
      // random gzip member grouping: consecutive record runs per member
      val full =
        if (rnd.nextBoolean()) plain
        else {
          val out = new ByteArrayOutputStream()
          var k = 0
          while (k < nRec) {
            val take = 1 + rnd.nextInt(nRec - k)
            out.write(gz(recs.slice(k, k + take).flatMap(_._4).toArray))
            k += take
          }
          out.toByteArray
        }
      val rows = Warc.parseFile(s"p$i", full, lenient = false)
      assert(rows.length == nRec, s"case $i: ${rows.length} != $nRec records")
      rows.zip(recs).foreach { case (row, (typ, uri, block, _)) =>
        assert(row.getString(1) == typ, s"case $i type")
        assert(Option(row.getString(2)) == uri, s"case $i uri")
        assert(java.util.Arrays.equals(row.getAs[Array[Byte]](6), block),
          s"case $i payload")
      }
      // truncation at a random point: strict fails typed or parses a
      // prefix; lenient always yields a clean record prefix
      if (full.length > 0) {
        val trunc = full.take(rnd.nextInt(full.length))
        try { Warc.parseFile(s"p$i", trunc, lenient = false); () }
        catch {
          case _: java.io.IOException => ()
          case t: Throwable =>
            fail(s"case $i: uncontrolled ${t.getClass.getName}: ${t.getMessage}")
        }
        val kept = Warc.parseFile(s"p$i", trunc, lenient = true)
        assert(kept.length <= nRec, s"case $i: lenient invented records")
        kept.zipWithIndex.foreach { case (row, k) =>
          assert(row.getString(1) == recs(k)._1 &&
            java.util.Arrays.equals(row.getAs[Array[Byte]](6), recs(k)._3),
            s"case $i: lenient row $k is not the expected prefix record")
        }
      }
    }
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
