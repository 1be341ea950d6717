package graft.sources

import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

import graft.etl.Pipeline

/** WARC (Web ARChive, ISO 28500) as a pure-JDK source — the INGEST
  * format of web-crawl corpora (Common Crawl ships WARC): version
  * line + CRLF-terminated named headers + `Content-Length`-sized
  * block, records separated by a blank line pair; `.warc.gz` files
  * are per-record gzip members concatenated, which
  * `java.util.zip.GZIPInputStream` decodes natively as one stream.
  * With [[TfRecord]] on the other end, the engine covers the crawl
  * pipeline end to end: WARC in → triage/dedup/decontaminate/mix →
  * TFRecord shards out.
  *
  * One row per WARC record: the record headers a pipeline filters on
  * (type, target URI, date, block content type, length), the raw
  * block, and — for `response` records whose block is an HTTP
  * message — the HTTP status and the BODY with the HTTP headers
  * stripped (the part a corpus wants). Non-response records and
  * non-HTTP blocks carry a NULL status/body.
  *
  * Scale shape: one FILE per task (WARC members don't self-delimit
  * for byte-range splits without an index; crawl archives ship as
  * many ~1 GB files — file count is the parallelism, as with
  * TFRecord shards). Corruption policy mirrors the other crawl
  * sources: strict fails typed on a malformed record; `lenient`
  * keeps the records decoded before the corruption. */
object Warc {

  val schema: StructType = StructType(Seq(
    StructField("path", StringType),
    StructField("record_type", StringType),
    StructField("target_uri", StringType),
    StructField("warc_date", StringType),
    StructField("content_type", StringType),
    StructField("content_length", LongType),
    StructField("payload", BinaryType),
    StructField("http_status", IntegerType),
    StructField("http_body", BinaryType)))

  private def indexOfCrlf(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 1 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n') return i
      i += 1
    }
    -1
  }

  /** (headers lower-cased, blockStart) of one record head at `off`,
    * or a typed failure. */
  private def parseHead(
      b: Array[Byte], off: Int): (Map[String, String], Int) = {
    val vEnd = indexOfCrlf(b, off)
    if (vEnd < 0) throw new java.io.IOException(
      s"warc: no version line terminator at byte $off")
    val version = new String(b, off, vEnd - off, "ISO-8859-1")
    if (!version.startsWith("WARC/")) throw new java.io.IOException(
      s"warc: expected a WARC/ version line at byte $off, got '${version.take(20)}'")
    var cur = vEnd + 2
    val headers = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var lastKey: String = null
    var done = false
    while (!done) {
      val lineEnd = indexOfCrlf(b, cur)
      if (lineEnd < 0) throw new java.io.IOException(
        s"warc: unterminated header line at byte $cur")
      if (lineEnd == cur) { done = true; cur += 2 } // blank line
      else {
        val line = new String(b, cur, lineEnd - cur, "ISO-8859-1")
        if ((line.charAt(0) == ' ' || line.charAt(0) == '\t') && lastKey != null) {
          // RFC-style LWS folding: a continuation line extends the
          // previous header's value (long URIs fold in the wild)
          headers(lastKey) = headers(lastKey) + " " + line.trim
        } else {
          val colon = line.indexOf(':')
          if (colon <= 0) throw new java.io.IOException(
            s"warc: malformed header '${line.take(40)}' at byte $cur")
          lastKey = line.substring(0, colon).trim.toLowerCase
          headers += lastKey -> line.substring(colon + 1).trim
        }
        cur = lineEnd + 2
      }
    }
    (headers.toMap, cur)
  }

  /** Split an HTTP message block into (status, body); None for
    * non-HTTP blocks (the record's raw payload is always kept). */
  private def httpSplit(block: Array[Byte]): Option[(Int, Array[Byte])] = {
    if (block.length < 12 || !(block(0) == 'H' && block(1) == 'T' &&
      block(2) == 'T' && block(3) == 'P' && block(4) == '/')) return None
    val statusEnd = indexOfCrlf(block, 0)
    if (statusEnd < 0) return None
    val parts = new String(block, 0, statusEnd, "ISO-8859-1").split(" ")
    val status = if (parts.length >= 2) parts(1).toIntOption else None
    if (status.isEmpty) return None
    // headers end at the first blank line
    var cur = statusEnd + 2
    while (true) {
      val lineEnd = indexOfCrlf(block, cur)
      if (lineEnd < 0) return Some((status.get, Array.emptyByteArray))
      if (lineEnd == cur)
        return Some((status.get,
          java.util.Arrays.copyOfRange(block, cur + 2, block.length)))
      cur = lineEnd + 2
    }
    None // unreachable
  }

  /** Decode one (possibly multi-member-gzipped) WARC file's records.
    * Strict: typed IOException on a malformed record; lenient: stop
    * there keeping the records already decoded. */
  private[sources] def parseFile(
      path: String, raw: Array[Byte], lenient: Boolean): Seq[Row] = {
    val bytes =
      if (raw.length >= 2 && (raw(0) & 0xff) == 0x1f && (raw(1) & 0xff) == 0x8b) {
        // the gzip layer obeys the same corruption policy as the
        // records: a torn member fails typed, or yields nothing
        // under lenient (member boundaries are unrecoverable)
        try {
          val in = new java.util.zip.GZIPInputStream(
            new java.io.ByteArrayInputStream(raw), 1 << 16)
          try in.readAllBytes() finally in.close()
        } catch {
          case e: java.io.IOException =>
            if (lenient) return Seq.empty else throw e
        }
      } else raw
    val out = Seq.newBuilder[Row]
    var off = 0
    try {
      while (off < bytes.length) {
        // tolerate trailing CRLFs between records / at EOF
        while (off + 1 < bytes.length &&
          bytes(off) == '\r' && bytes(off + 1) == '\n') off += 2
        if (off >= bytes.length) return out.result()
        val (headers, blockStart) = parseHead(bytes, off)
        val len = headers.get("content-length").flatMap(_.toLongOption)
          .getOrElse(throw new java.io.IOException(
            s"warc: record at byte $off has no Content-Length"))
        if (len < 0 || len > bytes.length - blockStart)
          throw new java.io.IOException(
            s"warc: Content-Length $len overruns the file at byte $off")
        val block = java.util.Arrays.copyOfRange(
          bytes, blockStart, blockStart + len.toInt)
        val recType = headers.get("warc-type").orNull
        val http =
          if (recType == "response") httpSplit(block) else None
        out += Row(
          path,
          recType,
          headers.get("warc-target-uri").orNull,
          headers.get("warc-date").orNull,
          headers.get("content-type").orNull,
          len,
          block,
          http.map(h => Int.box(h._1)).orNull,
          http.map(_._2).orNull)
        off = blockStart + len.toInt
      }
    } catch {
      case e: java.io.IOException => if (!lenient) throw e
    }
    out.result()
  }

  /** Read a directory of `*.warc` / `*.warc.gz` files, one row per
    * record, one file per task. */
  def read(spark: SparkSession, dir: String,
      lenient: Boolean = false): DataFrame = {
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc*")
      .option("recursiveFileLookup", true).load(dir)
    val pathIdx = files.schema.fieldIndex("path")
    val contentIdx = files.schema.fieldIndex("content")
    files.flatMap { row =>
      parseFile(row.getString(pathIdx),
        row.getAs[Array[Byte]](contentIdx), lenient).iterator
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** Pipeline-verb form of [[read]]. */
  def source(spark: SparkSession, dir: String,
      lenient: Boolean = false): Pipeline =
    Pipeline.of(s"warc($dir)", read(spark, dir, lenient))
}
