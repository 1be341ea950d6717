package graft.sources

import org.apache.spark.sql.types._
import org.apache.spark.sql.functions.{array, array_distinct, col, explode, when}
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
    StructField("http_body", BinaryType),
    // capture-event linkage (ISO 28500 §5.4/5.7): WARC-Record-ID names
    // this record, WARC-Concurrent-To names a sibling record of the
    // same capture (a request record points at its response, or vice
    // versa). Both surfaced with the angle-bracket URI wrapper
    // stripped so they equi-join directly.
    StructField("record_id", StringType),
    StructField("concurrent_to", StringType)))

  /** `<urn:uuid:...>` → `urn:uuid:...` (the WARC header value wraps
    * the URI in angle brackets). */
  private def unwrapUri(v: String): String = {
    val t = v.trim
    if (t.length >= 2 && t.charAt(0) == '<' && t.charAt(t.length - 1) == '>')
      t.substring(1, t.length - 1)
    else t
  }

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

  /** Inflate ONE gzip member starting at `off`; returns (offset past
    * the member's trailer, decompressed bytes). Typed IOException on
    * a malformed header, torn deflate stream, or CRC/ISIZE mismatch.
    * Hand-walked (not GZIPInputStream) because the JDK reader treats
    * a garbage next-member header as clean EOF — silently truncating
    * a multi-member `.warc.gz` — and never reports how much input it
    * consumed. */
  private def inflateMember(
      raw: Array[Byte], off: Int): (Int, Array[Byte]) = {
    def fail(msg: String) =
      throw new java.io.IOException(s"warc: gzip member at byte $off: $msg")
    if (raw.length - off < 18) fail("truncated header") // 10 hdr + 8 trailer
    if ((raw(off) & 0xff) != 0x1f || (raw(off + 1) & 0xff) != 0x8b)
      fail("bad magic")
    if ((raw(off + 2) & 0xff) != 8) fail(s"unknown method ${raw(off + 2) & 0xff}")
    val flg = raw(off + 3) & 0xff
    if ((flg & 0xe0) != 0) fail(s"reserved FLG bits set ($flg)")
    var cur = off + 10 // past MTIME/XFL/OS
    if ((flg & 4) != 0) { // FEXTRA
      if (raw.length - cur < 2) fail("truncated FEXTRA")
      val xlen = (raw(cur) & 0xff) | ((raw(cur + 1) & 0xff) << 8)
      cur += 2 + xlen
      if (cur > raw.length) fail("FEXTRA overruns the file")
    }
    var fields = ((flg >> 3) & 1) + ((flg >> 4) & 1) // FNAME, FCOMMENT
    while (fields > 0) { // each is a NUL-terminated latin-1 string
      while (cur < raw.length && raw(cur) != 0) cur += 1
      if (cur >= raw.length) fail("unterminated FNAME/FCOMMENT")
      cur += 1; fields -= 1
    }
    if ((flg & 2) != 0) cur += 2 // FHCRC
    if (cur >= raw.length) fail("truncated header fields")
    val inf = new java.util.zip.Inflater(true)
    val out = new java.io.ByteArrayOutputStream(1 << 16)
    val crc = new java.util.zip.CRC32
    val buf = new Array[Byte](1 << 16)
    try {
      inf.setInput(raw, cur, raw.length - cur)
      while (!inf.finished()) {
        val n =
          try inf.inflate(buf)
          catch { case e: java.util.zip.DataFormatException =>
            fail(s"corrupt deflate stream (${e.getMessage})") }
        if (n > 0) { out.write(buf, 0, n); crc.update(buf, 0, n) }
        else if (inf.needsInput() || inf.needsDictionary())
          fail("truncated deflate stream")
      }
      val trailer = cur + inf.getBytesRead.toInt
      if (raw.length - trailer < 8) fail("truncated trailer")
      def le32(p: Int): Long =
        (raw(p) & 0xffL) | ((raw(p + 1) & 0xffL) << 8) |
          ((raw(p + 2) & 0xffL) << 16) | ((raw(p + 3) & 0xffL) << 24)
      if (le32(trailer) != crc.getValue) fail("CRC32 mismatch")
      if (le32(trailer + 4) != (out.size() & 0xffffffffL)) fail("ISIZE mismatch")
      (trailer + 8, out.toByteArray)
    } finally inf.end()
  }

  /** Concatenated-member gunzip under the crawl corruption policy:
    * strict fails typed on ANY malformed/torn member or trailing
    * garbage (nothing silently truncates); lenient keeps the
    * fully-decoded prefix members. */
  private[sources] def gunzipMembers(
      raw: Array[Byte], lenient: Boolean): Array[Byte] = {
    // grows on demand — a fixed raw.length-proportional capacity would
    // overflow Int on GB-scale members and triple peak memory
    val out = new java.io.ByteArrayOutputStream(
      math.min(raw.length.toLong, 1L << 20).toInt)
    var off = 0
    try {
      while (off < raw.length) {
        val (next, bytes) = inflateMember(raw, off)
        out.write(bytes)
        off = next
      }
    } catch {
      case e: java.io.IOException => if (!lenient) throw e
    }
    out.toByteArray
  }

  /** Decode one (possibly multi-member-gzipped) WARC file's records.
    * Strict: typed IOException on a malformed record; lenient: stop
    * there keeping the records already decoded. */
  private[sources] def parseFile(
      path: String, raw: Array[Byte], lenient: Boolean): Seq[Row] = {
    val bytes =
      if (raw.length >= 2 && (raw(0) & 0xff) == 0x1f && (raw(1) & 0xff) == 0x8b)
        gunzipMembers(raw, lenient)
      else raw
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
          http.map(_._2).orNull,
          headers.get("warc-record-id").map(unwrapUri).orNull,
          headers.get("warc-concurrent-to").map(unwrapUri).orNull)
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

  /** Streaming form of [[read]] — the live-crawl drop-directory shape:
    * `*.warc` / `*.warc.gz` files appearing under `dir` stream through
    * the SAME parser with the same row schema, each file processed
    * exactly once (the file-stream source's offset log; checkpoint the
    * query for restarts). Parallelism unit remains the file, and the
    * downstream stateless prep verbs (triage, quality, mojibake
    * repair, decontaminateByFilter/Bloom approximate) chain unchanged
    * — continuous crawl ingest without a second code path. */
  def readStream(spark: SparkSession, dir: String,
      lenient: Boolean = false): DataFrame = {
    // the binaryFile format's fixed schema, stated explicitly: file
    // stream sources require a user schema at plan time
    val binarySchema = StructType(Seq(
      StructField("path", StringType),
      StructField("modificationTime", TimestampType),
      StructField("length", LongType),
      StructField("content", BinaryType)))
    val files = spark.readStream.format("binaryFile")
      .schema(binarySchema)
      .option("pathGlobFilter", "*.warc*")
      .option("recursiveFileLookup", true).load(dir)
    val pathIdx = files.schema.fieldIndex("path")
    val contentIdx = files.schema.fieldIndex("content")
    files.flatMap { row =>
      parseFile(row.getString(pathIdx),
        row.getAs[Array[Byte]](contentIdx), lenient).iterator
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** Correlate each `response` record with the request (or other
    * `linkType`) record of the SAME capture event — the join real
    * crawl filtering needs ("keep responses whose request had header
    * X"). ISO 28500 lets EITHER sibling carry `WARC-Concurrent-To`
    * naming the other — or BOTH carry it, pointing at each other — so
    * no single join key exists: a record's capture-key SET is
    * {record_id, concurrent_to}, and two records share a capture
    * event iff their sets intersect. Membership is resolved SLIM
    * (ids only): each side explodes its 1-2 keys, the intersection is
    * one equi-join on the exploded key, and a mutual pointer's double
    * match collapses via distinct on the id pair (record ids are
    * spec-unique). Requests are the small side of a crawl
    * (header-only blocks), so the slim pairs are enriched with the
    * request columns first and the fat response rows shuffle ONCE, on
    * their own record_id. Left join: responses without a captured
    * request keep NULL `req_*` columns. Multiple linked `linkType`
    * records (rare, spec-legal) still multiply the response row, like
    * any join. */
  def linkRequests(
      warc: DataFrame, linkType: String = "request"): DataFrame = {
    def keys = array_distinct(when(col("concurrent_to").isNotNull,
        array(col("record_id"), col("concurrent_to")))
      .otherwise(array(col("record_id"))))
    val resp = warc.filter(col("record_type") === "response")
    val req = warc.filter(col("record_type") === linkType)
    val pairs = resp.select(col("record_id"), explode(keys).as("__capture__"))
      .join(req.select(col("record_id").as("req_record_id"),
        explode(keys).as("__capture__")), Seq("__capture__"))
      .select("record_id", "req_record_id").distinct()
    val reqCols = req.select(col("record_id").as("req_record_id"),
      col("target_uri").as("req_target_uri"),
      col("content_type").as("req_content_type"),
      col("payload").as("req_payload"))
    val enriched = pairs.join(reqCols, Seq("req_record_id"))
    resp.join(enriched, Seq("record_id"), "left")
      .select((warc.columns ++ reqCols.columns).map(col).toIndexedSeq: _*)
  }
}
