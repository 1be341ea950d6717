package graft.sources

import graft.etl.RejectionCategory
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

/** Http source specs against an in-process `com.sun.net.httpserver`
  * (the environment has no egress, which blocks the INTERNET, not
  * loopback). Mirrors the reference's OkHttpSource contract: row shape,
  * JSON/CSV body parsing, the 429 Retry-After retry loop, rejectNon200
  * as RUNTIME_ERROR, auth headers. */
class HttpSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-http-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private var server: HttpServer = _
  private var base: String = _
  private val flakyCalls = new AtomicInteger(0)
  private val negCalls = new AtomicInteger(0)
  private val stamps = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()

  private def respond(ex: HttpExchange, status: Int, contentType: String,
      body: String, extraHeaders: Map[String, String] = Map.empty): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    if (contentType != null) ex.getResponseHeaders.set("Content-Type", contentType)
    extraHeaders.foreach { case (k, v) => ex.getResponseHeaders.set(k, v) }
    ex.sendResponseHeaders(status, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/astros.json", (ex: HttpExchange) =>
      respond(ex, 200, "application/json; charset=utf-8",
        """{"number":3,"people":[
          |{"name":"Ann","craft":"ISS"},{"name":"Bob","craft":"ISS"},
          |{"name":"Cid","craft":"Soyuz"}]}""".stripMargin))
    server.createContext("/data.csv", (ex: HttpExchange) =>
      respond(ex, 200, "text/csv", "id,name\n1,Bob\n2,Sue\n"))
    server.createContext("/quoted.csv", (ex: HttpExchange) =>
      respond(ex, 200, "text/csv", "id,note\n1,\"line one\nline two\"\n"))
    server.createContext("/flaky", (ex: HttpExchange) =>
      if (flakyCalls.incrementAndGet() <= 2)
        respond(ex, 429, "text/plain", "slow down", Map("Retry-After" -> "0"))
      else respond(ex, 200, "text/plain", "ok"))
    // hostile throttler: always 429 with an absurd Retry-After — the
    // honored-sleep cap must fail the fetch, not park the thread
    server.createContext("/hostile429", (ex: HttpExchange) =>
      respond(ex, 429, "text/plain", "later",
        Map("Retry-After" -> "999999999")))
    server.createContext("/neg429", (ex: HttpExchange) =>
      if (negCalls.incrementAndGet() <= 1)
        respond(ex, 429, "text/plain", "later", Map("Retry-After" -> "-5"))
      else respond(ex, 200, "text/plain", "ok"))
    // request-arrival stamps for the pacing test
    server.createContext("/stamp", (ex: HttpExchange) => {
      stamps.add(System.nanoTime())
      respond(ex, 200, "text/plain", "ok")
    })
    server.createContext("/missing", (ex: HttpExchange) =>
      respond(ex, 404, "text/plain", "not here"))
    server.createContext("/echo-auth", (ex: HttpExchange) =>
      respond(ex, 200, "text/plain",
        Option(ex.getRequestHeaders.getFirst("Authorization")).getOrElse("none")))
    server.createContext("/query", (ex: HttpExchange) =>
      respond(ex, 200, "text/plain", Option(ex.getRequestURI.getRawQuery).getOrElse("")))
    // verb echo: "<METHOD>|<request Content-Type>|<request body>";
    // HEAD answers headers-only (RFC 9110: no response content)
    server.createContext("/echo-verb", (ex: HttpExchange) => {
      val m = ex.getRequestMethod
      if (m == "HEAD") {
        ex.getResponseHeaders.set("Content-Type", "text/plain")
        ex.sendResponseHeaders(200, -1)
        ex.close()
      } else {
        val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        val ct = Option(ex.getRequestHeaders.getFirst("Content-Type")).getOrElse("")
        respond(ex, 200, "text/plain", s"$m|$ct|$body")
      }
    })
    server.createContext("/cd.xml", (ex: HttpExchange) =>
      respond(ex, 200, "application/xml",
        """<catalog>
          |<cd id="1"><title>Alpha</title><price>9.90</price></cd>
          |<cd id="2"><title>Beta</title><price>12.50</price></cd>
          |</catalog>""".stripMargin))
    server.start()
    base = s"http://127.0.0.1:${server.getAddress.getPort}"
  }

  override def afterAll(): Unit = if (server != null) server.stop(0)

  test("get: one row with url/status/content_type/body") {
    val df = Http.get(spark, s"$base/astros.json").toDF
    val r = df.head()
    assert(df.columns.toSeq == Seq("url", "status", "content_type", "body"))
    assert(r.getAs[Int]("status") == 200)
    assert(r.getAs[String]("content_type") == "application/json")
    assert(r.getAs[String]("body").contains("\"craft\":\"ISS\""))
  }

  test("getJsonRows: descent into nested array, reference astros example") {
    val iss = Http.getJsonRows(spark, s"$base/astros.json", descent = Seq("people"))
      .filter(Map("craft" -> "ISS"))
      .toDF
    assert(iss.count() == 2)
    assert(iss.select("name").collect().map(_.getString(0)).sorted.toSeq == Seq("Ann", "Bob"))
  }

  test("getCsvRows: all-string csv ingestion of the response") {
    val df = Http.getCsvRows(spark, s"$base/data.csv").toDF
    assert(df.columns.toSeq == Seq("id", "name"))
    assert(df.count() == 2)
    assert(df.schema.fields.forall(_.dataType.typeName == "string"))
  }

  test("getCsvRows preserves quoted embedded newlines (RFC 4180)") {
    val df = Http.getCsvRows(spark, s"$base/quoted.csv").toDF
    assert(df.count() == 1)
    assert(df.head().getString(1) == "line one\nline two")
  }

  test("429 retry loop honors Retry-After and eventually succeeds") {
    flakyCalls.set(0)
    val r = Http.get(spark, s"$base/flaky").toDF.head()
    assert(r.getAs[Int]("status") == 200)
    assert(r.getAs[String]("body") == "ok")
    assert(flakyCalls.get() == 3) // two 429s then the success
  }

  test("429 Retry-After above the cap fails fast instead of stalling the thread") {
    import spark.implicits._
    // driver path: loud immediate failure (not a 999999999-second park)
    val t0 = System.nanoTime()
    val e = intercept[Throwable](Http.get(spark, s"$base/hostile429").toDF.head())
    val msg = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .flatMap(t => Option(t.getMessage)).mkString(" | ")
    assert(msg.contains("exceeds"), msg)
    assert((System.nanoTime() - t0) / 1e9 < 30.0, "the cap must not sleep")
    // per-row path: the failure lands in the row's error column — the
    // task survives, and rejectNon200 routes it to the side-band
    val rows = Http.requestMany(
      Seq(s"$base/hostile429").toDF("url"), "url").toDF.collect()
    assert(rows(0).isNullAt(rows(0).fieldIndex("status")))
    assert(rows(0).getAs[String]("error").contains("exceeds"))
    assert(Http.requestMany(Seq(s"$base/hostile429").toDF("url"), "url",
      rejectNon200 = true).toDF.count() == 0)
    // a negative Retry-After clamps to zero sleep and still retries
    negCalls.set(0)
    val r = Http.get(spark, s"$base/neg429").toDF.head()
    assert(r.getAs[Int]("status") == 200 && negCalls.get() == 2)
  }

  test("maxRequestsPerSecond paces per-row requests (server-observed gaps)") {
    import spark.implicits._
    stamps.clear()
    // one task, 4 requests at 20 rps -> >= 50ms between request STARTS;
    // loopback latency is sub-ms, so server-arrival gaps track the
    // pacing (assert 40ms for slack). Sleep cannot undershoot.
    val urls = (1 to 4).map(i => (i, s"$base/stamp")).toDF("i", "url")
    assert(Http.requestMany(urls, "url", parallelism = 1,
      maxRequestsPerSecond = 20.0).toDF.count() == 4)
    val ts = stamps.toArray(new Array[java.lang.Long](0)).map(_.longValue()).sorted
    assert(ts.length == 4)
    val gapsMs = ts.sliding(2).map(p => (p(1) - p(0)) / 1e6).toSeq
    assert(gapsMs.forall(_ >= 40.0), s"paced gaps too small: $gapsMs")
    // default stays unpaced: 4 sequential loopback calls land well
    // inside one pacing interval
    stamps.clear()
    assert(Http.requestMany(urls, "url", parallelism = 1).toDF.count() == 4)
    val ts2 = stamps.toArray(new Array[java.lang.Long](0)).map(_.longValue()).sorted
    // generous bound: the paced run above slept >= 150ms BETWEEN
    // arrivals by construction; unpaced loopback arrivals span far
    // less even under suite load
    assert((ts2.last - ts2.head) / 1e6 < 1500.0,
      "unpaced requests must not sleep")
    // loud guard
    intercept[IllegalArgumentException](
      Http.requestMany(urls, "url", maxRequestsPerSecond = -1.0))
  }

  test("rejectNon200: >399 status becomes a RUNTIME_ERROR rejection") {
    val stat = Http.get(spark, s"$base/missing", rejectNon200 = true).go()
    assert(stat.loaded == 0)
    assert(stat.rejections(RejectionCategory.RUNTIME_ERROR) == 1)
    // without the flag the row flows through
    assert(Http.get(spark, s"$base/missing").toDF.head().getAs[Int]("status") == 404)
  }

  test("auth and query helpers set the right request state") {
    val basic = Http.get(spark, s"$base/echo-auth",
      basicAuth = ("user", "secret")).toDF.head().getAs[String]("body")
    assert(basic == "Basic " + java.util.Base64.getEncoder
      .encodeToString("user:secret".getBytes(StandardCharsets.UTF_8)))
    val bearer = Http.get(spark, s"$base/echo-auth",
      bearerToken = "tok123").toDF.head().getAs[String]("body")
    assert(bearer == "Bearer tok123")
    val q = Http.get(spark, s"$base/query",
      query = Map("a" -> "1", "b c" -> "x y")).toDF.head().getAs[String]("body")
    assert(q.contains("a=1") && q.contains("b+c=x+y"))
  }

  test("getMany fans URLs over executors, one row each") {
    val urls = Seq(s"$base/astros.json", s"$base/data.csv", s"$base/missing")
    val df = Http.getMany(spark, urls, parallelism = 3).toDF
    assert(df.count() == 3)
    val byUrl = df.collect().map(r => r.getAs[String]("url") -> r.getAs[Int]("status")).toMap
    assert(byUrl(s"$base/astros.json") == 200)
    assert(byUrl(s"$base/missing") == 404)
  }

  test("post/put ship the body with its Content-Type; delete/head carry no body") {
    // reference verb set, HttpSource.groovy:76-104
    val posted = Http.post(spark, s"$base/echo-verb", """{"k":1}""")
      .toDF.head().getAs[String]("body")
    assert(posted == """POST|application/json|{"k":1}""")
    val put = Http.put(spark, s"$base/echo-verb", "a=1&b=2",
      bodyContentType = "application/x-www-form-urlencoded")
      .toDF.head().getAs[String]("body")
    assert(put == "PUT|application/x-www-form-urlencoded|a=1&b=2")
    // a caller-supplied Content-Type header WINS over the body default
    // (one value on the wire, not two conflicting ones)
    val overridden = Http.post(spark, s"$base/echo-verb", "<x/>",
      headers = Map("Content-Type" -> "text/xml"))
      .toDF.head().getAs[String]("body")
    assert(overridden == "POST|text/xml|<x/>")
    val del = Http.delete(spark, s"$base/echo-verb").toDF.head().getAs[String]("body")
    assert(del == "DELETE||")
    val head = Http.head(spark, s"$base/echo-verb").toDF.head()
    assert(head.getAs[Int]("status") == 200)
    assert(head.getAs[String]("content_type") == "text/plain")
    assert(head.getAs[String]("body") == "")
    // not a verb → loud, before any request goes out
    val e = intercept[IllegalArgumentException](
      Http.request(spark, s"$base/echo-verb", "FROB"))
    assert(e.getMessage.contains("unsupported HTTP verb"))
  }

  test("requestMany/postMany: per-row executor-side calls, pass-through columns, NULL url") {
    import spark.implicits._
    // one POST per row, each with its own body; input columns survive
    val reqs = Seq((1L, s"$base/echo-verb", """{"id":1}"""),
      (2L, s"$base/echo-verb", """{"id":2}"""),
      (3L, null, """{"id":3}"""))
      .toDF("rid", "url", "payload")
    val out = Http.postMany(reqs, "url", "payload").toDF
      .orderBy("rid").collect()
    assert(out.map(_.getAs[Long]("rid")).toSeq == Seq(1L, 2L, 3L))
    assert(out(0).getAs[String]("resp_body") == """POST|application/json|{"id":1}""")
    assert(out(1).getAs[String]("resp_body") == """POST|application/json|{"id":2}""")
    assert(out(0).getAs[Int]("status") == 200)
    // a NULL url row flows through with NULL response columns
    assert(out(2).isNullAt(out(2).fieldIndex("status")) &&
      out(2).isNullAt(out(2).fieldIndex("resp_body")))
    // NULL body on a verb that allows one -> body-less request
    val noBody = Seq((s"$base/echo-verb", null: String)).toDF("url", "payload")
    assert(Http.requestMany(noBody, "url", "PUT", bodyCol = "payload")
      .toDF.head().getAs[String]("resp_body") == "PUT||")
    // rejectNon200 routes error responses to the rejection side-band
    val mixed = Seq(s"$base/echo-verb", s"$base/missing").toDF("url")
    val p = Http.requestMany(mixed, "url", rejectNon200 = true)
    assert(p.toDF.count() == 1)
    // loud guards: response-column collision, unknown verb
    val collide = Seq(("u", 1)).toDF("url", "status")
    intercept[IllegalArgumentException](Http.requestMany(collide, "url"))
    intercept[IllegalArgumentException](
      Http.requestMany(mixed, "url", verb = "FROB"))
    // a transport failure (dead endpoint) is captured on ITS row, not
    // thrown — one unreachable URL among millions must not kill the job
    val dead = Seq((s"$base/echo-verb", "live"), ("http://127.0.0.1:1/x", "dead"))
      .toDF("url", "tag")
    val rows = Http.requestMany(dead, "url").toDF.orderBy("tag").collect()
    assert(rows(1).getAs[String]("tag") == "live" &&
      rows(1).getAs[Int]("status") == 200 &&
      rows(1).isNullAt(rows(1).fieldIndex("error")))
    assert(rows(0).getAs[String]("tag") == "dead" &&
      rows(0).isNullAt(rows(0).fieldIndex("status")) &&
      rows(0).getAs[String]("error").nonEmpty)
    // rejectNon200 sends transport failures to the side-band too
    assert(Http.requestMany(dead, "url", rejectNon200 = true).toDF.count() == 1)
  }

  test("getXmlRows: one row per rowTag element, attributes as _attr columns") {
    // reference OkHttpSource.groovy:229-232 — xml Content-Type parsed
    val df = Http.getXmlRows(spark, s"$base/cd.xml", rowTag = "cd").toDF
    assert(df.count() == 2)
    val byId = df.collect().map(r =>
      r.getAs[Long]("_id") -> r.getAs[String]("title")).toMap
    assert(byId == Map(1L -> "Alpha", 2L -> "Beta"))
  }

  test("xmlRecords: depth-tracked rowTag split on generated documents (seeded fuzz)") {
    // the splitter is a hand-rolled scanner — verify it against 300
    // generated documents covering nested same-name tags, self-closing
    // records, attributes, tag-name-prefix decoys (<cdx>), comments and
    // whitespace filler. Expected output = exactly the record strings
    // the generator planted, in order.
    val rnd = new scala.util.Random(42)
    for (round <- 0 until 300) {
      val n = rnd.nextInt(6)
      val recs = (0 until n).map { i =>
        val attrs = if (rnd.nextBoolean()) s""" id="$i" x="y"""" else ""
        if (rnd.nextInt(5) == 0) s"<cd$attrs/>"
        else rnd.nextInt(6) match {
          case 0 => s"<cd$attrs><title>t$i</title></cd>"
          case 1 => s"<cd$attrs><cd><title>nested$i</title></cd></cd>"
          case 2 => s"<cd$attrs>text $i <other>x</other></cd>"
          case 3 => s"<cd$attrs><cd/><cd><cd>deep</cd></cd></cd>"
          case 4 => s"<cd$attrs><![CDATA[ raw </cd> <cd x> $i ]]></cd>"
          case 5 => s"<cd$attrs>a<!-- </cd> <cd>ghost</cd> -->b$i</cd>"
        }
      }
      val fillers = Seq("", "\n  ", "<!-- note -->", "<meta>m</meta>",
        "<cdx>decoy</cdx>", "plain text",
        "<!-- <cd>ghost</cd> -->", "<![CDATA[ </cd> <cd> ]]>")
      def filler() = fillers(rnd.nextInt(fillers.length))
      val body = "<catalog>" + filler() +
        recs.map(_ + filler()).mkString + "</catalog>"
      val got = graft.sources.Http.xmlRecords(body, "cd")
      assert(got == recs, s"round $round:\n$body\ngot $got\nwant $recs")
    }
    // quote-aware tag ends: '>' and '/>' inside attribute values are
    // data, not the tag terminator; a close-tag spelling inside an
    // attribute is skipped with the rest of the open tag
    assert(graft.sources.Http.xmlRecords(
      """<r><cd note="a/>b"><t>x</t></cd></r>""", "cd") ==
      Seq("""<cd note="a/>b"><t>x</t></cd>"""))
    assert(graft.sources.Http.xmlRecords(
      """<r><cd a="</cd>">x</cd><cd b='>'/></r>""", "cd") ==
      Seq("""<cd a="</cd>">x</cd>""", """<cd b='>'/>"""))
    // legal ETag whitespace: '</cd >' (and newline forms) still close
    // the record; a longer tag name ('</cdx>') still does not
    assert(graft.sources.Http.xmlRecords(
      "<r><cd><t>x</t></cd ></r>", "cd") == Seq("<cd><t>x</t></cd >"))
    assert(graft.sources.Http.xmlRecords(
      "<r><cd>x</cd\n\t></r>", "cd") == Seq("<cd>x</cd\n\t>"))
    assert(graft.sources.Http.xmlRecords(
      "<r><cd><cd>n</cd ></cd\t></r>", "cd") ==
      Seq("<cd><cd>n</cd ></cd\t>"))
    assert(graft.sources.Http.xmlRecords(
      "<r><cdx>decoy</cdx><cd>x</cd></r>", "cd") == Seq("<cd>x</cd>"))
    // comments and CDATA are opaque to the tag scan: a commented-out
    // record is not emitted, and a literal <cd>/</cd> inside either
    // section neither opens nor closes a record — but the section's
    // bytes stay inside the emitted snippet when within a record
    assert(graft.sources.Http.xmlRecords(
      "<r><!-- <cd>ghost</cd> --><cd>x</cd></r>", "cd") == Seq("<cd>x</cd>"))
    assert(graft.sources.Http.xmlRecords(
      "<r><cd>a<!-- </cd> -->b</cd></r>", "cd") ==
      Seq("<cd>a<!-- </cd> -->b</cd>"))
    assert(graft.sources.Http.xmlRecords(
      "<r><cd><![CDATA[ </cd><cd> ]]></cd></r>", "cd") ==
      Seq("<cd><![CDATA[ </cd><cd> ]]></cd>"))
    // unterminated comment/CDATA: the rest of the body is the
    // section's content — records already closed stay emitted, a
    // record left open is dropped (never a mis-split)
    assert(graft.sources.Http.xmlRecords(
      "<r><cd>x</cd><!-- oops <cd>y</cd>", "cd") == Seq("<cd>x</cd>"))
    assert(graft.sources.Http.xmlRecords(
      "<r><cd>x</cd><![CDATA[ oops <cd>y</cd>", "cd") == Seq("<cd>x</cd>"))
  }

  test("getRows dispatches on response Content-Type (json/xml/csv/raw)") {
    val json = Http.getRows(spark, s"$base/astros.json").toDF
    assert(json.columns.contains("people"))
    val xml = Http.getRows(spark, s"$base/cd.xml", rowTag = "cd").toDF
    assert(xml.count() == 2)
    val csv = Http.getRows(spark, s"$base/data.csv").toDF
    assert(csv.columns.toSeq == Seq("id", "name") && csv.count() == 2)
    val raw = Http.getRows(spark, s"$base/echo-auth").toDF
    assert(raw.columns.toSeq == Seq("url", "status", "content_type", "body"))
    // xml without a rowTag cannot be relationalized — loud
    val e = intercept[IllegalArgumentException](Http.getRows(spark, s"$base/cd.xml"))
    assert(e.getMessage.contains("rowTag"))
  }
}
