package graft.sources

import graft.etl.{Pipeline, RejectionCategory}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Row, SparkSession}

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration
import java.util.Base64

/** HTTP source (reference `OkHttpSource.groovy:44-249` /
  * `HttpSource.groovy`), on the JDK's own `java.net.http.HttpClient` —
  * the reference's OkHttp dependency is absent in this environment and
  * unnecessary.
  *
  * Reference semantics carried over:
  *  - one fetch produces ONE row `{url, status, content_type, body}`
  *    (the reference's `[url, response, body, status]` row,
  *    `OkHttpSource.groovy:225`); content-type-aware parsing into
  *    ROWS is the [[getJsonRows]]/[[getCsvRows]] helpers — the
  *    DataFrame equivalent of the reference attaching a parsed `json`
  *    object to the row;
  *  - 429 responses honor `Retry-After` (seconds) and retry up to
  *    `maxRetries` times (`OkHttpSource.groovy:206-248`,
  *    MAX_RETRIES=5);
  *  - `rejectNon200` turns a >399 status into a RUNTIME_ERROR
  *    rejection instead of a flowing row (`:216-219`);
  *  - basic / bearer auth and query-parameter helpers
  *    (`OkHttpBuilder.authBasic/authToken/query`, `:85-124`).
  *
  * Scale design: [[get]] fetches lazily on the driver at source
  * evaluation (one URL, one row — the reference's shape, memoized so
  * go()'s multiple traversals fetch once). [[getMany]] is the
  * cluster-scale path: URLs fan out over executors and each partition
  * fetches with its own client — bulk ingestion from an API that a
  * single-node loop cannot saturate.
  */
object Http {

  val MaxRetries = 5

  /** Longest 429 `Retry-After` honored before the fetch is treated as
    * a transport failure — the retry loop runs inside executor tasks
    * via [[requestMany]], so an unbounded server-controlled sleep is
    * an unbounded task stall. */
  val MaxRetryAfterSeconds = 60L

  private[sources] val responseSchema = StructType(Seq(
    StructField("url", StringType),
    StructField("status", IntegerType),
    StructField("content_type", StringType),
    StructField("body", StringType)))

  /** The reference's verb set (`HttpSource.groovy:76-104`: get, post,
    * delete, put, head). Anything else is a caller bug — fail loudly
    * rather than let the JDK client throw a less-specific error. */
  private val Verbs = Set("GET", "POST", "PUT", "DELETE", "HEAD", "PATCH")

  /** Driver-side single fetch (memoized) as a one-row Pipeline —
    * any verb. `body` is sent for POST/PUT/PATCH/DELETE (the JDK
    * client accepts a body on any method; HEAD/GET default to none);
    * `bodyContentType` sets the request Content-Type when a body is
    * present. A HEAD response row has `body = ""` (RFC 9110: no
    * response content) but keeps url/status/content_type. */
  def request(
      spark: SparkSession, url: String, verb: String,
      body: String = null,
      bodyContentType: String = "application/json",
      headers: Map[String, String] = Map.empty,
      query: Map[String, String] = Map.empty,
      basicAuth: (String, String) = null,
      bearerToken: String = null,
      maxRetries: Int = MaxRetries,
      rejectNon200: Boolean = false): Pipeline = {
    val v = verb.toUpperCase
    require(Verbs.contains(v), s"unsupported HTTP verb '$verb' (one of ${Verbs.mkString(", ")})")
    lazy val row = fetch(url, headers, query, Option(basicAuth),
      Option(bearerToken), maxRetries, v, Option(body), bodyContentType)
    val p = Pipeline.of(s"http:$v($url)", {
      spark.createDataFrame(
        java.util.List.of(Row(row._1, row._2, row._3, row._4)), responseSchema)
    })
    withStatusPolicy(p, rejectNon200)
  }

  /** Driver-side single fetch (memoized) as a one-row Pipeline. */
  def get(
      spark: SparkSession, url: String,
      headers: Map[String, String] = Map.empty,
      query: Map[String, String] = Map.empty,
      basicAuth: (String, String) = null,
      bearerToken: String = null,
      maxRetries: Int = MaxRetries,
      rejectNon200: Boolean = false): Pipeline =
    request(spark, url, "GET", null, null, headers, query, basicAuth,
      bearerToken, maxRetries, rejectNon200)

  /** POST `body` (reference `HttpSource.groovy:82-86`). */
  def post(
      spark: SparkSession, url: String, body: String,
      bodyContentType: String = "application/json",
      headers: Map[String, String] = Map.empty,
      query: Map[String, String] = Map.empty,
      basicAuth: (String, String) = null,
      bearerToken: String = null,
      maxRetries: Int = MaxRetries,
      rejectNon200: Boolean = false): Pipeline =
    request(spark, url, "POST", body, bodyContentType, headers, query,
      basicAuth, bearerToken, maxRetries, rejectNon200)

  /** PUT `body` (reference `HttpSource.groovy:94-98`). */
  def put(
      spark: SparkSession, url: String, body: String,
      bodyContentType: String = "application/json",
      headers: Map[String, String] = Map.empty,
      query: Map[String, String] = Map.empty,
      basicAuth: (String, String) = null,
      bearerToken: String = null,
      maxRetries: Int = MaxRetries,
      rejectNon200: Boolean = false): Pipeline =
    request(spark, url, "PUT", body, bodyContentType, headers, query,
      basicAuth, bearerToken, maxRetries, rejectNon200)

  /** DELETE (reference `HttpSource.groovy:88-92`). */
  def delete(
      spark: SparkSession, url: String,
      headers: Map[String, String] = Map.empty,
      query: Map[String, String] = Map.empty,
      basicAuth: (String, String) = null,
      bearerToken: String = null,
      maxRetries: Int = MaxRetries,
      rejectNon200: Boolean = false): Pipeline =
    request(spark, url, "DELETE", null, null, headers, query, basicAuth,
      bearerToken, maxRetries, rejectNon200)

  /** HEAD — status/headers only, empty body column
    * (reference `HttpSource.groovy:100-104`). */
  def head(
      spark: SparkSession, url: String,
      headers: Map[String, String] = Map.empty,
      query: Map[String, String] = Map.empty,
      basicAuth: (String, String) = null,
      bearerToken: String = null,
      maxRetries: Int = MaxRetries,
      rejectNon200: Boolean = false): Pipeline =
    request(spark, url, "HEAD", null, null, headers, query, basicAuth,
      bearerToken, maxRetries, rejectNon200)

  /** Executor-side fan-out fetch: one row per URL. `parallelism` caps
    * concurrent partitions (and therefore concurrent connections). */
  def getMany(
      spark: SparkSession, urls: Seq[String],
      headers: Map[String, String] = Map.empty,
      basicAuth: (String, String) = null,
      bearerToken: String = null,
      maxRetries: Int = MaxRetries,
      parallelism: Int = 8,
      rejectNon200: Boolean = false): Pipeline = {
    val hdrs = headers
    val auth = Option(basicAuth)
    val tok = Option(bearerToken)
    val retries = maxRetries
    val n = math.max(1, math.min(parallelism, urls.size))
    import spark.implicits._
    val df = spark.createDataset(urls).repartition(n)
      .mapPartitions(_.map { u =>
        val r = fetch(u, hdrs, Map.empty, auth, tok, retries)
        Row(r._1, r._2, r._3, r._4)
      })(org.apache.spark.sql.Encoders.row(responseSchema))
    withStatusPolicy(Pipeline.of(s"http(${urls.size} urls)", df), rejectNon200)
  }

  /** Executor-side per-row HTTP call over a DATAFRAME of requests —
    * the cluster-scale shape of calling an annotation / inference /
    * enrichment endpoint from a pipeline: the request list is itself a
    * distributed table ([[getMany]]'s driver-side `Seq[String]` cannot
    * hold it). Appends `status` / `content_type` / `resp_body` to
    * every input row (all input columns pass through, so the response
    * joins its request with no key bookkeeping). A NULL url row passes
    * through with NULL response columns (no request goes out) — callers
    * reject or default upstream.
    *
    * `bodyCol` (nullable per row) supplies the request body for
    * POST/PUT/PATCH/DELETE; `bodyContentType` labels it. Concurrency =
    * `parallelism` tasks (a `coalesce` cap, so an over-partitioned
    * input cannot open thousands of connections at once); within a
    * task requests run sequentially over the JVM-shared pooled client,
    * and the 429 Retry-After loop applies per request (honored sleeps
    * capped at [[MaxRetryAfterSeconds]]; above the cap the row fails
    * into `error`). `maxRequestsPerSecond` > 0 adds PROACTIVE pacing —
    * the global rate split evenly across the `parallelism` tasks — so
    * an API-bound pipeline stays under its quota instead of bouncing
    * off the reactive 429 loop. `rejectNon200` routes error responses
    * to the rejection side-band like every other Http entry.
    *
    * Transport failures (unreachable host, timeout, TLS) are captured
    * PER ROW — NULL status/content_type/resp_body plus the exception
    * in the `error` column — never thrown: at fleet scale one dead URL
    * among millions must not kill the job on its fourth task retry.
    * `rejectNon200` treats a NULL status as a rejection too, so the
    * side-band collects both error responses and transport failures. */
  def requestMany(
      df: org.apache.spark.sql.DataFrame, urlCol: String,
      verb: String = "GET", bodyCol: String = null,
      bodyContentType: String = "application/json",
      headers: Map[String, String] = Map.empty,
      basicAuth: (String, String) = null,
      bearerToken: String = null,
      maxRetries: Int = MaxRetries,
      parallelism: Int = 32,
      rejectNon200: Boolean = false,
      maxRequestsPerSecond: Double = 0.0): Pipeline = {
    val v = verb.toUpperCase
    require(Verbs.contains(v), s"unsupported HTTP verb '$verb' (one of ${Verbs.mkString(", ")})")
    require(parallelism >= 1, s"parallelism must be >= 1, got $parallelism")
    require(!maxRequestsPerSecond.isNaN && maxRequestsPerSecond >= 0.0,
      s"maxRequestsPerSecond must be >= 0 (0 = unpaced), got $maxRequestsPerSecond")
    Seq("status", "content_type", "resp_body", "error").foreach(c =>
      require(!df.columns.contains(c), s"input already has a column named $c"))
    val urlIdx = df.schema.fieldIndex(urlCol)
    val bodyIdx = Option(bodyCol).map(df.schema.fieldIndex)
    val hdrs = headers
    val auth = Option(basicAuth)
    val tok = Option(bearerToken)
    val retries = maxRetries
    val bct = bodyContentType
    val outSchema = df.schema
      .add("status", IntegerType).add("content_type", StringType)
      .add("resp_body", StringType).add("error", StringType)
    // PROACTIVE pacing (the 429 loop is reactive — an API-bound
    // pipeline wants to stay under the quota, not bounce off it):
    // the global rate divides evenly across the `parallelism` tasks,
    // each of which paces its sequential requests to one per
    // `parallelism / maxRps` seconds. Per-task division needs no
    // cross-executor coordination and is exact when every task has
    // work (the repartition below round-robins rows, so task loads
    // differ by at most one row); partial tasks only UNDERshoot.
    val minIntervalNanos: Long =
      if (maxRequestsPerSecond <= 0.0) 0L
      else math.max(1L, (parallelism.toDouble / maxRequestsPerSecond * 1e9).toLong)
    // repartition, NOT coalesce: coalesce propagates its partition
    // count up the plan with no shuffle barrier, so it would throttle
    // an expensive upstream transform to `parallelism` tasks on the
    // whole cluster. The round-robin exchange moves only the (small)
    // url/body rows and caps concurrent connections without
    // strangling upstream parallelism; nothing downstream supersedes
    // it (mapPartitions follows directly), so Catalyst keeps it.
    val out = df.repartition(parallelism).mapPartitions { it =>
      var nextAllowedAt = 0L // per-task; first request never waits
      it.map { r =>
        if (r.isNullAt(urlIdx))
          Row.fromSeq(r.toSeq ++ Seq(null, null, null, null))
        else {
          val body = bodyIdx.filterNot(r.isNullAt).map(r.getString)
          try {
            if (minIntervalNanos > 0L) {
              val now = System.nanoTime()
              if (now < nextAllowedAt) {
                val waitNanos = nextAllowedAt - now
                Thread.sleep(waitNanos / 1000000L, (waitNanos % 1000000L).toInt)
              }
              // schedule from the POST-sleep clock: if the scheduler
              // overslept this slot, the lost time must not be "repaid"
              // by a catch-up burst — consecutive request STARTS stay
              // >= minInterval apart (a 429-sensitive endpoint sees the
              // instantaneous gap, not the long-run average), at the
              // cost of averaging slightly UNDER the requested rate
              nextAllowedAt = math.max(System.nanoTime(), nextAllowedAt) +
                minIntervalNanos
            }
            val resp = fetch(r.getString(urlIdx), hdrs, Map.empty, auth,
              tok, retries, v, body, bct)
            Row.fromSeq(r.toSeq ++ Seq(resp._2, resp._3, resp._4, null))
          } catch {
            case scala.util.control.NonFatal(e) =>
              Row.fromSeq(r.toSeq ++ Seq(null, null, null,
                s"${e.getClass.getSimpleName}: ${e.getMessage}"))
          }
        }
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
    // NULL-status (transport failure) must reject alongside >399: the
    // plain <= comparison's NULL would silently DROP instead of reject
    val p = Pipeline.of(s"http:$v(rows)", out)
    if (!rejectNon200) p
    else p.filter("http-status",
      col("status").isNotNull && col("status") <= 399,
      RejectionCategory.RUNTIME_ERROR,
      "Non-2xx/3xx HTTP response or transport failure")
  }

  /** [[requestMany]] with verb POST — one POSTed `bodyCol` per row. */
  def postMany(
      df: org.apache.spark.sql.DataFrame, urlCol: String, bodyCol: String,
      bodyContentType: String = "application/json",
      headers: Map[String, String] = Map.empty,
      basicAuth: (String, String) = null,
      bearerToken: String = null,
      maxRetries: Int = MaxRetries,
      parallelism: Int = 32,
      rejectNon200: Boolean = false,
      maxRequestsPerSecond: Double = 0.0): Pipeline =
    requestMany(df, urlCol, "POST", bodyCol, bodyContentType, headers,
      basicAuth, bearerToken, maxRetries, parallelism, rejectNon200,
      maxRequestsPerSecond)

  /** Fetch + parse a JSON response body into rows (the reference's
    * `json` column, relationalized): top-level arrays become one row
    * per element; `descent`/`includeRoot` behave as in
    * [[Sources.json]]. */
  def getJsonRows(
      spark: SparkSession, url: String,
      headers: Map[String, String] = Map.empty,
      query: Map[String, String] = Map.empty,
      basicAuth: (String, String) = null,
      bearerToken: String = null,
      maxRetries: Int = MaxRetries,
      descent: Seq[String] = Nil,
      includeRoot: Boolean = false): Pipeline = {
    val body = fetch(url, headers, query, Option(basicAuth), Option(bearerToken), maxRetries)._4
    import spark.implicits._
    val root = spark.read.json(spark.createDataset(Seq(body)))
    Pipeline.of(s"httpJson($url)", Sources.descend(root, descent, includeRoot))
  }

  /** Fetch + parse a CSV response body into all-string rows
    * ([[Sources.csv]] semantics over the response). The body is split
    * into RFC-4180 records with a quote-aware scan (a newline inside a
    * double-quoted field is data, not a record boundary) and parsed
    * through Spark's csv-over-Dataset reader — no driver-local temp
    * file, so the source works on real clusters where executors cannot
    * see the driver's filesystem. */
  def getCsvRows(
      spark: SparkSession, url: String,
      headers: Map[String, String] = Map.empty,
      query: Map[String, String] = Map.empty,
      basicAuth: (String, String) = null,
      bearerToken: String = null,
      maxRetries: Int = MaxRetries,
      separator: String = ",",
      csvHeaders: Seq[String] = null): Pipeline = {
    val body = fetch(url, headers, query, Option(basicAuth), Option(bearerToken), maxRetries)._4
    Pipeline.of(s"httpCsv($url)", csvBodyRows(spark, body, separator, csvHeaders))
  }

  /** CSV response body → all-string rows ([[getCsvRows]]' parse,
    * public so a verb response's `body` column can be relationalized
    * the same way — e.g. a POST whose reply is CSV). */
  def csvBodyRows(
      spark: SparkSession, body: String,
      separator: String = ",", csvHeaders: Seq[String] = null) = {
    import spark.implicits._
    val records = spark.createDataset(csvRecords(body))
    val df = spark.read
      .option("sep", separator)
      .option("header", csvHeaders == null)
      .option("inferSchema", false)
      .option("mode", "PERMISSIVE")
      .csv(records)
    if (csvHeaders == null) df else df.toDF(csvHeaders: _*)
  }

  /** Fetch + parse an XML response body into rows — the reference's
    * `xml` parsed column (`OkHttpSource.groovy:229-232`: Content-Type
    * application/xml or text/xml → XmlSlurper object), relationalized
    * the way [[getJsonRows]] relationalizes the `json` column: one row
    * per `rowTag` element via Spark 4's native XML reader over an
    * in-memory Dataset (no driver temp file; attributes surface as
    * `_attr` columns, nested elements as struct columns). */
  def getXmlRows(
      spark: SparkSession, url: String, rowTag: String,
      headers: Map[String, String] = Map.empty,
      query: Map[String, String] = Map.empty,
      basicAuth: (String, String) = null,
      bearerToken: String = null,
      maxRetries: Int = MaxRetries): Pipeline = {
    val body = fetch(url, headers, query, Option(basicAuth), Option(bearerToken), maxRetries)._4
    Pipeline.of(s"httpXml($url)", xmlBodyRows(spark, body, rowTag))
  }

  /** The XML-over-Dataset reader parses each dataset element as ONE
    * record, so the body is pre-split into per-`rowTag` element
    * snippets (depth-tracked for nested same-name tags, self-closing
    * handled) — the XML analog of [[csvRecords]]; no driver temp file. */
  private def xmlBodyRows(
      spark: SparkSession, body: String, rowTag: String) = {
    import spark.implicits._
    spark.read.option("rowTag", rowTag)
      .xml(spark.createDataset(xmlRecords(body, rowTag)))
  }

  /** Extracts every top-level `<tag ...>...</tag>` (or `<tag ... />`)
    * occurrence from an XML document as its own string. A scanner, not
    * a parser: tracks nesting depth of `tag` only, which is exactly
    * what splitting on a row tag needs. Attribute values are
    * quote-skipped (a `>` or `/>` inside `attr="a/>b"` is data, not
    * the tag end); `<!--...-->` comments and `<![CDATA[...]]>`
    * sections are skipped whole (a literal `<tag`/`</tag>` inside
    * them is data — their bytes still land in the emitted snippet
    * when they sit inside a record, where Spark's XML reader handles
    * them for real). Element TEXT containing a literal `<tag` or
    * `</tag>` remains the documented limitation (that spelling is
    * not well-formed XML — `<` in text must be `&lt;`). */
  private[sources] def xmlRecords(body: String, tag: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val open = s"<$tag"
    val closePrefix = s"</$tag"
    // index of the open tag's terminating '>', quote-aware
    def tagEnd(from: Int): Int = {
      var j = from
      var quote: Char = 0
      while (j < body.length) {
        val ch = body.charAt(j)
        if (quote != 0) { if (ch == quote) quote = 0 }
        else if (ch == '"' || ch == '\'') quote = ch
        else if (ch == '>') return j
        j += 1
      }
      -1
    }
    // index AFTER a close tag starting at `from`, or -1 if `from` is
    // not this tag's close. XML ETag syntax allows whitespace before
    // the '>' ('</cd >' is legal), so skip it — but nothing else: a
    // longer name ('</cdx>') must not match
    def closeEnd(from: Int): Int = {
      var j = from + closePrefix.length
      while (j < body.length && " \t\r\n".indexOf(body.charAt(j)) >= 0) j += 1
      if (j < body.length && body.charAt(j) == '>') j + 1 else -1
    }
    var i = 0
    var start = -1
    var depth = 0
    while (i < body.length) {
      if (body.startsWith("<!--", i)) {
        // comment: opaque to the tag scan; unterminated → rest is comment
        val e = body.indexOf("-->", i + 4)
        i = if (e >= 0) e + 3 else body.length
      } else if (body.startsWith("<![CDATA[", i)) {
        // CDATA: opaque to the tag scan; unterminated → rest is data
        val e = body.indexOf("]]>", i + 9)
        i = if (e >= 0) e + 3 else body.length
      } else if (body.startsWith(open, i) &&
          (i + open.length >= body.length ||
            " \t\r\n>/".indexOf(body.charAt(i + open.length)) >= 0)) {
        if (depth == 0) start = i
        // self-closing at this level does not change depth
        val end = tagEnd(i)
        val selfClosing = end > 0 && body.charAt(end - 1) == '/'
        if (selfClosing && depth == 0) { out += body.substring(i, end + 1); start = -1 }
        else if (!selfClosing) depth += 1
        i = if (end > 0) end + 1 else body.length
      } else if (depth > 0 && body.startsWith(closePrefix, i) && closeEnd(i) > 0) {
        depth -= 1
        i = closeEnd(i)
        if (depth == 0 && start >= 0) { out += body.substring(start, i); start = -1 }
      } else i += 1
    }
    out.result()
  }

  /** Content-type-driven parse dispatch — the reference's switch on
    * `Content-Type` (`OkHttpSource.groovy:229-238`): JSON → one row
    * per element ([[getJsonRows]] shape), XML → one row per `rowTag`
    * ([[getXmlRows]]; `rowTag` required to relationalize), CSV →
    * [[getCsvRows]] shape, anything else → the single raw
    * `{url, status, content_type, body}` row. One fetch. */
  def getRows(
      spark: SparkSession, url: String,
      rowTag: String = null,
      headers: Map[String, String] = Map.empty,
      query: Map[String, String] = Map.empty,
      basicAuth: (String, String) = null,
      bearerToken: String = null,
      maxRetries: Int = MaxRetries): Pipeline = {
    val r = fetch(url, headers, query, Option(basicAuth), Option(bearerToken), maxRetries)
    val (fullUrl, status, contentType, body) = r
    import spark.implicits._
    // fetch() already strips "; charset=..." parameters; MIME types
    // are additionally case-insensitive (RFC 2045 §5.1), so a server
    // sending "Application/JSON" still hits the JSON branch
    val mime = Option(contentType).map(_.toLowerCase).orNull
    mime match {
      case "application/json" | "text/json" =>
        val root = spark.read.json(spark.createDataset(Seq(body)))
        Pipeline.of(s"httpRows($url)", Sources.descend(root, Nil, includeRoot = false))
      case "application/xml" | "text/xml" =>
        require(rowTag != null,
          s"$url returned $contentType — pass rowTag to relationalize XML")
        Pipeline.of(s"httpRows($url)", xmlBodyRows(spark, body, rowTag))
      case "text/csv" =>
        Pipeline.of(s"httpRows($url)", csvBodyRows(spark, body))
      case _ =>
        Pipeline.of(s"httpRows($url)", spark.createDataFrame(
          java.util.List.of(Row(fullUrl, status, contentType, body)),
          responseSchema))
    }
  }

  /** RFC-4180 record split: newlines inside double-quoted fields stay
    * in the field ("" self-escapes, toggling the state twice). */
  private[sources] def csvRecords(body: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inQuotes = false
    var i = 0
    while (i < body.length) {
      body.charAt(i) match {
        case '"' => inQuotes = !inQuotes; cur.append('"')
        case '\r' if !inQuotes &&
            i + 1 < body.length && body.charAt(i + 1) == '\n' =>
          out += cur.result(); cur.clear(); i += 1
        case '\n' | '\r' if !inQuotes =>
          out += cur.result(); cur.clear()
        case c => cur.append(c)
      }
      i += 1
    }
    if (cur.nonEmpty) out += cur.result()
    out.result()
  }

  private def withStatusPolicy(p: Pipeline, rejectNon200: Boolean): Pipeline =
    if (!rejectNon200) p
    else p.filter("http-status", col("status") <= 399,
      RejectionCategory.RUNTIME_ERROR, "Non-2xx/3xx HTTP response")

  /** One shared client (connection reuse across fetches; HttpClient is
    * thread-safe, and on executors every task in the JVM reuses it). */
  @transient private lazy val client = HttpClient.newBuilder()
    .followRedirects(HttpClient.Redirect.NORMAL)
    .connectTimeout(Duration.ofSeconds(30))
    .build()

  /** (url, status, contentType, body) after the 429 retry loop. */
  private def fetch(
      url: String,
      headers: Map[String, String],
      query: Map[String, String],
      basicAuth: Option[(String, String)],
      bearerToken: Option[String],
      maxRetries: Int,
      verb: String = "GET",
      body: Option[String] = None,
      bodyContentType: String = "application/json"): (String, Int, String, String) = {
    require(maxRetries > 0, "maxRetries must be at least 1 (the first attempt)")
    require(basicAuth.isEmpty || bearerToken.isEmpty,
      "pass either basicAuth or bearerToken, not both (one Authorization header)")
    val fullUrl =
      if (query.isEmpty) url
      else {
        val sep = if (url.contains("?")) "&" else "?"
        url + sep + query.map { case (k, v) =>
          java.net.URLEncoder.encode(k, StandardCharsets.UTF_8) + "=" +
            java.net.URLEncoder.encode(v, StandardCharsets.UTF_8)
        }.mkString("&")
      }
    val publisher = body
      .map(b => HttpRequest.BodyPublishers.ofString(b, StandardCharsets.UTF_8))
      .getOrElse(HttpRequest.BodyPublishers.noBody())
    val builder = HttpRequest.newBuilder(URI.create(fullUrl)).method(verb, publisher)
    // the default body Content-Type must not FIGHT a caller-supplied
    // one: builder.header() appends (two conflicting values on the
    // wire); an explicit headers entry wins, the default fills in
    if (body.isDefined && !headers.keysIterator.exists(_.equalsIgnoreCase("Content-Type")))
      builder.header("Content-Type", bodyContentType)
    headers.foreach { case (k, v) => builder.header(k, v) }
    basicAuth.foreach { case (u, pw) =>
      builder.header("Authorization", "Basic " + Base64.getEncoder
        .encodeToString(s"$u:$pw".getBytes(StandardCharsets.UTF_8)))
    }
    bearerToken.foreach(t => builder.header("Authorization", s"Bearer $t"))
    val request = builder.build()

    var attempts = maxRetries
    var response: HttpResponse[String] = null
    var done = false
    while (!done && attempts > 0) {
      response = client.send(request, HttpResponse.BodyHandlers.ofString())
      attempts -= 1
      if (response.statusCode == 429 && attempts > 0) {
        // reference behavior: wait Retry-After seconds then retry.
        // RFC 7231 also allows an HTTP-date here — fall back to 1s
        // rather than crash the fetch on a non-numeric value.
        val retryAfter = scala.util.Try(
          response.headers.firstValue("Retry-After").orElse("1").toLong).getOrElse(1L)
        // honored sleep is CAPPED: requestMany runs this loop inside
        // executor tasks, where one hostile/misconfigured server
        // answering 'Retry-After: 86400' would park a task for a day
        // (× maxRetries) before the row even reached its error
        // capture. Above the cap → fail the fetch (per-row paths
        // catch it into the error column; driver paths fail loudly
        // instead of silently stalling)
        if (retryAfter > MaxRetryAfterSeconds)
          throw new RuntimeException(
            s"HTTP 429 with Retry-After ${retryAfter}s exceeds the " +
              s"${MaxRetryAfterSeconds}s cap — treating as a transport failure")
        Thread.sleep(math.max(0L, retryAfter) * 1000L)
      } else done = true
    }
    val ct = response.headers.firstValue("Content-Type").orElse(null)
    val contentType = if (ct == null) null else ct.split(";")(0).trim
    (fullUrl, response.statusCode, contentType, response.body)
  }
}
