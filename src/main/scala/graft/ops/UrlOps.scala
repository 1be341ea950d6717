package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization for web-corpus pipelines — the standard FIRST
  * dedup key (CCNet / RefinedWeb dedupe by normalized URL before any
  * content hashing): host extraction, registered-domain grouping, and
  * tracking-parameter-stripping normalization.
  *
  * All pure codegen'd Column expressions over engine-portable regexes
  * (no lookaround, no backrefs in patterns — replacement strings are
  * engine-local anyway), so the same canonical form is reproducible by
  * whatever audits the corpus, and the DuckDB oracle checks it
  * bit-for-bit. No UDFs, no shuffle: at 100 TB this is scan-time work.
  */
object UrlOps {

  /** The host-extraction regex behind [[extractDomain]]. Public for
    * the same one-source-of-truth reason as
    * [[registeredDomainPattern]]: the DuckDB oracles embed this exact
    * string. */
  val hostPattern: String =
    "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#]*@)?([^/:?#]+)"

  /** Lowercased host of an absolute URL: scheme and optional userinfo
    * stripped, cut at the first `/`, `:`, `?` or `#`. The userinfo
    * group is greedy over non-delimiters, so the LAST `@` of the
    * authority delimits the host (RFC 3986 — credentials may contain
    * unencoded `@` in the wild), matching [[normalizeUrl]]'s rule.
    * NULL-safe; a schemeless string yields an empty string (loud, not
    * a guess). */
  def extractDomain(u: Column): Column =
    lower(regexp_extract(u, hostPattern, 1))

  /** Multi-label public suffixes recognized by [[registeredDomain]].
    * Deliberately a SMALL embedded set of the most common two-label
    * suffixes, not the full Public Suffix List (no egress here; real
    * deployments can regenerate the regex from the PSL — the operator
    * shape does not change). */
  val multiPartSuffixes: Seq[String] = Seq(
    "co.uk", "ac.uk", "gov.uk", "org.uk", "com.au", "net.au", "co.jp",
    "com.br", "co.in", "com.cn", "com.mx", "co.za", "com.ar", "com.tr")

  /** The extraction regex behind [[registeredDomain]]. Public because
    * the DuckDB oracle embeds the SAME pattern string — one source of
    * truth, like `Sampling.hexThreshold`. */
  val registeredDomainPattern: String = {
    val alts = multiPartSuffixes.map(_.replace(".", "\\.")).mkString("|")
    s"([^.]+\\.(?:$alts)|[^.]+\\.[^.]+)$$"
  }

  /** Registered domain (eTLD+1 approximation) of a host: the last two
    * labels, or three when the trailing two are a known multi-label
    * suffix ([[multiPartSuffixes]]). A single-label host (localhost)
    * falls back to itself. Grouping key for per-site statistics, crawl
    * budgets, and domain-level filtering. */
  def registeredDomain(host: Column): Column = {
    val m = regexp_extract(host, registeredDomainPattern, 1)
    when(host.isNull, lit(null).cast("string"))
      .otherwise(when(m === "", host).otherwise(m))
  }

  /** Tracking query parameters stripped by [[normalizeUrl]]. The
    * leading `[?&]` boundary is CAPTURED and re-emitted by the
    * replacement (engine-local: `$1` on Java, `\1` on RE2), so a param
    * whose name merely CONTAINS a tracking name (`my_gclid=5`) is
    * never touched; and [[normalizeUrl]] applies this pattern to the
    * QUERY portion only (from the first `?`), so a path segment that
    * happens to contain `&gclid=` cannot match — nor can a tracking
    * value swallow path characters. */
  val trackingParamPattern: String =
    "([?&])(utm_[A-Za-z0-9_]+|gclid|fbclid|msclkid|mc_eid|igshid|ref_src)=[^&#]*"

  /** Canonical URL form for dedup:
    *  1. fragment removed;
    *  2. tracking parameters ([[trackingParamPattern]]) removed from
    *     the QUERY portion only (the part from the first `?` — RFC
    *     3986's query delimiter; the path is never touched), the
    *     captured separator survives, then separator cleanup
    *     (`&&`→`&`, `?&`→`?`, trailing `?`/`&` dropped);
    *  3. scheme and HOST:port lowercased — per RFC 3986 only scheme
    *     and host are case-insensitive; userinfo (up to the last `@`
    *     of the authority) and path/query keep their case;
    *  4. default ports dropped (`http://…:80`, `https://…:443`),
    *     userinfo-tolerant;
    *  5. trailing slashes dropped — only for query-less URLs (a URL
    *     with a query ends in the query string, and a `/` there is
    *     query DATA, e.g. `?next=/home/`, never a path slash).
    * Each step is one regexp_replace/extract — a fused codegen chain,
    * same shape the oracle mirrors. */
  def normalizeUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*", "")
    // query starts at the FIRST '?' (RFC 3986); tracking-param
    // stripping and separator cleanup see only the query, never the
    // path (a path '&gclid=' or a value spanning '/' cannot misfire)
    val base = regexp_replace(noFrag, "\\?.*", "")
    val query0 = regexp_extract(noFrag, "(\\?.*)", 1)
    val query1 = regexp_replace(query0, trackingParamPattern, "$1")
    val query2 = regexp_replace(query1, "&&+", "&")
    val query3 = regexp_replace(query2, "^\\?&", "?")
    val query = regexp_replace(query3, "[?&]+$", "")
    val noTrack = concat(base, query)
    val scheme = regexp_extract(noTrack, "^([A-Za-z][A-Za-z0-9+.-]*://)", 1)
    val auth = regexp_extract(noTrack, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    // greedy .* -> the LAST @ delimits userinfo from host (RFC 3986)
    val userinfo = regexp_extract(auth, "^(.*@)", 1)
    val hostPort = regexp_replace(auth, "^.*@", "")
    val rest = regexp_replace(noTrack, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "")
    val lowerAuth = concat(lower(scheme), userinfo, lower(hostPort), rest)
    // optional userinfo before the host (mirrors extractDomain): a
    // ':' INSIDE credentials must not stop the default-port match
    val noPort80 = regexp_replace(lowerAuth,
      "^(http://(?:[^/?#]*@)?[^/:?#]+):80([/?#]|$)", "$1$2")
    val noPort = regexp_replace(noPort80,
      "^(https://(?:[^/?#]*@)?[^/:?#]+):443([/?#]|$)", "$1$2")
    // trailing-slash strip anchored to query-less URLs: `[^?]*` can
    // only span the whole string when no '?' exists, so a trailing
    // slash inside a QUERY VALUE (`?next=/home/`) is never touched —
    // with a query present the URL ends in the query, not the path
    regexp_replace(noPort, "^([^?]*?)/+$", "$1")
  }

  /** Per-registered-domain pooled statistics joined back to every
    * row — the domain-reputation axis: C4-style host filtering and
    * blocklist curation judge a document by its DOMAIN's pooled
    * behavior (document count, total/mean weight), not the document
    * alone. Appends `<prefix>registered`, `<prefix>docs`,
    * `<prefix>weight` (sum of `weightCol`, nulls = 0) — derive means
    * downstream as the single exact division `weight / docs` (the
    * engine-portable form).
    *
    * Scale shape: one hash aggregate keyed on the registered domain
    * (map-side partial combine), then an equi-join back on the same
    * key. The stats side is domain-cardinality-sized — tens of
    * millions at web scale, so it is NOT broadcast by hint; the
    * planner still may when it fits. A null OR unparseable URL row
    * keeps null domain and null stats: [[extractDomain]]'s
    * empty-string miss is mapped to null here, so the corpus's
    * malformed URLs never pool into one giant pseudo-domain that a
    * downstream domain filter would judge together. */
  def withDomainStats(
      df: DataFrame, urlCol: String, weightCol: String,
      prefix: String = "domain_"): DataFrame = {
    Seq("registered", "docs", "weight").foreach(c =>
      require(!df.columns.contains(s"$prefix$c"),
        s"input already has a column named $prefix$c"))
    val raw = registeredDomain(extractDomain(col(urlCol)))
    val dom = when(raw === "", lit(null).cast("string")).otherwise(raw)
    val weight = coalesce(col(weightCol).cast("long"), lit(0L))
    val stats = df
      .select(dom.as(s"${prefix}registered"), weight.as("__w__"))
      .filter(col(s"${prefix}registered").isNotNull)
      .groupBy(s"${prefix}registered")
      .agg(count(lit(1)).as(s"${prefix}docs"), sum(col("__w__")).as(s"${prefix}weight"))
    df.withColumn(s"${prefix}registered", dom)
      .join(stats, Seq(s"${prefix}registered"), "left")
  }
}
