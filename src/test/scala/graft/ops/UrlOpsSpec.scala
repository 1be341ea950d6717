package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class UrlOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-url-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def one(f: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      in: String): String =
    Seq(Tuple1(in)).toDF("u").select(f(col("u"))).head().getString(0)

  test("extractDomain: scheme, userinfo, port, cut points") {
    assert(one(UrlOps.extractDomain, "https://Example.COM/path") == "example.com")
    assert(one(UrlOps.extractDomain, "http://user:pw@Host.Org:8080/x") == "host.org")
    assert(one(UrlOps.extractDomain, "ftp://files.example.net") == "files.example.net")
    assert(one(UrlOps.extractDomain, "https://example.com?q=1") == "example.com")
    assert(one(UrlOps.extractDomain, "not a url") == "") // loud empty, not a guess
    // the LAST @ delimits the host (unencoded @ in credentials) —
    // same rule as normalizeUrl
    assert(one(UrlOps.extractDomain, "http://a@b@ex.com/x") == "ex.com")
  }

  test("registeredDomain: plain TLD, multi-label suffix, single label") {
    assert(one(UrlOps.registeredDomain, "www.example.com") == "example.com")
    assert(one(UrlOps.registeredDomain, "a.b.example.co.uk") == "example.co.uk")
    assert(one(UrlOps.registeredDomain, "example.com.au") == "example.com.au")
    assert(one(UrlOps.registeredDomain, "localhost") == "localhost") // fallback
  }

  test("normalizeUrl: fragment, tracking params, case, default ports, trailing slash") {
    // tracking params interleaved with a real one; separators healed
    assert(one(UrlOps.normalizeUrl,
      "HTTPS://Ex.COM:443/P/?utm_source=a&id=7&fbclid=x#f") == "https://ex.com/P/?id=7")
    // tracking-only query collapses away entirely
    assert(one(UrlOps.normalizeUrl,
      "http://ex.com/p?utm_campaign=z") == "http://ex.com/p")
    // default port stripped only for the matching scheme
    assert(one(UrlOps.normalizeUrl, "http://ex.com:80/a") == "http://ex.com/a")
    assert(one(UrlOps.normalizeUrl, "http://ex.com:443/a") == "http://ex.com:443/a")
    assert(one(UrlOps.normalizeUrl, "https://ex.com:8443/a") == "https://ex.com:8443/a")
    // path case preserved; trailing slashes dropped
    assert(one(UrlOps.normalizeUrl, "https://Ex.com/CaseSensitive/") ==
      "https://ex.com/CaseSensitive")
    // already-canonical URLs pass through unchanged
    assert(one(UrlOps.normalizeUrl, "https://ex.com/a?b=1&c=2") ==
      "https://ex.com/a?b=1&c=2")
    // a param NAME that merely contains a tracking name is untouched
    // (the [?&] boundary is required and re-emitted)
    assert(one(UrlOps.normalizeUrl, "https://ex.com/p?my_gclid=5") ==
      "https://ex.com/p?my_gclid=5")
    assert(one(UrlOps.normalizeUrl, "https://ex.com/gclid=5/page") ==
      "https://ex.com/gclid=5/page")
    // userinfo is case-SENSITIVE per RFC 3986 — only scheme+host fold
    assert(one(UrlOps.normalizeUrl, "HTTPS://UserA@Ex.COM/x") ==
      "https://UserA@ex.com/x")
    // tracking strip is QUERY-scoped: an '&gclid=' inside the path
    // neither matches nor swallows the real query string
    assert(one(UrlOps.normalizeUrl, "https://ex.com/a&gclid=1/page?q=1") ==
      "https://ex.com/a&gclid=1/page?q=1")
    // default-port strip tolerates a ':' inside credentials
    assert(one(UrlOps.normalizeUrl, "http://user:pw@ex.com:80/x") ==
      "http://user:pw@ex.com/x")
    assert(one(UrlOps.normalizeUrl, "https://user:pw@ex.com:443/x") ==
      "https://user:pw@ex.com/x")
    // trailing-slash strip is QUERY-AWARE: a '/' ending a query VALUE
    // is data, not a path slash — it survives (r7 advice regression)
    assert(one(UrlOps.normalizeUrl, "https://ex.com/p?next=/home/") ==
      "https://ex.com/p?next=/home/")
    // with a query present nothing is stripped, including the path's
    // own trailing slash before the '?' (documented scope)
    assert(one(UrlOps.normalizeUrl, "https://ex.com/a/?q=1") ==
      "https://ex.com/a/?q=1")
    // all-slash pathological input still collapses in the no-query arm
    assert(one(UrlOps.normalizeUrl, "https://ex.com///") == "https://ex.com")
  }

  test("normalizeUrl as a dedup key: variants of one page collapse") {
    val variants = Seq(
      "https://ex.com/page?utm_source=x",
      "HTTPS://EX.COM:443/page",
      "https://ex.com/page/",
      "https://ex.com/page#section")
    val keys = variants.map(one(UrlOps.normalizeUrl, _)).toSet
    assert(keys == Set("https://ex.com/page"), s"got $keys")
  }

  test("withDomainStats pools per registered domain; null AND malformed URLs keep null stats") {
    import spark.implicits._
    val df = Seq(
      (1L, Option("https://a.ex.com/x"), 10L),
      (2L, Option("http://b.ex.com/y"), 20L),     // same registered domain ex.com
      (3L, Option("https://other.org/z"), 5L),
      (4L, Option.empty[String], 7L),             // null URL
      (5L, Option("not a url"), 9L),              // schemeless: extractDomain misses
      (6L, Option("also/not?one"), 11L)           // must NOT pool with row 5
    ).toDF("id", "url", "w")
    val out = UrlOps.withDomainStats(df, "url", "w")
      .select("id", "domain_registered", "domain_docs", "domain_weight")
      .collect().map(r => r.getLong(0) ->
        (Option(r.getString(1)), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(out(1L) == (Some("ex.com"), Some(2L), Some(30L)))
    assert(out(2L) == (Some("ex.com"), Some(2L), Some(30L)))
    assert(out(3L) == (Some("other.org"), Some(1L), Some(5L)))
    // a malformed URL is not a domain: no empty-string pseudo-domain
    // pooling every junk row of the corpus into one giant "site"
    Seq(4L, 5L, 6L).foreach { id =>
      assert(out(id)._1.isEmpty && out(id)._2.isEmpty && out(id)._3.isEmpty,
        s"row $id should carry null stats: ${out(id)}")
    }
  }
}
