package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Adversarial-input hardening sweep over the gate families (round-8
  * verdict item 1): the oracle corpus is well-formed; a real 100 TB
  * crawl is not. Every test feeds the same hostile corpus — null /
  * empty / 1-char text, multi-MB single documents, tokenless
  * whitespace runs, unpaired surrogates, astral-plane codepoints,
  * C0/C1 control bytes, ellipsis-only text — to one operator family
  * and asserts NO-THROW plus the documented verdict for each edge.
  * Weight/id edges (duplicate ids, negative weights, overflow sums,
  * out-of-range encodings) get their own cases. A crash found here is
  * fixed in the operator with the failing input kept as regression.
  */
class HostileInputsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-hostile-inputs")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  // ~1.2 MB single document (repeating phrase: worst case for the
  // repetition/gram family — every gram duplicated)
  private lazy val bigDoc: String = "lorem ipsum dolor sit amet " * 45000
  // ~600 KB of one repeated token with no newline at all
  private lazy val tokenRun: String = "tok " * 150000

  /** The shared hostile corpus: (id, text). */
  private lazy val hostile: DataFrame = Seq[(Long, String)](
    (1L, null),
    (2L, ""),
    (3L, "a"),
    (4L, " \t\n" + 11.toChar + "\f\r  "),      // tokenless whitespace incl VT
    (5L, "\uD800 lone\uDFFF surrogates \uD83D"),    // unpaired surrogates
    (6L, "𝕊𝕡ark 😀 𐍈 astral"),
    (7L, "" + 0.toChar + "nul" + 7.toChar + "bell" + 0x85.toChar + "nel" + 0x9F.toChar + "apc"),  // C0/C1 controls
    (8L, bigDoc),
    (9L, tokenRun),
    (10L, "……… …"),                            // ellipsis-only
    (11L, "word"),                                   // single token
    (12L, "# # # # #")                               // hash-only tokens
  ).toDF("id", "text")

  // ---------------------------------------------------------------
  // Quality / text-analysis family
  // ---------------------------------------------------------------

  test("quality family: no-throw and documented verdicts on hostile text") {
    val rows = hostile.select(
      col("id"),
      TextOps.qualityFeatures(col("text")).as("q"),
      TextOps.gopherSignals(col("text")).as("g"),
      TextOps.gopherPass(TextOps.gopherSignals(col("text"))).as("pass"),
      TextOps.repetitionRatio(col("text"), 2).as("rep"),
      TextOps.langId(col("text")).as("lang"),
      TextOps.bpeishTokenCount(col("text")).as("bpe"),
      TextOps.tokenCount(col("text")).as("ntok"),
      TextOps.fingerprint(col("text")).as("fp"),
      TextOps.rollingHash(col("text")).as("rh")
    ).collect().map(r => r.getLong(0) -> r).toMap

    // NULL text: null verdicts propagate, never throw
    assert(rows(1L).isNullAt(rows(1L).fieldIndex("rep")))
    assert(rows(1L).isNullAt(rows(1L).fieldIndex("fp")))
    // repetition is bounded wherever defined
    rows.values.foreach { r =>
      if (!r.isNullAt(r.fieldIndex("rep"))) {
        val rep = r.getDouble(r.fieldIndex("rep"))
        assert(rep >= 0.0 && rep <= 1.0, s"rep out of bounds: $rep (id=${r.getLong(0)})")
      }
    }
    // the pathological repeat scores as near-total repetition
    assert(rows(8L).getDouble(rows(8L).fieldIndex("rep")) > 0.9)
    // whitespace-only text must not score repetitive
    assert(rows(4L).getDouble(rows(4L).fieldIndex("rep")) == 0.0)
    // gopher never passes contentless docs
    Seq(2L, 3L, 4L, 10L, 12L).foreach { id =>
      val r = rows(id)
      assert(r.isNullAt(r.fieldIndex("pass")) || !r.getBoolean(r.fieldIndex("pass")),
        s"gopherPass accepted contentless doc $id")
    }
  }

  test("dupNgramCharFracs: no-throw and bounded on hostile text; big-doc repetition detected") {
    val rows = hostile.select(col("id"),
      TextOps.dupNgramCharFracs(col("text"), Seq(5, 10)).as("f"))
      .collect().map(r => r.getLong(0) -> r).toMap
    // NULL text → NULL array; everything else defined and in [0, 1]
    assert(rows(1L).isNullAt(1))
    rows.values.filterNot(_.isNullAt(1)).foreach { r =>
      r.getSeq[Double](1).foreach(v =>
        assert(v >= 0.0 && v <= 1.0, s"frac out of bounds: $v (id=${r.getLong(0)})"))
    }
    // the pathological repeated doc is near-totally covered at n=5
    assert(rows(8L).getSeq[Double](1).head > 0.9)
    // tokenless whitespace (incl. \x0b) and single tokens score 0
    assert(rows(4L).getSeq[Double](1) == Seq(0.0, 0.0))
    assert(rows(11L).getSeq[Double](1) == Seq(0.0, 0.0))
  }

  test("cleanText / redactPii: no-throw, idempotent, controls stripped") {
    val out = hostile.select(col("id"),
      TextOps.cleanText(col("text")).as("c1"),
      TextOps.cleanText(TextOps.cleanText(col("text"))).as("c2"),
      TextOps.redactPii(TextOps.cleanText(col("text"))).as("red"))
      .collect()
    out.foreach { r =>
      if (!r.isNullAt(1)) {
        assert(r.getString(1) == r.getString(2),
          s"cleanText not idempotent on id=${r.getLong(0)}")
        assert(!r.getString(1).exists(_ < ' '),
          s"control char survived cleanText on id=${r.getLong(0)}")
      } else assert(r.isNullAt(2) && r.isNullAt(3))
    }
  }

  test("chunkDocuments: hostile docs chunk without throwing; bounds hold") {
    val chunks = TextOps.chunkDocuments(hostile, "id", "text", maxTokens = 64, overlap = 8)
      .collect()
    // NULL text yields no chunks (documented)
    assert(!chunks.exists(_.getLong(0) == 1L))
    // every non-null doc yields at least one chunk
    val withChunks = chunks.map(_.getLong(0)).toSet
    (2L to 12L).foreach(id => assert(withChunks.contains(id), s"doc $id lost all chunks"))
    chunks.foreach { r =>
      val n = r.getInt(r.fieldIndex("n_chunk_tokens"))
      assert(n >= 0 && n <= 64, s"chunk token count out of bounds: $n")
    }
    // the big doc's chunk count matches the stride arithmetic
    val nBig = chunks.count(_.getLong(0) == 8L)
    val tokensBig = 45000 * 5
    val expected = 1 + math.ceil((tokensBig - 64) / 56.0).toInt
    assert(nBig == expected, s"big doc chunks: got $nBig, expected $expected")
  }

  test("removeBoilerplateLines: hostile corpus passes through intact") {
    val out = TextOps.removeBoilerplateLines(hostile, "id", "text", minDocs = 2)
    val rows = out.collect()
    assert(rows.length == 12)
    val byId = rows.map(r => r.getLong(r.fieldIndex("id")) -> r).toMap
    assert(byId(1L).isNullAt(byId(1L).fieldIndex("text")), "null text must stay null")
    // no line here repeats across >= 2 docs, so non-null texts are
    // unchanged up to the (pos,line) rebuild — which preserves content
    assert(byId(8L).getString(byId(8L).fieldIndex("text")) == bigDoc)
  }

  // ---------------------------------------------------------------
  // Span dedup (ExactSubstr)
  // ---------------------------------------------------------------

  test("removeDuplicatedSpans: no-throw on hostile corpus; duplicate ids stay deterministic") {
    // duplicate ids: two distinct rows sharing id 13 — the spans of the
    // merged occurrence stream apply to both rows (documented: ids
    // should be unique; behavior must be deterministic, never a crash)
    val withDups = hostile.union(Seq(
      (13L, "shared prefix " + ("alpha beta gamma delta " * 10)),
      (13L, "shared prefix " + ("alpha beta gamma delta " * 10))).toDF("id", "text"))
    val out = Dedup.removeDuplicatedSpans(withDups, "id", "text", k = 5)
    val rows = out.collect()
    assert(rows.length == 14, "row count must be preserved")
    rows.foreach { r =>
      val removed = r.getLong(r.fieldIndex("removed_tokens"))
      assert(removed >= 0L, s"negative removed_tokens: $removed")
    }
    // run twice: identical outcome (determinism under duplicate ids)
    def key(r: org.apache.spark.sql.Row) = (r.getLong(r.fieldIndex("id")),
      Option(r.getString(r.fieldIndex("text"))).getOrElse(""))
    val again = Dedup.removeDuplicatedSpans(withDups, "id", "text", k = 5).collect()
    assert(rows.sortBy(key).map(_.toString).toSeq ==
      again.sortBy(key).map(_.toString).toSeq)
    // null/empty/whitespace docs survive untouched
    val byId = rows.groupBy(_.getLong(0))
    assert(byId(1L).head.isNullAt(1))
    assert(byId(2L).head.getString(1) == "")
  }

  test("removeDuplicatedSpans: id beyond the (id,pos) encoding fails loudly") {
    val bad = Seq((Long.MaxValue / 4, "a b c d e f g h i j k l"),
      (1L, "a b c d e f g h i j k l")).toDF("id", "text")
    val e = intercept[Exception] {
      Dedup.removeDuplicatedSpans(bad, "id", "text", k = 3).collect()
    }
    assert(e.getMessage.contains("overflows the (id,pos) encoding"),
      s"expected the loud encoding-bound error, got: ${e.getMessage}")
  }

  // ---------------------------------------------------------------
  // LM / NB scorers
  // ---------------------------------------------------------------

  test("LmScore: hostile corpus scores without throwing; tokenless docs score null") {
    val ref = Seq.tabulate(50)(i => s"the quick brown fox jumps over dog $i")
      .toDF("text")
    val model = LmScore.train(ref, "text")
    try {
      val scored = LmScore.withLmScore(hostile, "text", model).collect()
      val byId = scored.map(r => r.getLong(r.fieldIndex("id")) -> r).toMap
      Seq(1L, 2L, 4L).foreach { id => // null, empty, whitespace-only
        val r = byId(id)
        assert(r.isNullAt(r.fieldIndex("lm_logprob")),
          s"tokenless doc $id should score null")
      }
      // scores are finite negative log10 probabilities where defined
      scored.foreach { r =>
        val i = r.fieldIndex("lm_logprob")
        if (!r.isNullAt(i)) {
          val s = r.getDouble(i)
          assert(!s.isNaN && !s.isInfinite && s <= 0.0, s"bad lm score $s")
        }
      }
    } finally model.destroy()
  }

  test("LmScore.train fails loudly on a tokenless reference corpus") {
    val empty = Seq[(String)](null, "", "   \t ").toDF("text")
    val e = intercept[IllegalArgumentException] { LmScore.train(empty, "text") }
    assert(e.getMessage.contains("no tokens"))
  }

  test("NbClassifier: hostile corpus scores without throwing; tokenless docs carry the prior") {
    val labeled = (Seq.tabulate(20)(i => (s"good clean text sample $i", true)) ++
      Seq.tabulate(30)(i => (s"spam junk garbage click $i", false))).toDF("text", "label")
    val model = NbClassifier.train(labeled, "text", col("label"))
    try {
      val prior = math.log10(20.0 / 30.0)
      val scored = NbClassifier.withNbScore(hostile, "text", model).collect()
      val byId = scored.map(r => r.getLong(r.fieldIndex("id")) -> r).toMap
      Seq(2L, 4L).foreach { id =>
        val r = byId(id)
        assert(math.abs(r.getDouble(r.fieldIndex("nb_score")) - prior) < 1e-12,
          s"tokenless doc $id should carry the bare prior")
      }
      scored.foreach { r =>
        val i = r.fieldIndex("nb_score")
        if (!r.isNullAt(i)) {
          val s = r.getDouble(i)
          assert(!s.isNaN && !s.isInfinite, s"bad nb score $s")
        }
      }
    } finally model.destroy()
  }

  // ---------------------------------------------------------------
  // bucketedCumsum consumers: packing and token budgets
  // ---------------------------------------------------------------

  test("globalCumsum: negative and null weights follow the documented contract") {
    val df = Seq((1L, 5L), (2L, -3L), (3L, 0L), (4L, 7L))
      .toDF("ord", "w")
      .union(Seq((5L, 2L)).toDF("ord", "w")
        .withColumn("w", lit(null).cast("long")))
    val out = Packing.globalCumsum(df, "ord", "w").orderBy("ord").collect()
    // nulls count 0 (SQL SUM), negatives flow through arithmetic as-is
    assert(out.map(_.getLong(out.head.fieldIndex("cum_before"))).toSeq ==
      Seq(0L, 5L, 2L, 2L, 9L))
  }

  test("globalCumsum: a weight sum overflowing Long fails loudly, never wraps") {
    val df = Seq((1L, Long.MaxValue - 1), (2L, Long.MaxValue - 1), (3L, 5L))
      .toDF("ord", "w")
    val e = intercept[Exception] {
      Packing.globalCumsum(df, "ord", "w", bucketWidth = 10).collect()
    }
    val msg = Option(e.getMessage).getOrElse("") + Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.toLowerCase.contains("overflow"),
      s"expected a loud ANSI overflow, got: ${e.getClass.getName}: $msg")
  }

  test("sampleByTokenBudget: hostile stratum labels and duplicate keys do not throw") {
    val df = Seq(
      (1L, "", 10L), (2L, "", 10L),                 // empty-string stratum
      (3L, "𝕊tratum", 10L), (4L, "𝕊tratum", 10L),   // astral-plane stratum
      (5L, "web", 10L), (5L, "web", 10L),            // duplicate keys
      (6L, "web", 10L)).toDF("id", "stratum", "n")
    val out = Sampling.sampleByTokenBudget(df, col("id"), "stratum", "n",
      budgets = Seq("" -> 15L, "𝕊tratum" -> 15L, "web" -> 15L), salt = ":h8")
      .collect()
    assert(out.nonEmpty)
    // every listed stratum takes at least one doc (crossing doc kept)
    val strata = out.map(_.getString(1)).toSet
    assert(strata == Set("", "𝕊tratum", "web"))
  }

  test("buildShards: hostile texts pack without throwing; null text skipped in concat") {
    val df = hostile.withColumn("n",
      coalesce(TextOps.tokenCount(col("text")).cast("long"), lit(0L)))
    val shards = Packing.buildShards(df, "id", "text", "n", budget = 100000)
    val rows = shards.collect()
    assert(rows.nonEmpty)
    val totalDocs = rows.map(_.getLong(rows.head.fieldIndex("n_docs"))).sum
    assert(totalDocs == 12L, s"every doc lands in a shard: $totalDocs")
  }

  test("bpe ids + packTokenIds: hostile corpus encodes and packs without throwing; tensor invariants hold") {
    // model trained on a tiny clean corpus, applied to the hostile one:
    // multi-MB docs, controls, surrogates, markers — everything must
    // encode (unk for unseen code points) and pack into exact-length
    // sequences with conserved token totals
    val m = Bpe.train(Seq("the cat sat", "the thin cat").toDF("text"),
      "text", numMerges = 8, minPairCount = 2)
    val bc = Bpe.broadcastModel(spark, m)
    val withIds = Bpe.withTokenIds(hostile, "text", "ids", bc)
    val rows = withIds.select(col("id"), col("ids")).collect()
    assert(rows.length == 12)
    assert(rows.find(_.getLong(0) == 1L).get.isNullAt(1))  // null text -> null ids
    assert(rows.find(_.getLong(0) == 2L).get.getSeq[Int](1).isEmpty)  // empty text
    val vocabSize = m.vocab.length
    rows.filter(!_.isNullAt(1)).foreach(r =>
      r.getSeq[Int](1).foreach(id => assert(id >= 0 && id < vocabSize)))
    val totalIds = rows.filter(!_.isNullAt(1)).map(_.getSeq[Int](1).length.toLong).sum
    val L = 4096
    val seqs = Packing.packTokenIds(withIds, "id", "ids", seqLen = L, padId = 0)
      .orderBy("seq_id").collect()
    assert(seqs.length == ((totalIds + L - 1) / L).toInt)
    seqs.foreach(r => assert(r.getSeq[Int](1).length == L, "fixed length broken"))
    val pads = seqs.map(_.getAs[Int]("n_pad").toLong).sum
    assert(seqs.length * L.toLong - pads == totalIds, "token conservation broken")
    // boundary table sane: offsets strictly increasing, first is 0
    seqs.foreach { r =>
      val offs = r.getSeq[Int](2)
      assert(offs.nonEmpty && offs.head == 0 && offs == offs.sorted && offs.distinct == offs)
      assert(offs.last < L)
    }
    // sepId arm over the same hostile corpus: conservation gains
    // exactly one id per NON-EMPTY doc (null/empty contribute none),
    // and every separator is present in the packed stream
    val SEP = -3
    val nonEmpty = rows.count(r => !r.isNullAt(1) && r.getSeq[Int](1).nonEmpty)
    val seqsSep = Packing.packTokenIds(withIds, "id", "ids", seqLen = L,
      padId = 0, sepId = Some(SEP)).orderBy("seq_id").collect()
    val padsSep = seqsSep.map(_.getAs[Int]("n_pad").toLong).sum
    assert(seqsSep.length * L.toLong - padsSep == totalIds + nonEmpty,
      "separator conservation broken")
    assert(seqsSep.flatMap(_.getSeq[Int](1)).count(_ == SEP) == nonEmpty)
    // shuffle-and-shard over the hostile packed set: ranks are a
    // permutation, shards exact 3-row cuts
    val sharded = Packing.assignShuffledShards(
      Packing.packTokenIds(withIds, "id", "ids", seqLen = L, padId = 0),
      "seq_id", ":hs", rowsPerShard = 3).collect()
    val ranks = sharded.map(_.getAs[Long]("rank")).sorted
    assert(ranks.toSeq == (0L until sharded.length.toLong))
    sharded.foreach(r =>
      assert(r.getAs[Long]("shard_id") == r.getAs[Long]("rank") / 3))
  }

  // ---------------------------------------------------------------
  // URL operators
  // ---------------------------------------------------------------

  private lazy val hostileUrls: Seq[String] = Seq(
    null, "", "not a url", "example.com/schemeless",
    "http://bücher.example.co.uk/päth/?q=ümlaut",      // IDN host + path
    "http://xn--bcher-kva.example/x",                   // punycode
    "http://user:p@ss@host.example/a@b?c=@d",           // multi-@ userinfo
    "http://@host.example/",                            // empty userinfo
    "https://user@host.example:443/Keep/Case?X=1#frag", // userinfo + default port
    "http://host.example:008080/pad",                   // zero-padded port
    "HTTP://HOST.EXAMPLE:80/UPPER?Q=V#F",               // uppercase everything
    "http://host/?",                                    // bare query
    "http://host/?&&&",                                 // separator soup
    "http://host/#only-fragment",
    "http://host/a/b/c////",                            // deep trailing slashes
    "http://host/?next=/home/",                         // slash in query value
    "http://host/?utm_source=x&gclid=y&real=z",
    "ftp://host.example/file",                          // non-http scheme
    "http://[::1]:8080/v6",                             // IPv6 literal
    "http://host.example/" + ("p/" * 5000))             // very long path

  test("UrlOps: hostile URLs never throw; normalizeUrl is idempotent") {
    val df = hostileUrls.toDF("u")
    val out = df.select(col("u"),
      UrlOps.normalizeUrl(col("u")).as("n1"),
      UrlOps.normalizeUrl(UrlOps.normalizeUrl(col("u"))).as("n2"),
      UrlOps.extractDomain(col("u")).as("host"),
      UrlOps.registeredDomain(UrlOps.extractDomain(col("u"))).as("reg"))
      .collect()
    out.foreach { r =>
      if (r.isNullAt(0)) assert(r.isNullAt(1) && r.isNullAt(3))
      else {
        assert(r.getString(1) == r.getString(2),
          s"normalizeUrl not idempotent on '${r.getString(0).take(60)}': " +
            s"'${r.getString(1).take(80)}' vs '${r.getString(2).take(80)}'")
      }
    }
    val byUrl = out.filterNot(_.isNullAt(0)).map(r => r.getString(0) -> r).toMap
    // schemeless input yields the documented empty-string host
    assert(byUrl("example.com/schemeless").getString(3) == "")
    // IDN host: lowercased, multi-label suffix recognized
    assert(byUrl("http://bücher.example.co.uk/päth/?q=ümlaut").getString(4) == "example.co.uk")
    // userinfo keeps case; host lowers; default port drops
    assert(byUrl("https://user@host.example:443/Keep/Case?X=1#frag").getString(1) ==
      "https://user@host.example/Keep/Case?X=1")
    // multi-@: the LAST @ delimits the host
    assert(byUrl("http://user:p@ss@host.example/a@b?c=@d").getString(3) == "host.example")
    // slash inside a query value survives
    assert(byUrl("http://host/?next=/home/").getString(1) == "http://host/?next=/home/")
    // IPv6 literal: bracket host extracted without throwing
    assert(byUrl("http://[::1]:8080/v6").getString(1).nonEmpty)
  }

  test("withDomainStats: hostile URLs pool without throwing; malformed rows keep null stats") {
    val df = hostileUrls.zipWithIndex.map { case (u, i) => (i.toLong, u, 10L) }
      .toDF("id", "url", "w")
    val out = UrlOps.withDomainStats(df, "url", "w")
    val rows = out.collect()
    assert(rows.length == hostileUrls.length)
    rows.foreach { r =>
      val reg = r.fieldIndex("domain_registered")
      if (r.isNullAt(reg))
        assert(r.isNullAt(r.fieldIndex("domain_docs")),
          "malformed URL must not pool into a pseudo-domain")
    }
  }

  // ---------------------------------------------------------------
  // Dedup screens over hostile text
  // ---------------------------------------------------------------

  test("exact dedup and minhash near-dups: hostile corpus never throws") {
    val kept = Dedup.exact(hostile, "text", "id")
    // null fingerprints group together; each distinct text keeps one row
    assert(kept.count() == 12L, "no duplicate texts here — all rows survive")

    val pairs = Dedup.minhashNearDups(hostile, "id", "text",
      shingleN = 3, numHashes = 32, bands = 8, threshold = 0.8)
    assert(pairs.count() >= 0L) // no-throw is the assertion
  }

  // ---------------------------------------------------------------
  // Round-8 paths: blocked n-gram Jaccard, catalogs, sessionAgg
  // ---------------------------------------------------------------

  // hostile plus a planted near-dup pair the screens must find
  private lazy val hostileWithDups: DataFrame = hostile.union(Seq(
    (20L, "the quick brown fox jumps over the lazy dog again and again"),
    (21L, "the quick brown fox jumps over the lazy dog again and again")
  ).toDF("id", "text"))

  test("ngramJaccardPairsBlocked: hostile corpus no-throw; subset of all-pairs; planted dup found") {
    def norm(df: DataFrame): Set[(Long, Long)] =
      df.select("id1", "id2").collect()
        .map(r => (math.min(r.getLong(0), r.getLong(1)),
          math.max(r.getLong(0), r.getLong(1)))).toSet
    val blocked = norm(Dedup.ngramJaccardPairsBlocked(
      hostileWithDups, "id", "text", shingleN = 3, threshold = 0.8))
    val allPairs = norm(Dedup.ngramJaccardPairs(
      hostileWithDups, "id", "text", shingleN = 3, threshold = 0.8))
    // exact verify on screened candidates: can only MISS, never invent
    assert(blocked.subsetOf(allPairs),
      s"blocked path invented pairs: ${blocked -- allPairs}")
    assert(blocked.contains((20L, 21L)), "planted exact duplicate missed")
  }

  test("fingerprint catalog: hostile self-dedup keeps only null-text docs; non-string catalog fails loudly") {
    val catalog = Dedup.fingerprints(hostile, "text")
    // every non-null text fingerprint is in the catalog, so self-dedup
    // keeps exactly the null-text doc (null fingerprints always kept)
    val kept = Dedup.exactCrossDedupByFingerprint(
      hostile, catalog, "fingerprint", "id", "text").collect()
    assert(kept.map(_.getLong(0)).toSet == Set(1L),
      "only the null-text doc survives self-catalog dedup")
    // a binary catalog column would silently match nothing — loud fail
    val bad = catalog.select(unbase64(base64(col("fingerprint").cast("binary"))).as("fingerprint"))
    val e = intercept[IllegalArgumentException] {
      Dedup.exactCrossDedupByFingerprint(hostile, bad, "fingerprint", "id", "text")
    }
    assert(e.getMessage.contains("expected"), s"wrong error: ${e.getMessage}")
  }

  test("signature catalog: hostile self-dedup no-throw; null text never enters the catalog; width mismatch fails loudly") {
    val catalog = Dedup.signatureCatalog(hostileWithDups, "id", "text",
      shingleN = 3, numHashes = 64, charShingles = true)
    assert(catalog.count() == 13L, "null-text doc must not enter the catalog")
    val kept = Dedup.crossCorpusDedupBySignatures(
      hostileWithDups, catalog, "id", "sig", "id", "text",
      shingleN = 3, numHashes = 64, bands = 16, threshold = 0.8,
      charShingles = true).collect()
    // every cataloged doc matches its own signature (agreement 1.0);
    // the null-text doc has no catalog entry and must survive
    assert(kept.map(_.getLong(0)).contains(1L), "null-text doc must survive")
    assert(!kept.map(_.getLong(0)).contains(20L), "cataloged doc must be dropped")
    // a catalog built at a different signature width must fail loudly,
    // not silently stop colliding
    val narrow = Dedup.signatureCatalog(hostileWithDups, "id", "text",
      shingleN = 3, numHashes = 32, charShingles = true)
    val e = intercept[IllegalArgumentException] {
      Dedup.crossCorpusDedupBySignatures(
        hostileWithDups, narrow, "id", "sig", "id", "text",
        shingleN = 3, numHashes = 64, bands = 16, threshold = 0.8,
        charShingles = true)
    }
    assert(e.getMessage.contains("numHashes"), s"wrong error: ${e.getMessage}")
  }

  test("duplicate ids: dedup screens pick a deterministic representative (spreadByKey min, not first)") {
    // a crawler re-emitting an id with different text must not make
    // dedup verdicts depend on partition order
    val dups = Seq(
      (1L, "zz completely different text about zebras and zoos"),
      (1L, "aa the quick brown fox jumps over the lazy dog"),
      (2L, "aa the quick brown fox jumps over the lazy dog"))
    def run(partitions: Int): Set[(Long, Long)] =
      Dedup.ngramJaccardPairs(
        spark.createDataFrame(dups).toDF("id", "text").repartition(partitions),
        "id", "text", shingleN = 3, threshold = 0.8)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val p1 = run(1)
    assert(p1 == run(7), "verdicts must not depend on partitioning")
    // min picks the 'aa…' text for id 1, which near-dups id 2 exactly
    assert(p1 == Set((1L, 2L)))
  }

  test("zero-norm embeddings: NULL cosine, never rank first, drop from thresholds, IVF no-throw") {
    // a failed encoder emits zero vectors; the naive dot/norms division
    // gives NaN, which Spark sorts ABOVE every double — one such vector
    // would top every ORDER BY cosine DESC top-k in a 100 TB corpus
    val vecs = Seq(
      (1L, Seq(1.0, 0.0, 0.0)),
      (2L, Seq(0.9, 0.1, 0.0)),
      (3L, Seq(0.0, 0.0, 0.0)),              // zero norm
      (4L, Seq(Double.NaN, 1.0, 0.0))        // NaN component
    ).toDF("id", "vec")
    val c = vecs.select(col("id"),
      VectorOps.cosine(col("vec"), typedLit(Seq(1.0, 0.0, 0.0))).as("cos")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(c(1L).contains(1.0))
    assert(c(3L).isEmpty, "zero-norm cosine must be NULL, not NaN")
    assert(c(4L).isEmpty, "NaN-component cosine must be NULL")
    // top-k: degenerate vectors are not results at all — they must not
    // occupy ranks (k=3 with one real neighbor returns ONE row)
    val knn = VectorOps.bruteForceTopK(vecs, vecs.filter(col("id") === 1L),
      "id", "vec", k = 3).orderBy("rank").collect()
    assert(knn.map(_.getLong(knn.head.fieldIndex("neighbor_id"))).toSeq == Seq(2L),
      s"only the real neighbor is a result, got ${knn.toSeq}")
    // threshold form: degenerate vectors drop out entirely
    val thr = VectorOps.cosineThreshold(vecs, vecs.filter(col("id") === 1L),
      "id", "vec", threshold = 0.5).collect()
    assert(thr.map(_.getLong(thr.head.fieldIndex("neighbor_id"))).toSet == Set(2L))
    // IVF: null vectors never enter the index (they are not findable);
    // zero-norm vectors index (they have bytes) but never rank
    val cents = Seq(Seq(1.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0))
    val idx = Ivf.index(vecs.union(Seq((5L, null.asInstanceOf[Seq[Double]]))
      .toDF("id", "vec")), "id", "vec", cents)
    assert(idx.count() == 4L, "non-null vectors index; the null row does not")
    val hits = Ivf.search(idx, vecs.filter(col("id") === 1L), "id", "vec",
      cents, k = 2, nProbe = 2).orderBy("rank").collect()
    // degenerate vectors are excluded from the index and from ranking:
    // the only result is the real neighbor, with a defined cosine
    assert(hits.map(r => r.getLong(r.fieldIndex("neighbor_id"))).toSeq == Seq(2L),
      s"only the real neighbor is a result: ${hits.toSeq}")
    assert(!hits.head.isNullAt(hits.head.fieldIndex("cosine")))
  }

  test("sessionAgg: hostile event times (null ts, epoch zero, far future, duplicates, disorder) never throw") {
    import java.sql.Timestamp
    val events = Seq(
      (1L, Timestamp.valueOf("2026-01-01 10:00:00"), 1.0),
      (1L, Timestamp.valueOf("2026-01-01 10:00:00"), 2.0),  // duplicate ts
      (1L, Timestamp.valueOf("2026-01-01 09:00:00"), 3.0),  // out of order
      (2L, new Timestamp(0L), 4.0),                          // epoch zero
      (2L, Timestamp.valueOf("9999-12-31 23:59:59"), 5.0),   // far future
      (3L, null, 6.0)                                        // null event time
    ).toDF("user_id", "ts", "value")
    val out = graft.streaming.Streams.sessionAgg(
      events, "ts", "0 seconds", "30 minutes", Seq("user_id"))(
      count(lit(1)).as("n"), sum(col("value")).as("s"))
      .select(col("user_id"), col("session_window.start").as("st"),
        col("session_window.end").as("en"), col("n"))
      .collect()
    // null-ts rows have no session window and drop out of the grouping;
    // every emitted session is well-formed
    assert(!out.exists(_.getLong(0) == 3L), "null-ts row must not form a session")
    out.foreach { r =>
      assert(!r.isNullAt(1) && !r.isNullAt(2), s"null session bound: $r")
      assert(!r.getTimestamp(1).after(r.getTimestamp(2)), s"start after end: $r")
      assert(r.getLong(3) >= 1L, s"empty session: $r")
    }
    // user 1: 09:00 and the two 10:00 events gap > 30min apart -> 2 sessions
    assert(out.count(_.getLong(0) == 1L) == 2)
    // user 2's two events are millennia apart -> 2 sessions, no overflow
    assert(out.count(_.getLong(0) == 2L) == 2)
  }
}
