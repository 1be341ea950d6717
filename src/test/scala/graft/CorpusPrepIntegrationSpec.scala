package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end corpus preparation over the real sf0.01 tables: the full
  * training-data flow a user of this library would run, chained as ONE
  * Pipeline — clean → quality gate → boilerplate removal → transitive
  * dedup → decontamination → split → pack → shard build. Each stage's
  * operator is individually oracle-gated; this spec proves they
  * COMPOSE (column contracts line up, nothing shuffles a stale schema)
  * and that corpus-level invariants hold at the end of the chain.
  */
class CorpusPrepIntegrationSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-corpus-prep-integration")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.01"

  test("crawl to shards: WARC ingest → prep → TFRecord export round-trips") {
    // the FULL boundary-to-boundary flow (round 11): documents packed
    // as a WARC crawl (one HTTP response per doc), ingested through
    // the Warc source, deduplicated + fingerprinted with the corpus
    // verbs, exported as TFRecord/tf.Example shards, and read back —
    // every surviving doc's text and fingerprint must round-trip.
    val docs = Tables.load(spark, dir, "documents")
      .filter(col("doc_id") < 200 && col("text").isNotNull)
    val rows = docs.select("doc_id", "text").collect()
    val crawlDir = java.nio.file.Files
      .createTempDirectory("graft-crawl2shards").toString
    val os = new java.io.FileOutputStream(s"$crawlDir/crawl.warc")
    try rows.foreach { r =>
      val body = r.getString(1).getBytes("UTF-8")
      val http = "HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n"
        .getBytes("ISO-8859-1") ++ body
      val head = s"WARC/1.0\r\nWARC-Type: response\r\n" +
        s"WARC-Target-URI: http://crawl.test/${r.getLong(0)}\r\n" +
        s"WARC-Date: 2026-01-01T00:00:00Z\r\n" +
        s"Content-Type: application/http; msgtype=response\r\n" +
        s"Content-Length: ${http.length}\r\n\r\n"
      os.write(head.getBytes("ISO-8859-1")); os.write(http)
      os.write("\r\n\r\n".getBytes("ISO-8859-1"))
    } finally os.close()

    val shardDir = java.nio.file.Files
      .createTempDirectory("graft-crawl2shards-out").toString
    sources.Warc.source(spark, crawlDir)
      .addField("doc_id",
        element_at(split(col("target_uri"), "/"), -1).cast("long"))
      .addField("text", decode(col("http_body"), "UTF-8"))
      .clip("doc_id", "text")
      .dedupExact("text", orderCol = "doc_id")
      .addField("fingerprint", ops.TextOps.fingerprint(col("text")))
      .saveTfRecord(shardDir)
      .go()

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("fingerprint",
        org.apache.spark.sql.types.StringType)))
    val back = sources.TfRecord.read(spark, shardDir, schema).collect()
    // the slice has no exact duplicates: every doc survives, and every
    // text + recomputed fingerprint round-trips bit-for-bit
    assert(back.length == rows.length)
    val orig = rows.map(r => r.getLong(0) -> r.getString(1)).toMap
    back.foreach { r =>
      assert(orig(r.getLong(0)) == r.getString(1),
        s"text mismatch for doc ${r.getLong(0)}")
      assert(r.getString(2) != null && r.getString(2).length == 32)
    }
  }

  test("incremental crawl loop: mojibake repair makes mangled re-crawls drop against the catalog") {
    // crawl 2 re-serves some crawl-1 pages MOJIBAKE-MANGLED (a
    // mis-decoding proxy in the serving path — the real-world case
    // where byte-level exact dedup silently misses a duplicate).
    // fixMojibake runs BEFORE the catalog dedup, so the mangled
    // re-crawls fingerprint back to their shipped twins and drop;
    // the survivors update the catalog (the WRITE half).
    import spark.implicits._
    val cp1252 = java.nio.charset.Charset.forName("windows-1252")
    def mangle(s: String) = new String(s.getBytes("UTF-8"), cp1252)
    val crawl1 = Seq(
      (1L, "the café on rue Saint-André"),
      (2L, "naïve résumé review — déjà vu"),
      (3L, "plain ascii document")).toDF("doc_id", "text")
    val crawl2 = Seq(
      (11L, mangle("the café on rue Saint-André")), // mangled re-crawl of 1
      (12L, mangle("naïve résumé review — déjà vu")), // mangled re-crawl of 2
      (13L, "plain ascii document"), // exact re-crawl of 3
      (14L, "a genuinely new café page")).toDF("doc_id", "text")

    val cat1 = ops.Dedup.fingerprints(crawl1, "text")
    val repaired = etl.Pipeline.of("crawl2", crawl2)
      .fixMojibake("text")
      .toDF
    val kept = ops.Dedup.exactCrossDedupByFingerprint(
      repaired, cat1, "fingerprint", "doc_id", "text")
    assert(kept.select("doc_id").collect().map(_.getLong(0)).toSet == Set(14L),
      "mangled and exact re-crawls must all drop after repair")
    // WITHOUT repair, the mangled twins sail through — the repair is
    // load-bearing, not cosmetic
    val keptNoRepair = ops.Dedup.exactCrossDedupByFingerprint(
      crawl2, cat1, "fingerprint", "doc_id", "text")
    assert(keptNoRepair.count() == 3)
    // the WRITE half: merged catalog covers both batches' content
    val cat2 = ops.Dedup.updateFingerprintCatalog(cat1, "fingerprint", kept, "text")
    val expected = ops.Dedup.fingerprints(
      crawl1.union(Seq((14L, "a genuinely new café page")).toDF("doc_id", "text")), "text")
    assert(cat2.collect().map(_.getString(0)).toSet ==
      expected.collect().map(_.getString(0)).toSet)
  }

  test("the full corpus-prep chain composes and preserves its invariants") {
    val docs = Tables.load(spark, dir, "documents")
    val eval = docs.filter(col("doc_id") % 20 === 0)
    val total = docs.count()

    val prepped = etl.Pipeline.of("corpus", docs)
      .addField("text", ops.TextOps.cleanText(col("text")))
      .withTokenCount("text")
      .filter(col("n_tokens") >= 10)
      .removeBoilerplate("doc_id", "text", minDocs = 50)
      .dedupClusters("doc_id", "text", shingleN = 8)
      .decontaminate(eval, "doc_id", "text")
      .withSplit("doc_id", Seq("train" -> 0.9, "val" -> 0.1), ":prep")
      .withRepetitionRatio("text")
      .toDF
      .withColumn("n_tokens", ops.TextOps.tokenCount(col("text")).cast("long"))
      .localCheckpoint(true)

    val n = prepped.count()
    assert(n > 0 && n < total, s"prep should drop something: $n of $total")
    // decontamination: nothing from the eval slice's id space remains
    assert(prepped.filter(col("doc_id") % 20 === 0).count() == 0)
    // dedup: no two surviving docs share a fingerprint
    val fps = prepped.select(ops.TextOps.fingerprint(col("text")).as("fp"))
    assert(fps.count() == fps.distinct().count())
    // split labels are total and near the weights
    val bySplit = prepped.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.keySet == Set("train", "val"))
    assert(bySplit.values.sum == n)
    assert(math.abs(bySplit("train").toDouble / n - 0.9) < 0.05)
    // quality gate: clean text everywhere, no control chars survive
    assert(prepped.filter(col("text").rlike("[\\x00-\\x08\\x0e-\\x1f]")).count() == 0)

    // pack the train split into 512-token shards and build shard text
    val train = prepped.filter(col("split") === "train")
    val shards = ops.Packing.buildShards(
      train, "doc_id", "text", "n_tokens", budget = 512, sep = "\n")
      .localCheckpoint(true)
    val trainDocs = train.count()
    val trainTokens = train.agg(sum(col("n_tokens"))).head().getLong(0)
    val sh = shards.agg(
      sum(col("n_docs")), sum(col("n_tokens")), count(lit(1))).head()
    assert(sh.getLong(0) == trainDocs, "every train doc lands in exactly one shard")
    assert(sh.getLong(1) == trainTokens, "token mass is conserved")
    // concat-and-chunk: shard count is exactly ceil(total/budget) of
    // the shards actually touched by a document's first token — at
    // minimum totalTokens/512 can't be exceeded by more than the doc
    // count (each doc starts in one shard)
    assert(sh.getLong(2) <= trainTokens / 512 + 1)

    // chunk the val split to a 128-token context window: every chunk
    // within budget, every doc represented
    val va = prepped.filter(col("split") === "val")
    val chunks = ops.TextOps.chunkDocuments(va, "doc_id", "text", maxTokens = 128, overlap = 0)
    assert(chunks.filter(col("n_chunk_tokens") > 128).count() == 0)
    assert(chunks.select("doc_id").distinct().count() == va.count())
  }

  test("the web-corpus front half composes: URLs, quality gate, mixing, shuffle, report") {
    val docs = Tables.load(spark, dir, "documents")
    // synthesize a crawl URL per doc (the corpus has none), then run
    // the acquisition-side chain: canonical URL key → exact URL dedup →
    // Gopher gate → language mixing → reproducible shuffle
    // url key = (doc_id % 40, doc_id % 50): by CRT distinct ids 200
    // apart share a canonical URL, so the url-dedup step has real
    // collisions to collapse (a per-doc-unique param would make it a
    // no-op and the later assertions vacuous)
    val withUrl = docs.withColumn("url",
      concat(lit("HTTPS://Site"), (col("doc_id") % 40).cast("string"),
        lit(".Example.COM/p/"), (col("doc_id") % 50).cast("string"),
        lit("?utm_source=crawl")))
    val out = etl.Pipeline.of("web", withUrl)
      .withUrlColumns("url")
      .addStep("urlDedup")(_.dropDuplicates("url_norm")) // URL-level exact dedup
      // the synthetic corpus is word-salad: no doc reaches 50 words
      // AND 2 English stopwords, so retune the corpus-sensitive knobs
      // (the structural rules — symbols, bullets, alpha words — stay)
      .filterGopher("text", minWords = 20, minStopwordHits = 0)
      .sampleByStratum("doc_id", "lang",
        Seq("en" -> 1.0, "zh" -> 1.0), defaultFraction = 0.5, salt = ":web")
      .shuffleByHash("doc_id", ":order")
      .toDF
      .localCheckpoint(true)
    val n = out.count()
    assert(n > 0 && n < docs.count())
    // the URL dedup actually collapsed something: at most 200 distinct
    // canonical URLs exist for the 500 docs (lcm(40, 50) = 200)
    val urlDeduped = withUrl
      .withColumn("un", ops.UrlOps.normalizeUrl(col("url")))
      .select("un").distinct().count()
    assert(urlDeduped <= 200 && urlDeduped < docs.count())
    assert(out.select("url_norm").distinct().count() == n)
    assert(out.filter(!ops.TextOps.gopherPass(
      ops.TextOps.gopherSignals(col("text")),
      minWords = 20, minStopwordHits = 0)).count() == 0)
    // en/zh kept whole by the mixture (subset only via gopher/url)
    // and the shuffle is a permutation of the survivors
    val ids = out.select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(ids.distinct.size == ids.size)
    // report over the survivors: grand total row matches the count
    val rep = ops.Report.corpusReport(out, "text", Seq("lang"))
      .filter(col("gid") === 1).head()
    assert(rep.getAs[Long]("n_docs") == n)
    assert(rep.getAs[Double]("dup_rate") >= 0.0)
  }

  test("bloom dedup/decontamination, token budgets, and quantile buckets compose") {
    val docs = Tables.load(spark, dir, "documents")
    val eval = docs.filter(col("doc_id") % 20 === 0)
    val shipped = docs.filter(col("doc_id") % 7 === 0)

    val out = etl.Pipeline.of("r7b", docs.filter(col("doc_id") % 20 =!= 0))
      .dedupExactAgainst(shipped, "doc_id", "text")
      .decontaminateByBloom(eval, "doc_id", "text")
      .withQualityBucket("n_chars", stratumCol = Some("lang"))
      .sampleByTokenBudget("doc_id", "lang", "n_chars",
        Seq("en" -> 20000L, "de" -> 8000L, "zh" -> 15000L), ":r7b")
      .toDF.localCheckpoint(true)

    val n = out.count()
    assert(n > 0)
    // exact cross dedup: no survivor's fingerprint appears in shipped
    val survFps = out.select(ops.TextOps.fingerprint(col("text")).as("fp"))
    val shipFps = shipped.select(ops.TextOps.fingerprint(col("text")).as("fp")).distinct()
    assert(survFps.join(shipFps, Seq("fp"), "left_semi").count() == 0)
    // bloom decontamination was exact: the join-form verdict agrees
    assert(ops.Contamination.taintedIds(out, eval, "doc_id", "text").count() == 0)
    // only budgeted strata ship, each within budget + one crossing doc
    val byLang = out.groupBy("lang")
      .agg(sum(col("n_chars")).as("chars"), max(col("n_chars")).as("mx"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byLang.keySet.subsetOf(Set("en", "de", "zh")))
    val budgets = Map("en" -> 20000L, "de" -> 8000L, "zh" -> 15000L)
    byLang.foreach { case (lang, (chars, mx)) =>
      assert(chars <= budgets(lang) + mx, s"$lang over budget: $chars")
    }
    // buckets are labels over the pre-sampling distribution: all three
    // (or fewer for tiny strata) appear, never null for non-null lang
    assert(out.filter(col("bucket").isNull).count() == 0)
    assert(out.select("bucket").distinct().collect().map(_.getString(0)).toSet
      .subsetOf(Set("head", "middle", "tail")))
  }

  test("span dedup, filter decontamination, and LM/NB scoring compose") {
    val docs = Tables.load(spark, dir, "documents")
    val eval = docs.filter(col("doc_id") % 20 === 0)
    val lm = ops.LmScore.train(docs.filter(col("doc_id") % 10 === 0), "text")
    // distill the Gopher heuristic into a classifier — train NB on the
    // heuristic's own labels over half the corpus (a real pattern:
    // bootstrap a quality classifier from rules)
    val gopherLabel = ops.TextOps.gopherPass(
      ops.TextOps.gopherSignals(col("text")), minWords = 20, minStopwordHits = 0)
    val nb = ops.NbClassifier.train(
      docs.filter(col("doc_id") % 2 === 0), "text", gopherLabel)

    val out = etl.Pipeline.of("r7", docs.filter(col("doc_id") % 20 =!= 0))
      .dedupSpans("doc_id", "text", k = 8)
      .decontaminateByFilter(eval, "doc_id", "text")
      .withLmScore("text", lm)
      .withNbScore("text", nb)
      .toDF.localCheckpoint(true)

    val n = out.count()
    assert(n > 0 && n <= docs.filter(col("doc_id") % 20 =!= 0).count())
    // decontamination holds ON THE REWRITTEN TEXT (the filter ran
    // after span removal): the join-form verdict finds nothing
    assert(ops.Contamination.taintedIds(out, eval, "doc_id", "text").count() == 0)
    // span dedup actually removed something corpus-wide
    assert(out.agg(sum(col("removed_tokens"))).head().getLong(0) > 0)
    // both quality axes scored every doc that still has tokens — "has
    // tokens" by the NATIVE tokenization the scorers use (span removal
    // can leave a doc empty, where the reference tokenCount quirk —
    // and even split-of-normalized — still count one empty token but
    // the LM contract is null — see LmScore.withLmScore)
    val withToks = out.filter(
      size(graft.functions.exprs.word_ngram_hash_seq(
        col("text").cast("string"), 1)) > 0)
    assert(withToks.filter(col("lm_logprob").isNull).count() == 0)
    assert(withToks.filter(col("nb_score").isNull
      || isnan(col("nb_score")) || isnan(col("lm_logprob"))).count() == 0)
  }
}
