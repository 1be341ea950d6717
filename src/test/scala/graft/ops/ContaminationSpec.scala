package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ContaminationSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-contamination-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val evalPhrase = "alpha bravo charlie delta echo foxtrot golf hotel"

  private def evalDf = Seq(
    (100L, s"held out benchmark question about $evalPhrase and more"),
    (101L, "two short")
  ).toDF("doc_id", "text")

  private def corpus = Seq(
    // contains the full 8-token eval phrase — tainted
    (0L, s"training text that leaked $evalPhrase into the corpus"),
    // shares only a 7-token prefix (golf -> golfer breaks the 8-gram) — clean
    (1L, "prefix alpha bravo charlie delta echo foxtrot golfer suffix words"),
    // unrelated — clean
    (2L, "entirely unrelated training document with enough tokens to shingle"),
    // shorter than 8 tokens — can never be tainted
    (3L, "tiny doc"),
    // case/whitespace variants still match (normalized text)
    (4L, s"  Alpha  BRAVO charlie   delta ECHO foxtrot golf HOTEL tail  ")
  ).toDF("doc_id", "text")

  test("strictShingles: empty for short texts (no whole-text fallback)") {
    val sh = Seq((1L, "only three tokens"), (2L, "a b c d e f g h"))
      .toDF("id", "text")
      .select(TextOps.strictShingles(org.apache.spark.sql.functions.col("text"), 8))
      .collect().map(_.getSeq[String](0))
    assert(sh(0).isEmpty)
    assert(sh(1) == Seq("a b c d e f g h"))
  }

  test("word_ngram_hashes agrees with the composable shingles on counts and equality") {
    import org.apache.spark.sql.functions._
    val texts = corpus.union(evalDf)
    // distinct-gram COUNT must match the composable form in both modes
    val counts = texts.select(
      size(graft.functions.exprs.word_ngram_hashes(col("text"), 8, shortFallback = true)).as("nat"),
      size(array_distinct(TextOps.shingles(col("text"), 8))).as("comp"),
      size(graft.functions.exprs.word_ngram_hashes(col("text"), 8, shortFallback = false)).as("natS"),
      size(array_distinct(TextOps.strictShingles(col("text"), 8))).as("compS"))
      .collect()
    counts.foreach { r =>
      assert(r.getInt(0) == r.getInt(1), s"fallback-mode count mismatch: $r")
      assert(r.getInt(2) == r.getInt(3), s"strict-mode count mismatch: $r")
    }
    // two docs share a native gram hash iff they share a raw 8-gram
    def gramSets(strict: Boolean) = texts.select(col("doc_id"),
      explode(graft.functions.exprs.word_ngram_hashes(col("text"), 8, !strict)).as("h"))
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    def rawSets = texts.select(col("doc_id"),
      TextOps.strictShingles(col("text"), 8).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val nat = gramSets(strict = true)
    val raw = rawSets
    for (a <- nat.keys; b <- nat.keys if a < b) {
      val shareNative = (nat(a) & nat(b)).nonEmpty
      val shareRaw = (raw(a) & raw(b)).nonEmpty
      assert(shareNative == shareRaw, s"overlap disagreement for ($a, $b)")
    }
  }

  test("taintedIds finds exactly the docs sharing an 8-gram") {
    val tainted = Contamination.taintedIds(corpus, evalDf, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(tainted == Set(0L, 4L))
  }

  test("decontaminate keeps clean docs with all columns") {
    val kept = Contamination.decontaminate(corpus, evalDf, "doc_id", "text")
    assert(kept.columns.toSeq == Seq("doc_id", "text"))
    assert(kept.select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
  }

  test("decontaminateFilter: same verdicts as the join form, null text kept") {
    val kept = Contamination.decontaminateFilter(corpus, evalDf, "doc_id", "text")
    assert(kept.columns.toSeq == Seq("doc_id", "text"))
    assert(kept.select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
    // a null-text doc has no grams — kept on both paths
    val withNull = corpus.unionAll(
      Seq((9L, Option.empty[String])).toDF("doc_id", "text"))
    val f = Contamination.decontaminateFilter(withNull, evalDf, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val j = Contamination.decontaminate(withNull, evalDf, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(f == j && f.contains(9L))
  }

  test("decontaminateFilter fails loudly past the eval gram bound") {
    val e = intercept[IllegalArgumentException] {
      Contamination.decontaminateFilter(corpus, evalDf, "doc_id", "text",
        maxEvalGrams = 1)
    }
    assert(e.getMessage.contains("join form"))
  }

  test("decontaminateBloom: exact verdicts equal the join form, null text kept") {
    val withNull = corpus.unionAll(
      Seq((9L, Option.empty[String])).toDF("doc_id", "text"))
    val b = Contamination.decontaminateBloom(withNull, evalDf, "doc_id", "text")
    assert(b.columns.toSeq == Seq("doc_id", "text"))
    val bIds = b.select("doc_id").collect().map(_.getLong(0)).toSet
    val jIds = Contamination.decontaminate(withNull, evalDf, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(bIds == jIds && bIds.contains(9L))
    // an empty eval side builds an empty filter and taints nothing
    val none = Contamination.decontaminateBloom(
      corpus, evalDf.filter("doc_id < 0"), "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(none == Set(0L, 1L, 2L, 3L, 4L))
  }

  test("decontaminateBloom: approximate form never keeps a tainted doc") {
    // one-sided error: kept ⊆ exactly-clean, and every truly tainted
    // doc is gone (a bloom false positive may ALSO drop a clean doc,
    // never the reverse)
    val approx = Contamination.decontaminateBloom(
      corpus, evalDf, "doc_id", "text", approximate = true)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val clean = Contamination.decontaminate(corpus, evalDf, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(approx.subsetOf(clean))
    assert(approx.intersect(Set(0L, 4L)).isEmpty)
  }

  test("decontaminateBloom == decontaminate on the real corpus") {
    import org.apache.spark.sql.functions.col
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val evalS = docs.filter(col("doc_id") % 20 === 0)
    val corp = docs.filter(col("doc_id") % 20 =!= 0)
    val b = Contamination.decontaminateBloom(corp, evalS, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val j = Contamination.decontaminate(corp, evalS, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(b == j && b.nonEmpty)
  }

  test("contaminationReport counts distinct shared grams per tainted doc only") {
    val report = Contamination.contaminationReport(corpus, evalDf, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // docs 0 and 4 share exactly the one 8-token eval phrase; clean
    // docs do not appear at all
    assert(report == Map(0L -> 1L, 4L -> 1L), s"got $report")
    // a doc repeating the leaked phrase still counts it ONCE (distinct)
    val repeat = Seq((7L, s"$evalPhrase stop $evalPhrase")).toDF("doc_id", "text")
    val rep = Contamination.contaminationReport(repeat, evalDf, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rep(7L) == 1L, s"got $rep")
  }

  test("repetitionRatio separates looping text from prose") {
    import org.apache.spark.sql.functions.col
    val d = Seq(
      (1L, "buy now buy now buy now buy now buy now buy now"),
      (2L, "a perfectly ordinary sentence with no repeated phrases inside it"),
      (3L, "too short")
    ).toDF("id", "text")
      .select(col("id"), TextOps.repetitionRatio(col("text"), 3).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(d(1L) > 0.7)  // 12 tokens looping a 2-gram: nearly all 3-grams repeat
    assert(d(2L) == 0.0)
    assert(d(3L) == 0.0) // shorter than n -> whole-text shingle, ratio 0
    // NULL in, NULL out (and it must agree with the composable form's
    // duplicate fraction on non-null rows — checked via the oracle gate)
    import org.apache.spark.sql.functions.col
    val nullRow = Seq((9L, null: String)).toDF("id", "text")
      .select(TextOps.repetitionRatio(col("text"), 3)).head()
    assert(nullRow.isNullAt(0))
  }

  test("redactPii scrubs emails and phones, leaves the rest intact") {
    import org.apache.spark.sql.functions.col
    val d = Seq(
      (1L, "write to First.Last+tag@sub.example.co or call 555-123-4567 today"),
      (2L, "no pii here, just words and 12345 numbers"),
      (3L, "two mails a@b.io c@d.org and dotted phone 800.555.1234")
    ).toDF("id", "text")
      .select(col("id"),
        TextOps.redactPii(col("text")).as("r"),
        TextOps.matchCount(col("text"), TextOps.emailPattern).as("n"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    assert(d(1L) == ("write to <EMAIL> or call <PHONE> today", 1))
    assert(d(2L) == ("no pii here, just words and 12345 numbers", 0))
    assert(d(3L) == ("two mails <EMAIL> <EMAIL> and dotted phone <PHONE>", 2))
  }

  test("cleanText composes NFC, strips controls, collapses whitespace, keeps case") {
    import org.apache.spark.sql.functions.col
    val rows = Seq(
      (1L, "A  b\tc\u0001d cafe\u0301 "),
      (2L, "café"),        // already composed
      (3L, "Keep CASE as-is")
    ).toDF("id", "text")
      .select(col("id"), TextOps.cleanText(col("text")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows(1L) == "A b cd café") // composed é, controls gone, spaces collapsed
    assert(rows(2L) == "café")
    assert(rows(1L).last == rows(2L).last) // decomposed == composed after NFC
    assert(rows(3L) == "Keep CASE as-is")
  }

  test("tfIdf matches hand-computed smoothed values") {
    import org.apache.spark.sql.functions.col
    val docs = Seq((1L, "a b a"), (2L, "a c")).toDF("doc_id", "text")
    val got = TextOps.tfIdf(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // N=2; df(a)=2 -> idf=ln(3/3)+1=1; df(b)=df(c)=1 -> idf=ln(3/2)+1
    val idf1 = BigDecimal(math.log(1.5) + 1.0).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got((1L, "a")) == ((2L, 2L, 2.0)))
    assert(got((1L, "b")) == ((1L, 1L, idf1)))
    assert(got((2L, "a")) == ((1L, 2L, 1.0)))
    assert(got((2L, "c")) == ((1L, 1L, idf1)))
  }

  test("a short eval doc taints nothing") {
    val kept = Contamination.decontaminate(
      corpus, evalDf.filter($"doc_id" === 101L), "doc_id", "text")
    assert(kept.count() == 5)
  }
}
