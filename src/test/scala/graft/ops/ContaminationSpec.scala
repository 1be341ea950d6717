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

  test("a short eval doc taints nothing") {
    val kept = Contamination.decontaminate(
      corpus, evalDf.filter($"doc_id" === 101L), "doc_id", "text")
    assert(kept.count() == 5)
  }
}
