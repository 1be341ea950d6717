package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** [[LmScore]] — stupid-backoff trigram scoring. The reference model
  * is tiny enough to count by hand:
  *
  * train "a b a b c": C1 = {a:2, b:2, c:1}, T=5, V=3,
  * C2 = {"a b":2, "b a":1, "b c":1},
  * C3 = {"a b a":1, "b a b":1, "a b c":1}. */
class LmScoreSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-lm-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private lazy val model =
    LmScore.train(Seq((0L, "a b a b c")).toDF("doc_id", "text"), "text")

  test("every backoff level scores as hand-computed") {
    val rows = LmScore.scoreTokens(
      Seq((1L, "a b c d")).toDF("doc_id", "text"), "doc_id", "text", model)
      .collect().map(r => r.getInt(1) -> r.getDouble(2)).toMap
    // i=0 "a": unigram (2+1)/(5+3)
    assert(rows(0) == math.log10(3.0 / 8.0))
    // i=1 "b"|"a": bigram 2/2 (no alpha at its own level)
    assert(rows(1) == math.log10(1.0))
    // i=2 "c"|"a b": trigram 1/2
    assert(rows(2) == math.log10(1.0 / 2.0))
    // i=3 "d"|"b c": no trigram, no bigram, OOV unigram: 0.4^2 * (0+1)/(5+3)
    assert(rows(3) == math.log10(0.4 * 0.4 * (1.0 / 8.0)))
  }

  test("case-insensitive identity; familiar text scores above gibberish") {
    val out = LmScore.withLmScore(Seq(
      (1L, "A B A B C"),
      (2L, "zz qq ww pp vv")).toDF("doc_id", "text"), "text", model)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(1L) > out(2L))
    // the all-OOV doc scores exactly b backoffs of Laplace floor per token
    val oov = math.log10(0.4 * 0.4 * (1.0 / 8.0))
    val first = math.log10(1.0 / 8.0)         // i=0: unigram level, no alpha
    val second = math.log10(0.4 * (1.0 / 8.0)) // i=1: one backoff
    assert(out(2L) == (first + second + 3 * oov) / 5)
  }

  test("token-less and null documents score null; no token scores -inf or NaN") {
    val out = LmScore.withLmScore(Seq(
      (1L, "   "), (2L, null.asInstanceOf[String]), (3L, "a zz b")
    ).toDF("doc_id", "text"), "text", model)
      .collect().map(r => r.getLong(0) -> Option(r.get(2))).toMap
    assert(out(1L).isEmpty && out(2L).isEmpty)
    assert(out(3L).exists(v => java.lang.Double.isFinite(v.asInstanceOf[Double])))

    val all = LmScore.scoreTokens(
      Seq((9L, "a b c zz a qq b b b a")).toDF("doc_id", "text"),
      "doc_id", "text", model)
      .collect().map(_.getDouble(2))
    assert(all.length == 10 && all.forall(java.lang.Double.isFinite))
  }

  test("a saved and reloaded model scores identically") {
    val dir = java.nio.file.Files.createTempDirectory("graft-lm-model").toString + "/m"
    LmScore.saveModel(spark, model, dir)
    val reloaded = LmScore.loadModel(spark, dir)
    val docs = Seq((1L, "a b c d"), (2L, "zz a b qq")).toDF("doc_id", "text")
    val orig = LmScore.scoreTokens(docs, "doc_id", "text", model)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    val re = LmScore.scoreTokens(docs, "doc_id", "text", reloaded)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    assert(orig == re && orig.nonEmpty)
  }

  test("train fails loudly past the count-table bound") {
    val e = intercept[IllegalArgumentException] {
      LmScore.train(Seq((0L, "a b c d e f g h")).toDF("doc_id", "text"),
        "text", maxEntries = 3)
    }
    assert(e.getMessage.contains("model-sized"))
  }

  test("train fails loudly on a token-less reference corpus") {
    val e = intercept[IllegalArgumentException] {
      LmScore.train(Seq((0L, "   "), (1L, "")).toDF("doc_id", "text"), "text")
    }
    assert(e.getMessage.contains("no tokens"))
  }

  test("minCount prunes lookups but keeps the pre-prune T and V") {
    val pruned = LmScore.train(
      Seq((0L, "a b a b c")).toDF("doc_id", "text"), "text", minCount = 2L)
    // "c" pruned from C1, all of C3 pruned; T=5, V=3 unchanged, so a
    // "c" token backs off to the SAME Laplace floor as an OOV token
    val rows = LmScore.scoreTokens(
      Seq((1L, "c")).toDF("doc_id", "text"), "doc_id", "text", pruned)
      .collect().map(_.getDouble(2))
    assert(rows.toSeq == Seq(math.log10(1.0 / 8.0)))
  }
}
