package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** [[NbClassifier]] — closed-form multinomial NB. Hand-counted model:
  * positive "good clean prose" + "good text" (nPos=5),
  * negative "spam spam buy" + "buy now" (nNeg=5), V=7,
  * docsPos=docsNeg=2 so the prior is log10(1)=0. */
class NbClassifierSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-nb-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private lazy val model = NbClassifier.train(Seq(
    (true, "good clean prose"), (true, "good text"),
    (false, "spam spam buy"), (false, "buy now")
  ).toDF("y", "text"), "text", col("y"))

  test("per-token log odds match hand counts (smoothed, shared vocab)") {
    val lo = NbClassifier.scoreTokens(
      Seq((1L, "good spam zz")).toDF("doc_id", "text"), "doc_id", "text", model)
      .collect().map(r => r.getInt(1) -> r.getDouble(2)).toMap
    // good: (2+1)/12 vs (0+1)/12; spam mirrors; zz unseen -> exactly 0
    // (expectations written as the formula's own two-log difference —
    // log10(3) alone differs in the last ulp)
    def odds(cp: Long, cn: Long) =
      math.log10((cp + 1).toDouble / 12) - math.log10((cn + 1).toDouble / 12)
    assert(lo(0) == odds(2, 0))
    assert(lo(1) == odds(0, 2))
    assert(lo(2) == 0.0)
  }

  test("document score sums odds plus prior; verdict is score > 0") {
    val out = NbClassifier.withNbScore(Seq(
      (1L, "good good"), (2L, "spam buy now"), (3L, "good spam zz"), (4L, " ")
    ).toDF("doc_id", "text"), "text", model)
      .collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getBoolean(3))).toMap
    val good = math.log10(3.0 / 12) - math.log10(1.0 / 12)
    assert(out(1L) == (good + good, true))
    assert(out(2L)._1 < 0 && !out(2L)._2)
    assert(out(3L) == (0.0, false)) // exactly balanced -> not positive
    assert(out(4L) == (0.0, false)) // token-less: bare prior (log10(1))
  }

  test("case-insensitive identity, like every gram consumer") {
    val out = NbClassifier.withNbScore(
      Seq((1L, "GOOD Clean")).toDF("doc_id", "text"), "text", model)
      .collect().map(r => r.getDouble(2)).head
    assert(out == (math.log10(3.0 / 12) - math.log10(1.0 / 12))
      + (math.log10(2.0 / 12) - math.log10(1.0 / 12)))
  }

  test("a saved and reloaded model scores identically") {
    val dir = java.nio.file.Files.createTempDirectory("graft-nb-model").toString + "/m"
    NbClassifier.saveModel(spark, model, dir)
    val reloaded = NbClassifier.loadModel(spark, dir)
    // full equality of the broadcast payload (nPos/nNeg/vocab are
    // re-derived on load — they must come back exactly)
    val (a, b) = (model.value, reloaded.value)
    assert(a.keys.sameElements(b.keys) && a.pos.sameElements(b.pos)
      && a.neg.sameElements(b.neg))
    assert((a.nPos, a.nNeg, a.vocab, a.docsPos, a.docsNeg)
      == (b.nPos, b.nNeg, b.vocab, b.docsPos, b.docsNeg))
    val docs = Seq((1L, "good spam zz"), (2L, "buy buy now")).toDF("doc_id", "text")
    def key(m: org.apache.spark.broadcast.Broadcast[graft.functions.NbModel]) =
      NbClassifier.withNbScore(docs, "text", m)
        .collect().map(r => (r.getLong(0), r.getDouble(2), r.getBoolean(3))).toSet
    assert(key(model) == key(reloaded) && key(model).nonEmpty)
  }

  test("training fails loudly on a single-class corpus or an over-bound vocab") {
    val oneClass = Seq((true, "a b"), (true, "c")).toDF("y", "text")
    val e1 = intercept[IllegalArgumentException] {
      NbClassifier.train(oneClass, "text", col("y"))
    }
    assert(e1.getMessage.contains("both classes"))
    val e2 = intercept[IllegalArgumentException] {
      NbClassifier.train(Seq((true, "a b c"), (false, "d e f")).toDF("y", "text"),
        "text", col("y"), maxEntries = 2)
    }
    assert(e2.getMessage.contains("model-sized"))
    // a NULL label must fail loudly naming the column, not silently
    // count into the negative class and NPE later (r7 advice)
    val withNull = Seq((Option(true), "a b"), (Option(false), "c d"),
      (Option.empty[Boolean], "e f")).toDF("y", "text")
    val e3 = intercept[IllegalArgumentException] {
      NbClassifier.train(withNull, "text", col("y"))
    }
    assert(e3.getMessage.contains("NULL label"))
  }

  test("the classifier separates held-out documents with distinct vocabularies") {
    // the corpus tables' `lang`/`source` labels are metadata only (all
    // rows draw the same synthetic vocabulary), so separation is
    // planted: two class vocabularies behind a larger shared one
    val rnd = new scala.util.Random(7)
    val shared = Vector("the", "data", "table", "row", "join", "query", "scan")
    val posV = Vector("prose", "essay", "article")
    val negV = Vector("promo", "click", "offer")
    val docs = (0 until 200).map { i =>
      val y = i % 2 == 0
      val own = if (y) posV else negV
      val toks = Seq.fill(12)(shared(rnd.nextInt(shared.size))) ++
        Seq.fill(4)(own(rnd.nextInt(own.size)))
      (i.toLong, y, rnd.shuffle(toks).mkString(" "))
    }.toDF("doc_id", "y", "text")
    val m = NbClassifier.train(docs.filter(col("doc_id") < 100), "text", col("y"))
    val scored = NbClassifier.withNbScore(docs.filter(col("doc_id") >= 100), "text", m)
    val acc = scored.filter(col("nb_score_positive") === col("y")).count().toDouble /
      scored.count()
    assert(acc > 0.95, s"held-out accuracy $acc")
  }
}
