package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The broadcast embedding screen
  * ([[Dedup.broadcastEmbeddingScreen]] / [[Dedup.screenEmbeddings]] /
  * [[graft.functions.MaxCatalogCosine]]): exact-arm parity with the
  * join path, banded subset/recall, loud guards, NULL passthrough. */
class EmbeddingScreenSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-embedding-screen")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"
  private def emb = graft.Tables.load(spark, dir, "embeddings")
  private def corpus = emb.filter(col("vec_id") % 5 =!= 0)
  private def catalogDf = emb.filter(col("vec_id") % 5 === 0)

  test("exact screen == the join path's exact verdicts, value-for-value") {
    val bc = Dedup.broadcastEmbeddingScreen(
      catalogDf, "vec_id", "embedding", banded = false)
    val screened = Dedup.screenEmbeddings(corpus, "embedding", bc, 0.35)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val joinSurvivors = Dedup.crossCorpusEmbeddingDedup(
      corpus, Dedup.embeddingCatalog(catalogDf, "vec_id", "embedding"),
      "id", "embedding", "vec_id", "embedding", threshold = 0.35, exact = true)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(screened == joinSurvivors)
    // and the emitted max cosine is bit-identical to a driver-side
    // max over CosineSim's own fold (the oracle-parity arithmetic)
    val cat = catalogDf
      .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("v"))
      .collect().map(_.getSeq[Double](1).toArray)
    val probes = corpus.limit(20)
      .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("v"),
        graft.functions.screenExprs.max_catalog_cosine(
          VectorOps.asDouble(col("embedding")), bc).as("mc"))
      .collect()
    probes.foreach { r =>
      val a = r.getSeq[Double](1).toArray
      def cos(b: Array[Double]): Double = {
        var dot = 0.0; var na = 0.0; var nb = 0.0
        a.indices.foreach { i => dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
        dot / (math.sqrt(na) * math.sqrt(nb))
      }
      val expect = cat.map(cos).filterNot(_.isNaN).max
      assert(r.getDouble(2) == expect,
        s"vec ${r.getLong(0)}: screen max ${r.getDouble(2)} != $expect")
    }
  }

  test("banded screen: exact survivors subset, drops are true hits, recall floor") {
    val bcB = Dedup.broadcastEmbeddingScreen(
      catalogDf, "vec_id", "embedding", threshold = 0.35, banded = true)
    val bcE = Dedup.broadcastEmbeddingScreen(
      catalogDf, "vec_id", "embedding", banded = false)
    val banded = Dedup.screenEmbeddings(corpus, "embedding", bcB, 0.35)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val exact = Dedup.screenEmbeddings(corpus, "embedding", bcE, 0.35)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val all = corpus.select("vec_id").collect().map(_.getLong(0)).toSet
    // a banded drop is decided by an exact cosine — it can only MISS
    // hits, never invent them
    assert(exact.subsetOf(banded))
    val exactDropped = all.size - exact.size
    val bandedDropped = all.size - banded.size
    assert(exactDropped > 0, "fixture has no hits — spec proves nothing")
    val recall = bandedDropped.toDouble / exactDropped
    assert(recall >= 0.6, f"banded screen recall $recall%.3f < 0.6")
  }

  test("loud guards: probe dim mismatch, over-size catalog; empty catalog and NULL vectors pass") {
    import spark.implicits._
    val bc = Dedup.broadcastEmbeddingScreen(
      catalogDf, "vec_id", "embedding", banded = false)
    val skinny = Seq((1L, Seq(0.1, 0.2, 0.3))).toDF("vec_id", "embedding")
    val e = intercept[Exception](
      Dedup.screenEmbeddings(skinny, "embedding", bc, 0.35).collect())
    assert(e.getMessage.contains("dims") ||
      Option(e.getCause).exists(_.getMessage.contains("dims")))
    intercept[IllegalArgumentException](
      Dedup.broadcastEmbeddingScreen(
        catalogDf, "vec_id", "embedding", banded = false, maxEntries = 3))
    // empty catalog: nothing can hit, everything survives
    val bcEmpty = Dedup.broadcastEmbeddingScreen(
      catalogDf.filter(lit(false)), "vec_id", "embedding", banded = false)
    assert(Dedup.screenEmbeddings(corpus, "embedding", bcEmpty, 0.35).count()
      == corpus.count())
    // NULL embedding: no vector, no verdict — survives
    val withNull = Seq((1L, null.asInstanceOf[Seq[Double]]))
      .toDF("vec_id", "embedding")
    assert(Dedup.screenEmbeddings(withNull, "embedding", bc, 0.35).count() == 1)
  }
}
