package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** In-repo invariants for the four gate queries that have NO SQL oracle
  * by design (seeded hashes / k-means that DuckDB cannot replicate), so
  * the driver records only a row count. Each spec re-verifies the
  * emitted frame against ground truth computed independently from the
  * SAME sf0.01 tables the gate uses: every emitted pair must satisfy
  * its threshold under an exact recomputation, and every emitted score
  * must equal the exact score — the rows-only driver signal is thus
  * backed by a hard property, not just planted-pair recall specs.
  */
class RowsOnlyInvariantSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-rows-only-invariants")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.01"

  private def docs: DataFrame =
    Tables.load(spark, dir, "documents").select("doc_id", "text")
  private def emb: DataFrame =
    Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), ops.VectorOps.asDouble(col("embedding")).as("v"))

  test("q_dedup_minhash: every emitted pair's jaccard is exact and >= threshold") {
    val out = SparkEntry.queries("q_dedup_minhash")(spark, dir)
    val rows = out
      .join(docs.select(col("doc_id").as("id1"), col("text").as("t1")), Seq("id1"))
      .join(docs.select(col("doc_id").as("id2"), col("text").as("t2")), Seq("id2"))
      .select(col("id1"), col("id2"), col("jaccard"),
        ops.Dedup.ngramJaccard(col("t1"), col("t2"), 5).as("exact"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("exact") >= 0.8,
        s"pair (${r.get(0)}, ${r.get(1)}) exact jaccard ${r.getAs[Double]("exact")} < 0.8")
      assert(r.getAs[Double]("jaccard") == r.getAs[Double]("exact"),
        s"pair (${r.get(0)}, ${r.get(1)}) emitted ${r.getAs[Double]("jaccard")} != exact")
    }
  }

  test("q_dedup_simhash: every emitted hamming distance is exact and <= max") {
    val out = SparkEntry.queries("q_dedup_simhash")(spark, dir)
    val sigs = ops.Dedup.simhashSignatures(docs, "doc_id", "text", 64)
    val rows = out
      .join(sigs.select(col("__id__").as("id1"), col("__sig__").as("s1")), Seq("id1"))
      .join(sigs.select(col("__id__").as("id2"), col("__sig__").as("s2")), Seq("id2"))
      .select(col("id1"), col("id2"), col("hamming"),
        functions.similarityExprs.hamming_dist(col("s1"), col("s2")).as("exact"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("exact") <= 8,
        s"pair (${r.get(0)}, ${r.get(1)}) exact hamming ${r.getAs[Int]("exact")} > 8")
      assert(r.getAs[Int]("hamming") == r.getAs[Int]("exact"),
        s"pair (${r.get(0)}, ${r.get(1)}) emitted ${r.getAs[Int]("hamming")} != exact")
    }
  }

  test("q_simsearch_lsh: every emitted cosine is exact and > threshold") {
    val out = SparkEntry.queries("q_simsearch_lsh")(spark, dir)
    val rows = out
      .join(emb.select(col("vec_id").as("id1"), col("v").as("v1")), Seq("id1"))
      .join(emb.select(col("vec_id").as("id2"), col("v").as("v2")), Seq("id2"))
      .select(col("id1"), col("id2"), col("cosine"),
        ops.VectorOps.cosine(col("v1"), col("v2")).as("exact"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("exact") > 0.25,
        s"pair (${r.get(0)}, ${r.get(1)}) exact cosine ${r.getAs[Double]("exact")} <= 0.25")
      assert(r.getAs[Double]("cosine") == r.getAs[Double]("exact"),
        s"pair (${r.get(0)}, ${r.get(1)}) emitted ${r.getAs[Double]("cosine")} != exact")
    }
  }

  test("lshNeighborsAuto (the embeddingNearDups production path): subset of exact, recall floor holds") {
    // the corpus-sized plan (r15): precision is exact BY CONSTRUCTION
    // (the exact cosine decides every emitted pair — subset must hold
    // bit-for-bit), and the 0.9-recall plan must actually clear a
    // recall floor against the exact all-pairs answer on this corpus
    val t = 0.4
    val auto = ops.VectorOps.lshNeighborsAuto(
      Tables.load(spark, dir, "embeddings"), "vec_id", "embedding",
      threshold = t)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = ops.Dedup.embeddingNearDupsExact(
      Tables.load(spark, dir, "embeddings"), "vec_id", "embedding", t)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    assert((auto -- exact).isEmpty,
      s"auto emitted non-pairs: ${(auto -- exact).take(5)}")
    // planned recall target is 0.9 AT the threshold; pairs far above
    // it collide with higher probability, so the realized recall on a
    // real corpus clears a conservative floor — a regression in the
    // plan math (bits too wide, bands too few) lands well below it
    val recall = auto.size.toDouble / exact.size
    assert(recall >= 0.6, f"auto recall $recall%.3f < 0.6 floor " +
      s"(${auto.size} of ${exact.size} exact pairs)")
  }

  test("q_dedup_semantic_fixed: emitted cosines exact and >= threshold; full replication == exact all-pairs") {
    val out = SparkEntry.queries("q_dedup_semantic_fixed")(spark, dir)
    val rows = out
      .join(emb.select(col("vec_id").as("id1"), col("v").as("v1")), Seq("id1"))
      .join(emb.select(col("vec_id").as("id2"), col("v").as("v2")), Seq("id2"))
      .select(col("id1"), col("id2"), col("cosine"),
        ops.VectorOps.cosine(col("v1"), col("v2")).as("exact"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("exact") >= 0.4,
        s"pair (${r.get(0)}, ${r.get(1)}) exact cosine ${r.getAs[Double]("exact")} < 0.4")
      assert(r.getAs[Double]("cosine") == r.getAs[Double]("exact"),
        s"pair (${r.get(0)}, ${r.get(1)}) emitted ${r.getAs[Double]("cosine")} != exact")
    }
    // replication = nCells multi-assigns every vector to every cell, so
    // the cell bound prunes nothing: must equal the exact all-pairs set
    val full = ops.Dedup.semanticNearDupsFixedCells(
      Tables.load(spark, dir, "embeddings"), "vec_id", "embedding",
      threshold = 0.4, nCells = 4, replication = 4)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = ops.Dedup.embeddingNearDupsExact(
      Tables.load(spark, dir, "embeddings"), "vec_id", "embedding", threshold = 0.4)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full == exact, s"full-replication SemDeDup != exact: " +
      s"missing ${exact -- full}, extra ${full -- exact}")
  }

  test("q_dedup_semantic (default corpus-sized path): emitted cosines exact and >= threshold; sizing math pins occupancy") {
    val out = SparkEntry.queries("q_dedup_semantic")(spark, dir)
    val rows = out
      .join(emb.select(col("vec_id").as("id1"), col("v").as("v1")), Seq("id1"))
      .join(emb.select(col("vec_id").as("id2"), col("v").as("v2")), Seq("id2"))
      .select(col("id1"), col("id2"), col("cosine"),
        ops.VectorOps.cosine(col("v1"), col("v2")).as("exact"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("exact") >= 0.4,
        s"pair (${r.get(0)}, ${r.get(1)}) exact cosine ${r.getAs[Double]("exact")} < 0.4")
      assert(r.getAs[Double]("cosine") == r.getAs[Double]("exact"),
        s"pair (${r.get(0)}, ${r.get(1)}) emitted ${r.getAs[Double]("cosine")} != exact")
    }
    // the sizing contract itself: at targetCell=t the chosen cell count
    // equals ceil(n*replication/t), so expected occupancy stays ~t no
    // matter the corpus — verified against a by-hand call at that count
    val n = Tables.load(spark, dir, "embeddings")
      .filter(col("embedding").isNotNull).count()
    val nCells = math.max(2L, (n * 2 + 511) / 512).toInt
    val byHand = ops.Dedup.semanticNearDupsFixedCells(
      Tables.load(spark, dir, "embeddings"), "vec_id", "embedding",
      threshold = 0.4, nCells = nCells, replication = 2)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val auto = out.select("id1", "id2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(auto == byHand,
      s"auto sizing != by-hand nCells=$nCells: missing ${byHand -- auto}, extra ${auto -- byHand}")
  }

  test("q_simsearch_ivf: emitted cosines are exact, ranks dense in score order") {
    val out = SparkEntry.queries("q_simsearch_ivf")(spark, dir)
    val rows = out
      .join(emb.select(col("vec_id").as("query_id"), col("v").as("vq")), Seq("query_id"))
      .join(emb.select(col("vec_id").as("neighbor_id"), col("v").as("vn")), Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"),
        ops.VectorOps.cosine(col("vq"), col("vn")).as("exact"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("neighbor_id") != r.getAs[Long]("query_id"))
      assert(r.getAs[Double]("cosine") == r.getAs[Double]("exact"),
        s"(${r.get(0)}, ${r.get(1)}) emitted ${r.getAs[Double]("cosine")} != exact")
    }
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rs) =>
      val byRank = rs.sortBy(_.getAs[Int]("rank"))
      assert(byRank.map(_.getAs[Int]("rank")).toSeq == (1 to rs.length),
        s"query $q ranks not dense 1..${rs.length}")
      // ordered by (cosine desc, neighbor_id asc)
      val key = byRank.map(r => (-r.getAs[Double]("cosine"), r.getAs[Long]("neighbor_id")))
      assert(key.sameElements(key.sorted), s"query $q ranks out of score order")
    }
  }

  test("q_dedup_cross_embedding: banded survivors between exact survivors and corpus; drops are true hits") {
    // the banded catalog dedup's precision is exact BY CONSTRUCTION
    // (exact cosine decides every candidate), so every DROPPED id must
    // be a genuine exact hit (dropped ⊆ exact-dropped, equivalently
    // exact-survivors ⊆ banded-survivors); recall ≥ floor bounds the
    // missed-pair tax the same way the lshNeighborsAuto arm does
    val all = Tables.load(spark, dir, "embeddings")
    val corpus = all.filter(col("vec_id") % 5 =!= 0)
    val catalog = ops.Dedup.embeddingCatalog(
      all.filter(col("vec_id") % 5 === 0), "vec_id", "embedding")
    val banded = SparkEntry.queries("q_dedup_cross_embedding")(spark, dir)
      .collect().map(_.getLong(0)).toSet
    val exactSurvivors = ops.Dedup.crossCorpusEmbeddingDedup(
      corpus, catalog, "id", "embedding", "vec_id", "embedding",
      threshold = 0.35, exact = true)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val corpusIds = corpus.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(exactSurvivors.subsetOf(banded),
      s"banded dropped non-hits: ${(exactSurvivors -- banded).take(5)}")
    assert(banded.subsetOf(corpusIds))
    val exactDropped = corpusIds.size - exactSurvivors.size
    val bandedDropped = corpusIds.size - banded.size
    assert(exactDropped > 0, "fixture has no cross hits — gate proves nothing")
    val recall = bandedDropped.toDouble / exactDropped
    assert(recall >= 0.6, f"cross-catalog recall $recall%.3f < 0.6 floor " +
      s"($bandedDropped of $exactDropped exact-dropped ids)")
    // dimension mismatch fails loudly, never silently reports no overlap
    val skinny = catalog.select(col("id"),
      slice(col("embedding"), 1, 3).as("embedding"))
    val e = intercept[IllegalArgumentException](
      ops.Dedup.crossCorpusEmbeddingNearDups(
        corpus, skinny, "id", "embedding", "vec_id", "embedding", 0.35))
    assert(e.getMessage.contains("dim"))
  }
}
