package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IvfSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-ivf-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("IVF search recalls most brute-force top-k on the embeddings table") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    val queries = emb.filter($"vec_id" < 5)
    val ivf = Ivf.topK(emb, queries, "vec_id", "embedding", k = 5, nCells = 8, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = VectorOps.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (ivf & brute).size.toDouble / brute.size
    assert(recall >= 0.9, s"recall=$recall (ivf=${ivf.size}, brute=${brute.size})")
    assert(ivf.size == brute.size) // k results per query either way
  }

  test("a mostly-null corpus still trains on its non-null vectors (fraction over the sampled population)") {
    // 10k rows, 40 non-null: the sample fraction must be computed over
    // the 40 (fraction 1.0), not the 10k (expected sample ~0.01 rows →
    // silent empty-result wrong answer from topK/semanticNearDups)
    val rows = (0L until 10000L).map { i =>
      (i, if (i % 250 == 0) Seq(math.cos(i / 250.0), math.sin(i / 250.0)) else null)
    }
    val df = rows.toDF("id", "vec")
    val cs = Ivf.trainCentroidsOpt(df, "vec", nCells = 4)
    assert(cs.isDefined, "40 non-null vectors must train a quantizer")
    val hits = Ivf.topK(df, df.filter($"id" === 0L), "id", "vec", k = 3,
      nCells = 4, nProbe = 4).collect()
    assert(hits.nonEmpty, "neighbors of a real vector must be found")
  }

  test("cell assignment is deterministic and centroids are stable") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    val c1 = Ivf.trainCentroids(emb, "embedding", nCells = 4)
    val c2 = Ivf.trainCentroids(emb, "embedding", nCells = 4)
    assert(c1 == c2)
    val cells = Ivf.index(emb, "vec_id", "embedding", c1)
      .groupBy("__cell__").count().collect().map(_.getLong(1))
    assert(cells.sum == emb.count())
    assert(cells.length > 1) // quantizer actually partitions
  }

  test("a saved and reloaded quantizer is bit-identical (cell ids survive)") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    val c = Ivf.trainCentroids(emb, "embedding", nCells = 4)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-model").toString + "/q"
    Ivf.saveCentroids(spark, c, dir)
    val re = Ivf.loadCentroids(spark, dir)
    assert(re == c)
    // an index built before the round-trip matches one built after
    val a = Ivf.index(emb, "vec_id", "embedding", c)
      .select("__id__", "__cell__").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b = Ivf.index(emb, "vec_id", "embedding", re)
      .select("__id__", "__cell__").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a == b)
  }
}
