package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-sim-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("cosine_sim is bit-identical to the higher-order fold form") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select($"vec_id", graft.ops.VectorOps.asDouble($"embedding").as("v"))
    val pairs = emb.limit(20).crossJoin(
      emb.select($"vec_id".as("id2"), $"v".as("v2")).limit(20))
      .filter($"vec_id" =!= $"id2")
    val cmp = pairs.select(
      similarityExprs.cosine_sim($"v", $"v2").as("native"),
      graft.ops.VectorOps.cosineHof($"v", $"v2").as("hof"))
    assert(cmp.filter($"native" =!= $"hof").count() == 0) // exact, not approx
  }

  test("jaccard_sim set semantics with duplicates and edge cases") {
    val df = Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d")),      // 2/4
      (Seq("a", "a", "b"), Seq("a", "b", "b")),      // dup-insensitive: 2/2
      (Seq("a"), Seq("x")),                          // 0
      (Seq.empty[String], Seq.empty[String])         // both empty -> 1.0
    ).toDF("a", "b")
    val got = df.select(similarityExprs.jaccard_sim($"a", $"b")).collect().map(_.getDouble(0))
    assert(got.toSeq == Seq(0.5, 1.0, 0.0, 1.0))
  }

  test("sign_lsh_sig matches the posexplode+aggregate formulation bit-for-bit") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings").limit(50)
    val planes = graft.ops.VectorOps.hyperplanes(nPlanes = 16, dim = 512)
    val native = graft.ops.VectorOps.lshSignatures(emb, "vec_id", "embedding", planes)
      .select($"__id__", $"__sig__").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val agg = graft.ops.VectorOps.lshSignaturesAgg(emb, "vec_id", "embedding", planes)
      .select($"__id__", $"__sig__").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(native == agg) // same sequential dot order -> same sign bits
    assert(native.values.forall(sig => sig.size == 16 && sig.forall(b => b == 0 || b == 1)))
  }

  test("simhash_sig: identical token multisets match; unrelated differ") {
    val df = Seq(
      (1L, Seq("a", "b", "c", "d", "e", "f")),
      (2L, Seq("a", "b", "c", "d", "e", "f")),
      (3L, Seq("q", "r", "s", "t", "u", "v"))
    ).toDF("id", "toks")
    val sigs = df.select($"id", simhashExprs.simhash_sig($"toks", 64).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(3L))
    assert(sigs(1L).forall(b => b == 0 || b == 1))
  }
}
