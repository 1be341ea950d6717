package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MinHashSigSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-fn-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  def sigOf(rows: Seq[(Long, Seq[String])], k: Int = 16): Map[Long, Seq[Long]] =
    rows.toDF("id", "sh")
      .select($"id", exprs.minhash_sig($"sh", k).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap

  test("identical shingle sets give identical signatures; order-insensitive") {
    val sigs = sigOf(Seq(
      (1L, Seq("a b", "b c", "c d")),
      (2L, Seq("c d", "a b", "b c")),
      (3L, Seq("x y", "y z", "z w"))))
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(3L))
    assert(sigs(1L).size == 16)
  }

  test("overlapping sets agree on a fraction of components (jaccard estimate)") {
    val base = (0 until 100).map(i => s"sh$i")
    val sigs = sigOf(Seq(
      (1L, base),
      (2L, base.take(80) ++ (0 until 20).map(i => s"other$i"))), k = 64)
    val agree = sigs(1L).zip(sigs(2L)).count { case (a, b) => a == b } / 64.0
    assert(agree > 0.4 && agree < 0.95) // true jaccard = 80/120 = 0.67
  }

  test("interpreted eval matches codegen result") {
    val df = Seq((1L, Seq("p q", "q r"))).toDF("id", "sh")
    val viaCodegen = df.select(exprs.minhash_sig($"sh", 8)).head().getSeq[Long](0)
    // force interpreted path by evaluating through a filter on the array
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interpreted =
      try df.select(exprs.minhash_sig($"sh", 8)).head().getSeq[Long](0)
      finally {
        spark.conf.set("spark.sql.codegen.wholeStage", "true")
        spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      }
    assert(viaCodegen == interpreted)
  }

  test("word_ngram_hashes: interpreted matches codegen; null yields null") {
    val df = Seq((1L, "one two three four five"), (2L, "a b")).toDF("id", "t")
    def eval() = df.select($"id", exprs.word_ngram_hashes($"t", 3, shortFallback = true))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val viaCodegen = eval()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interpreted =
      try eval()
      finally {
        spark.conf.set("spark.sql.codegen.wholeStage", "true")
        spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      }
    assert(viaCodegen == interpreted)
    assert(viaCodegen(1L).size == 3)
    assert(viaCodegen(2L).size == 1) // fallback gram
    val nul = Seq((1L, null: String)).toDF("id", "t")
      .select(exprs.word_ngram_hashes($"t", 3, shortFallback = true)).head()
    assert(nul.isNullAt(0))
  }

  test("null input row yields null; empty set yields MaxValue minima") {
    val df = Seq((1L, Option(Seq("a"))), (2L, Option.empty[Seq[String]]))
      .toDF("id", "sh")
    val rows = df.select($"id", exprs.minhash_sig($"sh", 4).as("sig"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(rows(2L).isEmpty)
    val empty = Seq((1L, Seq.empty[String])).toDF("id", "sh")
      .select(exprs.minhash_sig($"sh", 4)).head().getSeq[Long](0)
    assert(empty.forall(_ == Long.MaxValue))
  }

  test("SQL registration via GraftFunctions.registerAll") {
    GraftFunctions.registerAll(spark)
    Seq((1L, Seq("a b", "b c"))).toDF("id", "sh").createOrReplaceTempView("shv")
    val viaSql = spark.sql("SELECT minhash_sig(sh, 8) AS s FROM shv").head().getSeq[Long](0)
    val viaCol = Seq((1L, Seq("a b", "b c"))).toDF("id", "sh")
      .select(exprs.minhash_sig($"sh", 8)).head().getSeq[Long](0)
    assert(viaSql == viaCol)
  }
}
