package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QuantizeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-quantize-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def emb = graft.Tables.load(spark, "/root/testdata/sf0.01", "embeddings")

  test("int8 top-k tracks the exact brute-force ranking on the embeddings table") {
    val queries = emb.filter($"vec_id" < 5)
    val scale = Quantize.fitScaleI8(emb, "embedding").get
    val codes = Quantize.quantizeI8(emb, "vec_id", "embedding", scale)
    val quant = Quantize.topKI8(codes, queries, "vec_id", "qvec", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val brute = VectorOps.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(quant.size == brute.size)
    val qSet = quant.map(t => (t._1, t._2)).toSet
    val bSet = brute.map(t => (t._1, t._2)).toSet
    val recall = (qSet & bSet).size.toDouble / bSet.size
    assert(recall >= 0.8, s"recall=$recall") // int8 rounding may swap near-ties
    // the quantized cosine of every recalled pair is close to exact
    val exactByPair = brute.map(t => (t._1, t._2) -> t._3).toMap
    quant.filter(t => exactByPair.contains((t._1, t._2))).foreach { t =>
      val d = math.abs(t._3 - exactByPair((t._1, t._2)))
      assert(d < 0.05, s"pair (${t._1},${t._2}) cosine drift $d")
    }
  }

  test("quantize -> dequantize is EXACT when components are multiples of the scale") {
    // scale 2^-5, components k * scale with |k| <= 127: floor(k + 0.5)
    // == k exactly, and k * scale is exact in IEEE — lossless round trip
    val s = 1.0 / 32.0
    val rows = (0L until 50L).map { i =>
      (i, Seq(-127L, -3L, 0L, 1L, (i % 120) + 1, 127L).map(_ * s))
    }
    val df = rows.toDF("id", "vec")
    val back = Quantize.quantizeI8(df, "id", "vec", s)
      .select($"id", Quantize.dequantizeI8($"qvec", s).as("dec"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    rows.foreach { case (i, v) => assert(back(i) == v, s"row $i") }
  }

  test("saturation and NaN components: clamp to +-127, NaN encodes as 0") {
    val df = Seq((1L, Seq(1e9, -1e9, Double.NaN, 0.5))).toDF("id", "vec")
    val q = Quantize.quantizeI8(df, "id", "vec", 1.0)
      .select($"qvec").head().getSeq[Byte](0)
    assert(q == Seq[Byte](127, -127, 0, 1)) // floor(0.5/1 + 0.5) = 1
  }

  test("fitScaleI8 degenerate corpora return None; quantizeI8 rejects bad scales loudly") {
    val empty = Seq.empty[(Long, Seq[Double])].toDF("id", "vec")
    assert(Quantize.fitScaleI8(empty, "vec").isEmpty)
    val allNull = Seq((1L, null: Seq[Double]), (2L, null: Seq[Double])).toDF("id", "vec")
    assert(Quantize.fitScaleI8(allNull, "vec").isEmpty)
    val allNan = Seq((1L, Seq(Double.NaN, Double.PositiveInfinity))).toDF("id", "vec")
    assert(Quantize.fitScaleI8(allNan, "vec").isEmpty)
    val allZero = Seq((1L, Seq(0.0, 0.0))).toDF("id", "vec")
    assert(Quantize.fitScaleI8(allZero, "vec").isEmpty)
    // Inf components are SKIPPED by the fit, not propagated
    val mixed = Seq((1L, Seq(Double.PositiveInfinity, 63.5))).toDF("id", "vec")
    assert(Quantize.fitScaleI8(mixed, "vec").contains(63.5 / 127.0))
    val df = Seq((1L, Seq(1.0))).toDF("id", "vec")
    val e = intercept[IllegalArgumentException] {
      Quantize.quantizeI8(df, "id", "vec", 0.0)
    }
    assert(e.getMessage.contains("positive finite"))
  }

  test("searching a float column instead of codes fails loudly") {
    val df = Seq((1L, Seq(1.0, 2.0))).toDF("id", "vec")
    val e = intercept[IllegalArgumentException] {
      Quantize.topKI8(df, df, "id", "vec", "vec", k = 1)
    }
    assert(e.getMessage.contains("array<tinyint>"))
  }

  test("randomProject: deterministic by tag, right shape, approximate geometry preserved") {
    val sub = emb.filter($"vec_id" < 120)
    val p1 = VectorOps.randomProject(sub, "vec_id", "embedding", outDim = 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val p2 = VectorOps.randomProject(sub, "vec_id", "embedding", outDim = 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(p1 == p2, "same tag must reproduce the same projection")
    assert(p1.values.forall(_.length == 16))
    val other = VectorOps.randomProject(sub, "vec_id", "embedding", outDim = 16, tag = "rp2")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(p1 != other, "a different tag is a different matrix")

    // JL sanity: projected cosine approximates original cosine on
    // average (sign planes, 64 -> 16). Not a per-pair guarantee —
    // assert the MEAN absolute deviation over ~100 deterministic pairs
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.lazyZip(b).map(_ * _).sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val orig = sub.select($"vec_id", VectorOps.asDouble($"embedding").as("e"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val ids = orig.keys.toSeq.sorted
    val devs = ids.sliding(2).collect { case Seq(a, b) =>
      math.abs(cos(orig(a), orig(b)) - cos(p1(a), p1(b)))
    }.toSeq
    val mad = devs.sum / devs.size
    assert(mad < 0.2, s"mean |cosine drift| = $mad over ${devs.size} pairs")
  }

  test("randomProject degenerate inputs: null vectors project to null, empty corpus stays empty") {
    val df = Seq((1L, Seq(1.0, -2.0, 3.0)), (2L, null: Seq[Double])).toDF("id", "vec")
    val rows = VectorOps.randomProject(df, "id", "vec", outDim = 4)
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[Double](1))).toMap
    assert(rows(1L) != null && rows(1L).length == 4)
    assert(rows(2L) == null)
    val empty = Seq.empty[(Long, Seq[Double])].toDF("id", "vec")
    assert(VectorOps.randomProject(empty, "id", "vec", outDim = 4).count() == 0)
  }
}
