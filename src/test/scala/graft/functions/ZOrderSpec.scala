package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Layout

/** ZOrderKey expression + Layout.zorderBy: interleave math against a
  * naive reference, inverse identity, masking/null semantics, SQL
  * registration, and the measurable layout property the whole thing
  * exists for (per-partition bounding boxes shrink on BOTH dims). */
class ZOrderSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-zorder-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  /** textbook per-bit reference, independently written */
  private def naive(bits: Int, vals: Seq[Long]): Long = {
    var out = 0L
    for (i <- 0 until bits; d <- vals.indices)
      out |= ((vals(d) >> i) & 1L) << (i * vals.size + d)
    out
  }

  test("interleave matches the naive reference across dims and widths") {
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 2000) {
      val n = 2 + rnd.nextInt(5) // 2..6 dims
      val bits = 1 + rnd.nextInt(63 / n)
      val vals = Array.fill(n)(rnd.nextLong() & ((1L << bits) - 1))
      assert(ZOrderKeyUtil.interleave(bits, vals) == naive(bits, vals.toSeq))
    }
  }

  test("deinterleave inverts interleave") {
    val rnd = new scala.util.Random(13)
    for (_ <- 0 until 2000) {
      val n = 2 + rnd.nextInt(3)
      val bits = 1 + rnd.nextInt(63 / n)
      val vals = Array.fill(n)(rnd.nextLong() & ((1L << bits) - 1))
      val key = ZOrderKeyUtil.interleave(bits, vals)
      assert(ZOrderKeyUtil.deinterleave(bits, n, key).toSeq == vals.toSeq)
      assert(key >= 0L, "keys must stay non-negative for order-preserving sorts")
    }
  }

  test("inputs are masked to the bit width; null dimension nulls the key") {
    val df = Seq[(java.lang.Long, java.lang.Long)](
      (3L, 5L),
      (3L + 512L, 5L),     // 512 = bit 9, outside 9 masked bits
      (-1L, 0L),           // negative: masked low bits only, never a throw
      (null, 5L))
      .toDF("x", "y")
      .withColumn("k", Layout.zorderKey(9, col("x"), col("y")))
    val rows = df.collect()
    assert(rows(0).getLong(2) == rows(1).getLong(2), "mask must drop bit 9")
    assert(rows(2).getLong(2) == ZOrderKeyUtil.interleave(9, Array(511L, 0L)))
    assert(rows(3).isNullAt(2))
  }

  test("zorder_key is SQL-registered") {
    GraftFunctions.registerAll(spark)
    val r = spark.sql("SELECT zorder_key(4, cast(5 as bigint), cast(3 as bigint)) AS k")
      .head.getLong(0)
    assert(r == naive(4, Seq(5L, 3L)))
  }

  test("ordering by the key is ordering by the interleave (dataframe path)") {
    val pts = for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y)
    val df = pts.toDF("x", "y")
    val keyed = df.withColumn("k", Layout.zorderKey(5, col("x"), col("y"))).collect()
    keyed.foreach { r =>
      assert(r.getLong(2) == naive(5, Seq(r.getLong(0), r.getLong(1))))
    }
  }

  test("zorderBy shrinks per-partition bounding boxes on BOTH dims vs a single-column sort") {
    // 64x64 grid, 16 target files: a perfect z-layout gives each
    // partition a ~16x16 rectangle (area 256); an x-sorted layout gives
    // 4-column strips covering the full y range (area 4*64 = 256 on x
    // ... but y never prunes). Score = sum over partitions of the
    // bounding AREA; the z-layout must beat the strip layout by a wide
    // margin on the combined metric max-side (worst pruned dimension).
    val pts = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y))
    val df = pts.toDF("x", "y").repartition(8) // scrambled arrival
    def maxSideSum(laid: org.apache.spark.sql.DataFrame): Long =
      Layout.boundingBoxes(laid, Seq("x", "y")).collect().map { r =>
        val xr = r.getAs[Long]("max_x") - r.getAs[Long]("min_x") + 1
        val yr = r.getAs[Long]("max_y") - r.getAs[Long]("min_y") + 1
        math.max(xr, yr)
      }.sum
    val z = maxSideSum(Layout.zorderBy(df, 16, 6, col("x"), col("y")))
    val xSorted = maxSideSum(df.repartitionByRange(16, col("x"))
      .sortWithinPartitions(col("x")))
    // x-sorted: every partition's y side is 64 → sum 16*64 = 1024.
    // z-ordered: rectangles near 16x16 → sum near 16*16 = 256.
    assert(xSorted >= 1024L, s"control layout unexpectedly good: $xSorted")
    assert(z <= xSorted / 2,
      s"z-layout ($z) should at least halve the worst-side sum of the x-sort ($xSorted)")
  }
}
