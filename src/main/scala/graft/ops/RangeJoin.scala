package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.sql.{Column, DataFrame}

/** Point-in-interval (range) join as a binned equi-join.
  *
  * Spark plans a join whose only condition is an inequality
  * (`point BETWEEN lo AND hi`) as a BroadcastNestedLoopJoin — O(n·m)
  * pair evaluations and a single in-memory copy of the build side;
  * the classic scale fix is to discretize the domain into fixed-width
  * bins so the join becomes an equi-join on the bin id:
  *
  *  - each interval explodes into the bins it overlaps
  *    (`ceil(len/binWidth)+1` rows, bounded when interval length is);
  *  - each point lands in exactly one bin;
  *  - the equi-join on bin id shuffles (or broadcasts, when the binned
  *    interval side is small) instead of nested-looping, and the exact
  *    `lo <= point <= hi` predicate filters the bin collisions.
  *
  * Every qualifying (point, interval) pair appears exactly once: the
  * point's single bin is covered at most once by each interval's bin
  * sequence, so no dedup pass is needed.
  *
  * Pick `binWidth` near the typical interval length: much smaller
  * multiplies the interval side's row count, much larger turns every
  * bin into a mini cross product.
  */
object RangeJoin {

  /** Inner-join `points` to the `intervals` rows whose
    * `[loCol, hiCol]` (inclusive both ends) contains `pointCol`.
    * Column sets must be disjoint; both frames pass through unchanged
    * plus each other's columns. `extraKeys` are additional exact-match
    * key columns present on BOTH sides (e.g. a user id), folded into
    * the equi-join for free co-partitioning.
    */
  def pointInInterval(
      points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      binWidth: Double, extraKeys: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(!points.columns.contains("__bin__") && !intervals.columns.contains("__bin__"),
      "pointInInterval reserves the column name __bin__; rename it on the input first")
    val binnedIntervals = intervals.withColumn("__bin__",
      explode(sequence(
        bin(col(loCol), binWidth), bin(col(hiCol), binWidth))))
    val binnedPoints = points.withColumn("__bin__", bin(col(pointCol), binWidth))
    binnedPoints
      .join(binnedIntervals, Seq("__bin__") ++ extraKeys)
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bin__")
  }

  private def bin(c: Column, w: Double): Column =
    floor(c / w).cast(LongType)
}
