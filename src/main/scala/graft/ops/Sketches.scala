package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Sketch/summary aggregates for corpus-scale analysis — the questions
  * a 100 TB training-data pipeline asks before filtering: how many
  * distinct values (vocabulary size), where the quality thresholds sit
  * (quantiles), which values dominate (heavy hitters).
  *
  * All of these are single-pass, mergeable aggregations (map-side
  * partials, bounded sketch state per partition) — the only shapes that
  * answer these questions without sorting or shuffling the corpus:
  *  - distinct counts: HyperLogLog++ (`approx_count_distinct`),
  *    relative error `rsd`, state = one HLL register array.
  *  - quantiles: Greenwald-Khanna (`approx_percentile`), bounded by
  *    `accuracy`; `percentile` (exact) only for driver-bounded inputs.
  *  - heavy hitters: count-per-value over a capped candidate set.
  */
object Sketches {

  /** Approximate distinct count of `col`, HLL++ with `rsd` relative
    * standard deviation (default 5%). */
  def approxDistinct(df: DataFrame, c: Column, rsd: Double = 0.05): Long =
    df.agg(approx_count_distinct(c, rsd)).head().getLong(0)

  /** Vocabulary size estimate: distinct whitespace tokens of a text
    * column across the corpus. Tokens are exploded but never shuffled —
    * HLL partials merge at the driver. */
  def approxVocabulary(df: DataFrame, textCol: String, rsd: Double = 0.05): Long =
    df.select(explode(TextOps.tokens(TextOps.normalized(col(textCol)))).as("__tok__"))
      .agg(approx_count_distinct(col("__tok__"), rsd)).head().getLong(0)

  /** Approximate quantiles of a numeric column (Greenwald-Khanna;
    * `accuracy` = 1/relative-error, Spark default 10000). Returns one
    * value per requested probability. */
  def approxQuantiles(
      df: DataFrame, c: Column, probs: Seq[Double],
      accuracy: Int = 10000): Seq[Double] =
    Option(df.agg(percentile_approx(c, typedlit(probs), lit(accuracy)))
      .head().getSeq[Any](0))
      .map(_.map(_.toString.toDouble).toSeq)
      .getOrElse(Nil) // empty frame / all-null column -> NULL aggregate

  /** Top-`k` most frequent values of a column with exact counts of the
    * returned candidates: one hash aggregation plus a size-k take —
    * never a global sort. */
  def topValues(df: DataFrame, c: Column, k: Int): DataFrame =
    df.groupBy(c.as("value")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("value").asc)
      .limit(k)
}
