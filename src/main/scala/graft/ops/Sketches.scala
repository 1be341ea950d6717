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

  /** CCNet-style quantile bucketing (Wenzek et al. 2020 split web text
    * into head/middle/tail by per-language perplexity terciles): label
    * each row by where `scoreCol` falls in its stratum's score
    * distribution. `cuts` are ascending probabilities (default
    * terciles); `labels` has one more entry; rows in the k-th
    * inter-cut interval get `labels(k)` (score <= cutoff → earlier
    * label, so `head` = LOW scores — pass a reversed `labels` for
    * higher-is-better scores). NULL scores get a NULL label.
    *
    * Scale shape: cutoffs come from ONE mergeable aggregation pass —
    * Greenwald-Khanna `approx_percentile` (bounded sketch state,
    * map-side combine) by default, the exact `percentile` only when
    * `exact = true` (it materializes each stratum's values in its
    * aggregation buffer — validation/gate scale, and what the DuckDB
    * oracle can replicate bit-for-bit). Per-stratum cutoff rows are
    * stratum-count-sized: they broadcast back and labeling is a pure
    * projection; the corpus is read twice but never shuffled. With
    * `stratumCol = None` the single global cutoff row cross-joins
    * (one row broadcast — the tf-idf corpus-N shape). */
  def bucketByQuantile(
      df: DataFrame, scoreCol: String, stratumCol: Option[String],
      cuts: Seq[Double] = Seq(1.0 / 3, 2.0 / 3),
      labels: Seq[String] = Seq("head", "middle", "tail"),
      as: String = "bucket",
      exact: Boolean = false, accuracy: Int = 10000): DataFrame = {
    require(cuts.nonEmpty && cuts == cuts.sorted && cuts.forall(p => p > 0 && p < 1),
      s"cuts must be ascending probabilities in (0,1); got $cuts")
    require(labels.size == cuts.size + 1,
      s"need ${cuts.size + 1} labels for ${cuts.size} cuts; got ${labels.size}")
    (as +: "__qs" +: cuts.indices.map(i => s"__q$i")).foreach(c =>
      require(!df.columns.contains(c), s"input already has a column named $c"))
    val cutCols = cuts.zipWithIndex.map { case (p, i) =>
      (if (exact) percentile(col(scoreCol), lit(p))
       else percentile_approx(col(scoreCol), lit(p), lit(accuracy)))
        .as(s"__q$i")
    }
    val joined = stratumCol match {
      case Some(st) =>
        // null-SAFE stratum match: a null stratum (failed langid is
        // routine) is its own group and must meet its own cutoff row —
        // an equality join would null its cutoffs and mislabel every
        // such row with the last label regardless of score
        val cutoffs = df.groupBy(col(st).as("__qs"))
          .agg(cutCols.head, cutCols.tail: _*)
        df.join(broadcast(cutoffs), col(st) <=> col("__qs"), "left").drop("__qs")
      case None => df.crossJoin(broadcast(df.agg(cutCols.head, cutCols.tail: _*)))
    }
    val inner = cuts.indices.foldRight(lit(labels.last): Column) { (i, els) =>
      when(col(scoreCol) <= col(s"__q$i"), lit(labels(i))).otherwise(els)
    }
    joined.withColumn(as,
        when(col(scoreCol).isNull, lit(null).cast("string")).otherwise(inner))
      .drop(cuts.indices.map(i => s"__q$i"): _*)
  }
}
