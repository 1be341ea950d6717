package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass corpus health report: document counts, token/char volume,
  * exact-duplicate rate, and tokens-per-doc, rolled up over any
  * dimension columns (source, language, split, …) — the numbers a
  * training-data pipeline checks before and after every prep stage.
  *
  * Scale shape: ONE rollup aggregation over the corpus (grouping-sets
  * expansion + two-phase hash aggregate with map-side partials); the
  * duplicate rate needs distinct fingerprints, which is exact
  * `count_distinct` by default (oracle-checkable) and HyperLogLog
  * (`approx_count_distinct`, single-pass mergeable, constant memory)
  * with `approxDistinct = true` — the right setting at 100 TB, where
  * an exact distinct per grouping set would shuffle every fingerprint.
  *
  * Determinism: every emitted double is a SINGLE division (or 1.0
  * minus one) of exact integer counts — bit-identical across engines.
  */
object Report {

  def corpusReport(
      df: DataFrame, textCol: String, dims: Seq[String],
      approxDistinct: Boolean = false): DataFrame = {
    require(dims.nonEmpty, "need at least one rollup dimension")
    val fp = TextOps.fingerprint(col(textCol))
    val distinctAgg =
      if (approxDistinct) approx_count_distinct(fp) else count_distinct(fp)
    df.rollup(dims.map(col): _*)
      .agg(
        grouping_id().cast("int").as("gid"),
        count(lit(1)).as("n_docs"),
        sum(TextOps.tokenCount(col(textCol)).cast("long")).as("n_tokens"),
        sum(length(col(textCol)).cast("long")).as("n_chars"),
        distinctAgg.as("n_distinct"))
      // least(): an HLL estimate can overshoot the group count, and
      // 1 - distinct/docs would then go NEGATIVE; the clamp is exact on
      // the exact path (distinct <= docs always), so the oracle needs
      // no counterpart
      .withColumn("dup_rate",
        lit(1.0) - least(col("n_distinct"), col("n_docs")) / col("n_docs"))
      .withColumn("avg_doc_tokens", col("n_tokens") / col("n_docs"))
  }
}
