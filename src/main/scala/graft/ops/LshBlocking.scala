package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Shared LSH banding machinery for MinHash / SimHash / sign-LSH:
  * signature → per-band buckets → within-bucket candidate pairs.
  *
  * Scale design (the reason this is its own module):
  *  - buckets carry only (id, signature/payload) — never raw feature
  *    sets; exact verification joins data back for candidates only.
  *  - bucket sizes are counted FIRST and oversized buckets are dropped
  *    before any `collect_list` materializes them: a bucket with more
  *    than `maxBucket` members is non-discriminative by definition
  *    (its band carries no signal) and would otherwise produce
  *    O(maxBucket^2) pairs and an unbounded aggregation buffer.
  *  - pair output is deduplicated on (id1, id2) across bands.
  */
object LshBlocking {

  /** `df` must have columns `__id__` and `__sig__` (array); `payload`
    * optionally names an extra column to carry to both pair sides.
    * Returns (id1, id2, p1, p2) with id1 < id2 (payload columns only if
    * `payload` is set, else s1/s2 are the signatures).
    */
  def candidatePairs(
      df: DataFrame, bands: Int, rowsPerBand: Int,
      maxBucket: Int, payload: Option[String] = None): DataFrame = {
    val carry = payload.getOrElse("__sig__")

    val banded = df.select(
      col("__id__"), col(carry).as("__p__"),
      explode(transform(sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("band"),
          hash(slice(col("__sig__"), b * rowsPerBand + 1, lit(rowsPerBand))).as("bucket")))).as("bb"))
      .select(col("__id__"), col("__p__"), col("bb.band"), col("bb.bucket"))

    // bucket-size cap via a window count over the banding partitioning
    // (oversized, non-discriminative buckets never produce pairs), then
    // pair generation as a self-equi-join on (band, bucket): fully
    // codegen'd — no interpreted lambda pair expansion, no giant
    // collected-bucket rows, and AQE handles residual bucket skew
    val w = org.apache.spark.sql.expressions.Window.partitionBy("band", "bucket")
    // persist: the self-join below references this subtree twice, which
    // would otherwise recompute the (expensive) signature pipeline per
    // side; the banded frame is only (id, sig, band, bucket)
    val filtered = banded
      .withColumn("__n__", count(lit(1)).over(w))
      .filter(col("__n__").between(2, maxBucket))
      .drop("__n__")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    filtered.select(col("band"), col("bucket"), col("__id__").as("id1"), col("__p__").as("p1"))
      .join(
        filtered.select(col("band"), col("bucket"), col("__id__").as("id2"), col("__p__").as("p2")),
        Seq("band", "bucket"))
      .filter(col("id1") < col("id2"))
      .dropDuplicates("id1", "id2")
      .select(col("id1"), col("id2"), col("p1"), col("p2"))
  }
}
