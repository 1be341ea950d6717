package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.zorderExprs

/** Multi-dimensional data layout.
  *
  * A 100 TB table is pruned or scanned: parquet min/max stats skip a
  * file only when the file's value range excludes the predicate. A
  * table sorted by one column prunes on that column alone; every other
  * predicate scans everything. Z-ORDERING sorts by the Morton
  * interleave of several bucketized dimensions instead
  * ([[graft.functions.ZOrderKey]]), so each file covers a small
  * RECTANGLE of the key space and min/max stats prune on ANY keyed
  * dimension — the layout trick Delta/Iceberg `OPTIMIZE ZORDER BY`
  * applies, available here as a plain repartition+sort any parquet dir
  * can use.
  *
  * The reference has no layout management at all (its sinks stream
  * rows in arrival order — ref `CsvSink` / `Pipeline.save`); this is
  * part of the beyond-reference scale surface.
  */
object Layout {

  /** The Morton key column: `bits` low bits of each bucketized
    * dimension, interleaved. Dimensions are cast to long and MASKED to
    * `bits` bits — bucketize first (modulo, quantile rank, …). */
  def zorderKey(bits: Int, dims: Column*): Column =
    zorderExprs.zorder_key(bits, dims.map(_.cast("long")): _*)

  /** Re-layout `df` into `nPartitions` z-ordered ranges: range-
    * partition on the Morton key (contiguous, balanced key ranges —
    * one future file each), then sort within partitions so row groups
    * inside each file cluster too. Write the result with any sink;
    * every file's min/max then covers a small rectangle in
    * (dims...)-space.
    *
    * One full shuffle — the amortized cost of every later pruned scan,
    * same trade as [[Bucketing.writeBucketed]]. */
  def zorderBy(df: DataFrame, nPartitions: Int, bits: Int, dims: Column*): DataFrame = {
    require(nPartitions > 0, "nPartitions must be positive")
    val key = zorderKey(bits, dims: _*)
    df.repartitionByRange(nPartitions, key)
      .sortWithinPartitions(key)
  }

  /** Per-partition bounding boxes of the layout over `dims` — the
    * pruning-quality diagnostic: the sum over partitions of
    * `Π (max_d - min_d + 1)` approximates how much key-space a scan
    * with a point predicate must touch. Compare a layout against a
    * single-column sort to see what z-ordering buys. */
  def boundingBoxes(df: DataFrame, dims: Seq[String]): DataFrame = {
    require(dims.nonEmpty, "boundingBoxes needs at least one dimension")
    val withPid = df.withColumn("__pid__", spark_partition_id())
    val aggs = dims.flatMap(d =>
      Seq(min(col(d)).as(s"min_$d"), max(col(d)).as(s"max_$d")))
    withPid.groupBy(col("__pid__")).agg(aggs.head, aggs.tail: _*)
  }
}
