package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Sequence packing for training shards: documents are conceptually
  * concatenated in `orderCol` order and chunked every `budget` tokens;
  * each document is assigned the shard its first token lands in
  * (concat-and-chunk packing). The primitive underneath is an EXACT
  * global running total — the textbook formulation
  * (`sum over (ORDER BY orderCol)`) plans as ONE partition holding the
  * entire corpus, the classic global-window bottleneck.
  *
  * Scale shape instead: order-aligned buckets (`orderCol div
  * bucketWidth`), per-bucket partial sums pulled to the driver (one
  * bounded row per bucket — guarded), exclusive prefix offsets
  * broadcast back, and a per-BUCKET window cumsum (many small ordered
  * partitions in parallel, never one global one). Deterministic and
  * bit-exact vs the naive window for integral weights.
  */
object Packing {

  /** Above this many buckets the per-bucket offsets stop being driver
    * material — choose a wider `bucketWidth`. */
  private val maxBuckets = 4000000

  /** Adds `cum_before` = sum of `weightCol` over all rows strictly
    * before this one in `orderCol` order (exclusive prefix sum).
    * `orderCol` must be integral, unique, and NON-NULL (a null order
    * key fails loudly — it has no position); NULL weights count as 0
    * (matching SQL SUM's null-skipping); weights should be
    * non-negative (shard assignment uses truncating division).
    *
    * The input is executed twice — a column-pruned (orderCol,
    * weightCol) pass for the bucket sums, then the full output plan —
    * so it must be DETERMINISTIC (as any reused DataFrame must);
    * localCheckpoint a non-deterministic source first. */
  def globalCumsum(
      df: DataFrame, orderCol: String, weightCol: String,
      bucketWidth: Long = 100000): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    Seq("__b__", "__off__", "cum_before").foreach(c =>
      require(!df.columns.contains(c), s"input already has a column named $c"))
    val weight = coalesce(col(weightCol).cast("long"), lit(0L))
    val bucketed = df.withColumn("__b__",
      floor(col(orderCol).cast("long") / bucketWidth))

    // one bounded row per bucket -> exclusive prefix offset per bucket
    val sums = bucketed.groupBy("__b__")
      .agg(sum(weight).as("__s__"))
      .orderBy("__b__")
      .limit(maxBuckets + 1)
      .collect()
    require(sums.length <= maxBuckets,
      s"more than $maxBuckets buckets at bucketWidth=$bucketWidth — widen the bucket")
    require(sums.forall(!_.isNullAt(0)),
      s"globalCumsum: $orderCol contains NULL — order keys must be non-null")
    var acc = 0L
    val offsets = sums.map { r =>
      val o = (r.getLong(0), acc); acc += r.getLong(1); o
    }
    val spark = df.sparkSession
    import spark.implicits._
    val offsetDf = broadcast(offsets.toSeq.toDF("__b__", "__off__"))

    // within-bucket exclusive cumsum: many SMALL ordered partitions
    val w = Window.partitionBy("__b__").orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed.join(offsetDf, Seq("__b__"))
      .withColumn("cum_before",
        col("__off__") + coalesce(sum(weight).over(w), lit(0L)))
      .drop("__b__", "__off__")
  }

  /** Adds `shard_id` = `budget`-token chunk index of the document's
    * first token under concat-and-chunk packing in `orderCol` order. */
  def assignShards(
      df: DataFrame, orderCol: String, weightCol: String,
      budget: Long, bucketWidth: Long = 100000): DataFrame = {
    require(budget > 0, "budget must be positive")
    // integral `div`, not floor(double /): exact at every magnitude
    // (a >2^53 cumulative token total would round a double across a
    // budget boundary)
    globalCumsum(df, orderCol, weightCol, bucketWidth)
      .withColumn("shard_id", expr(s"cum_before div $budget"))
  }

  /** Materializes the packed shards [[assignShards]] implies: one row
    * per shard with the member documents' `textCol` concatenated in
    * `orderCol` order separated by `sep` (an EOS sentinel in a real
    * pretraining flow), plus the member count and token total —
    * the write-ready form of a packed pretraining shard.
    *
    * Scale shape: one groupBy(shard_id) hash aggregate; the
    * within-shard rebuild is array_sort(collect_list(struct(order,
    * text))) over arrays that are BUDGET-bounded by construction
    * (a shard holds ~`budget` tokens of text), so no window sort and
    * no unbounded per-group state. NULL texts are skipped by
    * concat_ws but still count toward n_docs (and weight 0 toward
    * n_tokens) — filter them upstream if shards must be NULL-free. */
  def buildShards(
      df: DataFrame, orderCol: String, textCol: String, weightCol: String,
      budget: Long, sep: String = "\n", bucketWidth: Long = 100000): DataFrame =
    assignShards(df, orderCol, weightCol, budget, bucketWidth)
      .groupBy("shard_id")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(coalesce(col(weightCol).cast("long"), lit(0L))).as("n_tokens"),
        concat_ws(sep,
          transform(array_sort(collect_list(struct(col(orderCol), col(textCol)))),
            s => s.getField(textCol))).as("shard_text"))
}
