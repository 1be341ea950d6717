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

  /** Above this many (partition, bucket) cells the per-bucket offsets
    * stop being driver material — choose a wider `bucketWidth`. */
  private val maxBuckets = 4000000

  /** The shared order-aligned-bucket exclusive-prefix-sum protocol
    * behind [[globalCumsum]] (no partitions) and
    * [[graft.ops.Sampling.sampleByTokenBudget]] (one running total per
    * stratum): bucket rows by a prefix of their order key, pull ONE
    * bounded sum row per (partition, bucket) cell to the driver,
    * fold exclusive offsets (reset at each partition-key change —
    * cells arrive partition-major), broadcast them back, and window
    * only within (partition, bucket) — many small ordered partitions,
    * never one global (or one per-stratum) window.
    *
    * `bucket` must order consistently with `orderCols` (a bucket holds
    * an order-contiguous range), and partition/bucket keys must be
    * NON-NULL — a NULL there fails loudly: the driver fold would
    * misplace the null cell AND the equality join would silently drop
    * its rows while their weight still inflated later offsets. */
  private[ops] def bucketedCumsum(
      df: DataFrame, partitionCols: Seq[String], bucket: Column,
      orderCols: Seq[Column], weight: Column, what: String): DataFrame = {
    (Seq("__b__", "__ob__", "__off__", "cum_before") ++
      partitionCols.map(c => s"__p_$c")).foreach(c =>
      require(!df.columns.contains(c), s"input already has a column named $c"))
    val bucketed = df.withColumn("__b__", bucket)
    val cellCols = partitionCols :+ "__b__"

    val sums = bucketed.groupBy(cellCols.map(col): _*)
      .agg(sum(weight).as("__s__"))
      .orderBy(cellCols.map(col): _*)
      .limit(maxBuckets + 1)
      .collect()
    require(sums.length <= maxBuckets,
      s"$what: more than $maxBuckets (partition, bucket) cells — widen the bucket")
    val np = partitionCols.length
    require(sums.forall(r => (0 to np).forall(!r.isNullAt(_))),
      s"$what: a partition/order key contains NULL — keys must be non-null " +
        "(a null key has no position in the running order)")

    var prevKey: Seq[Any] = null
    var acc = 0L
    val offsetRows: Seq[org.apache.spark.sql.Row] = sums.toIndexedSeq.map { r =>
      // VALUE equality for the partition-change test: a collected
      // BinaryType cell is an Array[Byte], whose Seq equality is
      // reference-based — without the wrap, every cell would look like
      // a new partition and silently zero every offset
      val raw = (0 until np).map(r.get)
      val pk = raw.map {
        case a: Array[Byte] => a.toSeq
        case x => x
      }
      if (pk != prevKey) { prevKey = pk; acc = 0L }
      // the Row carries the RAW values — createDataFrame needs
      // Array[Byte] for BinaryType, the wrap is comparison-only
      val row = org.apache.spark.sql.Row.fromSeq(raw ++ Seq(r.get(np), acc))
      acc += r.getLong(np + 1)
      row
    }
    val spark = df.sparkSession
    val offSchema = org.apache.spark.sql.types.StructType(
      partitionCols.map(c => bucketed.schema(c).copy(name = s"__p_$c")) ++ Seq(
        bucketed.schema("__b__").copy(name = "__ob__"),
        org.apache.spark.sql.types.StructField(
          "__off__", org.apache.spark.sql.types.LongType, nullable = false)))
    val offsetDf = broadcast(spark.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(offsetRows).asJava, offSchema))

    val joinCond = (partitionCols.map(c => bucketed(c) === offsetDf(s"__p_$c")) :+
      (bucketed("__b__") === offsetDf("__ob__"))).reduce(_ && _)
    val w = Window.partitionBy(cellCols.map(col): _*).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed.join(offsetDf, joinCond)
      .withColumn("cum_before",
        col("__off__") + coalesce(sum(weight).over(w), lit(0L)))
      .drop("__b__", "__off__", "__ob__")
      .drop(partitionCols.map(c => s"__p_$c"): _*)
  }

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
    bucketedCumsum(df, Seq.empty,
      floor(col(orderCol).cast("long") / bucketWidth),
      Seq(col(orderCol)),
      coalesce(col(weightCol).cast("long"), lit(0L)),
      s"globalCumsum($orderCol)")
  }

  /** Adds `shard_id` = `budget`-token chunk index of the document's
    * first token under concat-and-chunk packing in `orderCol` order.
    * For budgets in REAL tokenizer tokens, weight with
    * [[graft.ops.Bpe.withTokenCount]]. */
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

  /** [[buildShards]] plus the per-shard BOUNDARY TABLE packed training
    * actually needs: `doc_offsets(i)` = sum of the weights of documents
    * 0..i-1 in shard order — the token offset at which the shard's
    * i-th document starts, i.e. the block-diagonal attention-mask /
    * position-id-reset boundaries for the packed sequence (offsets
    * count WEIGHT units only; a separator-token cost, if any, belongs
    * in the upstream weights). Same single hash aggregate as
    * [[buildShards]]; the offsets are an `aggregate` fold over the
    * already-sorted member structs — budget-bounded arrays, no extra
    * shuffle, no window. */
  def buildShardsWithBoundaries(
      df: DataFrame, orderCol: String, textCol: String, weightCol: String,
      budget: Long, sep: String = "\n", bucketWidth: Long = 100000): DataFrame = {
    // internal-name collision guard (the bucketedCumsum discipline): an
    // input already carrying one of these would be silently overwritten
    Seq("__wl__", "__m__").foreach(c =>
      require(!df.columns.contains(c), s"input already has a column named $c"))
    assignShards(df, orderCol, weightCol, budget, bucketWidth)
      .withColumn("__wl__", coalesce(col(weightCol).cast("long"), lit(0L)))
      .groupBy("shard_id")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__wl__")).as("n_tokens"),
        array_sort(collect_list(struct(col(orderCol), col(textCol).as("__t__"),
          col("__wl__")))).as("__m__"))
      .select(col("shard_id"), col("n_docs"), col("n_tokens"),
        concat_ws(sep, transform(col("__m__"), s => s.getField("__t__")))
          .as("shard_text"),
        aggregate(col("__m__"),
          struct(typedLit(Array.empty[Long]).as("offs"), lit(0L).as("run")),
          (acc, d) => struct(
            concat(acc.getField("offs"), array(acc.getField("run"))).as("offs"),
            (acc.getField("run") + d.getField("__wl__")).as("run")))
          .getField("offs").as("doc_offsets"))
  }
}
