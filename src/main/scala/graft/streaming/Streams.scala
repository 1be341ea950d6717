package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}

/** Structured Streaming surface of the engine.
  *
  * The reference is bounded-only (no streaming abstraction, SURVEY §1.4)
  * — this module is the forward-looking stream path: the same Column
  * expressions used by the batch operators run unchanged over unbounded
  * input; state is bounded by watermarks / timeouts so the plan survives
  * unbounded data the way the batch plans survive 100 TB.
  */
object Streams {

  /** File-stream over a directory of parquet (schema is mandatory for
    * streaming reads; take it from a batch sample or a literal). */
  def parquetStream(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  /** Watermarked sliding-window aggregation: the canonical streaming
    * group-by. Late rows beyond `watermarkDelay` are dropped and state
    * for closed windows is reclaimed — bounded state on unbounded input.
    */
  def windowedAgg(
      df: DataFrame, tsCol: String, watermarkDelay: String,
      windowDuration: String, slideDuration: String,
      keys: Seq[String])(aggs: Column*): DataFrame =
    df.withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDuration, slideDuration) +: keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Per-key running totals state for [[runningTotals]]. */
  case class Running(key: Long, count: Long, sum: Double)

  /** Custom per-key state via mapGroupsWithState (the
    * `KeyValueGroupedDataset` path for semantics windows can't express):
    * emits the updated running (count, sum) per key on every trigger.
    * State is per-key constant size; use timeouts to reclaim idle keys.
    */
  def runningTotals(
      events: Dataset[(Long, Double)]): Dataset[Running] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (key: Long, rows: Iterator[(Long, Double)], state: GroupState[Running]) =>
          val prev = state.getOption.getOrElse(Running(key, 0L, 0.0))
          val (n, s) = rows.foldLeft((prev.count, prev.sum)) {
            case ((c, acc), (_, v)) => (c + 1, acc + v)
          }
          val next = Running(key, n, s)
          state.update(next)
          next
      }
  }

  /** Streaming exact deduplication on a content fingerprint: keeps the
    * first arrival of each normalized-text fingerprint, drops later
    * copies. State holds one entry per DISTINCT fingerprint seen inside
    * the watermark horizon — `dropDuplicatesWithinWatermark` reclaims
    * entries once the watermark passes them, so state is bounded on an
    * unbounded stream (the batch analogue is [[graft.ops.Dedup.exact]];
    * "first" here is arrival order, not a sort, because a stream has no
    * total order to sort by). */
  def dedupExact(
      df: DataFrame, textCol: String, tsCol: String,
      watermarkDelay: String): DataFrame =
    df.withColumn("__fp__", graft.ops.TextOps.fingerprint(col(textCol)))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("__fp__")
      .drop("__fp__")

  /** Run a streaming DataFrame to a named in-memory table and process
    * everything currently available (synchronous test/dev harness). */
  def runToMemory(df: DataFrame, name: String, outputMode: OutputMode = OutputMode.Append()): Unit = {
    val q = df.writeStream
      .format("memory").queryName(name)
      .outputMode(outputMode)
      .start()
    q.processAllAvailable()
    q.stop()
  }
}
