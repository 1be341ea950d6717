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

  /** Gap-based session aggregation on the NATIVE `session_window`
    * (SURVEY §7.3 preference (a): built-in op, codegen'd, AQE-aware) —
    * sessions close after `gap` of event-time silence; watermark
    * reclaims closed-session state. Works identically over batch (no
    * watermark needed) and stream. */
  def sessionAgg(
      df: DataFrame, tsCol: String, watermarkDelay: String, gap: String,
      keys: Seq[String])(aggs: Column*): DataFrame =
    df.withWatermark(tsCol, watermarkDelay)
      .groupBy(session_window(col(tsCol), gap) +: keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)

  /** One event entering [[gapSessions]]. */
  case class SessionEvent(key: Long, ts: java.sql.Timestamp, value: Double)
  /** Open-session accumulator held in state (millis bounds). */
  case class OpenSession(start: Long, end: Long, count: Long, sum: Double)
  /** A closed (emitted) session. */
  case class ClosedSession(
      key: Long, start: java.sql.Timestamp, end: java.sql.Timestamp,
      count: Long, sum: Double)

  /** Gap-based sessionization via `flatMapGroupsWithState` — the
    * custom-state escape hatch for session semantics the built-in
    * `session_window` can't carry (here: emitting each closed session
    * exactly once as a first-class row, with arbitrary accumulator
    * logic). State is ONE OpenSession per active key, reclaimed by the
    * event-time timeout when the watermark passes `end + gap` — bounded
    * on an unbounded stream.
    *
    * Within a trigger, rows are buffered and sorted by event time (a
    * group's per-trigger slice fits in memory by the same contract as
    * every GroupState operator); across triggers, late rows beyond the
    * watermark are dropped by the runtime before they reach this
    * function. */
  def gapSessions(
      events: Dataset[SessionEvent], gapMs: Long,
      watermarkDelay: String): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: Long, rows: Iterator[SessionEvent], state: GroupState[OpenSession]) =>
          def close(s: OpenSession) = ClosedSession(
            key, new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.end),
            s.count, s.sum)
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(close(s))
          } else {
            val sorted = rows.toIndexedSeq.sortBy(_.ts.getTime)
            val out = Seq.newBuilder[ClosedSession]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur = cur match {
                case Some(s) if t <= s.end + gapMs =>
                  Some(OpenSession(math.min(s.start, t), math.max(s.end, t),
                    s.count + 1, s.sum + e.value))
                case Some(s) =>
                  out += close(s)
                  Some(OpenSession(t, t, 1L, e.value))
                case None =>
                  Some(OpenSession(t, t, 1L, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end + gapMs)
            }
            out.result().iterator
          }
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
