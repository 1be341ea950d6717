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
  /** Open-session accumulator held in state (MICROSECOND bounds —
    * `Timestamp.getTime` is millis and silently truncated event
    * times, shifting session boundaries and emitted bounds for
    * micro-precision streams; found by the q_stream_gapsessions
    * oracle). */
  case class OpenSession(start: Long, end: Long, count: Long, sum: Double)

  private def tsMicros(t: java.sql.Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  private def microsTs(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }
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
          val gapUs = gapMs * 1000L
          def close(s: OpenSession) = ClosedSession(
            key, microsTs(s.start), microsTs(s.end), s.count, s.sum)
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(close(s))
          } else {
            val sorted = rows.toIndexedSeq.sortBy(e => tsMicros(e.ts))
            val out = Seq.newBuilder[ClosedSession]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = tsMicros(e.ts)
              cur = cur match {
                case Some(s) if t <= s.end + gapUs =>
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
              // timeout clock is MILLIS (the GroupState contract)
              state.setTimeoutTimestamp(s.end / 1000L + gapMs)
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

  /** Streaming cross-corpus SEMANTIC dedup: drop every arriving row
    * whose embedding near-duplicates ANY member of a broadcast
    * [[graft.functions.ScreenCatalog]]
    * ([[graft.ops.Dedup.broadcastEmbeddingScreen]]). The screen is a
    * STATELESS codegen'd filter — no join, no state store, no
    * watermark — so it composes anywhere in a streaming plan and its
    * verdicts are bit-identical to the batch path
    * ([[graft.ops.Dedup.screenEmbeddings]], which this delegates to).
    * The catalog is bounded by design (the broadcast guard fails
    * loudly); dedup against an UNBOUNDED reference is the batch
    * join path's job. */
  def dedupEmbeddingsAgainst(
      stream: DataFrame, vecCol: String,
      catalogBc: org.apache.spark.broadcast.Broadcast[graft.functions.ScreenCatalog],
      threshold: Double): DataFrame =
    graft.ops.Dedup.screenEmbeddings(stream, vecCol, catalogBc, threshold)

  /** Streaming cross-corpus MEDIA dedup: drop every arriving row whose
    * bit signature (dHash / energy / structure / simhash) sits within
    * `maxHamming` of any broadcast-catalog member
    * ([[graft.ops.Dedup.broadcastSignatureScreen]]) — the media
    * sibling of [[dedupEmbeddingsAgainst]], same stateless codegen'd
    * filter, EXACT by pigeonhole when the catalog's bands exceed
    * `maxHamming`. */
  def dedupSignaturesAgainst(
      stream: DataFrame, sigCol: String,
      catalogBc: org.apache.spark.broadcast.Broadcast[graft.functions.SigScreenCatalog],
      maxHamming: Int): DataFrame =
    graft.ops.Dedup.screenSignatures(stream, sigCol, catalogBc, maxHamming)

  /** One banded arrival entering [[minhashNearDupPairs]]'s state op. */
  case class BandedDoc(
      band: Int, bucket: Int, id: Long, ts: java.sql.Timestamp, sig: Seq[Long])
  /** One (band, bucket) occupant held in streaming LSH state. */
  case class BucketMember(id: Long, tsMs: Long, sig: Seq[Long])
  /** Per-bucket streaming LSH state: occupants plus the saturation
    * latch (a bucket that ever exceeded `maxBucket` distinct docs is
    * non-discriminative — its members are freed and it goes silent
    * until the timeout reclaims it, mirroring the batch bucket drop).
    * `newestMs` is persisted SEPARATELY from the members: a saturated
    * bucket has none, and a skipped redelivery stores none, yet the
    * horizon and timeout must still never move backwards on a late
    * row — max(members.tsMs) alone would forget both cases. */
  case class BucketState(
      members: List[BucketMember], saturated: Boolean, newestMs: Long)
  /** A detected streaming near-dup: `id2` arrived after — and
    * near-duplicates — `id1` (drop id2 to dedup greedily). */
  case class StreamDupPair(
      id1: Long, id2: Long, est_jaccard: Double, ts: java.sql.Timestamp)

  /** Streaming MinHash near-duplicate DETECTION: the unbounded-input
    * analogue of [[graft.ops.Dedup.minhashNearDups]] (screen-only
    * form). Each arriving document is banded exactly like the batch
    * path (same native [[graft.functions.MinHashSig]] signatures, same
    * slice hashing), and per-(band, bucket) state remembers up to
    * `maxBucket` prior occupants; a new arrival whose signature agrees
    * with a remembered one at >= `threshold` emits the pair once, with
    * the PRIOR document as `id1` (greedy first-arrival-wins — a stream
    * has no total id order to prefer).
    *
    * Bounded state, exactly-once pairs, ONE stateful operator:
    *  - state per bucket is a member list with a SATURATION latch: the
    *    arrival of the (`maxBucket`+1)-th distinct doc marks the
    *    bucket non-discriminative (the batch path drops such buckets —
    *    [[graft.ops.LshBlocking]]), frees its members, and silences it
    *    until the event-time timeout reclaims it. Members older than
    *    `stateHorizonMs` (relative to the bucket's NEWEST activity —
    *    late rows can neither prune fresh members nor move the timeout
    *    backwards) are pruned per trigger;
    *  - a redelivered id (at-least-once sources) is ignored: its pairs
    *    were emitted on first arrival and it is not stored twice;
    *  - a pair colliding in SEVERAL bands would be emitted once per
    *    band, and deduping downstream would chain a second stateful
    *    operator (unsupported after flatMapGroupsWithState) — instead
    *    each bucket emits only when ITS band is the first band on
    *    which the two signatures' slices are equal, a pure function of
    *    the two signatures both sides already hold, so exactly one
    *    bucket elects itself per pair. (A pair meeting only through a
    *    32-bit slice-hash collision — no band slice actually equal —
    *    is not emitted: ~2^-32, the same odds the batch banding
    *    already accepts.)
    *
    * Recall relative to the batch screen is exact below the caps (the
    * spec pins it) and diverges exactly where both paths approximate:
    * pairs whose first-matching band's bucket saturated or aged out
    * are lost even if a later band still holds both sides (batch
    * analogously loses pairs in over-cap buckets), and pairs already
    * emitted before a bucket saturates are not retracted (batch drops
    * the whole bucket retroactively). LSH recall is statistical on
    * both paths; the divergence lives in the same regime. One
    * deliberate asymmetry: the batch path fails LOUDLY when EVERY
    * multi-member bucket is capped (zero-pairs-by-saturation, the r15
    * guard) — a stream cannot know "every bucket" on an unbounded
    * input, so here saturation stays a per-bucket latch and a
    * wall-to-wall-duplicate stream keeps only each bucket's
    * first-window pairs; watch saturation via the state metrics.
    */
  def minhashNearDupPairs(
      docs: DataFrame, idCol: String, textCol: String, tsCol: String,
      watermarkDelay: String, shingleN: Int = 3, numHashes: Int = 64,
      bands: Int = 16, threshold: Double = 0.8, maxBucket: Int = 200,
      stateHorizonMs: Long = 3600L * 1000): Dataset[StreamDupPair] = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val r = numHashes / bands
    graft.ops.ColumnChecks.requireIntegral(docs, idCol, "minhashNearDupPairs",
      "Streaming LSH state carries ids as LONG. Map string/UUID ids to a " +
        "surrogate long first (e.g. xxhash64).")
    // the exactly-once-pairs contract needs state to outlive lateness:
    // a row may arrive watermarkDelay late, and if its bucket has
    // already horizon-pruned the row's first delivery, a redelivery
    // would pair (and emit) again — so the horizon must cover the
    // whole lateness window
    val delayIv = org.apache.spark.sql.catalyst.util.IntervalUtils
      .safeStringToInterval(
        org.apache.spark.unsafe.types.UTF8String.fromString(watermarkDelay))
    require(delayIv != null && delayIv.months == 0,
      s"minhashNearDupPairs: cannot parse watermarkDelay '$watermarkDelay' " +
        "(month-based delays are not comparable to the state horizon)")
    val delayMs = delayIv.days * 86400000L + delayIv.microseconds / 1000L
    require(stateHorizonMs >= delayMs,
      s"minhashNearDupPairs: stateHorizonMs ($stateHorizonMs) must cover the " +
        s"watermark delay '$watermarkDelay' ($delayMs ms) — a redelivered row " +
        "older than the horizon would re-emit its pairs")
    import docs.sparkSession.implicits._

    def sliceEq(a: Seq[Long], b: Seq[Long], band: Int): Boolean = {
      var i = band * r
      val end = i + r
      while (i < end) { if (a(i) != b(i)) return false; i += 1 }
      true
    }
    def firstMatchingBand(a: Seq[Long], b: Seq[Long]): Int = {
      var band = 0
      while (band < bands) { if (sliceEq(a, b, band)) return band; band += 1 }
      -1
    }

    val banded = docs
      .select(col(idCol).cast("long").as("id"), col(tsCol).as("ts"),
        graft.functions.exprs.minhash_sig(
          graft.ops.TextOps.shingles(col(textCol), shingleN), numHashes).as("sig"))
      .withWatermark("ts", watermarkDelay)
      .select(col("id"), col("ts"), col("sig"),
        explode(transform(sequence(lit(0), lit(bands - 1)),
          b => struct(b.as("band"),
            hash(slice(col("sig"), b * r + 1, lit(r))).as("bucket")))).as("bb"))
      .select(col("bb.band").as("band"), col("bb.bucket").as("bucket"),
        col("id"), col("ts"), col("sig"))
      .as[BandedDoc]

    // the same banding arithmetic as LshBlocking.bandRows; the
    // StreamsSpec batch-equality test is the drift tripwire for both
    // this projection and the shared agreement estimator
    banded
      .groupByKey(d => (d.band, d.bucket))
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: (Int, Int), rows: Iterator[BandedDoc],
         state: GroupState[BucketState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val band = key._1
            val arrivals = rows.toIndexedSeq.sortBy(d => (d.ts.getTime, d.id))
            val prev = state.getOption
              .getOrElse(BucketState(Nil, saturated = false, Long.MinValue))
            // horizon reference: the newest activity this bucket has
            // EVER seen (persisted — members alone forget it when the
            // bucket saturates or an arrival is a skipped redelivery) —
            // a late-but-in-watermark row must neither prune fresh
            // members nor move the timeout backwards
            val newestMs = (arrivals.map(_.ts.getTime) :+ prev.newestMs).max
            var members = prev.members.filter(_.tsMs >= newestMs - stateHorizonMs)
            var saturated = prev.saturated
            val out = Seq.newBuilder[StreamDupPair]
            arrivals.foreach { d =>
              // a saturated bucket is silent; a redelivered id already
              // emitted its pairs and is not stored twice
              if (!saturated && !members.exists(_.id == d.id)) {
                if (members.size >= maxBucket) {
                  saturated = true
                  members = Nil
                } else {
                  members.foreach { m =>
                    val est = graft.functions.SimilarityUtil.agreement(m.sig, d.sig)
                    if (est >= threshold && firstMatchingBand(m.sig, d.sig) == band)
                      out += StreamDupPair(m.id, d.id, est, d.ts)
                  }
                  members = BucketMember(d.id, d.ts.getTime, d.sig) :: members
                }
              }
            }
            state.update(BucketState(members, saturated, newestMs))
            state.setTimeoutTimestamp(
              math.max(newestMs + stateHorizonMs, state.getCurrentWatermarkMs() + 1))
            out.result().iterator
          }
      }
  }

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

  private val boundedRunSeq = new java.util.concurrent.atomic.AtomicLong()

  /** Drain a BOUNDED stream synchronously and hand back its output as
    * a batch DataFrame: memory sink under a fresh per-run name (a
    * repeated caller — bench sweeps re-executing a gate query — must
    * not append into a previous run's table). The sink's rows are
    * copied into a self-contained local DataFrame and the temp view
    * dropped immediately, so repeated runs do NOT accumulate full
    * result copies on the driver (bounded streams are driver-sized by
    * contract — the memory sink already held the rows there). The
    * harness for running a streaming pipeline under a batch-parity
    * oracle. */
  def runBounded(df: DataFrame, outputMode: OutputMode = OutputMode.Append()): DataFrame = {
    val name = s"graft_bounded_run_${boundedRunSeq.incrementAndGet()}"
    val spark = df.sparkSession
    // bounded runs are state-store-setup-bound, not data-bound: each
    // micro-batch pays per-state-partition provider/commit overhead,
    // so a bounded drain under the session's batch-sized shuffle
    // partitioning (32 here, hundreds on a cluster) spends most of
    // its wall clock opening empty stores. 8 partitions is plenty for
    // driver-sized bounded data (measured: −35-40% per gate); an
    // UNBOUNDED deployment sizes this knob to its load instead, which
    // is why the narrowing is scoped to this harness and restored.
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    val bounded = math.min(8, prev.toInt).toString
    spark.conf.set("spark.sql.shuffle.partitions", bounded)
    try runToMemory(df, name, outputMode)
    finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    val sunk = spark.table(name)
    val out = spark.createDataFrame(sunk.collectAsList(), sunk.schema)
    spark.catalog.dropTempView(name)
    out
  }
}
