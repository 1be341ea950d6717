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
      orderCols: Seq[Column], weight: Column, what: String,
      requireUniqueOrder: Boolean = true): DataFrame = {
    (Seq("__b__", "__ob__", "__off__", "cum_before") ++
      partitionCols.map(c => s"__p_$c")).foreach(c =>
      require(!df.columns.contains(c), s"input already has a column named $c"))
    val bucketed = df.withColumn("__b__", bucket)
    val cellCols = partitionCols :+ "__b__"

    // The bucket-sum pass carries ONLY the weight sum — it combines
    // map-side, so the shuffle moves one partial row per
    // (mapPartition, cell), never per corpus row. (A count_distinct
    // here would be "the same scan" but would defeat the partial
    // aggregate: mixed distinct forces one shuffled row per distinct
    // order key ≈ per input row — a corpus-sized shuffle on the pass
    // shared by every Packing/Sampling caller. Order-key uniqueness
    // is checked inside the output window instead — see below.)
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
    // Order-key contract enforcement, riding the window sort the
    // prefix sum already pays (same partition + order spec ⇒ one
    // Window exec, one sort — zero extra scan or shuffle):
    //  - NULL order key → no position in the running order;
    //  - duplicate order key → the within-cell tie order is arbitrary,
    //    so the layout would not be rerun-stable. Duplicates always
    //    share a bucket (same key ⇒ same bucket ⇒ same cell), so
    //    adjacent-after-sort equality is a COMPLETE global uniqueness
    //    check. Both raise from the executors at execution time
    //    (fail-loud, distributed — no driver-side distinct pass).
    // `requireUniqueOrder = false` (the Sampling callers): duplicate
    // keys there are SELF-ties — the order cols are (hash(key), key),
    // so two tied rows are copies of the same key, and the
    // hostile-inputs contract is "tolerate, don't throw" — PROVIDED
    // the copies carry the same weight: tied rows with DIFFERING
    // weights make the budget/priority cut rerun-unstable (the
    // arbitrary tie order decides which weight crosses the budget),
    // so that case still raises. Copies that differ only in
    // non-weight payload get their two positions in arbitrary
    // per-copy assignment — callers that care must make the key
    // unique (the documented composite-key rule). The layout paths
    // (globalCumsum/packTokenIds/shards) stay strict: their tie
    // order IS the output.
    val wLag = Window.partitionBy(cellCols.map(col): _*).orderBy(orderCols: _*)
    val nullKey = orderCols.map(_.isNull).reduce(_ || _)
    val keysTie = orderCols.map(c => lag(c, 1).over(wLag) <=> c).reduce(_ && _)
    val dupKey =
      if (requireUniqueOrder) keysTie
      else keysTie && !(lag(weight, 1).over(wLag) <=> weight)
    val dupMsg =
      if (requireUniqueOrder)
        s"$what: duplicate order keys — the running order must be a total " +
          "order, so the order key must be UNIQUE (use a row id that is a " +
          "key, or a composite like doc_id*K+copy for oversampled corpora)"
      else
        s"$what: duplicate order keys with DIFFERING weights — tied rows " +
          "must be identical copies (same weight), or the arbitrary tie " +
          "order decides which weight crosses the budget and the cut is " +
          "not rerun-stable (use a composite key for oversampled corpora)"
    // The guard travels as its OWN column consumed by a Filter — not
    // folded into cum_before — so a caller (or a future pruning
    // change) that drops cum_before before the action cannot silently
    // skip contract enforcement: a Filter's predicate column survives
    // pruning by construction, and the optimizer cannot remove a
    // filter it cannot prove always-true.
    val orderGuard = when(nullKey, raise_error(lit(
        s"$what: NULL order key — order keys must be NON-NULL " +
          "(a null key has no position in the running order)")))
      .when(dupKey, raise_error(lit(dupMsg)))
      .otherwise(lit(0L))
    // ONE select holding both window expressions (the prefix sum and
    // the lag-based guard): same partition+order spec ⇒ Catalyst
    // extracts them into ONE Window exec over ONE sort (the
    // plan-pinned shuffle-free-guard contract)
    val keep = bucketed.columns.map(bucketed(_))
    bucketed.join(offsetDf, joinCond)
      .select(keep ++ Seq(
        (col("__off__") + coalesce(sum(weight).over(w), lit(0L))).as("cum_before"),
        orderGuard.as("__guard__")): _*)
      .filter(col("__guard__") === 0L)
      .drop("__b__", "__guard__")
  }

  /** Adds `cum_before` = sum of `weightCol` over all rows strictly
    * before this one in `orderCol` order (exclusive prefix sum).
    * `orderCol` must be integral, UNIQUE, and NON-NULL — both checked
    * loudly (a null key has no position; duplicate keys make the tie
    * order arbitrary, so the result would not be rerun-stable; the
    * uniqueness check rides the output window's existing sort, not an
    * extra scan, and raises at execution time); NULL weights count as 0
    * (matching SQL SUM's null-skipping); weights should be
    * non-negative (shard assignment uses truncating division).
    *
    * The input is executed twice — a column-pruned (orderCol,
    * weightCol) pass for the bucket sums, then the full output plan —
    * so it must be DETERMINISTIC (as any reused DataFrame must);
    * localCheckpoint a non-deterministic source first. */
  /** Exact long floor-division bucket: `floorDiv(key, width)` without
    * the double rounding of `floor(col / width)` (a key above 2^53
    * would bucket a few keys off the true boundary — benign for the
    * cumsum itself, which only needs bucket to be a non-decreasing
    * function of the key, but FATAL for [[packWholeDocs]]' seq_id
    * arithmetic, which needs every bucket to span at most
    * bucketWidth keys). pmod is non-negative, so the subtraction
    * lands exactly on a multiple of the width and the integral `div`
    * is exact at every magnitude (the assignShards discipline). */
  private def floorDivBucket(orderCol: String, bucketWidth: Long): Column =
    expr(s"(cast($orderCol AS BIGINT) - pmod(cast($orderCol AS BIGINT), " +
      s"$bucketWidth)) div $bucketWidth")

  def globalCumsum(
      df: DataFrame, orderCol: String, weightCol: String,
      bucketWidth: Long = 100000): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    bucketedCumsum(df, Seq.empty,
      floorDivBucket(orderCol, bucketWidth),
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
    * [[buildShards]]; the offsets are one native O(members) scan
    * ([[graft.functions.ExclusivePrefixSums]]) over the already-sorted
    * member weights — no extra shuffle, no window, and no
    * array-append fold accumulator (which would re-copy per member:
    * quadratic when a shard holds many zero-weight docs). */
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
        graft.functions.chunkExprs.exclusive_prefix_sums(
          transform(col("__m__"), d => d.getField("__wl__")))
          .as("doc_offsets"))
  }

  /** FIXED-LENGTH packed training sequences — the tensor a data
    * loader actually reads: documents' token-ID arrays (`idsCol`,
    * `array<int>`, e.g. [[graft.ops.Bpe.withTokenIds]]) are
    * conceptually concatenated in `orderCol` order and cut every
    * `seqLen` ids (GPT-style concat-and-chunk, documents SPLIT across
    * sequence boundaries — nothing is wasted); only the final
    * sequence is padded, with `padId`, to exactly `seqLen`. Returns
    * one row per sequence:
    *   - `seq_id`        — 0-based sequence index in corpus order
    *   - `input_ids`     — `array<int>`, length exactly `seqLen`
    *   - `doc_offsets`   — within-sequence start position of every
    *     document PIECE in the sequence (first element always 0) —
    *     the block-diagonal attention-mask / position-reset
    *     boundaries, the same offsets-in-weight-units convention as
    *     [[buildShardsWithBoundaries]] (a piece continuing from the
    *     previous sequence is a boundary too: attention cannot cross
    *     a sequence edge)
    *   - `n_docs`        — number of pieces (= size of doc_offsets)
    *   - `n_pad`         — trailing pad count (0 except the last
    *     sequence)
    * Documents with NULL or empty ids contribute nothing (a
    * zero-token document has no place in a token tensor — filter or
    * default upstream if that matters).
    *
    * `sepId` (optional) is the EOS/document-separator id: appended
    * after each non-empty document's ids BEFORE the cut — real
    * pretraining inserts an EOS between documents so the model learns
    * document ends ([[buildShards]]' text-`sep` semantics mirrored in
    * id space). The separator belongs to its document (it ends it):
    * boundary offsets are unchanged in meaning, every position shifts
    * by +1 per preceding document, and a causal label AT a separator
    * position is always the ignore id (the next position is a doc
    * boundary, a pad, or a sequence edge). Empty/NULL-ids documents
    * get no separator — they contribute nothing, as stated above.
    *
    * `orderCol` inherits [[globalCumsum]]'s full contract: integral,
    * NON-NULL, and UNIQUE — duplicate order keys would make the
    * within-bucket window tie order arbitrary, so the packed layout
    * would not be rerun-stable. BOTH are checked loudly (a lag probe
    * riding the output window's existing sort — zero extra scan or
    * shuffle, raising from the executors at execution time); use a
    * row id that is a key, as every gate does with doc_id, or a
    * composite key when the corpus is oversampled (q_pack_epochs'
    * doc_id·K+copy pattern).
    * The input is also EXECUTED TWICE (the [[globalCumsum]] contract:
    * a pruned (orderCol, size(ids)) pass for the bucket sums, then
    * the full plan) — when `idsCol` comes from an expensive encoder,
    * persist the input first: size(ids) forces the encode, so the
    * pruned pass re-pays it (measured: persist-first is ~30% faster
    * whole-op at a 2k-merge BPE model on sf0.1, and the gap grows
    * with tokenizer size — a 50k-merge production encoder is the
    * dominant stage). The op stays lazy by design (an internal
    * localCheckpoint would force the tensor through block storage on
    * its way to a one-pass sink and hide the plan from audits).
    *
    * Scale shape: the exclusive prefix sum is [[globalCumsum]]'s
    * order-aligned-bucket protocol (never one global window); each
    * document then EXPLODES into at most ceil(w/seqLen)+1
    * (sequence, piece) slices — pure per-row arithmetic — and one
    * groupBy(seq_id) assembles sequences whose per-group state is
    * seqLen-BOUNDED by construction (array_sort over ≤seqLen pieces,
    * flatten to exactly seqLen ids). One shuffle of the id payload,
    * which is the inherent movement: ids must regroup from document
    * order to sequence order. */
  def packTokenIds(
      df: DataFrame, orderCol: String, idsCol: String,
      seqLen: Int, padId: Int = 0, bucketWidth: Long = 100000,
      sepId: Option[Int] = None): DataFrame = {
    require(seqLen >= 1, s"seqLen must be >= 1, got $seqLen")
    Seq("__w__", "__seq__", "__piece__").foreach(c =>
      require(!df.columns.contains(c), s"input already has a column named $c"))
    val base = sepId match {
      case Some(sid) => df.withColumn(idsCol,
        when(size(col(idsCol)) > 0,
          concat(col(idsCol), array(lit(sid)))).otherwise(col(idsCol)))
      case None => df
    }
    val withW = base
      .withColumn("__w__", coalesce(size(col(idsCol)).cast("long"), lit(0L)))
      .filter(col("__w__") > 0)
    val cum = globalCumsum(withW, orderCol, "__w__", bucketWidth)
    val L = lit(seqLen.toLong)
    val pieces = cum
      // sequences this doc overlaps: first token at cum_before, last at
      // cum_before + w - 1
      .withColumn("__seq__", explode(sequence(
        expr("cum_before div " + seqLen),
        expr(s"(cum_before + __w__ - 1) div $seqLen"))))
      .withColumn("__piece__", {
        val gStart = greatest(col("__seq__") * L, col("cum_before"))
        val gEnd = least((col("__seq__") + 1) * L, col("cum_before") + col("__w__"))
        struct(
          (gStart - col("__seq__") * L).cast("int").as("off"),
          slice(col(idsCol), (gStart - col("cum_before") + 1).cast("int"),
            (gEnd - gStart).cast("int")).as("ids"))
      })
      .select(col("__seq__").as("seq_id"), col("__piece__"))
    pieces.groupBy("seq_id")
      .agg(array_sort(collect_list(col("__piece__"))).as("__m__"))
      .select(
        col("seq_id"),
        flatten(transform(col("__m__"), p => p.getField("ids"))).as("__ids__"),
        transform(col("__m__"), p => p.getField("off")).as("doc_offsets"),
        size(col("__m__")).as("n_docs"))
      .select(
        col("seq_id"),
        concat(col("__ids__"),
          array_repeat(lit(padId), lit(seqLen) - size(col("__ids__"))))
          .as("input_ids"),
        col("doc_offsets"), col("n_docs"),
        (lit(seqLen) - size(col("__ids__"))).as("n_pad"))
  }

  /** Greedy NEXT-FIT whole-document packing — the SFT-data shape: a
    * document is NEVER split across sequences (no cross-document
    * attention contamination, no piece arithmetic). Documents walk in
    * `orderCol` order; one that does not fit in the current sequence's
    * remainder starts the next sequence. A doc LONGER than seqLen
    * cannot be packed whole and fails loudly (filter oversized docs
    * upstream, or use [[packTokenIds]] — the splitting packer).
    * Empty / NULL id lists contribute nothing; `orderCol` inherits the
    * integral / NON-NULL / UNIQUE contract (checked in the fold).
    *
    * Scale shape: next-fit is a SEQUENTIAL fold — each placement
    * depends on the running fill — so it cannot distribute exactly.
    * The distributed form restarts the fold at every
    * `bucketWidth`-wide order-key range: buckets pack independently
    * (hash-partitioned by bucket, sorted within partitions, one
    * streaming pass — per-task state is ONE sequence buffer), costing
    * at most one extra partly-padded sequence per bucket — bounded,
    * rerun-stable, no cross-bucket carry to serialize on.
    * `seq_id = bucket·bucketWidth + index-within-bucket` (unique and
    * monotone in pack order since a bucket spans at most bucketWidth
    * keys; NOT dense across buckets).
    *
    * Output: `seq_id`, `input_ids` (padded to seqLen), `doc_ids` (the
    * packed documents' order keys, in order), `doc_offsets` (each
    * document's first-token position — [[withCausalLabels]] consumes
    * them unchanged), `n_docs`, `n_pad`. */
  def packWholeDocs(
      df: DataFrame, orderCol: String, idsCol: String,
      seqLen: Int, padId: Int = 0, bucketWidth: Long = 100000): DataFrame = {
    require(seqLen >= 1, s"seqLen must be >= 1, got $seqLen")
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    Seq("__b__", "__k__", "__ids__").foreach(c =>
      require(!df.columns.contains(c), s"input already has a column named $c"))
    val what = s"packWholeDocs($orderCol)"
    val prepared = df
      .select(
        floorDivBucket(orderCol, bucketWidth).as("__b__"),
        col(orderCol).cast("long").as("__k__"),
        col(idsCol).cast("array<int>").as("__ids__"))
      .filter(size(col("__ids__")) > 0)
      .repartition(col("__b__"))
      .sortWithinPartitions("__b__", "__k__")
    val sl = seqLen
    val pad = padId
    val bw = bucketWidth
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("seq_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("input_ids",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.IntegerType), nullable = false),
      org.apache.spark.sql.types.StructField("doc_ids",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType), nullable = false),
      org.apache.spark.sql.types.StructField("doc_offsets",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.IntegerType), nullable = false),
      org.apache.spark.sql.types.StructField("n_docs",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("n_pad",
        org.apache.spark.sql.types.IntegerType, nullable = false)))
    val out = prepared.mapPartitions { it =>
      var started = false
      var seqBucket = 0L
      var local = 0L
      var fill = 0
      var prevKey = 0L
      val ids = scala.collection.mutable.ArrayBuffer.empty[Int]
      val docIds = scala.collection.mutable.ArrayBuffer.empty[Long]
      val offs = scala.collection.mutable.ArrayBuffer.empty[Int]
      def flush(): org.apache.spark.sql.Row = {
        val nPad = sl - fill
        val row = org.apache.spark.sql.Row(
          seqBucket * bw + local,
          (ids.toSeq ++ Seq.fill(nPad)(pad)),
          docIds.toSeq, offs.toSeq, docIds.length, nPad)
        ids.clear(); docIds.clear(); offs.clear(); fill = 0
        row
      }
      val main = it.flatMap { r =>
        if (r.isNullAt(1))
          throw new IllegalArgumentException(
            s"$what: NULL order key — order keys must be NON-NULL " +
              "(a null key has no position in the running order)")
        val b = r.getLong(0)
        val k = r.getLong(1)
        val doc = r.getSeq[Any](2)
        if (doc.contains(null))
          throw new IllegalArgumentException(
            s"$what: ids list for key $k contains NULL elements")
        val w = doc.length
        if (w > sl)
          throw new IllegalArgumentException(
            s"$what: document $k has $w tokens > seqLen=$sl and cannot " +
              "be packed whole — filter oversized docs upstream or use " +
              "packTokenIds (the splitting packer)")
        if (started && k == prevKey)
          throw new IllegalArgumentException(
            s"$what: duplicate order key $k — the running order must be " +
              "a total order, so the order key must be UNIQUE")
        val flushed: Option[org.apache.spark.sql.Row] =
          if (started && (b != seqBucket || fill + w > sl)) {
            val f = flush()
            if (b != seqBucket) { seqBucket = b; local = 0L }
            else local += 1L
            Some(f)
          } else {
            if (!started) { started = true; seqBucket = b; local = 0L }
            None
          }
        offs += fill
        docIds += k
        ids ++= doc.iterator.map(_.asInstanceOf[Int])
        fill += w
        prevKey = k
        flushed.iterator
      }
      val tail = new scala.collection.AbstractIterator[org.apache.spark.sql.Row] {
        private var done = false
        def hasNext: Boolean = !done && started
        def next(): org.apache.spark.sql.Row = { done = true; flush() }
      }
      main ++ tail
    }(org.apache.spark.sql.Encoders.row(outSchema))
    out
  }

  /** Causal-LM `labels` for [[packTokenIds]] output — the last column
    * of the standard training-example shape: label(i) =
    * input_ids(i+1) (next-token prediction), with `ignoreId` wherever
    * the next position must NOT be predicted — past the real tokens
    * (pads and the sequence end) and across a document boundary
    * (position i+1 in `doc_offsets`: the next token starts a
    * different document piece, and predicting across the attention
    * reset would leak). One native O(seqLen + pieces) pass per row
    * ([[graft.functions.CausalLabels]] — a per-position
    * `array_contains` over the offsets would be O(seqLen · pieces),
    * the same per-row hazard class as the r13 chunk fold), no
    * shuffle; -100 is the usual loss-ignore convention. */
  /** Launch-time AUDIT over [[packTokenIds]] output — the check a
    * training run makes before shipping a tensor set, as data (the
    * [[graft.ops.Sampling.mixtureAudit]] discipline): sequence count,
    * token capacity vs real tokens, pad accounting, piece (document
    * fragment) stats, and `pads_within_one_seq` — packTokenIds' pad
    * contract (pad exists ONLY in the final sequence) restated as a
    * column, so a drifted packer is visible in the audit table. ONE
    * aggregate, one row. */
  def packAudit(seqs: DataFrame): DataFrame =
    seqs.agg(
      count(lit(1)).as("n_seqs"),
      sum(size(col("input_ids")).cast("long")).as("capacity"),
      sum((size(col("input_ids")) - col("n_pad")).cast("long")).as("real_tokens"),
      sum(col("n_pad").cast("long")).as("pad_tokens"),
      max(col("n_pad")).as("max_pad"),
      sum(col("n_docs").cast("long")).as("n_pieces"),
      max(col("n_docs")).as("max_pieces"),
      (sum(when(col("n_pad") > 0, lit(1L)).otherwise(lit(0L))) <= 1L)
        .as("pads_within_one_seq"))
      .withColumn("pad_fraction",
        col("pad_tokens").cast("double") / col("capacity").cast("double"))

  def withCausalLabels(seqs: DataFrame, ignoreId: Int = -100): DataFrame = {
    require(!seqs.columns.contains("labels"),
      "input already has a column named labels")
    seqs.withColumn("labels",
      graft.functions.chunkExprs.causal_labels(
        col("input_ids"), col("doc_offsets"), col("n_pad"), ignoreId))
  }

  /** Deterministic SHUFFLE-AND-SHARD of a packed sequence set — the
    * file layout a data loader reads: training order must be a
    * reproducible random permutation (packing preserves corpus order,
    * which a model must not see), and the permuted set is cut into
    * `rowsPerShard`-row shard files. Adds to every row:
    *   - `rank`     — 0-based position in the shuffled order: ascending
    *     (md5-prefix of (`idCol`, salt), id) — the same engine-portable
    *     permutation family as [[Sampling.shuffleByHash]], total
    *     whenever `idCol` is unique (ties break on the id), rerun- and
    *     engine-stable, and a fresh independent permutation per salt
    *   - `shard_id` — `rank div rowsPerShard` (integral `div`, the
    *     [[assignShards]] exactness rule)
    *
    * Scale shape: the rank is an exclusive prefix COUNT through
    * [[bucketedCumsum]]'s order-aligned-bucket protocol — the hash
    * prefix's own leading `bucketHexDigits` digits are the bucket (a
    * hex-string bucket orders consistently with the full hash by
    * construction), so the permutation costs per-bucket window sorts,
    * never one global sort. 16^2 = 256 buckets at the default; raise
    * to 3-4 digits (4096/65536 buckets) for billion-sequence sets.
    * `idCol` must be non-null ([[bucketedCumsum]] fails loudly). A
    * writer partitions by `shard_id` and sorts by `rank` within each
    * file. */
  def assignShuffledShards(
      df: DataFrame, idCol: String, salt: String, rowsPerShard: Long,
      bucketHexDigits: Int = 2): DataFrame = {
    require(rowsPerShard > 0, s"rowsPerShard must be positive, got $rowsPerShard")
    require(bucketHexDigits >= 1 && bucketHexDigits <= 8,
      s"bucketHexDigits must be in [1, 8], got $bucketHexDigits")
    require(!df.columns.contains("__sh__"),
      "input already has a column named __sh__")
    val hashed = df.withColumn("__sh__", Sampling.hashPrefix(col(idCol), salt))
    bucketedCumsum(hashed, Seq.empty,
      substring(col("__sh__"), 1, bucketHexDigits),
      Seq(col("__sh__"), col(idCol)), lit(1L), "assignShuffledShards")
      .withColumn("rank", col("cum_before"))
      .withColumn("shard_id", expr(s"rank div $rowsPerShard"))
      .drop("__sh__", "cum_before")
  }
}
