package graft.ops

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.functions.{bpeExprs, BpeModel, BpeUtil}

/** Distributed BPE tokenizer training (Sennrich et al. 2016: neural
  * machine translation of rare words with subword units) — the
  * tokenizer-training op of an LLM data pipeline, Spark-first:
  *
  *   1. ONE distributed aggregation builds the word-frequency
  *      dictionary (the only pass over the corpus — at 100 TB this is
  *      the whole cost, and it is a plain groupBy shuffle).
  *   2. The merge loop runs on the DRIVER over the top-`maxWords`
  *      dictionary with incremental pair-count updates (only words
  *      containing the merged pair are touched). This is how every
  *      production BPE trainer works — the dictionary is Zipf-bounded
  *      (top 1M words cover ~all occurrences of any natural corpus),
  *      so the driver state is capped by contract, not by luck.
  *   3. Encoding is a broadcast model + the native codegen'd
  *      [[graft.functions.BpeTokens]] expression — stateless, streams
  *      unchanged, per-thread LRU word cache on the executors.
  *
  * Determinism contract: merge selection is max pair count with ties
  * broken by the lexicographically smallest (left, right) pair, and
  * the dictionary cut is (count desc, word asc) — the same corpus
  * always learns the same merges, on any cluster layout.
  */
object Bpe {

  /** The word-frequency dictionary cut: top `maxWords` by
    * (count desc, word asc). One shuffle + a TakeOrdered. */
  def wordCounts(df: DataFrame, textCol: String, maxWords: Int): Seq[(String, Long)] = {
    require(maxWords > 0 && maxWords <= 2000000,
      s"Bpe: maxWords must be in (0, 2e6] (driver-held dictionary), got $maxWords")
    df.select(col(textCol).cast("string").as("__t__"))
      .filter(col("__t__").isNotNull)
      .select(explode(split(trim(col("__t__")), "[ \t\n\u000B\f\r]+")).as("__w__"))
      .filter(length(col("__w__")) > 0)
      .groupBy("__w__").agg(count(lit(1)).as("__n__"))
      .orderBy(col("__n__").desc, col("__w__").asc)
      .limit(maxWords)
      .collect().toSeq.map(r => (r.getString(0), r.getLong(1)))
  }

  /** The driver-side merge loop, exposed for direct testing: learns up
    * to `numMerges` merges over a (word, count) dictionary.
    * Incremental algorithm — pair counts are delta-updated from only
    * the words containing the merged pair. */
  def trainFromWordCounts(
      counts: Seq[(String, Long)], numMerges: Int,
      minPairCount: Long = 2L): BpeModel =
    continueFromWordCounts(BpeModel(Array.empty), counts, numMerges, minPairCount)

  /** Apply a model's merges to one word IN TRAINING ORDER (merge 0
    * everywhere, then merge 1, ...) — reproduces the training-time
    * symbol state by construction, which is what model CONTINUATION
    * must resume from. (The greedy encoder converges to the same state
    * for models whose ranks are creation-monotone — every trained
    * model in practice — but continuation must not depend on that.) */
  private def applyMergesInOrder(word: String, m: BpeModel): Array[String] = {
    var syms = BpeUtil.initialSymbols(word)
    var r = 0
    while (r < m.merges.length) {
      val (l, rr) = m.merges(r)
      var contains = false
      var i = 0
      while (!contains && i < syms.length - 1) {
        contains = syms(i) == l && syms(i + 1) == rr; i += 1
      }
      if (contains) {
        val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
        i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == rr) {
            out += l + rr; i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.toArray
      }
      r += 1
    }
    syms
  }

  /** CONTINUE training an existing model over a (word, count)
    * dictionary: the dictionary is first brought to the model's
    * training-time symbol state (merges applied in training order),
    * then the merge loop learns up to `extraMerges` more. On the same
    * dictionary, `continue(train(c, n), c, k) == train(c, n+k)`
    * unconditionally (BpeSpec pins it); on a NEW corpus this is
    * domain-adaptation vocabulary growth without retraining from
    * scratch. The returned model carries old merges ++ new merges. */
  def continueFromWordCounts(
      model: BpeModel, counts: Seq[(String, Long)], extraMerges: Int,
      minPairCount: Long = 2L): BpeModel = {
    val numMerges = extraMerges
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    require(minPairCount >= 1, s"minPairCount must be >= 1, got $minPairCount")
    // the model's base-symbol ALPHABET (vocab derivation input): union
    // of the existing model's alphabet and this dictionary's initial
    // symbols, sorted — so continuation GROWS the vocabulary and
    // train(c, n) == continue(train(c, k), c, n-k) holds for the
    // alphabet too (same corpus -> same symbol set)
    val alphaSet = new scala.collection.mutable.HashSet[String]()
    model.alphabet.foreach(alphaSet += _)
    counts.foreach(c => BpeUtil.initialSymbols(c._1).foreach(alphaSet += _))
    val alphabet = alphaSet.toArray.sorted
    val words: Array[Array[String]] =
      counts.map(c => applyMergesInOrder(c._1, model)).toArray
    val wordCount: Array[Long] = counts.map(_._2).toArray

    val pairCounts = new java.util.HashMap[(String, String), Long]()
    // lazy inverted index: pair -> word indices that contained it at
    // SOME point (stale entries re-checked at merge time)
    val pairWords = new java.util.HashMap[(String, String), java.util.HashSet[Integer]]()
    def addPair(p: (String, String), wi: Int, c: Long): Unit = {
      pairCounts.merge(p, c, (a, b) => a + b)
      pairWords.computeIfAbsent(p, _ => new java.util.HashSet[Integer]()).add(wi)
    }
    def dropPair(p: (String, String), c: Long): Unit = {
      val left = pairCounts.merge(p, -c, (a, b) => a + b)
      if (left <= 0) { pairCounts.remove(p); pairWords.remove(p) }
    }
    var wi = 0
    while (wi < words.length) {
      val s = words(wi)
      var i = 0
      while (i < s.length - 1) { addPair((s(i), s(i + 1)), wi, wordCount(wi)); i += 1 }
      wi += 1
    }

    // Merge SELECTION is a lazy-deletion max-heap over (count, pair),
    // not a scan: a production tokenizer is ~50k merges over a ≤2M-word
    // dictionary (~10^7 live pairs), and an O(pair-table) scan per
    // merge is ~10^11-10^12 comparisons in the driver loop — the same
    // latent-quadratic class as the r13 chunk fold. Protocol: seed one
    // entry per distinct pair; every count INCREASE pushes the new
    // cumulative value (so some entry is always >= the live count);
    // decreases leave stale overestimates that pop-validation catches
    // (live != entry -> re-insert at the live rank; live 0 -> discard).
    // An entry that validates IS the global max: every other live pair
    // has an entry at or above its live count, which would have popped
    // first. Heap order encodes the determinism contract — max count,
    // ties -> lexicographically smallest pair (DEFINED determinism;
    // Sennrich leaves ties unspecified) — so the learned merges are
    // bit-identical to the scan's (BpeSpec + the heap-vs-scan spec pin
    // it).
    final class PairEntry(val a: String, val b: String, val c: Long)
    val heap = new java.util.PriorityQueue[PairEntry](
      math.max(16, pairCounts.size()),
      new java.util.Comparator[PairEntry] {
        def compare(x: PairEntry, y: PairEntry): Int = {
          if (x.c != y.c) java.lang.Long.compare(y.c, x.c)
          else {
            val r = x.a.compareTo(y.a)
            if (r != 0) r else x.b.compareTo(y.b)
          }
        }
      })
    locally {
      val it = pairCounts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        heap.add(new PairEntry(e.getKey._1, e.getKey._2, e.getValue))
      }
    }
    def addPairTracked(p: (String, String), wi: Int, c: Long): Unit = {
      addPair(p, wi, c)
      heap.add(new PairEntry(p._1, p._2, pairCounts.getOrDefault(p, 0L)))
    }

    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (!done && merges.length < numMerges) {
      var best: (String, String) = null
      var searching = true
      while (searching) {
        val e = heap.poll()
        if (e == null) searching = false
        else {
          val p = (e.a, e.b)
          val live = pairCounts.getOrDefault(p, 0L)
          if (live == e.c) {
            // valid top of heap = the global max live pair; below the
            // threshold means NO pair qualifies — stop
            if (live >= minPairCount) best = p
            searching = false
          } else if (live > 0L) heap.add(new PairEntry(e.a, e.b, live))
        }
      }
      if (best == null) done = true
      else {
        merges += best
        val merged = best._1 + best._2
        val affected = pairWords.get(best)
        if (affected != null) {
          val ws = affected.toArray(new Array[Integer](affected.size()))
            .map(_.intValue()).sorted // deterministic iteration, not that order matters
          ws.foreach { w =>
            val old = words(w)
            // stale index entry: the word may no longer contain the pair
            var contains = false
            var i = 0
            while (!contains && i < old.length - 1) {
              contains = old(i) == best._1 && old(i + 1) == best._2; i += 1
            }
            if (contains) {
              val c = wordCount(w)
              // delta out the old adjacencies, apply the merge, delta in
              i = 0
              while (i < old.length - 1) { dropPair((old(i), old(i + 1)), c); i += 1 }
              val out = new scala.collection.mutable.ArrayBuffer[String](old.length)
              i = 0
              while (i < old.length) {
                if (i < old.length - 1 && old(i) == best._1 && old(i + 1) == best._2) {
                  out += merged; i += 2
                } else { out += old(i); i += 1 }
              }
              val nw = out.toArray
              words(w) = nw
              i = 0
              while (i < nw.length - 1) { addPairTracked((nw(i), nw(i + 1)), w, c); i += 1 }
            }
          }
        }
        // the merged pair itself must be gone (all occurrences merged)
        pairCounts.remove(best)
        pairWords.remove(best)
      }
    }
    BpeModel(model.merges ++ merges, alphabet)
  }

  /** [[continueFromWordCounts]] over a text column: one dictionary
    * aggregation + the resumed driver merge loop. */
  def extendModel(
      model: BpeModel, df: DataFrame, textCol: String, extraMerges: Int,
      maxWords: Int = 1000000, minPairCount: Long = 2L): BpeModel =
    continueFromWordCounts(model, wordCounts(df, textCol, maxWords),
      extraMerges, minPairCount)

  /** Train on a text column: dictionary aggregation + driver merge
    * loop. The corpus is read ONCE. */
  def train(df: DataFrame, textCol: String, numMerges: Int,
      maxWords: Int = 1000000, minPairCount: Long = 2L): BpeModel =
    trainFromWordCounts(wordCounts(df, textCol, maxWords), numMerges, minPairCount)

  /** Broadcast a model for the encode expression. */
  def broadcastModel(spark: SparkSession, m: BpeModel): Broadcast[BpeModel] =
    spark.sparkContext.broadcast(m)

  /** BPE tokens of `c` (array<string>, `</w>` markers kept) under a
    * broadcast model — native one-pass expression. */
  def tokens(c: Column, modelBc: Broadcast[BpeModel]): Column =
    bpeExprs.bpe_tokens(c, modelBc)

  /** Real-tokenizer token count (the budget unit a mixture/packing
    * step should use once a tokenizer exists). */
  def tokenCount(c: Column, modelBc: Broadcast[BpeModel]): Column =
    size(tokens(c, modelBc))

  /** BPE token IDS of `c` (array<int>) under the model's derived
    * vocabulary ([[graft.functions.BpeModel.vocab]]: pad 0, unk 1,
    * alphabet sorted, compounds in merge order) — index-aligned with
    * [[tokens]], unknown symbols → unk. This is the integer stream a
    * trainer's data loader reads; pack it with
    * [[graft.ops.Packing.packTokenIds]]. */
  def ids(c: Column, modelBc: Broadcast[BpeModel]): Column =
    bpeExprs.bpe_ids(c, modelBc)

  /** Adds the token-ID array of `textCol` as `outCol` — the encode
    * step of the text → ids → fixed-length-sequences pipeline. */
  def withTokenIds(df: DataFrame, textCol: String, outCol: String,
      modelBc: Broadcast[BpeModel]): DataFrame =
    df.withColumn(outCol, ids(col(textCol), modelBc))

  /** The model's vocabulary as a (id, token) DataFrame — the artifact
    * shipped next to packed shards so ids are decodable without the
    * model object. */
  def vocabTable(spark: SparkSession, m: BpeModel): DataFrame = {
    import spark.implicits._
    m.vocab.zipWithIndex.map { case (t, i) => (i, t) }.toSeq.toDF("id", "token")
  }

  /** Adds the REAL-tokenizer token count of `textCol` as `outCol` —
    * the budget-unit wiring for
    * [[graft.ops.Sampling.sampleByTokenBudget]],
    * [[graft.ops.Packing.assignShards]]/[[graft.ops.Packing.buildShards]]
    * and any other weight-column consumer: training mixtures and shard
    * budgets are specified in TOKENS, and the char/regex proxies drift
    * from the real count on non-English text.
    *
    * Scale note: the prefix-sum ops execute their input plan twice
    * (bucket-sum pass + output pass). `tokenCount` is deterministic,
    * so that is CORRECT — but at corpus scale encoding twice is wasted
    * work; `localCheckpoint` (or persist) the frame this returns
    * before feeding a budgeting op if the encode cost matters. */
  def withTokenCount(df: DataFrame, textCol: String, outCol: String,
      modelBc: Broadcast[BpeModel]): DataFrame =
    df.withColumn(outCol, tokenCount(col(textCol), modelBc))

  /** Context-window chunking in REAL tokenizer tokens — the third
    * budget-unit consumer after [[graft.ops.Sampling.sampleByTokenBudget]]
    * and [[graft.ops.Packing]] ([[graft.ops.TextOps.chunkDocumentsByCost]]
    * with the model's per-word token count as the cost): greedy
    * word-fill to at most `maxTokens` BPE tokens per chunk, so chunk
    * sizes line up with what a context window actually holds instead
    * of a whitespace proxy. */
  def chunkByTokenCount(
      df: DataFrame, idCol: String, textCol: String, maxTokens: Int,
      modelBc: Broadcast[BpeModel]): DataFrame =
    graft.ops.TextOps.chunkDocumentsByCost(df, idCol, textCol, maxTokens,
      w => tokenCount(w, modelBc))

  /** Inverse of [[tokens]] (detokenize — the inspection/debug verb a
    * tokenized corpus needs): concatenate the token strings and split
    * on the end-of-word markers. Reconstructs the
    * whitespace-NORMALIZED text (single spaces — the whitespace run
    * class is not invertible past that). Pure Column arithmetic, no
    * shuffle. A word whose raw characters spell out the marker
    * re-splits there — inherent to any in-band marker scheme; corpora
    * where that matters should pre-escape the marker text. */
  /** Inverse of [[ids]] up to whitespace normalization and unknown
    * symbols — the inspection verb for a SHIPPED shard: each id maps
    * through the model's derived vocabulary (out-of-range/NULL → the
    * unk marker; PAD ids are dropped — they carry no text), symbols
    * concatenate, end-of-word markers become single spaces.
    * `decodeIds(col("input_ids"), bc)` over a packed row shows the
    * text a sequence actually trains on. Note an unknown symbol that
    * ENDED a word decodes without its end-of-word marker, so it fuses
    * with the next word — inherent to unk substitution, identical on
    * every engine replaying the symbol stream. Native codegen'd
    * expression, no shuffle. */
  def decodeIds(c: Column, modelBc: Broadcast[BpeModel]): Column =
    bpeExprs.bpe_decode_ids(c, modelBc)

  def decode(toks: Column): Column =
    array_join(
      filter(
        split(array_join(toks, ""),
          java.util.regex.Pattern.quote(graft.functions.BpeUtil.EndOfWord)),
        x => length(x) > 0),
      " ")

  /** One-table model persistence, LmScore-convention: (rank, left,
    * right), executor-side materialization. Merges at rank 0..n-1;
    * the alphabet rides the SAME table at rank -(i+1) with left = the
    * symbol and right NULL (so a model file is still one table and a
    * pre-alphabet file still loads — as an empty-alphabet model). */
  def saveModel(spark: SparkSession, m: BpeModel, path: String): Unit = {
    import spark.implicits._
    val merges = m.merges
    val alphabet = m.alphabet
    val rows: Seq[(Int, String, String)] =
      merges.indices.map(i => (i, merges(i)._1, merges(i)._2)) ++
        alphabet.indices.map(i => (-(i + 1), alphabet(i), null: String))
    spark.sparkContext.parallelize(rows, 1)
      .toDF("rank", "left", "right")
      .write.mode("overwrite").parquet(path)
  }

  def loadModel(spark: SparkSession, path: String): BpeModel = {
    val all = spark.read.parquet(path)
      .select("rank", "left", "right")
      .collect()
    val rows = all.filter(_.getInt(0) >= 0).sortBy(_.getInt(0))
    val merges = rows.map(r => (r.getString(1), r.getString(2)))
    rows.zipWithIndex.foreach { case (r, i) =>
      require(r.getInt(0) == i,
        s"Bpe.loadModel: rank column is not dense at $i (got ${r.getInt(0)}) — " +
          "not a saveModel table")
    }
    val arows = all.filter(_.getInt(0) < 0).sortBy(-_.getInt(0))
    arows.zipWithIndex.foreach { case (r, i) =>
      require(r.getInt(0) == -(i + 1),
        s"Bpe.loadModel: alphabet rank is not dense at ${-(i + 1)} " +
          s"(got ${r.getInt(0)}) — not a saveModel table")
    }
    BpeModel(merges, arows.map(_.getString(1)))
  }
}
