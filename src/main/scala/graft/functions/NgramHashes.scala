package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** DISTINCT 64-bit hashes of the word n-grams of a string, in one
  * native pass: lowercase once, walk whitespace-delimited tokens, hash
  * each token's bytes, and chain-combine each n-window of token hashes.
  * No token array, no gram strings, no per-gram substring allocation.
  *
  * Why a custom expression (SURVEY §7.3 preference order): the
  * composable form — explode(array_distinct(transform(sequence(...),
  * i → concat_ws(slice(tokens, ...))))) — has TWO problems at corpus
  * scale: higher-order functions run interpreted, and a generator's
  * child expression is re-evaluated PER OUTPUT ROW (an exploded
  * 50-gram document rebuilds the whole gram array 50 times — measured
  * ~30x slowdown on the documents table). This expression is one
  * tight loop per row and stays inside whole-stage codegen via a
  * static call.
  *
  * Gram identity is the chained hash of the window's token hashes —
  * NOT the hash of the joined gram string. Every consumer
  * ([[graft.ops.Dedup.sharedShingleEdges]],
  * [[graft.ops.Contamination]]) only joins these hashes against hashes
  * from the same expression, so any injective-enough identity works;
  * the DuckDB oracles join raw gram strings on their side and agree
  * absent a 64-bit collision.
  *
  * `shortFallback` mirrors the two shingle semantics in
  * [[graft.ops.TextOps]]: true = a text with fewer than `n` tokens
  * yields ONE hash of all its tokens ([[graft.ops.TextOps.shingles]]);
  * false = it yields nothing ([[graft.ops.TextOps.strictShingles]] —
  * a document shorter than the gram cannot contain one).
  */
case class WordNgramHashes(child: Expression, n: Int, shortFallback: Boolean)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"word_ngram_hashes expects string, got ${other.simpleString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_ngram_hashes"

  override protected def nullSafeEval(input: Any): Any =
    NgramHashesUtil.compute(input.asInstanceOf[UTF8String], n, shortFallback)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NgramHashesUtil$$.MODULE$$.compute($c, $n, $shortFallback)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NgramHashesUtil {

  private final val TokenSeed = 42L
  private final val ChainSeed = 7L

  /** Whitespace per Java regex \s — the same separator class the
    * composable `split(trim(x), "\\s+")` tokenizer uses. */
  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == 0x0b || b == 0x0c

  /** One pass over the lowercased bytes: the XXH64 hash of each
    * whitespace-delimited token, plus the token count (the array may
    * be longer than the count — geometric growth). */
  private[functions] def tokenHashes(text: UTF8String): (Array[Long], Int) = {
    val lower = text.toLowerCase
    val base = lower.getBaseObject
    val off = lower.getBaseOffset
    val nb = lower.numBytes()
    var hashes = new Array[Long](16)
    var nTok = 0
    var i = 0
    while (i < nb) {
      while (i < nb && isWs(lower.getByte(i))) i += 1
      if (i < nb) {
        val start = i
        while (i < nb && !isWs(lower.getByte(i))) i += 1
        if (nTok == hashes.length) {
          val grown = new Array[Long](hashes.length * 2)
          System.arraycopy(hashes, 0, grown, 0, hashes.length)
          hashes = grown
        }
        hashes(nTok) = XXH64.hashUnsafeBytes(base, off + start, i - start, TokenSeed)
        nTok += 1
      }
    }
    (hashes, nTok)
  }

  private[functions] def windowHash(hashes: Array[Long], from: Int, len: Int): Long = {
    var g = ChainSeed
    var k = from
    val end = from + len
    while (k < end) { g = XXH64.hashLong(hashes(k), g); k += 1 }
    g
  }

  def compute(text: UTF8String, n: Int, shortFallback: Boolean): ArrayData = {
    val (hashes, nTok) = tokenHashes(text)
    def window(from: Int, len: Int): Long = windowHash(hashes, from, len)

    if (nTok < n) {
      if (!shortFallback) return new GenericArrayData(Array.emptyLongArray)
      // whole-text gram, like TextOps.shingles' fallback (an empty
      // text hashes as the zero-token chain — equal only to other
      // empty texts, matching concat_ws of an empty token list)
      return new GenericArrayData(Array(window(0, nTok)))
    }

    val seen = new java.util.HashSet[java.lang.Long](nTok * 2)
    val out = new Array[Long](nTok - n + 1)
    var m = 0
    var w = 0
    while (w <= nTok - n) {
      val g = window(w, n)
      if (seen.add(g)) { out(m) = g; m += 1 }
      w += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }

  /** ALL window hashes in token order (index i = the gram starting at
    * token i) — no distinct, no short fallback: a text with fewer than
    * `n` tokens has no position that starts a gram, so it yields an
    * empty array. The positional form [[WordNgramHashSeq]] needs
    * occurrence identity, not set identity. */
  def computeSeq(text: UTF8String, n: Int): ArrayData = {
    val (hashes, nTok) = tokenHashes(text)
    if (nTok < n) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](nTok - n + 1)
    var w = 0
    while (w <= nTok - n) { out(w) = windowHash(hashes, w, n); w += 1 }
    new GenericArrayData(out)
  }
}

/** True iff ANY element of an array<long> gram column is in a sorted
  * broadcast set — the per-row membership test behind the stateless
  * (streaming-capable) decontamination filter
  * ([[graft.ops.Contamination.decontaminateFilter]]). The set rides an
  * executor-shared `Broadcast` (one copy per executor, resolved lazily
  * at eval — NOT a plan literal, which would serialize the whole set
  * into every task), and membership is a binary search per gram. */
case class GramSetOverlap(
    child: Expression,
    setBc: org.apache.spark.broadcast.Broadcast[Array[Long]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"gram_set_overlap expects array<bigint>, got ${other.simpleString}")
    }
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "gram_set_overlap"

  override protected def nullSafeEval(input: Any): Any =
    GramSetUtil.overlaps(input.asInstanceOf[ArrayData], setBc.value)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("evalGramsBc", setBc,
      "org.apache.spark.broadcast.Broadcast")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GramSetUtil$$.MODULE$$.overlaps($c, (long[]) $bcRef.value())")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GramSetUtil {

  /** Any element of `arr` possibly present in `bloom`? (One-sided:
    * false is definitive, true may be a false positive.) */
  def bloomOverlaps(
      arr: ArrayData,
      bloom: org.apache.spark.util.sketch.BloomFilter): Boolean = {
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (bloom.mightContainLong(arr.getLong(i))) return true
      i += 1
    }
    false
  }

  /** Any element of `arr` present in ASCENDING-sorted `set`? */
  def overlaps(arr: ArrayData, set: Array[Long]): Boolean = {
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (java.util.Arrays.binarySearch(set, arr.getLong(i)) >= 0) return true
      i += 1
    }
    false
  }
}

/** POSITIONAL 64-bit hashes of the word n-grams of a string, in one
  * native pass: element i is the chained hash of tokens [i, i+n) —
  * so `posexplode` over a materialized column of this expression
  * yields (token position, gram hash) occurrence rows. Same
  * tokenization, lowercasing, and chained-hash identity as
  * [[WordNgramHashes]] (one `tokenHashes` pass shared by both), so
  * positional consumers ([[graft.ops.Dedup.removeDuplicatedSpans]])
  * agree with the set-identity consumers on what a gram IS.
  *
  * Strict short-text semantics only: fewer than `n` tokens means no
  * position starts a gram (the distinct form's `shortFallback` exists
  * for whole-doc set membership, which has no positional analogue). */
case class WordNgramHashSeq(child: Expression, n: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"word_ngram_hash_seq expects string, got ${other.simpleString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_ngram_hash_seq"

  override protected def nullSafeEval(input: Any): Any =
    NgramHashesUtil.computeSeq(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NgramHashesUtil$$.MODULE$$.computeSeq($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** True iff ANY element of an array<long> gram column MIGHT be in a
  * broadcast Bloom filter — the constant-space analogue of
  * [[GramSetOverlap]] for eval/blocklist gram sets too large to
  * collect exactly (the sorted-array form costs 8 bytes per gram on
  * the driver AND every executor; the Bloom filter costs ~1.2 bytes
  * per gram at 1% false-positive rate, lifting the practical bound
  * from ~50M grams to the low billions). One-sided error only: a
  * false NEVER means a shared gram exists (no false negatives), so
  * [[graft.ops.Contamination.decontaminateBloom]] gets exact results
  * by verifying only the `true` rows. The filter is Spark's own
  * `org.apache.spark.util.sketch.BloomFilter` (fixed seeds —
  * rerun-deterministic), built distributed by `df.stat.bloomFilter`
  * and broadcast once per executor. */
case class GramBloomOverlap(
    child: Expression,
    bloomBc: org.apache.spark.broadcast.Broadcast[
      org.apache.spark.util.sketch.BloomFilter])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"gram_bloom_overlap expects array<bigint>, got ${other.simpleString}")
    }
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "gram_bloom_overlap"

  override protected def nullSafeEval(input: Any): Any =
    GramSetUtil.bloomOverlaps(input.asInstanceOf[ArrayData], bloomBc.value)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bloomBc", bloomBc,
      "org.apache.spark.broadcast.Broadcast")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GramSetUtil$$.MODULE$$.bloomOverlaps($c, " +
        s"(org.apache.spark.util.sketch.BloomFilter) $bcRef.value())")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Scalar form of [[GramBloomOverlap]]: is a single 64-bit key
  * possibly in a broadcast Bloom filter? One-sided like the array
  * form — false is definitive. Used where the membership key is one
  * value per row (e.g. a document fingerprint) rather than a gram
  * array. */
case class LongBloomContains(
    child: Expression,
    bloomBc: org.apache.spark.broadcast.Broadcast[
      org.apache.spark.util.sketch.BloomFilter])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain expects bigint, got ${other.simpleString}")
    }
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bloom_might_contain"

  override protected def nullSafeEval(input: Any): Any =
    bloomBc.value.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bloomBc", bloomBc,
      "org.apache.spark.broadcast.Broadcast")
    defineCodeGen(ctx, ev, c =>
      s"((org.apache.spark.util.sketch.BloomFilter) $bcRef.value()).mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
