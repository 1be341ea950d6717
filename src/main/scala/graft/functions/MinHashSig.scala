package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64, XxHash64Function}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature expression: array<string> shingles →
  * array<long> of `numHashes` minima, in ONE tight-loop pass per row.
  *
  * Why a custom Catalyst expression (SURVEY §7.3 preference order):
  * the composable alternatives are either nested higher-order functions
  * (interpreted — no codegen, ~100x slower) or explode + `numHashes`
  * min-aggregates (codegen'd but pays a shuffle and hashes every
  * shingle `numHashes` times). This expression hashes each shingle
  * twice and derives the k-th hash as h1 + k*h2
  * (Kirsch-Mitzenmacher), stays inside whole-stage codegen via a
  * static call, and needs no shuffle at all.
  *
  * Reference semantics anchor: gratum has no sketching operators; this
  * backs the beyond-reference dedup family (BASELINE.json north star).
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"minhash_sig expects array<string>, got ${other.simpleString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    MinHashSigUtil.compute(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHashSigUtil$$.MODULE$$.compute($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** MinHash signature computed directly from a STRING by sliding a
  * char n-gram window inside the native loop — no intermediate shingle
  * array is ever materialized (the composable form pays an interpreted
  * higher-order `transform` per row to build ~len(text) substrings). */
case class MinHashCharSig(child: Expression, n: Int, numHashes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"minhash_char_sig expects string, got ${other.simpleString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_char_sig"

  override protected def nullSafeEval(input: Any): Any =
    MinHashSigUtil.computeChar(input.asInstanceOf[UTF8String], n, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHashSigUtil$$.MODULE$$.computeChar($c, $n, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSigUtil {

  /** Sliding char-n-gram MinHash over a string: char-start byte
    * offsets are computed in one pass, then each window hashes its byte
    * range in place (no substring allocation; `substringSQL` per window
    * would be O(len) each — O(len^2) per row). */
  def computeChar(text: UTF8String, n: Int, numHashes: Int): ArrayData = {
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val base = text.getBaseObject
    val baseOff = text.getBaseOffset
    val nb = text.numBytes()
    // byte offset of each char start, plus end sentinel
    val starts = new Array[Int](text.numChars() + 1)
    var b = 0
    var c = 0
    while (b < nb) {
      starts(c) = b
      b += UTF8String.numBytesForFirstByte(text.getByte(b))
      c += 1
    }
    starts(c) = nb
    val nChars = c
    val win = if (nChars >= n) n else math.max(nChars, 1)
    val last = math.max(nChars - win, 0)
    var i = 0
    while (i <= last && nChars > 0) {
      val from = starts(i)
      val len = starts(i + win) - from
      val h1 = XXH64.hashUnsafeBytes(base, baseOff + from, len, 42L)
      val h2 = XXH64.hashUnsafeBytes(base, baseOff + from, len, 77L)
      var k = 0
      var hk = h1
      while (k < numHashes) {
        if (hk < mins(k)) mins(k) = hk
        hk += h2
        k += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
  /** Tight-loop MinHash: two xxhash64 passes per shingle, k-th hash
    * derived arithmetically (wrapping long math — no ANSI overflow). */
  def compute(shingles: ArrayData, numHashes: Int): ArrayData = {
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      val s = shingles.getUTF8String(i)
      if (s != null) {
        val h1 = XxHash64Function.hash(s, StringType, 42L)
        val h2 = XxHash64Function.hash(s, StringType, 77L)
        var k = 0
        var hk = h1
        while (k < numHashes) {
          if (hk < mins(k)) mins(k) = hk
          hk += h2 // h1 + (k+1)*h2, wrapping
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

/** Column-level entry points for the native expressions. */
object exprs {
  /** MinHash signature of an array<string> column. */
  def minhash_sig(shingles: Column, numHashes: Int): Column =
    Bridge.toColumn(MinHashSig(Bridge.toExpression(shingles), numHashes))

  /** MinHash signature of char n-grams of a string column. */
  def minhash_char_sig(text: Column, n: Int, numHashes: Int): Column =
    Bridge.toColumn(MinHashCharSig(Bridge.toExpression(text), n, numHashes))

  /** Distinct word n-gram hashes of a string column (see
    * [[WordNgramHashes]]). */
  def word_ngram_hashes(text: Column, n: Int, shortFallback: Boolean): Column =
    Bridge.toColumn(WordNgramHashes(Bridge.toExpression(text), n, shortFallback))

  /** Positional word n-gram hashes of a string column (see
    * [[WordNgramHashSeq]]). */
  def word_ngram_hash_seq(text: Column, n: Int): Column =
    Bridge.toColumn(WordNgramHashSeq(Bridge.toExpression(text), n))

  /** Any gram of an array<long> column in a sorted broadcast set (see
    * [[GramSetOverlap]]). */
  def gram_set_overlap(
      grams: Column,
      setBc: org.apache.spark.broadcast.Broadcast[Array[Long]]): Column =
    Bridge.toColumn(GramSetOverlap(Bridge.toExpression(grams), setBc))

  /** Any gram of an array<long> column possibly in a broadcast Bloom
    * filter (see [[GramBloomOverlap]]). */
  def gram_bloom_overlap(
      grams: Column,
      bloomBc: org.apache.spark.broadcast.Broadcast[
        org.apache.spark.util.sketch.BloomFilter]): Column =
    Bridge.toColumn(GramBloomOverlap(Bridge.toExpression(grams), bloomBc))

  /** Single 64-bit key possibly in a broadcast Bloom filter (see
    * [[LongBloomContains]]). */
  def bloom_might_contain(
      key: Column,
      bloomBc: org.apache.spark.broadcast.Broadcast[
        org.apache.spark.util.sketch.BloomFilter]): Column =
    Bridge.toColumn(LongBloomContains(Bridge.toExpression(key), bloomBc))

  /** Per-token log10 stupid-backoff LM scores of a string column (see
    * [[LmTokenScores]]). */
  def lm_token_scores(
      text: Column,
      modelBc: org.apache.spark.broadcast.Broadcast[LmModel]): Column =
    Bridge.toColumn(LmTokenScores(Bridge.toExpression(text), modelBc))

  /** Per-token log10 Naive Bayes odds of a string column (see
    * [[NbTokenLogOdds]]). */
  def nb_token_log_odds(
      text: Column,
      modelBc: org.apache.spark.broadcast.Broadcast[NbModel]): Column =
    Bridge.toColumn(NbTokenLogOdds(Bridge.toExpression(text), modelBc))

  /** Unicode NFC normalization (see [[NfcNormalize]]). */
  def nfc_normalize(text: Column): Column =
    Bridge.toColumn(NfcNormalize(Bridge.toExpression(text)))

  /** Header-level media dimensions of a binary column (see
    * [[MediaDims]]). */
  def media_dims(payload: Column): Column =
    Bridge.toColumn(MediaDims(Bridge.toExpression(payload)))

  /** Container-level MP4 metadata of a binary column (see
    * [[Mp4Meta]]). */
  def mp4_meta(payload: Column): Column =
    Bridge.toColumn(Mp4Meta(Bridge.toExpression(payload)))

  /** Per-sample MP4 layout of a binary column (see [[Mp4Samples]]). */
  def mp4_samples(payload: Column): Column =
    Bridge.toColumn(Mp4Samples(Bridge.toExpression(payload)))

  /** Stream-level MP3 metadata of a binary column (see [[Mp3Meta]]). */
  def mp3_meta(payload: Column): Column =
    Bridge.toColumn(Mp3Meta(Bridge.toExpression(payload)))

  /** Container-level Ogg metadata of a binary column (see [[OggMeta]]). */
  def ogg_meta(payload: Column): Column =
    Bridge.toColumn(OggMeta(Bridge.toExpression(payload)))

  /** Container-level Matroska/WebM metadata of a binary column (see
    * [[MkvMeta]]). */
  def mkv_meta(payload: Column): Column =
    Bridge.toColumn(MkvMeta(Bridge.toExpression(payload)))
}
