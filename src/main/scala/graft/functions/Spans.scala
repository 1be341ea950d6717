package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Native one-pass span machinery for
  * [[graft.ops.Dedup.removeDuplicatedSpans]] — both halves of that op
  * that a Catalyst HOF can only express super-linearly per row: the
  * span-merge fold (array-append accumulator → O(spans²) element
  * copies) and the per-token interval test (`exists` per token →
  * O(tokens · spans)). Sorted inputs make both a single merged walk.
  */
object SpanUtil {

  /** Merge SORTED fixed-width span starts into disjoint spans: start s
    * covers [s, s+k-1]; adjacent-or-overlapping spans coalesce
    * (s <= ce + 1). One O(starts) pass, O(spans) output. */
  def merge(starts: ArrayData, k: Int): ArrayData = {
    val n = starts.numElements()
    val out = new scala.collection.mutable.ArrayBuffer[Any](8)
    var cs = -1L
    var ce = -1L
    var i = 0
    while (i < n) {
      if (starts.isNullAt(i))
        throw new IllegalArgumentException(
          "merge_span_starts: NULL start — span starts must be non-null")
      val s = starts.getInt(i).toLong
      val e = s + (k - 1)
      if (cs < 0) { cs = s; ce = e }
      else if (s <= ce + 1) { if (e > ce) ce = e }
      else {
        out += new GenericInternalRow(Array[Any](cs, ce))
        cs = s; ce = e
      }
      i += 1
    }
    if (cs >= 0) out += new GenericInternalRow(Array[Any](cs, ce))
    new GenericArrayData(out.toArray)
  }

  /** Tokens whose 0-based index lies OUTSIDE every span of `ivs`
    * (sorted, disjoint — [[merge]]'s output contract): one merged
    * walk, O(tokens + spans), instead of an exists() per token.
    * Token elements must be non-null (checked whether inside a span
    * or not — [[merge]]'s null-start rule): the expression declares
    * `array<string> containsNull=false` output, and silently copying
    * a null element through would violate that contract for any
    * caller whose tokenizer, unlike split(), can emit nulls. */
  def outside(tokens: ArrayData, ivs: ArrayData): ArrayData = {
    val n = tokens.numElements()
    val m = ivs.numElements()
    val out = new scala.collection.mutable.ArrayBuffer[Any](n)
    var p = 0
    var i = 0
    while (i < n) {
      if (tokens.isNullAt(i))
        throw new IllegalArgumentException(
          "tokens_outside_spans: NULL token element — tokens must be non-null")
      while (p < m && ivs.getStruct(p, 2).getLong(1) < i) p += 1
      val in = p < m && {
        val iv = ivs.getStruct(p, 2)
        iv.getLong(0) <= i && i <= iv.getLong(1)
      }
      if (!in) out += tokens.getUTF8String(i)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** Disjoint merged spans from sorted fixed-width starts — see
  * [[SpanUtil.merge]]. */
case class MergeSpanStarts(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"merge_span_starts expects array<int>, got ${other.simpleString}")
    }
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("s", LongType, nullable = false),
      StructField("e", LongType, nullable = false))),
    containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "merge_span_starts"

  override protected def nullSafeEval(input: Any): Any =
    SpanUtil.merge(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SpanUtil$$.MODULE$$.merge($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Tokens outside every (sorted, disjoint) span — see
  * [[SpanUtil.outside]]. Accepts any two-LONG-field struct for the
  * span side (field names don't matter; access is ordinal: (s, e)). */
case class TokensOutsideSpans(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _),
        ArrayType(StructType(Array(a, b)), _))
        if a.dataType == LongType && b.dataType == LongType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"tokens_outside_spans expects (array<string>, array<struct<bigint,bigint>>), got $other")
    }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "tokens_outside_spans"

  override protected def nullSafeEval(toks: Any, ivs: Any): Any =
    SpanUtil.outside(toks.asInstanceOf[ArrayData], ivs.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, s) =>
      s"graft.functions.SpanUtil$$.MODULE$$.outside($t, $s)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** One-pass Gopher dup-n-gram coverage (Rae et al. 2021, Table A1:
  * `dup_{5..10}gram_char_frac`): per k, the fraction of the
  * space-joined tokens' characters lying inside at least one
  * occurrence of a word k-gram that appears 2+ times in the document
  * — an INTERVAL UNION over the duplicated grams' character spans,
  * the same merged-walk idea as [[SpanUtil.merge]] but over char
  * offsets derived from token-length prefix sums. Gram identity is
  * exact STRING equality (space-joined tokens), not a hash: no
  * collision can invent a duplicate, so an external SQL oracle
  * recomputing the union from the gram strings agrees bit-for-bit
  * (each fraction is one division of exact longs). */
object DupNgramUtil {

  /** One array<double> entry per k in `ks`. Tokens must be the
    * whitespace-canonical split (no internal whitespace — the joined
    * length arithmetic assumes single joining spaces). O(n·k) per k
    * in gram-string bytes, O(n) in everything else; zero allocations
    * proportional to the ks count beyond the per-k hash map. */
  def charFracs(tokens: ArrayData, ks: Array[Int]): ArrayData = {
    val n = tokens.numElements()
    val words = new Array[String](n)
    val lens = new Array[Int](n)
    var i = 0
    while (i < n) {
      if (tokens.isNullAt(i))
        throw new IllegalArgumentException(
          "dup_ngram_char_fracs: NULL token element — tokens must be non-null")
      val u = tokens.getUTF8String(i)
      words(i) = u.toString
      lens(i) = u.numChars()
      i += 1
    }
    // char offset of token i in the space-joined text, and the total
    // joined length (== length(normalized text) for canonical input)
    val starts = new Array[Long](n)
    var total = 0L
    i = 0
    while (i < n) {
      starts(i) = total
      total += lens(i) + 1
      i += 1
    }
    if (n > 0) total -= 1
    val out = new Array[Any](ks.length)
    var kk = 0
    while (kk < ks.length) {
      val k = ks(kk)
      val m = n - k + 1
      if (total <= 0 || m <= 0) out(kk) = 0.0d
      else {
        val grams = new Array[String](m)
        val counts = new java.util.HashMap[String, Integer](m * 2)
        i = 0
        while (i < m) {
          val sb = new java.lang.StringBuilder(k * 8)
          var j = 0
          while (j < k) {
            if (j > 0) sb.append(' ')
            sb.append(words(i + j))
            j += 1
          }
          val g = sb.toString
          grams(i) = g
          val c = counts.get(g)
          counts.put(g, if (c == null) 1 else c + 1)
          i += 1
        }
        // union walk: occurrence starts are ascending by construction;
        // merging adjacent spans (s == ce + 1) counts the same chars
        // as keeping them separate, so the merge rule cannot drift
        // from an oracle that splits islands strictly on overlap
        var covered = 0L
        var cs = -1L
        var ce = -2L
        i = 0
        while (i < m) {
          if (counts.get(grams(i)) > 1) {
            val s = starts(i)
            val e = starts(i + k - 1) + lens(i + k - 1) - 1
            if (cs < 0) { cs = s; ce = e }
            else if (s <= ce + 1) { if (e > ce) ce = e }
            else { covered += ce - cs + 1; cs = s; ce = e }
          }
          i += 1
        }
        if (cs >= 0) covered += ce - cs + 1
        out(kk) = covered.toDouble / total.toDouble
      }
      kk += 1
    }
    new GenericArrayData(out)
  }
}

/** Duplicate-word-k-gram character-coverage fractions, one per k —
  * see [[DupNgramUtil.charFracs]]. */
case class DupNgramCharFracs(child: Expression, ks: Seq[Int])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"dup_ngram_char_fracs expects array<string>, got ${other.simpleString}")
    }
  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dup_ngram_char_fracs"

  @transient private lazy val ksArr: Array[Int] = ks.toArray

  override protected def nullSafeEval(input: Any): Any =
    DupNgramUtil.charFracs(input.asInstanceOf[ArrayData], ksArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ksRef = ctx.addReferenceObj("dupNgramKs", ksArr, "int[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.DupNgramUtil$$.MODULE$$.charFracs($c, $ksRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object spanExprs {
  def merge_span_starts(starts: Column, k: Int): Column =
    Bridge.toColumn(MergeSpanStarts(Bridge.toExpression(starts), k))
  def tokens_outside_spans(tokens: Column, ivs: Column): Column =
    Bridge.toColumn(TokensOutsideSpans(
      Bridge.toExpression(tokens), Bridge.toExpression(ivs)))
  def dup_ngram_char_fracs(tokens: Column, ks: Seq[Int]): Column =
    Bridge.toColumn(DupNgramCharFracs(Bridge.toExpression(tokens), ks))
}
