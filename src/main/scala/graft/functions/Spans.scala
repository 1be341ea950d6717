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

object spanExprs {
  def merge_span_starts(starts: Column, k: Int): Column =
    Bridge.toColumn(MergeSpanStarts(Bridge.toExpression(starts), k))
  def tokens_outside_spans(tokens: Column, ivs: Column): Column =
    Bridge.toColumn(TokensOutsideSpans(
      Bridge.toExpression(tokens), Bridge.toExpression(ivs)))
}
