package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

object ChunkUtil {

  /** Greedy word-fill chunk boundaries over a per-word cost array:
    * returns the 1-based word indices at which each chunk STARTS. A
    * word overflows — and starts a new chunk — iff the current chunk
    * already holds something and adding the word would push it past
    * `maxTokens`; an oversized word therefore still lands somewhere
    * (alone), and chunk 0 always starts at word 1. Empty costs →
    * empty starts (the caller's empty-document rule applies).
    *
    * ONE imperative pass, O(words) time and O(chunks) output — this
    * is the accumulator a Catalyst `aggregate` fold cannot express
    * linearly (an array-append accumulator re-copies per step:
    * O(words²) element copies for the per-word-ids form the r13 gate
    * shipped, a task-killing straggler on a single multi-MB crawl
    * document). */
  def starts(costs: ArrayData, maxTokens: Int): ArrayData = {
    val n = costs.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val buf = new scala.collection.mutable.ArrayBuilder.ofInt
    buf.sizeHint(8)
    buf += 1
    // Long running total: int costs can legitimately be large and the
    // greedy comparison must not wrap
    var used = 0L
    var i = 0
    while (i < n) {
      if (costs.isNullAt(i))
        throw new IllegalArgumentException(
          s"greedy_chunk_starts: cost at word ${i + 1} is NULL — per-word " +
            "costs must be non-null (a null cost has no greedy placement)")
      val c = costs.getInt(i).toLong
      if (used > 0 && used + c > maxTokens) { buf += i + 1; used = c }
      else used += c
      i += 1
    }
    new GenericArrayData(buf.result().map(Int.box: Int => Any))
  }
}

/** 1-based chunk-start word indices of a per-word cost array under a
  * greedy word-fill to `maxTokens` — the sequential scan underneath
  * [[graft.ops.TextOps.chunkDocumentsByCost]], as a native one-pass
  * expression (stateless, streams unchanged). */
case class GreedyChunkStarts(child: Expression, maxTokens: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"greedy_chunk_starts expects array<int>, got ${other.simpleString}")
    }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "greedy_chunk_starts"

  override protected def nullSafeEval(input: Any): Any =
    ChunkUtil.starts(input.asInstanceOf[ArrayData], maxTokens)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ChunkUtil$$.MODULE$$.starts($c, $maxTokens)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PrefixUtil {
  /** Exclusive prefix sums of a long array: out(i) = Σ in(0..i-1),
    * out(0) = 0. NULL elements count as 0 (the SQL SUM convention the
    * callers' weight columns already follow). One O(n) pass — the
    * scan a Catalyst `aggregate` fold can only hold with an
    * array-append accumulator (O(n²) element copies). */
  def exclusive(in: ArrayData): ArrayData = {
    val n = in.numElements()
    val out = new Array[Any](n)
    var acc = 0L
    var i = 0
    while (i < n) {
      out(i) = Long.box(acc)
      if (!in.isNullAt(i)) acc += in.getLong(i)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Exclusive prefix sums of an `array<bigint>` — the per-group
  * boundary-offset scan under
  * [[graft.ops.Packing.buildShardsWithBoundaries]]. */
case class ExclusivePrefixSums(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"exclusive_prefix_sums expects array<bigint>, got ${other.simpleString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "exclusive_prefix_sums"

  override protected def nullSafeEval(input: Any): Any =
    PrefixUtil.exclusive(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PrefixUtil$$.MODULE$$.exclusive($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LabelUtil {
  /** Causal-LM labels for one packed sequence: label(i) = ids(i+1),
    * except `ignoreId` where the next position is past the real
    * tokens (i+1 >= n, n = |ids| − nPad — covers pads and the
    * sequence end) or starts a new document piece (i+1 ∈ offsets).
    * `offsets` must be sorted ascending (packTokenIds' contract) —
    * one merged walk, O(|ids| + |offsets|), no per-position scan. */
  def causal(ids: ArrayData, offsets: ArrayData, nPad: Int,
      ignoreId: Int): ArrayData = {
    val L = ids.numElements()
    val n = L - nPad
    val out = new Array[Any](L)
    val m = offsets.numElements()
    var oi = 0
    var i = 0
    while (i < L) {
      val next = i + 1
      while (oi < m && !offsets.isNullAt(oi) && offsets.getInt(oi) < next) oi += 1
      val isBoundary = oi < m && !offsets.isNullAt(oi) && offsets.getInt(oi) == next
      out(i) =
        if (next >= n || isBoundary) Int.box(ignoreId)
        else Int.box(ids.getInt(next))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Causal-LM labels over (input_ids, doc_offsets, n_pad) — see
  * [[graft.ops.Packing.withCausalLabels]]. */
case class CausalLabels(
    first: Expression, second: Expression, third: Expression, ignoreId: Int)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"causal_labels expects (array<int>, array<int>, int), got $other")
    }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "causal_labels"

  override protected def nullSafeEval(ids: Any, offs: Any, pad: Any): Any =
    LabelUtil.causal(ids.asInstanceOf[ArrayData], offs.asInstanceOf[ArrayData],
      pad.asInstanceOf[Int], ignoreId)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c) =>
      s"graft.functions.LabelUtil$$.MODULE$$.causal($a, $b, $c, $ignoreId)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object chunkExprs {
  def greedy_chunk_starts(costs: Column, maxTokens: Int): Column =
    Bridge.toColumn(GreedyChunkStarts(Bridge.toExpression(costs), maxTokens))
  def exclusive_prefix_sums(weights: Column): Column =
    Bridge.toColumn(ExclusivePrefixSums(Bridge.toExpression(weights)))
  def causal_labels(ids: Column, offsets: Column, nPad: Column,
      ignoreId: Int): Column =
    Bridge.toColumn(CausalLabels(Bridge.toExpression(ids),
      Bridge.toExpression(offsets), Bridge.toExpression(nPad), ignoreId))
}
