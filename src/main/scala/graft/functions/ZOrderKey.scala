package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Native Z-order (Morton) key: interleave the low `bits` bits of N
  * long dimensions into one long — result bit `i*N + d` is bit `i` of
  * dimension `d`.
  *
  * This is a DATA LAYOUT primitive, not a query operator: range-
  * partitioning + sorting a 100 TB table by `zorder_key(b, x, y)`
  * clusters rows that are close in BOTH dimensions into the same
  * files, so parquet min/max stats prune scans filtered on either
  * column (or both) — a single-column sort only ever prunes its
  * leading column. Pair with [[graft.ops.Layout.zorderBy]].
  *
  * Total-function semantics (a layout key must never throw or go
  * null mid-rewrite): inputs are MASKED to their low `bits` bits —
  * callers bucketize (e.g. `col % 1024`, quantile rank) before keying;
  * out-of-range and negative values simply contribute their masked low
  * bits. NULL in any dimension → NULL key (sorts together, ends up in
  * one file range). `bits * N` must fit in 63 so the key is an
  * order-preserving non-negative long.
  */
case class ZOrderKey(children: Seq[Expression], bits: Int)
    extends Expression {
  require(children.size >= 2 && children.size <= 6,
    "zorder_key expects 2..6 dimension columns")
  require(bits > 0 && bits * children.size <= 63,
    s"bits * dims must be in 1..63, got $bits * ${children.size}")

  override def checkInputDataTypes(): TypeCheckResult = {
    val bad = children.zipWithIndex.collect {
      case (c, i) if c.dataType != LongType => s"arg $i: ${c.dataType.simpleString}"
    }
    if (bad.isEmpty) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"zorder_key expects bigint dimensions, got ${bad.mkString(", ")}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "zorder_key"
  override def foldable: Boolean = children.forall(_.foldable)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vals = new Array[Long](children.size)
    var d = 0
    while (d < children.size) {
      val v = children(d).eval(input)
      if (v == null) return null
      vals(d) = v.asInstanceOf[Long]
      d += 1
    }
    ZOrderKeyUtil.interleave(bits, vals)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val arr = ctx.freshName("zdims")
    val anyNull = ctx.freshName("zAnyNull")
    val fills = evals.zipWithIndex.map { case (e, i) =>
      s"""${e.code}
         |if (${e.isNull}) { $anyNull = true; } else { $arr[$i] = ${e.value}; }""".stripMargin
    }.mkString("\n")
    ev.copy(code =
      code"""
        |boolean $anyNull = false;
        |long[] $arr = new long[${children.size}];
        |$fills
        |boolean ${ev.isNull} = $anyNull;
        |long ${ev.value} = $anyNull
        |  ? 0L
        |  : graft.functions.ZOrderKeyUtil$$.MODULE$$.interleave($bits, $arr);
        |""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

object ZOrderKeyUtil {
  /** Interleave the low `bits` bits of each value: result bit
    * `i*n + d` = bit `i` of `vals(d)`. */
  def interleave(bits: Int, vals: Array[Long]): Long = {
    val n = vals.length
    var out = 0L
    var i = 0
    while (i < bits) {
      var d = 0
      while (d < n) {
        out |= ((vals(d) >>> i) & 1L) << (i * n + d)
        d += 1
      }
      i += 1
    }
    out
  }

  /** Inverse of [[interleave]] (layout debugging / specs). */
  def deinterleave(bits: Int, n: Int, key: Long): Array[Long] = {
    val out = new Array[Long](n)
    var i = 0
    while (i < bits) {
      var d = 0
      while (d < n) {
        out(d) |= ((key >>> (i * n + d)) & 1L) << i
        d += 1
      }
      i += 1
    }
    out
  }
}

object zorderExprs {
  def zorder_key(bits: Int, dims: Column*): Column =
    Bridge.toColumn(ZOrderKey(dims.map(Bridge.toExpression), bits))
}
