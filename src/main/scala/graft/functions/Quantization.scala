package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Int8 embedding quantization + deterministic plane projection — the
  * memory/bandwidth half of the 100 TB similarity-search story.
  *
  * A 64-dim float32 embedding is 256 bytes; symmetric int8 quantization
  * stores it in 64 (plus one corpus-wide scale scalar), so a
  * brute-force cosine scan reads 4x less and an in-memory IVF cell
  * holds 4x more vectors. Cosine is scale-invariant, so search runs
  * DIRECTLY on the int8 codes against a full-precision query
  * ([[CosineSimI8]] — asymmetric distance computation): the scale never
  * re-enters the hot loop and dequantization allocates nothing.
  *
  * Everything here is cross-engine reproducible arithmetic: max/abs,
  * IEEE division, floor, clamp — so the whole pipeline (fit, encode,
  * score, rank) sits under the DuckDB oracle (q_simsearch_quant), no
  * fixture tricks needed.
  */
object QuantUtil {

  /** Max |x| over FINITE components; NaN when there are none (empty
    * array, or every component NaN/Inf) — mapped to NULL by the
    * expression. NaN/Inf components are skipped, not propagated: one
    * broken encoder output must not poison a corpus-wide scale. */
  def maxAbsFinite(v: ArrayData): Double = {
    val n = v.numElements()
    var m = Double.NaN
    var i = 0
    while (i < n) {
      val x = Math.abs(v.getDouble(i))
      if (x <= Double.MaxValue && (!(m >= x))) m = x // NaN m always replaced
      i += 1
    }
    m
  }

  /** Symmetric int8 encode: q_i = clamp(floor(x_i/scale + 0.5), -127, 127).
    * floor(x + 0.5) — round-half-toward-+inf — is the quantizer's
    * DEFINITION (not an approximation of round()): both Spark and
    * DuckDB's round() disagree with each other on negative halves,
    * while floor/division are bit-identical IEEE ops everywhere.
    * NaN components encode as 0, infinities saturate. Returns null for
    * a degenerate scale (<= 0, NaN, or infinite). */
  def quantizeI8(v: ArrayData, scale: Double): ArrayData = {
    if (!(scale > 0) || scale > Double.MaxValue) return null
    val n = v.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val d = Math.floor(v.getDouble(i) / scale + 0.5)
      out(i) =
        if (d != d) 0
        else if (d > 127) 127
        else if (d < -127) -127
        else d.toByte
      i += 1
    }
    ArrayData.toArrayData(out)
  }

  /** Sequential cosine of a full-precision query against an int8 code —
    * same accumulation order as [[SimilarityUtil.cosine]] (and the
    * DuckDB list-fold), the byte promoted to double per term. NaN
    * (zero-norm code or query) is mapped to NULL by the expression,
    * exactly like cosine_sim. */
  def cosineI8(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) { dot += a.getDouble(i) * b.getByte(i); i += 1 }
    var na = 0.0
    i = 0
    while (i < a.numElements()) { val x = a.getDouble(i); na += x * x; i += 1 }
    var nb = 0.0
    i = 0
    while (i < b.numElements()) { val x = b.getByte(i).toDouble; nb += x * x; i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** out_j = factor * dot(v, planes_j), each dot one sequential pass —
    * the dense random-projection kernel (Johnson-Lindenstrauss with
    * +-1 sign planes; see [[graft.ops.VectorOps.randomProject]]). */
  def planeProject(v: ArrayData, planes: ArrayData, factor: Double): ArrayData = {
    val nP = planes.numElements()
    val out = new Array[Double](nP)
    var j = 0
    while (j < nP) {
      val p = planes.getArray(j)
      val n = math.min(v.numElements(), p.numElements())
      var dot = 0.0
      var i = 0
      while (i < n) { dot += v.getDouble(i) * p.getDouble(i); i += 1 }
      out(j) = factor * dot
      j += 1
    }
    ArrayData.toArrayData(out)
  }
}

/** Max |x| over finite components of an array<double>; NULL when none. */
case class VecMaxAbs(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec_max_abs expects array<double>, got $other")
  }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "vec_max_abs"
  override protected def nullSafeEval(v: Any): Any = {
    val m = QuantUtil.maxAbsFinite(v.asInstanceOf[ArrayData])
    if (java.lang.Double.isNaN(m)) null else m
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"""
         |${ev.value} = graft.functions.QuantUtil$$.MODULE$$.maxAbsFinite($v);
         |if (java.lang.Double.isNaN(${ev.value})) {
         |  ${ev.isNull} = true;
         |  ${ev.value} = 0.0;
         |}
       """.stripMargin)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Symmetric int8 quantization of an array<double> under a positive
  * scale: array<tinyint>, NULL for a degenerate scale. */
case class QuantizeI8(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"quantize_i8 expects (array<double>, double), got $other")
    }
  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "quantize_i8"
  override protected def nullSafeEval(v: Any, s: Any): Any =
    QuantUtil.quantizeI8(v.asInstanceOf[ArrayData], s.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, s) =>
      s"""
         |${ev.value} = graft.functions.QuantUtil$$.MODULE$$.quantizeI8($v, $s);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Cosine of (array<double> query, array<tinyint> code) — the int8
  * scan kernel; NULL on NaN like cosine_sim. */
case class CosineSimI8(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(ByteType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"cosine_sim_i8 expects (array<double>, array<tinyint>), got $other")
    }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim_i8"
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val c = QuantUtil.cosineI8(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (java.lang.Double.isNaN(c)) null else c
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |${ev.value} = graft.functions.QuantUtil$$.MODULE$$.cosineI8($a, $b);
         |if (java.lang.Double.isNaN(${ev.value})) {
         |  ${ev.isNull} = true;
         |  ${ev.value} = 0.0;
         |}
       """.stripMargin)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Dense plane projection: array<double> of factor * dot(v, plane_j).
  * Native for the same reason as [[SignLshSig]]: the composable form is
  * either an interpreted nested higher-order function or a component
  * shuffle. */
case class PlaneProject(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(ArrayType(DoubleType, _), _), DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"plane_project expects (array<double>, array<array<double>>, double), got $other")
    }
  // elements are never null at runtime, but declared nullable so the
  // parquet/arrow schema of a projected table matches what other
  // engines write for a plain list<double> (q_project_rp hash-compares
  // the arrow types, and DuckDB has no non-null list element)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "plane_project"
  override protected def nullSafeEval(v: Any, p: Any, f: Any): Any =
    QuantUtil.planeProject(
      v.asInstanceOf[ArrayData], p.asInstanceOf[ArrayData], f.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, p, f) =>
      s"graft.functions.QuantUtil$$.MODULE$$.planeProject($v, $p, $f)")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

object quantExprs {
  def vec_max_abs(v: Column): Column =
    Bridge.toColumn(VecMaxAbs(Bridge.toExpression(v)))
  def quantize_i8(v: Column, scale: Column): Column =
    Bridge.toColumn(QuantizeI8(Bridge.toExpression(v), Bridge.toExpression(scale)))
  def cosine_sim_i8(query: Column, code: Column): Column =
    Bridge.toColumn(CosineSimI8(Bridge.toExpression(query), Bridge.toExpression(code)))
  def plane_project(v: Column, planes: Column, factor: Column): Column =
    Bridge.toColumn(PlaneProject(
      Bridge.toExpression(v), Bridge.toExpression(planes), Bridge.toExpression(factor)))
}
