package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Native cosine similarity over two array<double> columns.
  *
  * Accumulates dot and both norms in ONE sequential pass (index order,
  * double precision) — bit-identical to the zip_with/aggregate
  * formulation and to the DuckDB oracle's list arithmetic, but inside
  * whole-stage codegen instead of interpreted lambda evaluation. */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"cosine_sim expects (array<double>, array<double>), got $other")
    }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // NULL (not NaN) when the cosine is undefined — a zero-norm vector
  // (failed encoder output) or NaN components. The naive dot/norms
  // division gives NaN, and Spark orders NaN ABOVE every double: one
  // zero embedding in a 100 TB corpus would rank FIRST in every
  // `ORDER BY cosine DESC` top-k while silently passing every spec on
  // clean data. NULL instead sorts last under the DESC default,
  // fails `>= threshold` filters, and matches what the DuckDB oracle's
  // own x/0 yields — degenerate vectors drop out of similarity results
  // identically on both engines.
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val c = SimilarityUtil.cosine(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (java.lang.Double.isNaN(c)) null else c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |${ev.value} = graft.functions.SimilarityUtil$$.MODULE$$.cosine($a, $b);
         |if (java.lang.Double.isNaN(${ev.value})) {
         |  ${ev.isNull} = true;
         |  ${ev.value} = 0.0;
         |}
       """.stripMargin)

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Euclidean norm sqrt(Σ x_i²) of an array<double>/array<float> column
  * — the per-ROW half of [[CosineSimPre]]'s hoisted-norm cosine. The
  * accumulation loop is bit-identical to [[SimilarityUtil.cosine]]'s
  * norm loops (sequential index order, double arithmetic; floats widen
  * exactly), so `dot/(norm(a)*norm(b))` reproduces `cosine_sim(a, b)`
  * bit for bit. */
case class VecNorm(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) | ArrayType(FloatType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"vec_norm expects array<double> or array<float>, got $other")
    }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_norm"
  private def isFloat = child.dataType == ArrayType(FloatType, true) ||
    child.dataType == ArrayType(FloatType, false)
  override protected def nullSafeEval(a: Any): Any =
    if (isFloat) SimilarityUtil.normF(a.asInstanceOf[ArrayData])
    else SimilarityUtil.norm(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (isFloat) "normF" else "norm"
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.SimilarityUtil$$.MODULE$$.$fn($a)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Hoisted-norm cosine similarity: `dot(a, b) / (na * nb)` where
  * `na`/`nb` are the PRECOMPUTED [[VecNorm]]s of `a`/`b` — the per-PAIR
  * half of the guide-§1.2 "per-task work" split. The naive
  * [[CosineSim]] re-walks both arrays for their norms on EVERY
  * candidate pair (3 passes/pair); in an all-pairs or banded screen
  * each row is paired against many others, so hoisting the norms to
  * one [[VecNorm]] per ROW cuts the pair kernel to the dot product
  * alone (~3x fewer flops where pair counts dominate). Bit-identical:
  * dot loop order unchanged, and `dot / (sqrt(na) * sqrt(nb))` is the
  * same double expression [[SimilarityUtil.cosine]] evaluates — NULL
  * (not NaN) on degenerate vectors, like [[CosineSim]].
  * Float arrays widen per element (exact), halving pair-side bytes
  * when the caller keeps the raw float vectors. */
case class CosineSimPre(first: Expression, second: Expression,
    third: Expression, fourth: Expression)
    extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (ArrayType(DoubleType | FloatType, _), ArrayType(DoubleType | FloatType, _),
          DoubleType, DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"cosine_sim_pre expects (array<double|float>, array<double|float>, " +
          s"double, double) — mixed element types allowed (floats widen " +
          s"exactly), got $other")
    }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim_pre"
  // per-side element-type dispatch (r22): float sides widen to double
  // per ELEMENT inside the kernel — exact, so every combination is
  // bit-identical to asDouble-casting first. Mixed (float, double)
  // pairs arise when a float corpus screens against a double catalog.
  private def sideIsFloat(t: DataType) = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  private def kernel: String =
    (sideIsFloat(first.dataType), sideIsFloat(second.dataType)) match {
      case (false, false) => "cosinePre"
      case (true, true) => "cosinePreF"
      case (true, false) => "cosinePreFD"
      case (false, true) => "cosinePreDF"
    }
  override protected def nullSafeEval(a: Any, b: Any, na: Any, nb: Any): Any = {
    val aa = a.asInstanceOf[ArrayData]
    val bb = b.asInstanceOf[ArrayData]
    val nna = na.asInstanceOf[Double]
    val nnb = nb.asInstanceOf[Double]
    val c = kernel match {
      case "cosinePre" => SimilarityUtil.cosinePre(aa, bb, nna, nnb)
      case "cosinePreF" => SimilarityUtil.cosinePreF(aa, bb, nna, nnb)
      case "cosinePreFD" => SimilarityUtil.cosinePreFD(aa, bb, nna, nnb)
      case _ => SimilarityUtil.cosinePreDF(aa, bb, nna, nnb)
    }
    if (java.lang.Double.isNaN(c)) null else c
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = kernel
    nullSafeCodeGen(ctx, ev, (a, b, na, nb) =>
      s"""
         |${ev.value} = graft.functions.SimilarityUtil$$.MODULE$$.$fn($a, $b, $na, $nb);
         |if (java.lang.Double.isNaN(${ev.value})) {
         |  ${ev.isNull} = true;
         |  ${ev.value} = 0.0;
         |}
       """.stripMargin)
  }
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): Expression =
    copy(first = f, second = s, third = t, fourth = q)
}

/** Native Jaccard similarity of two array<string> columns as SETS. */
case class JaccardSim(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"jaccard_sim expects (array<string>, array<string>), got $other")
    }
  override def dataType: DataType = DoubleType
  // deliberately NOT null-intolerant: with it, a downstream filter on
  // the jaccard value lets Catalyst infer isnotnull(<shingle expr>) and
  // push the whole (expensive) shingle construction into the scan as a
  // data filter — evaluated for every row before the candidate
  // semi-join. Runtime null behavior is unchanged (null in -> null out).
  override def nullIntolerant: Boolean = false
  override def prettyName: String = "jaccard_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SimilarityUtil.jaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SimilarityUtil$$.MODULE$$.jaccard($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Fraction of equal components of two array<long> MinHash signatures
  * (the unbiased Jaccard estimator) — native because the composable
  * zip_with+filter form runs interpreted over every candidate pair. */
case class SigAgreement(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"sig_agreement expects (array<long>, array<long>), got $other")
    }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sig_agreement"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    SimilarityUtil.agreement(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SimilarityUtil$$.MODULE$$.agreement($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Hamming distance of two array<int> bit signatures (SimHash). */
case class HammingDist(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"hamming_dist expects (array<int>, array<int>), got $other")
    }
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hamming_dist"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    SimilarityUtil.hamming(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SimilarityUtil$$.MODULE$$.hamming($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Sign-LSH bit signature of an array<double> vector against a literal
  * array<array<double>> of random hyperplanes: bit j = 1 iff
  * dot(vector, plane_j) >= 0. Native because the composable form is a
  * posexplode + one aggregate per plane — a shuffle of every vector
  * component — or an interpreted nested higher-order function; this is
  * one codegen'd pass over the vector per plane, no shuffle at all. */
case class SignLshSig(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType | FloatType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"sign_lsh_sig expects (array<double|float>, array<array<double>>), got $other")
    }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sign_lsh_sig"
  // float vectors widen per element inside the kernel (exact) — the
  // r22 float-carry: signatures off the raw float column are
  // bit-identical to signatures off its asDouble cast
  private def isFloat = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override protected def nullSafeEval(v: Any, planes: Any): Any =
    if (isFloat)
      SimilarityUtil.signBitsF(v.asInstanceOf[ArrayData], planes.asInstanceOf[ArrayData])
    else
      SimilarityUtil.signBits(v.asInstanceOf[ArrayData], planes.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (isFloat) "signBitsF" else "signBits"
    defineCodeGen(ctx, ev, (v, p) =>
      s"graft.functions.SimilarityUtil$$.MODULE$$.$fn($v, $p)")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object SimilarityUtil {

  /** One sequential dot product per plane (same accumulation order as
    * the fold/aggregate formulations). */
  def signBits(v: ArrayData, planes: ArrayData): ArrayData = {
    val nP = planes.numElements()
    val out = new Array[Int](nP)
    var j = 0
    while (j < nP) {
      val p = planes.getArray(j)
      val n = math.min(v.numElements(), p.numElements())
      var dot = 0.0
      var i = 0
      while (i < n) { dot += v.getDouble(i) * p.getDouble(i); i += 1 }
      out(j) = if (dot >= 0) 1 else 0
      j += 1
    }
    ArrayData.toArrayData(out)
  }

  /** Float-vector sign bits — elements widen to double exactly, so the
    * per-plane dots (and therefore every bit) match [[signBits]] over
    * the asDouble-cast vector (r22 float-carry). */
  def signBitsF(v: ArrayData, planes: ArrayData): ArrayData = {
    val nP = planes.numElements()
    val out = new Array[Int](nP)
    var j = 0
    while (j < nP) {
      val p = planes.getArray(j)
      val n = math.min(v.numElements(), p.numElements())
      var dot = 0.0
      var i = 0
      while (i < n) {
        val x: Double = v.getFloat(i)
        dot += x * p.getDouble(i)
        i += 1
      }
      out(j) = if (dot >= 0) 1 else 0
      j += 1
    }
    ArrayData.toArrayData(out)
  }

  def agreement(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var eq = 0
    var i = 0
    while (i < n) { if (a.getLong(i) == b.getLong(i)) eq += 1; i += 1 }
    if (n == 0) 0.0 else eq.toDouble / n
  }

  /** Seq overload for JVM-side callers (the streaming LSH state op) —
    * ONE estimator definition shared with the `sig_agreement`
    * expression, so the two paths cannot drift. */
  def agreement(a: Seq[Long], b: Seq[Long]): Double = {
    val n = math.min(a.length, b.length)
    var eq = 0
    var i = 0
    while (i < n) { if (a(i) == b(i)) eq += 1; i += 1 }
    if (n == 0) 0.0 else eq.toDouble / n
  }

  def hamming(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var d = 0
    var i = 0
    while (i < n) { if (a.getInt(i) != b.getInt(i)) d += 1; i += 1 }
    d
  }

  /** Sequential-order cosine: same operation order as a left fold of
    * the products, so results match engines doing sequential double
    * arithmetic bit-for-bit. */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) { dot += a.getDouble(i) * b.getDouble(i); i += 1 }
    var na = 0.0
    i = 0
    while (i < a.numElements()) { val x = a.getDouble(i); na += x * x; i += 1 }
    var nb = 0.0
    i = 0
    while (i < b.numElements()) { val x = b.getDouble(i); nb += x * x; i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Norm half of the hoisted cosine — the same loop as [[cosine]]'s
    * `na` accumulation, then sqrt. */
  def norm(a: ArrayData): Double = {
    var na = 0.0
    var i = 0
    while (i < a.numElements()) { val x = a.getDouble(i); na += x * x; i += 1 }
    math.sqrt(na)
  }

  /** Float-array norm: elements widen to double exactly, so the sum
    * matches [[norm]] over the asDouble-cast array bit for bit. */
  def normF(a: ArrayData): Double = {
    var na = 0.0
    var i = 0
    while (i < a.numElements()) { val x: Double = a.getFloat(i); na += x * x; i += 1 }
    math.sqrt(na)
  }

  /** Pair half of the hoisted cosine: dot product in [[cosine]]'s loop
    * order divided by the precomputed norms — `dot / (sqrt(na) *
    * sqrt(nb))` evaluated as the identical double expression. */
  def cosinePre(a: ArrayData, b: ArrayData, na: Double, nb: Double): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) { dot += a.getDouble(i) * b.getDouble(i); i += 1 }
    dot / (na * nb)
  }

  /** Float-array pair half — elements widen exactly (see [[normF]]). */
  def cosinePreF(a: ArrayData, b: ArrayData, na: Double, nb: Double): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      val x: Double = a.getFloat(i)
      val y: Double = b.getFloat(i)
      dot += x * y
      i += 1
    }
    dot / (na * nb)
  }

  /** Mixed (float, double) pair half — the float side widens exactly,
    * so the dot matches [[cosinePre]] over both asDouble casts bit for
    * bit (r22 float-carry: a float corpus against a double catalog). */
  def cosinePreFD(a: ArrayData, b: ArrayData, na: Double, nb: Double): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      val x: Double = a.getFloat(i)
      dot += x * b.getDouble(i)
      i += 1
    }
    dot / (na * nb)
  }

  /** Mixed (double, float) pair half — see [[cosinePreFD]]. */
  def cosinePreDF(a: ArrayData, b: ArrayData, na: Double, nb: Double): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      val y: Double = b.getFloat(i)
      dot += a.getDouble(i) * y
      i += 1
    }
    dot / (na * nb)
  }

  def jaccard(a: ArrayData, b: ArrayData): Double = {
    val sa = new java.util.HashSet[Any]()
    var i = 0
    while (i < a.numElements()) {
      val v = a.getUTF8String(i); if (v != null) sa.add(v); i += 1
    }
    val sb = new java.util.HashSet[Any]()
    i = 0
    while (i < b.numElements()) {
      val v = b.getUTF8String(i); if (v != null) sb.add(v); i += 1
    }
    var inter = 0
    val it = sa.iterator()
    while (it.hasNext) { if (sb.contains(it.next())) inter += 1 }
    val union = sa.size() + sb.size() - inter
    if (union == 0) 1.0 else inter.toDouble / union
  }
}

object similarityExprs {
  def cosine_sim(a: Column, b: Column): Column =
    Bridge.toColumn(CosineSim(Bridge.toExpression(a), Bridge.toExpression(b)))
  def vec_norm(a: Column): Column =
    Bridge.toColumn(VecNorm(Bridge.toExpression(a)))
  def cosine_sim_pre(a: Column, b: Column, na: Column, nb: Column): Column =
    Bridge.toColumn(CosineSimPre(Bridge.toExpression(a), Bridge.toExpression(b),
      Bridge.toExpression(na), Bridge.toExpression(nb)))
  def jaccard_sim(a: Column, b: Column): Column =
    Bridge.toColumn(JaccardSim(Bridge.toExpression(a), Bridge.toExpression(b)))
  def sig_agreement(a: Column, b: Column): Column =
    Bridge.toColumn(SigAgreement(Bridge.toExpression(a), Bridge.toExpression(b)))
  def hamming_dist(a: Column, b: Column): Column =
    Bridge.toColumn(HammingDist(Bridge.toExpression(a), Bridge.toExpression(b)))
  def sign_lsh_sig(v: Column, planes: Column): Column =
    Bridge.toColumn(SignLshSig(Bridge.toExpression(v), Bridge.toExpression(planes)))
}
