package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Native SimHash expression: array<string> tokens → array<int> of
  * `bits` sign bits (bit k = sign of the sum over tokens of ±1 taken
  * from bit k of the token's xxhash64). One hash per token, one pass
  * per row, whole-stage codegen via a static call — replaces the
  * explode + `bits` sum-aggregates formulation (one shuffle and `bits`
  * hash evaluations per token).
  *
  * The bit-array output (rather than a packed long) slices directly
  * into LSH bands and keeps Hamming distance a zip_with sum.
  */
case class SimHashSig(child: Expression, bits: Int)
    extends UnaryExpression {
  require(bits > 0 && bits <= 64, "bits must be in 1..64")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"simhash_sig expects array<string>, got ${other.simpleString}")
    }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    SimHashSigUtil.compute(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SimHashSigUtil$$.MODULE$$.compute($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashSigUtil {
  def compute(tokens: ArrayData, bits: Int): ArrayData = {
    val counters = new Array[Long](bits)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i)
      if (t != null) {
        val h = XxHash64Function.hash(t, StringType, 42L)
        var k = 0
        while (k < bits) {
          counters(k) += (((h >>> k) & 1L) * 2L - 1L) // bit -> +1 / -1
          k += 1
        }
      }
      i += 1
    }
    val out = new Array[Int](bits)
    var k = 0
    while (k < bits) { out(k) = if (counters(k) >= 0) 1 else 0; k += 1 }
    new GenericArrayData(out)
  }
}

object simhashExprs {
  def simhash_sig(tokens: Column, bits: Int): Column =
    Bridge.toColumn(SimHashSig(Bridge.toExpression(tokens), bits))
}
