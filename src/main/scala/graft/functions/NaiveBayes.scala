package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Multinomial Naive Bayes text classifier in closed form — the
  * supervised quality axis of a corpus pipeline (the role the fastText
  * classifier plays in the CCNet/LLaMA stacks: label a model-sized
  * slice "curated vs crawl", score the whole corpus). Closed-form
  * counts instead of SGD on purpose: training is ONE aggregation, the
  * model is reproducible bit-for-bit, and a DuckDB oracle can re-derive
  * every score (an iteratively-trained weight vector could only be
  * rows-only gated).
  *
  * Per-token log10 odds with Laplace smoothing, V = distinct tokens
  * over BOTH classes, N_c = total token occurrences in class c:
  *   logOdds(t) = log10((C1(t)+1)/(N1+V)) − log10((C0(t)+1)/(N0+V))
  * Document score = log10(docs1/docs0) + Σ logOdds(t_i); verdict =
  * score > 0. Token identity is the [[WordNgramHashSeq]] n=1 chain —
  * the same derivation LM scoring uses. */
case class NbModel(
    keys: Array[Long], pos: Array[Long], neg: Array[Long],
    nPos: Long, nNeg: Long, vocab: Long,
    docsPos: Long, docsNeg: Long) extends Serializable

object NbScoreUtil {
  /** Per-token log10 odds of a text under `m`. */
  def logOdds(text: UTF8String, m: NbModel): ArrayData = {
    val (th, n) = NgramHashesUtil.tokenHashes(text)
    val out = new Array[Double](n)
    val dPos = (m.nPos + m.vocab).toDouble
    val dNeg = (m.nNeg + m.vocab).toDouble
    var i = 0
    while (i < n) {
      val h = NgramHashesUtil.windowHash(th, i, 1)
      val k = java.util.Arrays.binarySearch(m.keys, h)
      val (cp, cn) = if (k >= 0) (m.pos(k), m.neg(k)) else (0L, 0L)
      out(i) = math.log10((cp + 1).toDouble / dPos) -
        math.log10((cn + 1).toDouble / dNeg)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Per-token log10 NB odds of a string column under a broadcast
  * [[NbModel]] — one native pass, stateless (streams unchanged). */
case class NbTokenLogOdds(
    child: Expression,
    modelBc: org.apache.spark.broadcast.Broadcast[NbModel])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"nb_token_log_odds expects string, got ${other.simpleString}")
    }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nb_token_log_odds"

  override protected def nullSafeEval(input: Any): Any =
    NbScoreUtil.logOdds(input.asInstanceOf[UTF8String], modelBc.value)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("nbModelBc", modelBc,
      "org.apache.spark.broadcast.Broadcast")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NbScoreUtil$$.MODULE$$.logOdds($c, " +
        s"(graft.functions.NbModel) $bcRef.value())")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
