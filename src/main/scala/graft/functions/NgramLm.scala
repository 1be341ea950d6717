package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Stupid-backoff n-gram language model (Brants et al. 2007, "Large
  * Language Models in Machine Translation" — THE distributed-scale
  * smoothing choice: no held-out discounting, just raw counts and a
  * fixed backoff factor), trained by [[graft.ops.LmScore.train]] and
  * applied per document by [[LmTokenScores]].
  *
  * Count tables are parallel (ascending hash, count) long arrays —
  * binary-search lookups, one executor-shared broadcast, no boxing.
  * Gram identity is the [[WordNgramHashSeq]] chained token hash, the
  * same derivation training used, so lookup and census cannot drift.
  *
  * Scoring (token t_i, lowercased identity; log10 space), with one
  * `alpha` factor per level backed off through — a ratio used at its
  * own natural level (bigram for i == 1, unigram for i == 0) carries
  * no alpha:
  *  - trigram:  C3(t_{i-2} t_{i-1} t_i) > 0  →  C3 / C2(t_{i-2} t_{i-1})
  *  - else bigram: C2(t_{i-1} t_i) > 0       →  alpha^b · C2 / C1(t_{i-1})
  *  - else unigram, Laplace-floored so out-of-vocabulary tokens score
  *    finitely: alpha^b · (C1(t_i) + 1) / (T + V).
  * Every arithmetic step is integer counts, one IEEE division, and
  * exact multiplications by `alpha` — engine-portable, so a DuckDB
  * oracle reproduces the scores bit-for-bit after 6-decimal rounding
  * (the same contract q_tfidf uses for its `ln`). */
case class LmModel(
    uniKeys: Array[Long], uniCounts: Array[Long],
    biKeys: Array[Long], biCounts: Array[Long],
    triKeys: Array[Long], triCounts: Array[Long],
    totalTokens: Long, vocabSize: Long, alpha: Double) extends Serializable {
  def lookup(keys: Array[Long], counts: Array[Long], h: Long): Long = {
    val i = java.util.Arrays.binarySearch(keys, h)
    if (i >= 0) counts(i) else 0L
  }
}

object LmScoreUtil {
  /** Per-token log10 stupid-backoff scores of a text under `m`. */
  def scores(text: UTF8String, m: LmModel): ArrayData = {
    val (th, n) = NgramHashesUtil.tokenHashes(text)
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      // chained-window hashes, same derivation as WordNgramHashSeq
      def h1(p: Int) = NgramHashesUtil.windowHash(th, p, 1)
      def h2(p: Int) = NgramHashesUtil.windowHash(th, p, 2)
      def h3(p: Int) = NgramHashesUtil.windowHash(th, p, 3)
      // alpha^b by explicit multiplication (b <= 2): `pow` is not
      // guaranteed ulp-identical to repeated IEEE multiplication, and
      // the oracle writes the products as literals
      def alphaPow(b: Int): Double =
        if (b == 0) 1.0 else if (b == 1) m.alpha else m.alpha * m.alpha
      def uni(backoffs: Int): Double = {
        val c = m.lookup(m.uniKeys, m.uniCounts, h1(i))
        alphaPow(backoffs) *
          ((c + 1).toDouble / (m.totalTokens + m.vocabSize).toDouble)
      }
      def bi(backoffs: Int): Double = {
        val c = m.lookup(m.biKeys, m.biCounts, h2(i - 1))
        val ctx = m.lookup(m.uniKeys, m.uniCounts, h1(i - 1))
        if (c > 0L && ctx > 0L)
          alphaPow(backoffs) * (c.toDouble / ctx.toDouble)
        else uni(backoffs + 1)
      }
      val s =
        if (i >= 2) {
          val c = m.lookup(m.triKeys, m.triCounts, h3(i - 2))
          val ctx = m.lookup(m.biKeys, m.biCounts, h2(i - 2))
          if (c > 0L && ctx > 0L) c.toDouble / ctx.toDouble else bi(1)
        } else if (i == 1) bi(0)
        else uni(0)
      out(i) = math.log10(s)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Per-token log10 stupid-backoff scores of a string column under a
  * broadcast [[LmModel]] — one native pass per document (tokenize,
  * hash, three binary-search lookups per token), stateless, so it
  * scores batch and streaming corpora identically. */
case class LmTokenScores(
    child: Expression,
    modelBc: org.apache.spark.broadcast.Broadcast[LmModel])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"lm_token_scores expects string, got ${other.simpleString}")
    }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lm_token_scores"

  override protected def nullSafeEval(input: Any): Any =
    LmScoreUtil.scores(input.asInstanceOf[UTF8String], modelBc.value)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("lmModelBc", modelBc,
      "org.apache.spark.broadcast.Broadcast")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.LmScoreUtil$$.MODULE$$.scores($c, " +
        s"(graft.functions.LmModel) $bcRef.value())")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
