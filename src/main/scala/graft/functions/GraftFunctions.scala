package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** Registration of graft's native expressions for SQL use. */
object GraftFunctions {

  private def buildMinHash(args: Seq[Expression]): Expression = args match {
    case Seq(child) => MinHashSig(child, 64)
    case Seq(child, Literal(n: Int, _)) => MinHashSig(child, n)
    case _ => throw new IllegalArgumentException(
      "minhash_sig(array<string>[, numHashes literal]) expects 1 or 2 arguments")
  }

  private val minhashInfo = new ExpressionInfo(
    classOf[MinHashSig].getName, "minhash_sig")

  /** Register on a live session (tests, notebooks). */
  def registerAll(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("minhash_sig"), minhashInfo, buildMinHash _)
}

/** `spark.sql.extensions=graft.functions.GraftExtensions` — the
  * SparkSessionExtensions injection point (SURVEY §7 / spark_guide
  * pattern) for deployments. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit =
    e.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (args: Seq[Expression]) => args match {
        case Seq(child) => MinHashSig(child, 64)
        case Seq(child, Literal(n: Int, _)) => MinHashSig(child, n)
        case other => throw new IllegalArgumentException(
          s"minhash_sig expects 1-2 args, got ${other.size}")
      }))
}
