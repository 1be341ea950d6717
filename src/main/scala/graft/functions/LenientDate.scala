package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Reference-faithful LENIENT date parsing (`Pipeline.groovy:779-798`
  * builds `java.text.SimpleDateFormat`s, which are lenient by
  * default): out-of-range calendar fields ROLL (month 13 → January of
  * the next year, February 30 → March 2) and trailing garbage after a
  * successful prefix parse is ACCEPTED — two behaviors Spark's strict
  * `try_to_timestamp` (the [[graft.etl.Pipeline.asDate]] default)
  * rejects. Formats are tried in order; the first that parses wins;
  * null when none do. Parsing is pinned to UTC so the lenient roll
  * arithmetic is DST-free and the result is the wall-clock
  * TIMESTAMP_NTZ the strict path also produces. */
object LenientDateUtil {

  private val cache =
    new ThreadLocal[java.util.HashMap[String, java.text.SimpleDateFormat]] {
      override def initialValue() =
        new java.util.HashMap[String, java.text.SimpleDateFormat]()
    }

  private def fmt(f: String): java.text.SimpleDateFormat = {
    val m = cache.get()
    var sdf = m.get(f)
    if (sdf == null) {
      sdf = new java.text.SimpleDateFormat(f, java.util.Locale.ROOT)
      sdf.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
      m.put(f, sdf)
    }
    sdf
  }

  /** Micros-since-epoch (NTZ wall clock) of the first format that
    * parses, else null. */
  def parse(s: UTF8String, formats: Array[String]): java.lang.Long = {
    val str = s.toString
    var i = 0
    while (i < formats.length) {
      try
        return java.lang.Long.valueOf(fmt(formats(i)).parse(str).getTime * 1000L)
      catch { case _: java.text.ParseException => () }
      i += 1
    }
    null
  }
}

/** SimpleDateFormat-lenient multi-format parse to TIMESTAMP_NTZ — see
  * [[LenientDateUtil]]. */
case class LenientSimpleDate(child: Expression, formats: Seq[String])
    extends UnaryExpression {

  require(formats.nonEmpty, "lenient_simple_date needs at least one format")
  // formats are validated eagerly so a bad pattern fails at plan time,
  // not per-row on the executors
  formats.foreach(new java.text.SimpleDateFormat(_, java.util.Locale.ROOT))

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"lenient_simple_date expects string, got ${other.simpleString}")
    }
  override def dataType: DataType = TimestampNTZType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lenient_simple_date"

  @transient private lazy val fmtArr: Array[String] = formats.toArray

  override protected def nullSafeEval(input: Any): Any =
    LenientDateUtil.parse(input.asInstanceOf[UTF8String], fmtArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fmtRef = ctx.addReferenceObj("lenientFormats", fmtArr, "java.lang.String[]")
    nullSafeCodeGen(ctx, ev, c => {
      val parsed = ctx.freshName("parsed")
      s"""
         |java.lang.Long $parsed =
         |  graft.functions.LenientDateUtil$$.MODULE$$.parse($c, $fmtRef);
         |${ev.isNull} = ($parsed == null);
         |${ev.value} = ${ev.isNull} ? -1L : $parsed.longValue();
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object dateExprs {
  def lenient_simple_date(c: Column, formats: Seq[String]): Column =
    Bridge.toColumn(LenientSimpleDate(Bridge.toExpression(c), formats))
}
