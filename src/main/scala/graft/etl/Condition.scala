package graft.etl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import scala.util.matching.Regex

/** Compiles the map-form filter of the reference
  * (gratum `src/main/groovy/gratum/etl/Condition.groovy:13-60`) into a
  * single Catalyst predicate `Column`, so the whole conjunction
  * participates in codegen and parquet pushdown:
  *
  *  - literal value        → equality
  *  - `Iterable`           → IN-list
  *  - [[scala.util.matching.Regex]] → unanchored regex find (`rlike`)
  *  - `Column`             → arbitrary predicate on that column's value
  *  - key `"*"` + `Column` → whole-row predicate (enables OR logic)
  *  - `null`               → IS NULL
  */
object Condition {

  def compile(conditions: Map[String, Any]): Column =
    conditions
      .map {
        case ("*", c: Column)      => c
        case (_, c: Column)        => c
        case (k, r: Regex)         => col(k).rlike(r.regex)
        case (k, null)             => col(k).isNull
        case (k, vs: Iterable[_])  => col(k).isin(vs.toSeq: _*)
        case (k, v)                => col(k) === lit(v)
      }
      .reduceOption(_ && _)
      .getOrElse(lit(true))

  /** Human-readable description used as the rejection reason. */
  def describe(conditions: Map[String, Any]): String =
    conditions
      .map {
        case (k, r: Regex) => s"$k ~ /${r.regex}/"
        case (k, c: Column) => s"$k matches ${c.toString}"
        case (k, vs: Iterable[_]) => s"$k in ${vs.mkString("[", ",", "]")}"
        case (k, v) => s"$k == $v"
      }
      .mkString(", ")
}
