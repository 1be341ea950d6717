package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{ByteType, DecimalType, IntegerType, LongType, ShortType}

/** Shared fail-fast schema contracts for operators that carry a column
  * through a LONG-typed buffer or graph node: a non-integral column
  * would either fail late at runtime (ANSI cast) or silently come back
  * NULL (non-ANSI) — both worse than a plan-build-time error. */
private[graft] object ColumnChecks {

  /** Accepts the integral types plus scale-0 decimals (the common
    * parquet BIGINT-surrogate encoding — exact through cast to long for
    * in-range values; out-of-range fails loudly under ANSI). */
  def requireIntegral(df: DataFrame, colName: String, op: String, remedy: String): Unit = {
    val dt = df.schema(colName).dataType
    val ok = dt match {
      case ByteType | ShortType | IntegerType | LongType => true
      case d: DecimalType if d.scale == 0 => true
      case _ => false
    }
    require(ok,
      s"$op requires an integral column (it is carried as LONG); " +
        s"'$colName' is ${dt.simpleString}. $remedy")
  }
}
