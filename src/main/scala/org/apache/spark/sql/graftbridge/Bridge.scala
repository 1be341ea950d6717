package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType}

/** Column <-> Expression bridge for graft's native Catalyst expressions.
  *
  * Spark 4 `Column` wraps a ColumnNode rather than an Expression and the
  * conversion utilities are `private[sql]`; this object lives inside the
  * sql namespace to expose exactly the two conversions a third-party
  * expression library needs (the standard extension-library pattern).
  */
object Bridge {
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)

  /** AbstractDataType is private[sql]; expose an input-type spec helper
    * so graft expressions can declare ExpectsInputTypes. */
  def abstractType(dt: DataType): AbstractDataType = dt
}
