package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame, Observation, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
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

  /** Analyzed logical plan of a DataFrame (for building custom logical
    * nodes over resolved children — `queryExecution` lives on the
    * classic Dataset in Spark 4). */
  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].queryExecution.analyzed

  /** DataFrame over a custom logical plan (`Dataset.ofRows` is
    * private[sql]). */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Non-blocking observation read (`Observation.getOrEmpty` is
    * private[spark]): empty map until the metrics event arrives. */
  def observedMetrics(obs: Observation): Map[String, Any] = obs.getOrEmpty
}
