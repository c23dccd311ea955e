package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Access shim: `ExpressionUtils` and `AbstractDataType` are
  * `private[sql]`, so the (tiny) bridge lives under the sql package —
  * the conventional extension point for libraries adding native Catalyst
  * expressions. Everything else in this project stays in `graft.*`. */
object GraftShim {
  type AbstractDataType = org.apache.spark.sql.types.AbstractDataType

  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Runtime function registration (the live-session counterpart of
    * SparkSessionExtensions.injectFunction). */
  def registerFunction(
    spark: org.apache.spark.sql.SparkSession,
    ident: org.apache.spark.sql.catalyst.FunctionIdentifier,
    info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
    builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .registerFunction(ident, info, builder)
}
