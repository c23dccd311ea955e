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
}
