package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Spark 4 removed the public Column(Expression) constructor; the
 * supported conversion lives in `private[sql] classic.ExpressionUtils`.
 * This shim (in an org.apache.spark.sql subpackage, the standard pattern
 * for Spark extensions) re-exports the two conversions our custom
 * Catalyst expressions need.
 */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
