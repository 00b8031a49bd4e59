package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ catalyst Expression bridge. Spark 4 made these conversions
  * `private[sql]` (Column is a ColumnNode wrapper in sql-api); custom
  * Expression libraries conventionally expose them via a shim in the
  * sql namespace — the only file in this repo living outside the
  * `graft` package. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
