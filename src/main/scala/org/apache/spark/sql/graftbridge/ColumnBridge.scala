package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge: Spark 4 made expression-backed Column
  * construction `private[sql]` (columnNodeSupport.scala), so libraries that
  * ship native Catalyst expressions reach it through an sql-package bridge
  * — the standard spark-packages pattern.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
