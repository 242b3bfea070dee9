package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Expression → Column bridge (Spark 4.x classic API). Lives under
  * `org.apache.spark.sql` solely to reach the `private[sql]`
  * `ExpressionUtils.column` — the standard technique for Spark
  * extension libraries — so graft's public set-builder helpers can
  * hand out Columns that CARRY the kernel expression, working on any
  * session instead of only ones where [[graft.functions.Graft]] has
  * populated the FunctionRegistry with the kernel's name.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
