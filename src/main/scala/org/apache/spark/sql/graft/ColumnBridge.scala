package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Spark 4 hides Column <-> Expression conversion behind
 * `private[sql]`; extension libraries conventionally bridge it from an
 * `org.apache.spark.sql` subpackage. This is the only file outside the
 * `graft` namespace.
 */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
