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

  /**
   * Eager Column → catalyst Expression conversion. `expression(c)`
   * returns a lazy `ColumnNodeExpression` wrapper whose internal
   * ColumnNode payload is not serializable into task closures;
   * custom physical operators need the fully-converted tree.
   */
  def eagerExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter.apply(c.node)

  /** Build a DataFrame from a custom LogicalPlan (classic.Dataset.ofRows is private[sql]). */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
