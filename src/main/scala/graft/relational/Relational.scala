package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Ascending, SortOrder}
import org.apache.spark.sql.graft.ColumnBridge

import graft.plans.{TopKPerKey, TopKStrategy}

/**
 * Relational facade for the engine's custom whole-plan operators
 * (SURVEY §7.1 `relational/`). Built-in gap-table operators
 * (joins/windows/sorts/set-ops) are exposed directly through
 * `org.apache.spark.sql` — only operators Spark lacks live here.
 */
object Relational {

  /**
   * Top-k rows per key via the custom two-phase heap operator
   * ([[graft.plans.TopKPerKey]]): map-side reduction to ≤k rows per
   * key before the only shuffle. Pass a total order (include a
   * unique tiebreak column) for deterministic results.
   */
  def topKPerKey(df: DataFrame, keys: Seq[Column], order: Seq[Column], k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies = spark.experimental.extraStrategies :+ TopKStrategy
    val sortOrders = order.map(c => ColumnBridge.eagerExpression(c) match {
      case so: SortOrder => so
      case e => SortOrder(e, Ascending)
    })
    ColumnBridge.ofRows(spark,
      TopKPerKey(keys.map(ColumnBridge.eagerExpression), sortOrders, k, df.queryExecution.logical))
  }
}
