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

  /**
   * Distributed GLOBAL running totals: long-typed cumulative sums of
   * `values` over the total order `order`, without ever collapsing to
   * one task. A bare `Window.orderBy(...)` with no PARTITION BY is
   * the classic scale-killer (every row through a single reducer);
   * this instead range-partitions on the order keys, runs the
   * cumulative window WITHIN each partition (all partitions in
   * parallel), and adds broadcast per-partition prefix offsets — a
   * P-row driver exchange, P = shuffle parallelism. The input is
   * checkpointed once so the offset job and the output job see the
   * same (sampled) range boundaries.
   */
  /**
   * Per-GROUP running totals without a per-group window task — the
   * grouped form of [[cumulativeSums]]. A bare
   * `Window.partitionBy(group).orderBy(...)` puts an ENTIRE group
   * through one task: the skew-killer when a group is a web domain
   * with billions of rows. Instead: one GLOBAL range-partitioned
   * prefix sum over the (group, order...) total order — a huge group
   * SPANS partitions — minus each group's base offset (the whole
   * totals of preceding groups: a groups-sized table computed with a
   * bounded global window and broadcast back). INCLUSIVE sums, named
   * per `values`, exactly matching
   * `sum(v).over(Window.partitionBy(group).orderBy(order...))`.
   */
  def groupedPrefixSums(df: DataFrame, group: Column, order: Seq[Column],
      values: Seq[(Column, String)]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val tagged = df.withColumn("_g", group)
    val cum = cumulativeSums(tagged, col("_g") +: order,
      values.map { case (v, n) => (v, s"_incl_$n") })
    val aggs = values.zipWithIndex.map { case ((v, _), i) =>
      sum(v.cast("long")).as(s"_tot_$i")
    }
    // one row per group; the global window is bounded by the group count
    val w = Window.orderBy(col("_g")).rowsBetween(Window.unboundedPreceding, -1)
    val bases = values.zipWithIndex.foldLeft(
      tagged.groupBy("_g").agg(aggs.head, aggs.tail: _*)) { case (acc, ((_, n), i)) =>
      acc.withColumn(s"_base_$n", coalesce(sum(col(s"_tot_$i")).over(w), lit(0L)))
    }.select(col("_g") +: values.map { case (_, n) => col(s"_base_$n") }: _*)
    val out = values.foldLeft(cum.join(broadcast(bases), "_g")) { case (acc, (_, n)) =>
      acc.withColumn(n, col(s"_incl_$n") - col(s"_base_$n"))
    }
    out.drop("_g")
      .drop(values.flatMap { case (_, n) => Seq(s"_incl_$n", s"_base_$n") }: _*)
  }

  def cumulativeSums(df: DataFrame, order: Seq[Column],
      values: Seq[(Column, String)]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val parts = df.repartitionByRange(order: _*).localCheckpoint()
    val withPid = parts.withColumn("_pid", spark_partition_id())
    val sumCols = values.zipWithIndex.map { case ((v, _), i) => sum(v.cast("long")).as(s"v$i") }
    val perPart = withPid.groupBy("_pid").agg(sumCols.head, sumCols.tail: _*)
      .collect().sortBy(_.getInt(0))
    // exclusive prefix offsets per value, as a map-literal lookup
    val offsets = values.indices.map { i =>
      var acc = 0L
      perPart.map { r =>
        val pid = r.getInt(0)
        val here = acc
        acc += r.getLong(i + 1)
        pid -> here
      }.toMap
    }
    val w = Window.partitionBy(col("_pid")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = values.zipWithIndex.foldLeft(withPid) { case (acc, ((v, name), i)) =>
      val offMap = if (offsets(i).isEmpty) typedLit(Map.empty[Int, Long])
        else map(offsets(i).toSeq.sortBy(_._1)
          .flatMap { case (p, o) => Seq(lit(p), lit(o)) }: _*)
      acc.withColumn(name, sum(v.cast("long")).over(w) + element_at(offMap, col("_pid")))
    }
    out.drop("_pid")
  }
}
