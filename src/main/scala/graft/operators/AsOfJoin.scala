package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of (backward) join: for each left row, attach the latest right
 * row whose time is <= the left row's time, per key. The reference
 * has no such operator (SURVEY §2.4); this is the standard
 * time-series enrichment primitive.
 *
 * Scale design: implemented as union + one window pass — a single
 * hash shuffle on the key, then a per-key time sort (Spark's window
 * sort). The naive alternative (range/cross join then per-row max)
 * explodes to |L|×|R_key| pairs; this stays at |L|+|R| rows. Ordering
 * puts right rows before left rows at equal timestamps, so the match
 * is inclusive (ts >= right_time), mirroring DuckDB/pandas ASOF
 * semantics.
 *
 * The right side must be unique per (key, time) — pre-aggregate
 * duplicates first — otherwise which duplicate wins is
 * order-dependent.
 */
object AsOfJoin {

  def asofBackward(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String): DataFrame = {
    val lcols = left.columns.toSeq
    val rcols = right.columns.toSeq.filterNot(c => c == rightKey || c == rightTime)

    val lPart = left.select(
      (Seq(col(leftKey).as("_k"), col(leftTime).as("_t"), lit(1).as("_side")) ++
        lcols.map(col) ++
        rcols.map(c => lit(null).cast(right.schema(c).dataType).as(c))): _*)
    val rPart = right.select(
      (Seq(col(rightKey).as("_k"), col(rightTime).as("_t"), lit(0).as("_side")) ++
        lcols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rcols.map(col)): _*)

    val u = lPart.unionByName(rPart)
    val w = Window.partitionBy("_k").orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = rcols.foldLeft(u)((df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
    filled.filter(col("_side") === 1).drop("_k", "_t", "_side")
  }
}
