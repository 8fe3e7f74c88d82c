package graft.sources

import org.apache.spark.sql.DataFrame

/**
 * File-format source/sink facade (SURVEY §2.4 scans/sinks rows):
 * `df.write.{parquet,csv,json}` → `spark.read.*` round-trips.
 *
 * The reference's only "sink" is a side-effecting map step writing
 * back to the keyspace (`tests/mr_test_module/src/lib.rs:744-764`);
 * here sinks are first-class formats. The read side always reapplies
 * the writer's schema explicitly — CSV/JSON carry no Spark types on
 * the wire, and schema inference is both nondeterministic across
 * files and a full extra pass at 100 TB.
 *
 * Partitioned writes (`partitionCols`) produce hive-style `col=v`
 * directories; an equality filter on a partition column after
 * re-read is satisfied by directory pruning, never touching
 * non-matching files (asserted in PlanAuditSpec).
 */
object FileIO {

  def roundTrip(df: DataFrame, format: String, path: String,
      partitionCols: Seq[String] = Nil): DataFrame = {
    val w0 = df.write.mode("overwrite").format(format).option("header", "true")
    val w = if (partitionCols.nonEmpty) w0.partitionBy(partitionCols: _*) else w0
    w.save(path)
    df.sparkSession.read.format(format)
      .option("header", "true")
      .schema(df.schema)
      .load(path)
  }

  /**
   * Range-clustered sorted parquet write → re-read: rows are
   * range-partitioned then sorted within partitions on `clusterCol`,
   * so every file covers a narrow value range and parquet
   * row-group/file statistics satisfy later range predicates by
   * skipping, not scanning — the data-skipping layout for the 100 TB
   * time-series case (hive-style directory partitioning would create
   * one directory per distinct value; range clustering keeps file
   * counts fixed). The predicate must still reach the scan as a
   * pushed filter (pinned in PlanAuditSpec).
   */
  def sortedRoundTrip(df: DataFrame, path: String, clusterCol: String,
      partitions: Int = 8): DataFrame = {
    import org.apache.spark.sql.functions.col
    df.repartitionByRange(partitions, col(clusterCol))
      .sortWithinPartitions(clusterCol)
      .write.mode("overwrite").parquet(path)
    df.sparkSession.read.schema(df.schema).parquet(path)
  }

  /** Morton spread: the low 16 bits of `c`, one zero bit between each. */
  private def spread16(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{lit, shiftleft}
    var x = c.bitwiseAND(lit(0xffffL))
    x = (x.bitwiseOR(shiftleft(x, 8))).bitwiseAND(lit(0x00FF00FFL))
    x = (x.bitwiseOR(shiftleft(x, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    x = (x.bitwiseOR(shiftleft(x, 2))).bitwiseAND(lit(0x33333333L))
    (x.bitwiseOR(shiftleft(x, 1))).bitwiseAND(lit(0x55555555L))
  }

  /**
   * Z-order (Morton) interleave of two integer columns' low 16 bits —
   * pure codegen'd bit arithmetic, no UDF.
   */
  def zvalue(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.shiftleft
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))
  }

  /**
   * Z-order-clustered parquet write → re-read: rows are range-
   * partitioned AND sorted by the Morton interleave of TWO columns,
   * so every file/row-group covers a small rectangle of the (x, y)
   * value space — a 2-D box predicate after re-read skips most
   * row-groups on min/max statistics for BOTH columns, where a
   * single-column sort ([[sortedRoundTrip]]) only skips on one.
   * The multi-dimensional data-skipping layout (Delta/Iceberg
   * OPTIMIZE ZORDER) for the 100 TB two-predicate case. The z column
   * is layout-only and dropped on the way out.
   */
  def zorderRoundTrip(df: DataFrame, path: String, xCol: String, yCol: String,
      partitions: Int = 8): DataFrame = {
    import org.apache.spark.sql.functions.col
    df.withColumn("_z", zvalue(col(xCol), col(yCol)))
      .repartitionByRange(partitions, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)
    df.sparkSession.read.schema(df.schema).parquet(path)
  }
}
