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
}
