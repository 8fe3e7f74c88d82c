package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * File-level zone maps — data skipping as a METADATA operation
 * (SURVEY §2.4 scans/sinks). [[FileIO.sortedRoundTrip]] already gets
 * row-group skipping from parquet's own footer statistics, but at
 * 100 TB the footers themselves are the problem: a range query over
 * a million-file table opens a million footers just to learn that
 * 999k files can't match. A zone map hoists per-file min/max/count
 * into ONE small stats table (rows = files, not rows of data), so
 * planning reads the stats table and the scan opens only surviving
 * files — the Delta/Iceberg/Snowflake metadata-pruning shape, built
 * here from plain Spark aggregates.
 *
 * The reference engine's analog is its keyspace-shard routing: a
 * point RunOnKey consults the slot table, never the other shards
 * (`src/cluster.c:1820-1843` slot→shard map); a zone map is the
 * same "consult small metadata, touch only matching storage"
 * contract generalized to range predicates over any column.
 *
 * Scale notes:
 *  - build is one scan with a map-side-combining aggregate keyed by
 *    file name (files ≪ rows, no skew: each task holds at most a few
 *    files' partials);
 *  - the stats table is files-sized — the SAME driver-boundable
 *    artifact an Iceberg manifest is; pruning collects only matching
 *    FILE NAMES (bounded by file count), exactly what every table
 *    format's planner does driver-side;
 *  - a file whose stats are NULL (all-null column) is kept — unknown
 *    bounds must not prune;
 *  - stats compose under append: a new batch's zone rows are UNIONed
 *    in ([[append]]), never recomputed over standing data.
 */
object ZoneMap {

  /** Stats column names for a data column. */
  private def lo(c: String) = s"min_$c"
  private def hi(c: String) = s"max_$c"

  /**
   * One scan → per-file zones: (file, n_rows, min_c, max_c per
   * tracked column). Run once at write time (or per appended batch),
   * amortized over every later query.
   */
  def build(spark: SparkSession, dataPath: String, cols: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +:
      cols.flatMap(c => Seq(min(col(c)).as(lo(c)), max(col(c)).as(hi(c))))
    spark.read.parquet(dataPath)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Zone rows for an appended batch of files — union with the standing stats. */
  def append(stats: DataFrame, spark: SparkSession, dataPath: String,
      cols: Seq[String]): DataFrame =
    stats.unionByName(build(spark, dataPath, cols))

  /**
   * Files whose [min, max] zone can intersect [lowerB, upperB] on
   * `c`. NULL bounds (all-null or missing stats) are kept: unknown
   * never prunes.
   */
  def candidateFiles(stats: DataFrame, c: String, lowerB: Column, upperB: Column): DataFrame =
    stats.filter(
      col(hi(c)).isNull || col(lo(c)).isNull ||
        (col(hi(c)) >= lowerB && col(lo(c)) <= upperB))

  /**
   * Zone-pruned range scan: consult the stats table, read ONLY the
   * surviving files, re-apply the exact predicate (zones admit false
   * positives, never false negatives). The collected file list is
   * files-sized driver metadata — the identical operation a lakehouse
   * planner performs against its manifest. The pushed-down predicate
   * still reaches the parquet reader, so row-group skipping applies
   * WITHIN surviving files too.
   */
  def prunedRead(spark: SparkSession, stats: DataFrame, schema: StructType,
      c: String, lowerB: Column, upperB: Column): DataFrame =
    prunedReadBox(spark, stats, schema, Seq((c, lowerB, upperB)))

  /**
   * Multi-column box pruning: a file survives only if EVERY
   * predicate's range intersects its zone — the conjunction
   * intersects candidate sets, so pruning power multiplies when the
   * layout localizes both columns at once. That is exactly what
   * [[FileIO.zorderRoundTrip]]'s Morton clustering buys: each file
   * covers a small (x, y) rectangle, and a 2-D box query keeps only
   * the files whose rectangle it touches, where a single-column sort
   * prunes on one dimension and scans the other.
   */
  def prunedReadBox(spark: SparkSession, stats: DataFrame, schema: StructType,
      preds: Seq[(String, Column, Column)]): DataFrame = {
    require(preds.nonEmpty, "at least one range predicate required")
    val cand = preds.foldLeft(stats) { case (s, (c, lo0, hi0)) =>
      candidateFiles(s, c, lo0, hi0)
    }
    val files = cand.select("file").collect().map(_.getString(0))
    val pred = preds.map { case (c, lo0, hi0) => col(c) >= lo0 && col(c) <= hi0 }
      .reduce(_ && _)
    if (files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else
      spark.read.schema(schema).parquet(files.toIndexedSeq: _*).filter(pred)
  }
}
