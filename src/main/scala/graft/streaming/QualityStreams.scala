package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Checks

/**
 * Streaming data-quality gating — [[graft.operators.Checks]] applied
 * at the ingest front door: every micro-batch is split into accepted
 * rows, quarantined rows (carrying WHICH constraints they failed),
 * and a violation ledger, before anything downstream (dedup, index
 * append, training-shard assignment) sees the data. The 100 TB
 * reality this models: a bad upstream deploy floods the firehose
 * with malformed rows at 3am; the gate quarantines them with a
 * reason instead of poisoning the corpus, and the ledger is the
 * pager signal.
 *
 * Cost shape per batch: the row predicates are scan-stage columns
 * (one pass, no shuffle for the split), the ledger is ONE aggregate
 * row per constraint (Checks.rowChecks' single-scan fold). All sinks
 * are replay-safe `batch=<id>` overwrites — at-least-once
 * foreachBatch replays rewrite the same directories instead of
 * duplicating. Violation counts are mergeable sums by construction,
 * so the ledger reads back with a plain groupBy at any granularity.
 */
object QualityStreams {

  /** Array of names of the constraints a row fails (empty → accepted). */
  def failedChecksCol(checks: Seq[(String, Column)]): Column =
    filter(
      array(checks.map { case (name, pred) =>
        when(!coalesce(pred, lit(false)), lit(name))
      }: _*),
      x => x.isNotNull)

  /**
   * Start the gate: accepted rows → `outPath/accepted/batch=<id>`,
   * quarantined rows (+ `failed_checks`) → `outPath/rejected/batch=
   * <id>`, per-batch verdicts → `outPath/ledger/batch=<id>`. When
   * `zoneCols` is non-empty, the accepted sink also maintains its own
   * zone-map stats under `outPath/zones/batch=<id>`
   * ([[graft.sources.ZoneMap.build]] over just the batch's files —
   * zones compose under union, so the skipping metadata stays current
   * with ZERO standing-data work).
   */
  def streamingQualityGate(docStream: DataFrame, checks: Seq[(String, Column)],
      outPath: String, checkpoint: String,
      zoneCols: Seq[String] = Nil): StreamingQuery =
    docStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val marked = batch.toDF()
          .withColumn("_failed", failedChecksCol(checks))
          .localCheckpoint() // consumed by both split sinks + ledger
        val acceptedDir = s"$outPath/accepted/batch=$batchId"
        marked.filter(size(col("_failed")) === 0).drop("_failed")
          .write.mode("overwrite").parquet(acceptedDir)
        marked.filter(size(col("_failed")) > 0)
          .withColumn("failed_checks", concat_ws(",", col("_failed")))
          .drop("_failed")
          .write.mode("overwrite").parquet(s"$outPath/rejected/batch=$batchId")
        Checks.rowChecks(marked, checks)
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite").parquet(s"$outPath/ledger/batch=$batchId")
        if (zoneCols.nonEmpty)
          graft.sources.ZoneMap.build(marked.sparkSession, acceptedDir, zoneCols)
            .write.mode("overwrite").parquet(s"$outPath/zones/batch=$batchId")
      }
      .start()

  /**
   * Merge the ledger back to one verdict row per constraint —
   * violation counts are sums, so any slice (per batch, per hour,
   * lifetime) is the same groupBy.
   */
  def ledgerSummary(spark: SparkSession, outPath: String): DataFrame =
    spark.read.parquet(s"$outPath/ledger")
      .groupBy("check_name")
      .agg(sum("violations").as("violations"))
      .select(col("check_name"), col("violations"),
        (col("violations") === 0L).as("passed"))

  /** The accepted sink's composed zone map (files-sized stats table). */
  def zoneStats(spark: SparkSession, outPath: String): DataFrame =
    spark.read.parquet(s"$outPath/zones")

  /**
   * Fellegi–Sunter calibration maintained under a COMPARISON STREAM:
   * each micro-batch of agreement vectors (ag_0..ag_{k-1} columns)
   * lands as a combo-count ledger partition (`batch=<id>` overwrite —
   * replay-safe), and the EM re-runs on the MERGED ledger (combo
   * counts are sums, the mergeable-summary contract) into a
   * per-batch parameter snapshot. Result: linkage weights that track
   * the pair population as it arrives, with calibration cost O(2^k)
   * past one aggregate per batch — and a fresh-checkpoint replay
   * reproduces ledger and parameters bit-for-bit (spec-pinned
   * against the direct batch EM on the union).
   */
  def streamingLinkageCalibration(pairStream: DataFrame, k: Int,
      outPath: String, checkpoint: String,
      iters: Int = 5): org.apache.spark.sql.streaming.StreamingQuery =
    pairStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        val agCols = (0 until k).map(i => col(s"ag_$i"))
        batch.toDF().groupBy(agCols: _*)
          .agg(count(lit(1)).as("n_pairs"))
          .write.mode("overwrite").parquet(s"$outPath/ledger/batch=$batchId")
        val merged = spark.read.parquet(s"$outPath/ledger")
          .groupBy(agCols: _*)
          .agg(sum("n_pairs").as("n_pairs"))
        graft.operators.Dedup.emFromCombos(merged, k, iters)
          .write.mode("overwrite").parquet(s"$outPath/params/batch=$batchId")
      }
      .start()
}
