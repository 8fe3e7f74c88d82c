package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/**
 * Streaming SCD TYPE-2 maintenance: the warehouse half of continuous
 * ingest. A CDC stream of (key, state, event-time) rows maintains a
 * versioned dimension table — each key's state transitions become
 * [valid_from, valid_to) intervals with the open interval current —
 * without ever rewriting the whole table.
 *
 * Scale shape: the dimension table is laid out in `nBuckets` hash
 * partitions of the key (`bucket=<b>` directories). Per micro-batch,
 * only the buckets containing batch keys are read (partition pruning)
 * and re-derived (dynamic partition overwrite) — delta-sized I/O, the
 * merge-on-write pattern warehouse streaming uses. Untouched buckets
 * are never opened.
 *
 * Contract: CDC delivery is in event-time order per key ACROSS
 * batches (the standard log-compaction contract; a watermark enforces
 * it upstream). Within a batch, rows re-derive from the union of the
 * stored change points and the batch, so intra-batch ordering is
 * free. A replayed batch (at-least-once foreachBatch) unions the same
 * change points and re-derives the identical buckets — maintenance is
 * idempotent by construction, no dedup bookkeeping needed.
 */
object DimensionStreams {

  private def bucketOf(key: org.apache.spark.sql.Column, nBuckets: Int) =
    pmod(key, lit(nBuckets.toLong))

  /**
   * Re-derive SCD2 intervals from change-point rows
   * (key, ms, tie, state): lag-compress consecutive equal states,
   * close intervals by lead — the exact batch `q_scd2` arithmetic.
   */
  private def deriveIntervals(points: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ms"), col("tie"))
    val changes = points
      .withColumn("prev_state", lag(col("state"), 1).over(w))
      .filter(col("prev_state").isNull || col("prev_state") =!= col("state"))
    changes
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("valid_to_ms", lead(col("ms"), 1).over(w))
      .select(col("user_id"), col("version"), col("state"),
        col("ms").as("valid_from_ms"), col("valid_to_ms"),
        col("valid_to_ms").isNull.as("is_current"), col("tie"))
  }

  import org.apache.spark.sql.types._

  /** The stored layout (bucket is a partition directory column). */
  val dimSchema: StructType = StructType(Seq(
    StructField("user_id", LongType),
    StructField("version", LongType),
    StructField("state", StringType),
    StructField("valid_from_ms", LongType),
    StructField("valid_to_ms", LongType),
    StructField("is_current", BooleanType),
    StructField("tie", LongType),
    StructField("bucket", LongType)))

  /**
   * One-time initialization: an empty bucketed dimension layout. An
   * empty partitioned write emits no data files, so reads always pass
   * [[dimSchema]] explicitly rather than inferring.
   */
  def initScd2Table(spark: SparkSession, tablePath: String, nBuckets: Int = 8): Unit = {
    import spark.implicits._
    Seq.empty[(Long, Long, String, Long, Option[Long], Boolean, Long, Long)]
      .toDF("user_id", "version", "state", "valid_from_ms", "valid_to_ms",
        "is_current", "tie", "bucket")
      .write.partitionBy("bucket").mode(SaveMode.Overwrite).parquet(tablePath)
  }

  /**
   * Maintain the SCD2 table from a CDC stream. `events` carries
   * (user_id, event_id, event_type, ms) rows — event_type is the
   * tracked state, event_id the deterministic tie-break.
   */
  def streamingScd2(events: DataFrame, tablePath: String, checkpoint: String,
      nBuckets: Int = 8): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val spark = batch.sparkSession
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        val b = batch.toDF()
          .select(col("user_id"), col("ms"), col("event_id").as("tie"), col("event_type").as("state"))
          .withColumn("bucket", bucketOf(col("user_id"), nBuckets))
          .localCheckpoint() // batch-sized; drives pruning AND the union
        val touched = b.select("bucket").distinct()
          .collect().map(_.getLong(0)) // ≤ nBuckets values
        if (touched.nonEmpty) {
          // stored change points of ONLY the touched buckets (pruned
          // read: every version row is a change point of its key)
          val stored = spark.read.schema(dimSchema).parquet(tablePath)
            .filter(col("bucket").isin(touched.toSeq: _*))
            .select(col("user_id"), col("valid_from_ms").as("ms"), col("tie"), col("state"))
          val points = stored
            .unionByName(b.select("user_id", "ms", "tie", "state"))
            .dropDuplicates("user_id", "ms", "tie") // replay-safe union
          deriveIntervals(points)
            .withColumn("bucket", bucketOf(col("user_id"), nBuckets))
            .write.partitionBy("bucket").mode(SaveMode.Overwrite) // dynamic: touched buckets only
            .parquet(tablePath)
        }
      }
      .start()
}
