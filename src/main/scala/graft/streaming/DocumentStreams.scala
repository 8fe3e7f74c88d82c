package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.TextAnalysis

/**
 * Structured-Streaming surface over the `documents` table shape: the
 * continuous-ingest half of the curation pipeline. Documents arrive
 * as files; the quality and language gates are pure per-row columns
 * ([[TextAnalysis.qualityCol]]/[[TextAnalysis.predLangCol]]), so they
 * run inside the stream's scan stage with no extra state — exactly
 * how a 100 TB/day ingest applies cheap filters before anything
 * stateful. The census aggregation is the only stateful step.
 *
 * Every transform works identically on a batch DataFrame (the DuckDB
 * oracle's path; equivalence proven in StreamingSpec).
 */
object DocumentStreams {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** File-source stream over a directory of documents parquet. */
  def readDocumentStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(docSchema).parquet(dir)

  /**
   * Curation gate + per-source census: keep docs passing the quality
   * and language filters, count docs and tokens per source. Batch and
   * streaming share this plan verbatim.
   */
  def curatedCensus(docs: DataFrame, minQuality: Double = 0.5,
      lang: String = "en"): DataFrame =
    docs
      .filter(TextAnalysis.qualityCol(col("text")) >= minQuality &&
        TextAnalysis.predLangCol(col("text")) === lang)
      .groupBy("source")
      .agg(count("*").as("n_docs"),
        sum(size(split(col("text"), " "))).cast("long").as("sum_tokens"))

  /**
   * Continuous-ingest near-dup detection against a PERSISTENT MinHash
   * index ([[graft.operators.Dedup.writeMinhashIndex]]): each
   * micro-batch is checked via `foreachBatch` →
   * [[graft.operators.Dedup.indexedNearDupPairs]] — per-batch cost
   * tracks the batch, never the corpus, which is exactly the cost
   * model a 100 TB/day ingest needs (the broadcast-path alternative
   * rescans corpus text every batch). Detected pairs append to
   * `outPath` parquet; the query handle is returned for
   * awaitTermination/stop.
   */
  def streamingIndexDedup(docStream: DataFrame, indexTable: String,
      outPath: String, checkpoint: String,
      threshold: Double = 0.7): org.apache.spark.sql.streaming.StreamingQuery =
    docStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.operators.Dedup
          .indexedNearDupPairs(batch.toDF(), indexTable, threshold = threshold)
          .write.mode("append").parquet(outPath)
      }
      .start()
}
