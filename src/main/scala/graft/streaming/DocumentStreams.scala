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

  val binSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("payload", BinaryType)))

  /** File-source stream over a directory of (doc_id, payload) media parquet. */
  def readBinaryStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(binSchema).parquet(dir)

  /**
   * Media decode maintained under ingest — the multimodal twin of the
   * text ingest loops: each micro-batch of binary payloads decodes
   * through the REAL codec factory
   * ([[graft.operators.Multimodal.decodeImages]], javax.imageio; one
   * handle per partition per batch) and its features land in a
   * replay-safe `batch=<id>` sink. Per-batch cost is batch-sized —
   * decode never touches prior batches — and decode is deterministic,
   * so an at-least-once redelivery overwrites its own directory
   * bit-identically (spec-pinned, incl. fresh-checkpoint replay).
   */
  def streamingMediaDecode(binStream: DataFrame, outPath: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    binStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        graft.operators.Multimodal.decodeImages(batch.toDF())
          .write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
      }
      .start()

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

  /**
   * The FULL continuous-ingest dedup loop: each micro-batch is (1)
   * probed against the persistent MinHash index, (2) its detected
   * near-dup pairs appended to `outPath`, (3) its NOVEL documents
   * (no pair above threshold) APPENDED to the index
   * ([[graft.operators.Dedup.appendToMinhashIndex]] — bucketed
   * batch-sized inserts), so batch N+1 sees batch N's accepted docs
   * as corpus. This closes the maintenance gap of
   * [[streamingIndexDedup]]: the index stays current under ingest
   * with no rebuild and no corpus rescan — probe AND update both
   * track the batch size.
   *
   * Replay safety (foreachBatch is at-least-once): a batch replayed
   * after a crash between the index append and the checkpoint commit
   * finds its own docs in the index. The novelty gate keeps them from
   * appending twice (a self-match marks the doc as seen), self-pairs
   * are filtered from the emitted log, and the pair sink writes each
   * batch to its own `batch=<id>` directory with overwrite — so a
   * replay rewrites the same output instead of appending duplicates.
   */
  /**
   * Continuous paragraph-level rewrite (the CCNet line-dedup loop
   * maintained under ingest): each micro-batch is rewritten against
   * the persistent unit index ([[graft.operators.Dedup
   * .paragraphDedupIncremental]] — bucket-pruned probe, batch-sized
   * cost), the rewritten docs land in a replay-safe `batch=<id>`
   * sink, and the batch's novel first-occurrence units append to the
   * index ([[graft.operators.Dedup.appendToUnitIndex]], idempotent),
   * so batch N+1's duplicate paragraphs of batch N are removed too.
   * Replay safety is the operator's own keep rule: a redelivered
   * batch finds its units self-owned in the index and reproduces its
   * previous output bit-for-bit.
   */
  def streamingParagraphIngest(docStream: DataFrame, indexTable: String,
      outPath: String, checkpoint: String, width: Int = 15,
      autoCompact: Int = 8): org.apache.spark.sql.streaming.StreamingQuery =
    docStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val b = batch.toDF().localCheckpoint() // rewritten AND appended below
        graft.operators.Dedup.paragraphDedupIncremental(b, indexTable, width = width)
          .write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
        graft.operators.Dedup.appendToUnitIndex(b, indexTable, width = width)
        // between-batch LSM maintenance: the appends above land ≤buckets
        // files each, and the accumulated small-file listing tax is the
        // ONE index-size-correlated cost on the probe path. The ASYNC
        // trigger keeps the loop self-maintaining WITHOUT stalling the
        // batch that trips it: the corpus-sized rewrite runs on the
        // maintenance thread, this hook only enqueues/finalizes
        graft.sources.Bucketing
          .maybeCompactBucketedAsync(b.sparkSession, indexTable, autoCompact); ()
      }
      .start() match { case q => Maintenance.finalizeOnStop(q,
        docStream.sparkSession, Seq(indexTable)) }

  /**
   * The exact-substring loop maintained under ingest — the span-level
   * sibling of [[streamingParagraphIngest]]: each micro-batch is
   * span-rewritten against the persistent span index (its duplicated
   * ≥span-token windows vs everything already ingested drop), lands
   * in a replay-safe `batch=<id>` sink, and appends its novel
   * first-occurrence windows — so batch N+1's copies of batch N's
   * content dedup too. Replay safety is the operator's own keep rule
   * (self-owned index hits are kept), so a restarted checkpoint
   * reproduces every output bit-identically (spec-pinned).
   */
  def streamingSpanIngest(docStream: DataFrame, indexTable: String,
      outPath: String, checkpoint: String, span: Int = 20,
      autoCompact: Int = 8): org.apache.spark.sql.streaming.StreamingQuery =
    docStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val b = batch.toDF().localCheckpoint() // rewritten AND appended below
        graft.operators.Dedup.spanRewriteIncremental(b, indexTable, span = span)
          .write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
        graft.operators.Dedup.appendToSpanIndex(b, indexTable, span = span)
        graft.sources.Bucketing
          .maybeCompactBucketedAsync(b.sparkSession, indexTable, autoCompact); ()
      }
      .start() match { case q => Maintenance.finalizeOnStop(q,
        docStream.sparkSession, Seq(indexTable)) }

  /**
   * [[streamingIndexIngest]] plus MAINTAINED cluster closure: each
   * micro-batch's near-dup pairs (vs everything already ingested)
   * feed [[graft.operators.Dedup.clusterAssignIncremental]] — batch
   * docs adopt, found, or MERGE standing clusters through the
   * relabel table — and the batch docs' resolved assignments land in
   * a replay-safe `batch=<id>` sink. Pairs come from BOTH directions:
   * batch-vs-index (everything already ingested) AND batch-internal
   * (two near-dups arriving in the same micro-batch link immediately,
   * not only if a later doc bridges them). Novel docs append to the
   * minhash index so batch N+1 pairs (and clusters) against batch N.
   * Replay safety: self-matches never pair (so re-delivered docs
   * don't re-append) and assignment ingestion is idempotent — a
   * fresh-checkpoint replay leaves the cluster TABLE and the index
   * bit-identical (spec-pinned, including a cross-batch cluster
   * chain). Batch sinks are current-knowledge snapshots, same
   * contract as [[streamingIndexIngest]]'s pair sink: a replayed
   * early batch may legitimately know about later docs.
   */
  def streamingClusterIngest(docStream: DataFrame, indexTable: String,
      clusterTable: String, outPath: String, checkpoint: String,
      threshold: Double = 0.7,
      autoCompact: Int = 8): org.apache.spark.sql.streaming.StreamingQuery =
    docStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        val b = batch.toDF().localCheckpoint()
        val rawPairs = graft.operators.Dedup
          .indexedNearDupPairs(b, indexTable, threshold = threshold)
          .localCheckpoint()
        // batch-INTERNAL pairs too: two near-dup docs arriving in the
        // same micro-batch never meet through the index (both are
        // probes, neither is indexed yet) — without this they'd both
        // append as novel and stay unlinked unless a later doc bridged
        // them. Deterministic, so replay regenerates the same pairs
        // (and on replay the same links also arrive via the index —
        // clusterAssignIncremental is idempotent either way).
        val intraPairs = graft.operators.Dedup
          .minhashNearDupPairs(b, k = 128, bands = 32, threshold = threshold)
          .filter(col("a_id") =!= col("b_id"))
          .select(col("a_id"), col("b_id"))
        val pairs = rawPairs.filter(col("new_id") =!= col("corpus_id"))
          .select(col("new_id").as("a_id"), col("corpus_id").as("b_id"))
          .unionByName(intraPairs)
        graft.operators.Dedup.clusterAssignIncremental(pairs, clusterTable)
        graft.operators.Dedup.clusterAssignments(spark, clusterTable)
          .join(b.select(col("doc_id")), Seq("doc_id"), "left_semi")
          .write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
        val novel = b.join(rawPairs.select(col("new_id").as("doc_id")).distinct(),
          Seq("doc_id"), "left_anti")
        graft.operators.Dedup.appendToMinhashIndex(novel, indexTable)
        // between-batch maintenance for BOTH maintained structures:
        // the minhash index's bucketed tables (small-file listing tax,
        // out-of-band — the hook never waits on a corpus-sized rewrite)
        // and the cluster table (files + the broadcast relabel map,
        // folded by the same rewrite when the trigger fires; the fold
        // stays inline — see maybeCompactClusterIndex)
        val mAt = graft.sources.Bucketing.epochMember(spark, indexTable, _: String)
        graft.sources.Bucketing
          .maybeCompactBucketedAsync(spark, mAt("bands"), autoCompact)
        graft.sources.Bucketing
          .maybeCompactBucketedAsync(spark, mAt("shingles"), autoCompact)
        graft.operators.Dedup
          .maybeCompactClusterIndex(spark, clusterTable, autoCompact); ()
      }
      .start() match { case q => Maintenance.finalizeOnStop(q,
        docStream.sparkSession, {
          val at = graft.sources.Bucketing
            .epochMember(docStream.sparkSession, indexTable, _: String)
          Seq(at("bands"), at("shingles"), clusterTable)
        }) }

  def streamingIndexIngest(docStream: DataFrame, indexTable: String,
      outPath: String, checkpoint: String, threshold: Double = 0.7,
      autoCompact: Int = 8): org.apache.spark.sql.streaming.StreamingQuery =
    docStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val b = batch.toDF().localCheckpoint() // probed twice below
        val rawPairs = graft.operators.Dedup
          .indexedNearDupPairs(b, indexTable, threshold = threshold)
          .localCheckpoint() // consumed by the sink AND the novelty anti-join
        rawPairs.filter(col("new_id") =!= col("corpus_id"))
          .write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
        // the anti-join keeps self-matches: a replayed doc matches its
        // own index entry and correctly does NOT re-append
        val novel = b.join(rawPairs.select(col("new_id").as("doc_id")).distinct(),
          Seq("doc_id"), "left_anti")
        graft.operators.Dedup.appendToMinhashIndex(novel, indexTable)
        val s = b.sparkSession
        val mAt = graft.sources.Bucketing.epochMember(s, indexTable, _: String)
        graft.sources.Bucketing
          .maybeCompactBucketedAsync(s, mAt("bands"), autoCompact)
        graft.sources.Bucketing
          .maybeCompactBucketedAsync(s, mAt("shingles"), autoCompact); ()
      }
      .start() match { case q => Maintenance.finalizeOnStop(q,
        docStream.sparkSession, {
          val at = graft.sources.Bucketing
            .epochMember(docStream.sparkSession, indexTable, _: String)
          Seq(at("bands"), at("shingles"))
        }) }

  /**
   * Naive-Bayes model maintained under ingest: each micro-batch's
   * MERGEABLE count state ([[TextAnalysis.nbCountState]] — NB's whole
   * training state is counts) lands in its own `batch=<id>` ledger
   * partition; an at-least-once redelivery OVERWRITES its own
   * partition, so replay is idempotent (the
   * [[VectorStreams.streamingPcaMaintenance]] moment-ledger
   * discipline). Already-ingested docs are never rescanned and the
   * ledger grows bytes-per-batch (bounded by the batch's vocab ×
   * labels), while [[nbFromCounts]] always fits the model the full
   * corpus would have trained — law-tested bit-identical to the
   * batch fit.
   */
  def streamingNbMaintenance(docStream: DataFrame, countsPath: String,
      checkpoint: String, labelCol: String = "source")
      : org.apache.spark.sql.streaming.StreamingQuery =
    docStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty)
          TextAnalysis.nbCountState(batch.toDF(), labelCol)
            .write.mode("overwrite").parquet(s"$countsPath/batch=$batchId")
      }
      .start()

  /** Fit from the maintained count ledger (merge, then smooth). */
  def nbFromCounts(spark: SparkSession, countsPath: String,
      minCount: Long = 2): DataFrame =
    TextAnalysis.naiveBayesModelFromCounts(
      spark.read.parquet(countsPath).select("label", "token", "n"), minCount)
}
