package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

import graft.operators.Similarity

/**
 * Structured-Streaming surface over the `embeddings` table shape: the
 * continuous-ingest half of the vector-index pipeline, mirroring
 * [[DocumentStreams]] for the ANN family. Vectors arrive as files;
 * each micro-batch (1) searches the PERSISTED IVF-PQ index
 * ([[Similarity.writeAnnIndex]]) for its nearest neighbors — the
 * retrieval/near-dup signal a training-data pipeline logs at ingest —
 * and (2) grows the index under the FROZEN stored quantizer, so batch
 * N+1 searches against batch N's vectors. Probe and append both track
 * the batch size, never the corpus: the cost model a 100 TB/day
 * embedding ingest needs.
 */
object VectorStreams {

  val vecSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  /** File-source stream over a directory of embeddings parquet. */
  def readVectorStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(vecSchema).parquet(dir)

  /**
   * The full continuous vector-ingest loop: per micro-batch, top-k
   * neighbors of every arriving vector from the persisted index
   * ([[Similarity.annIndexTopK]] — reads only the probed lists'
   * buckets), then the batch joins the index via
   * [[Similarity.appendNovelToAnnIndex]].
   *
   * Replay safety (foreachBatch is at-least-once): the neighbor log
   * writes each batch to its own `batch=<id>` directory with
   * overwrite, so a replayed batch rewrites the same output;
   * annIndexTopK's self-match filter keeps a replayed vector's own
   * index entry out of the log; and the novel-only append reads back
   * just the routed buckets, so a replayed batch never double-inserts
   * codes. Index growth is exactly-once end to end.
   *
   * AUTO-REMEDIATION (closing the drift→repair loop): with
   * `driftThreshold > 0` and a `retrainCorpus` provider, a micro-batch
   * whose mean assignment residual crosses the threshold triggers
   * [[Similarity.requantizeAnnIndex]] between batches — on the loop's
   * own single-writer thread, committing through the atomic epoch
   * flip, so concurrent readers see all-old or all-new. If, after the
   * requantize, the batch's PQ reconstruction error
   * ([[Similarity.pqReconstructionResidual]]) still exceeds
   * `pqErrorThreshold`, code resolution — not the coarse quantizer —
   * is the binding constraint, and the loop requantizes once more at
   * `escalateM` sub-quantizers (the measured 100k-tier lever: m=16
   * recovered dense-region recall 0.144→0.321). The loop tracks the
   * index's live `m` by reading it from the stored codes, so searches
   * and appends stay knob-consistent across escalations AND restarts.
   * Replay-idempotent: retraining is deterministic, so a replayed
   * trigger rebuilds identical tables; the ledger rows overwrite their
   * own batch partition.
   */
  def streamingAnnIngest(vecStream: DataFrame, table: String,
      outPath: String, checkpoint: String,
      topk: Int = 5, nprobe: Int = 8, m: Int = 8,
      autoCompact: Int = 8, driftPath: String = null,
      driftThreshold: Double = 0.0,
      retrainCorpus: () => DataFrame = null,
      escalateM: Int = 0, pqErrorThreshold: Double = 0.0,
      refineIters: Int = 3,
      retrainSampleRows: Long = 200000L): StreamingQuery = {
    // the index's live sub-quantizer count: starts from the param,
    // re-read from the stored codes on the first batch (a restarted
    // loop must not fall back to the pre-escalation default)
    val curM = new java.util.concurrent.atomic.AtomicInteger(-1)
    vecStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val b = batch.toDF().localCheckpoint() // searched AND appended below
        val spark = b.sparkSession
        if (curM.get() < 0) curM.set(
          try Similarity.annIndexM(spark, table) catch { case _: Throwable => m })
        Similarity.annIndexTopK(b, table, topk = topk, nprobe = nprobe,
            m = curM.get())
          .write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
        // drift ledger: the batch's mean assignment residual against
        // the STORED quantizer, measured before the batch joins the
        // index (a drifted batch should read high, not be averaged
        // into its own baseline). One batch-sized row per micro-batch,
        // replay-idempotent via the per-batch overwrite; a rising
        // series is the requantizeAnnIndex trigger — wired to it
        // below when driftThreshold is set.
        val needDrift = driftPath != null ||
          (driftThreshold > 0 && retrainCorpus != null)
        val residual = if (needDrift)
          Similarity.annAssignmentResidual(b, table).localCheckpoint()
        else null
        if (driftPath != null)
          residual.write.mode("overwrite").parquet(s"$driftPath/batch=$batchId")
        Similarity.appendNovelToAnnIndex(b, table, m = curM.get())
        val resRow = if (residual == null) null else residual.collect()(0)
        if (driftThreshold > 0 && retrainCorpus != null && resRow != null &&
            !resRow.isNullAt(1) && // empty micro-batch carries no signal
            resRow.getDouble(1) > driftThreshold) {
          // BOUNDED retrain: the Lloyd rounds are the corpus-sized
          // multiplier (refineIters+1 scans every fire), so training
          // input caps at `retrainSampleRows` via the deterministic
          // md5-gated sample (Similarity.retrainSample — replay
          // retrains identically); the encode pass still covers every
          // vector, the one linear cost a rebuilt codes table IS.
          // Small corpora train in full (rate 1), so remediation
          // quality is unchanged until the cap binds; ≤0 opts into
          // full-corpus training at any size. Recall-band law:
          // OperatorsSpec "bounded retrain".
          val corpus = retrainCorpus()
          val rate = if (retrainSampleRows <= 0L) 1.0 else {
            val n = corpus.count()
            if (n <= retrainSampleRows) 1.0
            else retrainSampleRows.toDouble / n
          }
          Similarity.requantizeAnnIndex(corpus, table,
            m = curM.get(), refineIters = refineIters,
            trainSampleRate = rate)
          if (escalateM > curM.get() && pqErrorThreshold > 0 &&
              Similarity.pqReconstructionResidual(b, table)
                .collect()(0).getDouble(1) > pqErrorThreshold) {
            Similarity.requantizeAnnIndex(retrainCorpus(), table,
              m = escalateM, refineIters = refineIters,
              trainSampleRate = rate)
            curM.set(escalateM)
          }
        }
        // between-batch LSM maintenance on the codes table (the
        // DocumentStreams files-per-bucket policy, out-of-band so the
        // batch that trips the trigger never pays the rewrite inline;
        // ≤0 disables)
        graft.sources.Bucketing.maybeCompactBucketedAsync(b.sparkSession,
          graft.sources.Bucketing.epochMember(b.sparkSession, table, "codes"),
          autoCompact); ()
      }
      .start() match { case q => Maintenance.finalizeOnStop(q,
        vecStream.sparkSession, Seq(graft.sources.Bucketing
          .epochMember(vecStream.sparkSession, table, "codes"))) }
  }

  /**
   * Continuous PCA model maintenance: each arriving micro-batch
   * reduces to ONE O(d²) [[Similarity.momentState]] row in a moment
   * ledger partitioned by batch id; the fitted model is always
   * [[pcaFromMoments]] over the merged ledger. Already-ingested
   * vectors are never rescanned, and the ledger stays bytes-per-batch
   * at any corpus size — the covariance twin of the ANN/minhash index
   * maintenance discipline.
   *
   * Replay safety: the state row writes to its own `batch=<id>`
   * partition with overwrite, so an at-least-once replay rewrites the
   * same row instead of double-counting the batch; empty micro-batches
   * contribute nothing.
   */
  def streamingPcaMaintenance(vecStream: DataFrame, momentsPath: String,
      checkpoint: String): StreamingQuery =
    vecStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty)
          Similarity.momentState(batch.toDF())
            .write.mode("overwrite").parquet(s"$momentsPath/batch=$batchId")
      }
      .start()

  /** Fit from the maintained moment ledger; project any frame. */
  def pcaFromMoments(spark: SparkSession, momentsPath: String,
      embs: DataFrame, k: Int = 2, iters: Int = 20): DataFrame =
    Similarity.pcaProjectFromState(embs,
      Similarity.mergeMomentStates(spark.read.parquet(momentsPath)), k, iters)
}
