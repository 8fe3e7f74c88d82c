package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.storage.StorageLevel

/**
 * Free a local-checkpointed frame's storage blocks explicitly.
 *
 * Iterative loops that keep ONLY the latest round's checkpoint alive
 * (e.g. the incremental-segmentation BPE trainer: hundreds of rounds
 * × ~100 MB of corpus state) cannot wait for the ContextCleaner's
 * weak-reference GC cadence to drop the previous round — on a long
 * run the un-collected rounds accumulate into executor-storage
 * pressure. `Dataset.localCheckpoint` wraps the materialized RDD in a
 * `LogicalRDD` plan node; unpersisting that RDD releases the blocks
 * now.
 *
 * Scope: only a frame whose plan is a bare LogicalRDD over a
 * STORED RDD is touched. A reliable `Dataset.checkpoint()` also
 * analyzes to LogicalRDD, but its data lives in checkpoint FILES and
 * its RDD carries no storage blocks — the StorageLevel.NONE guard
 * below leaves it alone by construction, not by luck. Contract for
 * callers: the freed frame must have no lazy downstream consumers —
 * every dependent plan must be fully consumed or eagerly superseded
 * (its replacement materialized) BEFORE the free, or those consumers
 * fail at a distance with "checkpoint block not found". The BPE
 * loop satisfies this by materializing round N+1 before freeing
 * round N.
 */
object CheckpointBridge {
  def freeLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case l: LogicalRDD if l.rdd.getStorageLevel != StorageLevel.NONE =>
        l.rdd.unpersist(false); ()
      case _ => ()
    }
}
