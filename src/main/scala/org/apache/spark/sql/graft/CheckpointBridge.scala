package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

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
 * now. A frame whose plan is not a bare LogicalRDD (or a reliable
 * checkpoint, whose data lives in files, not blocks) is left alone.
 */
object CheckpointBridge {
  def freeLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case l: LogicalRDD => l.rdd.unpersist(false); ()
      case _ => ()
    }
}
