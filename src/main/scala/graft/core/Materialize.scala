package graft.core

import org.apache.spark.sql.DataFrame

/**
 * The lineage-truncation point for iterative operators (connected
 * components, label propagation, BFS/SSSP, k-means — every loop that
 * would otherwise nest its plan linearly in the round count). Two
 * modes, selected by the session conf `spark.graft.reliableCheckpoints`:
 *
 *  - default (`false`): `localCheckpoint()` — blocks live on executor
 *    LOCAL storage. No checkpoint dir needed and fastest, the right
 *    choice single-machine and for short loops. But on a real cluster
 *    a lost executor loses its blocks AND the truncated lineage that
 *    could have recomputed them: an hours-long iterative job dies
 *    unrecoverably at the first executor failure.
 *  - `true`: reliable `checkpoint()` to the configured checkpoint dir
 *    (HDFS/S3/DBFS at cluster scale — `sparkContext.setCheckpointDir`
 *    must point at storage that survives executor loss). Lost
 *    partitions re-read from the checkpoint files and the loop keeps
 *    going — the cluster-scale fault-tolerance contract, analogous to
 *    the reference engine surviving peer loss by resend-on-reconnect
 *    (reference: src/cluster.c:477-492, pytests/test_network.py:482-516).
 *
 * Both modes return a materialized frame with flat lineage and
 * IDENTICAL contents — law-tested on a random graph (CC, SSSP,
 * k-means produce the same rows in either mode).
 */
object Materialize {
  /** Session conf key for the reliable-checkpoint mode. */
  val Flag = "spark.graft.reliableCheckpoints"

  private val cpKey = "spark.sql.constraintPropagation.enabled"

  /** Per-session reentrancy guard for the constraint-propagation window.
    * The conf is session-global, so two concurrent `iter` calls on one
    * session (iterative ops do run from parallel foreachBatch threads)
    * could otherwise interleave save/restore as A-saves-true →
    * B-saves-false → A-restores-true → B-restores-false and leave the
    * session pessimized for its remaining lifetime. The FIRST entrant
    * saves the pre-call value and disables; the LAST exiter restores.
    * Never evicted: removing on last-exit would reopen the race (a
    * concurrent entrant can hold the just-removed guard). Weak keys keep
    * the map from pinning stopped sessions; identity semantics are what
    * we want (one guard per live session object). */
  private final class Guard { var depth = 0; var prev = "true" }
  private val guards = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession, Guard]())

  /** Materialize one iteration round under the session's checkpoint mode. */
  def iter(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    // Dataset.checkpoint rebuilds the frame as a LogicalRDD and rewrites
    // the ANALYZED plan's constraints onto the new output attributes.
    // Alias-swapped self-union shapes (largeStar-style symmetrization)
    // can carry a child constraint referencing a sibling child's
    // attribute, and Spark's UnionBase.rewriteConstraints then throws
    // `key not found: <attr>` (reproduced on Spark 4.1.2, pinned in
    // MaterializeSpec). Constraints are an optimizer hint, never a
    // correctness input, so compute none during the rewrite window.
    val g = guards.computeIfAbsent(spark, _ => new Guard)
    g.synchronized {
      if (g.depth == 0) { g.prev = spark.conf.get(cpKey, "true"); spark.conf.set(cpKey, "false") }
      g.depth += 1
    }
    try {
      if (spark.conf.get(Flag, "false").toBoolean) {
        require(spark.sparkContext.getCheckpointDir.isDefined,
          s"$Flag=true requires sparkContext.setCheckpointDir(<path that " +
            "survives executor loss>) — a local dir would silently lose " +
            "the fault-tolerance the flag promises")
        df.checkpoint()
      } else df.localCheckpoint()
    } finally g.synchronized {
      g.depth -= 1
      if (g.depth == 0) spark.conf.set(cpKey, g.prev)
    }
  }

  /** `df.materializeRound` syntax for the loop bodies. */
  implicit class MaterializeOps(private val df: DataFrame) extends AnyVal {
    def materializeRound: DataFrame = Materialize.iter(df)
  }
}
