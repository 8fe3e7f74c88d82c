package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Graph operators over edge-list DataFrames. The reference engine has
 * no graph surface at all (SURVEY §2.4); its nearest relative is the
 * iterative min-label loop in [[Dedup.dupClusters]]. PageRank is the
 * canonical "iterate joins over a partitioned edge list" workload —
 * the shape that matters at 100 TB is that the EDGE table (the big
 * side) is exchanged ONCE and every iteration reuses that exchange,
 * while only the rank vector (one double per node) moves per round.
 */
object Graph {

  /**
   * Co-occurrence edges: items sharing a group (parts co-purchased in
   * one order, tokens sharing a doc, ...) — symmetric, distinct,
   * self-loops removed. Built with the posting-list idiom (one
   * groupBy shuffle, pairs exploded from in-group arrays), not a
   * self-join: groups are small (order line counts), so the pair
   * explosion is bounded at |group|² with one shuffle instead of two
   * sorted ones. `maxGroup` caps an adversarial group's quadratic
   * contribution, like [[Dedup.pairsFromBuckets]].
   */
  def coOccurrenceEdges(df: DataFrame, groupCol: String, itemCol: String,
      maxGroup: Int = 1000): DataFrame =
    df.groupBy(col(groupCol))
      .agg(collect_set(col(itemCol)).as("items"))
      .filter(size(col("items")).between(2, maxGroup))
      .select(explode(col("items")).as("src"), col("items"))
      .select(col("src"), explode(col("items")).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()

  /**
   * PageRank with a fixed iteration count over a symmetric edge list
   * (columns src, dst): rank_{t+1}(v) = (1-d)/N + d·Σ_{u→v}
   * rank_t(u)/outdeg(u). Symmetric edges mean no dangling nodes, so
   * no redistribution term. Fixed iterations (not convergence
   * detection) keep the whole computation ONE lazy plan: the edge
   * exchange subtree is identical in every iteration, so Spark's
   * ReuseExchange materializes it once — the probe below shows 3
   * iterations cost ~1 edge shuffle plus 3 rank-sized ones.
   *
   * Ranks are rounded to 8 decimals at the end only; intermediate
   * arithmetic is raw doubles (same in the DuckDB oracle).
   */
  def pagerank(edges: DataFrame, iters: Int = 3, damping: Double = 0.85): DataFrame = {
    // outdeg is edge-sized but aggregates to node-sized; it is reused
    // every iteration, so pre-join it onto the edges once: the
    // per-iteration join then carries (src, dst, outdeg) rows and the
    // identical subtree is exchange-reused across iterations (ONE
    // edge shuffle total — asserted in PlanAuditSpec).
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val edgesDeg = edges.join(deg, "src").repartition(col("src"))
    // N as a broadcast one-row aggregate, not a driver-side count():
    // the whole k-iteration computation stays ONE lazy plan — no
    // materialization barrier, and the node-count subtree is
    // exchange-reused too. Symmetric edges ⇒ src covers every node.
    val n = edges.agg(countDistinct(col("src")).as("n_nodes"))
    var ranks = deg.crossJoin(n)
      .select(col("src").as("node"), (lit(1.0) / col("n_nodes")).as("rank"))
    for (_ <- 1 to iters) {
      ranks = edgesDeg.join(ranks, edgesDeg("src") === ranks("node"))
        .groupBy(col("dst").as("node2"))
        .agg(sum(col("rank") / col("outdeg")).as("contrib"))
        .crossJoin(n)
        .select(col("node2").as("node"),
          (lit(1.0 - damping) / col("n_nodes") + lit(damping) * col("contrib")).as("rank"))
    }
    ranks.select(col("node"), round(col("rank"), 8).as("rank"))
  }
}
