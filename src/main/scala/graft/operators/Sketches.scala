package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/**
 * Frequency-sketch operators. The flagship is exact heavy hitters in
 * two passes — the pattern that replaces "groupBy the whole key
 * space" when the key space is enormous (token vocabularies, URLs,
 * user ids at 100 TB) but only the frequent keys matter.
 *
 * Pass 1: per-partition Misra-Gries summaries (capacity m = ⌈1/φ⌉).
 * MG guarantees any key with partition frequency > cnt_p/(m+1)
 * survives that partition's summary; a key with GLOBAL frequency
 * ≥ φ·N must have frequency ≥ φ·cnt_p on at least one partition
 * (pigeonhole), and φ > 1/(m+1), so every true heavy hitter appears
 * in the candidate union. The union is ≤ m keys per partition —
 * driver-safe — and broadcasts back.
 * Pass 2: exact counts restricted to the candidate set (the isin
 * filter drops non-candidates in the scan stage), then the φ·N
 * threshold keeps exactly the true heavy hitters. Output is EXACT —
 * identical to a full groupBy — but the shuffle carries only
 * candidate keys.
 */
object Sketches {

  /** Per-partition Misra-Gries: keys surviving a capacity-m summary. */
  private def misraGries(it: Iterator[String], m: Int): Iterator[String] = {
    val counters = mutable.HashMap.empty[String, Long]
    it.foreach { x =>
      if (counters.contains(x)) counters(x) += 1L
      else if (counters.size < m) counters(x) = 1L
      else {
        // decrement-all step; drop zeroed counters
        val dead = mutable.ArrayBuffer.empty[String]
        counters.keysIterator.foreach { k =>
          val c = counters(k) - 1L
          if (c == 0L) dead += k else counters(k) = c
        }
        dead.foreach(counters.remove)
      }
    }
    counters.keysIterator
  }

  /**
   * Exact φ-heavy hitters of `keyCol`: every value with frequency
   * ≥ ⌈φ·N⌉ and its exact count. Two scans, no full-vocabulary
   * shuffle (see object doc for the guarantee).
   */
  def heavyHitters(df: DataFrame, keyCol: String, phi: Double): DataFrame = {
    require(phi > 0 && phi < 1, s"phi must be in (0,1), got $phi")
    val m = math.ceil(1.0 / phi).toInt
    val keys = df.select(col(keyCol).cast("string")).as[String](Encoders.STRING)
    // pass 1: ONE job emits both the MG candidates and the partition's
    // row count (as a (None, n) sentinel row) — the total N rides the
    // candidate pass instead of costing a separate full scan
    val perPart = keys.mapPartitions { it =>
      var n = 0L
      val counted = it.map { x => n += 1; x }
      val cands = misraGries(counted, m).toArray // drains `it`, finalizing n
      cands.iterator.map(k => (Option(k), 0L)) ++
        Iterator.single((Option.empty[String], n))
    }(Encoders.product[(Option[String], Long)]).collect()
    val candidates = perPart.collect { case (Some(k), _) => k }.toSet
    val n = perPart.collect { case (None, c) => c }.sum
    val threshold = math.ceil(phi * n).toLong
    // pass 2: exact counts of candidates only — isInCollection compiles
    // to a codegen'd InSet probe in the scan stage, so the groupBy
    // shuffles ≤ (partitions × m) keys
    df.select(col(keyCol).cast("string").as(keyCol))
      .filter(col(keyCol).isInCollection(candidates.toSeq))
      .groupBy(keyCol)
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= threshold)
  }
}
