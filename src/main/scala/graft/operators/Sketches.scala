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

  /**
   * Count-min sketch (Cormode/Muthukrishnan '05) as a DataFrame: the
   * sketch IS a (row j, bucket, count) table — `depth` md5-derived
   * hash rows × `width` buckets. The build aggregation's key space is
   * bounded at depth×width however large the key vocabulary, so
   * map-side combine caps the shuffle at partitions×depth×width rows —
   * the mergeable-summary alternative to [[heavyHitters]]' candidate
   * pass when the stream is unbounded (streaming registers, cross-day
   * unions: sketches add cell-wise). Hashing is md5lo64 masked to the
   * power-of-two width, so any engine replays cells bit-identically.
   */
  def countMinSketch(df: DataFrame, keyCol: String, depth: Int = 4,
      width: Int = 8192): DataFrame = {
    require((width & (width - 1)) == 0, s"width must be a power of two, got $width")
    df.select(col(keyCol).cast("string").as("k"),
        explode(sequence(lit(0), lit(depth - 1))).as("j"))
      .select(col("j"), cmsBucket(col("j"), col("k"), width).as("b"))
      .groupBy("j", "b").agg(count(lit(1)).as("c"))
  }

  /** CMS cell address of key `k` in hash row `j` (md5lo64 masked to width-1). */
  private def cmsBucket(j: org.apache.spark.sql.Column,
      k: org.apache.spark.sql.Column, width: Int): org.apache.spark.sql.Column =
    graft.functions.TextFunctions.md5lo64(
      concat(j.cast("string"), lit(":"), k)).bitwiseAND(lit(width - 1L))

  /**
   * CMS point estimates vs exact counts for the `topK` most frequent
   * keys: est = min over hash rows of the key's cell — always ≥ exact
   * (cells only over-count), with E[err] ≤ N/width per row. The demo
   * query for [[countMinSketch]]: exact truth rides the same output so
   * the estimate's determinism (and its overestimate-only guarantee)
   * is oracle-checkable. The estimate join broadcasts topK×depth probe
   * rows against the depth×width sketch — nothing key-space-sized
   * shuffles twice.
   */
  def cmsEstimates(df: DataFrame, keyCol: String, depth: Int = 4,
      width: Int = 8192, topK: Int = 20): DataFrame = {
    val sk = countMinSketch(df, keyCol, depth, width)
    val ex = df.select(col(keyCol).cast("string").as("k"))
      .groupBy("k").agg(count(lit(1)).as("exact"))
      .orderBy(col("exact").desc, col("k")).limit(topK)
    val probes = ex.select(col("k"), col("exact"),
        explode(sequence(lit(0), lit(depth - 1))).as("j"))
      .withColumn("b", cmsBucket(col("j"), col("k"), width))
    probes.join(broadcast(sk), Seq("j", "b"))
      .groupBy("k", "exact").agg(min("c").as("est"))
  }
}
