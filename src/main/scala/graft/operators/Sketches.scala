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

  /** 2^63 as a double (KMV hashes are sign-bit-masked into [0, 2^63)). */
  private val Norm63 = 9.223372036854775808e18

  /**
   * KMV hash of a string value: md5lo64 with the sign bit cleared
   * (non-negative, so BIGINT min-order matches any engine), null in →
   * `Long.MinValue` sentinel (skipped by [[graft.functions.Aggregators.BottomKDistinct]]).
   * The "kmv:" domain prefix keeps this hash stream independent of
   * the minhash / CMS / winnowing streams built on the same md5 base.
   */
  private def kmvHash(v: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(v.isNotNull, graft.functions.TextFunctions
      .md5lo64(concat(lit("kmv:"), v)).bitwiseAND(lit(Long.MaxValue)))
      .otherwise(lit(Long.MinValue))

  /** KMV distinct estimate from a sorted bottom-k array: exact below k, (k−1)/h_(k) normalized at k. */
  private def kmvEstimate(ks: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column = {
    val m = org.apache.spark.sql.functions.size(ks)
    when(m < k, m.cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(Norm63) / element_at(ks, k).cast("double"))
  }

  /**
   * One-pass column profiler: for each named column expression,
   * row count, null count, lexicographic min/max of the string form,
   * and a KMV distinct-count estimate — the governance scan a 100 TB
   * ingest runs per table. ONE melt (rows×cols) feeds ONE aggregation;
   * the KMV buffer caps partial state at k longs per (column,
   * partition), so the shuffle is bounded by cols×partitions×k at any
   * cardinality — no count(DISTINCT) expand, no second scan. Every
   * output value (hashes included) replays bit-identically in any
   * engine with md5: est = (k−1)·2^63/h_(k) over md5lo64 sign-masked
   * hashes, exact count below saturation.
   */
  def profile(df: DataFrame, cols: Seq[(String, org.apache.spark.sql.Column)],
      k: Int = 256): DataFrame = {
    val bottomK = udaf(new graft.functions.Aggregators.BottomKDistinct(k))
    val melted = df.select(explode(array(cols.map { case (name, c) =>
        struct(lit(name).as("col_name"), c.cast("string").as("v"))
      }: _*)).as("kv"))
      .select(col("kv.col_name").as("col_name"), col("kv.v").as("v"))
    melted
      .withColumn("h", kmvHash(concat(col("col_name"), lit(":"), col("v"))))
      .groupBy("col_name")
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_null"),
        min("v").as("min_v"),
        max("v").as("max_v"),
        bottomK(col("h")).as("ks"))
      .select(col("col_name"), col("n_rows"), col("n_null"),
        col("min_v"), col("max_v"),
        org.apache.spark.sql.functions.size(col("ks")).cast("long").as("m_used"),
        round(kmvEstimate(col("ks"), k), 2).as("distinct_est"))
  }

  /**
   * Deterministic sample-based quantile summary per group — the
   * third mergeable summary beside KMV (distinct) and CMS/MG
   * (frequency). The md5 bottom-k row sample is uniform, content-
   * independent, and merge-stable (bottom-k of a union is computable
   * from per-part bottom-k's — the growth-stable reservoir
   * replacement `corpus_bottomk` pins), and it rides the TopKPerKey
   * two-phase heap plan: exchange ≤ partitions×k rows per group at
   * any table size. Quantiles are type-1 (element at ⌈q·m⌉ of the
   * sorted sample) — the output is a VALUE from the data, no
   * interpolation arithmetic, so any engine replays it bit-equal.
   * Sample error is the standard DKW bound ε ≈ √(ln(2/δ)/2k) on rank
   * fraction (~5% at k=512) — and when a group has ≤ k rows the
   * "sample" is the whole group and the quantiles are exact.
   */
  def sampleQuantiles(df: DataFrame, groupCol: String, valCol: String,
      idCol: String, k: Int = 512, qs: Seq[Double] = Seq(0.5, 0.9, 0.99)): DataFrame = {
    val hashed = df.withColumn("__qh", graft.functions.TextFunctions
      .md5lo64(concat(lit("qs:"), col(idCol).cast("string"))))
    val sampled = graft.relational.Relational.topKPerKey(hashed,
      keys = Seq(col(groupCol)),
      order = Seq(col("__qh").asc, col(idCol).asc), k = k)
    val agged = sampled.groupBy(groupCol)
      .agg(sort_array(collect_list(col(valCol))).as("__vs"),
        count(lit(1)).as("n_sampled"))
    agged.select(col(groupCol) +: col("n_sampled") +: qs.map { q =>
      element_at(col("__vs"), ceil(lit(q) * col("n_sampled")).cast("int"))
        .as(s"p${(q * 100).round}")
    }: _*)
  }

  /**
   * Per-key KMV distinct-count estimate: the streaming-friendly
   * distinct counter (sketch cells are mergeable across micro-batches
   * by the bottom-k union — StreamingSpec pins merged == single-shot,
   * the same contract as the CMS cells). The sketch aggregates
   * straight off the scan via partial BottomKDistinct buffers
   * (shuffle ≤ partitions×keys×k longs at any cardinality); the exact
   * column, when requested, rides a separate distinct subframe so the
   * sketch plan never pays a count-distinct Expand.
   */
  /** Raw per-key KMV sketch (key, ks: sorted bottom-k hash array) — the mergeable feed. */
  def kmvSketchByKey(df: DataFrame, keyCol: String, valCol: String,
      k: Int = 256): DataFrame = {
    val bottomK = udaf(new graft.functions.Aggregators.BottomKDistinct(k))
    df.select(col(keyCol).as("key"), col(valCol).cast("string").as("v"))
      .groupBy("key").agg(bottomK(kmvHash(col("v"))).as("ks"))
      .select(col("key").as(keyCol), col("ks"))
  }

  def kmvDistinctByKey(df: DataFrame, keyCol: String, valCol: String,
      k: Int = 256, withExact: Boolean = true): DataFrame = {
    val sketch = kmvSketchByKey(df, keyCol, valCol, k)
      .withColumnRenamed(keyCol, "key")
    val base =
      if (withExact)
        sketch.join(df.select(col(keyCol).as("key"),
            col(valCol).cast("string").as("v")).distinct()
          .groupBy("key").agg(count(lit(1)).as("n_exact")), "key")
      else sketch.withColumn("n_exact", lit(0L))
    base.select(col("key").as(keyCol), col("n_exact"),
      org.apache.spark.sql.functions.size(col("ks")).cast("long").as("m_used"),
      round(kmvEstimate(col("ks"), k), 2).as("distinct_est"))
  }

  /**
   * KMV set algebra between document sources over word-n-gram
   * shingles: per source-pair, exact distinct-shingle union /
   * intersection (posting-list form, no self-join) alongside the
   * sketch estimates — union from the bottom-k of the merged sketch,
   * intersection via the Theta-style Jaccard estimator |L∩A∩B|/|L|
   * on L = bottom-k of the union. The cross-source-contamination
   * governance query: at 100 TB only the k-long sketches (sources×k
   * longs) meet in the pair stage; the exact columns ride the same
   * bounded posting-list shuffle as [[graft.operators.Curation.sourceOverlapMatrix]].
   * Estimates are deterministic functions of md5 hash sets — an
   * oracle replays them exactly, no tolerance band. The distinct
   * (source, shingle) set feeds both the sketch and the exact
   * branches as separate plan subtrees; at real scale persist it (or
   * drop the exact columns — the sketches alone answer the query).
   */
  def kmvSourceOps(docs: DataFrame, n: Int = 5, k: Int = 256,
      textCol: String = "text", srcCol: String = "source",
      withExact: Boolean = true): DataFrame = {
    val bottomK = udaf(new graft.functions.Aggregators.BottomKDistinct(k))
    // shingle strings from the one-pass scan expression; NOT
    // pre-distinct'd for the sketch — BottomKDistinct dedups inside
    // its buffer, so the sketch build shuffles only partial buffers
    // (partitions×sources×k longs), never a shingle string
    val raw = docs.select(col(srcCol).as("src"),
      explode(graft.functions.TextFunctions
        .shingle_strings(lower(col(textCol)), n)).as("g"))
    val sh = raw.distinct()
    val sketch = raw.groupBy("src").agg(bottomK(kmvHash(col("g"))).as("ks"))
    val sk =
      if (withExact)
        sketch.join(sh.groupBy("src").agg(count(lit(1)).as("n_exact")), "src")
      else sketch.withColumn("n_exact", lit(0L))
    val a = sk.select(col("src").as("source_a"), col("ks").as("ka"), col("n_exact").as("na"))
    val b = sk.select(col("src").as("source_b"), col("ks").as("kb"), col("n_exact").as("nb"))
    val merged = slice(array_sort(array_union(col("ka"), col("kb"))), 1, k)
    val m = org.apache.spark.sql.functions.size(col("mk"))
    val inBoth = org.apache.spark.sql.functions.size(
      array_intersect(array_intersect(col("mk"), col("ka")), col("kb")))
    val pairs = a.join(b, col("source_a") < col("source_b"))
      .withColumn("mk", merged)
    val ests = Seq(
      round(kmvEstimate(col("mk"), k), 2).as("union_est"),
      round((inBoth.cast("double") / m) * kmvEstimate(col("mk"), k), 2).as("inter_est"),
      round(inBoth.cast("double") / m, 6).as("jaccard_est"))
    if (!withExact) {
      // 100 TB mode: the estimate columns alone — everything after
      // the per-source aggregation touches only sources×k longs
      pairs.select(col("source_a") +: col("source_b") +: ests: _*)
    } else {
      // exact pairwise intersection: posting lists of source sets per
      // shingle — single-source shingles never leave the aggregate
      val inter = sh.groupBy("g").agg(sort_array(collect_set(col("src"))).as("ss"))
        .filter(org.apache.spark.sql.functions.size(col("ss")) >= 2)
        .select(explode(col("ss")).as("source_a"), col("ss"))
        .select(col("source_a"), explode(col("ss")).as("source_b"))
        .filter(col("source_a") < col("source_b"))
        .groupBy("source_a", "source_b").agg(count(lit(1)).as("exact_inter"))
      pairs.join(inter, Seq("source_a", "source_b"), "left")
        .select(col("source_a") +: col("source_b") +:
          (col("na") + col("nb") - coalesce(col("exact_inter"), lit(0L))).as("exact_union") +:
          coalesce(col("exact_inter"), lit(0L)).as("exact_inter") +: ests: _*)
    }
  }
}
