package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/**
 * Typed `Aggregator`s — the Spark-native form of the reference's
 * `accumulate` step (reference: src/mr.h:83, src/mr.c:787-810): an
 * opaque user fold with explicit zero/reduce/merge, which Catalyst
 * automatically splits into per-partition partial + final merge (the
 * split LibMR pipeline authors place by hand, SURVEY §2.1 #4).
 * Registered via `functions.udaf` they are also SQL-callable.
 */
object Aggregators {

  /** Weighted mean: sum(v*w)/sum(w). Buffer is (weightedSum, weightSum). */
  object WeightedMean extends Aggregator[(Double, Double), (Double, Double), Double] {
    override def zero: (Double, Double) = (0.0, 0.0)
    override def reduce(b: (Double, Double), in: (Double, Double)): (Double, Double) =
      (b._1 + in._1 * in._2, b._2 + in._2)
    override def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
      (a._1 + b._1, a._2 + b._2)
    override def finish(b: (Double, Double)): Double =
      if (b._2 == 0.0) Double.NaN else b._1 / b._2
    override def bufferEncoder: Encoder[(Double, Double)] = Encoders.tuple(
      Encoders.scalaDouble, Encoders.scalaDouble)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /**
   * Element-wise vector sum over `array<double>` columns. The scale
   * lever for centroid builds: `groupBy(k).agg(vec_sum(v))` shuffles
   * ONE array row per (group, partition) instead of the
   * posexplode-then-avg formulation's (rows × dims) scalar rows — at
   * 1B vectors × 1K dims that is the difference between a 1B-row and
   * a 1T-row shuffle. Empty buffer = zero-length array (adopts the
   * first input's dimensionality).
   */
  object VecSum extends Aggregator[Seq[Double], Array[Double], Seq[Double]] {
    override def zero: Array[Double] = Array.emptyDoubleArray
    override def reduce(b: Array[Double], in: Seq[Double]): Array[Double] = {
      if (b.isEmpty) in.toArray
      else {
        var i = 0
        val n = math.min(b.length, in.length)
        while (i < n) { b(i) += in(i); i += 1 }
        b
      }
    }
    override def merge(a: Array[Double], b: Array[Double]): Array[Double] =
      if (a.isEmpty) b else if (b.isEmpty) a
      else { var i = 0; while (i < math.min(a.length, b.length)) { a(i) += b(i); i += 1 }; a }
    override def finish(b: Array[Double]): Seq[Double] = b.toSeq
    override def bufferEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  /**
   * Fused second-moment accumulator for [[graft.operators.Similarity]]
   * PCA: one pass over `array<double>` rows accumulates (n, Σx,
   * row-major Σxxᵀ) into a single primitive buffer of 1 + d + d²
   * doubles. The d² products fold into the buffer IN PLACE — no
   * per-row outer-product array ever materializes, which is the
   * difference between streaming 64 doubles/row and allocating+boxing
   * 4096/row (measured 46× on the 100k-vector fit probe). Partial
   * aggregation ships one buffer per partition; addition order per
   * element matches the VecSum-over-outer-products formulation, so
   * results are bit-identical to it.
   */
  object MomentAgg extends Aggregator[Seq[Double], Array[Double], (Long, Seq[Double], Seq[Double])] {
    override def zero: Array[Double] = Array.emptyDoubleArray
    override def reduce(b0: Array[Double], in: Seq[Double]): Array[Double] = {
      val x = in.toArray
      val d = x.length
      val b = if (b0.isEmpty) new Array[Double](1 + d + d * d) else b0
      // ragged dimensions must fail LOUDLY: folding a shorter row into
      // a longer buffer would index Σxxᵀ at the wrong offsets and feed
      // silently-corrupt moments into every PCA fit (and embQuality's
      // dim census, whose whole point is dim-inconsistent corpora —
      // that census counts dims BEFORE aggregating, so a clean corpus
      // never reaches this require with mixed d)
      require(b.length == 1 + d + d * d,
        s"MomentAgg: row dimension $d does not match the buffer's " +
          s"(len ${b.length} = 1+d+d²) — mixed-dimension input")
      b(0) += 1.0
      var i = 0
      while (i < d) {
        b(1 + i) += x(i)
        val base = 1 + d + i * d
        val xi = x(i)
        var j = 0
        while (j < d) { b(base + j) += xi * x(j); j += 1 }
        i += 1
      }
      b
    }
    override def merge(a: Array[Double], b: Array[Double]): Array[Double] =
      if (a.isEmpty) b else if (b.isEmpty) a
      else {
        // two partitions that saw different dims would sum misaligned
        // prefixes — corrupt statistics, not an error. Refuse.
        require(a.length == b.length,
          s"MomentAgg: merging buffers of different dimension " +
            s"(${a.length} vs ${b.length}) — mixed-dimension input")
        var i = 0
        while (i < a.length) { a(i) += b(i); i += 1 }
        a
      }
    override def finish(b: Array[Double]): (Long, Seq[Double], Seq[Double]) =
      if (b.isEmpty) (0L, Nil, Nil)
      else {
        // len = 1 + d + d²  ⇒  d = (√(4·(len−1)+1) − 1) / 2
        val d = ((math.sqrt(4.0 * (b.length - 1) + 1) - 1) / 2).round.toInt
        (b(0).toLong, b.slice(1, 1 + d).toSeq,
          b.slice(1 + d, 1 + d + d * d).toSeq)
      }
    override def bufferEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
    override def outputEncoder: Encoder[(Long, Seq[Double], Seq[Double])] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Seq[Double], Seq[Double])]()
  }

  /**
   * Exact H-INDEX of the group's values: the largest h such that at
   * least h values are ≥ h. The per-round kernel of the distributed
   * k-core decomposition ([[graft.operators.Graph.coreness]] —
   * Montresor et al. 2011), where each node's next value is the
   * h-index of its neighbors' current values.
   *
   * Replaces the sort-window formulation (`row_number` over cd desc,
   * then `max(least(rn, cd))`): a histogram needs no per-group SORT,
   * and partial aggregation ships one (value, count) histogram per
   * (partition, group) instead of every edge-sized row — on a
   * dst-partitioned edge join that cuts the per-round shuffle from
   * edge-sized to node-sized-per-partition and drops the sort stage
   * entirely. Buffer is a value-sorted interleaved [v₁,c₁,v₂,c₂,…]
   * array: O(distinct values) per group — bounded by the group's
   * degree like the sort's state, but values in an h-index loop
   * cluster into a narrow band (they are coreness estimates), so the
   * practical size is tens of entries even for hub nodes.
   *
   * Values ≤ 0 never affect an h-index (h ≥ 1 requires a value ≥ 1)
   * and are skipped.
   */
  object HIndex extends Aggregator[Long, Array[Long], Long] {
    override def zero: Array[Long] = Array.emptyLongArray
    private def find(b: Array[Long], v: Long): Int = {
      // binary search over the even (value) slots
      var lo = 0
      var hi = b.length / 2 - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        val mv = b(2 * mid)
        if (mv == v) return 2 * mid
        else if (mv < v) lo = mid + 1
        else hi = mid - 1
      }
      -(2 * lo) - 1                       // insertion point, encoded
    }
    private def add(b: Array[Long], v: Long, c: Long): Array[Long] = {
      if (v <= 0L) return b
      val idx = find(b, v)
      if (idx >= 0) { b(idx + 1) += c; b }
      else {
        val at = -(idx + 1)
        val out = new Array[Long](b.length + 2)
        System.arraycopy(b, 0, out, 0, at)
        out(at) = v
        out(at + 1) = c
        System.arraycopy(b, at, out, at + 2, b.length - at)
        out
      }
    }
    override def reduce(b: Array[Long], in: Long): Array[Long] = add(b, in, 1L)
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      if (a.isEmpty) return b
      if (b.isEmpty) return a
      var out = a
      var i = 0
      while (i < b.length) { out = add(out, b(i), b(i + 1)); i += 2 }
      out
    }
    override def finish(b: Array[Long]): Long = {
      // descending values, cumulative count: h = max(min(v, cum)).
      // Once cum ≥ v the candidate equals v and every later (smaller)
      // value's candidate is < v — stop.
      var h = 0L
      var cum = 0L
      var i = b.length - 2
      while (i >= 0) {
        cum += b(i + 1)
        val cand = math.min(b(i), cum)
        if (cand > h) h = cand
        if (cum >= b(i)) i = -1 else i -= 2
      }
      h
    }
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /**
   * KMV (k-minimum-values) sketch core: the `k` smallest DISTINCT
   * hash values of the group, as a sorted ascending array. The
   * mergeable distinct-count summary (Bar-Yossef et al. 2002; the
   * Theta-sketch base): distinct ≈ (k−1)/h_(k) with h normalized to
   * [0,1), and the bottom-k of a UNION is computable from the two
   * bottom-k's alone — so partial aggregation bounds the shuffle at
   * partitions×k longs per group at ANY cardinality, and downstream
   * set algebra (union / intersection / Jaccard) needs only the
   * sketches. `Long.MinValue` inputs are skipped (the engine's
   * null-value sentinel; real hashes are sign-bit-masked ≥ 0).
   *
   * Buffer is a sorted distinct ascending Array[Long] of length ≤ k:
   * insert is a binary search + bounded memcpy (rejections are
   * O(log k) once the buffer saturates with small hashes), merge is
   * a linear merge cut at k.
   */
  class BottomKDistinct(k: Int) extends Aggregator[Long, Array[Long], Seq[Long]] {
    require(k > 0, "k must be positive")
    override def zero: Array[Long] = Array.emptyLongArray
    override def reduce(b: Array[Long], in: Long): Array[Long] = {
      if (in == Long.MinValue) return b
      var idx = java.util.Arrays.binarySearch(b, in)
      if (idx >= 0) return b                       // already present
      idx = -idx - 1
      if (idx >= k) return b                       // larger than all k kept
      val n = math.min(b.length + 1, k)
      val out = new Array[Long](n)
      System.arraycopy(b, 0, out, 0, idx)
      out(idx) = in
      System.arraycopy(b, idx, out, idx + 1, n - idx - 1)
      out
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      if (a.isEmpty) return b
      if (b.isEmpty) return a
      val out = new Array[Long](math.min(a.length + b.length, k))
      var i = 0; var j = 0; var o = 0
      while (o < out.length && (i < a.length || j < b.length)) {
        val v =
          if (j >= b.length || (i < a.length && a(i) <= b(j))) { val x = a(i); i += 1; x }
          else { val x = b(j); j += 1; x }
        if (o == 0 || out(o - 1) != v) { out(o) = v; o += 1 }
      }
      if (o == out.length) out else java.util.Arrays.copyOf(out, o)
    }
    override def finish(b: Array[Long]): Seq[Long] = b.toSeq
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }
}
