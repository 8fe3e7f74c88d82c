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
}
