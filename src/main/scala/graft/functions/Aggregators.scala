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
}
