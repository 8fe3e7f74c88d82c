package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/**
 * Streaming candidate-pair generator over ONE bucket's collected
 * (id, rk) members — the single-operator form of the refine-not-drop
 * semantics ([[graft.operators.Dedup.pairsFromBucketsRefined]]):
 *
 *  - ≤ `maxBucket` members: every a < b pair (the exact small-bucket
 *    candidate set);
 *  - oversized: members group on the refine key rk; each group emits
 *    a STAR to its min id; one representative (min id) per group
 *    cross-links the groups — all-pairs when the reps fit
 *    `maxBucket`, else a star over the reps.
 *
 * WHY a Generator instead of a 4-branch union of aggregates: the
 * union form re-runs the bucket collect_list aggregation once per
 * branch (Spark reuses the exchange, not the final aggregation above
 * it — measured ~30% on dedup_minhash at sf0.1), and an expression
 * returning the pair ARRAY would materialize m²/2 structs per bucket
 * in memory. A Generator streams pairs lazily off one aggregate
 * output: no rework, no per-bucket quadratic allocation.
 */
case class BucketPairsExpr(child: Expression, maxBucket: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("a_id", LongType, nullable = false),
    StructField("b_id", LongType, nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StructType(Array(a, b)), _)
          if a.dataType == LongType && b.dataType == LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bucket_pairs expects array<struct<long, long>>, got $other")
    }

  private def pair(x: Long, y: Long): InternalRow =
    if (x < y) new GenericInternalRow(Array[Any](x, y))
    else new GenericInternalRow(Array[Any](y, x))

  /** All a < b pairs of `ids` (equal ids skipped), streamed. */
  private def allPairs(ids: Array[Long]): Iterator[InternalRow] =
    new Iterator[InternalRow] {
      private val n = ids.length
      private var i = 0
      private var j = 1
      private var nxt: InternalRow = advance()
      private def advance(): InternalRow = {
        while (i < n - 1) {
          if (j < n) {
            val (a, b) = (ids(i), ids(j)); j += 1
            if (a != b) return pair(a, b)
          } else { i += 1; j = i + 1 }
        }
        null
      }
      def hasNext: Boolean = nxt != null
      def next(): InternalRow = { val r = nxt; nxt = advance(); r }
    }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null) return Iterator.empty
    val nIn = arr.numElements()
    if (nIn < 2) return Iterator.empty
    // skip null elements / null struct fields: internal callers
    // (collect_list) never produce them, but the function is
    // SQL-exposed and ad-hoc input must not NPE the task
    val idsBuf = new Array[Long](nIn)
    val rksBuf = new Array[Long](nIn)
    var m = 0
    var i = 0
    while (i < nIn) {
      if (!arr.isNullAt(i)) {
        val row = arr.getStruct(i, 2)
        if (row != null && !row.isNullAt(0) && !row.isNullAt(1)) {
          idsBuf(m) = row.getLong(0)
          rksBuf(m) = row.getLong(1)
          m += 1
        }
      }
      i += 1
    }
    if (m < 2) return Iterator.empty
    val n = m
    val ids = java.util.Arrays.copyOf(idsBuf, m)
    val rks = java.util.Arrays.copyOf(rksBuf, m)
    if (n <= maxBucket) return allPairs(ids)
    // oversized: rk groups (insertion-ordered for determinism of the
    // streamed order — the SET is order-independent anyway)
    val groups = new java.util.LinkedHashMap[Long, scala.collection.mutable.ArrayBuffer[Long]]()
    i = 0
    while (i < n) {
      groups.computeIfAbsent(rks(i), _ => scala.collection.mutable.ArrayBuffer.empty[Long]) += ids(i)
      i += 1
    }
    import scala.jdk.CollectionConverters._
    val members = groups.values().asScala.toArray
    val reps = members.map(_.min)
    val stars = members.iterator.zip(reps.iterator).flatMap { case (ms, rep) =>
      ms.iterator.filter(_ != rep).map(m => pair(rep, m))
    }
    val cross =
      if (reps.length < 2) Iterator.empty
      else if (reps.length <= maxBucket) allPairs(reps)
      else { // star over the reps
        val c = reps.min
        reps.iterator.filter(_ != c).map(r => pair(c, r))
      }
    stars ++ cross
  }

  override protected def withNewChildInternal(newChild: Expression): BucketPairsExpr =
    copy(child = newChild)
}

object BucketPairsExpr {
  /** `bucket_pairs(xs, maxBucket)` over an `array<struct<id: long, rk: long>>` column. */
  def bucket_pairs(xs: Column, maxBucket: Int): Column =
    ColumnBridge.column(BucketPairsExpr(ColumnBridge.eagerExpression(xs), maxBucket))
}
