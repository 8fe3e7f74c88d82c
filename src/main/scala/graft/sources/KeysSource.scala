package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, Filter, StringStartsWith}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.core.Slots

/**
 * DataSource V2 connector mirroring the reference's `KeysReader`
 * (reference: tests/mr_test_module/src/lib.rs:822-916): a keyspace
 * scanned shard-locally, where each "shard" owns a contiguous Redis
 * slot range (reference: src/cluster.c:123-153) and an optional key
 * prefix is applied inside the reader itself
 * (lib.rs:855-859 — the reference's predicate-in-reader
 * optimization ≡ DSv2 filter pushdown).
 *
 * Synthetic, deterministic keyspace (no external Redis in this
 * environment): key i is `<pool>:<i>` over a small pool of prefixes;
 * the payload derives from the key. The SCALE-RELEVANT part is real:
 * partition planning = slot ranges (each InputPartition scans only
 * its own slots, like a cluster node), and `StringStartsWith(key)`
 * is consumed by the scan instead of a post-filter.
 *
 * Usage:
 * {{{
 *   spark.read.format("graft-keys")
 *     .option("numKeys", 10000).option("shards", 8)
 *     .load()                       // key, slot, payload
 *     .filter(col("key").startsWith("user:"))  // pushed into the scan
 * }}}
 */
class KeysSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-keys"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = KeysSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new KeysTable(
      properties.getOrDefault("numKeys", "1000").toInt,
      properties.getOrDefault("shards", "4").toInt)
}

object KeysSource {
  val schema: StructType = StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("slot", IntegerType, nullable = false),
    StructField("payload", StringType, nullable = false)))

  private val pools = Array("user", "order", "item", "session")

  def keyAt(i: Int): String = s"${pools(i % pools.length)}:$i"
  def payloadAt(key: String): String = s"v(${key.reverse})"
}

class KeysTable(numKeys: Int, shards: Int) extends Table with SupportsRead {
  override def name(): String = s"graft_keys($numKeys,$shards)"
  override def schema(): StructType = KeysSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new KeysScanBuilder(numKeys, shards)
}

class KeysScanBuilder(numKeys: Int, shards: Int)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownLimit
    with SupportsPushDownAggregates {
  private var prefix: Option[String] = None
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = KeysSource.schema
  private var limit: Int = -1
  private var aggOps: Seq[String] = Nil
  private var groupCols: Seq[String] = Nil

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case StringStartsWith("key", _) => true
      case _ => false
    }
    pushed = accepted
    prefix = accepted.collectFirst { case StringStartsWith(_, p) => p }
    rejected // Spark re-applies these above the scan
  }

  override def pushedFilters(): Array[Filter] = pushed

  /**
   * Column pruning ≡ the reference KeysReader's keys-only vs
   * keys-and-values read modes (tests/mr_test_module/src/lib.rs:
   * 822-916 — readallkeys never fetches values): a pruned `payload`
   * is never computed/"fetched" by the reader.
   */
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Partial limit pushdown: each slot-range scan stops after `limit` rows; Spark keeps the global Limit. */
  override def pushLimit(l: Int): Boolean = { limit = l; true }
  override def isPartiallyPushed(): Boolean = true

  /**
   * Aggregate pushdown ≡ the reference's per-shard RPC fold: the
   * initiator sends the aggregate to every shard and merges one
   * partial reply per shard (src/mr.h:94-113 — `dbsize` is the
   * count instance, tests/mr_test_module/src/lib.rs `LMRTEST
   * .DBSIZE`). Accepted: any combination of COUNT(*) and MIN/MAX
   * over the key or slot column, UNGROUPED or GROUPED BY key/slot
   * columns — the grouped form is the reference's per-shard keyed
   * fold generalized (src/mr.c:2263-2311): each slot-range partition
   * emits ONE partial row per group it owns (no key/payload rows
   * materialize) and Spark's final aggregate merges the shard
   * replies. PARTIAL pushdown by contract: empty shards/groups reply
   * no rows, the final merge ignores them.
   */
  override def pushAggregation(agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    import org.apache.spark.sql.connector.expressions.aggregate.{CountStar, Max, Min}
    if (limit >= 0) return false
    def colOf(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
      e match {
        case nr: org.apache.spark.sql.connector.expressions.NamedReference
            if Seq("key", "slot").contains(nr.toString) =>
          Some(nr.toString)
        case _ => None
      }
    val groups = agg.groupByExpressions.toSeq.map(colOf)
    if (groups.exists(_.isEmpty)) return false
    val ops = agg.aggregateExpressions.toSeq.map {
      case _: CountStar => Some("count(*)")
      case m: Min => colOf(m.column).map(c => s"min($c)")
      case m: Max => colOf(m.column).map(c => s"max($c)")
      case _ => None
    }
    // an EMPTY aggregation (an outer count() can dead-code the inner
    // aggregate down to zero expressions) must fall back to the row
    // path: accepting it would make readSchema disagree with the
    // pushed-aggregate schema
    if (ops.isEmpty || ops.exists(_.isEmpty)) return false
    aggOps = ops.flatten
    groupCols = groups.flatten
    true
  }

  override def build(): Scan =
    new KeysScan(numKeys, shards, prefix, required, limit, aggOps, groupCols)
}

class KeysScan(numKeys: Int, shards: Int, prefix: Option[String],
    required: StructType, limit: Int, aggOps: Seq[String],
    groupCols: Seq[String] = Nil) extends Scan with Batch {
  override def readSchema(): StructType =
    if (aggOps.nonEmpty) StructType(
      groupCols.map {
        case "key" => StructField("key", StringType, nullable = false)
        case _ => StructField("slot", IntegerType, nullable = false)
      } ++ aggOps.map {
        case "count(*)" => StructField("count(*)", LongType, nullable = false)
        case op @ ("min(key)" | "max(key)") => StructField(op, StringType, nullable = true)
        case op => StructField(op, IntegerType, nullable = true)
      })
    else required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-keys numKeys=$numKeys shards=$shards prefix=${prefix.getOrElse("")} " +
      s"columns=${required.fieldNames.mkString(",")} limit=$limit" +
      (if (aggOps.nonEmpty) s" agg=${aggOps.mkString(",")}" else "") +
      (if (groupCols.nonEmpty) s" groupBy=${groupCols.mkString(",")}" else "")

  /** One partition per shard = one contiguous slot range (Redis-cluster style). */
  override def planInputPartitions(): Array[InputPartition] = {
    val per = Slots.NumSlots / shards
    (0 until shards).map { s =>
      val lo = s * per
      val hi = if (s == shards - 1) Slots.NumSlots - 1 else (s + 1) * per - 1
      SlotRangePartition(lo, hi, numKeys, prefix, required.fieldNames, limit,
        aggOps, groupCols): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = new KeysReaderFactory
}

case class SlotRangePartition(slotLo: Int, slotHi: Int, numKeys: Int,
    prefix: Option[String], columns: Array[String], limit: Int,
    aggOps: Seq[String], groupCols: Seq[String] = Nil) extends InputPartition

class KeysReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SlotRangePartition]
    if (p.aggOps.nonEmpty && p.groupCols.nonEmpty) return new PartitionReader[InternalRow] {
      // grouped shard-RPC fold (the reference's per-shard keyed fold,
      // src/mr.c:2263-2311): one partial row per group THIS shard
      // owns; groups the shard never saw emit nothing and Spark's
      // final merge aggregates the per-shard partials
      private var rows: java.util.Iterator[InternalRow] = _
      private var row: InternalRow = _
      private def fold(): java.util.Iterator[InternalRow] = {
        // group key -> (n, minKey, maxKey, minSlot, maxSlot)
        val acc = new java.util.LinkedHashMap[Seq[Any], Array[Any]]()
        var i = 0
        while (i < p.numKeys) {
          val key = KeysSource.keyAt(i)
          if (p.prefix.forall(key.startsWith)) {
            val slot = Slots.slot(key)
            if (slot >= p.slotLo && slot <= p.slotHi) {
              val g: Seq[Any] = p.groupCols.map {
                case "key" => key
                case _ => slot
              }
              val a = acc.computeIfAbsent(g, _ => Array[Any](0L, null, null, null, null))
              a(0) = a(0).asInstanceOf[Long] + 1L
              if (a(1) == null || key < a(1).asInstanceOf[String]) a(1) = key
              if (a(2) == null || key > a(2).asInstanceOf[String]) a(2) = key
              if (a(3) == null || slot < a(3).asInstanceOf[Int]) a(3) = slot
              if (a(4) == null || slot > a(4).asInstanceOf[Int]) a(4) = slot
            }
          }
          i += 1
        }
        val out = new java.util.ArrayList[InternalRow](acc.size())
        acc.forEach { (g, a) =>
          val groupVals = g.map {
            case s: String => UTF8String.fromString(s)
            case v => v
          }
          val aggVals = p.aggOps.map {
            case "count(*)" => a(0)
            case "min(key)" => UTF8String.fromString(a(1).asInstanceOf[String])
            case "max(key)" => UTF8String.fromString(a(2).asInstanceOf[String])
            case "min(slot)" => a(3)
            case "max(slot)" => a(4)
          }
          out.add(InternalRow((groupVals ++ aggVals): _*))
        }
        out.iterator()
      }
      override def next(): Boolean = {
        if (rows == null) rows = fold()
        if (!rows.hasNext) return false
        row = rows.next()
        true
      }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
    if (p.aggOps.nonEmpty) return new PartitionReader[InternalRow] {
      // shard-RPC path: one partial-aggregate row per shard, nothing
      // materializes; all requested aggregates fold in a single pass
      private var done = false
      override def next(): Boolean = !done && { done = true; true }
      override def get(): InternalRow = {
        var n = 0L
        var minKey: String = null; var maxKey: String = null
        var minSlot = Int.MaxValue; var maxSlot = Int.MinValue
        var i = 0
        while (i < p.numKeys) {
          val key = KeysSource.keyAt(i)
          if (p.prefix.forall(key.startsWith)) {
            val slot = Slots.slot(key)
            if (slot >= p.slotLo && slot <= p.slotHi) {
              n += 1
              if (minKey == null || key < minKey) minKey = key
              if (maxKey == null || key > maxKey) maxKey = key
              if (slot < minSlot) minSlot = slot
              if (slot > maxSlot) maxSlot = slot
            }
          }
          i += 1
        }
        InternalRow(p.aggOps.map {
          case "count(*)" => n
          case "min(key)" => if (minKey == null) null else UTF8String.fromString(minKey)
          case "max(key)" => if (maxKey == null) null else UTF8String.fromString(maxKey)
          case "min(slot)" => if (n == 0) null else minSlot
          case "max(slot)" => if (n == 0) null else maxSlot
        }: _*)
      }
      override def close(): Unit = ()
    }
    new PartitionReader[InternalRow] {
      private var i = -1
      private var emitted = 0
      private var row: InternalRow = _

      // pull-based, like ExecutionReader (reference: src/mr.h:80):
      // advance until a key owned by this shard's slot range passes
      // the pushed prefix, or the keyspace/limit is exhausted
      override def next(): Boolean = {
        if (p.limit >= 0 && emitted >= p.limit) return false
        i += 1
        while (i < p.numKeys) {
          val key = KeysSource.keyAt(i)
          if (p.prefix.forall(key.startsWith)) {
            val slot = Slots.slot(key)
            if (slot >= p.slotLo && slot <= p.slotHi) {
              // only requested columns materialize — a pruned payload
              // is never computed (≡ not fetching the value)
              row = InternalRow(p.columns.map {
                case "key" => UTF8String.fromString(key)
                case "slot" => slot
                case "payload" => UTF8String.fromString(KeysSource.payloadAt(key))
              }.toIndexedSeq: _*)
              emitted += 1
              return true
            }
          }
          i += 1
        }
        false
      }

      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
}
