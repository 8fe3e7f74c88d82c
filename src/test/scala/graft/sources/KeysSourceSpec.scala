package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.core.Slots

/** DSv2 KeysReader analog: slot-range partitioning + prefix pushdown. */
class KeysSourceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def read(n: Int = 1000, shards: Int = 4) =
    spark.read.format("graft-keys")
      .option("numKeys", n).option("shards", shards).load()

  test("scans the whole keyspace exactly once across shard partitions") {
    val df = read()
    assert(df.count() === 1000)
    assert(df.select("key").distinct().count() === 1000)
  }

  test("each partition only holds keys of its own slot range (shard locality)") {
    val rows = read(500, 4)
      .withColumn("pid", spark_partition_id())
      .select("slot", "pid").collect()
    val per = Slots.NumSlots / 4
    rows.foreach { r =>
      val (slot, pid) = (r.getInt(0), r.getInt(1))
      assert(slot / per === math.min(pid, 3), s"slot $slot in partition $pid")
    }
  }

  test("slot column matches the engine's CRC16 slot function") {
    read(100).collect().foreach { r =>
      assert(r.getInt(1) === Slots.slot(r.getString(0)))
    }
  }

  test("prefix filter is pushed into the scan, not applied above it") {
    val filtered = read().filter(col("key").startsWith("user:"))
    val plan = filtered.queryExecution.executedPlan.toString
    // the scan's description carries the consumed prefix; no Filter node remains above it
    assert(plan.contains("prefix=user:"), s"pushdown missing in:\n$plan")
    assert(!plan.contains("Filter "), s"prefix not fully consumed by the scan:\n$plan")
    val keys = filtered.select("key").collect().map(_.getString(0))
    assert(keys.nonEmpty)
    assert(keys.forall(_.startsWith("user:")))
    assert(keys.length === 250)  // every 4th key is user:*
  }

  test("non-pushable filters still apply correctly above the scan") {
    val df = read().filter(col("slot") < 100)
    assert(df.collect().forall(_.getInt(1) < 100))
  }

  test("column pruning reaches the reader: a pruned payload is never computed") {
    val df = read().select("key", "slot")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("columns=key,slot"), s"payload not pruned in:\n$plan")
    assert(df.count() === 1000)
    // projection order is the reader's contract, not schema order
    val reordered = read().select("slot", "key").collect()
    reordered.foreach(r => assert(r.getInt(0) === Slots.slot(r.getString(1))))
  }

  test("COUNT(*) pushes into the source: one count row per shard, dbsize-style") {
    val df = read().groupBy().count()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("agg=count(*)"), s"count not pushed in:\n$plan")
    assert(df.collect().head.getLong(0) === 1000L)
    // composes with the pushed prefix: count only the user:* keyspace
    val filtered = read().filter(col("key").startsWith("user:")).groupBy().count()
    val fplan = filtered.queryExecution.executedPlan.toString
    assert(fplan.contains("agg=count(*)") && fplan.contains("prefix=user:"), fplan)
    assert(filtered.collect().head.getLong(0) === 250L)
  }

  test("MIN/MAX push into the source alongside COUNT: one partial row per shard") {
    val df = read().groupBy()
      .agg(min("key").as("mn"), max("key").as("mx"), count(lit(1)).as("n"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("agg=min(key),max(key),count(*)"),
      s"aggregates not pushed in:\n$plan")
    val got = df.collect().head
    // ground truth from an unpushed materialized read
    val keys = read().select("key").collect().map(_.getString(0))
    assert(got.getString(0) === keys.min)
    assert(got.getString(1) === keys.max)
    assert(got.getLong(2) === 1000L)
    // composes with the pushed prefix; slot column works too
    val f = read().filter(col("key").startsWith("user:"))
      .groupBy().agg(min("slot").as("mn"), max("slot").as("mx"))
    val fplan = f.queryExecution.executedPlan.toString
    assert(fplan.contains("agg=min(slot),max(slot)") && fplan.contains("prefix=user:"), fplan)
    val slots = read().filter(col("key").startsWith("user:"))
      .select("slot").collect().map(_.getInt(0))
    val fr = f.collect().head
    assert(fr.getInt(0) === slots.min && fr.getInt(1) === slots.max)
    // an unsupported aggregate (avg) falls back to the row path, still correct
    val avg0 = read().groupBy().agg(avg("slot")).collect().head.getDouble(0)
    val expected = read().select("slot").collect().map(_.getInt(0).toDouble).sum / 1000.0
    assert(math.abs(avg0 - expected) < 1e-9)
  }

  test("GROUP BY slot pushes into the source: per-shard keyed fold, merged by Spark") {
    val df = read().groupBy("slot")
      .agg(count(lit(1)).as("n"), min("key").as("mn"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("groupBy=slot") && plan.contains("agg=count(*),min(key)"),
      s"grouped aggregate not pushed in:\n$plan")
    val got = df.collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getString(2))).toMap
    // ground truth from the unpushed row path
    val rows = read().select("key", "slot").collect()
      .map(r => (r.getString(0), r.getInt(1)))
    val truth = rows.groupBy(_._2).map { case (s, ks) =>
      s -> (ks.length.toLong, ks.map(_._1).min) }
    assert(got === truth)
    // composes with the pushed prefix
    val f = read().filter(col("key").startsWith("user:")).groupBy("slot").count()
    val fplan = f.queryExecution.executedPlan.toString
    assert(fplan.contains("groupBy=slot") && fplan.contains("prefix=user:"), fplan)
    assert(f.agg(sum("count")).collect().head.getLong(0) === 250L)
    // a non-column group expression falls back to the row path, still correct
    val expr = read().groupBy((col("slot") % 2).as("par")).count().collect()
      .map(r => r.getAs[Number](0).longValue() -> r.getLong(1)).toMap
    assert(expr.values.sum === 1000L)
  }

  test("limit pushes into the scan partially: each slot-range reader stops early") {
    val df = read(100000, 4).limit(7)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("limit=7"), s"limit not pushed in:\n$plan")
    assert(df.count() === 7)
    // partial pushdown: the source may emit up to limit×shards rows,
    // Spark's own Limit produces the final 7 — correctness intact
    assert(df.collect().length === 7)
  }
}
