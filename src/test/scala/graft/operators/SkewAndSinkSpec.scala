package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}
import graft.functions.VectorFunctions.crc16_slot

/** Skew-handling join + sink (write-back) parity. */
class SkewAndSinkSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("salted join equals the plain join on skewed data") {
    // 90% of left rows share one hot key
    val left = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong % 7 else 999L, s"l$i"))
      .toDF("k", "lv")
    val right = (0 to 1000).map(i => (i.toLong, s"r$i")).toDF("rk", "rv")
    val plain = left.join(right, left("k") === right("rk"))
      .select("k", "lv", "rv").collect().map(_.toString).sorted
    val salted = SkewJoin.saltedInnerJoin(left, right, "k", "rk", saltFactor = 8)
      .select("k", "lv", "rv").collect().map(_.toString).sorted
    assert(salted.length === plain.length)
    assert(salted === plain)
  }

  test("hotKeys surfaces the heavy hitter") {
    val left = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong % 7 else 999L, s"l$i"))
      .toDF("k", "lv")
    val hot = SkewJoin.hotKeys(left, col("k"), minCount = 1000)
      .collect().map(_.getLong(0))
    assert(hot.toSeq === Seq(999L))
  }

  test("bucketed tables join without a shuffle (co-located join)") {
    val o = Tables.t(spark, SparkTestSession.sfDir, "orders")
    val l = Tables.t(spark, SparkTestSession.sfDir, "lineitem")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_b")
    l.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("lineitem_b")
    // disable broadcast so the co-location is what avoids the shuffle
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("orders_b").join(spark.table("lineitem_b"),
        col("o_orderkey") === col("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      assert(joined.count() ===
        o.join(l, o("o_orderkey") === l("l_orderkey")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("appendBucketed + compactBucketed: appends preserve the layout contract; compaction restores one file per bucket") {
    import graft.sources.Bucketing
    val base = (0L until 500L).map(i => (i, s"v$i")).toDF("k", "v")
    Bucketing.writeBucketed(base, "graft_compact_t", "k", 4)
    // three appends → up to 4 new files each
    (1 to 3).foreach { b =>
      Bucketing.appendBucketed(
        (0L until 100L).map(i => (1000L * b + i, s"a$b$i")).toDF("k", "v"),
        "graft_compact_t", "k")
    }
    def files(): Int = {
      val meta = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier("graft_compact_t"))
      val p = new org.apache.hadoop.fs.Path(meta.location)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(p).count(s => s.getPath.getName.startsWith("part-"))
    }
    val before = spark.table("graft_compact_t").collect().map(_.toString).sorted
    assert(files() > 4, s"appends should add files, saw ${files()}")
    Bucketing.compactBucketed(spark, "graft_compact_t")
    assert(files() === 4, s"compaction should leave one file per bucket, saw ${files()}")
    val after = spark.table("graft_compact_t").collect().map(_.toString).sorted
    assert(after === before, "compaction must not change table contents")
    // bucket spec survives the swap: metadata still says 4 buckets on k
    val spec = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier("graft_compact_t")).bucketSpec
    assert(spec.exists(s => s.numBuckets == 4 && s.bucketColumnNames == Seq("k")))
    // crash recovery: simulate dying between DROP and RENAME — the
    // rewrite exists under the compact-tagged tmp, the original name
    // is gone; re-running compactBucketed must complete the swap
    Bucketing.writeBucketed(spark.table("graft_compact_t"),
      "graft_compact_t__rw_compact", "k", 4)
    spark.sql("DROP TABLE graft_compact_t")
    // a DIFFERENT operation must refuse to adopt the compact tmp: a
    // purge completing a compaction's swap would skip its anti-join
    // yet report success
    intercept[IllegalArgumentException] {
      Bucketing.rewriteBucketed(spark, "graft_compact_t", identity, tag = "purge")
    }
    Bucketing.compactBucketed(spark, "graft_compact_t")
    val recovered = spark.table("graft_compact_t").collect().map(_.toString).sorted
    assert(recovered === after, "recovery swap must restore the full table")
    spark.sql("DROP TABLE IF EXISTS graft_compact_t")
  }

  test("maybeCompactBucketed: files-per-bucket trigger fires above the threshold, " +
      "no-ops below it, preserves contents") {
    import graft.sources.Bucketing
    val base = (0L until 200L).map(i => (i, s"v$i")).toDF("k", "v")
    Bucketing.writeBucketed(base, "graft_autocompact_t", "k", 4)
    try {
      // 1 file/bucket: below any threshold ≥ 1 → no-op
      assert(!Bucketing.maybeCompactBucketed(spark, "graft_autocompact_t", 2))
      assert(Bucketing.dataFileCount(spark, "graft_autocompact_t") === 4L)
      // two appends → up to 12 files total; threshold 2 → 12 > 8 fires
      (1 to 2).foreach { b =>
        Bucketing.appendBucketed(
          (0L until 40L).map(i => (1000L * b + i, s"a$b$i")).toDF("k", "v"),
          "graft_autocompact_t", "k")
      }
      val before = spark.table("graft_autocompact_t").collect().map(_.toString).sorted
      assert(Bucketing.dataFileCount(spark, "graft_autocompact_t") > 8L)
      assert(Bucketing.maybeCompactBucketed(spark, "graft_autocompact_t", 2))
      assert(Bucketing.dataFileCount(spark, "graft_autocompact_t") === 4L,
        "trigger must restore one file per bucket")
      val after = spark.table("graft_autocompact_t").collect().map(_.toString).sorted
      assert(after === before, "auto-compaction must not change table contents")
      // idempotent: immediately re-checking does not fire again
      assert(!Bucketing.maybeCompactBucketed(spark, "graft_autocompact_t", 2))
      // disabled and missing-table paths are inert
      assert(!Bucketing.maybeCompactBucketed(spark, "graft_autocompact_t", 0))
      assert(!Bucketing.maybeCompactBucketed(spark, "graft_no_such_table", 2))
    } finally spark.sql("DROP TABLE IF EXISTS graft_autocompact_t")
  }

  test("write-back sink: slot-bucketed partitioned parquet round-trips (replacekeysvalues shape)") {
    val out = java.nio.file.Files.createTempDirectory("graft-sink").toString
    val orders = Tables.t(spark, SparkTestSession.sfDir, "orders")
      .select(concat(lit("order:"), col("o_orderkey")).as("key"),
        upper(col("o_orderpriority")).as("value"))
      .withColumn("bucket", (crc16_slot(col("key")) % 16).cast("int"))
    orders.write.mode("overwrite").partitionBy("bucket").parquet(out)

    val back = spark.read.parquet(out)
    assert(back.count() === orders.count())
    // partition pruning: reading one bucket scans only that directory
    val one = back.filter(col("bucket") === 3)
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(bucket"), plan)
    val expected = orders.filter(col("bucket") === 3).count()
    assert(one.count() === expected)
  }
}
