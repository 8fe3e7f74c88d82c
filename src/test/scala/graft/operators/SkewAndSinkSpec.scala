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

  test("bucketed tables join without a shuffle (co-located join), through the versioned views") {
    import graft.sources.Bucketing
    val o = Tables.t(spark, SparkTestSession.sfDir, "orders")
    val l = Tables.t(spark, SparkTestSession.sfDir, "lineitem")
    // through the module API: the logical names are VIEWS over
    // versioned physical tables — the Exchange-free plan must survive
    // the view indirection (the bucket spec is a property of the
    // resolved physical relation)
    Bucketing.writeBucketed(o, "orders_b", "o_orderkey", 8)
    Bucketing.writeBucketed(l, "lineitem_b", "l_orderkey", 8)
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
      Bucketing.dropLogical(spark, "orders_b")
      Bucketing.dropLogical(spark, "lineitem_b")
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
    def files(): Long = Bucketing.dataFileCount(spark, "graft_compact_t")
    val before = spark.table("graft_compact_t").collect().map(_.toString).sorted
    assert(files() > 4, s"appends should add files, saw ${files()}")
    // the stale-reader hazard compaction used to carry (found by the
    // stream_ingest_read_lat probe): ANOTHER session caches the
    // relation, then maintenance rewrites the table. Under the
    // versioned-view layout the rewrite lands as a new version and
    // the old files survive as the grace predecessor — the second
    // session must keep working before AND after its re-resolution.
    val s2 = spark.newSession()
    assert(s2.table("graft_compact_t").count() === 800L) // cache the relation
    Bucketing.compactBucketed(spark, "graft_compact_t")
    assert(files() === 4, s"compaction should leave one file per bucket, saw ${files()}")
    val after = spark.table("graft_compact_t").collect().map(_.toString).sorted
    assert(after === before, "compaction must not change table contents")
    assert(s2.table("graft_compact_t").count() === 800L,
      "a second session must survive a compaction it did not run")
    // bucket spec survives the rewrite (resolved through the view)
    val spec = Bucketing.bucketSpecOf(spark, "graft_compact_t")
    assert(spec.exists(s => s.numBuckets == 4 && s.bucketColumnNames == Seq("k")))
    // crash recovery 1: a rewrite that died AFTER writing the next
    // version but BEFORE the view flip leaves an unreferenced orphan;
    // the next compaction clears it and re-runs from the still-current
    // version — contents are what the crashed rewrite would have made
    val (curPhys, curV) = Bucketing.currentPhys(spark, "graft_compact_t").get
    (0L until 7L).map(i => (i, s"garbage$i")).toDF("k", "v")
      .write.format("parquet").bucketBy(4, "k").sortBy("k")
      .saveAsTable(s"graft_compact_t__v${curV + 1}")
    Bucketing.compactBucketed(spark, "graft_compact_t")
    val recovered = spark.table("graft_compact_t").collect().map(_.toString).sorted
    assert(recovered === after, "recovery must ignore the orphan version's rows")
    // crash recovery 2: the view itself lost (crash between a legacy
    // drop and the first flip) — the next Bucketing-API touch
    // re-points the view at the max version and the table answers again
    spark.sql("DROP VIEW graft_compact_t")
    assert(Bucketing.currentPhys(spark, "graft_compact_t").isDefined)
    assert(spark.table("graft_compact_t").collect().map(_.toString).sorted === after)
    // grace window: current and previous versions exist, older are
    // vacuumed (curPhys from before the compaction is the predecessor)
    val cat = spark.sessionState.catalog
    val (nowPhys, nowV) = Bucketing.currentPhys(spark, "graft_compact_t").get
    assert(nowV === curV + 1)
    assert(cat.tableExists(org.apache.spark.sql.catalyst.TableIdentifier(curPhys)),
      "grace predecessor must survive one rewrite")
    Bucketing.compactBucketed(spark, "graft_compact_t")
    assert(!cat.tableExists(org.apache.spark.sql.catalyst.TableIdentifier(curPhys)),
      "second rewrite must vacuum the now two-generations-old version")
    assert(cat.tableExists(org.apache.spark.sql.catalyst.TableIdentifier(nowPhys)))
    Bucketing.dropLogical(spark, "graft_compact_t")
    assert(!spark.catalog.tableExists("graft_compact_t"))
    assert(spark.catalog.listTables().collect()
      .forall(t => !t.name.startsWith("graft_compact_t__v")),
      "dropLogical must remove every physical version")
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
    } finally Bucketing.dropLogical(spark, "graft_autocompact_t")
  }

  test("a concurrent reader THREAD survives repeated compactions (graceVersions=2)") {
    import graft.sources.Bucketing
    // True concurrency, not resolve-then-compact-then-read: a reader
    // loop on another thread races three compaction rewrites. With
    // graceVersions=2 every plan the reader could hold spans at most
    // two rewrites before its version is vacuumed — the knob's
    // contract: grace >= the number of rewrites a reader can overlap.
    val base = (0L until 800L).map(i => (i, s"v$i")).toDF("k", "v")
    Bucketing.writeBucketed(base, "graft_conc_t", "k", 4)
    val reader = spark.newSession()
    reader.conf.set("spark.graft.bucketing.graceVersions", "2")
    spark.conf.set("spark.graft.bucketing.graceVersions", "2")
    try {
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      val bad = new java.util.concurrent.atomic.AtomicReference[Throwable](null)
      val reads = new java.util.concurrent.atomic.AtomicInteger(0)
      val t = new Thread(() => {
        try {
          while (!stop.get()) {
            assert(reader.table("graft_conc_t").count() === 800L)
            reads.incrementAndGet(); ()
          }
        } catch { case e: Throwable => bad.set(e) }
      })
      t.start()
      (1 to 3).foreach { _ =>
        Bucketing.compactBucketed(spark, "graft_conc_t")
        Thread.sleep(150) // let the reader overlap each new version
      }
      stop.set(true); t.join(30000)
      assert(bad.get() == null,
        s"concurrent reader failed across compactions: ${bad.get()}")
      assert(reads.get() > 0, "reader thread never completed a read")
      assert(spark.table("graft_conc_t").count() === 800L)
    } finally {
      spark.conf.unset("spark.graft.bucketing.graceVersions")
      Bucketing.dropLogical(spark, "graft_conc_t")
    }
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
