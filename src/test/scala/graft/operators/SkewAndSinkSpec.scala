package graft.operators

import scala.jdk.CollectionConverters._

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
    // graceVersions is read by the session RUNNING THE MAINTENANCE
    // (vacuum happens on the writer) — setting it on the reader
    // session would have no effect
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

  test("compactBucketedPartial: small segments merge, the big cold segment carries BY REFERENCE (same physical path, zero bytes moved); content ≡ full compaction") {
    import graft.sources.Bucketing
    // big base segment: the tier rule must keep it cold (3 tiny appends
    // can't pay for merging a 100×-bigger segment)
    val base = (0L until 40000L).map(i => (i, s"v$i")).toDF("k", "v")
    Bucketing.writeBucketed(base, "graft_partial_t", "k", 4)
    try {
      def manifest(): Map[String, String] = {
        val (phys, _) = Bucketing.currentPhys(spark, "graft_partial_t").get
        spark.sessionState.catalog
          .listPartitions(org.apache.spark.sql.catalyst.TableIdentifier(phys))
          .map(p => (p.spec("_graft_seg"), p.location.toString)).toMap
      }
      val baseSeg = manifest()
      assert(baseSeg.size === 1)
      val (baseName, baseLoc) = baseSeg.head
      def dirBytes(loc: String): Long = {
        val p = new org.apache.hadoop.fs.Path(loc)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.listStatus(p).collect {
          case s if s.isFile && !s.getPath.getName.startsWith("_") => s.getLen
        }.sum
      }
      val baseModTime = {
        val p = new org.apache.hadoop.fs.Path(baseLoc)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.listStatus(p).map(_.getModificationTime).max
      }
      // skewed appends: one repeated key → 3 tiny single-file segments
      (1 to 3).foreach { b =>
        Bucketing.appendBucketed(
          (0L until 20L).map(i => (42L, s"hot$b$i")).toDF("k", "v"),
          "graft_partial_t", "k")
      }
      val before = spark.table("graft_partial_t").collect().map(_.toString).sorted
      assert(Bucketing.segmentCount(spark, "graft_partial_t") === 4)
      assert(Bucketing.dataFileCount(spark, "graft_partial_t") === 7L) // 4 + 3 hot
      // below-threshold → no-op; above → segment merge
      assert(!Bucketing.compactBucketedPartial(spark, "graft_partial_t", 8))
      assert(Bucketing.compactBucketedPartial(spark, "graft_partial_t", 2))
      val after = spark.table("graft_partial_t").collect().map(_.toString).sorted
      assert(after === before, "partial compaction must equal full compaction content")
      // [base(4 files) by reference] + [merged appends (1 file, one key)]
      assert(Bucketing.dataFileCount(spark, "graft_partial_t") === 5L)
      val m2 = manifest()
      assert(m2.size === 2)
      // THE manifest pin: the cold segment is the SAME PHYSICAL PATH in
      // the new version — referenced, not copied
      assert(m2.get(baseName).contains(baseLoc),
        s"cold segment must carry by reference: $m2")
      val p2 = new org.apache.hadoop.fs.Path(baseLoc)
      val fs2 = p2.getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(fs2.listStatus(p2).map(_.getModificationTime).max === baseModTime,
        "cold segment files must be untouched by the flip")
      // bytes written by the flip ≈ the merged (tiny) segments only —
      // the O(table) carry-over copy is gone
      val mergedLoc = (m2 - baseName).values.head
      assert(dirBytes(mergedLoc) < dirBytes(baseLoc) / 10,
        s"merge wrote ${dirBytes(mergedLoc)}B vs cold ${dirBytes(baseLoc)}B — " +
          "bytes-per-flip must track the hot segments, not the table")
      // bucketed-join contract survives a partial rewrite
      assert(Bucketing.bucketSpecOf(spark, "graft_partial_t")
        .exists(s => s.numBuckets == 4 && s.bucketColumnNames == Seq("k")))
      // a THIRD version still shares the same cold path (≥3-version pin)
      Bucketing.appendBucketed(
        (0L until 20L).map(i => (43L, s"x$i")).toDF("k", "v"),
        "graft_partial_t", "k")
      Bucketing.appendBucketed(
        (0L until 20L).map(i => (44L, s"y$i")).toDF("k", "v"),
        "graft_partial_t", "k")
      assert(Bucketing.compactBucketedPartial(spark, "graft_partial_t", 2))
      assert(manifest().get(baseName).contains(baseLoc),
        "cold segment must stay shared across ≥3 versions")
    } finally Bucketing.dropLogical(spark, "graft_partial_t")
  }

  test("maybeCompactBucketedAsync: the trigger never rewrites inline — enqueue, keep appending, finalize carries the delta") {
    import graft.sources.Bucketing
    val base = (0L until 400L).map(i => (i, s"v$i")).toDF("k", "v")
    Bucketing.writeBucketed(base, "graft_async_t", "k", 4)
    try {
      (1 to 3).foreach { b =>
        Bucketing.appendBucketed(
          (0L until 80L).map(i => (1000L * b + i, s"a$b$i")).toDF("k", "v"),
          "graft_async_t", "k")
      }
      val (_, v0) = Bucketing.currentPhys(spark, "graft_async_t").get
      // trip the trigger: ENQUEUES and returns immediately — no flip yet
      assert(!Bucketing.maybeCompactBucketedAsync(spark, "graft_async_t", 2))
      assert(Bucketing.pendingMaintenance("graft_async_t"))
      assert(Bucketing.currentPhys(spark, "graft_async_t").get._2 === v0,
        "enqueue must not flip the view")
      // the ingest loop keeps appending WHILE the background compaction
      // runs — these rows are the delta the finalize must carry over
      Bucketing.appendBucketed(
        (0L until 50L).map(i => (9000L + i, s"delta$i")).toDF("k", "v"),
        "graft_async_t", "k")
      assert(Bucketing.awaitMaintenance("graft_async_t"))
      // next trigger call (next batch, same writer thread) finalizes
      assert(Bucketing.maybeCompactBucketedAsync(spark, "graft_async_t", 2))
      assert(!Bucketing.pendingMaintenance("graft_async_t"))
      assert(Bucketing.currentPhys(spark, "graft_async_t").get._2 === v0 + 1)
      assert(spark.table("graft_async_t").count() === 400L + 240L + 50L,
        "delta rows appended during the background write must survive the flip")
      assert(spark.table("graft_async_t")
        .filter(col("k") >= 9000L).count() === 50L)
      // compacted: 4 rewritten/carried + ≤4 delta files
      assert(Bucketing.dataFileCount(spark, "graft_async_t") <= 8L)
      // quiet table: no re-trigger
      assert(!Bucketing.maybeCompactBucketedAsync(spark, "graft_async_t", 2))
    } finally Bucketing.dropLogical(spark, "graft_async_t")
  }

  test("CAS flip: a rewrite that lost the race fails loudly instead of silently dropping the winner's update") {
    import graft.sources.Bucketing
    val base = (0L until 200L).map(i => (i, s"v$i")).toDF("k", "v")
    Bucketing.writeBucketed(base, "graft_cas_t", "k", 4)
    try {
      val before = spark.table("graft_cas_t").collect().map(_.toString).sorted
      val (_, v0) = Bucketing.currentPhys(spark, "graft_cas_t").get
      val aHoldsLock = new java.util.concurrent.CountDownLatch(1)
      val go = new java.util.concurrent.CountDownLatch(1)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      // A enters the rewrite and parks INSIDE it (holding the table
      // lock); B then enters, reads the same version, and blocks on the
      // lock — the textbook two-writer race, made deterministic
      val tA = new Thread(() => {
        try Bucketing.rewriteBucketed(spark, "graft_cas_t", { df =>
          aHoldsLock.countDown(); go.await(); df
        })
        catch { case e: Throwable => errs.add(e); () }
      })
      val tB = new Thread(() => {
        try Bucketing.rewriteBucketed(spark, "graft_cas_t", identity)
        catch { case e: Throwable => errs.add(e); () }
      })
      tA.start(); aHoldsLock.await()
      tB.start(); Thread.sleep(500) // B reads v0, parks on the table lock
      go.countDown()
      tA.join(60000); tB.join(60000)
      val (_, v1) = Bucketing.currentPhys(spark, "graft_cas_t").get
      // contract: every completed rewrite advanced the version exactly
      // once; a writer that would have overwritten a foreign flip threw
      assert(errs.size() + (v1 - v0) === 2,
        s"two writers, v$v0->v$v1, ${errs.size()} threw: lost update?")
      assert(errs.asScala.forall(
        _.isInstanceOf[java.util.ConcurrentModificationException]),
        s"unexpected failure kind: ${errs.asScala.map(_.toString)}")
      assert(errs.size() === 1, "the second writer should have lost the CAS")
      assert(spark.table("graft_cas_t").collect().map(_.toString).sorted === before)
    } finally Bucketing.dropLogical(spark, "graft_cas_t")
  }

  test("vacuumRetainMs: superseded versions survive rapid compactions while the time window covers them; vacuum reclaims after") {
    import graft.sources.Bucketing
    val cat = spark.sessionState.catalog
    def onDisk(): Seq[String] = spark.catalog.listTables().collect()
      .map(_.name).filter(_.startsWith("graft_retain_t__v")).toSeq.sorted
    val base = (0L until 100L).map(i => (i, s"v$i")).toDF("k", "v")
    spark.conf.set("spark.graft.bucketing.graceVersions", "0")
    spark.conf.set("spark.graft.bucketing.vacuumRetainMs", "600000")
    try {
      Bucketing.writeBucketed(base, "graft_retain_t", "k", 2)
      // three rapid compactions: count-grace is ZERO, yet every
      // superseded version is younger than the retain window → kept
      (1 to 3).foreach(_ => Bucketing.compactBucketed(spark, "graft_retain_t"))
      assert(onDisk().size === 4,
        s"retainMs must keep recently-superseded versions, saw ${onDisk()}")
      assert(spark.table("graft_retain_t").count() === 100L)
      // window elapses → the next rewrite's vacuum reclaims them
      spark.conf.set("spark.graft.bucketing.vacuumRetainMs", "1")
      Thread.sleep(50)
      Bucketing.compactBucketed(spark, "graft_retain_t")
      assert(onDisk().size === 1,
        s"expired versions must vacuum (grace 0), saw ${onDisk()}")
    } finally {
      spark.conf.unset("spark.graft.bucketing.graceVersions")
      spark.conf.unset("spark.graft.bucketing.vacuumRetainMs")
      Bucketing.dropLogical(spark, "graft_retain_t")
    }
  }

  test("purgeTombstoned physically removes rows NOW: no grace predecessor retains them after the markers drop") {
    import graft.sources.Bucketing
    val rows = (0L until 300L).map(i => (i, s"v$i")).toDF("id", "v")
    Bucketing.writeBucketed(rows, "graft_purge_t", "id", 4)
    try {
      Bucketing.appendTombstones(
        (0L until 300L by 3).map(Tuple1(_)).toDF("id"), "graft_purge")
      assert(Bucketing.minusTombstones(
        spark.table("graft_purge_t"), "graft_purge").count() === 200L)
      Bucketing.purgeTombstoned(spark, "graft_purge", Seq("graft_purge_t"))
      assert(spark.table("graft_purge_t").count() === 200L)
      assert(!spark.catalog.tableExists("graft_purge_tombstones"),
        "markers must drop with the purge")
      // THE advice-item pin: no pre-purge version may outlive the
      // marker drop — a reader resolving a retained predecessor would
      // see the deleted rows resurface with nothing excluding them
      val vs = spark.catalog.listTables().collect().map(_.name)
        .filter(_.startsWith("graft_purge_t__v")).toSeq
      assert(vs.size === 1,
        s"purge must vacuum every pre-purge version immediately, saw $vs")
    } finally Bucketing.dropLogical(spark, "graft_purge_t")
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
