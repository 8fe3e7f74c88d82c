package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.operators.{Dedup, Similarity}

/** Cross-table atomic epochs: the one-commit-point layer for
  * multi-table indexes (Bucketing.rebuildEpoch), and the racing-reader
  * guarantees it buys requantizeAnnIndex and writeMinhashIndex. */
class EpochSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("rebuildEpoch: flip is the commit point; crashed build leaves the old generation serving; older generations sweep") {
    import graft.sources.Bucketing
    val members = Seq("a", "b")
    def writeGen(nameOf: String => String, tag: String): Unit = members.foreach {
      m => Bucketing.writeSmallTable(Seq((1L, tag)).toDF("id", "v"), nameOf(m))
    }
    try {
      // epoch 0 = flat names
      writeGen(m => s"graft_ep_t_$m", "flat")
      assert(Bucketing.currentEpoch(spark, "graft_ep_t") === 0)
      assert(Bucketing.epochMember(spark, "graft_ep_t", "a") === "graft_ep_t_a")
      // a CRASH mid-build (build throws after writing one member) must
      // leave the epoch untouched and readers on the old generation
      intercept[RuntimeException] {
        Bucketing.rebuildEpoch(spark, "graft_ep_t", members) { nameOf =>
          Bucketing.writeSmallTable(Seq((1L, "halfg1")).toDF("id", "v"), nameOf("a"))
          throw new RuntimeException("planted build crash")
        }
      }
      assert(Bucketing.currentEpoch(spark, "graft_ep_t") === 0)
      assert(spark.table(Bucketing.epochMember(spark, "graft_ep_t", "a"))
        .collect()(0).getString(1) === "flat")
      // the real rebuild: g1 commits atomically (orphan re-dropped)
      Bucketing.rebuildEpoch(spark, "graft_ep_t", members)(writeGen(_, "g1"))
      assert(Bucketing.currentEpoch(spark, "graft_ep_t") === 1)
      assert(Bucketing.epochMember(spark, "graft_ep_t", "a") === "graft_ep_t_a_g1")
      assert(spark.table("graft_ep_t_a_g1").collect()(0).getString(1) === "g1")
      // grace: the flat generation is still on disk for in-flight readers
      assert(spark.catalog.tableExists("graft_ep_t_a"))
      // second rebuild: g2 commits, flat (two generations back) sweeps,
      // g1 is the retained grace predecessor
      Bucketing.rebuildEpoch(spark, "graft_ep_t", members)(writeGen(_, "g2"))
      assert(Bucketing.currentEpoch(spark, "graft_ep_t") === 2)
      assert(!spark.catalog.tableExists("graft_ep_t_a"),
        "the flat generation must sweep once two rebuilds have passed")
      assert(spark.catalog.tableExists("graft_ep_t_a_g1"))
      // third: g1 sweeps
      Bucketing.rebuildEpoch(spark, "graft_ep_t", members)(writeGen(_, "g3"))
      assert(!spark.catalog.tableExists("graft_ep_t_a_g1"))
      assert(spark.table(Bucketing.epochMember(spark, "graft_ep_t", "b"))
        .collect()(0).getString(1) === "g3")
    } finally Bucketing.dropEpochGroup(spark, "graft_ep_t", members)
    assert(!spark.catalog.tableExists("graft_ep_t_epoch"))
  }

  test("epoch.graceGenerations=2: a reader pinned to generation g keeps its tables through TWO rebuilds; the third sweeps it") {
    import graft.sources.Bucketing
    val members = Seq("a")
    def writeGen(nameOf: String => String, tag: String): Unit = members.foreach {
      m => Bucketing.writeSmallTable(Seq((1L, tag)).toDF("id", "v"), nameOf(m))
    }
    spark.conf.set("spark.graft.epoch.graceGenerations", "2")
    try {
      Bucketing.rebuildEpoch(spark, "graft_ep_gr", members)(writeGen(_, "g1"))
      // a slow reader resolves its member names NOW (generation 1)
      val pinned = Bucketing.epochMember(spark, "graft_ep_gr", "a")
      assert(pinned === "graft_ep_gr_a_g1")
      // two rebuilds pass while the reader is still running
      Bucketing.rebuildEpoch(spark, "graft_ep_gr", members)(writeGen(_, "g2"))
      Bucketing.rebuildEpoch(spark, "graft_ep_gr", members)(writeGen(_, "g3"))
      assert(spark.catalog.tableExists(pinned),
        "generation g must survive two rebuilds under graceGenerations=2")
      assert(spark.table(pinned).collect()(0).getString(1) === "g1")
      // the third rebuild pushes g1 out of the window
      Bucketing.rebuildEpoch(spark, "graft_ep_gr", members)(writeGen(_, "g4"))
      assert(!spark.catalog.tableExists(pinned))
      assert(spark.catalog.tableExists("graft_ep_gr_a_g2"),
        "g2 and g3 are the retained window at generation 4")
    } finally {
      spark.conf.unset("spark.graft.epoch.graceGenerations")
      Bucketing.dropEpochGroup(spark, "graft_ep_gr", members)
    }
  }

  test("Graft.info epoch section: base → generation + members; a crashed rebuild's next-generation orphan is reported") {
    import graft.sources.Bucketing
    val members = Seq("x", "y")
    def writeGen(nameOf: String => String, tag: String): Unit = members.foreach {
      m => Bucketing.writeSmallTable(Seq((1L, tag)).toDF("id", "v"), nameOf(m))
    }
    try {
      Bucketing.rebuildEpoch(spark, "graft_ep_info", members)(writeGen(_, "g1"))
      def epochRow(): String = graft.Graft.info(spark)
        .filter(col("section") === "epoch" && col("key") === "graft_ep_info")
        .collect()(0).getString(2)
      assert(epochRow() === "g1 (members: x,y)")
      // simulated crash: a rebuild wrote one g2 member, then died
      // before the flip — info must report the orphan, not adopt it
      Bucketing.writeSmallTable(Seq((1L, "halfg2")).toDF("id", "v"),
        "graft_ep_info_x_g2")
      assert(epochRow() === "g1 (members: x,y; orphans: x_g2)")
      Bucketing.dropLogical(spark, "graft_ep_info_x_g2")
      assert(epochRow() === "g1 (members: x,y)")
    } finally Bucketing.dropEpochGroup(spark, "graft_ep_info", members)
  }

  test("requantizeAnnIndex racing a reader: every resolution sees one generation — all-old or all-new, never a mixed quantizer/codes pair") {
    def mkEmbs(shift: Double, extra: Boolean) = {
      val base = (0L until 120L).map(i =>
        (i, (0 until 32).map(d => shift + math.sin(i * 32 + d)).toArray))
      val drifted = if (extra) (1000L until 1120L).map(i =>
        (i, (0 until 32).map(d => 6.0 + math.sin(i * 32 + d)).toArray)) else Nil
      (base ++ drifted).toDF("vec_id", "embedding")
    }
    val corpusA = mkEmbs(0.0, extra = false)
    val corpusB = mkEmbs(0.0, extra = true)
    val queries = corpusA.filter(col("vec_id") < 8)
    // adist INCLUDED: distances are quantizer-specific, so a mixed
    // read (new centroids routing into old codes, or ADC over the
    // wrong codebooks) surfaces as a distance no pure generation emits
    def answers(t: String): Set[(Long, Long, Long, Double)] =
      Similarity.annIndexTopK(queries, t, topk = 3, nprobe = 8)
        .collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    try {
      // expected pure-generation answers: requantize ≡ fresh build
      // (the r13 determinism law), so fresh A/B indexes define them
      Similarity.writeAnnIndex(corpusA, "graft_epx_a", buckets = 4, refineIters = 3)
      Similarity.writeAnnIndex(corpusB, "graft_epx_b", buckets = 4, refineIters = 3)
      val expectA = answers("graft_epx_a")
      val expectB = answers("graft_epx_b")
      assert(expectA !== expectB, "fixture must distinguish the generations")

      Similarity.writeAnnIndex(corpusA, "graft_epx", buckets = 4, refineIters = 3)
      val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      val reader = new Thread(() => {
        while (!stop.get()) {
          try {
            val a = answers("graft_epx")
            if (a == expectA) seen.add("A")
            else if (a == expectB) seen.add("B")
            else seen.add(s"MIXED:$a")
          } catch { case t: Throwable => errs.add(t) }
        }
      })
      reader.start()
      try {
        // alternate the corpus so every rebuild CHANGES the quantizer:
        // a reader pairing new centroids with old codes would score
        // distances no pure generation produces
        for (i <- 0 until 4) {
          val c = if (i % 2 == 0) corpusB else corpusA
          Similarity.requantizeAnnIndex(c, "graft_epx", refineIters = 3)
        }
      } finally { stop.set(true); reader.join(60000) }
      assert(errs.isEmpty, s"reader errors during requantize: ${errs.asScala.map(_.toString).take(3)}")
      val kinds = seen.asScala.toSeq
      assert(kinds.nonEmpty, "reader never completed a query")
      assert(kinds.forall(k => k == "A" || k == "B"),
        s"mixed-generation read observed: ${kinds.filterNot(Set("A", "B")).take(2)}")
    } finally {
      graft.sources.Bucketing.dropEpochGroup(spark, "graft_epx",
        Seq("centroids", "codebooks", "codes"))
      graft.sources.Bucketing.dropEpochGroup(spark, "graft_epx_a",
        Seq("centroids", "codebooks", "codes"))
      graft.sources.Bucketing.dropEpochGroup(spark, "graft_epx_b",
        Seq("centroids", "codebooks", "codes"))
    }
  }

  test("writeMinhashIndex REBUILD racing a reader: the band+shingle pair resolves as one generation") {
    def mix(z0: Long): Long = {
      var z = z0 * 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    def text(id: Long, vocab: Long): String = (0 until 30).map(j =>
      "w" + java.lang.Long.remainderUnsigned(mix(id * 30 + j), vocab)).mkString(" ")
    // generation A indexes docs 0..99; generation B indexes 100..199
    // (same vocab → same banding params, different contents)
    val corpusA = (0L until 100L).map(i => (i, text(i, 200L))).toDF("doc_id", "text")
    val corpusB = (100L until 200L).map(i => (i, text(i, 200L))).toDF("doc_id", "text")
    // probes: exact copies of docs from BOTH generations, so the
    // answer identifies which generation served the query
    val probes = (Seq((9000L, text(7L, 200L)), (9001L, text(107L, 200L))))
      .toDF("doc_id", "text")
    def answers(): Set[(Long, Long)] =
      Dedup.indexedNearDupPairs(probes, "graft_epm", threshold = 0.9)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    try {
      Dedup.writeMinhashIndex(corpusA, "graft_epm", buckets = 8)
      val expectA = answers()
      Dedup.writeMinhashIndex(corpusB, "graft_epm", buckets = 8) // first rebuild → g1
      assert(graft.sources.Bucketing.currentEpoch(spark, "graft_epm") === 1)
      val expectB = answers()
      assert(expectA === Set((9000L, 7L)) && expectB === Set((9001L, 107L)),
        s"fixture: A=$expectA B=$expectB")
      val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      val reader = new Thread(() => {
        while (!stop.get()) {
          try {
            val a = answers()
            if (a == expectA) seen.add("A")
            else if (a == expectB) seen.add("B")
            else seen.add(s"MIXED:$a")
          } catch { case t: Throwable => errs.add(t) }
        }
      })
      reader.start()
      try {
        for (i <- 0 until 4) {
          Dedup.writeMinhashIndex(if (i % 2 == 0) corpusA else corpusB,
            "graft_epm", buckets = 8)
        }
      } finally { stop.set(true); reader.join(60000) }
      assert(errs.isEmpty, s"reader errors during rebuild: ${errs.asScala.map(_.toString).take(3)}")
      val kinds = seen.asScala.toSeq
      assert(kinds.nonEmpty && kinds.forall(k => k == "A" || k == "B"),
        s"mixed-generation minhash read: ${kinds.filterNot(Set("A", "B")).take(2)}")
    } finally graft.sources.Bucketing.dropEpochGroup(spark, "graft_epm",
      Seq("bands", "shingles"))
  }

  test("finalizeMaintenance: a finished background compaction flips on quiesce instead of stranding; info surfaces the pending window") {
    import graft.sources.Bucketing
    val base = (0L until 400L).map(i => (i, s"v$i")).toDF("k", "v")
    Bucketing.writeBucketed(base, "graft_fin_t", "k", 4)
    try {
      (1 to 3).foreach { b =>
        Bucketing.appendBucketed(
          (0L until 40L).map(i => (1000L * b + i, s"a$b$i")).toDF("k", "v"),
          "graft_fin_t", "k")
      }
      val (_, v0) = Bucketing.currentPhys(spark, "graft_fin_t").get
      assert(!Bucketing.maybeCompactBucketedAsync(spark, "graft_fin_t", 2)) // enqueue
      assert(Bucketing.pendingMaintenance("graft_fin_t"))
      // the ops surface: info reports the pending window
      assert(graft.Graft.info(spark)
        .filter(col("section") === "maintenance" && col("key") === "graft_fin_t")
        .count() === 1L)
      // quiesce WITHOUT another trigger call: finalize flips now
      assert(Bucketing.finalizeMaintenance(spark, "graft_fin_t"))
      assert(!Bucketing.pendingMaintenance("graft_fin_t"))
      assert(Bucketing.currentPhys(spark, "graft_fin_t").get._2 === v0 + 1)
      assert(spark.table("graft_fin_t").count() === 400L + 120L)
      // idempotent: nothing pending → no-op
      assert(!Bucketing.finalizeMaintenance(spark, "graft_fin_t"))
    } finally Bucketing.dropLogical(spark, "graft_fin_t")
  }

  test("segment vacuum by refcount: a shared cold segment survives until NO retained version references it; orphan segment dirs sweep") {
    import graft.sources.Bucketing
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val base = (0L until 4000L).map(i => (i, s"v$i")).toDF("k", "v")
    Bucketing.writeBucketed(base, "graft_ref_t", "k", 4)
    try {
      (1 to 3).foreach { b =>
        Bucketing.appendBucketed(
          (0L until 20L).map(i => (42L, s"h$b$i")).toDF("k", "v"),
          "graft_ref_t", "k")
      }
      val dataDir = new org.apache.hadoop.fs.Path(wh, "graft_ref_t__data")
      val fs = dataDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      def segDirs(): Set[String] =
        fs.listStatus(dataDir).filter(_.isDirectory).map(_.getPath.getName).toSet
      val before = segDirs()
      assert(before.size === 4)
      // an ORPHAN segment dir (crashed writer of a dead process): swept
      // by the next maintenance's refcount pass
      fs.mkdirs(new org.apache.hadoop.fs.Path(dataDir, "seg_orphan_dead"))
      // merge the 3 small appends (grace keeps v1 referencing them)
      assert(Bucketing.compactBucketedPartial(spark, "graft_ref_t", 2))
      val mid = segDirs()
      assert(!mid.contains("seg_orphan_dead"), "orphan dir must sweep")
      assert(before.subsetOf(mid),
        "grace-retained v1 still references the pre-merge segments")
      // one more rewrite: v1 vacuums, the merged-away appends' segments
      // lose their last reference and sweep; the big base segment is
      // still referenced (by v2's and v3's manifests) and survives
      Bucketing.compactBucketed(spark, "graft_ref_t")
      assert(spark.table("graft_ref_t").count() === 4000L + 60L)
      Bucketing.compactBucketed(spark, "graft_ref_t")
      val after = segDirs()
      assert((before -- after).size >= 3,
        s"append segments must reclaim once unreferenced: before=$before after=$after")
    } finally Bucketing.dropLogical(spark, "graft_ref_t")
  }
}
