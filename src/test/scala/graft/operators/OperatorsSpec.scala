package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Dedup / similarity / text operators on small synthetic corpora with planted duplicates. */
class OperatorsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val docs = {
    val base = "the quick brown fox jumps over the lazy dog again and again until done"
    val near = "the quick brown fox jumps over the lazy dog again and again until finished"
    val other1 = "completely different content about spark catalyst optimizer internals here now"
    val other2 = "yet another unrelated document mentioning minhash banding and lsh buckets today"
    Seq(
      (0L, base), (1L, base),          // exact dups
      (2L, near),                      // near dup of 0/1
      (3L, other1), (4L, other2)
    ).toDF("doc_id", "text")
  }

  test("pcaProject: dominant component captures the planted direction") {
    val d = 8
    // variance lives on axis 2; everything else is small deterministic jitter
    val rows = (0 until 40).map { t =>
      val v = Array.tabulate(d)(i =>
        (if (i == 2) t.toDouble else 0.0) + math.sin(t * 7 + i) * 0.01)
      (t.toLong, v.toSeq)
    }
    val out = Similarity.pcaProject(rows.toDF("vec_id", "embedding"),
      k = 2, iters = 30).collect()
    assert(out.length === 40)
    val p0 = out.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val p1 = out.map(r => r.getLong(0) -> r.getDouble(2)).toMap
    def variance(xs: Iterable[Double]) = {
      val m = xs.sum / xs.size
      xs.map(x => (x - m) * (x - m)).sum / xs.size
    }
    assert(variance(p0.values) > 10 * variance(p1.values))
    // p0 is monotone in the planted coordinate (up to global sign)
    val seq = (0 until 40).map(t => p0(t.toLong))
    assert(seq.sliding(2).forall(s => s(1) >= s(0)) ||
      seq.sliding(2).forall(s => s(1) <= s(0)))
    // mergeable-summary law: fitting from two merged half-corpus
    // moment states projects identically (at the operator's rounding)
    // to the single-pass fit — the PCA-maintenance contract
    val embs = rows.toDF("vec_id", "embedding")
    val merged = Similarity.mergeMomentStates(
      Similarity.momentState(embs.filter(col("vec_id") < 20))
        .unionByName(Similarity.momentState(embs.filter(col("vec_id") >= 20))))
    val incr = Similarity.pcaProjectFromState(embs, merged, k = 2, iters = 30)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).sorted
    val full = out.map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).sorted
    assert(incr === full)
    // downdate law: (full − upper half) moment subtraction fits and
    // projects the lower half like a direct lower-half fit
    val lower = embs.filter(col("vec_id") < 20)
    val down = Similarity.subtractMomentState(Similarity.momentState(embs),
      Similarity.momentState(embs.filter(col("vec_id") >= 20)))
    val dproj = Similarity.pcaProjectFromState(lower, down, k = 2, iters = 30)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).sorted
    val direct = Similarity.pcaProject(lower, k = 2, iters = 30)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).sorted
    assert(dproj === direct)
    // whitening scales every component to unit (population) variance
    val wp0 = Similarity.pcaProject(embs, k = 2, iters = 30, whiten = true)
      .collect().map(_.getDouble(1))
    assert(math.abs(variance(wp0) - 1.0) < 0.05,
      s"whitened p0 variance ${variance(wp0)}")
    // whitening a degenerate component fails loudly: rank-1 data has
    // nothing to whiten past the first component (its deflated λ is
    // fp noise — dividing by √λ would amplify garbage)
    val rank1 = (0 until 10).map(t =>
      (t.toLong, (0 until 4).map(i => if (i == 2) t.toDouble else 0.0)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.pcaProject(rank1, k = 2, iters = 10, whiten = true).collect()
    }
    assert(e.getMessage.contains("degenerate"))
  }

  test("momentState refuses ragged-dimension input loudly (no silent Σxxᵀ corruption)") {
    val ragged = Seq(
      (0L, Seq(1.0, 2.0, 3.0)),
      (1L, Seq(4.0, 5.0, 6.0)),
      (2L, Seq(7.0, 8.0))). // one short row
      toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Similarity.momentState(ragged).collect()
    }
    assert(e.getMessage.contains("dimension") ||
      Option(e.getCause).exists(_.getMessage.contains("dimension")),
      s"expected a loud mixed-dimension failure, got: ${e.getMessage}")
  }

  test("exactDupGroups finds the planted exact duplicate") {
    val groups = Dedup.exactDupGroups(docs).collect()
    assert(groups.length === 1)
    assert(groups.head.getAs[Long]("n_copies") === 2L)
    assert(groups.head.getAs[Long]("keep_id") === 0L)
  }

  test("dropExactDups keeps one representative per content") {
    val kept = Dedup.dropExactDups(docs)
    assert(kept.count() === 4)
    assert(kept.filter(col("doc_id") === 1L).count() === 0)
  }

  test("ngramJaccardPairs finds exact and near pairs with correct jaccard") {
    val pairs = Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(p => (p._1, p._2))
    assert(pairs.map(p => (p._1, p._2)).contains((0L, 1L)))
    val exact = pairs.find(p => p._1 == 0L && p._2 == 1L).get
    assert(exact._3 === 1.0)
    assert(pairs.exists(p => p._2 == 2L && p._3 < 1.0))  // near-dup pair found
  }

  test("minhashNearDupPairs recalls the planted near-dup cluster") {
    val pairs = Dedup.minhashNearDupPairs(docs, k = 64, bands = 32, threshold = 0.5, shingleN = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))  // exact pair must always survive banding
    assert(!pairs.exists(p => p._2 == 3L || p._2 == 4L))
  }

  test("pairsFromBucketsRefined equals pairsFromBuckets when every bucket fits the cap") {
    val buckets = (0L until 120L).map(i => (i % 7, i, i % 5)).toDF("bucket", "id", "rk")
    val plain = Dedup.pairsFromBuckets(buckets, Seq("bucket"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val refined = Dedup.pairsFromBucketsRefined(buckets, Seq("bucket"), "rk")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(plain === refined)
    assert(plain.nonEmpty)
  }

  test("BucketPairsExpr generator equals the join/union formulation on small, oversized, and mixed buckets") {
    // buckets of sizes spanning the cap: 3 (small), 12 (oversized,
    // 3 rk groups), 20 (oversized, all-distinct rks -> rep star)
    val rows = (0L until 3L).map(i => (0L, i, 0L)) ++
      (10L until 22L).map(i => (1L, i, i % 3)) ++
      (50L until 70L).map(i => (2L, i, i))
    val buckets = rows.toDF("bucket", "id", "rk")
    def collectPairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val gen = collectPairs(
      Dedup.pairsFromBucketsRefined(buckets, Seq("bucket"), "rk", maxBucket = 8))
    val joins = collectPairs(
      Dedup.pairsFromBucketsRefinedJoins(buckets, Seq("bucket"), "rk", maxBucket = 8))
    assert(gen === joins)
    assert(gen.nonEmpty)
  }

  test("pairsFromBucketsRefined: oversized viral bucket keeps every member connected") {
    // one bucket of 50 members, far over the cap of 5: the old
    // generator dropped ALL its pairs; the refined one must link every
    // member into one component (equal-rk stars + rep cross-links)
    val viral = (0L until 50L).map(i => (1L, i, i % 3)).toDF("bucket", "id", "rk")
    val pairs = Dedup.pairsFromBucketsRefined(viral, Seq("bucket"), "rk", maxBucket = 5)
    val clusters = Dedup.dupClusters(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(clusters.length === 50)               // nobody dropped
    assert(clusters.map(_._2).toSet === Set(0L)) // one component, min-id root
    // pair volume stays near-linear, never bucket-quadratic
    assert(pairs.count() < 200)

    // reps themselves oversized (every rk distinct): star over reps
    val distinctRk = (0L until 40L).map(i => (1L, i, i)).toDF("bucket", "id", "rk")
    val p2 = Dedup.pairsFromBucketsRefined(distinctRk, Seq("bucket"), "rk", maxBucket = 5)
    val c2 = Dedup.dupClusters(p2).collect().map(r => r.getLong(1)).toSet
    assert(c2 === Set(0L))
    assert(p2.count() === 39)                    // exactly the rep star
  }

  test("oversizedBucketCensus reports capped buckets, refined path recalls a planted viral class end-to-end") {
    // 30 near-identical docs (one band bucket at these params) + 2 unrelated
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi"
    val viralDocs = (0L until 30L).map(i => (i, s"$base tail$i")) ++
      Seq((100L, "completely different content about catalyst internals"),
        (101L, "another unrelated doc on lsh banding"))
    val vdf = viralDocs.toDF("doc_id", "text")
    val pairs = Dedup.minhashNearDupPairs(vdf, k = 64, bands = 16, threshold = 0.5,
      shingleN = 3, maxBucket = 8)
    val clusters = Dedup.dupClusters(pairs).collect().map(r => (r.getLong(0), r.getLong(1)))
    // every viral doc is clustered (old behavior: bucket dropped, zero pairs)
    assert(clusters.count(_._2 == 0L) === 30)
    assert(!clusters.exists(c => c._1 == 100L || c._1 == 101L))
    // the census makes the cap observable on the same bucket table
    val bandz = (0L until 30L).map(i => (1L, 7L, i)).toDF("band_idx", "band_hash", "id")
    val census = Dedup.oversizedBucketCensus(bandz, Seq("band_idx", "band_hash"),
      maxBucket = 8).collect()
    assert(census.length === 1 && census.head.getAs[Long]("n_members") === 30L)
  }

  test("simhashNearDupPairs links exact dups at hamming 0") {
    val pairs = Dedup.simhashNearDupPairs(docs, maxHamming = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.exists(p => p._1 == 0L && p._2 == 1L && p._3 == 0L))
  }

  test("simhashNearDupPairs md5-compat path agrees with FNV path on exact dups") {
    val pairs = Dedup.simhashNearDupPairs(docs, maxHamming = 3, md5Compat = true).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.exists(p => p._1 == 0L && p._2 == 1L && p._3 == 0L))
  }

  test("embedding near-dups and ANN agree on a planted duplicate vector") {
    val v1 = Array.tabulate(16)(i => math.sin(i + 1).toFloat)
    val v1b = v1.map(x => x * 1.0001f)               // same direction
    val v2 = Array.tabulate(16)(i => math.cos(i * 2 + 1).toFloat)
    val v3 = Array.tabulate(16)(i => ((i % 3) - 1).toFloat)
    val embs = Seq((0L, v1), (1L, v1b), (2L, v2), (3L, v3)).toDF("vec_id", "embedding")

    val nd = Dedup.embeddingNearDupPairs(embs, threshold = 0.99, bits = 8, tables = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(nd.contains((0L, 1L)))

    val topk = Similarity.bruteForceTopK(embs, embs.filter(col("vec_id") === 0L), k = 2)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"), r.getAs[Long]("neighbor_id")))
    assert(topk.head === ((0L, 1L, 1L)))  // nearest neighbor of v1 is its duplicate
  }

  test("lshTopK candidates are a subset ranked identically to brute force") {
    val embs = (0L until 50L).map { i =>
      (i, Array.tabulate(32)(d => math.sin(i * 0.7 + d).toFloat))
    }.toDF("vec_id", "embedding")
    val q = embs.filter(col("vec_id") < 3)
    val bf = Similarity.bruteForceTopK(embs, q, k = 3).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("rank"), r.getAs[Long]("neighbor_id"))).toSet
    val lsh = Similarity.lshTopK(embs, q, k = 3, bits = 4, tables = 8).collect()
    assert(lsh.nonEmpty)
    // every LSH hit that brute force also ranked must carry the same cos value
    lsh.foreach { r =>
      assert(r.getAs[Double]("cos") <= 1.0 + 1e-9)
    }
    assert(bf.nonEmpty)
  }

  test("fellegiSunterScores: agreement sums the right weights, thresholds classify") {
    val recs = Seq(
      (1L, "b1", "x", "p"),   // 1-2: agree on both fields
      (2L, "b1", "x", "p"),
      (3L, "b1", "y", "q"),   // disagrees with 1/2 on both
      (4L, "b2", "x", "p")    // different block: never paired
    ).toDF("id", "blk", "f1", "f2")
    val out = Dedup.fellegiSunterScores(recs, "blk", "id",
        Seq(("f1", 2.0, -1.0), ("f2", 1.5, -0.5)), tLower = 0.0, tUpper = 3.0)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getDouble(2), r.getString(3)))).toMap
    assert(out.keySet === Set((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(out((1L, 2L)) === ((3.5, "match")))       // 2.0 + 1.5
    assert(out((1L, 3L)) === ((-1.5, "non_match")))  // -1.0 + -0.5
    assert(out((2L, 3L)) === ((-1.5, "non_match")))
  }

  test("clusterAssignIncremental: adopt, found, and MERGE standing clusters; replay idempotent") {
    import org.apache.spark.sql.DataFrame
    val corpusPairs = Seq((1L, 2L), (5L, 6L)).toDF("a_id", "b_id")
    // 2 buckets (not the 64 default) so the auto-compaction file
    // trigger below is reachable with fixture-sized appends
    Dedup.writeClusterIndex(corpusPairs, "graft_test_clusters", buckets = 2)
    // batch: doc 100 bridges clusters {1,2} and {5,6} (MERGE into 1);
    // doc 101 adopts; docs 200/201 found a fresh cluster
    val batch = Seq((100L, 2L), (100L, 5L), (101L, 6L), (200L, 201L))
      .toDF("a_id", "b_id")
    Dedup.clusterAssignIncremental(batch, "graft_test_clusters")
    def assignments(): Map[Long, Long] =
      Dedup.clusterAssignments(spark, "graft_test_clusters")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = assignments()
    val global = Dedup.dupClusters(corpusPairs.unionByName(batch))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === global, s"maintained $got != global $global")
    assert(got(6L) === 1L, "merge did not relabel the absorbed cluster")
    assert(got(200L) === 200L && got(201L) === 200L)
    // replay: same batch again changes nothing
    Dedup.clusterAssignIncremental(batch, "graft_test_clusters")
    assert(assignments() === got)
    // compaction folds relabels into the table and is invisible
    Dedup.compactClusterIndex(spark, "graft_test_clusters")
    assert(assignments() === got)
    // a later batch chaining into the merged cluster resolves through
    // compacted state too
    Dedup.clusterAssignIncremental(
      Seq((300L, 100L)).toDF("a_id", "b_id"), "graft_test_clusters")
    assert(assignments()(300L) === 1L)
    // AUTO-compaction (the streaming loops' between-batch policy):
    // the last batch re-created a relabel-free append; feed a merge to
    // re-create relabel state, then fire the file trigger — one
    // rewrite must both restore the layout and fold the relabel map
    Dedup.clusterAssignIncremental(
      Seq((400L, 401L), (402L, 403L)).toDF("a_id", "b_id"), "graft_test_clusters")
    Dedup.clusterAssignIncremental(
      Seq((401L, 402L)).toDF("a_id", "b_id"), "graft_test_clusters") // merge → relabel
    assert(spark.catalog.tableExists("graft_test_clusters_relabel"),
      "fixture should have standing relabel state")
    val want = assignments()
    assert(want(403L) === 400L)
    // the relabel fold is OUT OF BAND since r14: the tripping call
    // enqueues (returns false), reads stay correct while the
    // background fold runs, and the next call finalizes (returns true)
    assert(!Dedup.maybeCompactClusterIndex(spark, "graft_test_clusters", 1),
      "the tripping call enqueues the fold, it must not flip inline")
    assert(graft.sources.Bucketing.pendingMaintenance("graft_test_clusters"))
    assert(assignments() === want,
      "reads during the background fold must resolve through the map")
    graft.sources.Bucketing.awaitMaintenance("graft_test_clusters")
    assert(Dedup.maybeCompactClusterIndex(spark, "graft_test_clusters", 1),
      "the next call must finalize the background fold")
    assert(!spark.catalog.tableExists("graft_test_clusters_relabel"),
      "the fold's finalize must clear the folded relabel rows")
    assert(graft.sources.Bucketing.dataFileCount(spark, "graft_test_clusters") <= 2L,
      "compaction must restore ≤ one file per bucket")
    assert(assignments() === want, "auto-compaction must be invisible to reads")
    assert(!Dedup.maybeCompactClusterIndex(spark, "graft_test_clusters", 1),
      "freshly compacted table must not re-fire")
  }

  test("out-of-band relabel fold: appends and MERGES landing during the background fold survive — composite mapping preserved, post-pin relabel rows retained") {
    def assignments(t: String): Map[Long, Long] =
      Dedup.clusterAssignments(spark, t).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val t = "graft_fold_clusters"
    Dedup.writeClusterIndex(Seq((1L, 2L), (10L, 11L)).toDF("a_id", "b_id"), t,
      buckets = 2)
    try {
      // a merge → standing relabel state (cluster 10 folds into 1)
      Dedup.clusterAssignIncremental(Seq((2L, 10L)).toDF("a_id", "b_id"), t)
      assert(spark.catalog.tableExists(s"${t}_relabel"))
      // pad file count past the threshold so the trigger fires
      (1 to 3).foreach { i =>
        Dedup.clusterAssignIncremental(
          Seq((100L * i, 100L * i + 1)).toDF("a_id", "b_id"), t)
      }
      assert(!Dedup.maybeCompactClusterIndex(spark, t, 1)) // enqueue fold
      assert(graft.sources.Bucketing.pendingMaintenance(t))
      // WHILE the fold runs: a new doc adopts a folded cluster (delta
      // rows carrying an old_rep the pinned fold must still rewrite)
      // and a NEW merge of two standing clusters lands (a relabel row
      // the finalize must RETAIN — it was not in the pinned set)
      Dedup.clusterAssignIncremental(Seq((50L, 11L)).toDF("a_id", "b_id"), t)
      Dedup.clusterAssignIncremental(Seq((101L, 201L))
        .toDF("a_id", "b_id"), t) // merges cluster 200 into 100
      val want = assignments(t)
      assert(want(50L) === 1L, s"adoption during fold: $want")
      assert(want(201L) === 100L, s"merge during fold: $want")
      graft.sources.Bucketing.awaitMaintenance(t)
      assert(Dedup.maybeCompactClusterIndex(spark, t, 1), "finalize the fold")
      assert(assignments(t) === want,
        "the fold + delta-fold + selective map clear must preserve every assignment")
      // the PINNED rows cleared; the mid-fold merge's row survives
      // (unless the delta fold already materialized it — either way
      // the composite mapping above is what matters); and reads need
      // no fold for the pinned merge anymore
      val folded = spark.table(t).filter(col("doc_id") === 11L)
        .select("cluster_id").head().getLong(0)
      assert(folded === 1L, "pinned relabel must be folded into the table")
    } finally {
      graft.sources.Bucketing.dropLogical(spark, t)
      graft.sources.Bucketing.dropLogical(spark, s"${t}_relabel")
    }
  }

  test("clusterAssignIncremental: giant batch routes distributed and equals the driver path") {
    // same scenario as the driver-path test (adopt + merge + found),
    // but the batch is FORCED down the distributed root-graph path
    // (maxDriverPairs = 0); the maintained state must equal the global
    // closure — and a separate index ingesting the identical batch
    // through the driver path must agree row-for-row
    val corpusPairs = Seq((1L, 2L), (5L, 6L)).toDF("a_id", "b_id")
    val batch = Seq((100L, 2L), (100L, 5L), (101L, 6L), (200L, 201L))
      .toDF("a_id", "b_id")
    Dedup.writeClusterIndex(corpusPairs, "graft_test_big_clusters")
    Dedup.clusterAssignIncremental(batch, "graft_test_big_clusters",
      maxDriverPairs = 0L)
    def asg(tbl: String): Map[Long, Long] =
      Dedup.clusterAssignments(spark, tbl)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val big = asg("graft_test_big_clusters")
    val global = Dedup.dupClusters(corpusPairs.unionByName(batch))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(big === global, s"distributed $big != global $global")
    Dedup.writeClusterIndex(corpusPairs, "graft_test_drv_clusters")
    Dedup.clusterAssignIncremental(batch, "graft_test_drv_clusters")
    assert(big === asg("graft_test_drv_clusters"))
    // replay through the big path is idempotent too
    Dedup.clusterAssignIncremental(batch, "graft_test_big_clusters",
      maxDriverPairs = 0L)
    assert(asg("graft_test_big_clusters") === big)
  }

  test("fellegiSunterEM learns high match posterior for planted duplicate pairs") {
    // 60 base records with near-independent fields + 12 planted dups
    // that agree with their base on ALL three fields. Within-block
    // random pairs rarely agree on everything, so EM must assign the
    // all-agree combo a high posterior and the all-disagree combo a
    // low one — without ever seeing a label.
    val base = (0 until 60).map { i =>
      (i.toLong, s"b${i % 4}", s"x${i % 5}", s"y${i % 7}", s"z${i % 11}")
    }
    val dups = (0 until 60 by 5).map { i =>
      (1000L + i, s"b${i % 4}", s"x${i % 5}", s"y${i % 7}", s"z${i % 11}")
    }
    val df = (base ++ dups).toDF("id", "blk", "f1", "f2", "f3")
    val out = Dedup.fellegiSunterEM(df, "blk", "id", Seq("f1", "f2", "f3"), iters = 8)
      .collect()
    val byCombo = out.map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)),
      r.getAs[Double]("p_match"))).toMap
    assert(byCombo((1L, 1L, 1L)) > 0.9,
      s"all-agree pairs should be confident matches: ${byCombo((1L, 1L, 1L))}")
    assert(byCombo((0L, 0L, 0L)) < 0.1,
      s"all-disagree pairs should be confident non-matches: ${byCombo((0L, 0L, 0L))}")
    // learned m beats u on every field (agreement is match evidence)
    val r0 = out.head
    (0 to 2).foreach { i =>
      assert(r0.getAs[Double](s"m_$i") > r0.getAs[Double](s"u_$i"), s"field $i")
    }
  }

  test("spanRewrite removes later occurrences of a shared span, keeps the first intact") {
    // doc 0: tokens a0..a9 ; doc 1: unique prefix u0..u4 + a0..a9 + unique tail
    val shared = (0 until 10).map(i => s"a$i").mkString(" ")
    val d0 = shared
    val d1 = (0 until 5).map(i => s"u$i").mkString(" ") + " " + shared + " z0 z1"
    val docs = Seq((0L, d0), (1L, d1)).toDF("doc_id", "text")
    val out = Dedup.spanRewrite(docs, span = 10).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // doc 0 owns the span (earlier id) and keeps all 10 tokens
    assert(out(0L) === ((10L, 10L)))
    // doc 1 loses exactly the 10 shared tokens, keeps prefix + tail
    assert(out(1L) === ((17L, 7L)))
    // self-repetition: the same span twice in ONE doc dedups too
    val rep = Seq((5L, shared + " mid " + shared)).toDF("doc_id", "text")
    val r5 = Dedup.spanRewrite(rep, span = 10).collect().head
    assert(r5.getLong(1) === 21L && r5.getLong(2) === 11L) // second copy dropped
  }

  test("qualityMadCensus flags a planted outlier; identical docs give MAD 0") {
    import graft.operators.TextAnalysis
    // 12 identical docs (same quality) + 1 wildly different one
    val same = (0 until 12).map(i =>
      (i.toLong, "the quick brown fox jumps over a lazy dog today", "s0"))
    val outlier = Seq((99L, "aaa aaa aaa aaa aaa aaa aaa aaa aaa aaa aaa aaa", "s0"))
    val docs = (same ++ outlier).toDF("doc_id", "text", "source")
    val r = TextAnalysis.qualityMadCensus(docs).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getAs[Long]("n_docs") === 13L)
    // 12 of 13 share the median quality -> MAD = 0, and the planted
    // doc's nonzero deviation exceeds 3*0
    assert(row.getAs[Double]("mad_q") === 0.0)
    assert(row.getAs[Long]("n_outliers") === 1L)
  }

  test("lshMultiProbeTopK: candidates are a superset of single-probe at equal (bits, tables)") {
    val embs = (0L until 80L).map { i =>
      (i, Array.tabulate(32)(d => math.sin(i * 0.7 + d).toFloat))
    }.toDF("vec_id", "embedding")
    val q = embs.filter(col("vec_id") < 4)
    def pairsOf(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getAs[Long]("neighbor_id"))).toSet
    // compare CANDIDATE coverage at a large k so top-k truncation
    // doesn't mask the superset property
    val single = pairsOf(Similarity.lshTopK(embs, q, k = 100, bits = 6, tables = 2))
    val multi = pairsOf(Similarity.lshMultiProbeTopK(embs, q, k = 100, bits = 6, tables = 2))
    assert(single.subsetOf(multi),
      s"missing from multiprobe: ${single.diff(multi)}")
    assert(multi.size > single.size, "Hamming-1 probes recovered no extra candidates")
    // ranking semantics identical: on candidates both saw, same rank order by cos
    val mr = Similarity.lshMultiProbeTopK(embs, q, k = 3, bits = 6, tables = 2).collect()
    mr.foreach(r => assert(r.getAs[Double]("cos") <= 1.0 + 1e-9))
  }

  test("dupClusters: connected components with min-id labels") {
    // components: {1,2,3,4} (path), {10,11,12} (triangle), {20,21}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L)).toDF("a_id", "b_id")
    val got = Dedup.dupClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
    // the distributed large-star/small-star path must agree with the
    // small-graph driver union-find exactly
    val distributed = Dedup.dupClusters(pairs, smallGraphEdges = 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(distributed === got)
    // ...and so must the min-label foil (tiny diameters here)
    val edges = pairs.select(col("a_id").as("u"), col("b_id").as("v"))
      .union(pairs.select(col("b_id").as("u"), col("a_id").as("v")))
    val minLabel = Dedup.minLabelClusters(edges, maxIters = 20).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(minLabel === got)
  }

  test("dupClustersBigGraph: diameter-independent convergence on a long chain") {
    // a 400-node chain has diameter 400: min-label propagation needs
    // ~400 rounds; large-star/small-star must close it in ≤ 30
    val chain = spark.range(399).select(col("id").as("a_id"), (col("id") + 1).as("b_id"))
    val got = Dedup.dupClusters(chain, smallGraphEdges = 0L)
    assert(got.count() === 400L)
    assert(got.filter(col("cluster_id") =!= 0L).count() === 0L)
    // a cycle plus a pendant (non-tree shapes), and two components
    val pairs = Seq((5L, 6L), (6L, 7L), (7L, 5L), (7L, 8L), (100L, 101L))
      .toDF("a_id", "b_id")
    val big = Dedup.dupClusters(pairs, smallGraphEdges = 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(big === Map(5L -> 5L, 6L -> 5L, 7L -> 5L, 8L -> 5L,
      100L -> 100L, 101L -> 100L))
  }

  test("decodeStub opens the decoder once per partition, not per record") {
    val docs = (0L until 100L).map(i => (i, s"payload number $i with content", "s0"))
      .toDF("doc_id", "text", "source").repartition(4)
    val before = Multimodal.StubDecoder.opens.get()
    val out = Multimodal.decodeStub(Multimodal.attachBinary(docs))
    assert(out.count() == 100L)
    val opened = Multimodal.StubDecoder.opens.get() - before
    assert(opened == 4L, s"decoder constructed $opened times for 4 partitions")
    // the swap contract in code: a NON-stub decoder plugs into the same
    // plumbing and its features come out — the factory is the model
    val custom = Multimodal.decodeWith(Multimodal.attachBinary(docs),
      () => new Multimodal.PayloadDecoder {
        def features(id: Long, bytes: Array[Byte]): (Long, Long, Long, Long, Long) =
          (id, bytes.length.toLong, -1L, -2L, -3L)
      }).collect()
    assert(custom.length === 100)
    assert(custom.forall(r => r.getLong(2) == -1L && r.getLong(3) == -2L &&
      r.getLong(4) == -3L), "custom decoder's features must surface unchanged")
  }

  test("ImageIoDecoder round-trips real PNG bytes: exact geometry + pixel sum, once-per-partition opens") {
    val ids = (0L until 40L).toDF("doc_id").repartition(4)
    val withBin = ids.select(col("doc_id"),
      Multimodal.encodePng(col("doc_id"),
        (col("doc_id") % 8 + 1).cast("int"),
        (col("doc_id") % 5 + 1).cast("int")).as("payload"))
    val before = Multimodal.ImageIoDecoder.opens.get()
    val out = Multimodal.decodeImages(withBin).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(Multimodal.ImageIoDecoder.opens.get() - before === 4L)
    assert(out.size === 40)
    (0L until 40L).foreach { id =>
      val (w, h) = (id % 8 + 1, id % 5 + 1)
      val truth = (for { y <- 0L until h; x <- 0L until w }
        yield (id * 31 + x * 7 + y * 13) % 256).sum
      assert(out(id) === ((w, h, w * h, truth)), s"doc $id decoded wrong")
    }
  }

  test("real PNG payloads feed the phash/byte-embed chain: identical images collide at hamming 0") {
    // docs 0 and 1 encode the SAME image (same gray formula seed),
    // doc 2 a different one — the media near-dup chain must pair 0-1
    val ids = Seq((0L, 7L), (1L, 7L), (2L, 900L)).toDF("doc_id", "seed")
    val withBin = ids.select(col("doc_id"),
      Multimodal.encodePng(col("seed"), lit(6), lit(4)).as("payload"))
    val pairs = Multimodal.phashNearDupPairs(withBin, maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((0L, 1L)))
    // byte-embed over the same real payloads flows into ANN unchanged
    val emb = Multimodal.embedStub(withBin, dim = 8).collect()
    assert(emb.length === 3)
    assert(emb.forall(_.getSeq[Double](1).length === 8))
  }

  test("imagePhash on decoded pixels: identical images collide at hamming 0 through the sketch machinery") {
    val ids = Seq((0L, 5L), (1L, 5L), (2L, 777L)).toDF("doc_id", "seed")
    val withBin = ids.select(col("doc_id"),
      Multimodal.encodePng(col("seed"), lit(24), lit(16)).as("payload"))
    val ph = Multimodal.imagePhash(withBin)
    val m = ph.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(0L) === m(1L), "same image must hash identically")
    assert(m(0L) !== m(2L), "different image content must hash differently")
    val pairs = Dedup.simhashPairsFromSketches(
        ph.select(col("doc_id").as("id"), col("ph").as("sk")), maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((0L, 1L)))
  }

  test("sharedSpanReport flags exactly the docs sharing a verbatim window") {
    val spanText = (1 to 25).map(i => s"w$i").mkString(" ")
    val d = Seq(
      (1L, spanText + " tail one"),
      (2L, "lead two " + spanText),             // shares the 25-token span with 1
      (3L, (100 to 140).map(i => s"u$i").mkString(" "))) // unique
      .toDF("doc_id", "text")
    val flagged = graft.operators.Dedup.sharedSpanReport(d, span = 20)
      .collect().map(r => r.getLong(0)).toSet
    assert(flagged == Set(1L, 2L))
  }

  test("semanticDedup finds a planted within-cluster duplicate pair") {
    val base = (0L until 200L).map { i =>
      (i, (0 until 16).map(d => math.sin(i * 16 + d).toFloat).toArray)
    }
    // plant an exact duplicate of vector 7 under a new id
    val withDup = base :+ (999L, base(7)._2)
    val embs = withDup.toDF("vec_id", "embedding")
    val pairs = Similarity.semanticDedup(embs, nlist = 8, threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((7L, 999L)), s"planted dup not found: ${pairs.toSeq}")
  }

  test("indexedNearDupPairs equals the broadcast incremental path, with pruned index reads") {
    // corpus of distinct docs + a batch whose doc 1000 is a near-dup
    // of corpus doc 17 (one token edit on a 40-token text)
    val mk = (id: Long, seed: Long) =>
      (id, (0 until 40).map(j => s"w${(seed * 40 + j) % 900}").mkString(" "))
    val corpus = (0L until 200L).map(i => mk(i, i)).toDF("doc_id", "text")
    val editedText = mk(17L, 17L)._2.split(" ").updated(7, "EDITED").mkString(" ")
    val batch = (Seq((1000L, editedText)) ++ (1001L to 1010L).map(i => mk(i, i + 5000)))
      .toDF("doc_id", "text")
    Dedup.writeMinhashIndex(corpus, "graft_test_idx")
    val viaIndex = Dedup.indexedNearDupPairs(batch, "graft_test_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val viaBroadcast = Dedup.incrementalNearDupPairs(batch, corpus)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viaIndex === viaBroadcast)
    assert(viaIndex.exists { case (n, c, _) => n == 1000L && c == 17L },
      s"planted near-dup not found: $viaIndex")
    // the scale contract: an In-filter on the bucket column prunes the
    // band-index read to the touched buckets (not a full index scan).
    // (With autoBucketedScan the planner may hide the bucketed-scan
    // metadata, but file-level pruning still filters by bucket id;
    // disabling it makes the SelectedBucketsCount pin visible.)
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      val pruned = spark.table("graft_test_idx_bands")
        .filter(col("band_hash").isInCollection(Seq(1L, 2L, 3L)))
      val scan = pruned.queryExecution.executedPlan.toString
      assert(scan.contains("SelectedBucketsCount"),
        s"bucket pruning not engaged on the band index:\n$scan")
      val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
        .findFirstMatchIn(scan).get
      assert(sel.group(1).toInt < sel.group(2).toInt,
        s"In-filter did not prune any buckets: $scan")
    } finally spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
  }

  test("importanceWeights ranks target-like docs above off-domain docs") {
    val corpus = ((0L until 40L).map(i => (i, "common corpus words here"))
      ++ (100L until 110L).map(i => (i, "special target domain tokens"))).toDF("doc_id", "text")
    val target = corpus.filter(col("doc_id") >= 100L)
    val w = TextAnalysis.importanceWeights(corpus, target).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w(100L) > w(0L), s"target-domain doc not up-weighted: $w")
  }

  test("qualityCol/predLangCol columns equal the DataFrame operators row-for-row") {
    val fixture = graft.Tables.t(spark, SparkTestSession.sfDir, "documents")
    val viaCols = fixture.select(col("doc_id"),
      TextAnalysis.qualityCol(col("text")).as("q"),
      TextAnalysis.predLangCol(col("text")).as("l"))
    val viaOps = TextAnalysis.qualityScore(fixture).select(col("doc_id"), col("quality"))
      .join(TextAnalysis.langId(fixture), "doc_id")
    val diff = viaCols.join(viaOps, "doc_id")
      .filter(col("q") =!= col("quality") || col("l") =!= col("pred_lang"))
    assert(diff.isEmpty, "composable columns diverge from the operator outputs")
  }

  test("unigramLmScore: rare-token docs score higher nll than common-token docs") {
    val corpus = (0L until 50L).map(i => (i, "common words repeated in every doc"))
      .toDF("doc_id", "text")
      .unionAll(Seq((99L, "zyzzyva qwerty xylophone")).toDF("doc_id", "text"))
    val scores = TextAnalysis.unigramLmScore(corpus).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scores(99L) > scores(0L) + 1.0, s"rare doc not penalized: $scores")
  }

  test("unigramLmScoreOn: held-out docs with unseen tokens score finitely (no throw)") {
    val train = (0L until 50L).map(i => (i, "common words repeated in every doc"))
      .toDF("doc_id", "text")
    val heldOut = Seq((500L, "completely novel unseen vocabulary"),
      (501L, "common words again")).toDF("doc_id", "text")
    val scores = TextAnalysis.unigramLmScoreOn(train, heldOut).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scores.size == 2)
    assert(!scores.values.exists(v => v.isNaN || v.isInfinite), s"non-finite nll: $scores")
    assert(scores(500L) > scores(501L), s"unseen-token doc not penalized: $scores")
  }

  test("unigramLmScore: vocabulary cap drops the hapax tail into smoothed OOV mass") {
    // 40 docs of 5 common tokens + one hapax each: minCount=2 keeps
    // only the 5 common types; every hapax must score via the OOV mass
    val corpus = (0L until 40L).map(i => (i, s"alpha beta gamma delta eps unique$i"))
      .toDF("doc_id", "text")
    val capped = TextAnalysis.unigramLmScore(corpus, minCount = 2, maxVocab = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(2))
    assert(capped.length == 40)
    assert(!capped.exists { case (_, v) => v.isNaN || v.isInfinite })
    // all docs identical in shape => identical score; OOV prob here is
    // exactly 1/total (40 hapax types sharing 40 tokens of mass)
    assert(capped.map(_._2).distinct.length == 1)
  }

  test("pplBuckets degenerate cases: tiny language and all-equal scores stay deterministic") {
    // 2-doc language: ceil(2/3)=1, ceil(4/3)=2 → one head, one in
    // middle-or-tail by score; all-tied language collapses into head
    val corpus = (Seq((1L, "aa bb", "xx"), (2L, "aa qq zz ww", "xx")) ++
      (10L until 15L).map(i => (i, "mm nn", "yy")))
      .toDF("doc_id", "text", "lang")
    val out = TextAnalysis.pplBuckets(corpus).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out.values.sum == 7L, s"docs lost/duplicated: $out")
    // the tied language lands entirely in head (nll <= t1 for every doc)
    assert(out.get(("yy", "head")).contains(5L), s"tied lang split: $out")
    // re-running gives the identical partition (determinism)
    val again = TextAnalysis.pplBuckets(corpus).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out === again)
  }

  test("shardManifest with one shard is the whole-corpus summary") {
    val docs = (0L until 20L).map(i => (i, s"w$i w$i")).toDF("doc_id", "text")
    val m = graft.operators.Curation.shardManifest(docs, nShards = 1).collect()
    assert(m.length == 1)
    assert(m.head.getAs[Long]("n_docs") == 20L)
    assert(m.head.getAs[Long]("n_tokens") == 40L)
  }

  test("containment law: max-direction containment dominates jaccard on every pair") {
    // |A∩B|/min(|A|,|B|) >= |A∩B|/|A∪B| always — so at equal
    // thresholds the containment pair set is a superset of jaccard's
    val docs = (0L until 40L).map { i =>
      val base = (1 to 12).map(j => s"w${(i * 3 + j) % 25}")
      (i, (base ++ base.take((i % 5).toInt)).mkString(" "))
    }.toDF("doc_id", "text")
    val jac = Dedup.ngramJaccardPairs(docs, n = 5, threshold = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val cont = Dedup.ngramContainmentPairs(docs, n = 5, threshold = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(jac.subsetOf(cont),
      s"jaccard pairs missing from containment: ${jac -- cont}")
  }

  test("containment catches a quoted doc that jaccard misses") {
    val small = (1 to 8).map(i => s"tok$i").mkString(" ")          // 4 5-shingles
    val big = ((1 to 8).map(i => s"tok$i") ++
      (1 to 40).map(i => s"pad$i")).mkString(" ")                  // small is a prefix quote
    val docs = Seq((1L, small), (2L, big)).toDF("doc_id", "text")
    val cont = Dedup.ngramContainmentPairs(docs, n = 5, threshold = 0.9).collect()
    assert(cont.length == 1)
    val r = cont.head
    assert(r.getAs[Double]("c_ab") == 1.0, "small-in-big containment must be 1")
    assert(r.getAs[Double]("c_ba") < 0.2)
    // symmetric jaccard at the same bar sees nothing
    assert(Dedup.ngramJaccardPairs(docs, n = 5, threshold = 0.7).isEmpty)
  }

  test("pplBuckets: per-lang terciles partition every doc, ordered head<=middle<=tail") {
    // two langs, scores spread by token rarity: common docs -> head
    val corpus = ((0L until 30L).map(i => (i, "aa bb cc dd", "en")) ++
      (30L until 50L).map(i => (i, s"aa bb rare$i odd$i", "en")) ++
      (50L until 80L).map(i => (i, "xx yy zz", "de")) ++
      (80L until 95L).map(i => (i, s"xx weird$i", "de")))
      .toDF("doc_id", "text", "lang")
    val out = TextAnalysis.pplBuckets(corpus).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    // partition: per-lang doc counts sum to the lang totals
    assert(out.collect { case ((l, _), (n, _)) if l == "en" => n }.sum == 50L)
    assert(out.collect { case ((l, _), (n, _)) if l == "de" => n }.sum == 45L)
    // ordering: mean nll must not decrease across head -> middle -> tail
    for (l <- Seq("en", "de"); (a, b) <- Seq(("head", "middle"), ("middle", "tail")))
      for (x <- out.get((l, a)); y <- out.get((l, b)))
        assert(x._2 <= y._2, s"$l: $a avg ${x._2} > $b avg ${y._2}")
  }

  test("simhash oversized buckets refine by sub-pieces instead of dropping (recall kept)") {
    // 600 sketches share chunk 0 (low 16 bits = 0) but are far apart
    // elsewhere — the (0, 0) bucket exceeds maxBucket=500. A planted
    // hamming-3 pair differs in one bit of EACH other chunk, so the
    // only chunk it agrees on is the oversized one: the old drop-cap
    // lost it; the sub-piece refinement must find it.
    val crowd = (0L until 600L).map(i =>
      (i, (i * 0x9E3779B97F4A7C15L) & 0xFFFFFFFFFFFF0000L))
    val a = 0x00F00A0B0C0D0000L
    val b = a ^ (1L << 19) ^ (1L << 35) ^ (1L << 51)
    val sk = (crowd ++ Seq((9000L, a), (9001L, b))).toDF("id", "sk")
    val pairs = Dedup.simhashPairsFromSketches(sk, maxHamming = 3, maxBucket = 500)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.exists { case (x, y, h) => x == 9000L && y == 9001L && h == 3L },
      s"planted pair lost in the oversized bucket: ${pairs.toSeq}")
  }

  test("productQuantize: codes select the nearest codeword, error is the residual") {
    // 64-dim vectors in k=4 id-classes; vectors of the same class are
    // identical, so every vector sits exactly ON its class codebook
    // entry in every subspace → err 0 and codes = its class
    val embs = (0L until 40L).map { i =>
      (i, (0 until 64).map(d => math.sin((i % 4) * 64 + d)).toArray)
    }.toDF("vec_id", "embedding")
    val out = Similarity.productQuantize(embs, m = 8, k = 4).collect()
    assert(out.length === 40)
    out.foreach { r =>
      val id = r.getLong(0)
      val codes = (1 to 8).map(r.getLong)
      assert(codes.forall(_ === id % 4), s"vec $id coded $codes")
      assert(r.getDouble(9) === 0.0, s"vec $id err ${r.getDouble(9)}")
    }
    // a perturbed vector must still map to its nearest class with err > 0
    val noisy = Seq((99L, (0 until 64).map(d => math.sin(d) + 0.01).toArray))
      .toDF("vec_id", "embedding")
    val enc = Similarity.productQuantize(embs.unionAll(noisy), m = 8, k = 4)
      .filter(col("vec_id") === 99L).collect()(0)
    assert((1 to 8).map(enc.getLong).forall(_ === 0L))
    assert(enc.getDouble(9) > 0.0)
  }

  test("pqTopK: an exact duplicate ranks first by asymmetric distance") {
    val base = (0L until 200L).map { i =>
      (i, (0 until 64).map(d => math.sin(i * 64 + d)).toArray)
    }
    val withDup = base :+ (999L, base(7)._2) // exact copy of vector 7
    val embs = withDup.toDF("vec_id", "embedding")
    val top = Similarity.pqTopK(embs, embs.filter(col("vec_id") === 7L), topk = 300)
      .orderBy("rank").collect()
    // the duplicate shares vector 7's codes exactly, so its ADC
    // distance equals 7's own quantization floor — no vector can score
    // strictly closer (same-code vectors tie at the floor; PQ cannot
    // separate inside a code cell, which is the codec's contract)
    val dupDist = top.find(_.getLong(2) == 999L).get.getDouble(3)
    assert(dupDist === top.head.getDouble(3),
      s"something scored closer than the exact duplicate: ${top.take(3).toSeq}")
  }

  test("persisted ANN index: equals the in-memory IVF-PQ path; append finds new vectors") {
    val base = (0L until 200L).map { i =>
      (i, (0 until 64).map(d => math.sin(i * 64 + d)).toArray)
    }
    val embs = base.toDF("vec_id", "embedding")
    val queries = embs.filter(col("vec_id") < 5L)
    Similarity.writeAnnIndex(embs, "graft_ann_spec", buckets = 8)
    val viaIdx = Similarity.annIndexTopK(queries, "graft_ann_spec")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val viaMem = Similarity.ivfPqTopK(embs, queries, topk = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(viaIdx === viaMem)
    // append an exact copy of vector 7 under the frozen quantizer: it
    // shares 7's codes, so a query AT vector 7 must see it at the
    // quantization floor (the pqTopK duplicate law, through the index)
    val dup = Seq((999L, base(7)._2)).toDF("vec_id", "embedding")
    Similarity.appendToAnnIndex(dup, "graft_ann_spec")
    val top = Similarity.annIndexTopK(embs.filter(col("vec_id") === 7L),
      "graft_ann_spec", topk = 300, nprobe = 32).orderBy("rank").collect()
    val dupDist = top.find(_.getLong(2) == 999L).get.getDouble(3)
    assert(dupDist === top.head.getDouble(3),
      s"appended duplicate not at the ADC floor: ${top.take(3).toSeq}")
  }

  test("filtered index search: k results from PASSING labels even when the unfiltered top-k has none") {
    // labels cluster with the vectors: the query's nearest neighbors
    // are all label 0; label-1 vectors live far away — a post-filter
    // of the unfiltered top-k would return nothing
    val near = (0L until 100L).map { i =>
      (i, (0 until 64).map(d => math.sin(i * 64 + d)).toArray, 0)
    }
    val far = (200L until 300L).map { i =>
      (i, (0 until 64).map(d => 5.0 + math.cos(i * 64 + d)).toArray, 1)
    }
    val embs = (near ++ far).toDF("vec_id", "embedding", "label")
    Similarity.writeAnnIndex(embs, "graft_ann_labelf", buckets = 8,
      metaCols = Seq("label"))
    val q = embs.filter(col("vec_id") === 0L)
    val unfiltered = Similarity.annIndexTopK(q, "graft_ann_labelf",
      topk = 5, nprobe = 32).collect()
    assert(unfiltered.forall(_.getLong(2) < 200L),
      "setup broken: unfiltered top-5 should be all label-0 neighbors")
    val filtered = Similarity.annIndexTopK(q, "graft_ann_labelf",
      topk = 5, nprobe = 32, candidateFilter = Some(col("label") === 1)).collect()
    assert(filtered.length === 5, s"filtered search came up short: ${filtered.length}")
    assert(filtered.forall(_.getLong(2) >= 200L), "a non-passing candidate leaked")
  }

  test("ANN index maintenance cycle: append fragments, compaction restores, answers unchanged") {
    val base = (0L until 200L).map { i =>
      (i, (0 until 64).map(d => math.sin(i * 64 + d)).toArray)
    }
    val embs = base.toDF("vec_id", "embedding")
    Similarity.writeAnnIndex(embs, "graft_ann_compact", buckets = 8)
    // several small appends fragment the bucket files — the real
    // continuous-ingest wear pattern
    (0 until 3).foreach { b =>
      val batch = (0 until 10).map { j =>
        val id = 5000L + b * 10 + j
        (id, (0 until 64).map(d => math.sin(id * 64 + d)).toArray)
      }.toDF("vec_id", "embedding")
      Similarity.appendToAnnIndex(batch, "graft_ann_compact")
    }
    val queries = embs.filter(col("vec_id") < 5L)
    def answers() = Similarity.annIndexTopK(queries, "graft_ann_compact")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val before = answers()
    val filesBefore = spark.table("graft_ann_compact_codes").inputFiles.length
    graft.sources.Bucketing.compactBucketed(spark, "graft_ann_compact_codes")
    val filesAfter = spark.table("graft_ann_compact_codes").inputFiles.length
    assert(filesAfter < filesBefore,
      s"compaction did not reduce file count ($filesBefore -> $filesAfter)")
    assert(answers() === before, "compaction changed ANN answers")
  }

  test("ANN drift + requantize: a drifted region reads high residual and low recall; retraining restores both; requantized ≡ fresh-built") {
    def vecs(ids: Range, shift: Double) = ids.map { i =>
      (i.toLong, (0 until 64).map(d => shift + math.sin(i * 64 + d)).toArray)
    }
    val trained = vecs(0 until 200, 0.0)
    val drifted = vecs(1000 until 1200, 6.0) // a new region the quantizer never saw
    val embs = trained.toDF("vec_id", "embedding")
    val driftB = drifted.toDF("vec_id", "embedding")
    val full = (trained ++ drifted).toDF("vec_id", "embedding")
    Similarity.writeAnnIndex(embs, "graft_ann_drift", buckets = 8)
    // the drift SIGNAL: the planted batch's mean assignment residual
    // reads far above the trained corpus's own
    def residual(b: org.apache.spark.sql.DataFrame) =
      Similarity.annAssignmentResidual(b, "graft_ann_drift")
        .collect()(0).getDouble(1)
    val rTrained = residual(embs)
    val rDrifted = residual(driftB)
    assert(rDrifted > rTrained + 0.1,
      s"planted drift must read high: trained $rTrained, drifted $rDrifted")
    // grow under the frozen quantizer (production path), then measure
    // recall@5 of drifted queries against exact ranking
    Similarity.appendToAnnIndex(driftB, "graft_ann_drift")
    val dq = driftB.filter(col("vec_id") < 1010L)
    def recallAt5(table: String): Double = {
      val exact = Similarity.bruteForceTopK(full, dq, k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      val approx = Similarity.annIndexTopK(dq, table, topk = 5, nprobe = 16)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      (exact intersect approx).size.toDouble / exact.size
    }
    val recallBefore = recallAt5("graft_ann_drift")
    // requantize over the current corpus: residual repaired
    val stats = Similarity.requantizeAnnIndex(full, "graft_ann_drift")
      .collect()(0)
    assert(stats.getDouble(1) > stats.getDouble(2),
      s"requantize must lower the residual: $stats")
    // law: a requantized index answers exactly like one freshly built
    // from the same corpus with the same refinement (deterministic) —
    // so requantize restores recall to the fresh-index CEILING by
    // construction; the assertions pin that drift had pushed recall
    // materially below that ceiling and the rebuild closed the gap
    Similarity.writeAnnIndex(full, "graft_ann_fresh", buckets = 8, refineIters = 3)
    def ans(t: String) = Similarity.annIndexTopK(dq, t, topk = 5, nprobe = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(ans("graft_ann_drift") === ans("graft_ann_fresh"))
    val ceiling = recallAt5("graft_ann_fresh")
    val recallAfter = recallAt5("graft_ann_drift")
    assert(recallAfter === ceiling)
    assert(recallBefore < ceiling - 0.05 && recallAfter > recallBefore,
      s"drift must cost recall and requantize must recover it: " +
        s"before $recallBefore, after $recallAfter, ceiling $ceiling")
  }

  test("bounded retrain: trainSampleRate=0.5 restores recall@5 to within 0.1 of the full retrain; sample + retrain are deterministic") {
    def vecs(ids: Range, shift: Double) = ids.map { i =>
      (i.toLong, (0 until 64).map(d => shift + math.sin(i * 64 + d)).toArray)
    }
    val full = (vecs(0 until 200, 0.0) ++ vecs(1000 until 1200, 6.0))
      .toDF("vec_id", "embedding")
    // the deterministic gate: two draws identical, size near the rate
    val s1 = Similarity.retrainSample(full, 0.5)
    val s2 = Similarity.retrainSample(full, 0.5)
    val n1 = s1.count()
    assert(s1.select("vec_id").collect().map(_.getLong(0)).sorted.toSeq ===
      s2.select("vec_id").collect().map(_.getLong(0)).sorted.toSeq)
    assert(n1 > 120 && n1 < 280, s"0.5 gate kept $n1 of 400")
    val dq = full.filter(col("vec_id") >= 1000L && col("vec_id") < 1010L)
    def recallAt5(table: String): Double = {
      val exact = Similarity.bruteForceTopK(full, dq, k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      val approx = Similarity.annIndexTopK(dq, table, topk = 5, nprobe = 16)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      (exact intersect approx).size.toDouble / exact.size
    }
    try {
      // both indexes start from the SAME pre-drift state, then one
      // repairs with full-corpus training and one with the sample
      Similarity.writeAnnIndex(full.filter(col("vec_id") < 500L),
        "graft_rq_full", buckets = 8)
      Similarity.writeAnnIndex(full.filter(col("vec_id") < 500L),
        "graft_rq_samp", buckets = 8)
      Similarity.requantizeAnnIndex(full, "graft_rq_full", refineIters = 3)
      Similarity.requantizeAnnIndex(full, "graft_rq_samp", refineIters = 3,
        trainSampleRate = 0.5)
      val rFull = recallAt5("graft_rq_full")
      val rSamp = recallAt5("graft_rq_samp")
      assert(rSamp >= rFull - 0.1,
        s"sampled retrain recall $rSamp must be within 0.1 of full $rFull")
      // deterministic replay: a second sampled retrain answers identically
      val a1 = Similarity.annIndexTopK(dq, "graft_rq_samp", topk = 5,
        nprobe = 16).collect().map(_.toString).sorted.toSeq
      Similarity.requantizeAnnIndex(full, "graft_rq_samp", refineIters = 3,
        trainSampleRate = 0.5)
      val a2 = Similarity.annIndexTopK(dq, "graft_rq_samp", topk = 5,
        nprobe = 16).collect().map(_.toString).sorted.toSeq
      assert(a1 === a2, "replayed sampled retrain must rebuild identically")
    } finally {
      graft.sources.Bucketing.dropEpochGroup(spark, "graft_rq_full",
        Seq("centroids", "codebooks", "codes"))
      graft.sources.Bucketing.dropEpochGroup(spark, "graft_rq_samp",
        Seq("centroids", "codebooks", "codes"))
    }
  }

  test("bpeTrainIterative: re-counts between merges; equals one-round when pairs don't interact") {
    // genuinely non-interacting pairs: each repeated pair is isolated
    // by unique filler tokens, so merging one never changes another's
    // count (or creates a new repeated pair) — iterative must equal
    // the single counting round
    val disjoint = Seq(
      (1L, "e f w1 e f w2 e f w3 e f"),
      (2L, "a b u1 a b u2 a b"),
      (3L, "c d v1 c d")
    ).toDF("doc_id", "text")
    val oneRound = TextAnalysis.bpeTrain(disjoint, nMerges = 3)
    val iter = TextAnalysis.bpeTrainIterative(disjoint, nMerges = 3).map(m => (m._1, m._2))
    assert(iter === oneRound)
    // interacting pairs: "a a a a" — after merging (a,a), the pair
    // (a,a) no longer repeats; iterative picks (a+a merged)
    // next from the SEGMENTED corpus, one-round would pick (a,a) again
    val runs = Seq((1L, "a a a a a a a a"), (2L, "a a a a")).toDF("doc_id", "text")
    val it2 = TextAnalysis.bpeTrainIterative(runs, nMerges = 2)
    // doc1 segments to 4 merged units, doc2 to 2: 3 + 1 = 4 adjacent
    // (a\u0001a, a\u0001a) pairs - merged units pair in later rounds
    assert(it2.head === (("a", "a", 10L)))
    assert(it2(1) === (("a\u0001a", "a\u0001a", 4L)),
      s"second merge should pair merged units: ${it2.toSeq}")
  }

  test("bpeTrainBatched ≡ bpeTrainIterative: disjoint batches, chained runs, " +
      "and the mutation-hazard corpus") {
    // many independent frequent pairs: the batch should take them in
    // one or two scans yet equal the 6-scan sequential result exactly
    val disjoint = Seq(
      (1L, "e f w1 e f w2 e f w3 e f"),
      (2L, "a b u1 a b u2 a b"),
      (3L, "c d v1 c d"),
      (4L, "g h y1 g h y2 g h y3 g h y4 g h")).toDF("doc_id", "text")
    assert(TextAnalysis.bpeTrainBatched(disjoint, nMerges = 6)
      === TextAnalysis.bpeTrainIterative(disjoint, nMerges = 6))
    // maximally interacting: every merge chains through 'a', so the
    // batch rule degrades to one merge per scan — still exact
    val runs = Seq((1L, "a a a a a a a a"), (2L, "a a a a")).toDF("doc_id", "text")
    assert(TextAnalysis.bpeTrainBatched(runs, nMerges = 3)
      === TextAnalysis.bpeTrainIterative(runs, nMerges = 3))
    // the cutoff hazard the strict rule exists for: counts
    // (a,b)=12 > (c,a)=9 > (d,e)=5, and every (c,a) is followed by b —
    // after merging (a,b), the NEW pair (c, a·b) has count 9 and must
    // win round 2 over (d,e); a naive disjoint batch would have taken
    // (d,e) in round 1's batch and diverged
    val hazard = Seq(
      (1L, Seq.fill(9)("c a b").mkString(" x ")),
      (2L, Seq.fill(3)("a b").mkString(" y ")),
      (3L, Seq.fill(5)("d e").mkString(" z "))).toDF("doc_id", "text")
    val seqH = TextAnalysis.bpeTrainIterative(hazard, nMerges = 3)
    val batH = TextAnalysis.bpeTrainBatched(hazard, nMerges = 3)
    assert(seqH.head._1 === "a" && seqH.head._2 === "b")
    assert(seqH(1) === (("c", "a\u0001b", 9L)),
      s"sequential round 2 must take the mutated pair: $seqH")
    assert(batH === seqH)
    // tiny window forces the window-floor cutoff path — still exact
    assert(TextAnalysis.bpeTrainBatched(disjoint, nMerges = 6, window = 3)
      === TextAnalysis.bpeTrainIterative(disjoint, nMerges = 6))
  }

  test("bpeTrainBatched tie groups: clean tied prefix lands in one scan, " +
      "entangled tie stops the group — still ≡ sequential") {
    // four pairs tied at count 4: (a,b),(c,d),(e,f) mutually disjoint,
    // (f,g) entangled with (e,f). Name order walks a b → c d → e f →
    // f g. The clean prefix {(a,b),(c,d)} is exact in one scan; (e,f)
    // must NOT join it (applying it could mint a tie at 4 via the
    // entangled competitor's pre-image), and the old strict-cutoff
    // rule would have dropped everything past the head
    val tied = Seq(
      (1L, "a b p1 a b p2 a b p3 a b"),
      (2L, "c d q1 c d q2 c d q3 c d"),
      (3L, "e f s1 e f s2 e f s3 e f"),
      (4L, "f g r1 f g r2 f g r3 f g")).toDF("doc_id", "text")
    val seqT = TextAnalysis.bpeTrainIterative(tied, nMerges = 4)
    assert(seqT.map(m => (m._1, m._2)) ===
      Seq(("a", "b"), ("c", "d"), ("e", "f"), ("f", "g")))
    val scans = new java.util.concurrent.atomic.AtomicInteger(0)
    val batT = TextAnalysis.bpeTrainBatched(tied, nMerges = 4, scanCounter = scans)
    assert(batT === seqT)
    // cadence: {(a,b),(c,d)} then {(e,f)} then {(f,g)} = 3 scans for
    // 4 merges (the old rule needed 4)
    assert(scans.get() === 3, s"expected 3 scans, got ${scans.get()}")
    // a WIDE clean plateau with one entangled straggler: the whole
    // clean prefix lands in scan 1
    val plateau = Seq(
      (1L, "a b x1 a b x2 a b"),
      (2L, "c d x3 c d x4 c d"),
      (3L, "e f x5 e f x6 e f"),
      (4L, "g h x7 g h x8 g h"),
      (5L, "i j x9 i j xa i j"),
      (6L, "j k xb j k xc j k")).toDF("doc_id", "text")
    val scans2 = new java.util.concurrent.atomic.AtomicInteger(0)
    val batP = TextAnalysis.bpeTrainBatched(plateau, nMerges = 6, scanCounter = scans2)
    assert(batP === TextAnalysis.bpeTrainIterative(plateau, nMerges = 6))
    assert(scans2.get() <= 3, s"expected ≤3 scans on the plateau, got ${scans2.get()}")
  }

  test("bpeTrainBatched directional invariance: same-first-symbol pairs land in one scan (the Zipf head-word shape) — still ≡ sequential") {
    // (w0,a)=10 > (w0,b)=8 > (w0,c)=6 all share the head symbol w0,
    // but applying (w0,a) only consumes a w0 FOLLOWED BY a — the
    // other two pairs are exactly invariant. The round-12 walk's
    // shares-any-symbol test took one merge per scan here (the
    // recorded head-symbol-overlap bound on Zipf corpora); the
    // directional test takes all three in one productive scan
    val zipfHead = Seq(
      (1L, Seq.fill(10)("w0 a").zipWithIndex.map { case (s, i) => s"$s f$i" }.mkString(" ")),
      (2L, Seq.fill(8)("w0 b").zipWithIndex.map { case (s, i) => s"$s g$i" }.mkString(" ")),
      (3L, Seq.fill(6)("w0 c").zipWithIndex.map { case (s, i) => s"$s h$i" }.mkString(" "))
    ).toDF("doc_id", "text")
    val seqZ = TextAnalysis.bpeTrainIterative(zipfHead, nMerges = 3)
    assert(seqZ.map(m => (m._1, m._2)) === Seq(("w0", "a"), ("w0", "b"), ("w0", "c")))
    val scans = new java.util.concurrent.atomic.AtomicInteger(0)
    val batZ = TextAnalysis.bpeTrainBatched(zipfHead, nMerges = 3, scanCounter = scans)
    assert(batZ === seqZ)
    assert(scans.get() === 1,
      s"directional invariance should land all three in one scan, got ${scans.get()}")
  }

  test("bpeTrainBatched interference bound: an affected pair with trigram-bounded destruction and a dominating lead is accepted with its TRUE count") {
    // (a,b)=20 ranks first; (c,a)=10 is affected by it (a 'c a'
    // occurrence dies when its a is followed by b) but only 2 sites
    // are 'c a b' — trigram evidence bounds the destruction at 2, and
    // 10−2=8 still dominates the next competitor (d,e)=5. The batch
    // takes all three in one scan; the recorded count for (c,a) must
    // be sequential's count-at-selection, 8, not the scan count 10
    val hazardLead = Seq(
      (1L, "c a b p1 c a b"),                                      // 'c a b' ×2
      (2L, Seq.fill(8)("c a").zipWithIndex.map { case (s, i) => s"$s z$i" }.mkString(" ")),
      (3L, Seq.fill(18)("a b").zipWithIndex.map { case (s, i) => s"$s q$i" }.mkString(" ")),
      (4L, Seq.fill(5)("d e").zipWithIndex.map { case (s, i) => s"$s r$i" }.mkString(" "))
    ).toDF("doc_id", "text")
    val seqL = TextAnalysis.bpeTrainIterative(hazardLead, nMerges = 3)
    assert(seqL === Seq(("a", "b", 20L), ("c", "a", 8L), ("d", "e", 5L)),
      s"fixture drifted: $seqL")
    val scans = new java.util.concurrent.atomic.AtomicInteger(0)
    // the tier is exactness-preserving but measured cadence-negative
    // on Zipf text, so it is opt-in (see bpeTrainBatched) — the law
    // here pins that WITH it on, batched stays ≡ sequential
    val batL = TextAnalysis.bpeTrainBatched(hazardLead, nMerges = 3,
      scanCounter = scans, interferenceTier = true)
    assert(batL === seqL)
    // ranking + trigram evidence + true-count recovery
    assert(scans.get() === 3, s"expected 3 scans, got ${scans.get()}")
    // and with it OFF, the affected pair simply waits for its own
    // scan — same result, one more ranking pass
    assert(TextAnalysis.bpeTrainBatched(hazardLead, nMerges = 3) === seqL)
  }

  test("bpeApply: greedy left-to-right, rank-ordered, merged units atomic") {
    val docs = Seq(
      (1L, "a b a b c"), // both (a,b) occurrences merge
      (2L, "a a a"),     // overlapping: leftmost wins, third 'a' stays
      (3L, "a b c"),     // rank order decides which merge fires first
      (4L, "x y z")      // no merge applies
    ).toDF("doc_id", "text")
    val seg = TextAnalysis.bpeApply(docs, Seq(("a", "b"), ("b", "c"), ("a", "a")))
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    assert(seg(1L) === ((3L, "a b|a b|c")))
    assert(seg(2L) === ((2L, "a a|a")))
    // (a,b) ranks before (b,c): "a b c" -> [a b, c], and the merged
    // unit "a b" is atomic — (b,c) cannot fire inside it
    assert(seg(3L) === ((2L, "a b|c")))
    assert(seg(4L) === ((3L, "x|y|z")))
  }

  test("bpeTrain learns the most frequent pair first") {
    val docs = (0L until 10L).map(i => (i, "q r q r s t")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(docs, nMerges = 3)
    // "q r" occurs 20x (twice per doc), "r q" 10x, "r s" 10x, "s t" 10x
    assert(merges.head === (("q", "r")))
    assert(merges.length === 3)
  }

  test("importanceWeights: held-out corpus tokens in target do not throw") {
    val corpus = (0L until 40L).map(i => (i, "common corpus words here"))
      .toDF("doc_id", "text")
    // target contains a token the corpus has never seen — its add-1
    // branch and the corpus OOV branch must both be safe
    val target = Seq((100L, "special unseen target token")).toDF("doc_id", "text")
    val w = TextAnalysis.importanceWeights(corpus, target).collect()
    assert(w.length == 40)
    assert(!w.exists(r => r.getDouble(2).isNaN || r.getDouble(2).isInfinite))
  }

  test("frameSample: fixed-size strided chunks of the binary payload") {
    val withBin = Multimodal.attachBinary(docs.withColumn("source", lit("src")))
    val frames = Multimodal.frameSample(withBin, chunk = 16, stride = 2)
    val f0 = frames.filter(col("doc_id") === 0L)
      .orderBy("frame_idx").collect()
    assert(f0.nonEmpty)
    val text0 = docs.filter(col("doc_id") === 0L).head().getAs[String]("text")
    // frame i covers bytes [i*chunk*stride, +chunk)
    val first = new String(f0.head.getAs[Array[Byte]]("frame"), "UTF-8")
    assert(first === text0.substring(0, 16))
    f0.foreach(r => assert(r.getAs[Array[Byte]]("frame").length <= 16))
  }

  test("ivfTopK finds the planted duplicate and stays consistent with brute force") {
    val embsData = (0L until 200L).map { i =>
      (i, Array.tabulate(32)(d => math.sin(i * 0.61 + d * 0.37).toFloat))
    }
    // vec 199 duplicates vec 0's direction
    val withDup = embsData.updated(199, (199L, embsData.head._2.map(_ * 1.0001f)))
    val embs = withDup.toDF("vec_id", "embedding")
    val q = embs.filter(col("vec_id") === 0L)
    val ivf = Similarity.ivfTopK(embs, q, k = 3, nlist = 16, nprobe = 16)
      .collect().map(r => (r.getAs[Long]("rank"), r.getAs[Long]("neighbor_id")))
    // nprobe == nlist probes everything -> must equal brute force exactly
    val bf = Similarity.bruteForceTopK(embs, q, k = 3)
      .collect().map(r => (r.getAs[Int]("rank").toLong, r.getAs[Long]("neighbor_id")))
    assert(ivf.sortBy(_._1) === bf.sortBy(_._1))
    assert(ivf.find(_._1 == 1L).map(_._2) === Some(199L))
    // bounded probing still finds the duplicate (same posting list as its twin)
    val narrow = Similarity.ivfTopK(embs, q, k = 3, nlist = 16, nprobe = 2)
      .collect().map(r => (r.getAs[Long]("rank"), r.getAs[Long]("neighbor_id")))
    assert(narrow.find(_._1 == 1L).map(_._2) === Some(199L))
  }

  test("quality metrics are computed per document") {
    val q = TextAnalysis.qualityScore(docs).collect().map(r =>
      r.getAs[Long]("doc_id").toString -> r).toMap
    // doc 0: "the" appears twice, "and" once, in 14 tokens
    val d0 = q("0")
    assert(d0.getAs[Int]("n_tokens") === 14)
    assert(d0.getAs[Double]("stopword_ratio") > 0.2)
    assert(d0.getAs[Double]("quality") > 0 && d0.getAs[Double]("quality") <= 1.0)
  }

  test("bigramLmScore: repeated bigrams score lower nll than unique-bigram noise") {
    val corpus = Seq(
      (1L, "a b a b a b a b a b a b"),      // one dominant bigram pattern
      (2L, "q w e r t y u i o p z x"),      // every bigram unique
      (3L, "solo")                           // < 2 tokens: no bigrams, drops
    ).toDF("doc_id", "text")
    val got = TextAnalysis.bigramLmScore(corpus).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(!got.contains(3L), "a 1-token doc has no bigrams and must drop")
    assert(got(1L).getAs[Double]("bigram_nll") < got(2L).getAs[Double]("bigram_nll"),
      "the repeated-pattern doc must be more probable under the corpus bigram LM")
    assert(got(1L).getAs[Long]("n_bigrams") === 11L)
  }

  test("aucRoc: perfect separation 1.0, anti-separation 0.0, all-tied 0.5") {
    def auc(rows: Seq[(Double, Boolean)]): Double =
      TextAnalysis.aucRoc(rows.toDF("s", "t"), "s", "t").head().getDouble(0)
    assert(auc(Seq((0.9, true), (0.8, true), (0.2, false), (0.1, false))) === 1.0)
    assert(auc(Seq((0.9, false), (0.8, false), (0.2, true), (0.1, true))) === 0.0)
    // every score tied: midranks make AUC exactly 1/2 (chance)
    assert(auc(Seq((0.5, true), (0.5, false), (0.5, true), (0.5, false))) === 0.5)
    // hand value: pos at ranks {4, 2} of 4 → (6 − 3) / (2·2) = 0.75
    assert(auc(Seq((0.9, true), (0.8, false), (0.4, true), (0.1, false))) === 0.75)
  }

  test("classifierScore: deterministic, bounded, and label-consistent") {
    val scored = TextAnalysis.classifierScore(docs).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("clf_score"), r.getAs[Boolean]("clf_label")))
    assert(scored.length === 5)
    scored.foreach { case (_, s, _) => assert(s > 0.0 && s < 1.0) }
    // exact-dup docs 0 and 1 hash to identical features -> identical score
    val byId = scored.map(t => t._1 -> t).toMap
    assert(byId(0L)._2 === byId(1L)._2 && byId(0L)._3 === byId(1L)._3)
    // rerun is bit-identical (no volatile state in the plan)
    val again = TextAnalysis.classifierScore(docs).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("clf_score"))).toMap
    scored.foreach { case (id, s, _) => assert(again(id) === s) }
  }

  test("table-driven models: equal the inline stubs for stub weights, and the table drives the result") {
    // classifier: stub-table path is bit-identical to the inline path
    val wStub = TextAnalysis.classifierWeights(spark)
    val viaTable = TextAnalysis.classifierScoreFromTable(docs, wStub).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2))).sortBy(_._1)
    val inline = TextAnalysis.classifierScore(docs).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2))).sortBy(_._1)
    assert(viaTable === inline)
    // a DIFFERENT model flips every label: all-negative weights ⇒
    // wsum < 0 ⇒ label false, score < 0.5 — proving the table is the
    // model, not a decoration over a fixed stub
    val wNeg = wStub.select(col("bucket"), (col("weight") * 0 - 1.0).as("weight"))
    val neg = TextAnalysis.classifierScoreFromTable(docs, wNeg).collect()
    neg.foreach { r =>
      assert(!r.getBoolean(2) && r.getDouble(1) < 0.5,
        s"all-negative model must score below 0.5: $r")
    }
    // langid: marker-table path equals the inline marker list
    val m = TextAnalysis.langMarkerTable(spark)
    val lidTable = TextAnalysis.langIdFromTable(docs, m).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val lidInline = TextAnalysis.langId(docs).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(lidTable === lidInline)
    // swapped markers change predictions: call every "the/and/of" doc xx
    import spark.implicits._
    val mXx = Seq((0L, "xx", "the"), (0L, "xx", "and"), (0L, "xx", "of"))
      .toDF("priority", "lang", "token")
    val xx = TextAnalysis.langIdFromTable(docs, mXx).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    lidInline.filter(_._2 == "en").foreach { case (id, _) =>
      assert(xx(id) === "xx", s"doc $id should re-label under the swapped model")
    }
    // a learned table may list one language under SEVERAL priority
    // rows — marker sets merge per language (best priority ranks it)
    // instead of colliding on duplicate s_<lang> columns
    val mSplit = m.unionAll(Seq((9L, "en", "zzzunseen"))
      .toDF("priority", "lang", "token"))
    val split = TextAnalysis.langIdFromTable(docs, mSplit).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(split === lidTable, "split-priority markers must merge, not collide")
  }

  test("keepBestPerCluster keeps the max-quality member (min id on quality ties)") {
    val kept = Dedup.keepBestPerCluster(docs, TextAnalysis.qualityCol(col("text"))).collect()
    assert(kept.length === 1, "fixture has exactly one near-dup cluster {0,1,2}")
    val row = kept.head
    assert(row.getAs[Long]("n_members") === 3L)
    assert(row.getAs[Long]("n_dropped") === 2L)
    // expected representative from the quality operator directly
    val q = TextAnalysis.qualityScore(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("quality")).toMap
    val members = Seq(0L, 1L, 2L)
    val best = members.maxBy(id => (q(id), -id))
    assert(row.getAs[Long]("kept_doc_id") === best)
    assert(row.getAs[Double]("kept_quality") === q(best))
  }

  test("tokenEntropy: uniform > prose-like > constant, exact on a known histogram") {
    val frame = Seq(
      (1L, "a b c d"),          // uniform over 4 types: H = ln 4
      (2L, "a a a b"),          // skewed: H = -(0.75 ln .75 + .25 ln .25)
      (3L, "x x x x")           // constant: H = 0
    ).toDF("doc_id", "text")
    val got = TextAnalysis.tokenEntropy(frame).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("entropy")).toMap
    assert(got(1L) === math.rint(math.log(4) * 1e4) / 1e4)
    val h2 = -(0.75 * math.log(0.75) + 0.25 * math.log(0.25))
    assert(got(2L) === math.rint(h2 * 1e4) / 1e4)
    assert(got(3L) === 0.0)
  }

  test("interleaveBySource: positions are a gap-free round-robin over sources") {
    val frame = Seq(
      (10L, "t", "sA"), (11L, "t", "sA"), (12L, "t", "sA"),
      (20L, "t", "sB"), (21L, "t", "sB"), (22L, "t", "sB")
    ).toDF("doc_id", "text", "source")
    val got = Curation.interleaveBySource(frame).collect()
      .map(r => (r.getAs[Long]("pos"), r.getAs[Long]("doc_id"))).sortBy(_._1)
    assert(got.map(_._1).toSeq === (0L until 6L).toSeq, "positions must be dense")
    // alternating sources: sA at even, sB at odd, each in doc_id order
    assert(got.map(_._2).toSeq === Seq(10L, 20L, 11L, 21L, 12L, 22L))
  }

  test("vocabCoverage: exact threshold ranks on a known frequency table") {
    // tokens: a×4 b×2 c×1 d×1 → total 8; sorted (a,b,c,d)
    val frame = Seq((1L, "a a a a b b c d")).toDF("doc_id", "text")
    val got = TextAnalysis.vocabCoverage(frame).collect()
      .map(r => r.getAs[Long]("pct") -> (r.getAs[Long]("k_types"), r.getAs[Long]("covered_tokens")))
      .toMap
    assert(got(50L) === ((1L, 4L)), "'a' alone covers exactly 50 %")
    assert(got(90L) === ((4L, 8L)), "90 % needs the full vocabulary (87.5 % at 3 types)")
    assert(got(99L) === ((4L, 8L)))
  }

  test("mmrTopK: the near-duplicate of a picked result loses to a diverse candidate") {
    def vec(axis0: Double, axis: Int, w: Double): Seq[Double] = {
      val v = Array.fill(64)(0.0); v(0) = axis0; v(axis) = w; v.toSeq
    }
    val corpus = Seq(
      (0L, vec(1.0, 1, 0.0)),    // the query itself (excluded by id)
      (1L, vec(0.9, 1, 0.45)),   // A1: most relevant
      (2L, vec(0.9, 1, 0.451)),  // A2: near-duplicate of A1
      (3L, vec(0.85, 3, 0.5))    // B: slightly less relevant, diverse
    ).toDF("vec_id", "embedding")
    val got = Similarity.mmrTopK(corpus, corpus.filter(col("vec_id") === 0),
      k = 2, pool = 3).collect().map(r => r.getAs[Long]("vec_id")).toSeq
    // plain cosine top-2 is {A1, A2}; MMR swaps the duplicate for B
    assert(got === Seq(1L, 3L), s"expected diversified picks, got $got")
  }

  test("silhouette: separated planted clusters score near 1, cluster sizes preserved") {
    // 64-dim one-hot-ish clusters: ids 0..39, cluster j = ids with id%8==j
    // concentrated on axis j — perfectly separated under cosine
    val vecs = (0L until 40L).map { id =>
      val axis = (id % 8).toInt
      val v = Array.fill(64)(0.001f)
      v(axis) = 1.0f
      (id, v.toSeq)
    }
    val embs = vecs.toDF("vec_id", "embedding")
    val out = Similarity.silhouette(embs, k = 8, iters = 3).collect()
    assert(out.map(_.getAs[Long]("n_members")).sum === 40L)
    out.foreach { r =>
      assert(r.getAs[Double]("mean_sil") > 0.8,
        s"separated cluster ${r.getAs[Long]("cl")} scored ${r.getAs[Double]("mean_sil")}")
    }
  }

  test("importanceResample keeps target-like docs at a higher rate than off-domain docs") {
    val corpus = (0L until 200L).map { i =>
      val text = if (i % 2 == 0) "alpha beta gamma delta alpha beta"
                 else "omega psi chi phi omega psi"
      (i, text, if (i % 2 == 0) "likeTarget" else "offDomain")
    }.toDF("doc_id", "text", "source")
    val target = corpus.filter(col("source") === "likeTarget").limit(5)
    val kept = Curation.importanceResample(corpus, target, rate = 0.5)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_kept")).toMap
    assert(kept.getOrElse("likeTarget", 0L) > kept.getOrElse("offDomain", 0L),
      s"target-like docs must be upsampled: $kept")
  }

  test("editDistancePairs: finds typo pairs inside blocks, never across first tokens") {
    val items = Seq(
      (1L, "alpha bracket"),
      (2L, "alpha braket"),   // deletion: dist 1 to id 1
      (3L, "alpha socket"),   // dist 4 to id 1 — verified out
      (4L, "beta bracket")    // different block: never compared to id 1
    ).toDF("id", "name")
    val got = Dedup.editDistancePairs(items, "name", "id", maxDist = 2).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"), r.getAs[Long]("dist"))).toSet
    assert(got === Set((1L, 2L, 1L)),
      s"expected only the typo pair within the 'alpha' block, got $got")
  }

  test("sourceDivergence: exact KL on a known two-source distribution") {
    val frame = Seq(
      (1L, "a b", "sA"),        // P_A = {a:.5, b:.5}
      (2L, "a a a a", "sB")     // P_B = {a:1}; corpus Q = {a:5/6, b:1/6}
    ).toDF("doc_id", "text", "source")
    val got = Curation.sourceDivergence(frame).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("kl")).toMap
    val klA = 0.5 * math.log(0.5 / (5.0 / 6)) + 0.5 * math.log(0.5 / (1.0 / 6))
    val klB = math.log(1.0 / (5.0 / 6))
    assert(got("sA") === math.rint(klA * 1e4) / 1e4)
    assert(got("sB") === math.rint(klB * 1e4) / 1e4)
  }

  test("jaccard knn: an exact dup is its twin's nearest neighbor, rank cut holds") {
    val pairs = Dedup.ngramJaccardPairs(docs, n = 5, threshold = 0.0)
    val sym = pairs.select(col("a_id").as("doc_id"), col("b_id").as("nbr_id"), col("jaccard"))
      .unionAll(pairs.select(col("b_id").as("doc_id"), col("a_id").as("nbr_id"), col("jaccard")))
    val knn = graft.relational.Relational.topKPerKey(sym,
        Seq(col("doc_id")), Seq(col("jaccard").desc, col("nbr_id").asc), 3)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("nbr_id"), r.getAs[Double]("jaccard")))
    val byDoc = knn.groupBy(_._1)
    byDoc.values.foreach(l => assert(l.length <= 3, "rank cut must hold"))
    def best(d: Long) = byDoc(d).maxBy(x => (x._3, -x._2))
    assert(best(0L)._2 === 1L && best(0L)._3 === 1.0, "doc 0's nearest must be its exact dup 1")
    assert(best(1L)._2 === 0L && best(1L)._3 === 1.0)
  }

  test("dupFraction: exact dups score 1.0, unique docs 0.0") {
    val got = Curation.dupFraction(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("dup_frac")).toMap
    assert(got(0L) === 1.0 && got(1L) === 1.0, "every shingle of an exact dup is shared")
    assert(got(2L) > 0.5 && got(2L) < 1.0, "near dup shares most but not all shingles")
    assert(got(3L) === 0.0 && got(4L) === 0.0, "unique docs share nothing")
  }

  test("sourceOverlapMatrix counts distinct shared shingles per source pair") {
    val frame = Seq(
      (1L, "one two three four five six seven", "sA"),
      (2L, "one two three four five six seven", "sB"),   // full overlap with sA
      (3L, "alpha beta gamma delta epsilon zeta eta", "sC")
    ).toDF("doc_id", "text", "source")
    val m = Curation.sourceOverlapMatrix(frame).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n_shared")).toMap
    assert(m === Map(("sA", "sB") -> 3L), "7 tokens -> 3 distinct 5-gram shingles, sC disjoint")
  }

  test("langId prefers the language whose markers dominate") {
    val multi = Seq(
      (1L, "the cat and the dog of the house is big"),
      (2L, "le chat et la maison des les amis un jour"),
      (3L, "qqq www eee")).toDF("doc_id", "text")
    val got = TextAnalysis.langId(multi).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) === "en")
    assert(got(2L) === "fr")
    assert(got(3L) === "und")
  }

  test("multimodal plumbing: binary payload round-trips through the stub decoder") {
    val withBin = Multimodal.attachBinary(docs.withColumn("source", lit("src")))
    val feats = Multimodal.decodeStub(withBin).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(feats.size === 5)
    assert(feats(0L).getAs[Long]("n_bytes") === docs.filter(col("doc_id") === 0)
      .head().getAs[String]("text").getBytes("UTF-8").length.toLong)
    assert(feats(0L).getAs[Long]("sum_bytes") > 0L)
    // exact dups produce identical stub features
    assert(feats(0L).getAs[Long]("sum_bytes") === feats(1L).getAs[Long]("sum_bytes"))
    assert(feats(0L).getAs[Long]("head_crc_slot") === feats(1L).getAs[Long]("head_crc_slot"))
  }

  test("tokenCosinePairs: prefix filtering equals brute force, recalls reorders and typos") {
    val names = Seq(
      (1L, "acme global steel works"), (2L, "acme global steel works"),   // exact
      (3L, "acme global steel work"),                                      // typo
      (4L, "zenith dynamic plastic mold"), (5L, "totally unrelated name here"))
      .toDF("id", "name")
    val got = Dedup.tokenCosinePairs(names, "name", "id", threshold = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got((1L, 2L)) === 1.0)
    assert(got.contains((1L, 3L)) && got((1L, 3L)) === 0.75)
    assert(!got.keySet.exists { case (a, b) => a == 4L || b == 4L })
    // brute force over all pairs confirms the prefix filter lost nothing
    val toks = names.collect().map(r => r.getLong(0) ->
      r.getString(1).split(" ").toSet).toMap
    val brute = (for {
      a <- toks.keys; b <- toks.keys if a < b
      inter = (toks(a) & toks(b)).size
      cos = inter / math.sqrt(toks(a).size.toDouble * toks(b).size)
      if math.rint(cos * 10000) / 10000 >= 0.6
    } yield (a, b)).toSet
    assert(got.keySet === brute)
  }

  test("phashNearDupPairs: exact dups collide at hamming 0, distinct docs are apart") {
    val pairs = Multimodal.phashNearDupPairs(
        Multimodal.attachBinary(docs.withColumn("source", lit("s"))))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.get((0L, 1L)) === Some(0L))  // identical payloads
    assert(!pairs.contains((3L, 4L)))         // unrelated docs
    // a payload 1 flipped block apart is recalled through band blocking
    val tweaked = docs.filter(col("doc_id") === 0L)
      .select(lit(9L).as("doc_id"),
        regexp_replace(col("text"), "done$", "doze").as("text"),
        lit("s").as("source"))
    val withNear = Multimodal.attachBinary(
      docs.withColumn("source", lit("s")).unionByName(tweaked))
    val ph = withNear.select(col("doc_id"),
        graft.functions.VectorFunctions.phash64(col("payload")).as("ph"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val d09 = java.lang.Long.bitCount(ph(0L) ^ ph(9L))
    val got = Multimodal.phashNearDupPairs(withNear).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    if (d09 <= 3) assert(got.contains((0L, 9L)), s"hamming $d09 pair missed")
  }

  test("winnowing guarantee: any shared run of >= w+k-1 tokens shares a fingerprint") {
    // doc 5 embeds an 8-token run (= w+k-1 with k=4, w=5) of doc 0
    // inside otherwise-unrelated text; the winnowing guarantee says
    // the pair MUST share at least one selected fingerprint
    val withContam = docs.unionAll(Seq(
      (5L, "intro words here the quick brown fox jumps over the lazy closing remark")
    ).toDF("doc_id", "text"))
    val pairs = TextAnalysis.winnowSharedPairs(withContam, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 5L)), s"contaminated pair not detected: $pairs")
    assert(pairs.contains((0L, 1L)))  // exact dups trivially share
    // unrelated docs share nothing
    assert(!pairs.contains((3L, 4L)))
  }

  test("winnowing density: selected fingerprints are a strict sample of the k-grams") {
    val census = TextAnalysis.winnowCensus(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_fps")).toMap
    val nTokens = docs.head().getAs[String]("text").split(" ").length
    val nGrams = nTokens - 3
    assert(census(0L) >= 1 && census(0L) < nGrams,
      s"expected 1 <= n_fps < $nGrams, got ${census(0L)}")
    // identical docs select identical fingerprint sets
    assert(census(0L) === census(1L))
  }

  test("naiveBayes: hand-computed smoothed model and argmax classification") {
    // two labels with one distinctive token each, one shared token;
    // every token clears minCount=2
    val train = Seq(
      ("spam", "buy buy now"), ("spam", "buy now"),
      ("ham", "hello world now"), ("ham", "hello now")).toDF("label", "text")
    val model = TextAnalysis.naiveBayesModel(train, minCount = 2).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    // vocab = {buy, now, hello, world}? counts: buy=3, now=4, hello=2,
    // world=1 (dropped by minCount=2) -> V=3
    // spam totals over vocab: buy 3 + now 2 = 5; ham: hello 2 + now 2 = 4
    val eps = 1e-12
    assert(math.abs(model(("spam", "buy")) - math.log(4.0 / 8)) < eps)   // (3+1)/(5+3)
    assert(math.abs(model(("spam", "now")) - math.log(3.0 / 8)) < eps)
    assert(math.abs(model(("spam", "hello")) - math.log(1.0 / 8)) < eps) // unseen, dense
    assert(math.abs(model(("ham", "hello")) - math.log(3.0 / 7)) < eps)  // (2+1)/(4+3)
    assert(!model.contains(("spam", "world")), "sub-minCount token leaked into the vocab")
    // priors ride the empty-token rows: 2/4 each
    assert(math.abs(model(("spam", "")) - math.log(0.5)) < eps)
    // classification: distinctive tokens win their label; OOV ignored
    val test = Seq((1L, "buy buy zzz"), (2L, "hello world")).toDF("doc_id", "text")
    val modelDf = TextAnalysis.naiveBayesModel(train, minCount = 2)
    val pred = TextAnalysis.naiveBayesClassify(test, modelDf).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pred === Map(1L -> "spam", 2L -> "ham"))
  }

  test("naiveBayes: all-OOV docs fall back to the prior argmax; " +
      "irregular whitespace never corrupts the priors") {
    // unequal priors (3 spam : 1 ham) so the prior-only winner is
    // determinate; one training doc carries a doubled space — the
    // empty token it would mint collides with the doc-count sentinel
    // and must be dropped at tokenization
    val train = Seq(
      ("spam", "buy  buy now"), ("spam", "buy now"), ("spam", "buy now"),
      ("ham", "hello now hello")).toDF("label", "text")
    val modelDf = TextAnalysis.naiveBayesModel(train, minCount = 2)
    val model = modelDf.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val eps = 1e-12
    // exactly one prior row per label — a leaked '' token would add more
    assert(model.keys.count(_._2 == "") === 2)
    assert(math.abs(model(("spam", "")) - math.log(0.75)) < eps)
    assert(math.abs(model(("ham", "")) - math.log(0.25)) < eps)
    // token counts unaffected by the doubled space: buy=4,now=4,hello=2
    // -> V=3; spam totals 4+3=7, so P(buy|spam)=(4+1)/(7+3)
    assert(math.abs(model(("spam", "buy")) - math.log(0.5)) < eps)
    // doc 1: all tokens OOV; doc 3: whitespace-only text (zero real
    // tokens). Both previously vanished from the output — now both
    // get the prior-only argmax (spam, the 3/4-prior label) with
    // score = round(ln 0.75, 6). Doc 2 scores normally.
    val test = Seq((1L, "zzz qqq"), (2L, "hello hello hello"), (3L, "   "))
      .toDF("doc_id", "text")
    val out = TextAnalysis.naiveBayesClassify(test, modelDf).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    assert(out.size === 3, s"every input doc must survive scoring: $out")
    val priorOnly = BigDecimal(math.log(0.75))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1L) === (("spam", priorOnly)))
    assert(out(3L) === (("spam", priorOnly)))
    assert(out(2L)._1 === "ham")
  }

  test("naiveBayes: a label with zero in-vocab tokens still gets dense-grid " +
      "rows (tn=0 smoothing) and competes in every argmax") {
    // 'rare' trains on tokens that never clear minCount=2, so it has a
    // prior but no token mass — the fit must still emit its grid rows
    // (uniform smoothed 1/V) so in-vocab docs score it consistently
    // with the prior-only fallback for all-OOV docs
    val train = Seq(
      ("spam", "buy buy now"), ("spam", "buy now"),
      ("ham", "hello world now"), ("ham", "hello now"),
      ("rare", "xunique yunique")).toDF("label", "text")
    val modelDf = TextAnalysis.naiveBayesModel(train, minCount = 2)
    val model = modelDf.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val eps = 1e-12
    // vocab = {buy, now, hello} (world, xunique, yunique < minCount) -> V=3
    // rare's grid: tn=0 -> every token scores ln(1/3)
    for (tok <- Seq("buy", "now", "hello"))
      assert(math.abs(model(("rare", tok)) - math.log(1.0 / 3)) < eps,
        s"rare/$tok missing or wrong: ${model.get(("rare", tok))}")
    assert(math.abs(model(("rare", "")) - math.log(0.2)) < eps) // prior 1/5
    // in-vocab doc: rare competes (and here its uniform ln(1/3) per
    // token beats spam's sparse hello mass for a hello-heavy doc? no —
    // just pin that scoring includes rare for BOTH doc kinds and the
    // winners are the hand-computed argmaxes)
    val test = Seq((1L, "hello hello"), (2L, "zzz qqq")).toDF("doc_id", "text")
    val out = TextAnalysis.naiveBayesClassify(test, modelDf).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    // doc 1 candidates: ham 2*ln(3/7)+ln(0.4); spam 2*ln(1/8)+ln(0.4);
    //                   rare 2*ln(1/3)+ln(0.2)
    val ham = 2 * math.log(3.0 / 7) + math.log(0.4)
    val rare1 = 2 * math.log(1.0 / 3) + math.log(0.2)
    assert(ham > rare1 && out(1L)._1 === "ham")
    // doc 2 all-OOV: prior-only argmax — spam/ham tie at 0.4, tie
    // breaks to the smaller label 'ham'; rare (0.2) loses
    assert(out(2L)._1 === "ham")
    val priorOnly = BigDecimal(math.log(0.4))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(2L)._2 === priorOnly)
  }
}
