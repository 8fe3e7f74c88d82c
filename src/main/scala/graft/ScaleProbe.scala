package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{BloomJoin, Curation, Dedup, Graph, Retrieval, Similarity, Sketches}
import graft.relational.Relational

/**
 * Scale probe: the sf fixtures top out at 5k documents / 2k vectors,
 * far below where a quadratic candidate generator would show itself.
 * This main synthesizes a deterministic corpus 40-100x larger
 * IN SPARK (distributed generation off `spark.range` — nothing
 * driver-side) and times the operators whose scaling behavior
 * matters, so BASELINE.md can carry measured evidence that the LSH /
 * inverted-index / heap designs hold as data grows.
 *
 * Synthetic shape mirrors the fixtures: ~100-token docs over a small
 * vocabulary, every 50th doc a near-dup of its neighbor (one token
 * edit); embeddings are hash-derived floats. All deterministic -
 * rerunning gives identical inputs.
 */
object ScaleProbe {

  /**
   * The synthetic 100-token probe text for an id: ONE copy of the
   * formula the incremental-batch and backfill corpora share — a
   * vocab or token-count tweak applied to a stray copy would silently
   * desynchronize the corpora the BASELINE.md rows compare.
   * ([[synthDocs]] extends the same shape with near-dup planting.)
   */
  private def probeText(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat_ws(" ", transform(sequence(lit(0), lit(99)), i =>
      concat(lit("w"), pmod(xxhash64(id * 1000 + i), lit(400)))))

  private def synthDocs(spark: SparkSession, n: Int): DataFrame = {
    val vocab = 400 // tokens; small vocab stresses bucket skew like the fixtures
    spark.range(n.toLong).toDF("doc_id")
      .withColumn("base_id",
        when(col("doc_id") % 50 === 1, col("doc_id") - 1).otherwise(col("doc_id")))
      .withColumn("text",
        concat_ws(" ", transform(sequence(lit(0), lit(99)), i =>
          concat(lit("w"),
            pmod(xxhash64(col("base_id") * 1000 + i +
              // near-dups: one token differs from the base doc
              when(col("doc_id") =!= col("base_id") && i === 7, lit(1)).otherwise(lit(0))),
              lit(vocab))))))
      .select("doc_id", "text")
  }

  /**
   * Deterministic ZIPF-token corpus: word ranks drawn via the inverse
   * CDF `rank = floor(V^u)` (u hash-uniform), so P[rank = k] ≈
   * 1/(k·lnV) — the s≈1 Zipf law empirical for natural text — over a
   * 30k-word vocabulary, with hash-varied 50-150-token doc lengths.
   * Purpose (VERDICT r11 #3): [[synthDocs]]' small UNIFORM vocab puts
   * hundreds of bigram counts on a binomial tie plateau, which forces
   * the batched-BPE acceptance rule toward sequential cadence
   * (~1.2 merges/scan recorded) and shapes the LM/keyword probes'
   * count distributions the same way; real text's Zipf separation is
   * the regime the batch rule actually exploits, so the text-family
   * records carry BOTH corpora.
   */
  private def zipfDocs(spark: SparkSession, n: Int): DataFrame = {
    val v = 30000.0 // vocab size; ln(30000) ≈ 10.3 → top word ≈ 9.7% of tokens
    val res = 1000000L // inverse-CDF resolution of the hash-uniform u
    spark.range(n.toLong).toDF("doc_id")
      .withColumn("len", (pmod(xxhash64(col("doc_id") + 3), lit(101)) + 50).cast("int"))
      .withColumn("text", concat_ws(" ",
        transform(sequence(lit(0), col("len") - 1), i =>
          concat(lit("z"), floor(pow(lit(v),
            (pmod(xxhash64(col("doc_id") * 211 + i), lit(res)).cast("double") + 0.5)
              / res.toDouble)).cast("long")))))
      .select("doc_id", "text")
  }

  private def synthEmbeddings(spark: SparkSession, n: Int): DataFrame =
    spark.range(n.toLong).toDF("vec_id")
      .withColumn("embedding", transform(sequence(lit(0), lit(63)), i =>
        (pmod(xxhash64(col("vec_id") * 64 + i), lit(2000)) / 1000.0 - 1.0).cast("float")))
      .select("vec_id", "embedding")

  /** Synthetic orders-like table: hash-derived columns, fully distributed generation. */
  /** Vectors with an 8-dim latent signal spread across 64 dims + noise. */
  private def latentEmbs(spark: SparkSession, n: Long, cpus: Int): DataFrame = {
    val bB = Array.tabulate(8, 64)((r, i) =>
      if ((((r * 64 + i) * 2654435761L) >>> 16 & 1L) == 1L) 1.0 else -1.0)
    spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)), i =>
        (0 until 8).map(r => sin(col("id") * 31 + lit(r)) *
          element_at(typedLit(bB(r).toSeq), (i + 1).cast("int")))
          .reduce(_ + _) + sin(col("id") * 64 + i) * 0.05).as("embedding"))
      .repartition(cpus)
  }

  /** Reassemble pN-style projection columns into one embedding array. */
  private def asVec(df: DataFrame, k: Int, prefix: String): DataFrame =
    df.select(col("vec_id"),
      array((0 until k).map(j => col(s"$prefix$j")): _*).as("embedding"))

  private def synthOrders(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).toDF("o_orderkey")
      .withColumn("o_custkey", pmod(xxhash64(col("o_orderkey")), lit(1000000L)))
      .withColumn("o_totalprice",
        (pmod(xxhash64(col("o_orderkey") + 7), lit(500000L)) / 100.0) + 1.0)
      .withColumn("o_status",
        element_at(array(lit("O"), lit("F"), lit("P")),
          (pmod(xxhash64(col("o_orderkey") + 13), lit(3)) + 1).cast("int")))

  /**
   * Deterministic POWER-LAW graph: ~1.1M raw edges over 1M nodes whose
   * destination endpoint is Zipf-distributed via the inverse CDF
   * `dst = floor(N^u)` (u uniform from a hash). P[dst = 1] = ln2/lnN
   * ≈ 5%, so node 1 is a ≥50k-degree hub, and the tail falls off as
   * ~1/(k·lnN) — the degree skew the near-uniform 1M-edge fixtures
   * (pagerank_1m et al.) never exercise. Symmetrized + deduped.
   */
  private def powerlawGraph(spark: SparkSession): DataFrame = {
    val e = sys.env.getOrElse("SPARK_GRAFT_PROBE_EDGES", "1100000").toLong
    val n = 1000000L
    val u = (pmod(xxhash64(col("id")), lit(n)).cast("double") + 0.5) / n.toDouble
    val half = spark.range(e).toDF("id")
      .select(pmod(xxhash64(col("id") + 7), lit(n)).as("src"),
        floor(pow(lit(n.toDouble), u)).cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
    half.union(half.select(col("dst").as("src"), col("src").as("dst"))).distinct()
  }

  def main(args: Array[String]): Unit = {
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_PROBE_DOCS", "200000").toInt
    val nVecs = sys.env.getOrElse("SPARK_GRAFT_PROBE_VECS", "100000").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // SPARK_GRAFT_MASTER=local-cluster[w,c,mem] runs the probes with
    // forked executor JVMs (the Verify/Bench discipline) — the
    // streaming-ingest probes under it are the multi-process leg of
    // the sustained-arrival story: foreachBatch maintenance, RocksDB
    // state, and versioned-view flips all drive real executor
    // processes instead of in-JVM threads
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val builder = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", Bench.shmLocalDir)
      // per-process warehouse: probe index tables (graft_probe_*)
      // must not race a concurrent suite/verify JVM's catalog
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-probe-wh").toString)
    // FAIR scheduling with a low-share maintenance pool: the
    // out-of-band compaction thread (Bucketing's maintenancePool tags
    // its jobs spark.scheduler.pool=graft_maintenance) should soak
    // idle cores, not contend head-to-head with a live micro-batch.
    // Weight 8:1 means a live batch's stages take ~8/9 of contended
    // slots at task-boundary granularity (FAIR does not preempt
    // running tasks — the manifest design keeps merge tasks small, so
    // boundaries come often).
    val fairPools = {
      val f = java.nio.file.Files.createTempFile("graft-fair", ".xml")
      java.nio.file.Files.write(f,
        """<?xml version="1.0"?>
          |<allocations>
          |  <pool name="default">
          |    <schedulingMode>FIFO</schedulingMode><weight>8</weight><minShare>0</minShare>
          |  </pool>
          |  <pool name="graft_maintenance">
          |    <schedulingMode>FIFO</schedulingMode><weight>1</weight><minShare>0</minShare>
          |  </pool>
          |</allocations>""".stripMargin.getBytes("UTF-8"))
      f.toString
    }
    builder.config("spark.scheduler.mode", "FAIR")
      .config("spark.scheduler.allocation.file", fairPools)
    val spark = (if (master.startsWith("local-cluster"))
      graft.core.ClusterHarness.configure(builder) else builder).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // actual executor cores (r13 advice): under SPARK_GRAFT_MASTER=
    // local-cluster[2,2,...] the session has 4 cores while the cpus
    // env string still reads 32 — capacity-regime pins must gate on
    // what the scheduler actually has, not on the env value
    val actualCores = spark.sparkContext.defaultParallelism

    val docs = synthDocs(spark, nDocs).repartition(cpus.toInt)
    val embs = synthEmbeddings(spark, nVecs).repartition(cpus.toInt)
    docs.count(); embs.count() // materialize-generation warm-up outside timings

    // SPARK_GRAFT_PROBE_ONLY=tag1,tag2 restricts the run (iteration aid)
    val only = sys.env.get("SPARK_GRAFT_PROBE_ONLY").map(_.split(",").toSet)
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPS", "2").toInt
    def time(tag: String)(body: => Long): (String, Double, Long) = {
      if (!only.forall(_.contains(tag))) return (tag, 0.0, 0L)
      // min of `reps`: the virtualized host shows multi-x run-to-run
      // noise on shuffle-heavy stages; the min is the engine's number.
      // GC first so the ContextCleaner drops the previous probe's
      // shuffle state instead of letting it degrade this one.
      val runs = (1 to reps).map { _ =>
        System.gc(); Thread.sleep(200)
        val t0 = System.nanoTime()
        val rows = body
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      val (sec, rows) = runs.minBy(_._1)
      System.err.println(f"== $tag%-22s $sec%7.2f s  ($rows rows)")
      (tag, sec, rows)
    }

    val results = Seq(
      time("dedup_exact")(Dedup.exactDupGroups(docs).count()),
      time("dedup_minhash")(Dedup.minhashNearDupPairs(docs, k = 64, bands = 16,
        threshold = 0.7).count()),
      time("dedup_simhash")(Dedup.simhashNearDupPairs(docs, maxHamming = 3).count()),
      // refine-not-drop at scale: a 20k-doc viral boilerplate class
      // (50 variants × 400 identical copies, cross-variant jaccard
      // ≈ 0.67) drives every band bucket past maxBucket — the old
      // generator dropped ALL its pairs with zero signal; the refined
      // one must close the whole class into ONE cluster, with
      // candidate volume O(class) (stars + rep pairs), never class².
      time("dedup_viral") {
        val base = "the quarterly compliance disclosure statement required " +
          "by section twelve applies to all registered entities and must " +
          "be filed before the end of the reporting period without exception"
        val viral = spark.range(20000).select(
          (col("id") + 50000000L).as("doc_id"),
          concat(lit(base + " variant "), (col("id") % 50).cast("string")).as("text"))
        val pairs = Dedup.minhashNearDupPairs(viral, k = 64, bands = 16,
          threshold = 0.6, maxBucket = 300)
        val n = Dedup.dupClusters(pairs)
          .filter(col("cluster_id") === 50000000L).count()
        require(n == 20000L, s"viral class recall: $n of 20000 docs clustered")
        n
      },
      time("dedup_ngram_jaccard")(Dedup.ngramJaccardPairs(docs, n = 5,
        threshold = 0.7).count()),
      time("ann_lsh")(Similarity.lshTopK(embs, embs.filter(col("vec_id") < 100),
        k = 5, bits = 10, tables = 4).count()),
      // the multi-probe trade, measured: at HALF the tables (2 vs 4),
      // how many of brute force's true top-5 hits does each probe
      // strategy recover for 100 queries? rows = Σ overlap (max 500).
      // Multi-probe must beat single-probe at equal (bits, tables).
      time("ann_mp_recall") {
        val q = embs.filter(col("vec_id") < 100)
        val truth = Similarity.bruteForceTopK(embs, q, k = 5)
          .select(col("query_id"), col("neighbor_id"))
        def overlap(df: DataFrame): Long =
          df.select(col("query_id"), col("neighbor_id"))
            .intersect(truth).count()
        val single = overlap(Similarity.lshTopK(embs, q, k = 5, bits = 10, tables = 2))
        val multi = overlap(Similarity.lshMultiProbeTopK(embs, q, k = 5, bits = 10, tables = 2))
        System.err.println(s"== ann_mp_recall detail: single=$single multi=$multi of 500")
        require(multi >= single, s"multi-probe recall $multi below single-probe $single")
        multi
      },
      // bits scale with corpus size (16 bits ≈ 65k buckets at 100k
      // vecs keeps buckets near-singleton; 8 bits would go quadratic)
      time("ann_ivf")(Similarity.ivfTopK(embs, embs.filter(col("vec_id") < 100),
        k = 5, nlist = 256, nprobe = 16).count()),
      time("centroid_vecsum")(Similarity.centroidAssign(
        embs.withColumn("label", pmod(col("vec_id"), lit(7)).cast("string"))).count()),
      time("dedup_embedding") {
        val base = embs.select(col("vec_id"),
          col("embedding").cast("array<double>").as("embedding"))
        val planted = base.filter(col("vec_id") % 100 === 0)
          .select((col("vec_id") + 10000000L).as("vec_id"),
            transform(col("embedding"),
              (x, i) => x * when(i % 2 === 0, 1.1).otherwise(0.9)).as("embedding"))
        Dedup.embeddingNearDupPairs(base.unionAll(planted), threshold = 0.95,
          bits = 16, tables = 8).count()
      },
      // distributed CC loop (driver union-find path disabled): 12.5k
      // chains of 8 nodes → diameter-8 components
      time("cc_distributed") {
        val edges = spark.range(100000).toDF("u")
          .filter(col("u") % 8 =!= 7)
          .select(col("u").as("a_id"), (col("u") + 1).as("b_id"))
        Dedup.dupClusters(edges, smallGraphEdges = 0).count()
      },
      // the diameter killer: ONE 200k-node chain (diameter 200k).
      // Min-label propagation needs 200k rounds here — a dead job.
      // The alternating large-star/small-star loop must close it in
      // O(log n) rounds; the probe asserts every node labels to 0.
      time("cc_chain") {
        val edges = spark.range(199999)
          .select(col("id").as("a_id"), (col("id") + 1).as("b_id"))
        val labels = Dedup.dupClusters(edges, smallGraphEdges = 0)
        require(labels.filter(col("cluster_id") =!= 0L).count() == 0L,
          "chain did not collapse to root 0")
        labels.count()
      },
      // fault tolerance, priced: cc_distributed again but with
      // spark.graft.reliableCheckpoints=true — every round writes
      // durable checkpoint files instead of executor-local blocks
      // (core.Materialize). The delta vs cc_distributed is the
      // per-round serialize+write+read cost a cluster pays so an
      // hours-long iterative job survives executor loss.
      time("cc_reliable_ckpt") {
        val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
        spark.sparkContext.setCheckpointDir(dir)
        spark.conf.set(graft.core.Materialize.Flag, "true")
        try {
          val edges = spark.range(100000).toDF("u")
            .filter(col("u") % 8 =!= 7)
            .select(col("u").as("a_id"), (col("u") + 1).as("b_id"))
          Dedup.dupClusters(edges, smallGraphEdges = 0).count()
        } finally spark.conf.set(graft.core.Materialize.Flag, "false")
      },
      // span rewrite at probe scale: every 50th doc is a one-token
      // edit of its neighbor, so its pre/post-edit runs of ≥20 tokens
      // dedup away; cost must track the shingle explosion (linear)
      // aggregate over BOTH counters and the md5 so column pruning
      // can't skip the coverage join or the text reassembly
      time("span_rewrite")(Dedup.spanRewrite(docs, span = 20)
        .agg(sum(col("n_before") - col("n_after")).as("removed"),
          sum(length(col("rewritten_md5"))).as("md5len"))
        .head().getLong(0)),
      time("topk_per_key")(Relational.topKPerKey(
        docs.withColumn("g", pmod(col("doc_id"), lit(97))),
        Seq(col("g")), Seq(length(col("text")).desc, col("doc_id").asc), 5).count()),
      // curation tier: eval = every 200th doc (0.5% "benchmark"), the
      // broadcast path — corpus-side shingles never shuffle
      time("decontaminate")(Curation.contaminationReport(
        docs.filter(col("doc_id") % 200 =!= 0),
        docs.filter(col("doc_id") % 200 === 0)).count()),
      time("chunk")(Curation.chunk(docs, size = 32, overlap = 8).count()),
      time("repetition")(Curation.repetitionSignals(docs).count()),
      time("pack")(Curation.packSequences(
        docs.withColumn("source", pmod(col("doc_id"), lit(64)).cast("string")),
        budget = 2048).count()),
      time("quantize")(Curation.quantizeEmbeddings(embs).count()),
      // skew stress: 90% of the corpus in ONE source. The window form
      // drags the dominant group through a single task; skewSafe
      // (grouped prefix sums) spans it across partitions
      time("pack_skewed") {
        val skewed = docs.withColumn("source",
          when(pmod(col("doc_id"), lit(10)) === 0,
            pmod(col("doc_id"), lit(64)).cast("string")).otherwise(lit("dom")))
        Curation.packSequences(skewed, budget = 2048).count()
      },
      time("pack_skewed_safe") {
        val skewed = docs.withColumn("source",
          when(pmod(col("doc_id"), lit(10)) === 0,
            pmod(col("doc_id"), lit(64)).cast("string")).otherwise(lit("dom")))
        Curation.packSequences(skewed, budget = 2048, skewSafe = true).count()
      },
      time("lm_score")(graft.operators.TextAnalysis.unigramLmScore(docs).count()),
      // web-noise vocabulary stress: 90% of each doc's tokens are
      // corpus-unique (URLs/base64-style hapax), so the raw type count
      // is ~45×nDocs — the uncapped LM would collect it all to the
      // driver; the capped LM ships ≤ maxVocab types and the hapax
      // tail scores through the smoothed OOV mass
      time("lm_score_hapax") {
        val noisy = spark.range(nDocs.toLong).toDF("doc_id")
          .withColumn("text", concat_ws(" ",
            transform(sequence(lit(0), lit(49)), i =>
              when(i < 5, concat(lit("c"), pmod(i, lit(40))))
                .otherwise(concat(lit("u"), col("doc_id") * 50 + i)))))
        graft.operators.TextAnalysis.unigramLmScore(noisy, maxVocab = 100000).count()
      },
      time("dedup_spans")(Dedup.sharedSpanReport(docs, span = 20).count()),
      // bloom seen-gate: one distributed filter build over the corpus
      // (treeAggregate inside stat.bloomFilter) + a scan-stage probe
      // of the batch — the cheap pre-filter before any per-doc work
      time("bloom_gate") {
        val isBatch = col("doc_id") >= nDocs - 20000
        graft.operators.BloomJoin.seenGate(
          docs.filter(isBatch), docs.filter(!isBatch),
          expectedItems = nDocs.toLong)
          .filter(!col("maybe_seen")).count()
      },
      // the COMPOSED curation pipeline (near-dup removal + quality +
      // language gates + census) on the planted-near-dup corpus — the
      // end-to-end shape a real run takes, not just its stages
      time("pipeline_filter") {
        Dedup.dropNearDups(docs.withColumn("source",
            pmod(col("doc_id"), lit(64)).cast("string")), n = 5, threshold = 0.7)
          .withColumn("quality",
            graft.operators.TextAnalysis.qualityCol(col("text")))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"), avg("quality").as("avg_q"))
          .count()
      },
      // the composed CCNet decision (langid column → corpus LM →
      // per-language terciles → keep) end-to-end
      time("pipeline_ccnet") {
        graft.operators.TextAnalysis.pplBucketed(
          docs.withColumn("pred_lang",
            graft.operators.TextAnalysis.predLangCol(col("text"))),
          langCol = "pred_lang", maxVocab = 100000)
          .filter(col("bucket").isin("head", "middle"))
          .groupBy("pred_lang").agg(count(lit(1)).as("n_kept"))
          .count()
      },
      // CCNet bucketing under web-noise: the per-(lang, nll) count
      // table the tercile thresholds live on is bounded by the
      // 4-decimal score space (≪ corpus) and the LM vocabulary is
      // capped — no per-language corpus sort, no unbounded driver state
      time("ppl_buckets_hapax") {
        // common/hapax ratio varies per doc (5..24 common tokens) so
        // the nll distribution spreads across genuinely distinct values
        val noisy = spark.range(nDocs.toLong).toDF("doc_id")
          .withColumn("text", concat_ws(" ",
            transform(sequence(lit(0), lit(49)), i =>
              when(i < pmod(col("doc_id"), lit(20)) + 5, concat(lit("c"), pmod(i, lit(40))))
                .otherwise(concat(lit("u"), col("doc_id") * 50 + i)))))
          .withColumn("lang", element_at(
            array(lit("en"), lit("fr"), lit("es"), lit("de"), lit("zh")),
            (pmod(col("doc_id"), lit(5)) + 1).cast("int")))
        graft.operators.TextAnalysis.pplBuckets(noisy,
          maxVocab = 100000).count()
      },
      // join-path bigram LM: ~100 bigrams/doc over a 400-token vocab →
      // ~160k-row count tables; doc-bigrams shuffle twice (c12 + c1
      // joins), nothing ever collects to the driver
      time("bigram_lm")(graft.operators.TextAnalysis.bigramLmScore(docs).count()),
      // hashed classifier: one shuffle-free scan (ordered fold per doc)
      time("classify")(graft.operators.TextAnalysis.classifierScore(docs).count()),
      // duplication fraction: shingle df + rejoin, 8-byte keys only
      time("dup_fraction")(Curation.dupFraction(docs).count()),
      // 64-source overlap matrix: distinct (source, shingle-hash)
      // projection then a shingle-keyed self-join (posting lists)
      time("overlap_matrix")(Curation.sourceOverlapMatrix(
        docs.withColumn("source", pmod(col("doc_id"), lit(64)).cast("string"))).count()),
      // silhouette = kmeans + one extra broadcast-matrix scan + k-group agg
      time("silhouette")(Similarity.silhouette(embs, k = 64, iters = 3).count()),
      // vocabulary coverage under web-noise: ~45×nDocs hapax types →
      // a multi-million-row frequency table through the distributed
      // range-partitioned cumulative sum (no single-task window)
      time("vocab_coverage_hapax") {
        val noisy = spark.range(nDocs.toLong).toDF("doc_id")
          .withColumn("text", concat_ws(" ",
            transform(sequence(lit(0), lit(49)), i =>
              when(i < 5, concat(lit("c"), pmod(i, lit(40))))
                .otherwise(concat(lit("u"), col("doc_id") * 50 + i)))))
        graft.operators.TextAnalysis.vocabCoverage(noisy).count()
      },
      // continuous-ingest dedup: the new batch is the planted near-dup
      // partners from the last 10% of ids (base docs stay in the
      // corpus), so expected recall is nDocs/500 cross-set pairs
      time("dedup_incremental") {
        val isBatch = col("doc_id") % 50 === 1 && col("doc_id") >= nDocs - nDocs / 10
        Dedup.incrementalNearDupPairs(
          docs.filter(isBatch), docs.filter(!isBatch)).count()
      },
      // persistent-index ingest: the corpus pays one index build; each
      // batch is then checked against the compact index instead of the
      // corpus text. Batch is FIXED at 400 docs (the planted near-dup
      // partners of the last 20k ids) so growing the corpus isolates
      // the per-batch cost curve; the batch frame materializes outside
      // the timed body (an arriving batch is already materialized).
      time("dedup_index_build") {
        val isBatch = col("doc_id") % 50 === 1 && col("doc_id") >= nDocs - 20000
        Dedup.writeMinhashIndex(docs.filter(!isBatch), "graft_probe_idx")
        0L
      },
      {
        val isBatch = col("doc_id") % 50 === 1 && col("doc_id") >= nDocs - 20000
        val batch =
          if (only.forall(_.contains("dedup_index_batch")))
            docs.filter(isBatch).localCheckpoint()
          else docs.limit(0)
        time("dedup_index_batch")(
          Dedup.indexedNearDupPairs(batch, "graft_probe_idx").count())
      },
      // index MAINTENANCE: appending the fixed 400-doc batch must cost
      // the batch, not the corpus — the probe's time should stay flat
      // as nDocs grows (the build above pays the corpus; this doesn't)
      {
        val isBatch = col("doc_id") % 50 === 1 && col("doc_id") >= nDocs - 20000
        val batch =
          if (only.forall(_.contains("dedup_index_append")))
            docs.filter(isBatch).localCheckpoint()
          else docs.limit(0)
        time("dedup_index_append") {
          Dedup.appendToMinhashIndex(batch, "graft_probe_idx"); 0L
        }
      },
      // the composed per-doc ingest decision: exact/near/quality gates
      // against the standing corpus — cost should track batch + one
      // corpus pass, like dedup_incremental
      time("ingest_decision") {
        val isBatch = col("doc_id") % 50 === 1 && col("doc_id") >= nDocs - nDocs / 10
        Curation.ingestDecision(docs.filter(isBatch), docs.filter(!isBatch)).count()
      },
      // nlist scales with the corpus: 100k vecs / 512 clusters keeps
      // the within-cluster quadratic term at ~200²/2 per cluster
      time("semantic_dedup")(Similarity.semanticDedup(embs, nlist = 512,
        threshold = 0.99).count()),
      // BM25: two corpus scans (stats row + score-and-top-k), no joins
      time("bm25")(Retrieval.bm25TopK(docs, Seq("w1", "w17", "w230"), k = 50).count()),
      // heavy hitters over an (nKeys×0.8)-distinct key stream with 7
      // planted hot keys at ~2.9% each (phi=0.02): the MG candidate +
      // exact passes shuffle only candidates, vs the naive full groupBy
      time("heavy_hitters") {
        val nKeys = sys.env.getOrElse("SPARK_GRAFT_PROBE_KEYS", "20000000").toLong
        val stream = spark.range(nKeys).select(
          when(col("id") % 5 === 0, concat(lit("hot"), pmod(col("id"), lit(7))))
            .otherwise(concat(lit("k"), col("id"))).as("k"))
        Sketches.heavyHitters(stream, "k", phi = 0.02).count()
      },
      time("hh_naive_groupby") {
        val nKeys = sys.env.getOrElse("SPARK_GRAFT_PROBE_KEYS", "20000000").toLong
        val stream = spark.range(nKeys).select(
          when(col("id") % 5 === 0, concat(lit("hot"), pmod(col("id"), lit(7))))
            .otherwise(concat(lit("k"), col("id"))).as("k"))
        stream.groupBy("k").agg(count(lit(1)).as("cnt"))
          .filter(col("cnt") >= (nKeys / 50)).count()
      },
      // pagerank: n nodes, ~4n directed edges (two deterministic
      // out-links per node, symmetrized), 3 iterations in one plan
      time("pagerank_1m") {
        val n = sys.env.getOrElse("SPARK_GRAFT_PROBE_NODES", "1000000").toLong
        val half = spark.range(n).toDF("src")
          .select(col("src"), explode(array(
            pmod(col("src") * 31 + 7, lit(n)),
            pmod(col("src") * 17 + 3, lit(n)))).as("dst"))
          .filter(col("src") =!= col("dst"))
        Graph.pagerank(half.union(half.select(col("dst").as("src"),
          col("src").as("dst"))).distinct(), iters = 3).count()
      },
      // k-core peeling on the same synthetic graph: 999992 of 1M
      // nodes have degree 4, eight have degree 3. k=3 is a one-round
      // fixpoint (the graph is its own 3-core); k=4 is the WORST-CASE
      // cascade — the eight under-degree seeds avalanche the whole
      // near-regular graph to an empty core over 16 count-gated peel
      // rounds of a shrinking 2M-edge set. rows = 3-core size.
      time("kcore_1m") {
        val n = sys.env.getOrElse("SPARK_GRAFT_PROBE_NODES", "1000000").toLong
        val half = spark.range(n).toDF("src")
          .select(col("src"), explode(array(
            pmod(col("src") * 31 + 7, lit(n)),
            pmod(col("src") * 17 + 3, lit(n)))).as("dst"))
          .filter(col("src") =!= col("dst"))
        val sym = half.union(half.select(col("dst").as("src"),
          col("src").as("dst"))).distinct()
        val full = Graph.kCore(sym, k = 3).count()
        require(full == n, s"3-core kept $full of $n nodes")
        val avalanche = Graph.kCore(sym, k = 4).count()
        require(avalanche == 0L, s"4-core avalanche left $avalanche nodes")
        full
      },
      // full decomposition on the same graph: every node's known
      // coreness is 3 (3-core = whole graph, 4-core empty), and the
      // 3-wavefront from the eight degree-3 seeds crosses the
      // expander in O(diameter) h-index rounds — sum-gated, one
      // observe-carried job per round
      time("coreness_1m") {
        val n = sys.env.getOrElse("SPARK_GRAFT_PROBE_NODES", "1000000").toLong
        val half = spark.range(n).toDF("src")
          .select(col("src"), explode(array(
            pmod(col("src") * 31 + 7, lit(n)),
            pmod(col("src") * 17 + 3, lit(n)))).as("dst"))
          .filter(col("src") =!= col("dst"))
        val sym = half.union(half.select(col("dst").as("src"),
          col("src").as("dst"))).distinct()
        val c = Graph.coreness(sym)
        val bad = c.filter(col("coreness") =!= 3L).count()
        require(bad == 0L, s"$bad nodes off the known coreness 3")
        c.count()
      },
      // the frontier mode on the same fixture: each node moves ONCE
      // (degree → 3), so total frontier volume is n against the
      // default's rounds × n — yet at 2M edges the measured result
      // still favors the default (stage overhead > data saved; see
      // BASELINE.md). The honest crossover sits beyond local-mode
      // scales; the probe keeps both sides measured.
      time("coreness_1m_frontier") {
        val n = sys.env.getOrElse("SPARK_GRAFT_PROBE_NODES", "1000000").toLong
        val half = spark.range(n).toDF("src")
          .select(col("src"), explode(array(
            pmod(col("src") * 31 + 7, lit(n)),
            pmod(col("src") * 17 + 3, lit(n)))).as("dst"))
          .filter(col("src") =!= col("dst"))
        val sym = half.union(half.select(col("dst").as("src"),
          col("src").as("dst"))).distinct()
        val c = Graph.coreness(sym, frontier = true)
        val bad = c.filter(col("coreness") =!= 3L).count()
        require(bad == 0L, s"$bad nodes off the known coreness 3")
        c.count()
      },
      // PPR and weighted SSSP on the same synthetic 1M-edge graph:
      // both must hold pagerank_1m's per-round join+aggregate shape
      time("ppr_1m") {
        val n = sys.env.getOrElse("SPARK_GRAFT_PROBE_NODES", "1000000").toLong
        val half = spark.range(n).toDF("src")
          .select(col("src"), explode(array(
            pmod(col("src") * 31 + 7, lit(n)),
            pmod(col("src") * 17 + 3, lit(n)))).as("dst"))
          .filter(col("src") =!= col("dst"))
        val edges = half.union(half.select(col("dst").as("src"),
          col("src").as("dst"))).distinct()
        val seeds = spark.range(16).toDF("node")
        Graph.personalizedPagerank(edges, seeds, iters = 3).count()
      },
      time("sssp_1m") {
        val n = sys.env.getOrElse("SPARK_GRAFT_PROBE_NODES", "1000000").toLong
        val half = spark.range(n).toDF("src")
          .select(col("src"), explode(array(
            pmod(col("src") * 31 + 7, lit(n)),
            pmod(col("src") * 17 + 3, lit(n)))).as("dst"))
          .filter(col("src") =!= col("dst"))
        val w = half.union(half.select(col("dst").as("src"), col("src").as("dst")))
          .distinct()
          .withColumn("w", (pmod(xxhash64(col("src"), col("dst")), lit(100)) + 1) / 100.0)
        Graph.weightedShortestPaths(w, spark.range(1).toDF("node"), rounds = 4).count()
      },
      // JL projection 64->16 over the full embedding corpus: one
      // shuffle-free scan
      time("jl_project")(Similarity.randomProjection(embs, k = 16).count()),
      // one-pass covariance fit + projection at corpus scale: the
      // shuffle carries partitions × d² doubles (the moment state),
      // never rows; the eigensolve is driver-side d×d
      time("pca_fit_project")(Similarity.pcaProject(embs, k = 16,
        iters = 10).count()),
      // the d-axis of the moment state's d² cost, at 4× the width:
      // buffers grow 16× (256² doubles) but stay per-partition — the
      // shuffle is still partitions × d², never rows × d²
      time("pca_fit_d256") {
        val wide = spark.range(nVecs.toLong).select(col("id").as("vec_id"),
          transform(sequence(lit(0), lit(255)),
            i => sin(col("id") * 256 + i)).as("embedding"))
          .repartition(cpus.toInt)
        Similarity.pcaProject(wide, k = 8, iters = 10).count()
      },
      // the LEARNED projection's ANN value, measured: vectors with an
      // 8-dim latent signal spread across 64 dims + per-dim noise.
      // Recall of the true cosine top-5 (100 queries) searched in
      // PCA-16 space must beat the data-oblivious JL-16 at the same
      // width — PCA concentrates the signal subspace, JL dilutes it
      // with noise dims. rows = PCA-space overlap (max 500).
      time("pca_vs_jl_recall") {
        val latent = latentEmbs(spark, nVecs.toLong, cpus.toInt)
        val truth = Similarity.bruteForceTopK(latent,
          latent.filter(col("vec_id") < 100), k = 5)
          .select(col("query_id"), col("neighbor_id"))
        def recall(space: DataFrame): Long =
          Similarity.bruteForceTopK(space, space.filter(col("vec_id") < 100), k = 5)
            .select(col("query_id"), col("neighbor_id")).intersect(truth).count()
        val pcaR = recall(asVec(Similarity.pcaProject(latent, k = 16, iters = 10),
          16, "p"))
        val jlR = recall(asVec(Similarity.randomProjection(latent, k = 16),
          16, "p_"))
        System.err.println(s"==   pca-16 recall $pcaR vs jl-16 $jlR (max 500)")
        require(pcaR > jlR, s"PCA-16 recall $pcaR did not beat JL-16 $jlR")
        pcaR
      },
      // PQ: 256-codeword books over 100k vecs — encode is one bounded
      // aggregate + a shuffle-free scan; ADC search reads codes only
      time("pq_encode")(Similarity.productQuantize(
        embs.select(col("vec_id"), col("embedding").cast("array<double>").as("embedding")),
        m = 8, k = 256).count()),
      time("pq_topk")(Similarity.pqTopK(
        embs.select(col("vec_id"), col("embedding").cast("array<double>").as("embedding")),
        embs.filter(col("vec_id") < 100)
          .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding")),
        topk = 5, m = 8, k = 256).count()),
      // IVF routing composed on top: each query ADC-scans only its
      // nprobe/nlist fraction of the code table
      time("ivfpq_topk")(Similarity.ivfPqTopK(
        embs.select(col("vec_id"), col("embedding").cast("array<double>").as("embedding")),
        embs.filter(col("vec_id") < 100)
          .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding")),
        topk = 5, nlist = 256, nprobe = 16, m = 8, k = 256).count()),
      // persisted ANN index: the build pays the corpus once; the query
      // reads only probed buckets, so its time should stay flat as
      // nVecs grows; the append encodes a fixed 100-vector batch under
      // the frozen quantizer — also corpus-independent
      time("ann_index_build") {
        Similarity.writeAnnIndex(
          embs.select(col("vec_id"), col("embedding").cast("array<double>").as("embedding")),
          "graft_probe_ann", nlist = 256, m = 8, k = 256)
        0L
      },
      time("ann_index_query")(Similarity.annIndexTopK(
        embs.filter(col("vec_id") < 100)
          .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding")),
        "graft_probe_ann", topk = 5, nprobe = 16).count()),
      time("ann_index_vec_append") {
        Similarity.appendToAnnIndex(
          embs.filter(col("vec_id") < 100)
            .select((col("vec_id") + 10000000L).as("vec_id"),
              col("embedding").cast("array<double>").as("embedding")),
          "graft_probe_ann")
        0L
      },
      // the streaming-ingest append: idempotence adds a read of the
      // routed buckets only — still batch-sized, not corpus-sized
      time("ann_index_novel_append") {
        Similarity.appendNovelToAnnIndex(
          embs.filter(col("vec_id") < 100)
            .select((col("vec_id") + 20000000L).as("vec_id"),
              col("embedding").cast("array<double>").as("embedding")),
          "graft_probe_ann")
        0L
      },
      // quantizer drift at scale (round 13): grow the persisted index
      // by a 20k-vector region the quantizer never saw (frozen-
      // quantizer appends — the production growth path), measure
      // recall@5 of drifted queries against exact ranking, then
      // requantize (Lloyd-refined retrain over the current corpus)
      // and measure again. The drift signal and the repair, priced
      // at the 100k-vec probe index.
      time("ann_drift_requantize") {
        val nonce = math.abs(System.nanoTime())
        val idx = s"graft_probe_adrift_$nonce"
        // a STRUCTURED corpus (the latent-signal family the PCA probes
        // use): drift is only measurable relative to structure the
        // quantizer captured, so the index builds Lloyd-refined — the
        // hash-random probe embeddings quantize to near-global-mean
        // centroids where every residual reads ~equally high
        val base = latentEmbs(spark, nVecs.toLong, cpus.toInt).localCheckpoint()
        Similarity.writeAnnIndex(base, idx, nlist = 256, m = 8, k = 256,
          refineIters = 2)
        // drifted region: same latent structure (so exact top-5 is
        // well-defined among them), displaced off the trained manifold
        val drifted = latentEmbs(spark, 20000L, cpus.toInt)
          .select((col("vec_id") + 50000000L).as("vec_id"),
            transform(col("embedding"), x => x + lit(2.0)).as("embedding"))
          .localCheckpoint()
        val rIn = Similarity.annAssignmentResidual(base, idx).collect()(0).getDouble(1)
        val rDrift = Similarity.annAssignmentResidual(drifted, idx).collect()(0).getDouble(1)
        Similarity.appendToAnnIndex(drifted, idx)
        val full = base.unionByName(drifted).localCheckpoint()
        val dq = drifted.filter(col("vec_id") < 50000200L).localCheckpoint()
        def recall5m(m: Int): Double = {
          val exact = Similarity.bruteForceTopK(full, dq, k = 5)
            .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
          val approx = Similarity.annIndexTopK(dq, idx, topk = 5, nprobe = 16, m = m)
            .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
          (exact intersect approx).size.toDouble / exact.size
        }
        def recall5(): Double = recall5m(8)
        val before = recall5()
        val stats = Similarity.requantizeAnnIndex(full, idx,
          nlist = 256, m = 8, k = 256).collect()(0)
        val after = recall5()
        // the dense-region lever, MEASURED: nlist=512 alone recovers
        // nothing (0.144 either way — it was never a list-count
        // problem), finer CODES do: m=16 recovers past the
        // pre-requantize level. Within the displaced region every
        // candidate shares the same offset, so ranking is decided by
        // the latent signal the m=8 codes can no longer resolve once
        // codebooks retrain over the union — requantizeAnnIndex takes
        // the quantizer shape (nlist/m/k) for exactly this
        Similarity.requantizeAnnIndex(full, idx,
          nlist = 512, m = 16, k = 256).collect()
        val wide = recall5m(16)
        System.err.println(f"==   ann_drift: residual in-dist $rIn%.4f vs " +
          f"drifted $rDrift%.4f; recall@5 drifted-queries $before%.3f -> " +
          f"$after%.3f after requantize (pre/post residual " +
          f"${stats.getDouble(1)}%.4f/${stats.getDouble(2)}%.4f), " +
          f"$wide%.3f after nlist=512/m=16 requantize")
        require(rDrift > rIn, "planted drift must read above the in-dist residual")
        // MEASURED FINDING (round 13, 100k tier): the same-shape
        // requantize repairs the assignment residual (0.0326 ->
        // 0.0014) yet drifted-query recall@5 moved 0.307 -> 0.144,
        // and the nlist=512 leg proved it is NOT a list-count
        // problem — it is code resolution (see above). The contract:
        // signal separates, residual repairs, collapse guarded, and
        // the finer-codes requantize recovers the regression.
        require(after > 0.05, "post-requantize recall collapsed")
        require(wide > after,
          f"finer-codes requantize must recover dense-region recall: $after%.3f -> $wide%.3f")
        (after * 1000).toLong
      },
      // BOUNDED retrain at the probe tier (r14 verdict #5): the
      // auto-remediation loop's requantize cost at billion-vector
      // scale must not be Lloyd-rounds × corpus. Same drifted fixture
      // as ann_drift_requantize; requantize once with full-corpus
      // training and once with the md5-gated sample capped at ~20k
      // training rows (the streamingAnnIngest retrainSampleRows
      // discipline). Green = sampled recall within 0.05 of full,
      // residual repaired, and the sampled retrain's wall at or below
      // the full one (the training scans shrink ~6×; the shared
      // full-corpus encode pass is the floor both pay).
      time("ann_retrain_sampled") {
        val nonce = math.abs(System.nanoTime())
        val base = latentEmbs(spark, nVecs.toLong, cpus.toInt).localCheckpoint()
        val drifted = latentEmbs(spark, 20000L, cpus.toInt)
          .select((col("vec_id") + 50000000L).as("vec_id"),
            transform(col("embedding"), x => x + lit(2.0)).as("embedding"))
          .localCheckpoint()
        val full = base.unionByName(drifted).localCheckpoint()
        val dq = drifted.filter(col("vec_id") < 50000200L).localCheckpoint()
        val rate = 20000.0 / (nVecs.toLong + 20000L)
        def recall5(idx: String): Double = {
          val exact = Similarity.bruteForceTopK(full, dq, k = 5)
            .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
          val approx = Similarity.annIndexTopK(dq, idx, topk = 5, nprobe = 16)
            .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
          (exact intersect approx).size.toDouble / exact.size
        }
        def leg(tag: String, r: Double): (Double, Double, Double) = {
          val idx = s"graft_probe_rqs_${tag}_$nonce"
          Similarity.writeAnnIndex(base, idx, nlist = 256, m = 8, k = 256,
            refineIters = 2)
          Similarity.appendToAnnIndex(drifted, idx)
          val t0 = System.nanoTime()
          val stats = Similarity.requantizeAnnIndex(full, idx,
            nlist = 256, m = 8, k = 256, trainSampleRate = r).collect()(0)
          val sec = (System.nanoTime() - t0) / 1e9
          (sec, recall5(idx), stats.getDouble(2))
        }
        val (fullSec, fullRec, fullRes) = leg("full", 1.0)
        val (sampSec, sampRec, sampRes) = leg("samp", rate)
        System.err.println(f"==   ann_retrain_sampled: full $fullSec%.1f s " +
          f"recall $fullRec%.3f residual $fullRes%.4f; sampled (rate " +
          f"$rate%.3f) $sampSec%.1f s recall $sampRec%.3f residual " +
          f"$sampRes%.4f")
        require(sampRec >= fullRec - 0.05,
          f"sampled retrain recall $sampRec%.3f must be within 0.05 of full $fullRec%.3f")
        require(sampRes <= fullRes + 0.01, "sampled retrain must repair the residual")
        require(sampSec <= fullSec * 1.1,
          f"sampled retrain ($sampSec%.1f s) must not cost more than full ($fullSec%.1f s)")
        (sampRec * 1000).toLong
      },
      // Lloyd's k-means: per round one k×dims aggregate + one
      // broadcast-matrix assignment scan; rounds are materialized
      time("kmeans")(Similarity.kmeansCensus(embs, k = 64, iters = 3).count()),
      // triangle count on the same synthetic graph as pagerank_1m:
      // degree-oriented wedge join, hub fan-out bounded
      time("triangles_1m") {
        val n = sys.env.getOrElse("SPARK_GRAFT_PROBE_NODES", "1000000").toLong
        val half = spark.range(n).toDF("src")
          .select(col("src"), explode(array(
            pmod(col("src") * 31 + 7, lit(n)),
            pmod(col("src") * 17 + 3, lit(n)))).as("dst"))
          .filter(col("src") =!= col("dst"))
        Graph.triangleCount(half.union(half.select(col("dst").as("src"),
          col("src").as("dst"))).distinct()).count()
      },
      // winnowing: fingerprint selection is scan-stage HOFs; the
      // shared-pair join moves only the ~2/(w+1)-density sample
      time("winnow_census")(
        graft.operators.TextAnalysis.winnowCensus(docs).count()),
      time("winnow_pairs")(
        graft.operators.TextAnalysis.winnowSharedPairs(docs, minShared = 2).count()),
      // CMS build over the exploded token stream (~20M rows at 200k
      // docs): the aggregation key space is depth x width, so the
      // shuffle is bounded however large the vocabulary; estimates add
      // one broadcast probe of topK x depth rows
      time("cms_estimates") {
        val toks = docs.select(explode(split(lower(col("text")), " ")).as("tok"))
        Sketches.cmsEstimates(toks, "tok", topK = 20).count()
      },
      // AllPairs prefix-filtered set cosine on 5-word synthetic names
      // (bigram features): candidate work rides rare-token posting
      // lists, never the name cross product
      time("er_cosine") {
        val names = spark.range(nDocs.toLong).toDF("id")
          .withColumn("name", concat_ws(" ", transform(sequence(lit(0), lit(4)), i =>
            concat(lit("n"), pmod(xxhash64(col("id") * 5 + i +
              when(col("id") % 50 === 1 && i === 4, lit(1)).otherwise(lit(0))),
              lit(2000))))))
        Dedup.tokenCosinePairs(names, "name", "id",
          threshold = 0.7, shingle = 2).count()
      },
      // phash census + band-blocked near-dup pairs over the payloads
      time("phash_pairs") {
        val withBin = graft.operators.Multimodal.attachBinary(
          docs.withColumn("source", lit("probe")))
        graft.operators.Multimodal.phashNearDupPairs(withBin).count()
      },
      // the composed train-prep chain: quality column → per-source heap
      // cap → shard hash → manifest. Two narrow-output exchanges; cost
      // must track the corpus scan, not the cap targets
      time("train_prep") {
        // slim-heap shape: ntok projects in the scan, the heap never
        // holds text (a 2000-doc heap of full documents per source is
        // the memory bill; 32-byte rows are not)
        val srcd = docs
          .filter(graft.operators.TextAnalysis.qualityCol(col("text")) >= 0.3)
          .select(pmod(col("doc_id"), lit(64)).cast("string").as("source"),
            col("doc_id"),
            pmod(xxhash64(col("doc_id")), lit(16384L)).as("pri"),
            size(split(col("text"), " ")).cast("long").as("ntok"))
        Relational.topKPerKey(srcd, Seq(col("source")),
            Seq(col("pri").asc, col("doc_id").asc), 2000)
          .withColumn("shard", pmod(xxhash64(col("doc_id") + 99), lit(64L)))
          .groupBy("shard")
          .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("n_tokens"))
          .count()
      },
      // epoch shuffle: 2 epochs × corpus → shard + in-shard position;
      // one exchange on (epoch, shard), per-shard sorts only
      time("epoch_shuffle") {
        val epochs = spark.range(0, 2).toDF("epoch")
        val assigned = docs.select("doc_id").crossJoin(epochs)
          .withColumn("h", xxhash64(col("epoch") * 1000000007L + col("doc_id")))
          .withColumn("shard", pmod(col("h"), lit(64L)))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("epoch", "shard").orderBy(col("h"), col("doc_id"))
        assigned.withColumn("pos", row_number().over(w)).count()
      },
      // CDC apply: merge a ~10%-of-corpus delete/upsert delta into the
      // snapshot — one corpus scan + a broadcast anti-join on the
      // delta's id set; cost must not exceed ~a corpus pass
      time("apply_delta") {
        val bk = pmod(xxhash64(col("doc_id")), lit(16384L))
        val dels = docs.filter(bk % 20 === 0)
          .select(col("doc_id"), col("text"), lit("D").as("op"))
        val ups = docs.filter(bk % 17 === 2)
          .select(col("doc_id"), concat(col("text"), lit(" u")).as("text"),
            lit("U").as("op"))
        Curation.applyDelta(docs.select("doc_id", "text"),
          dels.unionByName(ups)).count()
      },
      // full-vocab keywords: ~20M (doc, term) tf rows, vocab-sized df
      // join on the term, heap cut per doc — no window over the corpus
      time("keywords")(Retrieval.keywordsTopK(docs, k = 3).count()),
      // streaming SCD2 maintenance: a 1024-bucket dimension over nDocs
      // keys; a FIXED 2000-event batch touching ~2000 keys must
      // re-derive only its buckets — cost stays flat as the dimension
      // grows (the base dimension materializes OUTSIDE the timing, as
      // a stored table would)
      {
        import graft.streaming.DimensionStreams
        val dimPath = s"${Bench.shmLocalDir}/graft_probe_scd2_$nDocs"
        val wanted = only.forall(_.contains("scd2_maintain"))
        // batch keys stride by the bucket count → ONE bucket touched;
        // the pruned read is 1/1024 of the dimension at any size
        val batch = spark.range(2000).select(
          (col("id") * 1024L).as("user_id"),
          (col("id") + 7000000000L).as("event_id"),
          lit("click").as("event_type"),
          (col("id") * 1000L + 500L).as("ms"))
        if (wanted) {
          spark.range(nDocs.toLong).select(
            col("id").as("user_id"), lit(1L).as("version"),
            lit("view").as("state"), (col("id") * 1000L).as("valid_from_ms"),
            lit(null).cast("long").as("valid_to_ms"), lit(true).as("is_current"),
            col("id").as("tie"), pmod(col("id"), lit(1024L)).as("bucket"))
            .write.partitionBy("bucket")
            .mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(dimPath)
        }
        time("scd2_maintain") {
          val dir = java.nio.file.Files.createTempDirectory("graft-scd2probe").toString
          batch.coalesce(1).write.parquet(s"$dir/in")
          val q = DimensionStreams.streamingScd2(
            spark.readStream.schema(batch.schema).parquet(s"$dir/in"),
            dimPath, s"$dir/ckpt", nBuckets = 1024)
          try q.processAllAvailable() finally q.stop()
          0L
        }
      },
      // recrawl delta over the full corpus: ~5% dropped, ~6% rewritten,
      // 4% new — the diff full-outer-joins (id, md5) projections only,
      // never text; cost is two scans + one slim join at any size
      time("snapshot_diff") {
        val bk = pmod(xxhash64(col("doc_id")), lit(16384L))
        val next = docs.filter(bk % 20 =!= 0)
          .select(col("doc_id"),
            when(bk % 17 === 2, concat(col("text"), lit(" u")))
              .otherwise(col("text")).as("text"))
          .unionAll(spark.range(nDocs.toLong, nDocs.toLong + nDocs / 25)
            .toDF("doc_id")
            .withColumn("text", concat(lit("fresh doc "), col("doc_id"))))
        Curation.snapshotDiff(docs, next, "doc_id", Seq("text")).count()
      }) ++ {
      // materialized-view maintenance on the snapshot delta, with the
      // base view STORED (checkpointed outside the timing, as a
      // deployment would): the timed work is diff + delta-only
      // aggregation + a 64-row merge — it must not re-tokenize the
      // unchanged corpus. Snapshots materialize outside the timings
      // too (real snapshots are parquet on disk, not a
      // regenerate-per-scan expression tree).
      val bk = pmod(xxhash64(col("doc_id")), lit(16384L))
      val srcd = docs.withColumn("source",
        pmod(col("doc_id"), lit(64)).cast("string"))
      val next = srcd.filter(bk % 20 =!= 0)
        .select(col("doc_id"), col("source"),
          when(bk % 17 === 2, concat(col("text"), lit(" u")))
            .otherwise(col("text")).as("text"))
        .unionAll(spark.range(nDocs.toLong, nDocs.toLong + nDocs / 25)
          .toDF("doc_id")
          .select(col("doc_id"), pmod(col("doc_id"), lit(64)).cast("string").as("source"),
            concat(lit("fresh doc "), col("doc_id")).as("text")))
      val wanted = only.forall(o =>
        o.contains("incr_stats") || o.contains("direct_stats"))
      val (prevM, nextM) =
        if (wanted) (srcd.localCheckpoint(), next.localCheckpoint())
        else (srcd.limit(0), next.limit(0))
      val view =
        if (wanted)
          prevM.groupBy("source").agg(count(lit(1)).as("n_docs"),
            sum(size(split(lower(col("text")), " "))).cast("long").as("n_tokens"))
            .localCheckpoint()
        else srcd.limit(0)
      Seq(
        time("incr_stats")(
          Curation.incrementalStats(prevM, nextM, baseView = Some(view)).count()),
        // the cost it replaces: re-tokenizing the whole next snapshot
        time("direct_stats")(
          nextM.groupBy("source").agg(count(lit(1)).as("n_docs"),
            sum(size(split(lower(col("text")), " "))).cast("long").as("n_tokens"))
            .count()))
    } ++ {
      // relational probes at 10M rows (~17x the sf0.1 lineitem)
      val nOrd = sys.env.getOrElse("SPARK_GRAFT_PROBE_ORDERS", "10000000").toLong
      val ord = synthOrders(spark, nOrd)
      ord.count() // generation warm-up
      Seq(
        time("rel_agg_10m")(ord.groupBy("o_status")
          .agg(count("*"), sum("o_totalprice"), avg("o_totalprice"),
            approx_count_distinct("o_custkey")).count()),
        time("rel_topk_custom_10m")(Relational.topKPerKey(ord,
          Seq(col("o_status")), Seq(col("o_totalprice").desc, col("o_orderkey").asc),
          10).count()),
        time("rel_window_topk_10m") {
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy("o_custkey").orderBy(col("o_totalprice").desc)
          ord.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2).count()
        },
        // bloom shuffle-cut probe: 2M dim keys (16 MB estimate — above
        // the broadcast threshold, so the plain join sort-merge
        // shuffles all 10M fact rows) over a 100M key space (2%
        // selectivity). The bloom build costs one dim pass and its
        // ~2.4 MB sketch broadcasts, so the bloomed join shuffles only
        // the ~200k matching fact rows (+fpp)
        time("rel_join_plain_10m") {
          val fact = ord.withColumn("fk", pmod(xxhash64(col("o_orderkey") + 29),
            lit(100000000L)))
          fact.join(spark.range(0, 100000000L, 50).toDF("k"),
            col("fk") === col("k")).count()
        },
        time("rel_join_bloom_10m") {
          val fact = ord.withColumn("fk", pmod(xxhash64(col("o_orderkey") + 29),
            lit(100000000L)))
          BloomJoin.preFilteredJoin(fact, spark.range(0, 100000000L, 50).toDF("k"),
            "fk", "k", expectedItems = 2000000L).count()
        },
        // KMV profiler over 10M rows × 4 columns (one 10M-distinct, one
        // 1M-distinct): the melt is 40M rows but the aggregation
        // buffer caps at cols×partitions×256 longs — vs the naive
        // 2×count(DISTINCT) expand that shuffles every distinct value
        // collect() (tiny outputs), not count(): count-after-aggregate
        // lets Catalyst prune the aggregate expressions themselves
        time("kmv_profile_10m")(Sketches.profile(ord, Seq(
          "o_orderkey" -> col("o_orderkey"),
          "o_custkey" -> col("o_custkey"),
          "o_status" -> col("o_status"),
          "o_totalprice" -> col("o_totalprice").cast("decimal(12,2)")))
          .collect().length.toLong),
        time("profile_naive_distinct_10m")(
          ord.select(
            countDistinct(col("o_orderkey")), countDistinct(col("o_custkey")),
            countDistinct(col("o_status")),
            countDistinct(col("o_totalprice").cast("decimal(12,2)")))
            .collect().length.toLong),
        // deterministic-sample quantiles at 10M rows: the heap plan
        // exchanges ≤ partitions×512 rows per status group
        time("sample_quantiles_10m")(Sketches.sampleQuantiles(ord,
          "o_status", "o_totalprice", "o_orderkey").collect().length.toLong),
        // KMV set algebra across 64 sources at probe-doc scale: the
        // pair stage sees only sources×256 sketch longs
        time("kmv_source_ops")(Sketches.kmvSourceOps(
          docs.withColumn("source", pmod(col("doc_id"), lit(64)).cast("string")))
          .collect().length.toLong),
        // sketch-only mode: drops the exact posting-list branch — the
        // pair algebra runs on sources×256 longs alone
        time("kmv_source_ops_sketch")(Sketches.kmvSourceOps(
          docs.withColumn("source", pmod(col("doc_id"), lit(64)).cast("string")),
          withExact = false)
          .collect().length.toLong))
    } ++ {
      // zone-map metadata pruning at 10M rows: a FIXED-width key range
      // (50k keys) must cost the same as the corpus grows — the full
      // scan is the growing cost it replaces. Layout written outside
      // the timings (it's the sink's job, amortized over every query).
      val wanted = only.forall(o => o.exists(_.startsWith("zonemap")))
      val zmPath = java.nio.file.Files.createTempDirectory("graft_probe_zm").toString
      val zmStats = if (wanted) {
        val nOrd = sys.env.getOrElse("SPARK_GRAFT_PROBE_ORDERS", "10000000").toLong
        // 512 files: the realistic shape (a 100 TB table is millions
        // of files; at 64 local files both paths are footer-cheap and
        // indistinguishable — the zone map's win IS the file count)
        graft.sources.FileIO.sortedRoundTrip(synthOrders(spark, nOrd), zmPath,
          "o_orderkey", partitions = 512)
        graft.sources.ZoneMap.build(spark, zmPath, Seq("o_orderkey")).localCheckpoint()
      } else spark.range(0).toDF("file").limit(0)
      val zmLo = lit(1000000L); val zmHi = lit(1050000L)
      Seq(
        time("zonemap_build")(
          graft.sources.ZoneMap.build(spark, zmPath, Seq("o_orderkey")).count()),
        time("zonemap_full")(
          spark.read.parquet(zmPath)
            .filter(col("o_orderkey").between(zmLo, zmHi))
            .agg(count(lit(1)), sum("o_totalprice")).collect().length.toLong),
        time("zonemap_pruned")(
          graft.sources.ZoneMap.prunedRead(spark, zmStats,
              spark.read.parquet(zmPath).schema, "o_orderkey", zmLo, zmHi)
            .agg(count(lit(1)), sum("o_totalprice")).collect().length.toLong))
    } ++ {
      // AUTOMATIC manifest-segment pruning at ingest scale: 4M rows
      // arrive as 32 key-ranged appends (the natural time-clustered
      // shape of continuous ingest) into ONE manifest version — 128
      // files. A fixed-width range then hits one segment; the probe
      // compares the same plain `spark.table(t).filter(range)` with
      // the optimizer rule off (opens every segment) vs on
      // (catalog-decided single segment). The ratio is file-open
      // bound locally; at a metastore + object store, the off leg is
      // one round-trip per segment of history, the on leg is one
      // catalog listing. Layout built outside the timings.
      val wanted = only.forall(o => o.exists(_.startsWith("segprune")))
      val spT = "graft_probe_segprune"
      val nSeg = 32
      val spRows = sys.env.getOrElse("SPARK_GRAFT_PROBE_SEG_ROWS", "4000000").toLong
      if (wanted) {
        val per = spRows / nSeg
        val all = synthOrders(spark, spRows)
        graft.sources.Bucketing.writeBucketed(
          all.filter(col("o_orderkey") < per), spT, "o_custkey", 4,
          statsCols = Seq("o_orderkey"))
        (1 until nSeg).foreach { i =>
          graft.sources.Bucketing.appendBucketed(
            all.filter(col("o_orderkey") >= i * per &&
              col("o_orderkey") < (i + 1) * per), spT, "o_custkey")
        }
        require(graft.sources.Bucketing.segmentCount(spark, spT) == nSeg)
      }
      val spLo = spRows / 2 + 1000L
      val spHi = spLo + spRows / nSeg / 2 // well inside one segment
      def spQuery() = spark.table(spT)
        .filter(col("o_orderkey").between(spLo, spHi))
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("s"))
      def ruleOff[A](body: => A): A = {
        val saved = spark.experimental.extraOptimizations
        spark.experimental.extraOptimizations =
          saved.filterNot(_.isInstanceOf[graft.plans.SegmentPruneRule])
        try body finally spark.experimental.extraOptimizations = saved
      }
      if (wanted) graft.plans.SegmentPrune.ensure(spark)
      var spAll: Seq[String] = Nil
      Seq(
        time("segprune_scan_all")(ruleOff {
          val r = spQuery().collect(); spAll = r.map(_.toString).toSeq; r.length.toLong
        }),
        time("segprune_auto") {
          val df = spQuery()
          val r = df.collect()
          // the engine's number must come from an actually-pruned scan;
          // AQE wraps stages, so descend through adaptive/stage nodes
          def scans(p: org.apache.spark.sql.execution.SparkPlan)
              : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = {
            val here = p match {
              case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
              case _ => Nil
            }
            val kids = p match {
              case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
                Seq(a.executedPlan)
              case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
                Seq(q.plan)
              case o => o.children
            }
            here ++ kids.flatMap(scans)
          }
          val parts = scans(df.queryExecution.executedPlan)
            .map(_.metrics("numPartitions").value).sum
          require(parts == 1L, s"auto leg read $parts segments, wanted 1")
          require(spAll.isEmpty || r.map(_.toString).toSeq == spAll,
            "pruned result diverged from full-scan result")
          r.length.toLong
        })
    } ++ {
      // paragraph rewrite at probe-doc scale; the viral variant plants
      // ONE boilerplate unit in every 10th doc (nDocs/10 copies of a
      // single hash) — the min(struct) keep-first aggregate must not
      // serialize those copies through one window task
      val viral = docs.withColumn("text",
        when(col("doc_id") % 10 === 0,
          concat(lit("shared boiler plate unit of fifteen tokens exactly here now one two three four five "),
            col("text")))
          .otherwise(col("text")))
      // incremental probe: a FIXED 2000-doc batch against the unit
      // index — per-batch cost must stay flat as the indexed corpus
      // grows (compare runs at 200k vs 1M probe docs)
      val unitWanted = only.forall(o => o.exists(_.startsWith("para_")) ||
        o.exists(_.startsWith("unit_")) || o.exists(_.startsWith("span_incr")) ||
        o.contains("incr_backfill_gate"))
      // batch size is env-dialable (SPARK_GRAFT_PROBE_BATCH, default
      // 2000): 2k exercises the collect+broadcast micro-batch regime,
      // 500k the gated scan/semi-join backfill regime — the cost
      // curve across both regimes and corpus sizes goes in BASELINE.md.
      // lazy: a restricted run that selects none of its consumers must
      // not pay a 500k-doc generation + checkpoint job
      val batchDocs = sys.env.getOrElse("SPARK_GRAFT_PROBE_BATCH", "2000").toLong
      lazy val incrBatch = spark.range(9000000L, 9000000L + batchDocs).toDF("doc_id")
        .withColumn("text", probeText(col("doc_id")))
        .repartition(cpus.toInt).localCheckpoint()
      // the index is para_incr_batch's INPUT: stage it outside the
      // timings so a restricted run (only=para_incr_batch) still has
      // it; the build timing below measures a rebuild
      if (unitWanted && !spark.catalog.tableExists("graft_probe_unit_idx"))
        Dedup.writeUnitIndex(docs, "graft_probe_unit_idx", width = 15)
      if (only.exists(o => o.contains("span_incr_batch") ||
            o.contains("incr_backfill_gate")) &&
          !spark.catalog.tableExists("graft_probe_span_idx"))
        Dedup.writeSpanIndex(docs, "graft_probe_span_idx", span = 20)
      Seq(
        time("para_dedup")(Dedup.paragraphDedup(docs, width = 15).count()),
        time("para_dedup_viral")(Dedup.paragraphDedup(viral, width = 15).count()),
        time("unit_index_build") {
          Dedup.writeUnitIndex(docs, "graft_probe_unit_idx", width = 15)
          spark.table("graft_probe_unit_idx").count()
        },
        time("para_incr_batch")(
          Dedup.paragraphDedupIncremental(incrBatch, "graft_probe_unit_idx",
            width = 15).count()),
        // span-index maintenance at probe scale: build once, rewrite
        // a FIXED 2k-doc batch — per-batch cost must track the batch
        // and its probed buckets, not the standing corpus
        time("span_incr_build") {
          Dedup.writeSpanIndex(docs, "graft_probe_span_idx", span = 20)
          spark.table("graft_probe_span_idx").count()
        },
        time("span_incr_batch")(
          Dedup.spanRewriteIncremental(incrBatch, "graft_probe_span_idx", span = 20)
            .agg(sum(col("n_before") - col("n_after"))).head().getLong(0)),
        // BACKFILL gate pin (VERDICT r6 #4): a 100k-doc batch through
        // all three incremental probe paths crosses every collect
        // threshold (~600k unit hashes, ~8.1M span hashes, ~1.6M band
        // hashes — ungated these ship >100 MB of task results to the
        // driver). The listener pins TOTAL driver result bytes far
        // below any full hash collect: the gated run must stay
        // distributed (limit-probe + plain scan / left-semi join).
        time("incr_backfill_gate") {
          // (time() already skips unselected tags before this body runs)
          val backfill = spark.range(9100000L, 9200000L).toDF("doc_id")
            .withColumn("text", probeText(col("doc_id")))
            .repartition(cpus.toInt).localCheckpoint()
          if (!spark.catalog.tableExists("graft_probe_idx_bf"))
            Dedup.writeMinhashIndex(docs, "graft_probe_idx_bf")
          val resultBytes = new java.util.concurrent.atomic.AtomicLong(0)
          val stageSite = new java.util.concurrent.ConcurrentHashMap[Int, String]()
          val siteBytes = new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()
          val listener = new org.apache.spark.scheduler.SparkListener {
            override def onStageSubmitted(
                ss: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit =
              stageSite.put(ss.stageInfo.stageId, ss.stageInfo.name.take(120))
            override def onTaskEnd(
                te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
              if (te.taskMetrics != null) {
                resultBytes.addAndGet(te.taskMetrics.resultSize)
                val site = stageSite.getOrDefault(te.stageId, "?")
                siteBytes.computeIfAbsent(site,
                  _ => new java.util.concurrent.atomic.AtomicLong(0))
                  .addAndGet(te.taskMetrics.resultSize)
              }
          }
          spark.sparkContext.addSparkListener(listener)
          // deterministic bus drain, not a fixed sleep — the old
          // 2×1.5s + 2s sleeps ran INSIDE time() and inflated every
          // recorded gate timing by ~5 s
          def mark(tag: String): Unit = {
            org.apache.spark.graft.ListenerBridge.drain(spark.sparkContext)
            System.err.println(f"== incr_backfill_gate after $tag: " +
              f"${resultBytes.get() / 1024.0 / 1024.0}%.1f MB")
          }
          try {
            val n1 = Dedup.paragraphDedupIncremental(
              backfill, "graft_probe_unit_idx", width = 15).count()
            mark("para")
            val n2 = Dedup.spanRewriteIncremental(
              backfill, "graft_probe_span_idx", span = 20).count()
            mark("span")
            val res3 = Dedup.indexedNearDupPairs(backfill, "graft_probe_idx_bf")
            // count(), NOT collect(): the count's lazy job still
            // executes every upstream exchange (a regression that lets
            // Catalyst auto-broadcast the 126 MB shingle frame runs
            // DURING this job and lands in the gate), but the probe's
            // own output never rides task results — so the 32 MB gate
            // needs NO exclusion and covers every byte. (Exclusion
            // heuristics all had holes: last-job ordering fails open
            // with AQE off and races broadcast jobs; callsite-name
            // matching fails because Spark 4 runs EVERY SQL collect's
            // result stage via SQLExecution.withThreadLocalCaptured,
            // so internal hash collects and the legitimate output get
            // the same generic CompletableFuture callsite.)
            val n3 = res3.count()
            if (sys.env.contains("SPARK_GRAFT_PROBE_EXPLAIN"))
              System.err.println(res3.queryExecution.executedPlan.toString.take(12000))
            org.apache.spark.graft.ListenerBridge.drain(spark.sparkContext)
            import scala.jdk.CollectionConverters._
            val mb = resultBytes.get() / 1024.0 / 1024.0
            System.err.println(f"== incr_backfill_gate driver result bytes: " +
              f"$mb%.1f MB total (no exclusions — the probe's output is a count)")
            siteBytes.asScala.toSeq.sortBy(-_._2.get()).take(8).foreach { case (s, b) =>
              System.err.println(f"==   ${b.get() / 1024.0 / 1024.0}%8.1f MB  $s")
            }
            require(resultBytes.get() < 32L * 1024 * 1024,
              f"backfill shipped $mb%.1f MB of task results to the driver — " +
                "a hash collect leaked past its gate")
            n1 + n2 + n3
          } finally spark.sparkContext.removeSparkListener(listener)
        },
        // maintained cluster closure: persist the corpus's near-dup
        // assignment once, then ingest a FIXED 100-pair batch — the
        // union-find is batch-sized, the lookup bucket-pruned
        time("cluster_incr_build") {
          Dedup.writeClusterIndex(
            Dedup.minhashNearDupPairs(docs, k = 64, bands = 16, threshold = 0.7),
            "graft_probe_cluster_idx")
          spark.table("graft_probe_cluster_idx").count()
        },
        // EM calibration at ~9.5M blocked pairs: the corpus-sized work
        // is ONE combo-count aggregate; the 5 EM rounds run on ≤8 rows
        time("em_calibrate") {
          val recs = spark.range(300000).toDF("id")
            .withColumn("blk", (col("id") / 64).cast("long"))
            .withColumn("f1", pmod(xxhash64(col("id") * 3 + 1), lit(4)))
            .withColumn("f2", pmod(xxhash64(col("id") * 5 + 2), lit(6)))
            .withColumn("f3", pmod(xxhash64(col("id") * 7 + 3), lit(9)))
          Dedup.fellegiSunterEM(recs, "blk", "id", Seq("f1", "f2", "f3"),
            iters = 5).count()
        },
        time("cluster_incr_batch") {
          val batch = spark.range(100).toDF("i")
            .select((col("i") * 50).as("a_id"), lit(9500000L).as("_b"))
            .select(col("a_id"), (col("_b") + col("a_id")).as("b_id"))
          Dedup.clusterAssignIncremental(batch, "graft_probe_cluster_idx")
          Dedup.clusterAssignments(spark, "graft_probe_cluster_idx")
            .filter(col("doc_id") >= 9500000L).count()
        },
        // a 4.5M-pair backfill batch (500k 10-node chains) crosses the
        // driver threshold and must route through the distributed
        // root-graph path — no driver union-find, no driver OOM; the
        // assignment count and a spot-checked chain root prove the
        // closure landed
        time("cluster_incr_bigbatch") {
          graft.sources.Bucketing.dropLogical(spark, "graft_probe_bigbatch")
          graft.sources.Bucketing.dropLogical(spark, "graft_probe_bigbatch_relabel")
          val pairs = spark.range(5000000).filter(col("id") % 10 =!= 9)
            .select(col("id").as("a_id"), (col("id") + 1).as("b_id"))
          Dedup.clusterAssignIncremental(pairs, "graft_probe_bigbatch")
          val asg = spark.table("graft_probe_bigbatch")
          require(asg.filter(col("doc_id").between(20L, 29L))
            .filter(col("cluster_id") =!= 20L).count() == 0L,
            "chain 20..29 did not close to its min root")
          asg.count()
        },
        time("snm_pairs")(Dedup.sortedNeighborhoodPairs(
          docs.select(col("doc_id").as("id"), substring(col("text"), 1, 40).as("s")),
          "s", "id", w = 10, maxDist = 2).count()))
    } ++ {
      // data-quality suite at 10M rows: four row constraints in ONE
      // pass + uniqueness + fk — the whole gate, not per-check scans
      val wanted = only.forall(o => o.contains("checks_suite"))
      val nOrd = sys.env.getOrElse("SPARK_GRAFT_PROBE_ORDERS", "10000000").toLong
      val ord = if (wanted) synthOrders(spark, nOrd).localCheckpoint()
        else synthOrders(spark, 1L)
      val parent = spark.range(1000000L).toDF("c_custkey")
      Seq(
        time("checks_suite")(graft.operators.Checks.report(
          graft.operators.Checks.rowChecks(ord, Seq(
            "key_not_null" -> col("o_orderkey").isNotNull,
            "price_nonneg" -> (col("o_totalprice") >= 0),
            "price_bounded" -> (col("o_totalprice") <= 5001.0),
            "status_accepted" -> col("o_status").isin("O", "F", "P"))),
          graft.operators.Checks.uniqueCheck(ord, "key_unique", Seq("o_orderkey")),
          graft.operators.Checks.foreignKeyCheck(ord, "cust_fk", "o_custkey",
            parent, "c_custkey")).count()))
    } ++ {
      // POWER-LAW graph tier (VERDICT r10 #4, 4th-round ask): all prior
      // graph probes ran near-uniform expanders; these run the Zipf
      // fixture with a ≥50k-degree hub, where the claims actually bite:
      // orientedTriangles' degree orientation must bound the hub's wedge
      // fan-out (everything orients INTO the max-degree node, so its own
      // out-wedge count stays small), LPA's mode aggregate must not
      // funnel the hub's neighborhood through one task, and coreness'
      // histogram h-index rounds must converge under skew.
      Seq(
        time("powerlaw_triangles") {
          val sym = powerlawGraph(spark)
          val hubDeg = sym.groupBy("src").agg(count(lit(1)).as("d"))
            .agg(max("d")).head().getLong(0)
          require(hubDeg >= 50000L,
            s"hub degree $hubDeg < 50k — the fixture lost its skew")
          System.err.println(s"==   powerlaw fixture: hub degree $hubDeg")
          Graph.triangleCount(sym).head().getLong(0)
        },
        time("powerlaw_cc")(Dedup.dupClusters(
          powerlawGraph(spark).select(col("src").as("a_id"), col("dst").as("b_id")),
          smallGraphEdges = 0).count()),
        time("powerlaw_coreness")(Graph.coreness(powerlawGraph(spark)).count()),
        time("powerlaw_coreness_frontier")(
          Graph.coreness(powerlawGraph(spark), frontier = true).count()),
        time("powerlaw_lpa")(
          Graph.labelPropagation(powerlawGraph(spark), iters = 4).count()),
        time("powerlaw_kcore")(Graph.kCore(powerlawGraph(spark), k = 3).count()),
        time("powerlaw_ktruss")(Graph.kTruss(powerlawGraph(spark), k = 3).count()))
    } ++ {
      // batched-BPE at production cadence (VERDICT r10 #3): ≥1k merges
      // on the full probe corpus in ONE call. The sequential trainer
      // would be 1024 scans; the batched trainer's disjoint-prefix +
      // strict-cutoff rule takes a provably-exact batch per scan —
      // record scans and merges/scan (the degradation corpus that
      // chains one symbol through everything is law-tested to fall
      // back to 1/scan in OperatorsSpec).
      Seq(time("bpe_train_1k") {
        val scans = new java.util.concurrent.atomic.AtomicInteger(0)
        // default 256 keeps full-suite sweeps bounded; the 1k-merge
        // record (1024 merges / 871 scans / 770 s) is in BASELINE.md
        val nM = sys.env.getOrElse("SPARK_GRAFT_PROBE_MERGES", "256").toInt
        val merges = graft.operators.TextAnalysis.bpeTrainBatched(docs,
          nMerges = nM, window = 512, scanCounter = scans)
        require(merges.size >= nM,
          s"only ${merges.size} of $nM merges learned before exhaustion")
        System.err.println(f"==   bpe_train_1k: ${merges.size} merges in " +
          f"${scans.get()} scans (${merges.size.toDouble / scans.get()}%.1f merges/scan)")
        merges.size.toLong
      })
    } ++ {
      // ZIPF-TEXT tier (VERDICT r11 #3): the text-family probes above
      // all run the uniform-vocab corpus, whose binomial tie plateau
      // is an honest worst case for batched BPE but unrepresentative
      // of real text. Re-record the cadence-sensitive probes on the
      // Zipf corpus; the uniform-corpus records stay in BASELINE.md as
      // the retained worst case.
      lazy val zdocs = {
        val d = zipfDocs(spark, nDocs).repartition(cpus.toInt).localCheckpoint()
        d.count() // materialize generation outside the timings
        d
      }
      Seq(
        time("bpe_train_zipf") {
          val scans = new java.util.concurrent.atomic.AtomicInteger(0)
          val nM = sys.env.getOrElse("SPARK_GRAFT_PROBE_MERGES", "256").toInt
          val tier2 = sys.env.getOrElse("SPARK_GRAFT_PROBE_BPE_TIER2", "false").toBoolean
          val merges = graft.operators.TextAnalysis.bpeTrainBatched(zdocs,
            nMerges = nM, window = 512, scanCounter = scans,
            interferenceTier = tier2)
          require(merges.size >= nM,
            s"only ${merges.size} of $nM merges learned before exhaustion")
          System.err.println(f"==   bpe_train_zipf: ${merges.size} merges in " +
            f"${scans.get()} scans (${merges.size.toDouble / scans.get()}%.1f merges/scan)")
          merges.size.toLong
        },
        time("lm_score_zipf")(
          graft.operators.TextAnalysis.unigramLmScore(zdocs).count()),
        time("bigram_lm_zipf")(
          graft.operators.TextAnalysis.bigramLmScore(zdocs).count()),
        time("keywords_zipf")(Retrieval.keywordsTopK(zdocs, k = 3).count()),
        // heavy hitters on a TRUE Zipf stream: the sketch's claimed
        // regime (skewed counts, small heap) — uniform tokens made
        // every item a near-miss
        time("heavy_hitters_zipf") {
          val toks = zdocs.select(explode(split(col("text"), " ")).as("tok"))
          Sketches.heavyHitters(toks, "tok", phi = 0.01).count()
        })
    } ++ {
      // streaming ingest latency under SUSTAINED arrival (VERDICT r10
      // #5, 3rd-round ask): 50+ micro-batches of 1k novel docs each
      // through the index-maintenance loops, against an index seeded
      // with the full probe corpus and GROWING by every batch. The pin:
      // per-batch latency stays flat as the index grows (probe + append
      // cost must track the batch, not the standing corpus).
      val nB = sys.env.getOrElse("SPARK_GRAFT_PROBE_SBATCHES", "50").toInt
      def ingestLatency(kind: String): Long = {
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
        import spark.implicits._
        val nonce = math.abs(System.nanoTime())
        val idx = s"graft_probe_slat_${kind}_$nonce"
        val dir = java.nio.file.Files
          .createTempDirectory(s"graft-slat-$kind").toString
        if (kind == "index") Dedup.writeMinhashIndex(docs, idx)
        else Dedup.writeUnitIndex(docs, idx, width = 15)
        val ms = MemoryStream[(Long, String)]
        val stream = ms.toDF().toDF("doc_id", "text")
        val q = if (kind == "index")
          graft.streaming.DocumentStreams.streamingIndexIngest(
            stream, idx, s"$dir/out", s"$dir/ckpt")
        else
          graft.streaming.DocumentStreams.streamingParagraphIngest(
            stream, idx, s"$dir/out", s"$dir/ckpt", width = 15)
        // splitmix64 finalizer — a bare linear multiply mod vocab is
        // quasi-periodic and makes every doc a near-dup
        def mix(z0: Long): Long = {
          var z = z0 * 0x9E3779B97F4A7C15L
          z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
          z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
          z ^ (z >>> 31)
        }
        // 1000 novel docs per batch, 100 tokens each, corpus-shaped
        // vocab. Each batch also times a FIXED tiny control job: the
        // per-batch analog of the bench gate's host-epoch controls —
        // a virtualized-host stall inflates the control exactly when
        // it inflates the batch, so contaminated batches can be
        // excluded from the pins instead of tripping them (an ENGINE
        // regression leaves the control flat and still trips).
        def oneBatch(b: Int): (Double, Double) = {
          val rows = (0 until 1000).map { i =>
            val id = 10000000L + b * 1000L + i
            (id, (0 until 100).map(j =>
              "w" + java.lang.Long.remainderUnsigned(
                mix(id * 1000 + j), 400L)).mkString(" "))
          }
          ms.addData(rows)
          val t0 = System.nanoTime()
          q.processAllAvailable()
          val t1 = System.nanoTime()
          spark.range(4000000L).selectExpr("sum(id)").collect()
          val t2 = System.nanoTime()
          ((t1 - t0) / 1e9, (t2 - t1) / 1e9)
        }
        // LSM-style maintenance is now AUTOMATIC (round 12): the loops
        // run the files-per-bucket trigger between batches, so the
        // small-file listing tax — the one index-size-correlated cost
        // on the probe path — self-cures with NO manual step. Batches
        // that fire the trigger pay the (amortized) rewrite inline;
        // p50 is robust to those spikes, and the flat-latency bar
        // tightens from the manual-era 2.5× to 1.3×.
        val timed = try (0 until nB).map(oneBatch) finally q.stop()
        val latAll = timed.map(_._1)
        val ctl = timed.map(_._2)
        // full per-batch traces: adjudicating a tripped pin needs the
        // SHAPE (drift vs spike vs step) and the host's own reading
        System.err.println(s"==   ${kind}_batches " +
          latAll.map(x => f"$x%.2f").mkString(" "))
        System.err.println(s"==   ${kind}_hostctl " +
          ctl.map(x => f"$x%.2f").mkString(" "))
        def p(xs: Seq[Double], q: Double) = xs.sorted.apply(
          math.min(xs.size - 1, (q * xs.size).toInt))
        // HOST-CONTAMINATION filter (the r14 bench-gate lesson applied
        // per batch): a batch whose fixed control ran >3x the median
        // control was stalled by the host, not the engine — excluded
        // from the pins (kept in the trace). An engine regression
        // cannot hide here: it inflates the batch, never the control.
        val ctlMed = p(ctl, 0.5)
        val clean = latAll.zip(ctl).collect {
          case (l, c) if c <= 3.0 * ctlMed => l
        }
        val dropped = nB - clean.size
        if (dropped > 0) System.err.println(
          s"==   ${kind}_hostdrop $dropped/$nB batches host-contaminated " +
            f"(ctl median $ctlMed%.3f s)")
        require(clean.size >= (nB * 3) / 5,
          s"host too noisy to adjudicate: $dropped of $nB batches contaminated")
        val lat = clean
        // skip the first 5 batches (JIT + first-touch of the sink);
        // early = the next 15, late = the last 15 — flat means the
        // per-batch cost tracks the batch, not the grown index
        val early = lat.slice(5, 20)
        val late = lat.takeRight(15)
        val (e50, l50) = (p(early, 0.5), p(late, 0.5))
        System.err.println(f"==   stream_${kind}%s: p50 early $e50%.2f s, " +
          f"p50 late $l50%.2f s, p99 ${p(lat.drop(5), 0.99)}%.2f s over $nB batches " +
          f"($dropped host-dropped; index +${nB}k docs, auto-compaction on)")
        require(l50 <= 1.3 * e50 + 0.2,
          f"per-batch latency grew with the index despite auto-compaction: " +
            f"p50 $e50%.2f -> $l50%.2f s")
        // out-of-band compaction pin, tightened per round: r12 inline
        // rewrites spiked p99 to 4.1x p50; r13's out-of-band thread cut
        // it to 2.7x (pinned 3x+1); r14's manifest merge (background
        // job shrank from corpus-sized to delta-sized) plus the
        // low-share FAIR maintenance pool recorded 1.98x — pinned at
        // 2.5x+1 (margin for single-rep host noise). Recorded config
        // only: at 4 cores the background job legitimately starves a
        // concurrent batch (measured 6x), a capacity statement
        if (actualCores >= 16)
          require(p(lat.drop(5), 0.99) <= 2.5 * p(lat.drop(5), 0.5) + 1.0,
            f"ingest p99 spike: ${p(lat.drop(5), 0.99)}%.2f s vs p50 ${p(lat.drop(5), 0.5)}%.2f s")
        nB.toLong
      }
      // the READ half of the sustained-arrival story: the ingest-latency
      // probes show the MAINTENANCE cost stays flat; this one shows
      // QUERY latency against the same growing index stays flat too —
      // per batch, ingest 1k novel docs, then time a fixed 500-doc
      // probe (bucket-pruned indexedNearDupPairs) against the index.
      // Without compaction the probe pays the same small-file listing
      // tax that hit ingest; the between-batch trigger must keep the
      // read path flat as well. This probe's first run (round 12) is
      // what exposed the cross-session stale-listing bug in the
      // pre-versioning DROP→RENAME swap (FAILED_READ_FILE between a
      // cloned-session compaction and an outer-session read) — it now
      // doubles as the regression pin for Bucketing's versioned-view
      // layer, which made reads maintenance-isolated.
      def readLatency(): Long = {
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
        import spark.implicits._
        val nonce = math.abs(System.nanoTime())
        val idx = s"graft_probe_srd_$nonce"
        val dir = java.nio.file.Files.createTempDirectory("graft-srd").toString
        Dedup.writeMinhashIndex(docs, idx)
        val ms = MemoryStream[(Long, String)]
        val q = graft.streaming.DocumentStreams.streamingIndexIngest(
          ms.toDF().toDF("doc_id", "text"), idx, s"$dir/out", s"$dir/ckpt")
        def mix(z0: Long): Long = {
          var z = z0 * 0x9E3779B97F4A7C15L
          z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
          z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
          z ^ (z >>> 31)
        }
        def docsFor(base: Long, n: Int): Seq[(Long, String)] =
          (0 until n).map { i =>
            val id = base + i
            (id, (0 until 100).map(j =>
              "w" + java.lang.Long.remainderUnsigned(
                mix(id * 1000 + j), 400L)).mkString(" "))
          }
        // fixed probe set, reused every batch: latency deltas then
        // measure the INDEX side (files, size), not the query side
        val probeSet = docsFor(90000000L, 500).toDF("doc_id", "text")
          .repartition(4).localCheckpoint()
        probeSet.count()
        val lat = try {
          (0 until nB).map { b =>
            ms.addData(docsFor(10000000L + b * 1000L, 1000))
            q.processAllAvailable()
            val t0 = System.nanoTime()
            Dedup.indexedNearDupPairs(probeSet, idx).count()
            (System.nanoTime() - t0) / 1e9
          }
        } finally q.stop()
        def p(xs: Seq[Double], qq: Double) = xs.sorted.apply(
          math.min(xs.size - 1, (qq * xs.size).toInt))
        val early = lat.slice(5, 20)
        val late = lat.takeRight(15)
        val (e50, l50) = (p(early, 0.5), p(late, 0.5))
        System.err.println(f"==   stream_read: p50 early $e50%.2f s, " +
          f"p50 late $l50%.2f s, p99 ${p(lat.drop(5), 0.99)}%.2f s over $nB batches " +
          f"(index +${nB}k docs, auto-compaction on)")
        require(l50 <= 1.3 * e50 + 0.2,
          f"query latency grew with the index despite auto-compaction: " +
            f"p50 $e50%.2f -> $l50%.2f s")
        if (actualCores >= 16) // recorded-config pin, see ingestLatency
          require(p(lat.drop(5), 0.99) <= 2.5 * p(lat.drop(5), 0.5) + 1.0,
            f"read p99 spike: ${p(lat.drop(5), 0.99)}%.2f s vs p50 ${p(lat.drop(5), 0.5)}%.2f s")
        nB.toLong
      }
      // the same read-flat law for the SECOND index family: the IVF-PQ
      // ANN index (codes bucketed by list, VectorStreams ingest loop
      // with the codes-table compaction trigger). Per batch: ingest 1k
      // novel vectors, then time a fixed 200-query annIndexTopK. Query
      // cost must track (nprobe buckets × query count), not the
      // standing corpus or its accumulated files.
      def annReadLatency(): Long = {
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
        import spark.implicits._
        val nonce = math.abs(System.nanoTime())
        val idx = s"graft_probe_sann_$nonce"
        val dir = java.nio.file.Files.createTempDirectory("graft-sann").toString
        val embsD = embs.select(col("vec_id"),
          col("embedding").cast("array<double>").as("embedding"))
        Similarity.writeAnnIndex(embsD, idx, nlist = 256, m = 8, k = 256)
        val ms = MemoryStream[(Long, Seq[Double])]
        val q = graft.streaming.VectorStreams.streamingAnnIngest(
          ms.toDF().toDF("vec_id", "embedding"), idx, s"$dir/out", s"$dir/ckpt")
        val queries = embsD.filter(col("vec_id") < 200).localCheckpoint()
        queries.count()
        def vec(id: Long): Seq[Double] =
          (0 until 64).map(d => math.sin(id * 64.0 + d))
        val lat = try {
          (0 until nB).map { b =>
            ms.addData((0 until 1000).map { i =>
              val id = 30000000L + b * 1000L + i; (id, vec(id))
            })
            q.processAllAvailable()
            val t0 = System.nanoTime()
            Similarity.annIndexTopK(queries, idx, topk = 5, nprobe = 16).count()
            (System.nanoTime() - t0) / 1e9
          }
        } finally q.stop()
        def p(xs: Seq[Double], qq: Double) = xs.sorted.apply(
          math.min(xs.size - 1, (qq * xs.size).toInt))
        val early = lat.slice(5, 20)
        val late = lat.takeRight(15)
        val (e50, l50) = (p(early, 0.5), p(late, 0.5))
        System.err.println(f"==   stream_ann_read: p50 early $e50%.2f s, " +
          f"p50 late $l50%.2f s, p99 ${p(lat.drop(5), 0.99)}%.2f s over $nB batches " +
          f"(index +${nB}k vecs, auto-compaction on)")
        require(l50 <= 1.3 * e50 + 0.2,
          f"ANN query latency grew with the index despite auto-compaction: " +
            f"p50 $e50%.2f -> $l50%.2f s")
        if (actualCores >= 16) // recorded-config pin, see ingestLatency
          require(p(lat.drop(5), 0.99) <= 2.5 * p(lat.drop(5), 0.5) + 1.0,
            f"ANN read p99 spike: ${p(lat.drop(5), 0.99)}%.2f s vs p50 ${p(lat.drop(5), 0.5)}%.2f s")
        nB.toLong
      }
      // The maintained-index WRITE path under contention, with a
      // REQUANTIZE mid-stream (the r13 verdict #7 leg): drifted
      // vectors arrive mid-stream, the loop's auto-remediation fires
      // requantizeAnnIndex between batches — committing through the
      // cross-table epoch flip — while a concurrent reader hammers
      // annIndexTopK the whole time. Under SPARK_GRAFT_MASTER=
      // local-cluster this is the multi-process pin: the reader's
      // codes scans run in forked executor JVMs against whatever
      // generation its resolution pinned, so a mixed
      // quantizer/codes pairing or a swept-underfoot file surfaces
      // as a reader error. Green = epoch advanced, residual
      // repaired, ZERO reader errors.
      def annRequantizeMidStream(): Long = {
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        import scala.jdk.CollectionConverters._
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
        import spark.implicits._
        val nonce = math.abs(System.nanoTime())
        val idx = s"graft_probe_rq_$nonce"
        val dir = java.nio.file.Files.createTempDirectory("graft-rq").toString
        def vec(id: Long, shift: Double): Seq[Double] =
          (0 until 64).map(d => shift + math.sin(id * 64.0 + d))
        // distributed twin of vec(id, 0.0): sin(id*64 + d)
        val trained = spark.range(20000).select(col("id").as("vec_id"),
          transform(sequence(lit(0), lit(63)),
            d => sin(col("id") * 64 + d)).as("embedding"))
          .repartition(cpus.toInt).localCheckpoint()
        val driftedIds = (40000000L until 40002000L)
        val driftedDf = driftedIds.map(i => (i, vec(i, 6.0)))
          .toDF("vec_id", "embedding").localCheckpoint()
        val full = trained.unionByName(driftedDf).localCheckpoint()
        Similarity.writeAnnIndex(trained, idx, nlist = 64, buckets = 16)
        val queries = trained.filter(col("vec_id") < 100).localCheckpoint()
        queries.count()
        val readerErrs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
        val reads = new java.util.concurrent.atomic.AtomicLong(0)
        val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
        val reader = new Thread(() => {
          val rs = spark.newSession() // a user session, not the loop's
          while (!stop.get()) {
            try {
              require(Similarity.annIndexTopK(queries, idx,
                topk = 5, nprobe = 8).count() > 0)
              reads.incrementAndGet(); ()
            } catch { case t: Throwable => readerErrs.add(t); () }
          }
        }, "graft-probe-rq-reader")
        val ms = MemoryStream[(Long, Seq[Double])]
        val q = graft.streaming.VectorStreams.streamingAnnIngest(
          ms.toDF().toDF("vec_id", "embedding"), idx, s"$dir/out", s"$dir/ckpt",
          nprobe = 8, driftPath = s"$dir/drift",
          driftThreshold = 0.1, retrainCorpus = () => full)
        reader.start()
        try {
          // batches 0-4: in-distribution (no trigger); batch 5: the
          // drifted region lands → auto-requantize; 6-9: post-repair
          (0 until 10).foreach { b =>
            if (b == 5) ms.addData(driftedIds.map(i => (i, vec(i, 6.0))))
            else ms.addData((0 until 1000).map { i =>
              val id = 50000000L + b * 1000L + i; (id, vec(id, 0.0))
            })
            q.processAllAvailable()
          }
        } finally { q.stop(); stop.set(true); reader.join(60000) }
        require(graft.sources.Bucketing.currentEpoch(spark, idx) >= 1,
          "mid-stream drift must auto-requantize through the epoch flip")
        val post = Similarity.annAssignmentResidual(driftedDf, idx)
          .collect()(0).getDouble(1)
        require(post <= 0.1, f"requantize must repair the residual, got $post%.3f")
        require(readerErrs.isEmpty,
          s"reader errors during mid-stream requantize: " +
            readerErrs.asScala.take(2).map(_.toString))
        require(reads.get() > 0, "reader never completed a query")
        System.err.println(s"==   stream_ann_requantize: epoch " +
          s"${graft.sources.Bucketing.currentEpoch(spark, idx)}, " +
          s"${reads.get()} concurrent reads, 0 reader errors, " +
          f"post-repair residual $post%.4f")
        reads.get()
      }
      // The maintained CLUSTER index under the same contention
      // discipline (the r14 verdict #8 leg): a mid-stream out-of-band
      // relabel FOLD (rewriteBucketedAsync through
      // maybeCompactClusterIndex) runs while merge batches keep
      // landing and a concurrent reader in a SEPARATE session reads
      // assignments the whole time. Under SPARK_GRAFT_MASTER=
      // local-cluster the reader's bucketed scans run in forked
      // executor JVMs — a swept-underfoot segment, a torn view flip,
      // or a fold/merge compose error surfaces as a reader error or a
      // wrong assignment. Green = zero reader errors, every read of
      // the untouched probe set exact, a fold genuinely flipped
      // out-of-band, and the FINAL assignments equal the global
      // dupClusters closure of every pair ever ingested.
      def clusterFoldMidStream(): Long = {
        import scala.jdk.CollectionConverters._
        import spark.implicits._
        val nonce = math.abs(System.nanoTime())
        val idx = s"graft_probe_cfold_$nonce"
        // 2000 chains of 4 (ids 0..7999): cluster root = 4k
        val basePairs = spark.range(8000).filter(col("id") % 4 =!= 3)
          .select(col("id").as("a_id"), (col("id") + 1).as("b_id"))
          .localCheckpoint()
        Dedup.writeClusterIndex(basePairs, idx, buckets = 8)
        // merge batch b: link 50 consecutive chains (k ≥ 100 — the
        // probe set below stays untouched) plus 50 NEW 2-clusters
        def batch(b: Int) = {
          val merges = (0 until 50).map { j =>
            val k = 100L + b * 50L + j
            (4 * k + 3, 4 * k + 4)
          }
          val adds = (0 until 50).map { i =>
            (100000L + b * 1000L + 2 * i, 100000L + b * 1000L + 2 * i + 1)
          }
          (merges ++ adds).toDF("a_id", "b_id").localCheckpoint()
        }
        val readerErrs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
        val reads = new java.util.concurrent.atomic.AtomicLong(0)
        val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
        val reader = new Thread(() => {
          val rs = spark.newSession() // a user session, not the writer's
          while (!stop.get()) {
            try {
              val bad = Dedup.clusterAssignments(rs, idx)
                .filter(col("doc_id") < 400)
                .filter(col("cluster_id") =!=
                  col("doc_id") - pmod(col("doc_id"), lit(4)))
                .count()
              require(bad == 0L, s"$bad wrong assignments in the probe set")
              reads.incrementAndGet(); ()
            } catch { case t: Throwable => readerErrs.add(t); () }
          }
        }, "graft-probe-cfold-reader")
        reader.start()
        var folded = false
        val fed = scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.DataFrame](basePairs)
        try {
          (0 until 6).foreach { b =>
            val p = batch(b)
            fed += p
            Dedup.clusterAssignIncremental(p, idx)
            if (b == 1) {
              // the relabel map now holds merges: trigger the
              // OUT-OF-BAND fold; batches 2-3 land while it runs
              require(!Dedup.maybeCompactClusterIndex(spark, idx, 1),
                "the fold trigger must enqueue, not run inline")
              require(graft.sources.Bucketing.pendingMaintenance(idx),
                "a fold must be pending after the trigger")
            }
            if (b == 3) {
              graft.sources.Bucketing.awaitMaintenance(idx)
              folded = Dedup.maybeCompactClusterIndex(spark, idx, 1)
              require(folded, "the finished fold must FLIP on this trigger")
            }
          }
        } finally { stop.set(true); reader.join(60000) }
        graft.sources.Bucketing.finalizeMaintenance(spark, idx)
        require(readerErrs.isEmpty,
          s"reader errors during mid-stream fold: " +
            readerErrs.asScala.take(2).map(_.toString))
        require(reads.get() > 0, "reader never completed a read")
        // the final table must equal the global closure of EVERYTHING
        val expected = Dedup.dupClusters(
          fed.reduce(_ unionByName _)).localCheckpoint()
        val actual = Dedup.clusterAssignments(spark, idx)
        val nExp = expected.count()
        require(actual.count() == nExp, "assignment count != closure count")
        val mismatches = expected.as("e")
          .join(actual.as("a"), col("e.doc_id") === col("a.doc_id"))
          .filter(col("e.cluster_id") =!= col("a.cluster_id")).count()
        require(mismatches == 0L,
          s"$mismatches assignments differ from the global dupClusters closure")
        System.err.println(s"==   cluster_fold_midstream: fold flipped " +
          s"out-of-band, ${reads.get()} concurrent reads, 0 reader errors, " +
          s"$nExp assignments == global closure")
        graft.sources.Bucketing.dropLogical(spark, idx)
        graft.sources.Bucketing.dropLogical(spark, s"${idx}_relabel")
        reads.get()
      }
      // THE r13 verdict #1 pin: a compaction flip's bytes-written must
      // track the merged (hot) segments, never the table — the
      // manifest layer carries cold segments BY REFERENCE (same
      // physical path across versions), where the previous design
      // byte-copied the whole table per flip (O(corpus) maintenance
      // I/O at 100 TB). Three append+merge cycles over a corpus-sized
      // base segment: each flip writes <20% of the base bytes, and
      // the base segment's path is IDENTICAL across all versions.
      def manifestFlipBytes(): Long = {
        val t = s"graft_probe_mani_${math.abs(System.nanoTime())}"
        val base = synthOrders(spark, 2000000L)
          .select(col("o_orderkey").as("k"),
            concat(col("o_status"), col("o_totalprice").cast("string")).as("v"))
        graft.sources.Bucketing.writeBucketed(base, t, "k", 32)
        def manifest(): Map[String, String] = {
          val (phys, _) = graft.sources.Bucketing.currentPhys(spark, t).get
          spark.sessionState.catalog
            .listPartitions(org.apache.spark.sql.catalyst.TableIdentifier(phys))
            .map(p => (p.spec("_graft_seg"), p.location.toString)).toMap
        }
        def dirBytes(loc: String): Long = {
          val p = new org.apache.hadoop.fs.Path(loc)
          val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          fs.listStatus(p).collect {
            case s if s.isFile && !s.getPath.getName.startsWith("_") => s.getLen
          }.sum
        }
        val m0 = manifest()
        require(m0.size == 1)
        val (baseSeg, baseLoc) = m0.head
        val baseBytes = dirBytes(baseLoc)
        var known = m0.keySet
        try {
          (1 to 3).foreach { cycle =>
            (1 to 3).foreach { a =>
              graft.sources.Bucketing.appendBucketed(
                synthOrders(spark, 20000L)
                  .select((col("o_orderkey") + cycle * 1000000L + a * 100000L)
                    .as("k"), concat(col("o_status"),
                      col("o_totalprice").cast("string")).as("v")), t, "k")
            }
            require(graft.sources.Bucketing.compactBucketedPartial(spark, t, 2))
            val m = manifest()
            require(m.get(baseSeg).contains(baseLoc),
              s"cycle $cycle: cold base segment must carry by reference")
            val newSegs = m.keySet -- known
            val flipBytes = newSegs.toSeq.map(n => dirBytes(m(n))).sum
            known = m.keySet
            System.err.println(f"==   manifest_flip_bytes cycle $cycle: " +
              f"${flipBytes / 1e6}%.1f MB written vs ${baseBytes / 1e6}%.1f MB " +
              "cold (referenced, 0 copied)")
            require(flipBytes < baseBytes / 5,
              s"flip wrote $flipBytes B vs base $baseBytes B — " +
                "bytes-per-flip must track the hot segments, not the table")
          }
          3L
        } finally graft.sources.Bucketing.dropLogical(spark, t)
      }
      Seq(
        time("manifest_flip_bytes")(manifestFlipBytes()),
        time("stream_ingest_lat_idx")(ingestLatency("index")),
        time("stream_ingest_lat_para")(ingestLatency("para")),
        time("stream_ingest_read_lat")(readLatency()),
        time("stream_ann_read_lat")(annReadLatency()),
        time("stream_ann_requantize")(annRequantizeMidStream()),
        time("cluster_fold_midstream")(clusterFoldMidStream()))
    }

    val qs = results.map { case (k, v, rows) => s""""$k":{"sec":$v,"rows":$rows}""" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"scale_probe","docs":$nDocs,"vecs":$nVecs,"queries":$qs}""")
    spark.stop()
  }
}
