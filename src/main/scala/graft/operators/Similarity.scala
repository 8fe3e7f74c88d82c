package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Materialize.MaterializeOps

import graft.functions.VectorFunctions._

/**
 * Approximate-nearest-neighbor search over an embedding column
 * (north-star similarity-search operators, SURVEY §2.4).
 *
 * Scale design: the brute-force path broadcasts the (small) query
 * set and scans the corpus once — a single narrow pass, no shuffle
 * of the corpus, embarrassingly parallel at 100 TB. The LSH path
 * buckets the corpus by random-projection sketch so each query only
 * probes its own buckets — the corpus-side join key is the sketch,
 * so the big side shuffles once and bucket skew is bounded by 2^bits
 * uniformity.
 */
object Similarity {

  /** Plain-array cosine with the EXACT op order of VectorOps.cosineD (oracle-bit-compatible). */
  private[operators] def cosineArr(a: Array[Double], b: Array[Double]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = a(i); val y = b(i)
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /**
   * Exact top-k neighbors for each query vector by cosine, via
   * broadcast cross join + per-query window rank. Deterministic
   * tiebreak on neighbor id.
   */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine_sim(col("qv"), col("cv")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cos"), 4).as("cos"))
  }

  /**
   * Per-label centroids + nearest-centroid assignment (one k-means
   * step over a labeled embedding corpus). Centroid computation is a
   * dimension-exploded aggregate — one shuffle of (label, dim)
   * partials; assignment broadcasts the tiny centroid table and
   * scans the corpus once. Output: (label_true, label_pred, n)
   * confusion counts.
   */
  def centroidAssign(embs: DataFrame,
      vecCol: String = "embedding", idCol: String = "vec_id",
      labelCol: String = "label"): DataFrame = {
    // vec_sum aggregator: one array row per (label, partition) in the
    // shuffle, not (rows × dims) exploded scalars — see
    // [[graft.functions.Aggregators.VecSum]] for the scale math
    val vsum = udaf(graft.functions.Aggregators.VecSum)
    val cent = embs
      .select(col(labelCol).as("clabel"), col(vecCol).cast("array<double>").as("v"))
      .groupBy("clabel")
      .agg(vsum(col("v")).as("vs"), count("*").as("n"))
      .select(col("clabel"), transform(col("vs"), x => x / col("n")).as("centroid"))
    // label count is small by definition, so the (corpus × labels)
    // expansion is modest; argmin of (-cos, clabel) ≡ argmax cos with
    // ascending-label tie-break — a map-side-combining aggregation
    // instead of a per-vector window sort (and label keeps its
    // original type, whatever the corpus uses)
    val scored = embs
      .select(col(idCol).as("vid"), col(labelCol).as("label_true"),
        col(vecCol).cast("array<double>").as("v"))
      .join(broadcast(cent))
      .withColumn("cos", cosine_sim(col("v"), col("centroid")))
    scored.groupBy(col("vid"), col("label_true"))
      .agg(min_by(col("clabel"), struct(-col("cos"), col("clabel"))).as("label_pred"))
      .groupBy(col("label_true"), col("label_pred"))
      .agg(count("*").as("n"))
  }

  /**
   * IVF (inverted-file) ANN: the other classic scale path next to
   * LSH. One k-means-style step builds `nlist` coarse centroids
   * (seeded from deterministic hash buckets); every corpus vector is
   * assigned to its nearest centroid's posting list; a query probes
   * only its `nprobe` closest lists and ranks those candidates
   * exactly.
   *
   * Scale shape: centroids are tiny (nlist × dims by construction)
   * and broadcast everywhere; assignment is ONE pass over the corpus
   * with an in-row loop over the centroid matrix — no
   * (corpus × nlist) row expansion ever materializes (measured 9× at
   * 100k vectors × 256 lists); the corpus then shuffles once on
   * list_id; query cost is nprobe/nlist of the corpus instead of all
   * of it. Recall < 1 by construction — raise nprobe to trade cost
   * for recall.
   */
  /**
   * Deterministic coarse "k-means step": id-modulo seed groups →
   * mean centroids (VecSum aggregate — one array row per group in
   * the shuffle); the tiny (nlist × dims) matrix is collected and
   * broadcast, and the returned udf maps a vector to its `n` nearest
   * centroid ids in ONE in-row loop — no (corpus × nlist) row
   * expansion ever materializes (measured 9× at 100k vectors × 256
   * lists). Cosine op order replicates CosineSimExpr exactly;
   * ascending-b iteration with strict improvement keeps the lowest b
   * on ties, matching the oracles' ORDER BY cos DESC, _b.
   */
  private[operators] def coarseTopListsUdf(corpus: DataFrame, nlist: Int,
      vecCol: String, idCol: String): (Column, Int) => Column =
    topListsFromMatrix(corpus.sparkSession,
      coarseCentroids(corpus, nlist, vecCol, idCol))

  /** Id-seeded coarse centroids, collected as the (nlist × dims)
    * matrix — optionally sharpened by `refineIters` Lloyd rounds
    * (argmax-cosine reassignment → means, the [[kmeansAssign]] step;
    * deterministic given the id seeding, so an oracle replays the
    * rounds as chained CTEs). Each round is one corpus scan; the
    * assignment matrix never stacks across rounds. Clusters that
    * lose every member drop out (both engines agree: the mean of an
    * empty group is no row). */
  private def coarseCentroids(corpus: DataFrame, nlist: Int,
      vecCol: String, idCol: String,
      refineIters: Int = 0): Array[(Long, Array[Double])] = {
    val vsum = udaf(graft.functions.Aggregators.VecSum)
    val v = corpus
      .withColumn("_b", pmod(col(idCol), lit(nlist)))
      .select(col("_b"), col(vecCol).cast("array<double>").as("v"))
    def means(assigned: DataFrame): Array[(Long, Array[Double])] = assigned
      .groupBy("_b")
      .agg(vsum(col("v")).as("vs"), count("*").as("n"))
      .select(col("_b"), transform(col("vs"), x => x / col("n")).as("centroid"))
      .collect()
      .map(r => (r.getAs[Number]("_b").longValue(), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    var cents = means(v)
    for (_ <- 1 to refineIters) {
      val assign = topListsFromMatrix(corpus.sparkSession, cents)
      cents = means(v.select(assign(col("v"), 1)(0).as("_b"), col("v")))
    }
    cents
  }

  /** The nearest-n-centroids probe over an already-known matrix — a
    * native scan-stage expression ([[graft.functions.TopCentroidsExpr]]):
    * the matrix rides the plan as a codegen reference object; top-n by
    * (cos desc, id asc), the strict insertion compare keeping the
    * earlier id on ties, matching the oracles' ORDER BY cos DESC, _b. */
  private def topListsFromMatrix(spark: SparkSession,
      centMatrix: Array[(Long, Array[Double])]): (Column, Int) => Column =
    (v, n) => graft.functions.VectorFunctions.top_centroids(v, centMatrix, n)

  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5,
      nlist: Int = 64, nprobe: Int = 8,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    // coarse centroids + single-pass assignment (see coarseTopListsUdf)
    val topLists = coarseTopListsUdf(corpus, nlist, vecCol, idCol)
    val assigned = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).cast("array<double>").as("cv"))
      .withColumn("list_id", topLists(col("cv"), 1)(0))
    // 3. each query probes its nprobe nearest lists — same single pass
    val probes = queries
      .select(col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("qv"))
      .select(col("query_id"), col("qv"),
        explode(topLists(col("qv"), nprobe)).as("list_id"))
    // 4. exact ranking over the probed posting lists only
    val wRank = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    assigned.join(probes, "list_id")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine_sim(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), round(col("cos"), 4).as("cos"))
  }

  /**
   * SemDeDup-style semantic deduplication: cluster the embedding
   * corpus with one deterministic k-means step, then compare vectors
   * ONLY within their cluster — near-dup pairs are (cos ≥ threshold)
   * bucket-mates. The cluster pass turns the O(n²) similarity scan
   * into nlist × O((n/nlist)²); at 100 TB nlist scales with the
   * corpus (SemDeDup uses ~10⁵ clusters for web-scale) so cluster
   * populations — and the quadratic term — stay bounded, with
   * `maxBucket` as the safety valve. Recall < 1 by construction:
   * a near-dup pair straddling a cluster boundary is missed
   * (the LSH path [[graft.operators.Dedup.embeddingNearDupPairs]]
   * trades differently).
   */
  def semanticDedup(embs: DataFrame, nlist: Int = 32, threshold: Double = 0.95,
      maxBucket: Int = 10000,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val topLists = coarseTopListsUdf(embs, nlist, vecCol, idCol)
    val assigned = embs
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .withColumn("cluster", topLists(col("v"), 1)(0))
    // each vector has exactly ONE cluster, so posting lists carry
    // (id, vector) structs and pairs explode with both vectors
    // inline: the pair expansion, cosine, and threshold all run in
    // the same stage — candidate pairs never cross a shuffle (the
    // id-only-list + join-back shape used by the LSH paths would
    // shuffle every candidate pair three times here, and the
    // below-threshold ones are the overwhelming majority)
    assigned.groupBy("cluster")
      .agg(collect_list(struct(col("id"), col("v"))).as("xs"))
      .filter(size(col("xs")).between(2, maxBucket))
      .select(explode(col("xs")).as("a"), col("xs"))
      .select(col("a"), explode(col("xs")).as("b"))
      .filter(col("a.id") < col("b.id"))
      .withColumn("cos", cosine_sim(col("a.v"), col("b.v")))
      .filter(col("cos") >= threshold)
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"),
        round(col("cos"), 4).as("cos"))
  }

  /**
   * Lloyd's k-means with a fixed iteration count (deterministic
   * id-modulo seeding, cosine metric): each round recomputes mean
   * centroids from the current assignment (VecSum — one array row
   * per cluster in the shuffle) and reassigns every vector against
   * the broadcast centroid matrix in one scan. Fixed iterations keep
   * the computation replayable (the DuckDB oracle chains the same
   * rounds as CTEs); ties keep the lowest cluster id, matching
   * `ORDER BY cos DESC, cl`. Empty clusters drop out in both engines
   * alike.
   *
   * Scale: per round, one corpus aggregation (k × dims partials) +
   * one shuffle-free assignment scan; the k × dims matrix collects
   * and broadcasts (tiny by construction). The corpus never joins
   * against the centroid table — no corpus × k row expansion.
   */
  def kmeansAssign(embs: DataFrame, k: Int = 8, iters: Int = 3,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val spark = embs.sparkSession
    val vsum = udaf(graft.functions.Aggregators.VecSum)
    var assigned = embs
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .withColumn("cl", pmod(col("id"), lit(k)))
    for (_ <- 1 to iters) {
      val matrix = assigned.groupBy("cl")
        .agg(vsum(col("v")).as("vs"), count(lit(1)).as("n"))
        .select(col("cl"), transform(col("vs"), x => x / col("n")).as("centroid"))
        .collect()
        .map(r => (r.getAs[Number]("cl").longValue(), r.getSeq[Double](1).toArray))
        .sortBy(_._1)
      // nearest centroid = top_centroids n=1 (native expression; the
      // strict insertion compare keeps the lowest cl on ties, exactly
      // the old strict-improvement loop)
      val assign = (v: Column) =>
        graft.functions.VectorFunctions.top_centroids(v, matrix, 1)(0)
      // materialize each round: the centroid aggregate of round t
      // otherwise re-runs rounds 1..t-1's assignment UDFs through the
      // lineage (O(iters²) scans; same reasoning as Dedup.dupClusters)
      assigned = assigned.withColumn("cl", assign(col("v"))).materializeRound
    }
    assigned
  }

  /** Census over [[kmeansAssign]]: per final cluster, size + mean cosine to its centroid. */
  def kmeansCensus(embs: DataFrame, k: Int = 8, iters: Int = 3,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val vsum = udaf(graft.functions.Aggregators.VecSum)
    val assigned = kmeansAssign(embs, k, iters, vecCol, idCol)
    val cent = assigned.groupBy(col("cl").as("ccl"))
      .agg(vsum(col("v")).as("vs"), count(lit(1)).as("cn"))
      .select(col("ccl"), transform(col("vs"), x => x / col("cn")).as("centroid"))
    assigned.join(broadcast(cent), col("cl") === col("ccl"))
      .withColumn("cos", cosine_sim(col("v"), col("centroid")))
      .groupBy(col("cl"))
      .agg(count(lit(1)).as("n_members"), round(avg(col("cos")), 4).as("mean_cos"))
  }

  /**
   * Maximal-marginal-relevance diversified top-k for ONE query: greedy
   * re-ranking of the cosine top-`pool` candidates, each pick
   * maximizing λ·rel(d) − μ·max_{s∈selected} sim(d, s) (ties → lowest
   * id). The candidate stage is the distributed heavy part (broadcast
   * query + the TopKPerKey heap — never a corpus sort); the greedy
   * loop then runs on the POOL only — `pool`² bounded driver work by
   * construction, independent of corpus size. Similarities are
   * rounded to 6 decimals before the greedy arithmetic so any SQL
   * engine replays the exact pick sequence (the ann_pq discipline).
   * μ is an explicit weight (not 1−λ) so both engines parse the
   * identical double literal.
   */
  def mmrTopK(corpus: DataFrame, query: DataFrame, k: Int = 5, pool: Int = 20,
      lambda: Double = 0.7, mu: Double = 0.3,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val q = query.select(col(idCol).as("qid"), col(vecCol).cast("array<double>").as("qv"))
    val c = corpus.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
    val scored = c.join(broadcast(q), col("id") =!= col("qid"))
      .withColumn("cos", cosine_sim(col("qv"), col("v")))
    val cand = graft.relational.Relational.topKPerKey(
        scored, Seq(col("qid")), Seq(col("cos").desc, col("id").asc), pool)
      .select(col("id"), col("v"), round(col("cos"), 6).as("rel"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
    val selected = scala.collection.mutable.ArrayBuffer[(Long, Array[Double])]()
    val remaining = scala.collection.mutable.ArrayBuffer(cand: _*)
    val out = scala.collection.mutable.ArrayBuffer[(Long, Long, Double)]()
    for (t <- 1 to math.min(k, cand.length)) {
      val best = remaining.map { case (id, v, rel) =>
        val pen =
          if (selected.isEmpty) 0.0
          else selected.map(s => round6(cosineArr(v, s._2))).max
        (id, v, lambda * rel - mu * pen)
      }.sortBy(x => (-x._3, x._1)).head
      out += ((t.toLong, best._1, round6(best._3)))
      selected += ((best._1, best._2))
      remaining --= remaining.filter(_._1 == best._1)
    }
    out.toSeq.toDF("rank", "vec_id", "mmr")
  }

  /**
   * Centroid-based (simplified) silhouette over the [[kmeansAssign]]
   * clustering — the standard compactness/separation report without
   * any O(n²) pairwise work: per vector, a = cosine distance to its
   * OWN centroid, b = min cosine distance to any OTHER centroid,
   * s = (b − a) / max(a, b) (0 when both distances are 0). Reported
   * as the per-cluster mean. Scale: the k×dims centroid matrix
   * broadcasts; scoring computes k distances per vector inside one
   * shuffle-free scan (no corpus×k row expansion), then a k-group
   * aggregate.
   */
  def silhouette(embs: DataFrame, k: Int = 8, iters: Int = 3,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val spark = embs.sparkSession
    val vsum = udaf(graft.functions.Aggregators.VecSum)
    val assigned = kmeansAssign(embs, k, iters, vecCol, idCol)
    val matrix = assigned.groupBy("cl")
      .agg(vsum(col("v")).as("vs"), count(lit(1)).as("n"))
      .select(col("cl"), transform(col("vs"), x => x / col("n")).as("centroid"))
      .collect()
      .map(r => (r.getAs[Number]("cl").longValue(), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    val sil = (v: Column, cl: Column) =>
      graft.functions.VectorFunctions.silhouette_score(v, cl, matrix)
    assigned.withColumn("s", sil(col("v"), col("cl")))
      .groupBy(col("cl"))
      .agg(count(lit(1)).as("n_members"), round(avg("s"), 4).as("mean_sil"))
  }

  /**
   * Product quantization: split each `dims`-dim vector into `m`
   * subvectors, learn a k-entry codebook per subspace (one
   * deterministic Lloyd step from the id-partition seeding — the same
   * replayable convention as [[kmeansAssign]]/semanticDedup), and
   * encode every vector as its m nearest-codeword indices (L2,
   * smallest index on ties) plus the reconstruction error. The
   * compressed code is m·log2(k) bits per vector — the memory lever
   * that lets an ANN index hold billions of vectors in RAM.
   *
   * Scale: the codebooks are ONE aggregation (k groups × dims) that
   * collects a bounded k×dims matrix and broadcasts; encoding is a
   * single shuffle-free scan.
   */
  /** Id-seeded PQ codebooks: one bounded aggregation → k rows × dims matrix. */
  private def pqCodebooks(v: DataFrame, k: Int): Array[Array[Double]] = {
    val vsum = udaf(graft.functions.Aggregators.VecSum)
    v.groupBy((col("id") % k).as("b"))
      .agg(vsum(col("v")).as("vs"), count(lit(1)).as("n"))
      .select(col("b"), transform(col("vs"), x => x / col("n")).as("centroid"))
      .collect()
      .map(r => (r.getAs[Number]("b").longValue(), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
      .map(_._2)
  }

  /** Per-subspace nearest-codeword distance²; returns (codes, total err²). */
  private def pqEncodeOne(va: Array[Double], m: Int,
      books: Array[Array[Double]]): (Array[Long], Double) = {
    val subdim = va.length / m
    val codes = new Array[Long](m)
    var err2 = 0.0
    var j = 0
    while (j < m) {
      var bestB = -1
      var bestD = Double.PositiveInfinity
      var b = 0
      while (b < books.length) {
        val c = books(b)
        var d = 0.0
        var i = 0
        while (i < subdim) {
          val diff = va(j * subdim + i) - c(j * subdim + i)
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; bestB = b } // strict: lowest b wins ties
        b += 1
      }
      codes(j) = bestB.toLong
      err2 += bestD
      j += 1
    }
    (codes, err2)
  }

  def productQuantize(embs: DataFrame, m: Int = 8, k: Int = 16,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val spark = embs.sparkSession
    val v = embs.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
    val matrix = pqCodebooks(v, k)
    require(matrix.length > 0, "empty codebook")
    val encoded = v.withColumn("q",
      graft.functions.VectorFunctions.pq_encode(col("v"), m, matrix))
    encoded.select(
      (col("id").as(idCol) +:
        (0 until m).map(j => col("q.codes")(j).as(s"code_$j")) :+
        round(col("q.err"), 4).as("err")): _*)
  }

  /**
   * PQ asymmetric-distance top-k (the FAISS-style ADC search): the
   * corpus is held ONLY as PQ codes; a query scores a vector as
   * Σ_j ||qsub_j − codebook[j][code_j]||² — codebook lookups, never
   * the original corpus vectors. Distances round to 6 decimals before
   * ranking (id tie-break) so any engine reproduces the order.
   *
   * Scale: corpus vectors compress m·log2(k) bits each; per-query
   * DISTANCE TABLES (m×k floats — the standard PQ search trick) are
   * precomputed once and ride the plan, so the scored scan reads a
   * code row and emits one 16-byte (query, distance) pair per query —
   * no query vector ever rides a scored row, and top-k collapses via
   * the two-phase heap plan, not a corpus-sized window sort.
   */
  def pqTopK(corpus: DataFrame, queries: DataFrame, topk: Int = 5,
      m: Int = 8, k: Int = 16,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val spark = corpus.sparkSession
    val v = corpus.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
    val books = pqCodebooks(v, k)
    val codes = v.select(col("id").as("neighbor_id"),
      graft.functions.VectorFunctions.pq_codes(col("v"), m, books).as("codes"))
    // the query set is bounded by contract (it broadcasts in every ANN
    // path); collect it once and precompute each query's m×k table
    val qrows = queries
      .select(col(idCol).cast("long").as("qid"), col(vecCol).cast("array<double>").as("qv"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).sortBy(_._1)
    val qids = qrows.map(_._1)
    val tables: Array[Array[Array[Double]]] = qrows.map { case (_, qa) =>
      val subdim = qa.length / m
      Array.tabulate(m) { j =>
        Array.tabulate(books.length) { b =>
          var d = 0.0
          var i = 0
          while (i < subdim) {
            val diff = qa(j * subdim + i) - books(b)(j * subdim + i)
            d += diff * diff
            i += 1
          }
          d
        }
      }
    }
    val scored = codes
      .select(col("neighbor_id"), posexplode(pq_adc_tables(col("codes"), tables)))
      .withColumn("query_id", element_at(typedLit(qids.toSeq), col("pos") + 1))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("adist", round(col("col"), 6))
    val top = graft.relational.Relational.topKPerKey(scored,
      Seq(col("query_id")), Seq(col("adist").asc, col("neighbor_id").asc), topk)
    val w = Window.partitionBy("query_id").orderBy(col("adist"), col("neighbor_id"))
    top.withColumn("rank", row_number().over(w)) // ranks only topk rows/query
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("adist"))
  }

  /**
   * IVF-PQ: the two scale levers composed, as FAISS ships them —
   * coarse id-seeded centroids route each query to its `nprobe`
   * nearest lists (IVF cuts the scanned fraction to ~nprobe/nlist),
   * and vectors inside the probed lists are scored by asymmetric PQ
   * distance over their codes (PQ cuts bytes-per-vector to
   * m·log2(k) bits). The search scan touches codes and one list_id
   * per vector — never the float corpus. Same determinism contract
   * as [[pqTopK]]/[[ivfTopK]]: 6-decimal distance rounding before
   * ranking, lowest-id tie-breaks everywhere.
   */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, topk: Int = 5,
      nlist: Int = 32, nprobe: Int = 8, m: Int = 8, k: Int = 16,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val spark = corpus.sparkSession
    val topLists = coarseTopListsUdf(corpus, nlist, vecCol, idCol)
    val v = corpus.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
    val bc = spark.sparkContext.broadcast(pqCodebooks(v, k))
    val encode = (vec: Column) =>
      graft.functions.VectorFunctions.pq_codes(vec, m, bc.value)
    val assigned = v.select(col("id").as("neighbor_id"),
      topLists(col("v"), 1)(0).as("list_id"), encode(col("v")).as("codes"))
    val probes = queries
      .select(col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("qv"))
      .select(col("query_id"), col("qv"),
        explode(topLists(col("qv"), nprobe)).as("list_id"))
    val scored = assigned.join(broadcast(probes), "list_id")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("adist", round(pq_adc(col("qv"), col("codes"), bc.value, m), 6))
    val top = graft.relational.Relational.topKPerKey(scored,
      Seq(col("query_id")), Seq(col("adist").asc, col("neighbor_id").asc), topk)
    val w = Window.partitionBy("query_id").orderBy(col("adist"), col("neighbor_id"))
    top.withColumn("rank", row_number().over(w))
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("adist"))
  }

  /**
   * Random-projection dimensionality reduction (Johnson-Lindenstrauss
   * with ±1 Achlioptas planes): project `dims`-dim embeddings down to
   * `k` dims, out_j = Σ_i v[i]·w_ij. The plane signs are md5-derived
   * ("proj:j:i", low bit of the first 8 md5 bytes) so any engine
   * reproduces the projection exactly — same convention as
   * [[graft.functions.Md5Proj]]'s LSH planes.
   *
   * Scale: the k×dims plane matrix is a compile-time literal folded
   * into the plan (bytes, not a broadcast); the projection is one
   * shuffle-free scan using codegen'd higher-order array functions —
   * no UDF, no row explosion. The standard pre-step that makes
   * downstream ANN / clustering / dedup O(k) per vector instead of
   * O(dims).
   */
  /**
   * PCA projection onto the top `k` principal components — the
   * LEARNED counterpart of [[randomProjection]], the dimensionality
   * reduction a production ANN pipeline fits before IVF/PQ
   * (OPQ-style preprocessing) or before embedding-space clustering.
   *
   * Scale shape: ONE corpus pass computes Σx (d doubles) and the
   * flattened scatter Σxxᵀ (d² doubles) as partial-aggregated VecSum
   * rows — the shuffle carries partitions × d² doubles, never rows;
   * the eigensolve runs on the DRIVER over the d×d covariance
   * (dims-bounded — corpus size never enters); the projection is a
   * shuffle-free scan over component literals folded into the plan.
   *
   * Components are the deterministic `iters`-step power iterates
   * from e_{c+1}, with Hotelling deflation (C ← C − λ vvᵀ) between
   * components — NOT an "until converged" solve, so a SQL replay
   * running the same unrolled steps computes identical numbers
   * whatever the eigengap. Population covariance (1/n).
   */
  def pcaProject(embs: DataFrame, k: Int = 2, iters: Int = 20,
      vecCol: String = "embedding", idCol: String = "vec_id",
      whiten: Boolean = false): DataFrame =
    pcaProjectFromState(embs, momentState(embs, vecCol), k, iters, vecCol,
      idCol, whiten)

  /**
   * The MERGEABLE sufficient statistics behind [[pcaProject]]: one
   * row (n, Σx, flattened Σxxᵀ). States from disjoint corpus slices
   * ADD component-wise ([[mergeMomentStates]]) — the mergeable-summary
   * law every sketch in [[Sketches]] obeys — so a continuously
   * ingested corpus maintains its PCA model by keeping this O(d²) row
   * per batch and re-solving the d×d eigenproblem from the merged
   * state: the already-ingested corpus is NEVER rescanned, and the
   * model table is bytes regardless of corpus size.
   */
  def momentState(embs: DataFrame, vecCol: String = "embedding"): DataFrame = {
    // fused accumulator ([[graft.functions.Aggregators.MomentAgg]]):
    // the d² products fold straight into the partial buffer — no
    // per-row outer-product array (46× on the 100k-vector fit probe
    // vs the flatten(transform×transform) + VecSum formulation)
    val magg = udaf(graft.functions.Aggregators.MomentAgg)
    embs.select(col(vecCol).cast("array<double>").as("v"))
      .agg(magg(col("v")).as("ms"))
      .select(col("ms._1").as("n"), col("ms._2").as("sx"), col("ms._3").as("sxx"))
  }

  /** Component-wise sum of [[momentState]] rows → one merged state row. */
  def mergeMomentStates(states: DataFrame): DataFrame = {
    val vsum = udaf(graft.functions.Aggregators.VecSum)
    states.agg(sum(col("n")).as("n"),
      vsum(col("sx")).as("sx"), vsum(col("sxx")).as("sxx"))
  }

  /**
   * DOWNDATE: subtract a retracted slice's [[momentState]] from a
   * (merged) state — moment sums are linear, so forgetting a batch is
   * component-wise subtraction, O(d²), no corpus rescan. Completes
   * the PCA model's maintenance matrix (build / append / delete) the
   * way the minhash/ANN/paragraph indexes complete theirs with
   * tombstone+purge.
   */
  def subtractMomentState(total: DataFrame, removed: DataFrame): DataFrame =
    total.select(col("n").as("n_t"), col("sx").as("sx_t"), col("sxx").as("sxx_t"))
      .crossJoin(removed.select(col("n").as("n_r"),
        col("sx").as("sx_r"), col("sxx").as("sxx_r")))
      .select((col("n_t") - col("n_r")).as("n"),
        zip_with(col("sx_t"), col("sx_r"), (a, b) => a - b).as("sx"),
        zip_with(col("sxx_t"), col("sxx_r"), (a, b) => a - b).as("sxx"))

  /**
   * [[pcaProject]] with the model FITTED FROM a [[momentState]] row
   * (possibly merged from many ingest batches) instead of from the
   * projected frame itself — the incremental-maintenance entry point:
   * fit on the state, project whatever frame you like.
   */
  def pcaProjectFromState(embs: DataFrame, state: DataFrame, k: Int = 2,
      iters: Int = 20, vecCol: String = "embedding",
      idCol: String = "vec_id", whiten: Boolean = false): DataFrame = {
    require(k >= 1, "k >= 1")
    val v = col(vecCol).cast("array<double>")
    val agg = state.select(col("sx"), col("sxx"), col("n").cast("long")).head()
    val sx = agg.getSeq[Double](0).toArray
    val sxx = agg.getSeq[Double](1).toArray
    val n = agg.getLong(2).toDouble
    val d = sx.length
    val mean = sx.map(_ / n)
    var c = Array.tabulate(d, d)((i, j) => sxx(i * d + j) / n - mean(i) * mean(j))
    def matvec(m: Array[Array[Double]], x: Array[Double]): Array[Double] =
      m.map { row =>
        var s = 0.0; var j = 0
        while (j < d) { s += row(j) * x(j); j += 1 }
        s
      }
    def normalize(x: Array[Double]): Array[Double] = {
      val nn = math.sqrt(x.map(e => e * e).sum)
      x.map(_ / nn)
    }
    val comps = (0 until k).map { ci =>
      var x = Array.tabulate(d)(i => if (i == ci % d) 1.0 else 0.0)
      for (_ <- 1 to iters) x = normalize(matvec(c, x))
      val cx = matvec(c, x)
      var lam = 0.0
      var i = 0
      while (i < d) { lam += x(i) * cx(i); i += 1 }
      val deflated = Array.tabulate(d, d)((a, b) => c(a)(b) - lam * x(a) * x(b))
      c = deflated
      (x, lam)
    }
    val lam0 = comps.head._2
    val proj = comps.zipWithIndex.map { case ((w, lam), ci) =>
      val offset = w.zip(mean).map { case (a, b) => a * b }.sum
      val raw = aggregate(zip_with(v, typedLit(w.toSeq), (x, ww) => x * ww),
        lit(0.0), (acc, x) => acc + x) - offset
      // whitening: unit variance per component — the OPQ-style
      // preprocessing that stops the dominant direction from hogging
      // every PQ codebook bit. Variance along component ci IS its
      // Rayleigh quotient λ, already computed by the deflation step.
      // RELATIVE degeneracy guard: on rank-deficient data the deflated
      // residual's λ is fp noise of either sign — whitening by it
      // would amplify garbage, so fail loudly on any component whose
      // variance is < 1e-9 of the dominant one.
      val scaled = if (whiten) {
        require(lam > 1e-9 * math.max(lam0, Double.MinPositiveValue),
          s"whiten: component $ci variance $lam is degenerate vs leading $lam0")
        raw / math.sqrt(lam)
      } else raw
      // + 0.0 normalizes IEEE -0.0 from rounded near-zero projections
      // to +0.0 so the result is bit-identical across engines
      (round(scaled, 4) + lit(0.0)).as(s"p$ci")
    }
    embs.select(col(idCol) +: proj: _*)
  }

  def randomProjection(embs: DataFrame, k: Int = 16, dims: Int = 64,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val planes: Array[Array[Double]] = Array.tabulate(k) { j =>
      Array.tabulate(dims) { i =>
        val d = md.digest(s"proj:$j:$i".getBytes("UTF-8"))
        if ((d(7) & 1) == 1) 1.0 else -1.0
      }
    }
    val v = col(vecCol).cast("array<double>")
    val proj = planes.zipWithIndex.map { case (p, j) =>
      aggregate(zip_with(v, typedLit(p.toSeq), (x, w) => x * w),
        lit(0.0), (acc, x) => acc + x).as(s"p_$j")
    }
    embs.select(col(idCol) +: proj.toSeq: _*)
  }

  /**
   * LSH-bucketed ANN: probe `tables` independent random-projection
   * sketches; union of bucket-mates forms the candidate set, ranked
   * exactly. Recall < 1 by construction; raise `tables` / lower
   * `bits` to trade cost for recall.
   *
   * `md5Compat = true` switches the hyperplanes to md5-derived ±1
   * weights ([[graft.functions.Md5Proj]]) so a DuckDB oracle
   * recomputes identical buckets — the verification-grade
   * configuration (same plan shape and cost either way).
   */
  /**
   * Persist an IVF-PQ index as tables — at a billion vectors the
   * index IS the artifact, so the coarse quantizer, codebooks, and
   * codes are written once and every query (and every appended
   * batch) reuses them instead of re-deriving the whole structure
   * from the float corpus:
   *
   *  - `{table}_centroids` (list_id, centroid) — nlist rows
   *  - `{table}_codebooks` (b, centroid)       — k rows
   *  - `{table}_codes` (id, list_id, codes)    — the corpus, as
   *    m·log2(k)-bit codes, BUCKETED by list_id so a query's nprobe
   *    lists prune to their buckets (the [[graft.operators.Dedup
   *    .writeMinhashIndex]] pattern applied to vectors)
   *
   * Parameters (nlist, m, k) must match at query/append time, as
   * with the MinHash index. Same determinism contract as
   * [[ivfPqTopK]]; built from the same id-seeded centroids, so
   * [[annIndexTopK]] over a fresh index equals ivfPqTopK exactly.
   */
  def writeAnnIndex(corpus: DataFrame, table: String, nlist: Int = 32,
      m: Int = 8, k: Int = 16, buckets: Int = 16,
      vecCol: String = "embedding", idCol: String = "vec_id",
      metaCols: Seq[String] = Nil, refineIters: Int = 0): Unit =
    // writes the CURRENT generation's names in place (three per-table
    // flips — fine for a fresh build or a quiesced rebuild); the
    // racing-reader-safe rebuild is [[requantizeAnnIndex]], whose
    // epoch flip commits all three tables atomically
    writeAnnIndexTo(corpus, annMembers(corpus.sparkSession, table),
      nlist, m, k, buckets, vecCol, idCol, metaCols, refineIters)

  /**
   * Deterministic md5-gated TRAINING sample (the corpus_sample
   * discipline): keep the vectors whose low-14-bit hash of
   * "rqs:"+id clears the rate gate. Reproducible across runs and
   * engines, so a replayed remediation trigger retrains identically;
   * uniform over ids, so the sample preserves region proportions —
   * what Lloyd refinement needs to separate a drifted region.
   */
  def retrainSample(corpus: DataFrame, rate: Double,
      idCol: String = "vec_id"): DataFrame =
    if (rate >= 1.0) corpus
    else corpus.filter(
      graft.functions.TextFunctions.md5lo64(
        concat(lit("rqs:"), col(idCol).cast("string")))
        .bitwiseAND(lit(16383L)) < (lit(rate) * 16384).cast("long"))

  private def writeAnnIndexTo(corpus: DataFrame, nameOf: String => String,
      nlist: Int, m: Int, k: Int, buckets: Int,
      vecCol: String, idCol: String,
      metaCols: Seq[String], refineIters: Int,
      trainSampleRate: Double = 1.0): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val v = corpus.select(Seq(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v")) ++ metaCols.map(col): _*)
    // The COARSE quantizer may train on a deterministic sample: the
    // Lloyd rounds are the corpus-sized MULTIPLIER of a retrain
    // (refineIters+1 full scans), and centroid means from a uniform
    // sample converge like any mean. The PQ codebooks and the encode
    // pass stay full-corpus — each is ONE linear pass (the same cost
    // class as the codes rewrite the operation IS), and codebook
    // means starve on small samples long before centroid means do
    // (measured: sub-sampled books collapse codes to ties).
    val train =
      if (trainSampleRate >= 1.0) corpus
      else retrainSample(corpus, trainSampleRate, idCol).localCheckpoint()
    val cents = coarseCentroids(train, nlist, vecCol, idCol, refineIters)
    val books = pqCodebooks(v.select("id", "v"), k)
    graft.sources.Bucketing.writeSmallTable(
      cents.toSeq.map { case (b, c) => (b, c.toSeq) }
        .toDF("list_id", "centroid"), nameOf("centroids"))
    graft.sources.Bucketing.writeSmallTable(
      books.toSeq.zipWithIndex.map { case (c, b) => (b.toLong, c.toSeq) }
        .toDF("b", "centroid"), nameOf("codebooks"))
    graft.sources.Bucketing.writeBucketed(
      encodeRows(v, cents, books, m, metaCols), nameOf("codes"), "list_id", buckets)
  }

  /**
   * (id, list_id, codes[, meta...]) rows under a FIXED quantizer —
   * shared by build and append. `metaCols` ride along so predicates
   * can filter candidates INSIDE the index scan (the vector-DB
   * metadata-filter pattern) without ever touching the float corpus.
   */
  private def encodeRows(v: DataFrame, cents: Array[(Long, Array[Double])],
      books: Array[Array[Double]], m: Int, metaCols: Seq[String] = Nil): DataFrame = {
    val topLists = topListsFromMatrix(v.sparkSession, cents)
    val encode = (vec: Column) =>
      graft.functions.VectorFunctions.pq_codes(vec, m, books)
    v.select(Seq(col("id"), topLists(col("v"), 1)(0).as("list_id"),
      encode(col("v")).as("codes")) ++ metaCols.map(col): _*)
  }

  /** Member-name resolver for the ANN index's table group at the
    * CURRENT epoch — resolved ONCE per operation so every member read
    * of that operation sees one generation (all-old or all-new, never
    * a new quantizer with old codes). Epoch 0 = the flat names a fresh
    * [[writeAnnIndex]] creates; [[requantizeAnnIndex]] bumps it.
    * See [[graft.sources.Bucketing.rebuildEpoch]]. */
  private def annMembers(spark: SparkSession, table: String): String => String = {
    val g = graft.sources.Bucketing.currentEpoch(spark, table)
    m => if (g == 0) s"${table}_$m" else s"${table}_${m}_g$g"
  }

  private def readCentroids(spark: SparkSession, name: String,
      keyCol: String): Array[(Long, Array[Double])] =
    spark.table(name).collect()
      .map(r => (r.getAs[Number](keyCol).longValue(),
        r.getSeq[Double](r.fieldIndex("centroid")).toArray))
      .sortBy(_._1)

  /**
   * Add a batch of vectors to a persisted index under the FROZEN
   * coarse quantizer and codebooks (how IVF indexes grow in
   * production: training is an offline step, adds just encode +
   * route). One batch-sized scan; codes land as bucketed inserts —
   * corpus size never appears in the job.
   */
  def appendToAnnIndex(batch: DataFrame, table: String, m: Int = 8,
      vecCol: String = "embedding", idCol: String = "vec_id",
      metaCols: Seq[String] = Nil): Unit = {
    val spark = batch.sparkSession
    val at = annMembers(spark, table)
    val cents = readCentroids(spark, at("centroids"), "list_id")
    val books = readCentroids(spark, at("codebooks"), "b").map(_._2)
    val v = batch.select(Seq(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v")) ++ metaCols.map(col): _*)
    // re-appending a tombstoned id revokes its delete (Bucketing.clearTombstones)
    graft.sources.Bucketing.clearTombstones(batch.select(col(idCol)), table)
    graft.sources.Bucketing.appendBucketed(
      encodeRows(v, cents, books, m, metaCols), at("codes"), "list_id")
  }

  /**
   * Idempotent [[appendToAnnIndex]] for at-least-once ingest
   * (streaming `foreachBatch` replays a batch after a crash between
   * the index write and the checkpoint commit): the encoded batch
   * rows anti-join the ids already stored in their routed lists'
   * buckets — an InSet bucket-pruned, batch-sized read, never a
   * corpus scan — so a replayed batch appends nothing and ingest
   * stays exactly-once on the index.
   */
  def appendNovelToAnnIndex(batch: DataFrame, table: String, m: Int = 8,
      vecCol: String = "embedding", idCol: String = "vec_id",
      metaCols: Seq[String] = Nil): Unit = {
    val spark = batch.sparkSession
    val at = annMembers(spark, table)
    val cents = readCentroids(spark, at("centroids"), "list_id")
    val books = readCentroids(spark, at("codebooks"), "b").map(_._2)
    val v = batch.select(Seq(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v")) ++ metaCols.map(col): _*)
    val enc = encodeRows(v, cents, books, m, metaCols)
      .localCheckpoint() // batch-sized; consumed by the prune collect AND the append
    val routed = enc.select("list_id").distinct()
      .collect().map(_.getLong(0)).toSeq // bounded by min(nlist, batch)
    // revoke deletes FIRST: a re-ingested id's standing code row
    // becomes visible again and correctly fails the novelty test —
    // clearing after the anti-join would re-append a duplicate row
    // for the same id. Replays are unaffected: the marker is already
    // gone, the row exists, the id stays non-novel.
    graft.sources.Bucketing.clearTombstones(enc.select("id"), table)
    val existing = spark.table(at("codes"))
      .filter(Dedup.inSet(col("list_id"), routed)).select("id")
    graft.sources.Bucketing.appendBucketed(
      enc.join(existing, Seq("id"), "left_anti"), at("codes"), "list_id")
  }

  /**
   * IVF-PQ search against a persisted index: queries route through
   * the stored centroids to their nprobe lists, and the codes scan
   * reads ONLY those lists' buckets (InSet on the bucket column —
   * bucket pruning + parquet stats), scoring by asymmetric PQ
   * distance over the stored codebooks. Per-query cost tracks the
   * probed lists, not the corpus; the float corpus is never read.
   */
  /**
   * Delete vectors from a [[writeAnnIndex]] index by TOMBSTONE — an
   * O(batch) marker append; [[annIndexTopK]] excludes marked ids
   * inside the pruned codes scan, [[purgeAnnIndex]] drops their code
   * rows physically out of band (the [[graft.operators.Dedup
   * .deleteFromMinhashIndex]] contract applied to vectors; an
   * in-place delete would rewrite corpus-sized bucket files on the
   * serving path).
   */
  def deleteFromAnnIndex(ids: DataFrame, table: String,
      idCol: String = "vec_id"): Unit =
    graft.sources.Bucketing.appendTombstones(ids.select(col(idCol)), table)

  /** Physically drop tombstoned code rows and clear the markers (crash-safe, idempotent). */
  def purgeAnnIndex(spark: SparkSession, table: String): Unit =
    graft.sources.Bucketing.purgeTombstoned(spark, table,
      Seq(annMembers(spark, table)("codes")))

  /**
   * DRIFT SIGNAL for a persisted ANN index: one row
   * `(n_vectors, mean_residual)` where the residual is
   * `1 − cos(v, nearest stored coarse centroid)` — the quantity IVF
   * recall actually depends on. Frozen-quantizer appends
   * ([[appendToAnnIndex]]) are how production indexes grow, but if
   * the arriving vector distribution drifts away from the trained
   * centroids, vectors land in lists that no longer bound their
   * neighborhoods and recall against exact ranking decays SILENTLY.
   * Rising mean residual is that drift made observable: batch-sized
   * cost (assignment is the same in-row centroid loop the index
   * uses, [[graft.functions.TopCentroidsExpr]]), so the streaming
   * ingest loop can afford it per micro-batch — and
   * [[VectorStreams.streamingAnnIngest]] ledgers it when given a
   * drift path. The maintenance answer is [[requantizeAnnIndex]].
   */
  def annAssignmentResidual(batch: DataFrame, table: String,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val spark = batch.sparkSession
    val at = annMembers(spark, table)
    val cents = readCentroids(spark, at("centroids"), "list_id")
    val topLists = topListsFromMatrix(spark, cents)
    batch
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .select(col("v"), topLists(col("v"), 1)(0).as("list_id"))
      .join(broadcast(spark.table(at("centroids"))), Seq("list_id"))
      .select((lit(1.0) - graft.functions.VectorFunctions
        .cosine_sim(col("v"), col("centroid").cast("array<double>"))).as("r"))
      .agg(count(lit(1)).as("n_vectors"), round(avg("r"), 4).as("mean_residual"))
  }

  /** The PQ sub-quantizer count the index's stored codes actually
    * carry (codes arrays have length m) — how a restarted ingest loop
    * or a reader recovers the encode-time knob without a side channel.
    * One limit-1 read of the codes table. */
  def annIndexM(spark: SparkSession, table: String): Int =
    spark.table(annMembers(spark, table)("codes"))
      .select(size(col("codes"))).limit(1).collect()(0).getInt(0)

  /**
   * CODE-RESOLUTION signal for a persisted ANN index: one row
   * `(n_vectors, mean_pq_error)` where the error is the asymmetric PQ
   * distance between each batch vector and its OWN code under the
   * index's stored codebooks — the quantization error the ADC scoring
   * actually pays. The companion to [[annAssignmentResidual]]: a high
   * assignment residual says the COARSE quantizer drifted (fix:
   * requantize); a post-requantize residual that stays low while this
   * error stays high says CODE RESOLUTION is the binding constraint —
   * the measured m-escalation lever (the 100k-tier dense-region
   * finding: recall collapse was PQ code resolution, m=16 recovered
   * 0.144→0.321, not list count). Batch-sized; m is inferred from the
   * stored codes so the caller can't measure with a mismatched knob.
   */
  def pqReconstructionResidual(batch: DataFrame, table: String,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val spark = batch.sparkSession
    val at = annMembers(spark, table)
    val books = readCentroids(spark, at("codebooks"), "b").map(_._2)
    val m = annIndexM(spark, table)
    batch
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .select(pq_adc(col("v"),
        graft.functions.VectorFunctions.pq_codes(col("v"), m, books),
        books, m).as("e"))
      .agg(count(lit(1)).as("n_vectors"), round(avg("e"), 6).as("mean_pq_error"))
  }

  /**
   * RE-QUANTIZATION maintenance: retrain the coarse centroids and PQ
   * codebooks over the CURRENT corpus and re-encode every code row —
   * the repair for quantizer drift that frozen-quantizer growth
   * accumulates (the probe plants a drifted region and shows recall@5
   * against exact ranking collapse, then restore). Training is
   * deterministic (id-seeded means + Lloyd rounds), so a requantized
   * index is bit-identical to an index freshly built from the same
   * corpus with the same refinement (law-tested). The rebuild commits
   * through ONE atomic epoch flip ([[graft.sources.Bucketing
   * .rebuildEpoch]]): all three next-generation tables are written
   * first, then the `{table}_epoch` pointer flips LAST — a query
   * racing the swap resolves the epoch once and reads one generation
   * throughout, all-old or all-new, never the new quantizer with old
   * codes (spec-pinned by a racing-reader loop). Run it from the
   * index's single writer (the ingest loop's between-batch hook).
   * Returns one row `(n_vectors, pre_residual, post_residual)` so the
   * operator log records what the rebuild bought.
   *
   * Unlike the build-time quantizer (one id-seeded mean step — cheap
   * and fine when the corpus is what the index will serve), the
   * retrain runs `refineIters` Lloyd rounds: a drifted corpus is
   * multi-regional by definition, and the single seeded step would
   * average the regions together instead of separating them (the
   * spec's planted-drift fixture demonstrates exactly that failure).
   *
   * `trainSampleRate < 1` bounds the retrain's Lloyd cost at scale:
   * the quantizer trains on a deterministic md5-gated sample
   * ([[retrainSample]]) while the encode pass still covers every
   * vector. With 1.0 (default) the requantize ≡ fresh-build
   * determinism law holds exactly; sampled training restores recall
   * to within a spec-pinned band of the full retrain (OperatorsSpec
   * "bounded retrain") at a training cost independent of corpus size.
   */
  def requantizeAnnIndex(corpus: DataFrame, table: String, nlist: Int = 32,
      m: Int = 8, k: Int = 16, buckets: Int = 16,
      vecCol: String = "embedding", idCol: String = "vec_id",
      metaCols: Seq[String] = Nil, refineIters: Int = 3,
      trainSampleRate: Double = 1.0): DataFrame = {
    val pre = annAssignmentResidual(corpus, table, vecCol, idCol).collect()(0)
    graft.sources.Bucketing.rebuildEpoch(corpus.sparkSession, table,
      Seq("centroids", "codebooks", "codes")) { nameOf =>
      writeAnnIndexTo(corpus, nameOf, nlist, m, k, buckets, vecCol, idCol,
        metaCols, refineIters, trainSampleRate)
    }
    val post = annAssignmentResidual(corpus, table, vecCol, idCol).collect()(0)
    val spark = corpus.sparkSession
    import spark.implicits._
    Seq((pre.getLong(0), pre.getDouble(1), post.getDouble(1)))
      .toDF("n_vectors", "pre_residual", "post_residual")
  }

  def annIndexTopK(queries: DataFrame, table: String, topk: Int = 5,
      nprobe: Int = 8, m: Int = 8,
      vecCol: String = "embedding", idCol: String = "vec_id",
      candidateFilter: Option[Column] = None): DataFrame = {
    val spark = queries.sparkSession
    val at = annMembers(spark, table)
    val cents = readCentroids(spark, at("centroids"), "list_id")
    val books = readCentroids(spark, at("codebooks"), "b").map(_._2)
    val topLists = topListsFromMatrix(spark, cents)
    val probes = queries
      .select(col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("qv"))
      .select(col("query_id"), col("qv"),
        explode(topLists(col("qv"), nprobe)).as("list_id"))
      .localCheckpoint() // query-sized; consumed by the prune collect AND the join
    val probedLists = probes.select("list_id").distinct()
      .collect().map(_.getLong(0)).toSeq // bounded by queries × nprobe
    val pruned = graft.sources.Bucketing.minusTombstones(
      spark.table(at("codes")), table)
      .filter(Dedup.inSet(col("list_id"), probedLists))
    // metadata predicate applies INSIDE the pruned index scan — the
    // vector-DB filtered-search pattern: no post-filtering of a top-k
    // that might then come up short, and no float-corpus access
    val codes = candidateFilter.fold(pruned)(pruned.filter)
      .withColumnRenamed("id", "neighbor_id")
    val scored = codes.join(broadcast(probes), "list_id")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("adist", round(pq_adc(col("qv"), col("codes"), books, m), 6))
    val top = graft.relational.Relational.topKPerKey(scored,
      Seq(col("query_id")), Seq(col("adist").asc, col("neighbor_id").asc), topk)
    val w = Window.partitionBy("query_id").orderBy(col("adist"), col("neighbor_id"))
    top.withColumn("rank", row_number().over(w))
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("adist"))
  }

  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5,
      bits: Int = 8, tables: Int = 4,
      vecCol: String = "embedding", idCol: String = "vec_id",
      md5Compat: Boolean = false): DataFrame = {
    def sketch(t: Int) =
      if (md5Compat) md5_proj_bits(col(vecCol), bits, table = t)
      else rand_proj_bits(col(vecCol), bits, seed = 2000 + t)
    def sketched(df: DataFrame, id: String, v: String): DataFrame =
      df.select(col(idCol).as(id), col(vecCol).as(v),
        posexplode(array((0 until tables).map(sketch): _*)))
        .withColumnRenamed("pos", "tbl").withColumnRenamed("col", "bucket")
    val c = sketched(corpus, "neighbor_id", "cv")
    val q = sketched(queries, "query_id", "qv")
    val cand = c.join(broadcast(q),
        Seq("tbl", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    cand.withColumn("cos", cosine_sim(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cos"), 4).as("cos"))
  }

  /**
   * Multi-probe LSH top-k (Lv et al., VLDB'07 — public algorithm):
   * each query probes its exact bucket PLUS every Hamming-distance-1
   * bucket (one sign-bit flip per hyperplane), per table. A near
   * neighbor that lands one hyperplane away — the dominant miss mode
   * of sign-random-projection LSH — is recovered without adding
   * tables, so the CORPUS-side index stays `tables` rows per vector
   * (the expensive, billion-vector side) while only the query side
   * fans out ×(bits+1). At 100 TB that trade is the whole point:
   * index size and build shuffle are corpus-bound, probe fan-out is
   * query-bound. Candidates are a strict superset of
   * [[lshTopK]] at the same (bits, tables) — pinned by law test —
   * so recall can only improve; ranking/tie-break semantics are
   * identical.
   */
  def lshMultiProbeTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5,
      bits: Int = 8, tables: Int = 4,
      vecCol: String = "embedding", idCol: String = "vec_id",
      md5Compat: Boolean = false): DataFrame = {
    def sketch(t: Int) =
      if (md5Compat) md5_proj_bits(col(vecCol), bits, table = t)
      else rand_proj_bits(col(vecCol), bits, seed = 2000 + t)
    def sketched(df: DataFrame, id: String, v: String): DataFrame =
      df.select(col(idCol).as(id), col(vecCol).as(v),
        posexplode(array((0 until tables).map(sketch): _*)))
        .withColumnRenamed("pos", "tbl").withColumnRenamed("col", "bucket")
    val c = sketched(corpus, "neighbor_id", "cv")
    val q = sketched(queries, "query_id", "qv")
      .select(col("query_id"), col("qv"), col("tbl"),
        explode(array(col("bucket") +:
          (0 until bits).map(i => col("bucket").bitwiseXOR(lit(1L << i))): _*))
          .as("bucket"))
    val cand = c.join(broadcast(q), Seq("tbl", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    cand.withColumn("cos", cosine_sim(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cos"), 4).as("cos"))
  }
}
