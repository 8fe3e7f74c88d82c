package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
    val scored = embs
      .select(col(idCol).as("vid"), col(labelCol).as("label_true"),
        col(vecCol).cast("array<double>").as("v"))
      .join(broadcast(cent))
      .withColumn("cos", cosine_sim(col("v"), col("centroid")))
    // argmin of (-cos, clabel) ≡ argmax cos with ascending-label
    // tie-break — map-side-combining aggregation instead of a
    // per-vector window sort over the (corpus × labels) expansion
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
   * Scale shape: centroids are tiny and broadcast everywhere; the
   * corpus is scanned once for assignment and shuffled once on
   * list_id; query cost is nprobe/nlist of the corpus instead of all
   * of it. Recall < 1 by construction — raise nprobe to trade cost
   * for recall.
   */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5,
      nlist: Int = 64, nprobe: Int = 8,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    // 1. coarse centroids: deterministic id-modulo seeding (one
    // averaging step). Round-robin over ids gives well-mixed seed
    // groups on any id distribution, and — unlike a 64-bit mix hash —
    // is exactly reproducible in the DuckDB oracle.
    val vsum = udaf(graft.functions.Aggregators.VecSum)
    val cent = corpus
      .withColumn("_b", pmod(col(idCol), lit(nlist)))
      .select(col("_b"), col(vecCol).cast("array<double>").as("v"))
      .groupBy("_b")
      .agg(vsum(col("v")).as("vs"), count("*").as("n"))
      .select(col("_b"), transform(col("vs"), x => x / col("n")).as("centroid"))
    // 2. posting lists: each corpus vector joins its nearest centroid.
    // argmax via max_by partial aggregation, NOT a window: a window
    // sorts the full (corpus × nlist) expansion per key; max_by
    // combines map-side, so the shuffle carries one row per vector.
    // Tie-break (ccos, then lowest _b) matches the oracle's ordering.
    // keep the aggregation input slim (cid, _b, ccos — the vector is
    // pruned right after the cosine): the agg buffer never copies
    // arrays, then one keyed join reattaches the vector to the 1-row-
    // per-vector result
    val slim = corpus
      .select(col(idCol).as("cid"), col(vecCol).cast("array<double>").as("cv"))
    val bestList = slim
      .join(broadcast(cent))
      .withColumn("ccos", cosine_sim(col("cv"), col("centroid")))
      .select(col("cid"), col("_b"), col("ccos"))
      .groupBy("cid")
      .agg(max_by(col("_b"), struct(col("ccos"), -col("_b"))).as("list_id"))
    val assigned = slim.join(bestList, "cid")
      .select(col("list_id"), col("cid").as("neighbor_id"), col("cv"))
    // 3. each query probes its nprobe nearest lists
    val wProbe = Window.partitionBy("query_id").orderBy(col("qcos").desc, col("_b"))
    val probes = queries
      .select(col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("qv"))
      .join(broadcast(cent))
      .withColumn("qcos", cosine_sim(col("qv"), col("centroid")))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= nprobe)
      .select(col("query_id"), col("qv"), col("_b").as("list_id"))
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
}
