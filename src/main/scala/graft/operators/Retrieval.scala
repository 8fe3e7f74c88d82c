package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Full-text retrieval over a document corpus — BM25 scoring (the
 * lexical-search primitive the reference engine lacks entirely; its
 * only lookup surface is the CRC16 keyed point query,
 * reference `src/mr.h:94-102`). Used in training-data pipelines for
 * benchmark decontamination-by-retrieval and corpus exploration.
 *
 * Scale design (100 TB): the query side is TINY (a handful of terms),
 * so every corpus-sized quantity stays in the scan stage —
 *  - pass 1 aggregates corpus stats (N, avgdl, per-term document
 *    frequencies) into ONE row (partial+final hash agg, bytes on the
 *    shuffle);
 *  - the per-term idf weights computed from that row are closed over
 *    as literals (a broadcast of a few doubles);
 *  - pass 2 scores every document from its own token array —
 *    shuffle-free — and TakeOrderedAndProject keeps the global top-k
 *    (per-partition heaps, k rows per partition to the driver).
 * Nothing joins, nothing corpus-sized ever shuffles. An inverted
 * index (posting lists per term) only wins when queries are many and
 * repeated; for pipeline-style scoring the two-scan shape is optimal.
 */
object Retrieval {

  private def tokens(text: Column): Column = split(lower(text), " ")

  /** HALF_UP 6-decimal round — matches Spark's round() and DuckDB's round(). */
  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /**
   * BM25 top-k documents for a bag of query `terms`.
   * idf uses the +1 variant (`ln((N - df + 0.5)/(df + 0.5) + 1)`) —
   * always positive, as in Lucene. idf and avgdl are rounded to 6
   * decimals before scoring so any SQL engine reproduces the exact
   * doubles (the DuckDB oracle replays this arithmetic term-by-term
   * in the same order).
   */
  def bm25TopK(docs: DataFrame, terms: Seq[String], k: Int = 50,
      k1: Double = 1.2, b: Double = 0.75,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val toks = tokens(col(textCol))
    // pass 1: corpus stats — one row out of a full scan
    val statsRow = docs.agg(
      count(lit(1)).as("n_docs"),
      round(avg(size(toks)), 6).as("avgdl"),
      struct(terms.zipWithIndex.map { case (t, i) =>
        sum(when(array_contains(toks, t), 1L).otherwise(0L)).as(s"df_$i")
      }: _*).as("dfs")
    ).collect()(0)
    val nDocs = statsRow.getLong(0)
    val avgdl = statsRow.getDouble(1)
    val dfs = statsRow.getStruct(2)
    val idf = terms.indices.map { i =>
      val df = dfs.getLong(i)
      round6(math.log((nDocs - df + 0.5) / (df + 0.5) + 1.0))
    }
    // pass 2: score each doc from its own token array (shuffle-free),
    // fixed term order so the double sum is bit-reproducible
    val dl = size(toks).cast("double")
    val score = terms.zipWithIndex.map { case (t, i) =>
      val tf = size(filter(toks, _ === t)).cast("double")
      lit(idf(i)) * (tf * lit(k1 + 1)) / (tf + lit(k1) * (lit(1 - b) + lit(b) * dl / lit(avgdl)))
    }.reduce(_ + _)
    docs.select(col(idCol), size(toks).cast("long").as("n_tokens"), score.as("_s"))
      .orderBy(col("_s").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("n_tokens"), round(col("_s"), 4).as("bm25"))
  }

  /**
   * Reciprocal-rank fusion of two ranked candidate lists — the
   * hybrid-search combiner (lexical BM25 list + vector ANN list):
   * rrf(d) = Σ_lists 1/(c + rank_d), missing-from-a-list contributes
   * nothing. Both inputs are already top-k bounded upstream, so the
   * fusion is a full outer join of two tiny frames plus one bounded
   * sort — constant-size work regardless of corpus scale; all the
   * heavy lifting stays in the candidate generators.
   * Inputs: (id, rank) frames, rank 1-based.
   */
  def rrfFuse(a: DataFrame, b: DataFrame, kOut: Int = 20, c: Int = 60): DataFrame = {
    val fa = a.select(col("id").as("a_id"), col("rank").as("a_rank"))
    val fb = b.select(col("id").as("b_id"), col("rank").as("b_rank"))
    fa.join(fb, col("a_id") === col("b_id"), "full_outer")
      .select(
        coalesce(col("a_id"), col("b_id")).as("id"),
        (coalesce(lit(1.0) / (lit(c) + col("a_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(c) + col("b_rank")), lit(0.0))).as("_rrf"))
      .orderBy(col("_rrf").desc, col("id"))
      .limit(kOut)
      .select(col("id"), round(col("_rrf"), 6).as("rrf"))
  }

  /**
   * TF-IDF weight per (document, term) for a fixed vocabulary of
   * `terms` — the feature-extraction sibling of [[bm25TopK]] (feeds
   * downstream classifiers/cluster steps). Same two-pass shape: stats
   * collapse to one row, weights are computed in the scan stage.
   */
  def tfIdf(docs: DataFrame, terms: Seq[String],
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val toks = tokens(col(textCol))
    val statsRow = docs.agg(
      count(lit(1)).as("n_docs"),
      struct(terms.zipWithIndex.map { case (t, i) =>
        sum(when(array_contains(toks, t), 1L).otherwise(0L)).as(s"df_$i")
      }: _*).as("dfs")).collect()(0)
    val nDocs = statsRow.getLong(0)
    val dfs = statsRow.getStruct(1)
    val cols = terms.zipWithIndex.map { case (t, i) =>
      // smoothed idf ln(1 + N/(df+1)) — strictly positive even for a
      // term present in every document, so downstream ranking can
      // never invert on a ubiquitous term (plain ln(N/(df+1)) goes
      // negative once df+1 > N)
      val idf = round6(math.log1p(nDocs.toDouble / (dfs.getLong(i) + 1.0)))
      val tf = size(filter(toks, _ === t)).cast("double") / size(toks)
      round(tf * lit(idf), 6).as(s"w_$i")
    }
    docs.select(col(idCol) +: cols: _*)
  }

  /**
   * Per-document KEYWORD EXTRACTION: top-k terms by tf-idf over the
   * FULL vocabulary (not a fixed term list — the doc-tagging /
   * snippet-labeling op). Two bounded-width shuffles: (doc, term)
   * term frequencies, then the vocabulary-sized df table joins back
   * on the term — a hash join keyed by the term exactly as the bigram
   * LM joins its model (never a broadcast of an unbounded vocab, and
   * the rank cut runs on the two-phase heap, k rows per doc out).
   * Corpus size rides one 1-row stats aggregate.
   */
  /**
   * nDCG@k — the ranking-quality metric a retrieval pipeline runs
   * over large eval sets: DCG@k of the system ranking over graded
   * relevance, normalized by the ideal ordering's DCG@k.
   * `results`: (query, rank, doc_id); `rels`: (query, doc_id, rel).
   *
   * Scale: the ideal ordering cuts each query's relevance list with
   * the per-key HEAP operator ([[graft.relational.Relational
   * .topKPerKey]] — never a corpus-wide sort), and rank assignment
   * windows only the ≤ k surviving rows per query (the bounded-frame
   * idiom the RRF fusion uses). Judged rows join by (query, doc_id);
   * unjudged results gain 0.
   */
  def ndcgAtK(results: DataFrame, rels: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dcg = results.filter(col("rank") <= k)
      .join(rels, Seq("query", "doc_id"), "left_outer")
      .groupBy("query")
      .agg(sum(coalesce(col("rel"), lit(0.0)) / log2(col("rank") + 1)).as("dcg"))
    val cut = graft.relational.Relational.topKPerKey(rels,
      Seq(col("query")), Seq(col("rel").desc, col("doc_id").asc), k)
    val w = Window.partitionBy("query").orderBy(col("rel").desc, col("doc_id"))
    val idcg = cut.withColumn("irank", row_number().over(w))
      .groupBy("query")
      .agg(sum(col("rel") / log2(col("irank") + 1)).as("idcg"))
    // left-join from the QUERY UNIVERSE (the rankingMetrics
    // discipline): a query with no judged rows, or whose judged
    // relevances are all 0 (idcg = 0), gets a defined ndcg of 0
    // instead of vanishing / yielding null from 0/0
    results.select("query").distinct()
      .join(dcg, Seq("query"), "left_outer")
      .join(idcg, Seq("query"), "left_outer")
      .select(col("query"),
        when(coalesce(col("idcg"), lit(0.0)) === 0.0, lit(0.0))
          .otherwise(round(coalesce(col("dcg"), lit(0.0)) / col("idcg"), 6))
          .as("ndcg"))
  }

  /**
   * Reciprocal rank + recall@k per query — [[ndcgAtK]]'s companions
   * for binary judgments: rr = 1/rank of the first relevant result
   * (0 when none lands in the top k), recall = judged results
   * retrieved / judged total. Same join shape as ndcg: results cut at
   * k, relevance joined by (query, doc_id), one aggregate per side.
   */
  def rankingMetrics(results: DataFrame, rels: DataFrame, k: Int): DataFrame = {
    val hits = results.filter(col("rank") <= k)
      .join(rels.filter(col("rel") > 0).select("query", "doc_id"),
        Seq("query", "doc_id"), "left_semi")
    val perQuery = hits.groupBy("query")
      .agg(round(lit(1.0) / min(col("rank")), 6).as("rr"),
        count(lit(1)).as("n_hit"))
    val totals = rels.filter(col("rel") > 0)
      .groupBy("query").agg(count(lit(1)).as("n_rel"))
    // left join from totals: a query with zero retrieved judged docs
    // still reports (rr = 0, recall = 0) instead of vanishing
    totals.join(perQuery, Seq("query"), "left_outer")
      .select(col("query"), coalesce(col("rr"), lit(0.0)).as("rr"),
        round(coalesce(col("n_hit"), lit(0L)) * lit(1.0) / col("n_rel"), 6)
          .as("recall"))
  }

  def keywordsTopK(docs: DataFrame, k: Int = 3,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val nDocs = docs.count() // 1 driver value, any corpus size
    // tf feeds both the df aggregate and the score join; it computes
    // twice by design. Measured against the alternatives at 1M docs /
    // 100M tf rows: materializing it (localCheckpoint) pins the rows
    // and OOMs an 8g heap; persist() spills but costs MORE than the
    // recompute (63.5s vs 54s) and forfeits nothing only while the
    // cache lives. Two linear passes with zero memory bill win.
    val tf = docs.select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .groupBy(idCol, "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf.join(df, "term")
      .withColumn("tfidf",
        round(col("tf") * log(lit(nDocs + 1.0) / (col("df") + lit(1.0))), 6))
    graft.relational.Relational.topKPerKey(scored,
      Seq(col(idCol)), Seq(col("tfidf").desc, col("term").asc), k)
      .select(col(idCol), col("term"), col("tf"), col("tfidf"))
  }
}
