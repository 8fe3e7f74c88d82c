package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/**
 * Corpus-curation operators for large-scale training-data pipelines —
 * the second tier of north-star additions (SURVEY §2.4 "North-star
 * additions"; the reference engine has none of these). Everything
 * here is the step that sits AROUND dedup in a real pipeline:
 * benchmark decontamination, chunking, repetition filters, PII
 * redaction, stratified sampling, sequence packing, and embedding
 * quantization.
 *
 * Scale stance (100 TB): every operator is either a narrow per-row
 * transform built from codegen'd built-ins (chunk, repetition,
 * redact, quantize, sample — they pipeline inside the scan stage), or
 * shuffles only keys/counts, never document text (decontaminate), or
 * shuffles one slim row per document (pack).
 */
object Curation {

  /** Lower-cased whitespace tokens of a text column. */
  private def toks(text: Column): Column = split(lower(text), " ")

  /** HALF_UP 6-decimal round — matches Spark's round() and DuckDB's round(). */
  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  // -------------------------------------------------------------------------
  // Benchmark decontamination
  // -------------------------------------------------------------------------

  /**
   * Contamination report: training docs that share at least one word
   * n-gram with any document of an evaluation/benchmark set.
   * Output: (doc_id, n_shared) — the number of DISTINCT eval n-grams
   * the doc contains. Drop these (or anything above a threshold)
   * before training to avoid benchmark leakage.
   *
   * Scale: the eval side is benchmarks — thousands of docs, MBs of
   * n-grams — so its distinct hashed shingle set is broadcast; the
   * 100 TB training corpus is scanned once, its shingles hashed in
   * the scan stage ([[graft.functions.ShingleHashesExpr]]), and only
   * rows that hit the broadcast set reach the (tiny) aggregation.
   * Nothing about the corpus is ever shuffled.
   */
  def contaminationReport(train: DataFrame, eval: DataFrame, n: Int = 5,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val evalGrams = Dedup.shinglesHashed(eval, n, textCol, idCol)
      .select(col("sh")).distinct()
    Dedup.shinglesHashed(train, n, textCol, idCol)
      .join(broadcast(evalGrams), "sh")
      .groupBy(col("id").as(idCol))
      .agg(count("*").as("n_shared"))   // shingles are distinct per doc
  }

  /** Training corpus minus everything the contamination report flags. */
  def decontaminate(train: DataFrame, eval: DataFrame, n: Int = 5,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val bad = contaminationReport(train, eval, n, textCol, idCol)
      .select(col(idCol).as("_contaminated_id"))
    train.join(broadcast(bad), train(idCol) === col("_contaminated_id"), "left_anti")
  }

  // -------------------------------------------------------------------------
  // Document chunking
  // -------------------------------------------------------------------------

  /**
   * Split each document into overlapping token-window chunks (the
   * standard pre-embedding / pre-training windowing). Chunk i covers
   * tokens [i*stride, i*stride + size) with stride = size - overlap;
   * every doc yields at least one chunk (short docs pass through
   * whole). Narrow transform: sequence + slice + posexplode, all
   * codegen — no shuffle, parallel in the number of input splits.
   */
  def chunk(docs: DataFrame, size: Int = 32, overlap: Int = 8,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(overlap < size, "overlap must be < size")
    val stride = size - overlap
    val w = split(col(textCol), " ")
    val nChunks = greatest(
      ceil((org.apache.spark.sql.functions.size(w) - lit(overlap)).cast("double") / stride),
      lit(1)).cast("int")
    docs
      .select(col(idCol), w.as("_w"),
        posexplode(sequence(lit(0), nChunks - 1)).as(Seq("chunk_id", "_i")))
      .select(
        col(idCol),
        col("chunk_id").cast("long").as("chunk_id"),
        concat_ws(" ", slice(col("_w"), col("_i") * stride + 1, lit(size))).as("chunk_text"),
        org.apache.spark.sql.functions.size(
          slice(col("_w"), col("_i") * stride + 1, lit(size))).cast("long").as("n_tokens"))
  }

  // -------------------------------------------------------------------------
  // Repetition signals (Gopher-style quality filters)
  // -------------------------------------------------------------------------

  /**
   * Within-document repetition signals: duplicate-token fraction and
   * the fraction of all 2-grams/3-grams claimed by the single most
   * frequent one. High values mark boilerplate / degenerate text —
   * the standard cheap repetition filters applied alongside
   * [[TextAnalysis.qualityScore]]. Pure array-lambda arithmetic per
   * row (O(distinct·total) on doc-sized arrays), fully codegen,
   * no shuffle.
   */
  def repetitionSignals(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    // token and gram arrays staged as columns before any lambda
    // references them: interpreted lambda bodies re-evaluate
    // non-attribute subexpressions per element, so the inlined form
    // re-split the text per gram and re-built the gram array per
    // distinct gram — O(tokens²·k) scan work per doc
    def gramsOf(w: Column, n: Column, k: Int): Column =
      when(n >= k, transform(sequence(lit(1), n - (k - 1)),
        i => concat_ws(" ", slice(w, i, lit(k)))))
        .otherwise(array().cast("array<string>"))
    val staged = docs.select(col(idCol), toks(col(textCol)).as("__w"))
      .withColumn("__n", org.apache.spark.sql.functions.size(col("__w")))
      .withColumn("__g2", gramsOf(col("__w"), col("__n"), 2))
      .withColumn("__g3", gramsOf(col("__w"), col("__n"), 3))
    def topFrac(g: Column): Column = {
      val total = org.apache.spark.sql.functions.size(g)
      val maxFreq = array_max(transform(array_distinct(g),
        d => org.apache.spark.sql.functions.size(filter(g, x => x === d))))
      when(total > 0, round(maxFreq / total, 4)).otherwise(lit(0.0))
    }
    staged.select(
      col(idCol),
      col("__n").cast("long").as("n_tokens"),
      round((col("__n") - org.apache.spark.sql.functions.size(array_distinct(col("__w"))))
        / col("__n"), 4).as("dup_token_frac"),
      topFrac(col("__g2")).as("top2_frac"),
      topFrac(col("__g3")).as("top3_frac"))
  }

  // -------------------------------------------------------------------------
  // PII redaction
  // -------------------------------------------------------------------------

  /** (pattern, replacement) redaction rules; applied in order. */
  val piiRules: Seq[(String, String)] = Seq(
    "[a-z0-9._]+@[a-z0-9.]+[a-z]" -> "<EMAIL>",
    "[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+" -> "<IP>",
    "[0-9]{3}-[0-9]{4}" -> "<PHONE>")

  /** Apply the redaction rules to a string column, in order. */
  def redact(c: Column, rules: Seq[(String, String)] = piiRules): Column =
    rules.foldLeft(c) { case (acc, (pat, repl)) => regexp_replace(acc, pat, repl) }

  /**
   * Redaction report over a text column: per-kind match counts plus
   * the md5 of the redacted text (so the scrubbed payload is
   * verifiable without shipping it). Narrow per-row regex work —
   * stays inside the scan stage at any corpus size.
   */
  def redactionReport(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    docs.select(
      col(idCol),
      org.apache.spark.sql.functions.size(
        regexp_extract_all(col(textCol), lit(piiRules(0)._1), lit(0)))
        .cast("long").as("n_emails"),
      org.apache.spark.sql.functions.size(
        regexp_extract_all(col(textCol), lit(piiRules(1)._1), lit(0)))
        .cast("long").as("n_ips"),
      org.apache.spark.sql.functions.size(
        regexp_extract_all(col(textCol), lit(piiRules(2)._1), lit(0)))
        .cast("long").as("n_phones"),
      md5(redact(col(textCol))).as("redacted_md5"))

  // -------------------------------------------------------------------------
  // Deterministic stratified sampling
  // -------------------------------------------------------------------------

  /**
   * Deterministic keep-decision for hash-threshold sampling: keep a
   * `rate` fraction of rows, chosen by the low 14 bits of
   * md5("strat:"<id>). Reproducible across engines and runs (unlike
   * rand()-based sampleBy), and row-local — composes into any scan.
   * The mask is a power of two so signed/unsigned hash
   * representations agree on the bucket.
   */
  def sampleKeep(id: Column, rate: Double): Column =
    (md5lo64(concat(lit("strat:"), id.cast("string"))).bitwiseAND(lit(16383L))
      < lit((rate * 16384).toLong))

  /**
   * Stratified downsampling: per-stratum rates (e.g. cap the dominant
   * language, keep all of a rare one) — the training-mix rebalancing
   * step. Rows whose stratum has no configured rate use
   * `defaultRate`. One narrow filter; no shuffle.
   */
  def stratifiedSample(docs: DataFrame, rates: Map[String, Double],
      defaultRate: Double, strataCol: String = "lang",
      idCol: String = "doc_id"): DataFrame = {
    val rateCol = rates.foldLeft(lit(defaultRate)) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    val h = md5lo64(concat(lit("strat:"), col(idCol).cast("string")))
      .bitwiseAND(lit(16383L))
    docs.filter(h < (rateCol * 16384).cast("long"))
  }

  /**
   * Exact uniform k-sample per source WITHOUT replacement — the
   * deterministic, distributed replacement for per-stratum reservoir
   * sampling: keep the k docs with the smallest md5("bk:"+id) hash in
   * each source. Unlike rate sampling ([[stratifiedSample]]) the
   * output size is EXACTLY min(k, |source|); unlike a random
   * reservoir the sample is reproducible and growth-stable (a doc's
   * membership changes only when k smaller hashes exist — bottom-k
   * sketches merge by pooling and re-cutting).
   *
   * Runs on the [[graft.plans.TopKPerKey]] two-phase heap plan:
   * per-partition k-heaps bound the exchange at partitions×k rows per
   * source — no full per-source sort, no single-task window, at any
   * corpus size.
   */
  def bottomKSample(docs: DataFrame, k: Int, sourceCol: String = "source",
      idCol: String = "doc_id"): DataFrame = {
    val hashed = docs.withColumn("bk_hash",
      md5lo64(concat(lit("bk:"), col(idCol).cast("string"))))
    graft.relational.Relational.topKPerKey(hashed,
        keys = Seq(col(sourceCol)),
        order = Seq(col("bk_hash").asc, col(idCol).asc), k = k)
      .drop("bk_hash")
  }

  /**
   * Deterministic weighted k-sample per source WITHOUT replacement —
   * Efraimidis–Spirakis A-ES with the md5 hash as the uniform draw:
   * u = (low63(md5("ws:"+id)) + 1) / 2^63 ∈ (0,1], key = ln(u)/w;
   * keeping the k LARGEST keys samples each doc with probability
   * proportional to its weight w, without replacement. Like
   * [[bottomKSample]] the sample is reproducible and mergeable (pool
   * and re-cut); the key is rounded to 6 decimals before ranking
   * (ties broken by id) so any engine's libm replays the selection —
   * the BM25 round6 discipline.
   *
   * Runs on the [[graft.plans.TopKPerKey]] two-phase heap plan:
   * exchange ≤ partitions×k rows per source at any corpus size.
   */
  def weightedSample(docs: DataFrame, k: Int, weight: Column,
      sourceCol: String = "source", idCol: String = "doc_id"): DataFrame = {
    val u = (md5lo64(concat(lit("ws:"), col(idCol).cast("string")))
      .bitwiseAND(lit(Long.MaxValue)).cast("double") + lit(1.0)) /
      lit(9.223372036854776e18)
    // weight is staged as a column so the ranking key references an
    // attribute, not a re-evaluated subexpression
    val staged = docs.withColumn("__w", greatest(weight.cast("double"), lit(1.0)))
      .withColumn("ws_key", round(log(u) / col("__w"), 6))
    graft.relational.Relational.topKPerKey(staged,
        keys = Seq(col(sourceCol)),
        order = Seq(col("ws_key").desc, col(idCol).asc), k = k)
      .drop("__w")
  }

  /**
   * Budget-constrained training-mix sampling: allocate a global token
   * budget across sources with sqrt smoothing (over-represented
   * sources are downsampled harder — the standard multi-source mixing
   * heuristic), then hash-threshold sample each source at its
   * computed rate. alloc_s = budget·√t_s / Σ√t, rate_s = min(1,
   * alloc_s / t_s), keep doc iff md5("mix:"+id) & 16383 <
   * ⌊rate_s·16384⌋ — the power-of-two bucket mask keeps any engine's
   * replay bit-identical; the Σ√t fold runs in sorted-source order so
   * the oracle can reproduce the exact double. Output: per-source
   * census (threshold, kept docs, kept tokens).
   *
   * Scale: one aggregation computes the per-source totals (sources
   * are bounded — dozens at 100 TB), the rate table folds on the
   * driver, and the sampling pass is a scan-stage hash probe.
   */
  def budgetMix(docs: DataFrame, budgetTokens: Long,
      textCol: String = "text", sourceCol: String = "source",
      idCol: String = "doc_id", temperature: Double = 0.5): DataFrame = {
    // temperature generalizes the smoothing: w_s = t_s^τ. τ=1 is
    // proportional sampling, τ→0 uniform across sources, τ=0.5 the
    // sqrt default. sqrt stays the τ=0.5 code path — it is correctly
    // rounded where pow(x, 0.5) is not guaranteed to be, and the
    // oracle replays sqrt() for the default query.
    def w(t: Long): Double =
      if (temperature == 0.5) math.sqrt(t.toDouble)
      else math.pow(t.toDouble, temperature)
    val withTok = docs.select(col(sourceCol).as("source"), col(idCol).as("id"),
      size(split(col(textCol), " ")).cast("long").as("ntok"))
    val totals = withTok.groupBy("source").agg(sum("ntok").as("toks"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    val sumW = totals.map { case (_, t) => w(t) }.sum
    // the rate is rounded to 6 decimals BEFORE the 16384-bucket floor so
    // any engine replaying the fold lands on the same side of the
    // threshold boundary (a last-ulp difference at a floor edge would
    // otherwise shift every downstream count for that source)
    val thrMap = totals.map { case (s, t) =>
      val rate = math.min(1.0, (budgetTokens * w(t) / sumW) / t)
      s -> math.floor(round6(rate) * 16384).toLong
    }.toMap
    // map-literal lookup, not a chained when(): O(1) plan depth however
    // many sources the corpus has
    val thrCol = element_at(typedLit(thrMap), col("source"))
    val h = md5lo64(concat(lit("mix:"), col("id").cast("string")))
      .bitwiseAND(lit(16383L))
    withTok.withColumn("thr", thrCol)
      .filter(h < col("thr"))
      .groupBy("source")
      .agg(first(col("thr")).as("thr"), count(lit(1)).as("n_kept"),
        sum("ntok").as("tokens_kept"))
  }

  /**
   * Rebalance the corpus toward a UNIFORM per-source token budget
   * with fractional repetition — the upsampling counterpart of
   * [[budgetMix]] (which can only keep-or-drop). Each source gets
   * budget/K target tokens; its rate r_s = target/t_s may exceed 1,
   * in which case every doc repeats ⌊r_s⌋ times and one extra copy
   * lands on the docs whose md5 gate falls under the fractional
   * remainder — the remainder is applied IN EXPECTATION via the
   * deterministic hash gate (≈ remainder·n_s docs get the extra copy,
   * with binomial-like deviation, so realized tokens can miss the
   * per-source target by a few docs' worth; stable under re-runs and
   * partitioning — no RNG). This is the standard "repeat the
   * small/high-quality sources" mixing lever in LLM data recipes
   * (epochs-per-source); output carries a `copy` index so downstream
   * shuffling/packing can treat repeats as distinct rows.
   *
   * Scale: per-source totals are a keyed aggregate collected to the
   * driver (sources are bounded — thousands, not billions); the
   * repeat decision is a map-literal lookup + md5 gate in the scan
   * stage, and the explode emits at most ⌈r_s⌉ slim rows per doc —
   * text never shuffles.
   */
  def upsampleMix(docs: DataFrame, budgetTokens: Long,
      textCol: String = "text", sourceCol: String = "source",
      idCol: String = "doc_id"): DataFrame = {
    val withTok = docs.select(col(sourceCol).as("source"), col(idCol).as("id"),
      size(split(col(textCol), " ")).cast("long").as("ntok"))
    val totals = withTok.groupBy("source").agg(sum("ntok").as("toks"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    val perSource = budgetTokens.toDouble / totals.length
    // round6 before every floor, same discipline as budgetMix: both
    // engines must land on the same side of each discretization edge
    val rateMap = totals.map { case (s, t) => s -> round6(perSource / t) }.toMap
    val baseMap = rateMap.map { case (s, r) => s -> math.floor(r).toLong }
    val thrMap = rateMap.map { case (s, r) =>
      s -> math.floor(round6(r - math.floor(r)) * 16384).toLong }
    val h = md5lo64(concat(lit("ups:"), col("id").cast("string")))
      .bitwiseAND(lit(16383L))
    val n = element_at(typedLit(baseMap), col("source")) +
      when(h < element_at(typedLit(thrMap), col("source")), 1L).otherwise(0L)
    withTok.withColumn("n_copies", n)
      .filter(col("n_copies") > 0)
      .select(col("source"), col("id"), col("ntok"),
        explode(sequence(lit(0L), col("n_copies") - 1)).as("copy"))
  }

  // -------------------------------------------------------------------------
  // Sequence packing
  // -------------------------------------------------------------------------

  /**
   * Quota-pack documents into fixed token-budget training sequences:
   * within each group (source/shard), docs are laid end-to-end in
   * `orderCol` order and a sequence boundary falls every `budget`
   * tokens; a doc belongs to the sequence its first token lands in.
   * Output: one row per (group, seq_id) with doc/token counts.
   *
   * Scale: the only shuffle is the per-group window sort, and the
   * window rows are (group, id, n_tokens) — 24 bytes/doc, never text.
   * Groups (sources/shards) partition the corpus, so the sort is
   * per-group parallel, not global.
   */
  def packSequences(docs: DataFrame, budget: Int = 256,
      groupCol: String = "source", orderCol: String = "doc_id",
      textCol: String = "text", skewSafe: Boolean = false): DataFrame = {
    // two shapes, identical results (law-tested): the window form is
    // cheaper when groups are balanced; `skewSafe` swaps in the
    // grouped prefix sum (Relational.groupedPrefixSums) so a giant
    // source SPANS partitions instead of collapsing into one window
    // task — pick it when one domain dominates the corpus. Either
    // way the running totals carry counts only, never text.
    val nTok = org.apache.spark.sql.functions.size(split(col(textCol), " "))
    val slim = docs.select(col(groupCol), col(orderCol), nTok.cast("long").as("_n"))
    val cum =
      if (skewSafe)
        graft.relational.Relational.groupedPrefixSums(slim,
          col(groupCol), Seq(col(orderCol)), Seq(col("_n") -> "_cum"))
      else slim.withColumn("_cum", sum(col("_n")).over(
        Window.partitionBy(col(groupCol)).orderBy(col(orderCol))))
    cum
      .withColumn("seq_id", floor((col("_cum") - col("_n")) / budget))
      .groupBy(col(groupCol), col("seq_id"))
      .agg(count("*").as("n_docs"), sum(col("_n")).cast("long").as("n_tokens"))
  }

  /**
   * Deterministic round-robin interleave of sources into a training
   * order — the "spread every source evenly through the epoch" step
   * that follows mixture allocation (a source-clustered order makes
   * early training see one distribution). Position = (intra-source
   * rank − 1) · |sources| + source-index: per-source ranks come from
   * a window PARTITIONED by source (parallel; no global window), the
   * source index from a broadcast-joined table of the (few) distinct
   * sources. Positions are unique and reproducible — the same
   * interleave on every run and every engine.
   */
  def interleaveBySource(docs: DataFrame, srcCol: String = "source",
      idCol: String = "doc_id", skewSafe: Boolean = false): DataFrame = {
    val srcIdx = docs.select(col(srcCol).as("_s")).distinct()
      .withColumn("_sidx",
        row_number().over(Window.orderBy(col("_s"))).cast("long") - 1)
    val nSrc = srcIdx.groupBy().agg(count(lit(1)).as("_nsrc"))
    // intra-source rank: the window form when sources are balanced;
    // `skewSafe` computes it as a grouped prefix COUNT so a dominant
    // source spans partitions instead of one window task (law-tested
    // identical)
    val ranked =
      if (skewSafe)
        graft.relational.Relational.groupedPrefixSums(
          docs.select(col(idCol), col(srcCol)),
          col(srcCol), Seq(col(idCol)), Seq(lit(1L) -> "_r"))
      else docs.select(col(idCol), col(srcCol))
        .withColumn("_r", row_number().over(
          Window.partitionBy(col(srcCol)).orderBy(col(idCol))).cast("long"))
    ranked
      .join(broadcast(srcIdx), col(srcCol) === col("_s"))
      .crossJoin(broadcast(nSrc))
      .select(((col("_r") - 1) * col("_nsrc") + col("_sidx")).as("pos"),
        col(idCol), col(srcCol))
  }

  /**
   * DSIR importance RESAMPLING — the selection step that follows
   * [[TextAnalysis.importanceWeights]]: each doc is accepted with
   * probability min(1, rate·e^w / mean(e^w)) (target-like docs
   * upsampled, off-domain docs thinned), decided by the deterministic
   * md5 hash gate from [[sampleKeep]]'s discipline: the acceptance
   * probability is 6-decimal-rounded BEFORE the ×16384 floor
   * discretization, so every engine lands on the same side of every
   * gate (the corpus_mix lesson). One 1-row mean broadcast; the gate
   * is a scan-stage filter.
   */
  def importanceResample(docs: DataFrame, target: DataFrame, rate: Double = 0.5,
      maxVocab: Int = 1000000, textCol: String = "text", idCol: String = "doc_id",
      srcCol: String = "source"): DataFrame = {
    val imp = TextAnalysis.importanceWeights(docs, target, textCol, idCol,
      maxVocab = maxVocab)
    val m = imp.agg(round(avg(exp(col("importance"))), 6).as("mex"))
    imp.crossJoin(broadcast(m))
      .withColumn("p",
        round(least(lit(1.0), lit(rate) * exp(col("importance")) / col("mex")), 6))
      .filter(
        md5lo64(concat(lit("rs:"), col(idCol).cast("string"))).bitwiseAND(lit(16383L))
          < floor(col("p") * 16384).cast("long"))
      .join(docs.select(col(idCol), col(srcCol)), idCol)
      .groupBy(srcCol)
      .agg(count(lit(1)).as("n_kept"), round(avg("importance"), 4).as("avg_importance"))
  }

  /**
   * Per-source distribution drift: KL(P_source ‖ P_corpus) over the
   * unigram token distributions — the governance number that says
   * "this source's language no longer looks like the corpus" (rising
   * KL on a feed is an early signal of scraping drift or contamination).
   * All three count tables are distributed aggregates joined on the
   * token; only the 1-row corpus total broadcasts. KL is exact up to
   * the final 4-decimal round (each term is a ratio of longs).
   */
  def sourceDivergence(docs: DataFrame, textCol: String = "text",
      srcCol: String = "source"): DataFrame = {
    val tok = docs.select(col(srcCol).as("source"), explode(toks(col(textCol))).as("t"))
    val st = tok.groupBy("source", "t").agg(count(lit(1)).as("c_st"))
    val stot = st.groupBy("source")
      .agg(sum("c_st").as("n_tokens"), count(lit(1)).as("n_types"))
    val ct = tok.groupBy("t").agg(count(lit(1)).as("c_t"))
    val tot = ct.agg(sum("c_t").cast("double").as("tot"))
    st.join(stot, "source").join(ct, "t").crossJoin(broadcast(tot))
      .select(col("source"), col("n_tokens"), col("n_types"),
        ((col("c_st") / col("n_tokens")) *
          log((col("c_st") / col("n_tokens")) / (col("c_t") / col("tot")))).as("term"))
      .groupBy("source", "n_tokens", "n_types")
      .agg(round(sum("term"), 4).as("kl"))
  }

  // -------------------------------------------------------------------------
  // Duplication governance signals
  // -------------------------------------------------------------------------

  /**
   * Per-document duplication fraction (the RefinedWeb/Dolma curation
   * signal): the share of a doc's distinct n-gram shingles that also
   * appear in at least one other doc. Unlike pair-based dedup this is
   * a per-doc SCORE — pipelines threshold it ("drop docs that are
   * > 60 % boilerplate") without materializing any pair graph.
   * Scale: shingles are 8-byte hashes from the one-pass scan
   * expression; the doc-frequency table and the re-join shuffle only
   * (hash, count) rows — no text ever moves.
   */
  def dupFraction(docs: DataFrame, n: Int = 5, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val sh = docs.select(col(idCol).as("id"),
      explode(shingle_hashes(col(textCol), n)).as("sh"))
    val dfreq = sh.groupBy("sh").agg(count(lit(1)).as("df"))
    sh.join(dfreq, "sh")
      .groupBy("id")
      .agg(
        count(lit(1)).as("n_shingles"),
        sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_dup"))
      .select(col("id").as(idCol), col("n_shingles"), col("n_dup"),
        round(col("n_dup") / col("n_shingles"), 4).as("dup_frac"))
  }

  /**
   * Source-overlap matrix (corpus governance): for every pair of
   * sources, how many distinct n-gram shingles they share — the
   * aggregate view of cross-source contamination (a high cell says
   * two "different" sources are republishing the same text). One
   * distinct projection to (source, shingle-hash), then a shingle-
   * keyed self-join: per-shingle work is bounded by sources², and
   * sources are few, so the join output is posting-list sized.
   */
  def sourceOverlapMatrix(docs: DataFrame, n: Int = 5, textCol: String = "text",
      srcCol: String = "source"): DataFrame = {
    // posting-list form, not a self-join: ONE shuffle aggregates each
    // shingle's source set (bounded by |sources|), pairs explode from
    // inside the set — shingles seen by a single source (the vast
    // majority) never produce a row past the aggregate. Measured
    // 22 s → ~7 s at 200k docs × 64 sources vs distinct + self-join.
    val sets = docs.select(col(srcCol).as("src"),
        explode(shingle_hashes(col(textCol), n)).as("sh"))
      .groupBy("sh").agg(sort_array(collect_set(col("src"))).as("ss"))
      .filter(size(col("ss")) >= 2)
    sets
      .select(explode(col("ss")).as("source_a"), col("ss"))
      .select(col("source_a"), explode(col("ss")).as("source_b"))
      .filter(col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_shared"))
  }

  // -------------------------------------------------------------------------
  // Snapshot delta (recrawl / CDC diff)
  // -------------------------------------------------------------------------

  /**
   * Row-level delta between two corpus snapshots keyed by `idCol`:
   * `added` (key only in `next`), `removed` (key only in `prev`),
   * `changed` (key in both, content hash differs), `unchanged`.
   * The step a continuous-crawl pipeline runs per recrawl so only the
   * changed slice flows downstream (re-embed / re-dedup / re-score)
   * instead of the whole corpus.
   *
   * Scale stance (100 TB): each side is first projected to
   * (id, md5(content)) — the full-outer join moves ~50 bytes per row,
   * never document text; on a real deployment both snapshots live
   * bucketed by id ([[graft.sources.Bucketing]]) so the join is
   * shuffle-free sort-merge. The id survives in the output so the
   * changed set re-joins its text by key.
   */
  def snapshotDiff(prev: DataFrame, next: DataFrame, idCol: String,
      contentCols: Seq[String]): DataFrame = {
    def slim(df: DataFrame, side: String) =
      df.select(col(idCol).as(s"${side}_id"),
        md5(concat_ws("", contentCols.map(col): _*)).as(s"${side}_h"))
    slim(prev, "p").join(slim(next, "n"), col("p_id") === col("n_id"), "full_outer")
      .select(coalesce(col("p_id"), col("n_id")).as(idCol),
        when(col("p_id").isNull, "added")
          .when(col("n_id").isNull, "removed")
          .when(col("p_h") =!= col("n_h"), "changed")
          .otherwise("unchanged").as("status"))
  }

  /**
   * Per-domain TOKEN-budget cap: admit docs in deterministic-random
   * priority order until the source's running token total crosses the
   * budget (soft cap — the crossing doc admits: the standard greedy
   * fill). The naive form is a per-source cumulative window, which
   * puts an ENTIRE domain in one task — a billion-doc domain is the
   * classic skew-killer. Instead: one GLOBAL distributed prefix sum
   * over the (source, pri, id) total order
   * ([[graft.relational.Relational.cumulativeSums]] — range
   * partitions, so a big domain SPANS partitions), then subtract each
   * source's base offset (exclusive running total of whole preceding
   * sources — a sources-sized table that broadcasts). No single task
   * ever holds a domain.
   */
  def domainTokenCap(docs: DataFrame, budgetTokens: Long,
      srcCol: String = "source", idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val slim = docs.select(col(srcCol).as("source"), col(idCol),
      md5lo64(concat(lit("cap:"), col(idCol).cast("string")))
        .bitwiseAND(lit(16383L)).as("pri"),
      size(split(lower(col(textCol)), " ")).cast("long").as("ntok"))
    graft.relational.Relational.groupedPrefixSums(slim, col("source"),
        Seq(col("pri"), col(idCol)), Seq(col("ntok") -> "cum_incl"))
      .withColumn("tok_before", col("cum_incl") - col("ntok"))
      .filter(col("tok_before") < budgetTokens)
      .select(col("source"), col(idCol), col("pri"), col("ntok"))
  }

  /**
   * Deterministic EPOCH SHUFFLE: materialize per-epoch training order.
   * Every (epoch, doc) pair hashes to a shard and a within-shard
   * position — a different order every epoch, bit-reproducible from
   * the seed string alone. One exchange on (epoch, shard) + per-shard
   * sorts; shard count is chosen so a shard fits an executor (the
   * WebDataset/Megatron shard-building shape) — there is never a
   * global sort of the corpus.
   */
  def epochShuffle(docs: DataFrame, epochs: Int = 2, shards: Int = 8,
      idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    val eps = spark.range(0, epochs.toLong).toDF("epoch")
    val assigned = docs.select(idCol).crossJoin(eps) // epochs-row side: broadcast
      .withColumn("h", md5lo64(concat(lit("ep"), col("epoch").cast("string"),
        lit(":"), col(idCol).cast("string"))).bitwiseAND(lit(16383L)))
      .withColumn("shard", pmod(col("h"), lit(shards.toLong)))
    val w = Window.partitionBy("epoch", "shard").orderBy(col("h"), col(idCol))
    assigned.withColumn("pos", row_number().over(w).cast("long"))
      .select(col("epoch"), col("shard"), col("pos"), col(idCol))
  }

  /**
   * Apply a CDC delta to a stored snapshot — MERGE INTO semantics
   * expressed relationally: deletes drop their target row, updates
   * replace it, inserts append, and rows untouched by the delta pass
   * through unchanged. The delta carries an `op` column ('D' delete,
   * anything else upsert) plus the full payload for upserts. At scale
   * the anti-join's right side is the delta's id set — delta-sized,
   * so it broadcasts and the corpus never shuffles; with both sides
   * bucketed on the id the join co-locates instead. Composes with
   * [[snapshotDiff]]: a delta derived from diff(prev, next) applied
   * to prev reproduces next exactly (law-tested).
   */
  def applyDelta(prev: DataFrame, delta: DataFrame, idCol: String = "doc_id",
      opCol: String = "op"): DataFrame = {
    val untouched = prev.join(delta.select(col(idCol)), Seq(idCol), "left_anti")
    untouched.unionByName(delta.filter(col(opCol) =!= "D").drop(opCol))
  }

  /**
   * Incremental aggregate maintenance (materialized-view update): the
   * per-source (doc count, token sum) statistics of `next` computed
   * WITHOUT re-aggregating the unchanged corpus — base stats from
   * `prev` (standing in for the stored view) merged with delta
   * aggregates taken only over [[snapshotDiff]]'s added/removed/
   * changed rows. Because count and sum are abelian-group aggregates,
   * view(next) = view(prev) − agg(removed ∪ changed_old)
   *            + agg(added ∪ changed_new) — the update cost scales
   * with the delta, not the corpus. Output equals a direct aggregation
   * of `next` (the oracle), proving the maintenance algebra.
   */
  def incrementalStats(prev: DataFrame, next: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      srcCol: String = "source", baseView: Option[DataFrame] = None): DataFrame = {
    def stats(df: DataFrame, sign: Int) =
      df.groupBy(col(srcCol)).agg(
        (count(lit(1)) * sign).as("n_docs"),
        (sum(size(toks(col(textCol)))) * sign).cast("long").as("n_tokens"))
    val diff = snapshotDiff(prev, next, idCol, Seq(textCol))
    val minus = stats(prev.join(
      diff.filter(col("status").isin("removed", "changed")).select(idCol), idCol), -1)
    val plus = stats(next.join(
      diff.filter(col("status").isin("added", "changed")).select(idCol), idCol), 1)
    // a deployment passes the STORED view (source, n_docs, n_tokens);
    // recomputing it from prev is the self-contained/oracle mode
    baseView.getOrElse(stats(prev, 1)).unionByName(minus).unionByName(plus)
      .groupBy(col(srcCol))
      .agg(sum("n_docs").cast("long").as("n_docs"),
        sum("n_tokens").cast("long").as("n_tokens"))
      .filter(col("n_docs") > 0)
  }

  // -------------------------------------------------------------------------
  // Embedding quantization
  // -------------------------------------------------------------------------

  /**
   * Symmetric int8 quantization of an embedding column: per-vector
   * scale = max|v|/127, q_i = floor(v_i/scale + 0.5) ∈ [-127, 127]
   * (floor(x+0.5) instead of round() so every SQL engine agrees on
   * ties). Output carries the l2 norm, the scale, and integer
   * checksums of the quantized vector — the storage-shrink step
   * before ANN indexing (4 bytes/dim → 1). Pure array lambdas per
   * row; no shuffle.
   */
  def quantizeEmbeddings(embs: DataFrame, vecCol: String = "embedding",
      idCol: String = "vec_id"): DataFrame = {
    // the cast vector and its scale are staged as columns: referenced
    // inside the quantization lambda they would re-cast the array and
    // re-run the array_max per ELEMENT (interpreted lambda bodies
    // re-evaluate non-attribute subexpressions) — O(dims²) per row
    val staged = embs.select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
      .withColumn("__scale",
        array_max(transform(col("__v"), x => abs(x))) / lit(127.0))
    val q = transform(col("__v"), x => floor(x / col("__scale") + lit(0.5)).cast("long"))
    staged.select(
      col(idCol),
      round(sqrt(aggregate(col("__v"), lit(0.0), (a, x) => a + x * x)), 4).as("l2_norm"),
      round(col("__scale"), 6).as("scale"),
      aggregate(q, lit(0L), (a, x) => a + x).as("sum_q"),
      aggregate(q, lit(0L), (a, x) => a + abs(x)).as("sum_abs_q"))
  }

  /**
   * Deterministic shard layout + manifest for PUBLISHING a training
   * corpus: doc → shard by the content-independent md5 gate (the
   * [[trainValTest]] discipline — membership is growth-stable and
   * engine-replayable), and a per-shard manifest the dataloader
   * validates against: doc count, token/char sums, and an
   * ORDER-INVARIANT membership checksum (xor of id hashes — any
   * dropped/duplicated doc flips it, partition order can't). The
   * manifest is the |shards|-row aggregate off one scan; the physical
   * write is `df.withColumn("shard", …).write.partitionBy("shard")`
   * (the q_partitioned_sink layout) — one directory per shard,
   * pruning-friendly for shard-parallel loaders.
   */
  def shardManifest(docs: DataFrame, nShards: Int = 16,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val shard = md5lo64(concat(lit("shard:"), col(idCol).cast("string")))
      .bitwiseAND(lit(16383L)) % nShards
    docs.withColumn("shard", shard)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(toks(col(textCol))).cast("long")).as("n_tokens"),
        sum(length(col(textCol)).cast("long")).as("n_chars"),
        bit_xor(md5lo64(col(idCol).cast("string"))).as("id_checksum"))
  }

  /**
   * EXACT stratified train/val/test split. The md5-bucket split
   * (`corpus_split`) hits its fractions only in expectation — at a
   * small or skewed stratum the realized shares wander (binomial
   * noise), which matters when the contract is "validation is
   * exactly 10% of EVERY language". This variant allocates exactly:
   * within each stratum, rows are ranked by a deterministic shuffle
   * key (md5 of the id — unordered, reproducible), and split j takes
   * ranks (⌊c_{j-1}·n⌋, ⌊c_j·n⌋] where c_j is the cumulative
   * fraction — so every stratum's allocation is within 1 row of
   * exact, and the assignment is a pure function of (id, stratum
   * census), stable under re-runs.
   *
   * Scale: the per-stratum rank comes from
   * [[graft.relational.Relational.groupedPrefixSums]] — range
   * partition + per-partition window + broadcast offsets — so a
   * billion-row stratum never serializes through one window task;
   * stratum totals are one keyed aggregate broadcast back. The
   * fractions' last entry absorbs the remainder.
   */
  def stratifiedSplit(df: DataFrame, stratum: Column, shuffleKey: Column,
      fractions: Seq[(String, Double)]): DataFrame = {
    require(fractions.size >= 2, "need at least two splits")
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      "fractions must sum to 1")
    val ranked = graft.relational.Relational.groupedPrefixSums(
      df.withColumn("_strat", stratum).withColumn("_key", shuffleKey),
      col("_strat"), Seq(col("_key")), Seq((lit(1L), "_rn")))
    val totals = ranked.groupBy(col("_strat").as("_strat2"))
      .agg(count(lit(1)).as("_n"))
    val cum = fractions.scanLeft(0.0) { case (a, (_, p)) => a + p }.tail
    // first-match CASE over the cumulative boundaries; last split is ELSE
    val assigned = fractions.map(_._1).zip(cum).dropRight(1)
      .foldLeft(lit(null).cast("string")) { case (acc, (name, c)) =>
        coalesce(acc, when(col("_rn") <= floor(lit(c) * col("_n")), name))
      }
    ranked.join(broadcast(totals), col("_strat") === col("_strat2"))
      .withColumn("split", coalesce(assigned, lit(fractions.last._1)))
      .drop("_strat", "_strat2", "_key", "_rn", "_n")
  }

  /**
   * The composed per-doc INGEST DECISION against a standing corpus:
   * one verdict per batch doc with fixed priority — `dup_exact`
   * (text identical to a corpus doc) > `near_dup` (jaccard ≥
   * `threshold` against the corpus, [[Dedup.incrementalNearDupPairs]])
   * > `low_quality` (composite [[TextAnalysis.qualityCol]] <
   * `minQuality`) > `accepted`. Exact/near flags are batch-sized
   * broadcasts onto the batch scan; quality is a scan-stage column —
   * the corpus contributes one distinct-text pass and the shingle
   * probe, nothing corpus-sized shuffles twice.
   */
  def ingestDecision(batch: DataFrame, corpus: DataFrame,
      threshold: Double = 0.7, minQuality: Double = 0.5,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val exactIds = batch.join(corpus.select(col(textCol).as("t2")).distinct(),
        batch(textCol) === col("t2"), "left_semi")
      .select(col(idCol), lit(true).as("is_exact"))
    val nearIds = Dedup.incrementalNearDupPairs(batch, corpus,
        threshold = threshold, textCol = textCol, idCol = idCol)
      .select(col("new_id").as(idCol)).distinct()
      .withColumn("is_near", lit(true))
    batch
      .join(broadcast(exactIds), Seq(idCol), "left_outer")
      .join(broadcast(nearIds), Seq(idCol), "left_outer")
      .withColumn("quality", TextAnalysis.qualityCol(col(textCol)))
      .select(col(idCol),
        when(col("is_exact"), "dup_exact")
          .when(col("is_near"), "near_dup")
          .when(col("quality") < minQuality, "low_quality")
          .otherwise("accepted").as("verdict"),
        col("quality"))
  }
}
