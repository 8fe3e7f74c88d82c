package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/**
 * Text-analysis operators for training-data pipelines (north-star,
 * SURVEY §2.4): token counting, quality scoring, language ID,
 * fingerprinting. All are single-pass narrow transforms built from
 * codegen'd built-ins (+ the custom sketch expressions) — they
 * pipeline inside one stage and scale linearly.
 *
 * Every heuristic is deterministic and oracle-expressible where the
 * function surface allows (see SparkEntry.oracleSql); the hash-based
 * fingerprints are deterministic but engine-specific (rows-only
 * verification).
 */
object TextAnalysis {

  def tokens(text: Column): Column = split(lower(text), " ")

  /** Whitespace token count + a BPE-ish regex token count (letters / digits / other-symbol runs). */
  def tokenCounts(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.select(
      col(idCol),
      size(split(col(textCol), " ")).as("ws_tokens"),
      size(regexp_extract_all(lower(col(textCol)), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))
        .as("re_tokens"),
      length(col(textCol)).as("n_chars"))

  private val stopwords = Seq("the", "a", "an", "of", "and", "or", "in", "on", "to", "is")

  /**
   * Quality metrics: token count, average token length, stopword
   * ratio, distinct-token ratio, plus a composite [0,1] score
   * (length-normalized, stopword-balanced, repetition-penalized) —
   * the standard cheap pre-filters applied before expensive dedup in
   * a training-data pipeline.
   */
  def qualityScore(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val toks = tokens(col(textCol))
    val nTok = size(toks)
    val nStop = size(filter(toks, t => t.isin(stopwords: _*)))
    val nDistinct = size(array_distinct(toks))
    docs.select(
      col(idCol),
      nTok.as("n_tokens"),
      round((length(col(textCol)) - (nTok - lit(1))) / nTok, 4).as("avg_token_len"),
      round(nStop / nTok, 4).as("stopword_ratio"),
      round(nDistinct / nTok, 4).as("distinct_ratio"))
      // round(…, 6) is an identity here (4-decimal inputs × {0.4,0.2}
      // weights terminate by the 5th decimal) — rounding any tighter
      // hits exact .5 boundaries where Spark (decimal HALF_UP) and
      // DuckDB (binary rounding) legitimately disagree.
      .withColumn("quality",
        round(least(col("n_tokens") / lit(64.0), lit(1.0)) * lit(0.4)
          + least(col("stopword_ratio") * lit(5.0), lit(1.0)) * lit(0.2)
          + col("distinct_ratio") * lit(0.4), 6))
  }

  /**
   * The composite quality score as ONE composable column — identical
   * arithmetic to [[qualityScore]] (same intermediate rounding), so a
   * streaming pipeline can gate on quality inside the scan without a
   * per-doc join against a second aggregate.
   */
  def qualityCol(text: Column): Column = {
    val toks = tokens(text)
    val nTok = size(toks)
    val stopR = round(size(filter(toks, t => t.isin(stopwords: _*))) / nTok, 4)
    val distR = round(size(array_distinct(toks)) / nTok, 4)
    round(least(nTok / lit(64.0), lit(1.0)) * lit(0.4)
      + least(stopR * lit(5.0), lit(1.0)) * lit(0.2)
      + distR * lit(0.4), 6)
  }

  /**
   * Language-marker table for the heuristic classifier: per language,
   * a small set of high-frequency function words. Deterministic
   * argmax with fixed priority order (en > fr > es > de > zh) on
   * ties.
   */
  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "to", "a"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un"),
    "es" -> Seq("el", "la", "de", "los", "que", "un"),
    "de" -> Seq("der", "die", "und", "das", "ein", "ist"),
    "zh" -> Seq("de", "shi", "le", "bu", "wo", "zai"))

  /**
   * N-gram/stopword-heuristic language ID: score = count of
   * language-marker tokens; predict the max-scoring language,
   * "und" (undetermined) when every score is 0.
   */
  def langId(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val toks = tokens(col(textCol))
    val scored = docs.select(
      (col(idCol) +: langMarkers.map { case (lang, markers) =>
        size(filter(toks, t => t.isin(markers: _*))).as(s"s_$lang")
      }): _*)
    val best = langMarkers.map(m => col(s"s_${m._1}"))
    val maxScore = greatest(best: _*)
    // fixed priority: first language reaching the max wins
    val pred = langMarkers.foldRight(lit("und")) { case ((lang, _), elseCol) =>
      when(col(s"s_$lang") === maxScore && maxScore > 0, lit(lang)).otherwise(elseCol)
    }
    scored.withColumn("pred_lang", pred)
      .select(col(idCol), col("pred_lang"))
  }

  /** [[langId]]'s prediction as one composable column (same tie-break priority). */
  def predLangCol(text: Column): Column = {
    val toks = tokens(text)
    val scores = langMarkers.map { case (lang, markers) =>
      lang -> size(filter(toks, t => t.isin(markers: _*)))
    }.toMap
    val maxScore = greatest(langMarkers.map(m => scores(m._1)): _*)
    langMarkers.foldRight(lit("und")) { case ((lang, _), elseCol) =>
      when(scores(lang) === maxScore && maxScore > 0, lit(lang)).otherwise(elseCol)
    }
  }

  /**
   * Unigram language-model scoring (the CCNet-style perplexity proxy
   * without an external model): train the LM on the corpus itself —
   * one token-frequency aggregation — then score each doc by its mean
   * negative log-likelihood. Low nll ≈ ordinary text; high nll ≈
   * rare-token noise. Scale: the vocabulary table (bounded, ≪ corpus)
   * broadcasts; the corpus is scanned twice (freq pass + score pass),
   * both embarrassingly parallel.
   */
  def unigramLmScore(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    // one distributed pass builds the LM; the vocabulary is bounded
    // (Heaps' law — ~10⁷ entries even web-scale, ~100 MB as a map) so
    // it collects and broadcasts. Scoring is then a SECOND narrow
    // pass: per-doc mean NLL from the doc's own token array — nothing
    // per-token ever shuffles. (The join formulation — explode every
    // token with its doc_id, broadcast-join, re-group — moves the
    // entire token stream through a shuffle twice; measured 41 s vs
    // 9 s at 1M docs × 100 tokens.)
    val spark = docs.sparkSession
    val freqMap = docs.select(explode(tokens(col(textCol))).as("tok"))
      .groupBy("tok").agg(count("*").as("cnt")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = freqMap.values.sum.toDouble
    val bc = spark.sparkContext.broadcast(freqMap)
    val nll = udf { (ws: Seq[String]) =>
      var s = 0.0
      var n = 0
      ws.foreach { w => s -= math.log(bc.value(w) / total); n += 1 }
      if (n == 0) 0.0 else s / n
    }
    docs.select(col(idCol),
      size(tokens(col(textCol))).cast("long").as("n_tokens"),
      round(nll(tokens(col(textCol))), 4).as("nll"))
  }

  /**
   * DSIR-style importance weighting: per-doc mean log-likelihood
   * ratio between a TARGET-domain unigram LM (trained on a small
   * exemplar set, add-1 smoothed over the corpus vocabulary) and the
   * corpus LM. High log-ratio ≈ "looks like the target domain" —
   * the data-selection score for steering a training mix toward a
   * quality domain. Scale: both LM tables are vocabulary-sized and
   * broadcast; the corpus is scanned for frequencies once and scored
   * once.
   */
  def importanceWeights(docs: DataFrame, target: DataFrame,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    // both LMs are vocabulary-sized: collect + broadcast, then score
    // each doc from its own token array in one shuffle-free pass
    // (see unigramLmScore for the scale rationale)
    val spark = docs.sparkSession
    def freqOf(df: DataFrame): Map[String, Long] =
      df.select(explode(tokens(col(textCol))).as("tok"))
        .groupBy("tok").agg(count("*").as("cnt")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    val cFreq = freqOf(docs)
    val tFreq = freqOf(target)
    val cTotal = cFreq.values.sum.toDouble
    val tDenom = tFreq.values.sum.toDouble + cFreq.size
    val bcC = spark.sparkContext.broadcast(cFreq)
    val bcT = spark.sparkContext.broadcast(tFreq)
    val ratio = udf { (ws: Seq[String]) =>
      var s = 0.0
      var n = 0
      ws.foreach { w =>
        s += math.log((bcT.value.getOrElse(w, 0L) + 1) / tDenom) -
          math.log(bcC.value(w) / cTotal)
        n += 1
      }
      if (n == 0) 0.0 else s / n
    }
    docs.select(col(idCol),
      size(tokens(col(textCol))).cast("long").as("n_tokens"),
      round(ratio(tokens(col(textCol))), 4).as("importance"))
  }

  /**
   * Deterministic document fingerprints: order-sensitive polynomial
   * hash + simhash sketch, both over md5lo64 token hashes so any SQL
   * engine can recompute them exactly (the DuckDB oracle folds the
   * identical recurrence with `list_reduce`). The FNV single-pass
   * variants (`rolling_hash`, `simhash64`) remain the throughput path.
   */
  def fingerprints(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val toks = tokens(col(textCol))
    docs.select(
      col(idCol),
      poly_fingerprint(toks).as("fingerprint"),
      simhash_md5(toks).as("simhash"))
  }
}
