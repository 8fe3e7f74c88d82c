package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Curation

/** Semantics of the corpus-curation operators on constructed inputs. */
class CurationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("budgetMix: tiny sources keep everything, oversized sources are capped") {
    // source "big" has ~100x the tokens of "small": sqrt smoothing
    // must downsample big hard and keep small at rate 1 (thr 16384)
    val rows = (1 to 400).map(i => (i.toLong, Seq.fill(25)("tok").mkString(" "), "big")) ++
      (1 to 4).map(i => (1000L + i, Seq.fill(25)("tok").mkString(" "), "small"))
    val df = rows.toDF("doc_id", "text", "source")
    val out = Curation.budgetMix(df, budgetTokens = 2000L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .map(t => t._1 -> t).toMap
    // small: alloc = 2000*sqrt(100)/(sqrt(10000)+sqrt(100)) = 181 > 100 tokens -> rate 1
    assert(out("small")._2 === 16384L)
    assert(out("small")._3 === 4L, "rate-1 source must keep every doc")
    // big: rate = (2000*100/110)/10000 = 0.1818 -> thr 2978
    assert(out("big")._2 === 2978L)
    assert(out("big")._3 > 0L && out("big")._3 < 400L, "big source must be downsampled")
  }

  test("contaminationReport flags exactly the docs sharing an eval n-gram") {
    val train = docs(
      1L -> "alpha beta gamma delta epsilon zeta",          // shares 5-gram with eval
      2L -> "one two three four five six seven",            // clean
      3L -> "alpha beta gamma delta epsilon other tail")    // shares the same 5-gram
    val eval = docs(10L -> "alpha beta gamma delta epsilon")
    val bad = Curation.contaminationReport(train, eval).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bad.keySet == Set(1L, 3L))
    assert(bad(1L) == 1L && bad(3L) == 1L)
    val clean = Curation.decontaminate(train, eval).select("doc_id")
      .as[Long].collect().toSet
    assert(clean == Set(2L))
  }

  test("chunk covers every token with the configured overlap") {
    val d = docs(1L -> (1 to 40).map(i => s"t$i").mkString(" "))
    val chunks = Curation.chunk(d, size = 32, overlap = 8)
      .orderBy("chunk_id").collect()
    assert(chunks.length == 2)
    val first = chunks(0).getAs[String]("chunk_text").split(" ")
    val second = chunks(1).getAs[String]("chunk_text").split(" ")
    assert(first.head == "t1" && first.length == 32 && first.last == "t32")
    // stride 24: second chunk starts at token 25 → 8-token overlap
    assert(second.head == "t25" && second.last == "t40")
    assert(chunks(1).getAs[Long]("n_tokens") == 16L)
  }

  test("chunk passes short docs through whole") {
    val d = docs(1L -> "a b c")
    val chunks = Curation.chunk(d, size = 32, overlap = 8).collect()
    assert(chunks.length == 1)
    assert(chunks(0).getAs[String]("chunk_text") == "a b c")
  }

  test("repetitionSignals separates degenerate from diverse text") {
    val d = docs(
      1L -> "spam spam spam spam spam spam",
      2L -> "one two three four five six")
    val m = Curation.repetitionSignals(d).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(m(1L).getAs[Double]("dup_token_frac") > 0.8)
    assert(m(1L).getAs[Double]("top2_frac") == 1.0)   // all 2-grams identical
    assert(m(2L).getAs[Double]("dup_token_frac") == 0.0)
    assert(m(2L).getAs[Double]("top2_frac") < 0.3)
  }

  test("redact scrubs emails, IPs and phones") {
    val red = docs(1L -> "mail bob@corp.example.com ip 10.0.0.1 tel 555-1234 end")
      .select(Curation.redact(col("text")).as("r")).as[String].head()
    assert(red == "mail <EMAIL> ip <IP> tel <PHONE> end")
  }

  test("stratifiedSample is deterministic and respects per-stratum rates") {
    val d = (0L until 2000L).map(i => (i, s"text $i", if (i % 2 == 0) "en" else "rare"))
      .toDF("doc_id", "text", "lang")
    val kept = Curation.stratifiedSample(d, Map("en" -> 0.1), defaultRate = 1.0)
    val byLang = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("rare") == 1000L)                    // rate 1.0 keeps all
    assert(byLang("en") > 50L && byLang("en") < 150L)  // ~10% of 1000
    // deterministic: the same call yields the same rows
    val again = Curation.stratifiedSample(d, Map("en" -> 0.1), defaultRate = 1.0)
    assert(kept.select("doc_id").as[Long].collect().sorted
      .sameElements(again.select("doc_id").as[Long].collect().sorted))
  }

  test("packSequences respects the token budget per group") {
    // 10 docs of 100 tokens each, one source → budget 256 packs ~2.5 docs/seq
    val d = (0L until 10L).map(i => (i, (1 to 100).map(_ => "w").mkString(" "), "s0"))
      .toDF("doc_id", "text", "source")
    val seqs = Curation.packSequences(d, budget = 256).orderBy("seq_id").collect()
    // doc k starts at offset 100k → seq floor(100k/256): docs 0,1,2 → seq 0...
    assert(seqs.map(_.getAs[Long]("n_docs")).sum == 10L)
    assert(seqs.map(_.getAs[Long]("n_tokens")).sum == 1000L)
    assert(seqs.head.getAs[Long]("n_docs") == 3L)      // offsets 0,100,200 < 256
  }

  test("snapshotDiff classifies added/removed/changed/unchanged exactly") {
    val prev = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val next = Seq((2L, "b"), (3L, "c2"), (4L, "d")).toDF("doc_id", "text")
    val out = Curation.snapshotDiff(prev, next, "doc_id", Seq("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
    // scale contract: the join's inputs are slim (id, hash) projections —
    // no text column may survive below the full-outer join
    val joinNode = Curation.snapshotDiff(prev, next, "doc_id", Seq("text"))
      .queryExecution.optimizedPlan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }.head
    val joined = joinNode.children.flatMap(_.output).map(_.name)
    assert(!joined.exists(_.contains("text")), s"text leaked into join: $joined")
  }

  test("ingestDecision: one verdict per doc, exact > near > quality > accepted") {
    // corpus doc 0 is high-quality, long, diverse; the batch plants
    // one of each verdict
    val mkGood = (seed: Int) => (0 until 70).map(j => s"tok${seed}x$j").mkString(" ")
    val corpus = (0L until 5L).map(i => (i, mkGood(i.toInt))).toDF("doc_id", "text")
    val nearText = mkGood(3).split(" ").updated(10, "EDITED").mkString(" ")
    val batch = Seq(
      (100L, mkGood(0)),           // exact copy of corpus doc 0
      (101L, nearText),            // near-dup of corpus doc 3
      (102L, "a a a a a"),         // degenerate: low distinct ratio + short
      (103L, mkGood(99))           // novel and high quality
    ).toDF("doc_id", "text")
    val got = Curation.ingestDecision(batch, corpus).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(100L) === "dup_exact",
      s"exact copy must outrank its own near-dup match: $got")
    assert(got(101L) === "near_dup", got.toString)
    assert(got(102L) === "low_quality", got.toString)
    assert(got(103L) === "accepted", got.toString)
  }

  test("quantizeEmbeddings keeps values in int8 range and preserves scale") {
    val d = Seq((1L, Array(0.5f, -1.0f, 0.25f, 0.0f))).toDF("vec_id", "embedding")
    val r = Curation.quantizeEmbeddings(d).head()
    // scale = 1.0/127; max |q| must be exactly 127
    assert(math.abs(r.getAs[Double]("scale") - 1.0 / 127) < 1e-6)
    assert(r.getAs[Long]("sum_abs_q") == 127L + 64L + 32L)  // 0.5→64, -1→-127, 0.25→32
    assert(r.getAs[Long]("sum_q") == 64L - 127L + 32L)
    assert(math.abs(r.getAs[Double]("l2_norm") - math.sqrt(0.25 + 1.0 + 0.0625)) < 1e-3)
  }
}
