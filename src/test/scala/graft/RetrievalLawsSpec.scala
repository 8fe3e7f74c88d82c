package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Graph, Retrieval, Sketches}

/**
 * Algebraic laws of the retrieval/graph/sketch tier, checked with
 * ScalaCheck through the REAL Spark operators: exactness, bounds, and
 * conservation properties that must hold at any scale.
 */
class RetrievalLawsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def check(name: String, p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(6), p)
    assert(res.passed, s"$name: $res")
  }

  test("rrf fusion: both-list docs dominate same-rank single-list docs, ties break by id") {
    val a = Seq((1L, 1L), (2L, 2L)).toDF("id", "rank")
    val b = Seq((1L, 1L), (3L, 2L)).toDF("id", "rank")
    val out = Retrieval.rrfFuse(a, b).collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Double]("rrf")))
    // doc 1 is rank-1 in both lists: 2/61; docs 2 and 3 are rank-2 in
    // exactly one list each: 1/62 — a float tie resolved by id
    assert(out.map(_._1).toSeq === Seq(1L, 2L, 3L))
    assert(out(0)._2 === math.rint(2.0 / 61.0 * 1e6) / 1e6)
    assert(out(1)._2 === out(2)._2)
  }

  test("heavy-hitter law: MG two-pass output equals the exact groupBy for any stream and phi") {
    val streamGen = for {
      n <- Gen.chooseNum(20, 300)
      keys <- Gen.listOfN(n, Gen.frequency(
        5 -> Gen.const("hot"), 3 -> Gen.const("warm"),
        4 -> Gen.oneOf((1 to 40).map("k" + _))))
      phi <- Gen.oneOf(0.05, 0.1, 0.25, 0.4)
      parts <- Gen.chooseNum(1, 9)
    } yield (keys, phi, parts)
    check("hhExact", Prop.forAll(streamGen) { case (keys, phi, parts) =>
      val df = keys.toDF("k").repartition(parts)
      val threshold = math.ceil(phi * keys.length).toLong
      val got = Sketches.heavyHitters(df, "k", phi)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val exact = keys.groupBy(identity).view.mapValues(_.length.toLong)
        .filter(_._2 >= threshold).toMap
      got == exact
    })
  }

  test("kmv law: bottom-k aggregation is partition-invariant and keeps the k smallest distinct") {
    val gen = for {
      n <- Gen.chooseNum(1, 2000)
      vals <- Gen.listOfN(n, Gen.chooseNum(0L, 5000L))   // dense range forces duplicates
      k <- Gen.oneOf(4, 16, 64)
      split <- Gen.chooseNum(1, 7)
    } yield (vals, k, split)
    check("kmvMerge", Prop.forAll(gen) { case (vals, k, split) =>
      val agg = new graft.functions.Aggregators.BottomKDistinct(k)
      val whole = vals.foldLeft(agg.zero)(agg.reduce)
      val merged = vals.grouped(math.max(1, vals.size / split)).toSeq
        .map(g => g.foldLeft(agg.zero)(agg.reduce)).fold(agg.zero)(agg.merge)
      val expect = vals.distinct.sorted.take(k)
      whole.toSeq == expect && merged.toSeq == expect
    })
  }

  test("kmv estimate: exact below saturation, within 20% of truth at 20k distinct") {
    val small = Sketches.profile((1 to 100).map(i => s"v$i").toDF("v"),
      Seq("v" -> col("v"))).collect().head
    assert(small.getAs[Long]("m_used") === 100L)
    assert(small.getAs[Double]("distinct_est") === 100.0)
    val big = Sketches.profile((1 to 20000).map(i => s"v$i").toDF("v"),
      Seq("v" -> col("v"))).collect().head
    assert(big.getAs[Long]("m_used") === 256L)
    val est = big.getAs[Double]("distinct_est")
    assert(math.abs(est - 20000.0) / 20000.0 < 0.2, s"est=$est")
  }

  test("kmv profile counts nulls and ranks min/max on the string form") {
    val df = Seq(Some("b"), None, Some("a"), Some("c"), Some("a"))
      .toDF("v")
    val r = Sketches.profile(df, Seq("v" -> col("v"))).collect().head
    assert(r.getAs[Long]("n_rows") === 5L)
    assert(r.getAs[Long]("n_null") === 1L)
    assert(r.getAs[String]("min_v") === "a")
    assert(r.getAs[String]("max_v") === "c")
    assert(r.getAs[Double]("distinct_est") === 3.0)
  }

  test("sample quantiles: exact type-1 quantiles below k, order-invariant, monotone") {
    val gen = for {
      n <- Gen.chooseNum(1, 400)
      vals <- Gen.listOfN(n, Gen.chooseNum(-1000.0, 1000.0))
      parts <- Gen.chooseNum(1, 8)
    } yield (vals, parts)
    check("sampleQuantiles", Prop.forAll(gen) { case (vals, parts) =>
      val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, "g", v) }
        .toDF("id", "grp", "v").repartition(parts)
      val r = Sketches.sampleQuantiles(df, "grp", "v", "id", k = 512).collect().head
      val sorted = vals.sorted
      def t1(q: Double) = sorted(math.ceil(q * vals.size).toInt - 1)
      r.getAs[Long]("n_sampled") == vals.size.toLong &&
        r.getAs[Double]("p50") == t1(0.5) &&
        r.getAs[Double]("p90") == t1(0.9) &&
        r.getAs[Double]("p99") == t1(0.99) &&
        r.getAs[Double]("p50") <= r.getAs[Double]("p90") &&
        r.getAs[Double]("p90") <= r.getAs[Double]("p99")
    })
  }

  test("kmv set ops: clone sources measure jaccard 1 exactly, disjoint sources 0") {
    val texts = Seq(
      "alpha beta gamma delta epsilon zeta",
      "one two three four five six seven")
    val docs = (
      texts.zipWithIndex.map { case (t, i) => (i.toLong, "sA", t) } ++
      texts.zipWithIndex.map { case (t, i) => (10L + i, "sB", t) } ++
      Seq((20L, "sC", "red orange yellow green blue indigo")))
      .toDF("doc_id", "source", "text")
    val out = Sketches.kmvSourceOps(docs, n = 5, k = 16)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val ab = out(("sA", "sB"))
    // 6- and 7-token texts -> 2 + 3 = 5 distinct 5-gram shingles per
    // source, below k: every estimate collapses to the exact value
    assert(ab.getAs[Long]("exact_inter") === 5L)
    assert(ab.getAs[Long]("exact_union") === 5L)
    assert(ab.getAs[Double]("jaccard_est") === 1.0)
    assert(ab.getAs[Double]("union_est") === 5.0)
    assert(ab.getAs[Double]("inter_est") === 5.0)
    val ac = out(("sA", "sC"))
    assert(ac.getAs[Long]("exact_inter") === 0L)
    assert(ac.getAs[Double]("jaccard_est") === 0.0)
    assert(ac.getAs[Double]("inter_est") === 0.0)
  }

  test("bm25 law: scores are nonnegative, bounded by sum of idf*(k1+1), zero iff no term") {
    val docGen = for {
      n <- Gen.chooseNum(1, 60)
      toks <- Gen.listOfN(n, Gen.oneOf("spark", "join", "scan", "x", "y", "z"))
    } yield toks.mkString(" ")
    check("bm25Bounds", Prop.forAll(Gen.chooseNum(2, 8).flatMap(n =>
      Gen.listOfN(n, docGen))) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val out = Retrieval.bm25TopK(df, Seq("spark", "join"), k = 100)
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
      texts.zipWithIndex.forall { case (t, i) =>
        val toks = t.split(" ")
        val hasTerm = toks.contains("spark") || toks.contains("join")
        val s = out(i.toLong)
        s >= 0.0 && (s > 0.0) == hasTerm && s <= 2.2 * 2 * math.log(texts.length + 1.0)
      }
    })
  }

  test("pagerank law: ranks stay a probability distribution on symmetric graphs") {
    val graphGen = for {
      n <- Gen.chooseNum(3, 30)
      extra <- Gen.listOfN(n, Gen.zip(Gen.chooseNum(0, n - 1), Gen.chooseNum(0, n - 1)))
    } yield {
      // ring guarantees connectivity + symmetry; extra edges symmetrized
      val ring = (0 until n).map(i => (i.toLong, ((i + 1) % n).toLong))
      (ring ++ extra.collect { case (a, b) if a != b => (a.toLong, b.toLong) }).distinct
    }
    check("prDistribution", Prop.forAll(graphGen) { halfEdges =>
      val sym = (halfEdges ++ halfEdges.map(_.swap)).distinct
      val edges = sym.toDF("src", "dst")
      val ranks = Graph.pagerank(edges, iters = 3)
        .collect().map(_.getDouble(1))
      val n = sym.map(_._1).distinct.length
      ranks.length == n && math.abs(ranks.sum - 1.0) < 1e-6 && ranks.forall(_ > 0.0)
    })
  }

  test("z-value law: Morton interleave is a bijection on the 16-bit grid") {
    val ptsGen = Gen.listOfN(60, Gen.zip(Gen.chooseNum(0L, 65535L), Gen.chooseNum(0L, 65535L)))
    check("zBijective", Prop.forAll(ptsGen) { pts =>
      val distinct = pts.distinct
      val zs = distinct.toDF("x", "y")
        .select(graft.sources.FileIO.zvalue(col("x"), col("y")).as("z"))
        .collect().map(_.getLong(0))
      zs.distinct.length == distinct.length && zs.forall(z => z >= 0 && z <= 0xFFFFFFFFL)
    })
  }
}
