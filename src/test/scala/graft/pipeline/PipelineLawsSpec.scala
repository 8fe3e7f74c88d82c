package graft.pipeline

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/**
 * Pipeline-builder laws (SURVEY §5 plan): algebraic properties every
 * LibMR-compatible engine must satisfy, checked with ScalaCheck over
 * small random inputs through the REAL Spark pipeline.
 */
class PipelineLawsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def check(name: String, p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), p)
    assert(res.passed, s"$name: $res")
  }

  private val inputs: Gen[List[Long]] = Gen.listOfN(60, Gen.chooseNum(-1000L, 1000L))

  test("map fusion: map(f).map(g) == map(g compose f)") {
    check("mapFusion", Prop.forAll(inputs) { xs =>
      val f = (x: Long) => x * 3 + 1
      val g = (x: Long) => x - 7
      val fused = ExecutionBuilder.seqReader(spark, xs, 3).map(x => g(f(x))).run()
      val chained = ExecutionBuilder.seqReader(spark, xs, 3).map(f).map(g).run()
      fused.results.sorted == chained.results.sorted && fused.errors.isEmpty
    })
  }

  test("filter composition: filter(p).filter(q) == filter(p && q)") {
    check("filterConj", Prop.forAll(inputs) { xs =>
      val p = (x: Long) => x % 2 == 0
      val q = (x: Long) => x > 0
      val conj = ExecutionBuilder.seqReader(spark, xs, 3).filter(x => p(x) && q(x)).run()
      val chained = ExecutionBuilder.seqReader(spark, xs, 3).filter(p).filter(q).run()
      conj.results.sorted == chained.results.sorted
    })
  }

  test("flatMap laws: map is flatMap∘singleton; filter is flatMap∘guard; output counts add up") {
    check("flatMapLaws", Prop.forAll(inputs) { xs =>
      val f = (x: Long) => x * 2 + 1
      val p = (x: Long) => x % 3 == 0
      val asMap = ExecutionBuilder.seqReader(spark, xs, 3).map(f).run()
      val asFlat = ExecutionBuilder.seqReader(spark, xs, 3).flatMap(x => Seq(f(x))).run()
      val asFilter = ExecutionBuilder.seqReader(spark, xs, 3).filter(p).run()
      val asGuard = ExecutionBuilder.seqReader(spark, xs, 3)
        .flatMap(x => if (p(x)) Seq(x) else Nil).run()
      val fan = ExecutionBuilder.seqReader(spark, xs, 3)
        .flatMap(x => Seq.fill((math.floorMod(x, 3)).toInt)(x)).run()
      asMap.results.sorted == asFlat.results.sorted &&
        asFilter.results.sorted == asGuard.results.sorted &&
        fan.results.size == xs.map(x => math.floorMod(x, 3)).sum
    })
  }

  test("conservation: results + errors account for every input record") {
    check("conservation", Prop.forAll(inputs) { xs =>
      val r = ExecutionBuilder.seqReader(spark, xs, 3)
        .map[Long](x => if (x % 5 == 0) throw new RuntimeException("e") else x)
        .run()
      r.results.size + r.errors.size == xs.size
    })
  }

  test("reshuffle and collect never change the multiset of records") {
    implicit val mr: MRRecord[Long] = MRRecord(x => s"k$x")
    check("shuffleInvariance", Prop.forAll(inputs) { xs =>
      val r = ExecutionBuilder.seqReader(spark, xs, 4).reshuffle(4).collect().run()
      r.results.sorted == xs.sorted && r.errors.isEmpty
    })
  }

  test("accumulate(sum) over any partitioning equals the sequential fold") {
    check("accumulate", Prop.forAll(inputs, Gen.chooseNum(1, 8)) { (xs, parts) =>
      val r = ExecutionBuilder.seqReader(spark, xs, parts)
        .accumulate(0L)(_ + _)
        .collect()
        .accumulate(0L)(_ + _)
        .run()
      (if (xs.isEmpty) r.results.isEmpty else r.results == Seq(xs.sum)) && r.errors.isEmpty
    })
  }
}
