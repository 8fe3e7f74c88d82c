package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** The segment-merge tier policy, pinned as pure math: the geometric
  * rule (`2·merged ≥ next`) must bound BOTH the standing segment count
  * and the LIFETIME bytes a row is re-merged — the amortization claim
  * behind "bytes-per-flip tracks the hot segments, not the table". */
class TierPolicySpec extends AnyFunSuite {

  private def simulate(nAppends: Int, appendBytes: Long, maxSegments: Int)
      : (Long, Int, Int) = {
    // (name, bytes) standing segments; returns (total bytes rewritten
    // by all merges, max standing count ever observed, merge count)
    var segs = Vector.empty[(String, Long)]
    var next = 0
    var rewritten = 0L
    var maxCount = 0
    var merges = 0
    (1 to nAppends).foreach { _ =>
      next += 1
      segs :+= (s"a$next", appendBytes)
      maxCount = math.max(maxCount, segs.size)
      val hot = Bucketing.chooseHotSegments(segs, maxSegments).toSet
      if (hot.nonEmpty) {
        merges += 1
        val merged = segs.filter(p => hot(p._1)).map(_._2).sum
        rewritten += merged
        next += 1
        segs = segs.filterNot(p => hot(p._1)) :+ (s"m$next", merged)
      }
    }
    (rewritten, maxCount, merges)
  }

  test("steady uniform appends: standing count stays bounded and lifetime rewrite cost is O(n log n)") {
    val n = 512
    val (rewritten, maxCount, _) = simulate(n, appendBytes = 1L, maxSegments = 8)
    assert(maxCount <= 9, s"standing segments must stay ≤ maxSegments+1, saw $maxCount")
    // each byte may re-merge once per tier: ≤ log2(n) + slack. Total
    // data = n bytes, so rewritten ≤ n · (log2 n + c). For n=512,
    // log2 = 9; pin a generous 2× envelope — the claim being defended
    // is O(n log n), the catastrophic alternative (re-merge the whole
    // corpus per trigger) is O(n²) = 262144 here, 50× the pin.
    val bound = n.toLong * (10 + 8)
    assert(rewritten <= bound,
      s"lifetime rewrite bytes $rewritten exceed the O(n log n) envelope $bound " +
        s"(O(n^2) would be ${n.toLong * n / 2})")
  }

  test("a corpus-sized cold segment is never recruited by small-append merges") {
    val big = ("corpus", 1000000L)
    var segs = Vector(big)
    var next = 0
    (1 to 64).foreach { _ =>
      next += 1
      segs :+= (s"a$next", 100L)
      val hot = Bucketing.chooseHotSegments(segs, 4).toSet
      if (hot.nonEmpty) {
        assert(!hot.contains("corpus"),
          s"tier rule must not recruit the 10000x cold segment: $hot")
        val merged = segs.filter(p => hot(p._1)).map(_._2).sum
        next += 1
        segs = segs.filterNot(p => hot(p._1)) :+ (s"m$next", merged)
      }
    }
    assert(segs.exists(_._1 == "corpus"))
  }

  test("the count bound always clears the trigger: after a merge, standing segments ≤ maxSegments") {
    // adversarial sizes: strict geometric ladder so the tier rule
    // alone would stop early — the count clause must extend the merge
    val ladder = (0 until 12).map(i => (s"s$i", 1L << (2 * i)))
    val hot = Bucketing.chooseHotSegments(ladder, 4).toSet
    assert(ladder.size - hot.size + 1 <= 4,
      s"merge must bring the count under the bound: ${ladder.size} - ${hot.size} + 1")
  }

  test("within bound: no merge proposed") {
    assert(Bucketing.chooseHotSegments(Seq(("a", 5L), ("b", 9L)), 8).isEmpty)
    assert(Bucketing.chooseHotSegments(Seq.empty, 8).isEmpty)
  }
}
