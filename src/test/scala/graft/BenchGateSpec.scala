package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench regression gate, unit-tested on synthetic records — the
  * rows/s judgment for the output-bound family (verdict r13 #8). */
class BenchGateSpec extends AnyFunSuite {

  private def gate(results: Seq[(String, Double)],
      rows: Map[String, Long] = Map.empty,
      prior: Map[String, Double] = Map.empty,
      priorRows: Map[String, Long] = Map.empty) =
    Bench.gateEntries(results, rows, prior, priorRows).map(e => e._1 -> e._2._3)

  test("latency query: >2x a >=0.5s baseline gates on wall; noise floor exempts sub-0.5s baselines") {
    assert(gate(Seq("q" -> 1.2), prior = Map("q" -> 0.5)) ===
      Seq("q" -> "wall"))
    assert(gate(Seq("q" -> 0.9), prior = Map("q" -> 0.5)).isEmpty)
    // a 0.4s baseline swings multi-x on this host: never gates
    assert(gate(Seq("q" -> 4.0), prior = Map("q" -> 0.4)).isEmpty)
    // no baseline -> no gate
    assert(gate(Seq("q" -> 9.0)).isEmpty)
  }

  test("output-bound query (>=100k rows both sides) gates on rows/s, not wall") {
    // 3M rows: wall doubled but throughput halved exactly — still
    // above the half-throughput bar by a hair -> NO gate where the
    // wall rule would have fired
    val r = Map("er" -> 3000000L)
    val pr = Map("er" -> 3000000L)
    assert(gate(Seq("er" -> 2.2), rows = r, prior = Map("er" -> 1.1),
      priorRows = pr).isEmpty,
      "host dip at constant rows must not gate an output-bound query at 2x wall")
    // genuine throughput collapse (>2x wall at same rows == <half rows/s...
    // push to 2.5x so the rows/s bar trips)
    val g = gate(Seq("er" -> 2.8), rows = r, prior = Map("er" -> 1.1), priorRows = pr)
    assert(g.size === 1 && g.head._2.startsWith("rows/s"), g.toString)
    // emitting MORE rows at the same throughput is not a regression
    assert(gate(Seq("er" -> 2.2), rows = Map("er" -> 6000000L),
      prior = Map("er" -> 1.1), priorRows = pr).isEmpty)
  }

  test("host-epoch factor: median control ratio, clamped to [1,2], 1.0 without baselines") {
    val cur = Map("lmr_count" -> 0.30, "q_scalar_funcs" -> 0.60,
      "text_quality" -> 1.30, "other" -> 9.0)
    // ratios 1.2, 1.2, 1.3 -> median 1.2
    val prior = Map("lmr_count" -> 0.25, "q_scalar_funcs" -> 0.50,
      "text_quality" -> 1.00)
    assert(math.abs(Bench.hostFactor(cur, prior) - 1.2) < 1e-9)
    // a FASTER host never tightens the gate (clamp at 1)
    assert(Bench.hostFactor(
      Map("lmr_count" -> 0.20, "q_scalar_funcs" -> 0.40, "text_quality" -> 0.8),
      prior) === 1.0)
    // an absurd control reading caps at 2 (the gate's own wall)
    assert(Bench.hostFactor(
      Map("lmr_count" -> 2.5, "q_scalar_funcs" -> 5.0, "text_quality" -> 10.0),
      prior) === 2.0)
    // no control baselines -> neutral
    assert(Bench.hostFactor(cur, Map.empty) === 1.0)
  }

  test("gate normalizes by the host factor: a 1.2x epoch stops host drift reading as regression, a real regression still trips") {
    // 2.3x wall at hf=1.2: inside the relaxed 2.4x wall -> no gate
    assert(Bench.gateEntries(Seq("q" -> 2.3), Map.empty,
      Map("q" -> 1.0), Map.empty, hf = 1.2).isEmpty)
    // same reading at hf=1.0 gates (the pre-normalization behavior)
    assert(Bench.gateEntries(Seq("q" -> 2.3), Map.empty,
      Map("q" -> 1.0), Map.empty).nonEmpty)
    // 2.5x trips even at hf=1.2 — normalization is not a blank check
    assert(Bench.gateEntries(Seq("q" -> 2.5), Map.empty,
      Map("q" -> 1.0), Map.empty, hf = 1.2).nonEmpty)
    // output-bound: throughput bar relaxes by the same factor
    val r = Map("er" -> 3000000L)
    assert(Bench.gateEntries(Seq("er" -> 2.5), r, Map("er" -> 1.1), r,
      hf = 1.2).isEmpty, "2.27x wall at constant rows inside 2.4x epoch bar")
    assert(Bench.gateEntries(Seq("er" -> 2.9), r, Map("er" -> 1.1), r,
      hf = 1.2).nonEmpty)
  }

  test("the rows/s rule only engages when BOTH sides are output-bound") {
    // current run emits 100k+ but baseline had none recorded: falls
    // back to the wall rule (old records predate row counts)
    val g = gate(Seq("q" -> 1.2), rows = Map("q" -> 200000L),
      prior = Map("q" -> 0.5))
    assert(g === Seq("q" -> "wall"))
    // small result set: wall rule even when rows are recorded
    assert(gate(Seq("q" -> 1.2), rows = Map("q" -> 10L),
      prior = Map("q" -> 0.5), priorRows = Map("q" -> 10L)) ===
      Seq("q" -> "wall"))
  }
}
