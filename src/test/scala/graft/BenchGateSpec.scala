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
