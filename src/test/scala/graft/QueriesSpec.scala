package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Smoke: every SparkEntry query runs at sf0.001 and the known-nonempty
 * ones return rows (the DuckDB value-level gate is tools/
 * check_correctness.py over graft.Verify output; this suite guards
 * against regressions that break a plan entirely).
 */
class QueriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // empty-at-sf0.001 results are legitimate for these
  private val mayBeEmpty =
    Set("dedup_exact", "dedup_embedding", "q_anti_join", "text_decontaminate",
      "dedup_incremental", "dedup_spans")

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"query $name executes" + (if (mayBeEmpty(name)) "" else " and returns rows")) {
      val n = fn(spark, SparkTestSession.sfDir).count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("entry() smoke-checks rows > 0") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }
}
