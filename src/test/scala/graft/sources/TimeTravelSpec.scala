package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/**
 * Time travel over the version layer: every version the grace knobs
 * retain is queryable history — by version number and by wall-clock
 * instant (the flip timestamps `flipView` records). With manifests a
 * retained version is metadata + only its unique segments, so history
 * is affordable at any table size.
 */
class TimeTravelSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def mkRows(lo: Long, hi: Long) =
    (lo until hi).map(i => (i, i * 10, s"v$i")).toDF("id", "k", "v")

  test("as-of resolves at APPEND granularity within a version, and old instants survive a rewrite") {
    val t = "graft_tt_basic"
    try {
      Bucketing.writeBucketed(mkRows(0, 100), t, "id", 2)
      Thread.sleep(5); val t1 = System.currentTimeMillis(); Thread.sleep(5)
      Bucketing.appendBucketed(mkRows(100, 200), t, "id")
      Thread.sleep(5); val t2 = System.currentTimeMillis(); Thread.sleep(5)
      Bucketing.appendBucketed(mkRows(200, 300), t, "id")

      // appends do NOT churn versions: one version, three segments
      assert(Bucketing.versionHistory(spark, t).size === 1)
      val v1 = Bucketing.versionHistory(spark, t).head._1

      assert(Bucketing.readAsOf(spark, t, t1).count() === 100)
      assert(Bucketing.readAsOf(spark, t, t2).count() === 200)
      assert(Bucketing.readAsOf(spark, t,
        System.currentTimeMillis()).count() === 300)
      // schema identical to the live view (no segment column leaks)
      assert(Bucketing.readAsOf(spark, t, t1).columns.toSeq
        === spark.table(t).columns.toSeq)
      // the CURRENT version accretes appends (documented): by-number
      // reads are rewrite-lineage snapshots, instants are readAsOf
      assert(Bucketing.readVersion(spark, t, v1).count() === 300)

      val ex = intercept[IllegalArgumentException] {
        Bucketing.readAsOf(spark, t, 1000L) // 1970: predates all history
      }
      assert(ex.getMessage.contains("retains no version"))

      // a full rewrite freezes v1; pre-rewrite instants still answer
      // exactly (v1's manifest + its per-segment registration stamps)
      Bucketing.compactBucketed(spark, t)
      assert(Bucketing.versionHistory(spark, t).map(_._1).max > v1)
      assert(Bucketing.readAsOf(spark, t, t1).count() === 100)
      assert(Bucketing.readAsOf(spark, t, t2)
        .select(sum("k")).head.getLong(0) === (0L until 200L).map(_ * 10).sum)
      assert(Bucketing.readAsOf(spark, t,
        System.currentTimeMillis()).count() === 300)
    } finally Bucketing.dropLogical(spark, t)
  }

  test("a version outside the grace window errors with the retained range, not silent wrong data") {
    val t = "graft_tt_vacuumed"
    try { // default graceVersions=1: v1 is vacuumed once v3 flips
      Bucketing.writeBucketed(mkRows(0, 50), t, "id", 2)
      Bucketing.writeBucketed(mkRows(0, 100), t, "id", 2)
      Bucketing.writeBucketed(mkRows(0, 150), t, "id", 2)
      val retained = Bucketing.versionHistory(spark, t).map(_._1)
      val gone = (1 to 10).find(!retained.contains(_)).get
      val ex = intercept[IllegalArgumentException] {
        Bucketing.readVersion(spark, t, gone)
      }
      assert(ex.getMessage.contains("retained"))
      // the retained tail still answers
      assert(Bucketing.readVersion(spark, t, retained.last).count() === 150)
    } finally Bucketing.dropLogical(spark, t)
  }

  test("history survives compaction (shared segments stay pinned by the old manifest) and old versions still segment-prune") {
    val t = "graft_tt_compact"
    spark.conf.set("spark.graft.bucketing.graceVersions", "4")
    graft.plans.SegmentPrune.ensure(spark)
    try {
      Bucketing.writeBucketed(mkRows(0, 50), t, "id", 2, statsCols = Seq("k"))
      (1 to 3).foreach(i => Bucketing.appendBucketed(
        mkRows(i * 50L, i * 50L + 50L), t, "id"))
      val preCompact = Bucketing.versionHistory(spark, t).map(_._1).max
      val before = Bucketing.readVersion(spark, t, preCompact)
        .collect().map(_.toString).sorted
      assert(Bucketing.compactBucketedPartial(spark, t, maxSegments = 2))
      // the pre-compaction version still reads its original segments
      val after = Bucketing.readVersion(spark, t, preCompact)
        .collect().map(_.toString).sorted
      assert(after === before)
      assert(after.length === 200)
      // and a range filter on the OLD version's 4-segment manifest
      // prunes through the same optimizer rule as the current view
      val q = Bucketing.readVersion(spark, t, preCompact)
        .filter(col("k").between(1500, 1800))
      q.collect()
      val parts = q.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }.map(_.metrics("numPartitions").value).sum
      assert(parts === 1L, q.queryExecution.optimizedPlan.toString)
      assert(q.count() === 31)
    } finally {
      spark.conf.unset("spark.graft.bucketing.graceVersions")
      Bucketing.dropLogical(spark, t)
    }
  }
}
