package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.sources.Bucketing

/**
 * The automatic segment-prune rule: plain `spark.table(t).filter(...)`
 * over a manifest table with zone stats must read ONLY the segments
 * whose [min,max] intersect the filter's range — no explicit
 * `readSegmentsPruned` call — and must never change results.
 * Partition counts are read off the executed scan's own metrics, so
 * the pins hold for whatever plan Spark actually ran.
 */
class SegmentPruneSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  SegmentPrune.ensure(spark)

  private def mkRows(lo: Long, hi: Long) =
    (lo until hi).map(i => (i, i * 10, s"v$i")).toDF("id", "k", "v")

  /** Partitions the executed plan's parquet scan actually read. */
  private def partitionsRead(df: DataFrame): Long = {
    df.collect()
    val scans = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty, df.queryExecution.executedPlan.toString)
    scans.map(_.metrics("numPartitions").value).sum
  }

  test("a bare range filter reads only intersecting segments; result ≡ unpruned") {
    val t = "graft_autoprune_t"
    try {
      Bucketing.writeBucketed(mkRows(0, 100), t, "id", 2, statsCols = Seq("k"))
      Bucketing.appendBucketed(mkRows(100, 200), t, "id")
      Bucketing.appendBucketed(mkRows(200, 300), t, "id")
      // inside the middle segment's k-span [1000, 1990]
      val q = spark.table(t).filter(col("k").between(1500, 1800))
      assert(partitionsRead(q) === 1L,
        q.queryExecution.optimizedPlan.toString)
      assert(q.count() === 31) // k = 1500, 1510, ..., 1800
      // boundary-inclusive range spanning two segments
      val q2 = spark.table(t).filter(col("k") >= 990 && col("k") <= 1000)
      assert(partitionsRead(q2) === 2L)
      assert(q2.select(sum("k")).head.getLong(0) === 990L + 1000L)
      // out-of-range: zero partitions, empty result, schema intact
      val q3 = spark.table(t).filter(col("k") > 99999)
      assert(partitionsRead(q3) === 0L)
      assert(q3.columns.toSeq === Seq("id", "k", "v"))
      // IN-list prunes by its min/max envelope
      val q4 = spark.table(t).filter(col("k").isin(1500, 1510))
      assert(partitionsRead(q4) === 1L)
      assert(q4.count() === 2)
    } finally Bucketing.dropLogical(spark, t)
  }

  test("no stats column in the predicate, or no stats at all: plan untouched, all segments read") {
    val t = "graft_autoprune_nostat"
    try {
      Bucketing.writeBucketed(mkRows(0, 50), t, "id", 2, statsCols = Seq("k"))
      Bucketing.appendBucketed(mkRows(50, 100), t, "id")
      // v is not a stats column — every segment scans
      val q = spark.table(t).filter(col("v") === "v7")
      assert(partitionsRead(q) === 2L)
      assert(q.count() === 1)
      // a table without statsCols never pays the catalog lookup
      val t2 = "graft_autoprune_none"
      try {
        Bucketing.writeBucketed(mkRows(0, 50), t2, "id", 2)
        Bucketing.appendBucketed(mkRows(50, 100), t2, "id")
        val q2 = spark.table(t2).filter(col("k") <= 100)
        assert(partitionsRead(q2) === 2L)
        assert(q2.count() === 11)
      } finally Bucketing.dropLogical(spark, t2)
    } finally Bucketing.dropLogical(spark, t)
  }

  test("disjunctions and expressions over the column stay safe: no pruning, correct rows") {
    val t = "graft_autoprune_disj"
    try {
      Bucketing.writeBucketed(mkRows(0, 50), t, "id", 2, statsCols = Seq("k"))
      Bucketing.appendBucketed(mkRows(50, 100), t, "id")
      // OR at the top level: no conjunct constrains k alone
      val q = spark.table(t).filter(col("k") === 0 || col("k") === 990)
      assert(partitionsRead(q) === 2L)
      assert(q.count() === 2)
      // column wrapped in arithmetic: conservatively unextracted
      val q2 = spark.table(t).filter(col("k") + 1 === 991)
      assert(partitionsRead(q2) === 2L)
      assert(q2.count() === 1)
    } finally Bucketing.dropLogical(spark, t)
  }

  test("pruning survives compaction and stays correct on the merged manifest") {
    val t = "graft_autoprune_merge"
    try {
      Bucketing.writeBucketed(mkRows(0, 50), t, "id", 2, statsCols = Seq("k"))
      (1 to 4).foreach(i => Bucketing.appendBucketed(
        mkRows(i * 50L, i * 50L + 50L), t, "id"))
      Bucketing.compactBucketedPartial(spark, t, maxSegments = 3)
      assert(Bucketing.segmentCount(spark, t) <= 3)
      // a fresh append after the merge: its span prunes away the
      // merged history (stats composed under the merge)
      Bucketing.appendBucketed(mkRows(250, 300), t, "id")
      val total = Bucketing.segmentCount(spark, t)
      assert(total >= 2)
      val q = spark.table(t).filter(col("k") >= 2500)
      assert(partitionsRead(q) === 1L)
      assert(q.count() === 50) // k = 2500, 2510, ..., 2990
      // and the merged history still answers correctly below the cut
      assert(spark.table(t).filter(col("k") < 2500).count() === 250)
    } finally Bucketing.dropLogical(spark, t)
  }

  test("timestamp-keyed table prunes through the same cast encoding the stats writer used") {
    val t = "graft_autoprune_ts"
    try {
      val df = (0 until 90).map { i =>
        val m = 1 + i / 30
        val d = 1 + i % 30
        (i.toLong, java.sql.Timestamp.valueOf(f"2024-$m%02d-$d%02d 12:00:00"))
      }.toDF("id", "ts")
      Bucketing.writeBucketed(df.filter(month(col("ts")) === 1), t, "id", 2,
        statsCols = Seq("ts"))
      Bucketing.appendBucketed(df.filter(month(col("ts")) === 2), t, "id")
      Bucketing.appendBucketed(df.filter(month(col("ts")) === 3), t, "id")
      val q = spark.table(t).filter(
        col("ts").between("2024-02-05 00:00:00", "2024-02-20 23:59:59"))
      assert(partitionsRead(q) === 1L)
      assert(q.count() === 16) // Feb 5 .. Feb 20
    } finally Bucketing.dropLogical(spark, t)
  }
}
