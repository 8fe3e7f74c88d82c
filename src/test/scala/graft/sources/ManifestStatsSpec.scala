package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/**
 * Per-segment registration metadata in the manifest (VERDICT r14
 * missing #3 and #6): `graft.bytes` so maintenance triggers read
 * sizes from the catalog instead of re-listing every segment dir per
 * micro-batch, and `graft.min/max.{col}` zone stats so range queries
 * skip segments they cannot touch — the manifest-level skipping
 * Iceberg/Delta get from their file stats.
 */
class ManifestStatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def mkRows(lo: Long, hi: Long) =
    (lo until hi).map(i => (i, i * 10, s"v$i")).toDF("id", "k", "v")

  test("zone stats record at write AND append; range pruning keeps only intersecting segments; pruned read ≡ full read under the predicate") {
    val t = "graft_stats_t"
    val rb0 = Bucketing.statsReadbacks.get()
    try {
      Bucketing.writeBucketed(mkRows(0, 100), t, "id", 2,
        statsCols = Seq("k"))
      Bucketing.appendBucketed(mkRows(100, 200), t, "id")
      Bucketing.appendBucketed(mkRows(200, 300), t, "id")
      val segs = Bucketing.currentSegments(spark, t)
      assert(segs.size === 3)
      // every segment carries bytes + k-stats from registration
      segs.foreach { r =>
        assert(r.params.get("graft.bytes").exists(_.toLong > 0), r)
        assert(r.params.contains("graft.min.k") &&
          r.params.contains("graft.max.k"), r)
      }
      // a range inside the SECOND append's k-span prunes to 1 segment
      val hit = Bucketing.prunedSegments(spark, t, "k",
        Some("1500"), Some("1800"))
      assert(hit.size === 1,
        s"expected 1 intersecting segment, got ${hit.map(_.params)}")
      // boundary-inclusive: a range touching two spans keeps both
      assert(Bucketing.prunedSegments(spark, t, "k",
        Some("990"), Some("1000")).size === 2)
      // out-of-range prunes everything
      assert(Bucketing.prunedSegments(spark, t, "k",
        Some("99999"), None).isEmpty)
      // correctness: pruned scan + predicate ≡ view scan + predicate
      val pruned = Bucketing.readSegmentsPruned(spark, t, "k",
          Some("1500"), Some("1800"))
        .filter(col("k").between(1500, 1800))
      val full = spark.table(t).filter(col("k").between(1500, 1800))
      assert(pruned.collect().map(_.toString).sorted.toSeq ===
        full.collect().map(_.toString).sorted.toSeq)
      assert(pruned.count() === 31) // k = 1500,1510,...,1800
      assert(Bucketing.statsReadbacks.get() === rb0,
        "stats must ride the write job (Dataset.observe), never a read-back")
    } finally Bucketing.dropLogical(spark, t)
  }

  test("stats compose under merge: the merged segment's span covers its inputs; pruning stays correct after compaction") {
    val t = "graft_stats_merge"
    try {
      Bucketing.writeBucketed(mkRows(0, 50), t, "id", 2,
        statsCols = Seq("k"))
      (1 to 4).foreach(i => Bucketing.appendBucketed(
        mkRows(i * 50L, i * 50L + 50L), t, "id"))
      assert(Bucketing.segmentCount(spark, t) === 5)
      assert(Bucketing.compactBucketedPartial(spark, t, maxSegments = 2))
      val segs = Bucketing.currentSegments(spark, t)
      assert(segs.size <= 2)
      segs.foreach(r => assert(r.params.contains("graft.min.k"), r))
      // the whole span is still covered and prunable
      val all = Bucketing.prunedSegments(spark, t, "k", Some("0"), Some("2490"))
      assert(all.map(_.name).toSet === segs.map(_.name).toSet)
      assert(spark.table(t).count() === 250)
      val pruned = Bucketing.readSegmentsPruned(spark, t, "k",
        Some("0"), Some("100")).filter(col("k") <= 100)
      assert(pruned.count() === 11)
    } finally Bucketing.dropLogical(spark, t)
  }

  test("maintenance trigger pays ZERO size listings on the common path: segment bytes ride the catalog") {
    val t = "graft_stats_nolist"
    try {
      Bucketing.writeBucketed(mkRows(0, 40), t, "id", 2)
      (1 to 3).foreach(i => Bucketing.appendBucketed(
        mkRows(i * 40L, i * 40L + 40L), t, "id"))
      val before = Bucketing.sizeListings.get()
      // below threshold: trigger inspects sizes, decides no-op
      assert(!Bucketing.maybeCompactBucketedAsync(spark, t, maxSegments = 8))
      // above threshold: trigger selects the hot set and enqueues
      assert(!Bucketing.maybeCompactBucketedAsync(spark, t, maxSegments = 2))
      assert(Bucketing.sizeListings.get() === before,
        "trigger must read segment sizes from catalog parameters, not the FS")
      Bucketing.awaitMaintenance(t)
      assert(Bucketing.maybeCompactBucketedAsync(spark, t, maxSegments = 2))
      assert(spark.table(t).count() === 160)
    } finally Bucketing.dropLogical(spark, t)
  }

  test("cluster-index trigger is catalog-only on manifest tables: no per-segment FILE-count listings either") {
    val t = "graft_stats_clustertrig"
    try {
      val mk = (lo: Long, hi: Long) => (lo until hi)
        .map(i => (s"d$i", s"c${i % 7}")).toDF("doc_id", "cluster_id")
      Bucketing.writeBucketed(mk(0, 40), t, "doc_id", 2)
      (1 to 3).foreach(i => Bucketing.appendBucketed(
        mk(i * 40L, i * 40L + 40L), t, "doc_id"))
      val files = Bucketing.fileListings.get()
      val sizes = Bucketing.sizeListings.get()
      // below threshold: decides no-op from the manifest alone
      assert(!graft.operators.Dedup.maybeCompactClusterIndex(spark, t, 8))
      // above threshold: selects + enqueues, still catalog-only
      assert(!graft.operators.Dedup.maybeCompactClusterIndex(spark, t, 2))
      assert(Bucketing.fileListings.get() === files,
        "manifest cluster trigger must not pay dataFileCount listings")
      assert(Bucketing.sizeListings.get() === sizes)
      Bucketing.awaitMaintenance(t)
      assert(graft.operators.Dedup.maybeCompactClusterIndex(spark, t, 2))
      assert(spark.table(t).count() === 160)
    } finally Bucketing.dropLogical(spark, t)
  }

  test("recorded graft.bytes equals the segment's actual on-disk data bytes") {
    val t = "graft_stats_bytes"
    try {
      Bucketing.writeBucketed(mkRows(0, 100), t, "id", 2)
      val r = Bucketing.currentSegments(spark, t).head
      val dir = new java.io.File(
        new org.apache.hadoop.fs.Path(r.location).toUri.getPath)
      val actual = dir.listFiles().filter(f => f.isFile &&
        !f.getName.startsWith("_") && !f.getName.startsWith("."))
        .map(_.length).sum
      assert(r.params("graft.bytes").toLong === actual)
    } finally Bucketing.dropLogical(spark, t)
  }
}
