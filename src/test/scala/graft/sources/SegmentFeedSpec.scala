package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/**
 * The append feed: a pull-based CDC over manifest tables. Every
 * ingested row is delivered exactly once across polls keyed by the
 * returned watermark; maintenance segments (merges/rewrites of rows
 * already delivered) never feed; segments merged away remain fed
 * from the retained predecessor version for the retention window.
 */
class SegmentFeedSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def mkRows(lo: Long, hi: Long) =
    (lo until hi).map(i => (i, i * 10, s"v$i")).toDF("id", "k", "v")

  test("each ingested batch feeds exactly once; watermark advances; caught-up feed is empty") {
    val t = "graft_feed_basic"
    try {
      Bucketing.writeBucketed(mkRows(0, 100), t, "id", 2)
      val (f1, w1) = Bucketing.segmentFeed(spark, t, 0L)
      assert(f1.size === 1)
      assert(Bucketing.readSegments(spark, t, f1).count() === 100)
      assert(w1 > 0L)

      Bucketing.appendBucketed(mkRows(100, 200), t, "id")
      Bucketing.appendBucketed(mkRows(200, 300), t, "id")
      val (f2, w2) = Bucketing.segmentFeed(spark, t, w1)
      assert(f2.size === 2)
      val delta = Bucketing.readSegments(spark, t, f2)
      assert(delta.count() === 200)
      assert(delta.select(min("id")).head.getLong(0) === 100L)
      assert(w2 > w1)
      // same schema as the live table, no segment column
      assert(delta.columns.toSeq === spark.table(t).columns.toSeq)

      val (f3, w3) = Bucketing.segmentFeed(spark, t, w2)
      assert(f3.isEmpty && w3 === w2)
      // exactly-once across polls: union of everything fed == table
      assert(Bucketing.readSegments(spark, t, f1 ++ f2)
        .collect().map(_.toString).sorted.toSeq
        === spark.table(t).collect().map(_.toString).sorted.toSeq)
    } finally Bucketing.dropLogical(spark, t)
  }

  test("same-millisecond appends cannot straddle a poll: registration stamps are strictly monotonic per table") {
    val t = "graft_feed_monotonic"
    try {
      Bucketing.writeBucketed(mkRows(0, 10), t, "id", 2)
      (1 to 5).foreach(i => Bucketing.appendBucketed(
        mkRows(i * 10L, i * 10L + 10L), t, "id"))
      val stamps = Bucketing.currentSegments(spark, t)
        .map(_.params("graft.appendedAt").toLong).sorted
      assert(stamps.distinct.size === stamps.size,
        s"duplicate registration stamps: $stamps")
    } finally Bucketing.dropLogical(spark, t)
  }

  test("compaction never re-delivers: merged segments are maintenance-stamped, originals feed from the retained version") {
    val t = "graft_feed_compact"
    try {
      Bucketing.writeBucketed(mkRows(0, 50), t, "id", 2)
      (1 to 3).foreach(i => Bucketing.appendBucketed(
        mkRows(i * 50L, i * 50L + 50L), t, "id"))
      val (all, wAll) = Bucketing.segmentFeed(spark, t, 0L)
      assert(all.size === 4)

      assert(Bucketing.compactBucketedPartial(spark, t, maxSegments = 2))
      // caught-up consumer: the merge produced NO new ingest segments
      val (afterMerge, _) = Bucketing.segmentFeed(spark, t, wAll)
      assert(afterMerge.isEmpty,
        s"merge re-delivered: ${afterMerge.map(_.params)}")
      // a consumer starting from scratch still sees every row ONCE:
      // merged-away segments feed from the retained predecessor
      val (fromZero, _) = Bucketing.segmentFeed(spark, t, 0L)
      assert(fromZero.size === 4)
      assert(Bucketing.readSegments(spark, t, fromZero).count() === 200)
      // and new ingest after the merge feeds normally
      Bucketing.appendBucketed(mkRows(200, 250), t, "id")
      val (tail, _) = Bucketing.segmentFeed(spark, t, wAll)
      assert(tail.size === 1)
      assert(Bucketing.readSegments(spark, t, tail).count() === 50)
    } finally Bucketing.dropLogical(spark, t)
  }
}
