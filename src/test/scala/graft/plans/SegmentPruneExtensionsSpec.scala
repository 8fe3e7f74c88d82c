package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.sources.Bucketing

/**
 * The `spark.sql.extensions=graft.GraftExtensions` deployment path for
 * automatic segment pruning — a bespoke session built WITH the config
 * (the shared test session can't carry it; extensions bind at build).
 * Beyond the mechanics, this pins the placement dividend: the injected
 * rule runs in operator optimization, BEFORE scan planning, so
 * PruneFileSourcePartitions materializes the pruned file set and the
 * JOIN PLANNER sees the pruned size — a range filter on a huge
 * manifest table turns its join broadcast-able. At 100 TB that is the
 * difference between shuffling a year of history and broadcasting the
 * one segment a report touches.
 */
class SegmentPruneExtensionsSpec extends AnyFunSuite {

  private def withExtensionsSession[A](f: SparkSession => A): A = {
    SparkTestSession.release()
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-ext-prune")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-extprune-wh").toString)
      .getOrCreate()
    try f(s)
    finally {
      s.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }

  private def partitionsRead(df: DataFrame): Long = {
    df.collect()
    df.queryExecution.executedPlan.collect {
      case sc: FileSourceScanExec => sc
    }.map(_.metrics("numPartitions").value).sum
  }

  test("config-injected rule prunes plain reads, and pruned size feeds join planning: filtered fact side becomes broadcast-able") {
    withExtensionsSession { s =>
      import s.implicits._
      // distinct 36-char payloads defeat dictionary compression enough
      // to give segments a real, predictable on-disk size
      def payload(i: Long) = java.util.UUID
        .nameUUIDFromBytes(i.toString.getBytes("UTF-8")).toString
      val fact = "graft_ext_fact"
      def mk(lo: Long, hi: Long) =
        (lo until hi).map(i => (i, i * 10, payload(i))).toDF("id", "k", "v")
      Bucketing.writeBucketed(mk(0, 8000), fact, "id", 2, statsCols = Seq("k"))
      Bucketing.appendBucketed(mk(8000, 16000), fact, "id")
      Bucketing.appendBucketed(mk(16000, 24000), fact, "id")

      // the config path registers the SQL functions too
      assert(s.sql("SELECT crc16_slot('foo{bar}')").head.getInt(0) ===
        s.sql("SELECT crc16_slot('bar')").head.getInt(0))

      // plain read, range inside the LAST segment: one partition
      val q = s.table(fact).filter($"k" >= 200000L)
      assert(partitionsRead(q) === 1L, q.queryExecution.optimizedPlan.toString)
      assert(q.count() === 4000)

      // dim bigger than the broadcast threshold; fact unpruned is
      // size-unknown (huge); fact pruned to one segment fits under it
      val segBytes = Bucketing.currentSegments(s, fact)
        .map(_.params("graft.bytes").toLong).max
      // decisively larger than the threshold (two payload columns,
      // 6× the fact-segment row count), so the control join cannot
      // just broadcast the dim instead
      val dimRows = (0L until 48000L)
        .map(i => (i, payload(i + 1000000), payload(i + 2000000)))
        .toDF("id", "name", "name2")
      val dimPath = java.nio.file.Files
        .createTempDirectory("graft-ext-dim").toString
      dimRows.write.mode("overwrite").parquet(dimPath)
      val dim = s.read.parquet(dimPath)
      s.conf.set("spark.sql.autoBroadcastJoinThreshold",
        (segBytes * 2).toString)
      try {
        val filtered = s.table(fact).filter($"k" >= 200000L)
          .join(dim, "id").groupBy().count()
        assert(filtered.queryExecution.sparkPlan.collect {
          case b: BroadcastHashJoinExec => b
        }.nonEmpty,
          s"pruned fact (≤$segBytes b) under threshold ${segBytes * 2} " +
            s"must broadcast:\n${filtered.queryExecution.sparkPlan}")
        assert(filtered.head.getLong(0) === 4000L)
        // control: unfiltered fact has no pruned file set — no broadcast
        val control = s.table(fact).join(dim, "id").groupBy().count()
        assert(control.queryExecution.sparkPlan.collect {
          case b: BroadcastHashJoinExec => b
        }.isEmpty, control.queryExecution.sparkPlan.toString)
        assert(control.head.getLong(0) === 24000L)
      } finally s.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
