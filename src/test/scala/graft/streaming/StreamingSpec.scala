package graft.streaming

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}

/**
 * Structured Streaming equivalence: the streaming windowed-count query
 * over the events fixture must converge to exactly the batch result
 * (memory sink + processAllAvailable drives the file stream to the end).
 */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("streaming windowed counts equal the batch twin") {
    // FileStreamSource needs a directory; stage the events file into one
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    java.nio.file.Files.createSymbolicLink(
      java.nio.file.Paths.get(dir, "events.parquet"),
      java.nio.file.Paths.get(s"${SparkTestSession.sfDir}/events.parquet"))
    val stream = EventStreams.readEventStream(spark, dir)
    val agg = EventStreams.windowedCounts(stream)
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("win_counts")
      .trigger(Trigger.AvailableNow())
      .start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("win_counts").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val batch = EventStreams.windowedCounts(Tables.events(spark, SparkTestSession.sfDir))
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }

  test("stateful mapGroupsWithState: streaming running totals converge to the batch aggregate") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stateful").toString
    java.nio.file.Files.createSymbolicLink(
      java.nio.file.Paths.get(dir, "events.parquet"),
      java.nio.file.Paths.get(s"${SparkTestSession.sfDir}/events.parquet"))
    val stream = EventStreams.readEventStream(spark, dir)
    val q = Stateful.runningUserTotals(stream).writeStream
      .outputMode("update")
      .format("memory")
      .queryName("user_totals")
      .start()
    try q.processAllAvailable() finally q.stop()

    // last emitted row per user == final state
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val fin = spark.table("user_totals")
      .withColumn("_r", monotonically_increasing_id())
      .withColumn("_rn", row_number().over(
        Window.partitionBy("user_id").orderBy(col("_r").desc)))
      .filter(col("_rn") === 1)
      .select("user_id", "n_events", "total_value")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap

    val batch = Tables.events(spark, SparkTestSession.sfDir)
      .groupBy("user_id")
      .agg(count("*").as("n"), sum("value").as("s"))
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), math.rint(r.getDouble(2) * 100) / 100))).toMap
    assert(fin.nonEmpty)
    assert(fin === batch)
  }

  test("streaming exact dedup: dropDuplicates on the stream equals batch distinct") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dedupstream").toString
    java.nio.file.Files.createSymbolicLink(
      java.nio.file.Paths.get(dir, "events.parquet"),
      java.nio.file.Paths.get(s"${SparkTestSession.sfDir}/events.parquet"))
    val stream = EventStreams.readEventStream(spark, dir)
      .withWatermark("ts", "1 hour")
      .dropDuplicates("user_id", "event_type")
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("dedup_stream").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("dedup_stream").count()
    val batch = Tables.events(spark, SparkTestSession.sfDir)
      .dropDuplicates("user_id", "event_type").count()
    assert(streamed === batch)
  }

  test("stream-stream join: click→purchase pairs equal the batch twin") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ssjoin").toString
    java.nio.file.Files.createSymbolicLink(
      java.nio.file.Paths.get(dir, "events.parquet"),
      java.nio.file.Paths.get(s"${SparkTestSession.sfDir}/events.parquet"))
    val s1 = EventStreams.readEventStream(spark, dir).filter(col("event_type") === "click")
    val s2 = EventStreams.readEventStream(spark, dir).filter(col("event_type") === "purchase")
    val q = EventStreams.clickToPurchase(s1, s2).writeStream
      .outputMode("append").format("memory").queryName("ss_join").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("ss_join").count()

    val ev = Tables.events(spark, SparkTestSession.sfDir)
    val batch = EventStreams.clickToPurchase(
      ev.filter(col("event_type") === "click"),
      ev.filter(col("event_type") === "purchase")).count()
    assert(streamed > 0)
    assert(streamed === batch)
  }

  test("session windows: every user session respects the gap") {
    val sessions = EventStreams.streamingSessions(Tables.events(spark, SparkTestSession.sfDir))
    val n = sessions.count()
    assert(n > 0)
    // session count per user equals the lag-based batch sessionizer's
    val lagBased = EventStreams.sessionCounts(Tables.events(spark, SparkTestSession.sfDir))
    val byUserStream = sessions.groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byUserLag = lagBased.collect().map(r => r.getLong(0) -> r.getAs[Long]("n_sessions")).toMap
    assert(byUserStream === byUserLag)
  }
}
