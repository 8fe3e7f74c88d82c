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

  /** Stage the events fixture into a fresh stream-source directory. */
  private def stageEvents(prefix: String, copies: Int = 1): String = {
    val dir = java.nio.file.Files.createTempDirectory(prefix).toString
    (1 to copies).foreach { i =>
      java.nio.file.Files.createSymbolicLink(
        java.nio.file.Paths.get(dir, s"events$i.parquet"),
        java.nio.file.Paths.get(s"${SparkTestSession.sfDir}/events.parquet"))
    }
    dir
  }

  /**
   * Append a far-future (2100) sentinel row per event type to push
   * every branch's watermark past all real data (the global watermark
   * is the MIN across branches). Sentinel user_ids are negative so
   * they join/aggregate with nothing. The file's ts physical type
   * must match the fixture's declared stream schema, whichever
   * variant the fixture shipped as (ns-as-long or µs timestamp).
   */
  private def appendWatermarkSentinel(dir: String, types: Seq[String]): Unit = {
    import spark.implicits._
    val tsIsLong = spark.read.parquet(s"${SparkTestSession.sfDir}/events.parquet")
      .schema("ts").dataType == org.apache.spark.sql.types.LongType
    val far = 4102444800L // 2100-01-01 epoch seconds
    val rows = types.zipWithIndex.map { case (tp, i) => (999900L + i, -(i + 1).toLong, tp) }
    val sentinel =
      if (tsIsLong)
        rows.map { case (id, uid, tp) => (id, far * 1000000000L, uid, tp, 0.0, "") }
          .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      else
        rows.map { case (id, uid, tp) =>
          (id, new java.sql.Timestamp(far * 1000L), uid, tp, 0.0, "")
        }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    sentinel.write.mode("append").parquet(dir)
  }

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

  test("streaming curation census equals the batch twin (scan-stage quality/lang gates)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-docstream").toString
    java.nio.file.Files.createSymbolicLink(
      java.nio.file.Paths.get(dir, "documents.parquet"),
      java.nio.file.Paths.get(s"${SparkTestSession.sfDir}/documents.parquet"))
    val stream = DocumentStreams.readDocumentStream(spark, dir)
    val q = DocumentStreams.curatedCensus(stream).writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("curate_census")
      .trigger(Trigger.AvailableNow())
      .start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("curate_census").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val batch = DocumentStreams.curatedCensus(
        Tables.t(spark, SparkTestSession.sfDir, "documents")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }

  test("streaming index dedup: micro-batches probe the persistent index, pairs equal the batch path") {
    import graft.operators.Dedup
    val s = spark; import s.implicits._
    val mk = (id: Long, seed: Long) =>
      (id, (0 until 40).map(j => s"w${(seed * 40 + j) % 900}").mkString(" "),
        "en", "src0", 200L)
    val corpus = (0L until 150L).map(i => mk(i, i))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    Dedup.writeMinhashIndex(corpus, "graft_stream_idx")
    // the arriving batch: one near-dup of corpus doc 23 + unrelated docs
    val edited = mk(23L, 23L)._2.split(" ").updated(3, "EDITED").mkString(" ")
    val batchRows = (Seq((5000L, edited, "en", "src0", 200L)) ++
      (5001L to 5010L).map(i => mk(i, i + 7000)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft-idxstream").toString
    batchRows.coalesce(1).write.parquet(s"$dir/in")
    val out = s"$dir/pairs"
    val q = DocumentStreams.streamingIndexDedup(
      DocumentStreams.readDocumentStream(spark, s"$dir/in"),
      "graft_stream_idx", out, s"$dir/ckpt")
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val direct = Dedup.indexedNearDupPairs(batchRows, "graft_stream_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed === direct)
    assert(streamed.exists { case (n, c, _) => n == 5000L && c == 23L },
      s"planted near-dup not detected from the stream: $streamed")
  }

  test("streaming media decode: real-codec features equal the batch twin; fresh-checkpoint replay identical") {
    val s = spark; import s.implicits._
    import graft.operators.Multimodal
    val withBin = (0L until 30L).toDF("doc_id").select(col("doc_id"),
      Multimodal.encodePng(col("doc_id"),
        (col("doc_id") % 8 + 1).cast("int"),
        (col("doc_id") % 5 + 1).cast("int")).as("payload"))
    val dir = java.nio.file.Files.createTempDirectory("graft-media").toString
    withBin.coalesce(1).write.parquet(s"$dir/in")
    def run(tag: String): Set[(Long, Long, Long, Long, Long)] = {
      val q = DocumentStreams.streamingMediaDecode(
        DocumentStreams.readBinaryStream(spark, s"$dir/in"),
        s"$dir/out$tag", s"$dir/ck$tag")
      try q.processAllAvailable() finally q.stop()
      spark.read.parquet(s"$dir/out$tag").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSet
    }
    val streamed = run("1")
    val direct = Multimodal.decodeImages(withBin).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(streamed === direct)
    assert(streamed.size === 30)
    // fresh-checkpoint replay (at-least-once redelivery) is bit-identical
    assert(run("2") === streamed)
  }

  test("streaming index INGEST: batch N+1 sees batch N's novel docs; dups never re-enter the index") {
    import graft.operators.Dedup
    val s = spark; import s.implicits._
    // per-doc token namespaces: no accidental cross-doc shingle overlap
    val mkText = (ns: String, seed: Long) =>
      (0 until 40).map(j => s"$ns${seed}t$j").mkString(" ")
    val row = (id: Long, text: String) => (id, text, "en", "src0", 200L)
    val corpus = (0L until 100L).map(i => row(i, mkText("c", i)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    Dedup.writeMinhashIndex(corpus, "graft_ingest_idx")
    val dir = java.nio.file.Files.createTempDirectory("graft-ingest").toString
    // batch 1: novel docs 6000-6004 (+ a dup of corpus doc 11)
    val b1 = (Seq(row(5999L, mkText("c", 11L))) ++
      (6000L to 6004L).map(i => row(i, mkText("b", i))))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    b1.coalesce(1).write.mode("append").parquet(s"$dir/in")
    // batch 2: a near-dup of batch-1 doc 6002 (one token edited) + a
    // dup of the batch-1 DUP 5999 (must match corpus 11, NOT 5999 —
    // 5999 was a dup and must not have entered the index)
    val edited = mkText("b", 6002L).split(" ").updated(5, "EDITED").mkString(" ")
    val b2 = Seq(row(7000L, edited), row(7001L, mkText("c", 11L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = s"$dir/pairs"
    val q1 = DocumentStreams.streamingIndexIngest(
      DocumentStreams.readDocumentStream(spark, s"$dir/in"),
      "graft_ingest_idx", out, s"$dir/ckpt")
    try q1.processAllAvailable() finally q1.stop()
    b2.coalesce(1).write.mode("append").parquet(s"$dir/in")
    val q2 = DocumentStreams.streamingIndexIngest(
      DocumentStreams.readDocumentStream(spark, s"$dir/in"),
      "graft_ingest_idx", out, s"$dir/ckpt")
    try q2.processAllAvailable() finally q2.stop()

    val pairs = spark.read.parquet(out).select("new_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((5999L, 11L)), s"batch-1 dup of corpus doc missed: $pairs")
    assert(pairs.contains((7000L, 6002L)),
      s"batch-2 near-dup of batch-1 NOVEL doc missed — append didn't happen: $pairs")
    assert(pairs.contains((7001L, 11L)), s"batch-2 dup of corpus doc missed: $pairs")
    assert(!pairs.contains((7001L, 5999L)),
      s"batch-1 DUP entered the index — novelty gate failed: $pairs")

    // replay simulation: a FRESH checkpoint reprocesses every input
    // file against the already-updated index (the at-least-once
    // failure mode). Nothing may re-append, and the emitted log must
    // never contain self-pairs.
    val sizeBefore = spark.table("graft_ingest_idx_shingles").count()
    val q3 = DocumentStreams.streamingIndexIngest(
      DocumentStreams.readDocumentStream(spark, s"$dir/in"),
      "graft_ingest_idx", out, s"$dir/ckpt_replay")
    try q3.processAllAvailable() finally q3.stop()
    assert(spark.table("graft_ingest_idx_shingles").count() === sizeBefore,
      "replayed docs re-appended to the index")
    val replayed = spark.read.parquet(out).select("new_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(replayed.forall { case (a, b) => a != b },
      s"self-pairs leaked into the pair log: ${replayed.filter(p => p._1 == p._2).toSeq}")
  }

  test("streaming decontamination: the batch operator runs unchanged on a doc stream") {
    // train side is a STREAM; the eval n-gram set is a broadcast
    // static — exactly the 100 TB ingest shape, and the operator
    // composes with no code changes
    val dir = java.nio.file.Files.createTempDirectory("graft-decon-stream").toString
    java.nio.file.Files.createSymbolicLink(
      java.nio.file.Paths.get(dir, "documents.parquet"),
      java.nio.file.Paths.get(s"${SparkTestSession.sfDir}/documents.parquet"))
    val batchDocs = Tables.t(spark, SparkTestSession.sfDir, "documents")
    val evalSet = batchDocs.filter(col("doc_id") % 50 === 0)
    val trainStream = DocumentStreams.readDocumentStream(spark, dir)
      .filter(col("doc_id") % 50 =!= 0)
    val q = graft.operators.Curation.contaminationReport(trainStream, evalSet)
      .writeStream.outputMode("complete")
      .format("memory").queryName("decon_stream")
      .trigger(Trigger.AvailableNow())
      .start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("decon_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = graft.operators.Curation.contaminationReport(
        batchDocs.filter(col("doc_id") % 50 =!= 0), evalSet).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed === batch)
    assert(batch.nonEmpty || SparkTestSession.sfDir.contains("0.001"))
  }

  test("stream-static enrichment equals the batch twin (dimension broadcast, no state store)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-enrich-stream").toString
    java.nio.file.Files.createSymbolicLink(
      java.nio.file.Paths.get(dir, "events.parquet"),
      java.nio.file.Paths.get(s"${SparkTestSession.sfDir}/events.parquet"))
    val customers = Tables.t(spark, SparkTestSession.sfDir, "customer")
    val stream = EventStreams.readEventStream(spark, dir)
    val q = EventStreams.enrichedSegmentCensus(stream, customers).writeStream
      .outputMode("complete")
      .format("memory").queryName("enrich_census")
      .trigger(Trigger.AvailableNow())
      .start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("enrich_census").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = EventStreams.enrichedSegmentCensus(
        Tables.events(spark, SparkTestSession.sfDir), customers).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }

  test("chained stream-stream joins: the 3-step funnel triples equal the batch twin") {
    val dir = java.nio.file.Files.createTempDirectory("graft-funnel-stream").toString
    java.nio.file.Files.createSymbolicLink(
      java.nio.file.Paths.get(dir, "events.parquet"),
      java.nio.file.Paths.get(s"${SparkTestSession.sfDir}/events.parquet"))
    val stream = EventStreams.readEventStream(spark, dir)
    def split(df: org.apache.spark.sql.DataFrame) = (
      df.filter(col("event_type") === "view"),
      df.filter(col("event_type") === "click"),
      df.filter(col("event_type") === "purchase"))
    val (sv, sc, sp) = split(stream)
    // with multiple stateful operators the first join's output is
    // gated on watermark advance (late-record correctness), so one
    // batch never flushes: drive a SECOND batch with a far-future
    // sentinel view (matches nothing) to push the watermark past all
    // real data
    val q = EventStreams.funnelSteps(sv, sc, sp, windowMinutes = 360).writeStream
      .outputMode("append")
      .format("memory").queryName("funnel_triples")
      .start()
    try {
      q.processAllAvailable()
      // the global watermark is the MIN across the three branch
      // watermarks, so the sentinel must advance view/click/purchase
      // alike (distinct users keep it out of any funnel)
      appendWatermarkSentinel(dir, Seq("view", "click", "purchase"))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("funnel_triples").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getTimestamp(3))).toSet
    val (bv, bc, bp) = split(Tables.events(spark, SparkTestSession.sfDir))
    val batch = EventStreams.funnelSteps(bv, bc, bp, windowMinutes = 360).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getTimestamp(3))).toSet
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }

  test("transformWithState: streaming running stats converge to the batch aggregate") {
    val dir = stageEvents("graft-tws")
    val stream = EventStreams.readEventStream(spark, dir)
    // transformWithState needs a multi-column-family store → RocksDB
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val q = Stateful.runningUserStats(stream).writeStream
      .outputMode("update")
      .format("memory")
      .queryName("user_stats_tws")
      .start()
    try q.processAllAvailable() finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }

    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // last emitted row per user == final state
    val fin = spark.table("user_stats_tws")
      .withColumn("_r", monotonically_increasing_id())
      .withColumn("_rn", row_number().over(
        Window.partitionBy("user_id").orderBy(col("_r").desc)))
      .filter(col("_rn") === 1)
      .select("user_id", "n_events", "total_value", "max_value")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap

    val batch = Tables.events(spark, SparkTestSession.sfDir)
      .groupBy("user_id")
      .agg(count("*").as("n"), sum("value").as("s"), max("value").as("m"))
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), math.floor(r.getDouble(2) * 100 + 0.5) / 100, r.getDouble(3)))).toMap
    assert(fin.nonEmpty)
    assert(fin === batch)
  }

  test("transformWithState event-time timers: idle alerts close every user burst") {
    val dir = stageEvents("graft-timer")
    val stream = EventStreams.readEventStream(spark, dir)
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val q = Stateful.idleUserAlerts(stream, gapMinutes = 30).writeStream
      .outputMode("append").format("memory").queryName("idle_alerts").start()
    try {
      q.processAllAvailable()
      // timers expire on WATERMARK advance — push it past every
      // (last event + gap) with a far-future sentinel
      appendWatermarkSentinel(dir, Seq("view"))
      q.processAllAvailable()
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
    val alerts = spark.table("idle_alerts").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = Tables.events(spark, SparkTestSession.sfDir)
      .groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(alerts.nonEmpty)
    // every real user's burst closed exactly once, with its full count
    assert(alerts === batch)
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

  test("stream-stream LEFT OUTER join: unconverted clicks equal the batch twin") {
    val dir = stageEvents("graft-ssouter")
    val s1 = EventStreams.readEventStream(spark, dir).filter(col("event_type") === "click")
    val s2 = EventStreams.readEventStream(spark, dir).filter(col("event_type") === "purchase")
    val q = EventStreams.clickToPurchaseOuter(s1, s2).writeStream
      .outputMode("append").format("memory").queryName("ss_outer").start()
    try {
      q.processAllAvailable()
      // unmatched clicks flush only when the watermark passes their
      // join window — push it past all real data
      appendWatermarkSentinel(dir, Seq("click", "purchase"))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("ss_outer").filter(col("user_id") >= 0).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), Option(r.getTimestamp(2)))).toSet

    val ev = Tables.events(spark, SparkTestSession.sfDir)
    val batch = EventStreams.clickToPurchaseOuter(
      ev.filter(col("event_type") === "click"),
      ev.filter(col("event_type") === "purchase")).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), Option(r.getTimestamp(2)))).toSet
    assert(streamed.exists(_._3.isEmpty), "no unmatched (outer) rows were flushed")
    assert(streamed === batch)
  }

  test("dropDuplicatesWithinWatermark: bounded-state streamed dedup equals batch distinct") {
    // stage the fixture TWICE so every event_id arrives duplicated
    val dir = stageEvents("graft-wmdedup", copies = 2)
    val stream = EventStreams.readEventStream(spark, dir)
    val q = EventStreams.dedupWithinWatermark(stream).writeStream
      .outputMode("append").format("memory").queryName("wm_dedup").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("wm_dedup").count()
    val batch = EventStreams.dedupWithinWatermark(
      Tables.events(spark, SparkTestSession.sfDir).unionAll(
        Tables.events(spark, SparkTestSession.sfDir))).count()
    assert(streamed > 0)
    assert(streamed === batch)
  }

  test("Dataset.observe on a stream: named metrics surface in the query progress") {
    val dir = stageEvents("graft-observe")
    val stream = EventStreams.readEventStream(spark, dir)
    val observed = stream.observe("ingest",
      org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n_rows"),
      org.apache.spark.sql.functions.sum(col("value")).as("sum_value"))
    val q = observed.groupBy("event_type").count()
      .writeStream.outputMode("complete").format("memory")
      .queryName("observe_stream").start()
    try q.processAllAvailable() finally q.stop()
    val metrics = q.recentProgress.flatMap(p =>
      Option(p.observedMetrics.get("ingest")))
    assert(metrics.nonEmpty, "no observed metrics in progress")
    val total = metrics.map(_.getAs[Long]("n_rows")).sum
    val batch = Tables.events(spark, SparkTestSession.sfDir).count()
    assert(total === batch, s"observed $total rows, batch has $batch")
  }

  test("bloom seen-gate composes on a document stream (scan-stage column, no state)") {
    import graft.operators.BloomJoin
    val docs = Tables.t(spark, SparkTestSession.sfDir, "documents")
    val cut = (docs.agg(org.apache.spark.sql.functions.max("doc_id")).head.getLong(0) + 1L) * 9L / 10L
    val corpus = docs.filter(col("doc_id") < cut)

    val dir = java.nio.file.Files.createTempDirectory("graft-bloomstream").toString
    docs.filter(col("doc_id") >= cut).write.parquet(s"$dir/in")
    val stream = spark.readStream
      .schema(docs.schema).parquet(s"$dir/in")
    val q = BloomJoin.seenGate(stream, corpus, expectedItems = 10000L)
      .groupBy("maybe_seen").count()
      .writeStream.outputMode("complete").format("memory")
      .queryName("bloom_gate_stream").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("bloom_gate_stream").collect()
      .map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    val batch = BloomJoin.seenGate(docs.filter(col("doc_id") >= cut), corpus,
        expectedItems = 10000L)
      .groupBy("maybe_seen").count().collect()
      .map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    assert(streamed.values.sum > 0)
    assert(streamed === batch)
  }

  test("shard manifest is a mergeable summary: per-batch manifests fold to the single-shot one") {
    // counts/sums merge by addition, the id checksum by XOR — so a
    // continuously-published corpus maintains its manifest from
    // deltas without rescanning (the corpus_incr_stats contract)
    import graft.operators.Curation
    val docs = Tables.t(spark, SparkTestSession.sfDir, "documents")
    val single = Curation.shardManifest(docs, nShards = 8).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val batches = (0 until 3).map(i => docs.filter(col("doc_id") % 3 === i))
    val merged = batches.map(b => Curation.shardManifest(b, nShards = 8).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toMap)
      .reduce { (a, b) =>
        (a.keySet ++ b.keySet).map { s =>
          val x = a.getOrElse(s, (0L, 0L, 0L, 0L))
          val y = b.getOrElse(s, (0L, 0L, 0L, 0L))
          s -> (x._1 + y._1, x._2 + y._2, x._3 + y._3, x._4 ^ y._4)
        }.toMap
      }
    assert(single.nonEmpty)
    assert(merged === single)
  }

  test("LibMR pipeline steps compose over a structured stream, error channel intact") {
    // the reference is batch-only; the Spark-native builder's
    // map/mapE/filter are narrow Dataset ops, so the SAME pipeline
    // runs on a readStream — per-record errors surface per
    // micro-batch instead of failing the query
    import graft.pipeline.ExecutionBuilder
    val dir = stageEvents("graft-pipe-stream")
    val stream = EventStreams.readEventStream(spark, dir)
    val typed = stream.select(col("event_id"), col("event_type"))
      .as[(Long, String)](org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong, org.apache.spark.sql.Encoders.STRING))
    def pipe(b: ExecutionBuilder[(Long, String)]) = b
      .mapE { case (id, t) =>
        if (id % 97 == 0) Left(s"poison $id") else Right((id, t))
      }
      .filter { case (_, t) => t != "error" }
      .map { case (id, _) => id * 2 }
    val q = pipe(ExecutionBuilder.reader(typed)).envelope.writeStream
      .outputMode("append").format("memory").queryName("pipe_stream").start()
    try q.processAllAvailable() finally q.stop()
    val out = spark.table("pipe_stream")
    val streamedErr = out.filter(col("error").isNotNull).count()
    val streamedVal = out.filter(col("value").isNotNull).count()

    val ev = Tables.events(spark, SparkTestSession.sfDir)
      .select(col("event_id"), col("event_type"))
      .as[(Long, String)](org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong, org.apache.spark.sql.Encoders.STRING))
    val batch = pipe(ExecutionBuilder.reader(ev)).run()
    assert(streamedErr > 0 && streamedVal > 0)
    assert(streamedErr === batch.errors.length)
    assert(streamedVal === batch.results.length)
  }

  test("flatMapGroupsWithState: streaming type transitions equal the batch lag twin") {
    val dir = java.nio.file.Files.createTempDirectory("graft-fmgws").toString
    java.nio.file.Files.createSymbolicLink(
      java.nio.file.Paths.get(dir, "events.parquet"),
      java.nio.file.Paths.get(s"${SparkTestSession.sfDir}/events.parquet"))
    val stream = EventStreams.readEventStream(spark, dir)
    val q = Stateful.typeTransitions(stream).writeStream
      .outputMode("append").format("memory").queryName("transitions").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("transitions")
      .groupBy("user_id", "from_type", "to_type").count().collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)) -> r.getLong(3)).toMap

    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy("user_id").orderBy("event_id")
    val batch = Tables.events(spark, SparkTestSession.sfDir)
      .withColumn("from_type", lag("event_type", 1).over(w))
      .filter(col("from_type").isNotNull)
      .groupBy(col("user_id"), col("from_type"), col("event_type").as("to_type")).count().collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)) -> r.getLong(3)).toMap
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }

  test("watermark drops late data from append-mode windowed aggregation") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[(java.sql.Timestamp, String, Double)]
    def ts(h: Int): java.sql.Timestamp =
      java.sql.Timestamp.valueOf(f"2026-01-01 $h%02d:30:00")
    val agg = EventStreams.windowedCounts(
      ms.toDF.toDF("ts", "event_type", "value"), watermark = "1 hour")
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("late_drop").start()
    try {
      // batch 1: events at 01:30 and 05:30 → watermark advances to 04:30,
      // finalizing (and emitting) every window before 04:00
      ms.addData((ts(1), "click", 1.0), (ts(5), "click", 1.0))
      q.processAllAvailable()
      // batch 2: a LATE event at 01:30 (behind the 04:30 watermark) plus
      // a fresh one at 06:30 — the late one must not re-open hour 01:00
      ms.addData((ts(1), "click", 99.0), (ts(6), "click", 1.0))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("late_drop")
      .select(col("win_start"), col("n"), col("sum_value")).collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getDouble(2))).toSet
    // hour-01 window was emitted once with the on-time row only; the
    // late 99.0 never appears (no second hour-01 row, sum stays 1.0)
    assert(out.count(_._1.startsWith("2026-01-01 01:00")) === 1)
    assert(out.contains(("2026-01-01 01:00:00.0", 1L, 1.0)))
  }

  test("foreachBatch file sink: streamed windowed counts land in parquet equal to batch") {
    val dir = java.nio.file.Files.createTempDirectory("graft-febsrc").toString
    java.nio.file.Files.createSymbolicLink(
      java.nio.file.Paths.get(dir, "events.parquet"),
      java.nio.file.Paths.get(s"${SparkTestSession.sfDir}/events.parquet"))
    val out = java.nio.file.Files.createTempDirectory("graft-febout").toString + "/win"
    val stream = EventStreams.readEventStream(spark, dir)
    val q = EventStreams.windowedCounts(stream).writeStream
      .outputMode("complete")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.write.mode("overwrite").parquet(out)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    try q.processAllAvailable() finally q.stop()

    val sunk = spark.read.parquet(out).collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val batch = EventStreams.windowedCounts(Tables.events(spark, SparkTestSession.sfDir))
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(sunk.nonEmpty)
    assert(sunk === batch)
  }

  test("streaming leaderboard: per-batch heap top-k over the windowed counts equals batch") {
    val dir = java.nio.file.Files.createTempDirectory("graft-topksrc").toString
    java.nio.file.Files.createSymbolicLink(
      java.nio.file.Paths.get(dir, "events.parquet"),
      java.nio.file.Paths.get(s"${SparkTestSession.sfDir}/events.parquet"))
    val out = java.nio.file.Files.createTempDirectory("graft-topkout").toString + "/lead"
    val stream = EventStreams.readEventStream(spark, dir)
    val q = EventStreams.windowUserCounts(stream).writeStream
      .outputMode("complete")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        EventStreams.topUsersPerWindow(batch).write.mode("overwrite").parquet(out)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.read.parquet(out).collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2))).toSet
    val batch = EventStreams.topUsersPerWindow(
      EventStreams.windowUserCounts(Tables.events(spark, SparkTestSession.sfDir)))
      .collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }

  test("streaming anomaly report: per-batch z-scores over complete-mode counts equal batch") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zsrc").toString
    java.nio.file.Files.createSymbolicLink(
      java.nio.file.Paths.get(dir, "events.parquet"),
      java.nio.file.Paths.get(s"${SparkTestSession.sfDir}/events.parquet"))
    val out = java.nio.file.Files.createTempDirectory("graft-zout").toString + "/anom"
    val stream = EventStreams.readEventStream(spark, dir)
    val wcCols = Seq("win_start", "event_type", "n")
    val q = EventStreams.windowedCounts(stream).writeStream
      .outputMode("complete")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        EventStreams.zscoreReport(batch.select(wcCols.map(org.apache.spark.sql.functions.col): _*))
          .write.mode("overwrite").parquet(out)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.read.parquet(out).collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val batch = EventStreams.zscoreReport(
      EventStreams.windowedCounts(Tables.events(spark, SparkTestSession.sfDir))
        .select(wcCols.map(org.apache.spark.sql.functions.col): _*))
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(streamed === batch)
  }

  test("RocksDB state store: streamed session windows equal the batch result") {
    // the production state backend at 100 TB (state spills off-heap to
    // local SST files instead of living in executor memory)
    val dir = java.nio.file.Files.createTempDirectory("graft-rocks").toString
    java.nio.file.Files.createSymbolicLink(
      java.nio.file.Paths.get(dir, "events.parquet"),
      java.nio.file.Paths.get(s"${SparkTestSession.sfDir}/events.parquet"))
    val stream = EventStreams.readEventStream(spark, dir)
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val q = EventStreams.streamingSessions(stream).writeStream
      .outputMode("complete")
      .format("memory").queryName("rocks_sessions")
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      q.processAllAvailable()
      // prove RocksDB actually served the state (not the default HDFS store)
      val metrics = q.recentProgress.flatMap(_.stateOperators)
        .flatMap(_.customMetrics.keySet().toArray.map(_.toString))
      assert(metrics.exists(_.toLowerCase.contains("rocksdb")),
        s"no rocksdb state metrics in ${metrics.mkString(",")}")
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
    val streamed = spark.table("rocks_sessions")
      .groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = EventStreams.streamingSessions(
      Tables.events(spark, SparkTestSession.sfDir))
      .groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }

  test("streaming CMS: sketch merged across micro-batches equals the single-shot sketch") {
    import org.apache.spark.sql.functions.lit
    // 3 parquet files -> maxFilesPerTrigger=1 forces 3 real micro-batches
    val dir = java.nio.file.Files.createTempDirectory("graft-cms").toString + "/ev"
    Tables.events(spark, SparkTestSession.sfDir)
      .select(col("user_id")).repartition(3)
      .write.parquet(dir)
    val stream = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("user_id",
          org.apache.spark.sql.types.LongType))))
      .option("maxFilesPerTrigger", 1).parquet(dir)
    // cells accumulate by ADDITION across batches — the mergeable-
    // summary contract; the accumulator is bounded at depth x width
    // cells by construction, never key-space-sized
    val acc = scala.collection.mutable.HashMap.empty[(Int, Long), Long]
    var batches = 0
    val q = stream.writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        batches += 1
        graft.operators.Sketches.countMinSketch(b, "user_id")
          .collect().foreach { r =>
            val cell = (r.getInt(0), r.getLong(1))
            acc(cell) = acc.getOrElse(cell, 0L) + r.getLong(2)
          }
      }
      .trigger(Trigger.AvailableNow())
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(batches >= 3, s"expected >=3 micro-batches, got $batches")
    val single = graft.operators.Sketches.countMinSketch(
        Tables.events(spark, SparkTestSession.sfDir).select(col("user_id")), "user_id")
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(acc.toMap === single)
  }

  test("streaming KMV: bottom-k sketches merged across micro-batches equal the single-shot sketch") {
    val dir = java.nio.file.Files.createTempDirectory("graft-kmv").toString + "/ev"
    Tables.events(spark, SparkTestSession.sfDir)
      .select(col("event_type"), col("user_id")).repartition(3)
      .write.parquet(dir)
    val stream = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("event_type",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("user_id",
          org.apache.spark.sql.types.LongType))))
      .option("maxFilesPerTrigger", 1).parquet(dir)
    // per-key buffers merge by the bottom-k union — the same
    // mergeable-summary contract the CMS cells satisfy by addition
    val agg = new graft.functions.Aggregators.BottomKDistinct(256)
    val acc = scala.collection.mutable.HashMap.empty[String, Array[Long]]
    var batches = 0
    val q = stream.writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        batches += 1
        graft.operators.Sketches.kmvSketchByKey(b, "event_type", "user_id")
          .collect().foreach { r =>
            val ks = r.getSeq[Long](1).toArray
            val key = r.getString(0)
            acc(key) = agg.merge(acc.getOrElse(key, agg.zero), ks)
          }
      }
      .trigger(Trigger.AvailableNow())
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(batches >= 3, s"expected >=3 micro-batches, got $batches")
    val single = graft.operators.Sketches.kmvSketchByKey(
        Tables.events(spark, SparkTestSession.sfDir)
          .select(col("event_type"), col("user_id")),
        "event_type", "user_id")
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(acc.nonEmpty)
    assert(acc.view.mapValues(_.toSeq).toMap === single)
  }

  test("streaming view maintenance: signed delta micro-batches converge to the direct aggregate") {
    import org.apache.spark.sql.functions._
    val docs = Tables.t(spark, SparkTestSession.sfDir, "documents")
      .select(col("doc_id"), col("source"), col("text"))
    // recrawl: drop every 20th doc, rewrite every 17th, add fresh docs
    val prev = docs
    val next = docs.filter(col("doc_id") % 20 =!= 0)
      .select(col("doc_id"), col("source"),
        when(col("doc_id") % 17 === 2, concat(col("text"), lit(" upd")))
          .otherwise(col("text")).as("text"))
      .unionByName(docs.limit(50)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("source"),
          concat(lit("fresh "), col("text")).as("text")))
    // the delta stream: del rows (sign -1, old text) + add rows (sign
    // +1, new text) for every removed/changed/added doc — what a
    // crawler's changelist emits per recrawl wave
    val diff = graft.operators.Curation.snapshotDiff(prev, next, "doc_id", Seq("text"))
    val dels = prev.join(diff.filter(col("status").isin("removed", "changed"))
        .select("doc_id"), "doc_id")
      .select(col("doc_id"), col("source"), col("text"), lit(-1L).as("sign"))
    val adds = next.join(diff.filter(col("status").isin("added", "changed"))
        .select("doc_id"), "doc_id")
      .select(col("doc_id"), col("source"), col("text"), lit(1L).as("sign"))
    val dir = java.nio.file.Files.createTempDirectory("graft-mv").toString + "/delta"
    dels.unionByName(adds).repartition(4).write.parquet(dir)
    // the stored view starts at agg(prev); each micro-batch merges its
    // signed aggregates — the abelian-group maintenance contract
    def toks(c: org.apache.spark.sql.Column) = size(split(lower(c), " "))
    val view = scala.collection.mutable.HashMap.empty[String, (Long, Long)]
    prev.groupBy("source").agg(count(lit(1)).as("n"), sum(toks(col("text"))).cast("long").as("tk"))
      .collect().foreach(r => view(r.getString(0)) = (r.getLong(1), r.getLong(2)))
    var batches = 0
    val q = spark.readStream.schema(dels.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        batches += 1
        b.groupBy("source").agg(sum(col("sign")).as("dn"),
            sum(col("sign") * toks(col("text"))).cast("long").as("dtk"))
          .collect().foreach { r =>
            val (n0, t0) = view.getOrElse(r.getString(0), (0L, 0L))
            view(r.getString(0)) = (n0 + r.getLong(1), t0 + r.getLong(2))
          }
      }
      .trigger(Trigger.AvailableNow())
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(batches >= 3, s"expected >=3 micro-batches, got $batches")
    val direct = next.groupBy("source")
      .agg(count(lit(1)).as("n"), sum(toks(col("text"))).cast("long").as("tk"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(view.filter(_._2._1 > 0).toMap === direct)
  }

  test("checkpoint recovery: a restarted query resumes from committed state, no reprocessing") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val ms = MemoryStream[(Long, Double)]
    def agg = Stateful.runningUserTotals(ms.toDF.toDF("user_id", "value"))

    // memory sink can't recover — foreachBatch→parquet is the
    // fault-tolerant sink shape; each emitted row is tagged with its
    // micro-batch id so the restart boundary is visible
    val out = java.nio.file.Files.createTempDirectory("graft-ckptout").toString + "/totals"
    import org.apache.spark.sql.functions.lit
    def start() = agg.writeStream.outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Stateful.UserTotals], id: Long) =>
        b.withColumn("batch", lit(id)).write.mode("append").parquet(out)
      }
      .start()

    // run 1: two users, one batch, then a clean stop
    ms.addData((1L, 10.0), (2L, 5.0))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()

    // run 2: SAME checkpoint — state must carry the earlier totals
    // (mapGroupsWithState resumes per-key state from the store)
    ms.addData((1L, 2.5))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    val rows = spark.read.parquet(out).collect()
      .map(r => (r.getAs[Long]("batch"), r.getAs[Long]("user_id"),
        r.getAs[Long]("n_events"), r.getAs[Double]("total_value")))
    val afterRestart = rows.filter(_._1 >= 1)
    // user 1: count 2 (1 before restart + 1 new), total 12.5 — the
    // recovered state included the pre-restart batch exactly once
    assert(afterRestart.toSeq === Seq((1L, 1L, 2L, 12.5)))
    // user 2 was only ever emitted in run 1 (update mode, untouched key)
    assert(rows.count(_._2 == 2L) === 1)
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

  test("streaming SCD2: bucketed dimension table equals the batch derivation; replay idempotent") {
    import org.apache.spark.sql.functions.unix_millis
    val ev = Tables.t(spark, SparkTestSession.sfDir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_millis(col("ts")).as("ms"))
    val r = ev.agg(org.apache.spark.sql.functions.min("ms"),
      org.apache.spark.sql.functions.max("ms")).collect()(0)
    val (lo, hi) = (r.getLong(0), r.getLong(1))
    val (cut1, cut2) = (lo + (hi - lo) / 3, lo + 2 * (hi - lo) / 3)
    val dir = java.nio.file.Files.createTempDirectory("graft-scd2").toString
    val tablePath = s"$dir/dim"
    DimensionStreams.initScd2Table(spark, tablePath)
    // three CDC waves in event-time order (the per-key ordered-delivery
    // contract), each its own micro-batch run against the same checkpoint
    val waves = Seq(ev.filter(col("ms") <= cut1),
      ev.filter(col("ms") > cut1 && col("ms") <= cut2),
      ev.filter(col("ms") > cut2))
    waves.foreach { w =>
      w.coalesce(1).write.mode("append").parquet(s"$dir/in")
      val q = DimensionStreams.streamingScd2(
        spark.readStream.schema(ev.schema).parquet(s"$dir/in"),
        tablePath, s"$dir/ckpt")
      try q.processAllAvailable() finally q.stop()
    }
    def dimRows() = spark.read.parquet(tablePath)
      .select("user_id", "version", "state", "valid_from_ms", "valid_to_ms", "is_current")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4), r.getBoolean(5))).toSet
    val streamed = dimRows()
    // the batch twin: the oracled q_scd2 derivation over the full log
    val direct = graft.SparkEntry.queries("q_scd2")(spark, SparkTestSession.sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4), r.getBoolean(5))).toSet
    assert(streamed === direct)
    // replay: a FRESH checkpoint reprocesses every wave against the
    // already-maintained table — the change-point union re-derives the
    // same buckets, so the table must not change
    val q2 = DimensionStreams.streamingScd2(
      spark.readStream.schema(ev.schema).parquet(s"$dir/in"),
      tablePath, s"$dir/ckpt_replay")
    try q2.processAllAvailable() finally q2.stop()
    assert(dimRows() === streamed, "replay mutated the dimension table")
  }

  test("streaming ANN INGEST: batch N+1 searches batch N's vectors; replay never re-appends") {
    import graft.operators.Similarity
    val s = spark; import s.implicits._
    val mkVec = (i: Long) => (0 until 64).map(d => math.sin(i * 64 + d).toFloat)
    val row = (id: Long) => (id, mkVec(id), 0)
    val corpus = (0L until 200L).map(row).toDF("vec_id", "embedding", "label")
    Similarity.writeAnnIndex(corpus, "graft_ann_stream", buckets = 8)
    val dir = java.nio.file.Files.createTempDirectory("graft-annstream").toString
    // batch 1: five novel vectors
    val b1 = (6000L to 6004L).map(row).toDF("vec_id", "embedding", "label")
    b1.coalesce(1).write.mode("append").parquet(s"$dir/in")
    val out = s"$dir/nn"
    val q1 = VectorStreams.streamingAnnIngest(
      VectorStreams.readVectorStream(spark, s"$dir/in"),
      "graft_ann_stream", out, s"$dir/ckpt", nprobe = 32)
    try q1.processAllAvailable() finally q1.stop()
    // batch 2: an exact copy of batch-1 vector 6002 — it shares 6002's
    // codes under the frozen quantizer, so its neighbor log must rank
    // 6002 at the ADC floor (the pqTopK duplicate law, through the
    // stream): proof that batch 1's vectors entered the index
    val b2 = Seq((7000L, mkVec(6002L), 0)).toDF("vec_id", "embedding", "label")
    b2.coalesce(1).write.mode("append").parquet(s"$dir/in")
    // topk wide enough that the floor tie-set (PQ cannot separate
    // same-code vectors; ties cut by neighbor_id) can't exclude 6002
    val q2 = VectorStreams.streamingAnnIngest(
      VectorStreams.readVectorStream(spark, s"$dir/in"),
      "graft_ann_stream", out, s"$dir/ckpt", topk = 300, nprobe = 32)
    try q2.processAllAvailable() finally q2.stop()
    val nn7000 = spark.read.parquet(out).filter(col("query_id") === 7000L)
      .orderBy("rank").collect()
      .map(r => (r.getLong(2), r.getDouble(3)))
    assert(nn7000.nonEmpty, "batch-2 vector produced no neighbor log")
    val floor = nn7000.head._2
    assert(nn7000.find(_._1 == 6002L).exists(_._2 === floor),
      s"batch-1 vector 6002 not at the ADC floor for its copy: ${nn7000.take(3).toSeq}")

    // replay simulation: a FRESH checkpoint reprocesses every input
    // file against the already-updated index. The novel-only append
    // must insert nothing, and the rewritten neighbor log must carry
    // no self-pairs (annIndexTopK's self-match filter).
    val sizeBefore = spark.table("graft_ann_stream_codes").count()
    val q3 = VectorStreams.streamingAnnIngest(
      VectorStreams.readVectorStream(spark, s"$dir/in"),
      "graft_ann_stream", out, s"$dir/ckpt_replay", nprobe = 32)
    try q3.processAllAvailable() finally q3.stop()
    assert(spark.table("graft_ann_stream_codes").count() === sizeBefore,
      "replayed vectors re-appended to the index")
    val replayed = spark.read.parquet(out).select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(replayed.forall { case (a, b) => a != b },
      s"self-pairs leaked into the neighbor log: ${replayed.filter(p => p._1 == p._2).toSeq}")
  }

  test("streaming ANN drift ledger: an in-distribution batch reads low, a planted drifted batch reads high") {
    import graft.operators.Similarity
    val s = spark; import s.implicits._
    val mkVec = (i: Long, shift: Double) =>
      (0 until 64).map(d => (shift + math.sin(i * 64 + d)).toFloat)
    val corpus = (0L until 200L).map(i => (i, mkVec(i, 0.0), 0))
      .toDF("vec_id", "embedding", "label")
    Similarity.writeAnnIndex(corpus, "graft_ann_driftled", buckets = 8)
    val dir = java.nio.file.Files.createTempDirectory("graft-annled").toString
    // batch 0: in-distribution; batch 1: a region the quantizer never saw
    (6000L to 6019L).map(i => (i, mkVec(i, 0.0), 0))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("append").parquet(s"$dir/in")
    val q1 = VectorStreams.streamingAnnIngest(
      VectorStreams.readVectorStream(spark, s"$dir/in"), "graft_ann_driftled",
      s"$dir/nn", s"$dir/ckpt", driftPath = s"$dir/drift")
    try q1.processAllAvailable() finally q1.stop()
    (7000L to 7019L).map(i => (i, mkVec(i, 6.0), 0))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("append").parquet(s"$dir/in")
    val q2 = VectorStreams.streamingAnnIngest(
      VectorStreams.readVectorStream(spark, s"$dir/in"), "graft_ann_driftled",
      s"$dir/nn", s"$dir/ckpt", driftPath = s"$dir/drift")
    try q2.processAllAvailable() finally q2.stop()
    val led = spark.read.parquet(s"$dir/drift")
      .select(col("batch").cast("long"), col("n_vectors"), col("mean_residual"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(led.keySet === Set(0L, 1L), s"one ledger row per micro-batch: $led")
    assert(led(0L)._1 === 20L && led(1L)._1 === 20L)
    assert(led(1L)._2 > led(0L)._2 + 0.1,
      s"the drifted batch must read high in the ledger: $led")
  }

  test("streaming ANN auto-remediation: a drifted batch trips the threshold, requantize fires between batches with zero manual steps, escalating m when code resolution binds; replay does not re-fire") {
    import graft.operators.Similarity
    val s = spark; import s.implicits._
    val mkVec = (i: Long, shift: Double) =>
      (0 until 64).map(d => (shift + math.sin(i * 64 + d)).toFloat)
    val corpus = (0L until 200L).map(i => (i, mkVec(i, 0.0), 0))
      .toDF("vec_id", "embedding", "label")
    Similarity.writeAnnIndex(corpus, "graft_ann_auto", buckets = 8)
    val dir = java.nio.file.Files.createTempDirectory("graft-annauto").toString
    // the retrain provider: the corpus as the pipeline currently knows
    // it — the standing corpus plus everything already streamed in
    def allIngested() = corpus.unionByName(
      scala.util.Try(spark.read.schema(corpus.schema).parquet(s"$dir/in"))
        .getOrElse(corpus.limit(0)))
    def loop(ckpt: String) = VectorStreams.streamingAnnIngest(
      VectorStreams.readVectorStream(spark, s"$dir/in"), "graft_ann_auto",
      s"$dir/nn", s"$dir/$ckpt", driftPath = s"$dir/drift",
      driftThreshold = 0.1, retrainCorpus = () => allIngested(),
      escalateM = 16, pqErrorThreshold = 1e-12)
    // batch 0: in-distribution — below threshold, NO remediation
    (6000L to 6019L).map(i => (i, mkVec(i, 0.0), 0))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("append").parquet(s"$dir/in")
    val q1 = loop("ckpt")
    try q1.processAllAvailable() finally q1.stop()
    assert(graft.sources.Bucketing.currentEpoch(spark, "graft_ann_auto") === 0,
      "an in-distribution batch must not trigger a requantize")
    // batch 1: a region the quantizer never saw — crosses the
    // threshold; the loop requantizes on its own thread, and the PQ
    // reconstruction error (always above the planted 1e-12 bar) says
    // code resolution binds → one more requantize at escalateM=16
    (7000L to 7049L).map(i => (i, mkVec(i, 6.0), 0))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("append").parquet(s"$dir/in")
    val q2 = loop("ckpt")
    try q2.processAllAvailable() finally q2.stop()
    assert(graft.sources.Bucketing.currentEpoch(spark, "graft_ann_auto") >= 2,
      "the drifted batch must auto-requantize (and escalate) with zero manual steps")
    assert(Similarity.annIndexM(spark, "graft_ann_auto") === 16,
      "code-resolution escalation must land m=16 codes")
    // repaired: the very batch that tripped the threshold now reads low
    val drifted = (7000L to 7049L).map(i => (i, mkVec(i, 6.0), 0))
      .toDF("vec_id", "embedding", "label")
    val post = Similarity.annAssignmentResidual(drifted, "graft_ann_auto")
      .collect()(0).getDouble(1)
    assert(post <= 0.1, s"auto-requantize must repair the residual, got $post")
    // searches keep working against the escalated index (m inferred)
    assert(Similarity.annIndexTopK(drifted.limit(5), "graft_ann_auto",
      topk = 3, nprobe = 16).count() > 0)
    // replay from a fresh checkpoint: the drifted batch re-measures
    // against the ALREADY-REPAIRED quantizer, stays below threshold,
    // and must NOT re-fire — epoch and codes stay put
    val epochBefore = graft.sources.Bucketing.currentEpoch(spark, "graft_ann_auto")
    val codesBefore = spark.table(graft.sources.Bucketing
      .epochMember(spark, "graft_ann_auto", "codes")).count()
    val q3 = loop("ckpt_replay")
    try q3.processAllAvailable() finally q3.stop()
    assert(graft.sources.Bucketing.currentEpoch(spark, "graft_ann_auto") === epochBefore,
      "a replay over the repaired index must not re-requantize")
    assert(spark.table(graft.sources.Bucketing
      .epochMember(spark, "graft_ann_auto", "codes")).count() === codesBefore,
      "a replay must not re-append codes")
  }

  test("streaming PCA maintenance: merged moment ledger fits the batch model; batch replay is idempotent") {
    import graft.operators.Similarity
    val s = spark; import s.implicits._
    // variance planted on axis 2 so the fitted component is non-trivial
    val mkVec = (i: Long) => (0 until 16).map(d =>
      ((if (d == 2) i.toDouble else 0.0) + math.sin(i * 16 + d) * 0.01).toFloat)
    val row = (id: Long) => (id, mkVec(id), 0)
    val dir = java.nio.file.Files.createTempDirectory("graft-pcastream").toString
    val w1 = (0L until 30L).map(row).toDF("vec_id", "embedding", "label")
    w1.coalesce(1).write.mode("append").parquet(s"$dir/in")
    val q1 = VectorStreams.streamingPcaMaintenance(
      VectorStreams.readVectorStream(spark, s"$dir/in"), s"$dir/moments", s"$dir/ckpt")
    try q1.processAllAvailable() finally q1.stop()
    val w2 = (30L until 50L).map(row).toDF("vec_id", "embedding", "label")
    w2.coalesce(1).write.mode("append").parquet(s"$dir/in")
    val q2 = VectorStreams.streamingPcaMaintenance(
      VectorStreams.readVectorStream(spark, s"$dir/in"), s"$dir/moments", s"$dir/ckpt")
    try q2.processAllAvailable() finally q2.stop()
    val all = w1.unionByName(w2)
    def proj(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).sorted.toSeq
    val streamed = proj(VectorStreams.pcaFromMoments(spark, s"$dir/moments", all))
    assert(streamed === proj(Similarity.pcaProject(all)),
      "moment-ledger fit diverged from the single-pass fit")
    // at-least-once replay: a checkpoint-recovery replay re-runs a
    // batch under ITS OWN batch id — the overwrite of batch=<id>
    // rewrites the same row instead of double-counting the batch
    Similarity.momentState(w2)
      .write.mode("overwrite").parquet(s"$dir/moments/batch=1")
    assert(proj(VectorStreams.pcaFromMoments(spark, s"$dir/moments", all)) === streamed,
      "replayed batch changed the fitted model")
  }

  test("streaming paragraph ingest: batch N+1 dedups against batch N; fresh-checkpoint replay reproduces") {
    import org.apache.spark.sql.functions._
    import graft.operators.Dedup
    val s = spark; import s.implicits._
    val mkDoc = (id: Long, seed: Long) =>
      (id, (0 until 9).map(j => s"p${seed * 9 + j}").mkString(" "),
        "en", "src0", 100L)
    val corpus = (0L until 30L).map(i => mkDoc(i, i))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    Dedup.writeUnitIndex(corpus.select("doc_id", "text"), "graft_stream_unit", width = 3)
    val dir = java.nio.file.Files.createTempDirectory("graft-parastream").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/in"))
    def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      df.coalesce(1).write.parquet(s"$dir/stage_$name")
      val part = new java.io.File(s"$dir/stage_$name").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(s"$dir/in/$name.parquet"))
    }
    // batch a: a copy of corpus doc 5 + fresh doc 100
    stage(Seq(mkDoc(90L, 5L), mkDoc(100L, 7000L))
      .toDF("doc_id", "text", "lang", "source", "n_chars"), "a")
    Thread.sleep(1200) // distinct mtimes pin the trigger order
    // batch b: a copy of batch a's fresh doc + fresh doc 200
    stage(Seq(mkDoc(110L, 7000L), mkDoc(200L, 8000L))
      .toDF("doc_id", "text", "lang", "source", "n_chars"), "b")
    val out = s"$dir/out"
    def run(ckpt: String): Unit = {
      val q = DocumentStreams.streamingParagraphIngest(
        spark.readStream.schema(DocumentStreams.docSchema)
          .option("maxFilesPerTrigger", 1).parquet(s"$dir/in"),
        "graft_stream_unit", out, s"$dir/$ckpt", width = 3)
      try q.processAllAvailable() finally q.stop()
    }
    run("ckpt")
    def results(): Map[Long, (Long, String)] =
      spark.read.parquet(out).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_kept"), r.getAs[String]("text_kept")))).toMap
    val r1 = results()
    assert(r1(90L)._1 === 0L, "corpus copy not emptied")
    assert(r1(100L)._1 === 3L, "fresh doc damaged")
    assert(r1(110L)._1 === 0L, s"batch b did not see batch a's doc: ${r1(110L)}")
    assert(r1(200L)._1 === 3L)
    // fresh-checkpoint replay: the whole stream redelivers; outputs
    // are reproduced bit-for-bit (self-owned units are kept)
    run("ckpt_replay")
    assert(results() === r1)
  }

  test("streaming linkage calibration: merged-ledger EM equals the direct batch EM; replay reproduces") {
    import org.apache.spark.sql.functions._
    import graft.operators.Dedup
    val s = spark; import s.implicits._
    // two batches of agreement vectors with different mixes
    val b1 = (Seq.fill(40)((0L, 0L, 0L)) ++ Seq.fill(6)((1L, 1L, 1L)) ++
      Seq.fill(10)((1L, 0L, 0L))).toDF("ag_0", "ag_1", "ag_2")
    val b2 = (Seq.fill(25)((0L, 0L, 0L)) ++ Seq.fill(4)((1L, 1L, 1L)) ++
      Seq.fill(8)((0L, 1L, 0L))).toDF("ag_0", "ag_1", "ag_2")
    val dir = java.nio.file.Files.createTempDirectory("graft-emstream").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/in"))
    def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      df.coalesce(1).write.parquet(s"$dir/stage_$name")
      val part = new java.io.File(s"$dir/stage_$name").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(s"$dir/in/$name.parquet"))
    }
    stage(b1, "a"); Thread.sleep(1200); stage(b2, "b")
    val out = s"$dir/out"
    val schema = b1.schema
    def run(ckpt: String): Unit = {
      val q = QualityStreams.streamingLinkageCalibration(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
          .parquet(s"$dir/in"), k = 3, out, s"$dir/$ckpt")
      try q.processAllAvailable() finally q.stop()
    }
    run("ckpt")
    def lastParams(): Set[Seq[Any]] = {
      val batches = new java.io.File(s"$out/params").listFiles()
        .filter(_.getName.startsWith("batch=")).map(_.getName).sorted
      spark.read.parquet(s"$out/params/${batches.last}").collect()
        .map(_.toSeq).toSet
    }
    val streamed = lastParams()
    // direct EM over the unioned combo counts
    val direct = Dedup.emFromCombos(
      b1.unionByName(b2).groupBy("ag_0", "ag_1", "ag_2")
        .agg(count(lit(1)).as("n_pairs")), k = 3)
      .collect().map(_.toSeq).toSet
    assert(streamed === direct,
      s"streamed params diverge from the direct union EM:\n$streamed\nvs\n$direct")
    // fresh-checkpoint replay reproduces the final parameters
    run("ckpt_replay")
    assert(lastParams() === streamed)
  }

  test("streaming cluster ingest: adopt/found/chain across batches; replay leaves tables identical") {
    import graft.operators.Dedup
    val s = spark; import s.implicits._
    val mkText = (ns: String, seed: Long) =>
      (0 until 40).map(j => s"$ns${seed}t$j").mkString(" ")
    val row = (id: Long, text: String) => (id, text, "en", "src0", 200L)
    val corpus = (0L until 60L).map(i => row(i, mkText("k", i)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    Dedup.writeMinhashIndex(corpus, "graft_clstream_idx")
    val dir = java.nio.file.Files.createTempDirectory("graft-clstream").toString
    // batch 1: a dup of corpus doc 11 (ADOPTs its cluster) + novel 6000-6002
    val b1 = (Seq(row(5999L, mkText("k", 11L))) ++
      (6000L to 6002L).map(i => row(i, mkText("b", i))))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    b1.coalesce(1).write.mode("append").parquet(s"$dir/in")
    val out = s"$dir/assign"
    def run(ckpt: String): Unit = {
      val q = DocumentStreams.streamingClusterIngest(
        DocumentStreams.readDocumentStream(spark, s"$dir/in"),
        "graft_clstream_idx", "graft_clstream_clusters", out, s"$dir/$ckpt")
      try q.processAllAvailable() finally q.stop()
    }
    run("ckpt")
    // batch 2: near-dup of batch-1 NOVEL doc 6001 (cross-batch chain
    // FOUNDs cluster 6001) + another dup of corpus doc 11
    val edited = mkText("b", 6001L).split(" ").updated(5, "EDITED").mkString(" ")
    Seq(row(7000L, edited), row(7001L, mkText("k", 11L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("append").parquet(s"$dir/in")
    run("ckpt")
    def table(): Map[Long, Long] =
      Dedup.clusterAssignments(spark, "graft_clstream_clusters")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val t1 = table()
    assert(t1(5999L) === 11L, s"batch-1 dup did not adopt the corpus cluster: $t1")
    assert(t1(7001L) === 11L, s"batch-2 dup did not adopt: $t1")
    assert(t1(7000L) === 6001L && t1(6001L) === 6001L,
      s"cross-batch chain did not found cluster 6001: $t1")
    val idxSize = spark.table("graft_clstream_idx_bands").count()
    // fresh-checkpoint replay: the cluster table and the index are
    // bit-identical afterwards (ingestion is idempotent)
    run("ckpt_replay")
    assert(table() === t1)
    assert(spark.table("graft_clstream_idx_bands").count() === idxSize,
      "replayed docs re-entered the minhash index")
  }

  test("streaming span ingest: batch N+1 dedups against batch N; fresh-checkpoint replay reproduces") {
    import org.apache.spark.sql.functions._
    import graft.operators.Dedup
    val s = spark; import s.implicits._
    val mkDoc = (id: Long, seed: Long) =>
      (id, (0 until 12).map(j => s"t${seed * 12 + j}").mkString(" "),
        "en", "src0", 100L)
    val corpus = (0L until 30L).map(i => mkDoc(i, i))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    Dedup.writeSpanIndex(corpus.select("doc_id", "text"), "graft_stream_span", span = 6)
    val dir = java.nio.file.Files.createTempDirectory("graft-spanstream").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/in"))
    def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      df.coalesce(1).write.parquet(s"$dir/stage_$name")
      val part = new java.io.File(s"$dir/stage_$name").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(s"$dir/in/$name.parquet"))
    }
    // batch a: a copy of corpus doc 5 + a fresh doc
    stage(Seq(mkDoc(90L, 5L), mkDoc(100L, 7000L))
      .toDF("doc_id", "text", "lang", "source", "n_chars"), "a")
    Thread.sleep(1200) // distinct mtimes pin the trigger order
    // batch b: a copy of batch a's fresh doc + another fresh doc
    stage(Seq(mkDoc(110L, 7000L), mkDoc(200L, 8000L))
      .toDF("doc_id", "text", "lang", "source", "n_chars"), "b")
    val out = s"$dir/out"
    def run(ckpt: String): Unit = {
      val q = DocumentStreams.streamingSpanIngest(
        spark.readStream.schema(DocumentStreams.docSchema)
          .option("maxFilesPerTrigger", 1).parquet(s"$dir/in"),
        "graft_stream_span", out, s"$dir/$ckpt", span = 6)
      try q.processAllAvailable() finally q.stop()
    }
    run("ckpt")
    def results(): Map[Long, (Long, String)] =
      spark.read.parquet(out).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_after"), r.getAs[String]("rewritten_md5")))).toMap
    val r1 = results()
    assert(r1(90L)._1 === 0L, "corpus copy not emptied")
    assert(r1(100L)._1 === 12L, "fresh doc damaged")
    assert(r1(110L)._1 === 0L, s"batch b did not see batch a's doc: ${r1(110L)}")
    assert(r1(200L)._1 === 12L)
    // fresh-checkpoint replay: the whole stream redelivers; outputs
    // are reproduced bit-for-bit (self-owned windows are kept)
    run("ckpt_replay")
    assert(results() === r1)
  }

  test("streaming quality gate: split + mergeable ledger equal batch checks; zones track the accepted sink") {
    import org.apache.spark.sql.functions._
    import graft.operators.Checks
    val s = spark; import s.implicits._
    val mk = (id: Long, lang: String, nChars: Long) =>
      (id, s"doc $id body", lang, "src0", nChars)
    // batch 1: 3 clean + 1 bad-lang; batch 2: 2 clean + 1 zero-chars
    val b1 = (Seq(mk(1L, "en", 10L), mk(2L, "en", 12L), mk(3L, "fr", 9L),
      mk(4L, "xx", 7L))).toDF("doc_id", "text", "lang", "source", "n_chars")
    val b2 = (Seq(mk(10L, "en", 20L), mk(11L, "fr", 30L), mk(12L, "en", 0L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft-qgate").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/in"))
    def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      df.coalesce(1).write.parquet(s"$dir/stage_$name")
      val part = new java.io.File(s"$dir/stage_$name").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(s"$dir/in/$name.parquet"))
    }
    stage(b1, "one"); stage(b2, "two")
    val checks = Seq(
      "text_not_null" -> col("text").isNotNull,
      "n_chars_positive" -> (col("n_chars") > 0),
      "lang_accepted" -> col("lang").isin("en", "fr"))
    val stream = spark.readStream.schema(DocumentStreams.docSchema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in")
    val out = s"$dir/out"
    val q = QualityStreams.streamingQualityGate(stream, checks, out,
      s"$dir/ckpt", zoneCols = Seq("doc_id"))
    try q.processAllAvailable() finally q.stop()

    val accepted = spark.read.parquet(s"$out/accepted").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val rejected = spark.read.parquet(s"$out/rejected")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("failed_checks"))).toMap
    assert(accepted === Set(1L, 2L, 3L, 10L, 11L))
    assert(rejected === Map(4L -> "lang_accepted", 12L -> "n_chars_positive"))
    // ledger merges to exactly the batch verdicts over the union
    val summary = QualityStreams.ledgerSummary(spark, out)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2))).toSet
    val batchVerdicts = Checks.rowChecks(b1.unionByName(b2), checks)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(summary === batchVerdicts)
    // the accepted sink's streamed zone map equals a from-scratch build
    val zs = QualityStreams.zoneStats(spark, out)
      .select("file", "n_rows", "min_doc_id", "max_doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val rebuilt = graft.sources.ZoneMap.build(spark, s"$out/accepted", Seq("doc_id"))
      .collect()
      .map(r => (r.getAs[String]("file"), r.getAs[Long]("n_rows"),
        r.getAs[Long]("min_doc_id"), r.getAs[Long]("max_doc_id"))).toSet
    assert(zs === rebuilt && zs.nonEmpty)
    // at-least-once replay: a fresh checkpoint re-processes everything
    // into the same batch=<id> dirs — the gate's outputs are unchanged
    val q2 = QualityStreams.streamingQualityGate(
      spark.readStream.schema(DocumentStreams.docSchema)
        .option("maxFilesPerTrigger", 1).parquet(s"$dir/in"),
      checks, out, s"$dir/ckpt_replay", zoneCols = Seq("doc_id"))
    try q2.processAllAvailable() finally q2.stop()
    val summary2 = QualityStreams.ledgerSummary(spark, out)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(summary2 === batchVerdicts)
  }

  test("streaming NB maintenance: merged count ledger fits the batch model; replay idempotent") {
    import graft.operators.TextAnalysis
    val s = spark; import s.implicits._
    val mkDoc = (id: Long) => (id,
      (0 until 12).map(j => s"w${(id * 7 + j * 3) % 9}").mkString(" "),
      "en", if (id % 2 == 0) "srcA" else "srcB", 50L)
    val dir = java.nio.file.Files.createTempDirectory("graft-nbstream").toString
    val w1 = (0L until 20L).map(mkDoc).toDF("doc_id", "text", "lang", "source", "n_chars")
    w1.coalesce(1).write.mode("append").parquet(s"$dir/in")
    val q1 = DocumentStreams.streamingNbMaintenance(
      DocumentStreams.readDocumentStream(spark, s"$dir/in"), s"$dir/counts", s"$dir/ckpt")
    try q1.processAllAvailable() finally q1.stop()
    val w2 = (20L until 35L).map(mkDoc).toDF("doc_id", "text", "lang", "source", "n_chars")
    w2.coalesce(1).write.mode("append").parquet(s"$dir/in")
    val q2 = DocumentStreams.streamingNbMaintenance(
      DocumentStreams.readDocumentStream(spark, s"$dir/in"), s"$dir/counts", s"$dir/ckpt")
    try q2.processAllAvailable() finally q2.stop()
    def modelRows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).sorted.toSeq
    val streamed = modelRows(DocumentStreams.nbFromCounts(spark, s"$dir/counts"))
    val batchTwin = modelRows(TextAnalysis.naiveBayesModel(
      w1.unionByName(w2).select(col("source").as("label"), col("text"))))
    assert(streamed === batchTwin,
      "count-ledger fit diverged from the single-pass fit")
    // at-least-once replay: re-running a batch under its own id
    // overwrites batch=<id> instead of double-counting
    TextAnalysis.nbCountState(w2.select(col("source").as("label"), col("text")))
      .write.mode("overwrite").parquet(s"$dir/counts/batch=1")
    assert(modelRows(DocumentStreams.nbFromCounts(spark, s"$dir/counts")) === streamed,
      "replayed batch changed the fitted model")
    // and the maintained model CLASSIFIES like the batch-fit one
    val test = (100L until 110L).map(mkDoc).toDF("doc_id", "text", "lang", "source", "n_chars")
    val predStream = TextAnalysis.naiveBayesClassify(test,
        DocumentStreams.nbFromCounts(spark, s"$dir/counts"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val predBatch = TextAnalysis.naiveBayesClassify(test,
        TextAnalysis.naiveBayesModel(
          w1.unionByName(w2).select(col("source").as("label"), col("text"))))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(predStream === predBatch)
  }

  test("sustained ingest: per-batch latency stays flat as the index grows " +
      "(50 micro-batches through streamingIndexIngest)") {
    // The maintenance loop's contract at scale: probe + append cost
    // tracks the BATCH (bucket-pruned lookups, batch-sized inserts),
    // not the standing corpus — so under sustained arrival the
    // per-batch latency must not trend up with index growth. 50 novel
    // 200-doc batches against an index seeded with 2k docs (the index
    // grows 6x over the run; a corpus-rescanning implementation would
    // show a clear upward trend). The full-scale record (1k-doc
    // batches against a 200k-doc index) lives in ScaleProbe /
    // BASELINE.md; this pins the mechanism in the suite.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.Dedup
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // splitmix64 finalizer: a bare linear multiply mod vocab is
    // quasi-periodic (all docs become near-identical windows of one
    // short cycle — reproduced: jaccard 1.0 across "distinct" docs)
    def mix(z0: Long): Long = {
      var z = z0 * 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    def text(id: Long): String = (0 until 40).map(j =>
      "w" + java.lang.Long.remainderUnsigned(mix(id * 40 + j), 300L)).mkString(" ")
    val seed = (0L until 2000L).map(i => (i, text(i))).toDF("doc_id", "text")
    val idx = s"graft_slat_spec_${math.abs(System.nanoTime())}"
    Dedup.writeMinhashIndex(seed, idx)
    val dir = java.nio.file.Files.createTempDirectory("graft-slat-spec").toString
    val ms = MemoryStream[(Long, String)]
    val q = DocumentStreams.streamingIndexIngest(
      ms.toDF().toDF("doc_id", "text"), idx, s"$dir/out", s"$dir/ckpt")
    val lat = try {
      (0 until 50).map { b =>
        ms.addData((0 until 200).map(i => {
          val id = 5000000L + b * 200L + i; (id, text(id))
        }))
        val t0 = System.nanoTime()
        q.processAllAvailable()
        (System.nanoTime() - t0) / 1e9
      }
    } finally q.stop()
    def p50(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    val early = p50(lat.slice(5, 20))
    val late = p50(lat.takeRight(15))
    info(f"p50 early $early%.2f s, p50 late $late%.2f s over 50 batches")
    // round 12: the loop runs the files-per-bucket auto-compaction
    // trigger between batches, so the small-file listing tax self-
    // cures — the bound tightens from the manual-era 2.5× to 1.3×
    // (+0.2 s absolute slack for sub-second shared-host noise)
    assert(late <= 1.3 * early + 0.2,
      f"per-batch latency grew with the index despite auto-compaction: " +
        f"p50 $early%.2f -> $late%.2f s")
    // the TRIGGER really fired: 50 appends × ≤64 files against the
    // 8-files-per-bucket default would otherwise stand at ~3k files;
    // the post-trigger ceiling is one compacted layout (64) plus at
    // most 8 rounds of fresh appends before the next firing
    for (t <- Seq(s"${idx}_bands", s"${idx}_shingles")) {
      val n = graft.sources.Bucketing.dataFileCount(spark, t)
      assert(n <= 64L * 9, s"$t has $n files — the auto-compaction trigger never fired")
    }
    // and the loop really ingested: the index grew by the novel docs
    assert(spark.table(s"${idx}_shingles")
      .select(org.apache.spark.sql.functions.countDistinct(col("id")))
      .head().getLong(0) >= 2000L + 50L * 200L - 50L)
    // the stream_ingest_read_lat find, pinned in-suite: a DIFFERENT
    // session (fresh relation cache, like any user session sharing
    // the process) must read the index after the loop's compactions —
    // under the pre-versioning DROP→RENAME layout this threw
    // FAILED_READ_FILE.FILE_NOT_EXIST once its cached listing went
    // stale; the versioned-view layer makes it structurally safe.
    // Resolve once, compact underneath, read the SAME frame again.
    val outer = spark.newSession()
    val held = outer.table(s"${idx}_bands")
    val preCount = held.count()
    assert(preCount > 0L)
    graft.sources.Bucketing.compactBucketed(spark, s"${idx}_bands")
    assert(held.count() === preCount,
      "a frame resolved BEFORE the compaction must finish against the " +
        "grace-retained previous version")
    assert(outer.table(s"${idx}_bands").count() === preCount,
      "an outer session must survive a compaction it did not run")
    assert(Dedup.indexedNearDupPairs(
        Seq((99000001L, text(7L))).toDF("doc_id", "text"), idx)
      .count() >= 0L) // full read path (bands + shingles) post-compaction
  }
}
