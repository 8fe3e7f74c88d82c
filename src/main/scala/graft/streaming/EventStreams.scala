package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Structured-Streaming surface over the `events` table shape. The
 * reference is batch-only (SURVEY §2.4: streaming absent); this is
 * the north-star extension expressed the Spark-native way:
 * `readStream` → watermark → windowed aggregation / session windows.
 *
 * Every streaming query here has a batch twin with identical
 * semantics (used by the DuckDB oracle): the streaming plan is the
 * same logical plan plus watermark-driven state eviction.
 */
object EventStreams {

  /** Event schema with `ts` of the given physical type (the fixture has shipped both TIMESTAMP(NANOS) and TIMESTAMP(MICROS)). */
  def rawEventSchema(tsType: DataType): StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", tsType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /**
   * File-source stream over a directory of event parquet. The fixture
   * writer has shipped `ts` as both TIMESTAMP(NANOS) (which Spark 4
   * surfaces as long under the legacy flag — floor-convert ns→µs) and
   * plain TIMESTAMP(MICROS); a streaming source needs a user-declared
   * schema, so peek at the directory's batch-inferred footer schema
   * once and declare the matching one.
   */
  def readEventStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    val tsType = spark.read.parquet(dir).schema("ts").dataType
    val raw = spark.readStream.schema(rawEventSchema(tsType)).parquet(dir)
    if (tsType == LongType) raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else raw
  }

  /**
   * Tumbling-window counts per event type with a watermark bounding
   * state. Works on both a streaming and a batch DataFrame.
   */
  def windowedCounts(events: DataFrame, windowLen: String = "1 hour",
      watermark: String = "2 hours"): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", watermark) else events
    src.groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count("*").as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"), col("sum_value"))
  }

  /**
   * Volume-anomaly report over windowed counts: per event type, each
   * window's count is z-scored against that type's across-window
   * mean/stddev; windows with |z| ≥ `threshold` (compared on the
   * 4-decimal rounding, so every engine agrees at the boundary) are
   * the anomalies. The stats table is |event types| rows — broadcast;
   * types with < 2 windows or zero variance are excluded rather than
   * dividing by zero. On a stream, apply per micro-batch via
   * foreachBatch over the complete-mode windowed counts (StreamingSpec
   * proves streamed ≡ batch).
   */
  def zscoreReport(wc: DataFrame, threshold: Double = 2.0): DataFrame = {
    val stats = wc.groupBy(col("event_type").as("et"))
      .agg(avg("n").as("mean_n"), stddev_samp(col("n")).as("sd_n"),
        count(lit(1)).as("n_windows"))
    wc.join(broadcast(stats), col("event_type") === col("et"))
      .filter(col("n_windows") >= 2 && col("sd_n") > 0)
      .select(col("win_start"), col("event_type"), col("n"),
        round((col("n") - col("mean_n")) / col("sd_n"), 4).as("z"))
      .filter(abs(col("z")) >= threshold)
  }

  /**
   * Per-window user activity counts — the counting stage of the
   * streaming leaderboard. Watermark-bounded windowed aggregate;
   * runs identically on a batch or streaming frame.
   */
  def windowUserCounts(events: DataFrame, windowLen: String = "1 hour",
      watermark: String = "2 hours"): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", watermark) else events
    src.groupBy(window(col("ts"), windowLen), col("user_id"))
      .agg(count("*").as("n"))
      .select(col("window.start").as("win_start"), col("user_id"), col("n"))
  }

  /**
   * Top-`k` users per window by activity (the streaming leaderboard's
   * rank cut), lowered to the custom two-phase heap operator
   * ([[graft.plans.TopKPerKey]]): map-side per-window heaps, one
   * exchange of ≤ k·windows rows — never a sort or a window function
   * over the counts. On a stream, apply it per micro-batch via
   * foreachBatch over the windowed aggregate (StreamingSpec proves
   * the streamed leaderboard equals this batch path).
   */
  def topUsersPerWindow(counts: DataFrame, k: Int = 3): DataFrame =
    graft.relational.Relational.topKPerKey(
      counts,
      keys = Seq(col("win_start")),
      order = Seq(col("n").desc, col("user_id").asc),
      k = k)

  /**
   * Session windows (gap-based) per user — streaming native via
   * `session_window`; state size bounded by the watermark.
   */
  def streamingSessions(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", watermark) else events
    src.groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count("*").as("n_events"))
      .select(col("user_id"), col("session_window.start").as("session_start"), col("n_events"))
  }

  /**
   * Click→purchase attribution: for every click, purchases by the
   * same user within `windowMinutes` after it. Works on batch and
   * (with watermarks) as a stream-stream inner join — Spark bounds
   * the join state by the event-time range condition. The batch path
   * compares epoch MICROS — Spark timestamps are µs precision, so a
   * µs-delta bound is value-identical to the streaming path's raw
   * timestamp comparisons at every boundary (a ms-truncated bound
   * would admit sub-ms gaps the streaming join rejects).
   */
  def clickToPurchase(clicks: DataFrame, purchases: DataFrame,
      windowMinutes: Int = 30): DataFrame = {
    val c = clicks.select(col("user_id"), col("ts").as("click_ts"))
    val p = purchases.select(col("user_id").as("p_user"), col("ts").as("p_ts"))
    val joined =
      if (clicks.isStreaming)
        c.withWatermark("click_ts", "2 hours").join(
          p.withWatermark("p_ts", "2 hours"),
          col("user_id") === col("p_user") &&
            col("p_ts") > col("click_ts") &&
            col("p_ts") <= col("click_ts") + expr(s"INTERVAL $windowMinutes MINUTES"))
      else
        c.join(p,
          col("user_id") === col("p_user") &&
            (unix_micros(col("p_ts")) - unix_micros(col("click_ts")))
              .between(1L, windowMinutes * 60000000L))
    joined.select(col("user_id"), col("click_ts"), col("p_ts"))
  }

  /**
   * Click→purchase LEFT OUTER attribution: every click surfaces, with
   * a purchase when one follows within `windowMinutes`, else null
   * purchase columns. On a stream this is the watermarked
   * stream-stream outer join: Spark holds a click only until the
   * watermark passes its join window, then emits the unmatched row —
   * state stays bounded by the interval condition exactly as in the
   * inner form, and the unmatched tail needs only watermark advance
   * (no end-of-stream). Batch compares epoch micros ≡ the streaming
   * raw-µs comparisons at every boundary (see [[clickToPurchase]]).
   */
  def clickToPurchaseOuter(clicks: DataFrame, purchases: DataFrame,
      windowMinutes: Int = 30): DataFrame = {
    val c = clicks.select(col("user_id"), col("ts").as("click_ts"))
    val p = purchases.select(col("user_id").as("p_user"), col("ts").as("p_ts"))
    val joined =
      if (clicks.isStreaming)
        c.withWatermark("click_ts", "2 hours").join(
          p.withWatermark("p_ts", "2 hours"),
          col("user_id") === col("p_user") &&
            col("p_ts") > col("click_ts") &&
            col("p_ts") <= col("click_ts") + expr(s"INTERVAL $windowMinutes MINUTES"),
          "left_outer")
      else
        c.join(p,
          col("user_id") === col("p_user") &&
            (unix_micros(col("p_ts")) - unix_micros(col("click_ts")))
              .between(1L, windowMinutes * 60000000L),
          "left_outer")
    joined.select(col("user_id"), col("click_ts"), col("p_ts"))
  }

  /**
   * Exact event dedup with BOUNDED state: on a stream, a key is
   * remembered only until the watermark passes its event time
   * (`dropDuplicatesWithinWatermark`), so state is O(one watermark
   * window of keys), not O(every id ever seen) — the only dedup shape
   * that survives continuous ingest at 100 TB. The batch twin is
   * plain dropDuplicates; the two agree whenever duplicate copies
   * arrive within one watermark of each other (true of replay/retry
   * duplication, the case this operator exists for).
   */
  def dedupWithinWatermark(events: DataFrame,
      keys: Seq[String] = Seq("event_id"),
      watermark: String = "2 hours"): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(keys)
    else events.dropDuplicates(keys)

  /**
   * Three-step funnel view→click→purchase: per user, ordered triples
   * where each step follows the previous within `windowMinutes`.
   * Batch and streaming share the plan; streaming chains TWO
   * stream-stream interval joins (Spark 4 supports multiple stateful
   * operators in append mode — each join's state is bounded by its
   * event-time range condition). Batch bounds compare epoch micros —
   * value-identical to the streaming joins' raw µs-timestamp
   * comparisons, as in [[clickToPurchase]].
   */
  def funnelSteps(views: DataFrame, clicks: DataFrame, purchases: DataFrame,
      windowMinutes: Int = 30): DataFrame = {
    val v = views.select(col("user_id"), col("ts").as("view_ts"))
    val c = clicks.select(col("user_id").as("c_user"), col("ts").as("click_ts"))
    val p = purchases.select(col("user_id").as("p_user"), col("ts").as("p_ts"))
    val win = windowMinutes * 60000000L
    val streaming = views.isStreaming
    def wm(df: DataFrame, tsCol: String) =
      if (streaming) df.withWatermark(tsCol, "2 hours") else df
    val vc =
      if (streaming)
        wm(v, "view_ts").join(wm(c, "click_ts"),
          col("user_id") === col("c_user") &&
            col("click_ts") > col("view_ts") &&
            col("click_ts") <= col("view_ts") + expr(s"INTERVAL $windowMinutes MINUTES"))
      else
        v.join(c, col("user_id") === col("c_user") &&
          (unix_micros(col("click_ts")) - unix_micros(col("view_ts"))).between(1L, win))
    val vcp =
      if (streaming)
        // exactly ONE event-time column may flow into the next
        // stateful operator: rebuild view_ts as a fresh (value-equal)
        // expression to strip its watermark tag, leaving click_ts as
        // the join's event time
        vc.select(col("user_id"), col("c_user"),
            timestamp_micros(unix_micros(col("view_ts"))).as("view_ts"),
            col("click_ts"))
          .join(wm(p, "p_ts"),
          col("user_id") === col("p_user") &&
            col("p_ts") > col("click_ts") &&
            col("p_ts") <= col("click_ts") + expr(s"INTERVAL $windowMinutes MINUTES"))
      else
        vc.join(p, col("user_id") === col("p_user") &&
          (unix_micros(col("p_ts")) - unix_micros(col("click_ts"))).between(1L, win))
    vcp.select(col("user_id"), col("view_ts"), col("click_ts"), col("p_ts"))
  }

  /** Oracle-friendly aggregate over [[funnelSteps]]: completed funnels + mean end-to-end delay. */
  def funnelStats(events: DataFrame, windowMinutes: Int = 30): DataFrame =
    funnelSteps(
        events.filter(col("event_type") === "view"),
        events.filter(col("event_type") === "click"),
        events.filter(col("event_type") === "purchase"), windowMinutes)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_funnels"),
        round(avg((unix_millis(col("p_ts")) - unix_millis(col("view_ts"))) / 1000.0), 4)
          .as("avg_total_s"))

  /** Oracle-friendly aggregate over [[clickToPurchase]]: conversions + mean delay per user. */
  def clickToPurchaseStats(events: DataFrame, windowMinutes: Int = 30): DataFrame = {
    val pairs = clickToPurchase(
      events.filter(col("event_type") === "click"),
      events.filter(col("event_type") === "purchase"), windowMinutes)
    pairs.groupBy("user_id")
      .agg(count("*").as("n_conversions"),
        round(avg((unix_millis(col("p_ts")) - unix_millis(col("click_ts"))) / 1000.0), 4)
          .as("avg_delay_s"))
  }

  /**
   * Stream-static enrichment: the event stream joined to a static
   * dimension table (broadcast — the static side is planned once and
   * shipped to every task; no state store involved, unlike
   * stream-stream joins). Works identically on a batch DataFrame,
   * which is the oracle twin. Output: per-segment event census.
   */
  def enrichedSegmentCensus(events: DataFrame, customers: DataFrame): DataFrame =
    events.join(
        broadcast(customers.select(col("c_custkey"), col("c_mktsegment"))),
        col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))

  /**
   * Batch sessionization via lag/cumsum (the oracle-friendly twin of
   * `streamingSessions`): a new session starts after a gap >
   * `gapMinutes`. Returns per-user session counts.
   */
  def sessionCounts(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts")
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_millis(col("ts")) - unix_millis(col("prev_ts")) > gapMinutes * 60000L, 1L)
          .otherwise(0L))
      .groupBy("user_id")
      .agg(sum("new_session").as("n_sessions"), count("*").as("n_events"))
  }
}
