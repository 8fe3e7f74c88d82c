package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.streaming.GroupStateTimeout

/**
 * Custom streaming state via `KeyValueGroupedDataset.mapGroupsWithState`
 * — the Structured-Streaming analog of the reference's stateful
 * `accumulate` step (reference: src/mr.c:787-810), generalized to
 * continuous updates: state lives per key across micro-batches
 * instead of per execution.
 */
object Stateful {

  case class UserState(n: Long, sum: Double)
  case class UserTotals(user_id: Long, n_events: Long, total_value: Double)

  private implicit val stateEnc: Encoder[UserState] = ExpressionEncoder[UserState]()
  private implicit val totalsEnc: Encoder[UserTotals] = ExpressionEncoder[UserTotals]()
  private implicit val kvEnc: Encoder[(Long, Double)] = ExpressionEncoder[(Long, Double)]()
  private implicit val keyEnc: Encoder[Long] = Encoders.scalaLong

  /**
   * Running per-user totals. On a stream, every micro-batch emits the
   * updated totals for the users it touched (output mode `update`);
   * on a batch frame it degenerates to one pass and equals
   * `groupBy(user).agg(count, sum)` — the equivalence the test suite
   * asserts. Value totals are rounded to cents at emission so
   * accumulation order can't leak into comparisons.
   */
  def runningUserTotals(events: DataFrame): Dataset[UserTotals] =
    events.selectExpr("user_id", "value").as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, Double)],
         state: org.apache.spark.sql.streaming.GroupState[UserState]) =>
          val prev = state.getOption.getOrElse(UserState(0L, 0.0))
          var n = prev.n
          var sum = prev.sum
          rows.foreach { case (_, v) => n += 1; sum += v }
          state.update(UserState(n, sum))
          UserTotals(uid, n, math.rint(sum * 100) / 100)
      }

  case class UserStats(user_id: Long, n_events: Long, total_value: Double,
      max_value: Double)
  case class StatsState(n: Long, sum: Double, max: Double)

  private implicit val statsStateEnc: Encoder[StatsState] = ExpressionEncoder[StatsState]()
  private implicit val statsEnc: Encoder[UserStats] = ExpressionEncoder[UserStats]()

  /**
   * [[runningUserTotals]] re-expressed on Spark 4's
   * `transformWithState` arbitrary-state API — `StatefulProcessor`
   * with named, typed state handles (the successor to
   * mapGroupsWithState: composable ValueState/ListState/MapState,
   * per-state TTL, timers). State here is one `ValueState[StatsState]`
   * per user; every micro-batch emits the updated summary for the
   * users it touched (update mode). On a batch frame it degenerates
   * to one pass ≡ `groupBy(user).agg(count, sum, max)` — the
   * equivalence StreamingSpec asserts. Sums round to cents at
   * emission so accumulation order can't leak into comparisons.
   */
  private class UserStatsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, Double), UserStats] {
    @transient private var state: org.apache.spark.sql.streaming.ValueState[StatsState] = _

    override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      state = getHandle.getValueState[StatsState]("userStats",
        implicitly[Encoder[StatsState]],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(uid: Long, rows: Iterator[(Long, Double)],
        tv: org.apache.spark.sql.streaming.TimerValues): Iterator[UserStats] = {
      val prev = if (state.exists()) state.get() else StatsState(0L, 0.0, Double.NegativeInfinity)
      var n = prev.n
      var sum = prev.sum
      var mx = prev.max
      rows.foreach { case (_, v) => n += 1; sum += v; mx = math.max(mx, v) }
      state.update(StatsState(n, sum, mx))
      // HALF_UP cents (the floor(x*100+0.5) discipline) so the DuckDB
      // oracle replays the emission exactly
      Iterator.single(UserStats(uid, n, math.floor(sum * 100 + 0.5) / 100, mx))
    }
  }

  def runningUserStats(events: DataFrame): Dataset[UserStats] = {
    // batch execution of TransformWithStateExec still reports to the
    // StateStoreCoordinator, which only a streaming query would have
    // created — force it into existence for batch-only sessions
    val mgr = events.sparkSession.streams
    try mgr.getClass.getMethod("stateStoreCoordinator").invoke(mgr)
    catch { case _: ReflectiveOperationException => () } // non-classic session
    events.selectExpr("user_id", "value").as[(Long, Double)]
      .groupByKey(_._1)
      .transformWithState(new UserStatsProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Update())
  }

  case class BurstState(n: Long, lastMs: Long)
  case class IdleAlert(user_id: Long, n_events: Long)

  private implicit val burstEnc: Encoder[BurstState] = ExpressionEncoder[BurstState]()
  private implicit val alertEnc: Encoder[IdleAlert] = ExpressionEncoder[IdleAlert]()
  private implicit val tsRowEnc: Encoder[(Long, java.sql.Timestamp)] =
    ExpressionEncoder[(Long, java.sql.Timestamp)]()

  /**
   * Idle-user alerts via transformWithState EVENT-TIME TIMERS — the
   * facility mapGroupsWithState never had cleanly: each user's state
   * re-arms a timer at (last event + gap); when the WATERMARK passes
   * it, `handleExpiredTimer` emits one burst-closed alert and clears
   * the state — session-timeout semantics driven by event time, with
   * state freed exactly at expiry. Streaming-only by nature (a batch
   * frame has no watermark to expire timers); StreamingSpec pins the
   * alert set against the batch per-user aggregate.
   */
  private class IdleAlertProcessor(gapMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, java.sql.Timestamp), IdleAlert] {
    @transient private var state: org.apache.spark.sql.streaming.ValueState[BurstState] = _

    override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      state = getHandle.getValueState[BurstState]("burst",
        implicitly[Encoder[BurstState]],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(uid: Long, rows: Iterator[(Long, java.sql.Timestamp)],
        tv: org.apache.spark.sql.streaming.TimerValues): Iterator[IdleAlert] = {
      val prev = if (state.exists()) state.get() else BurstState(0L, Long.MinValue)
      var n = prev.n
      var last = prev.lastMs
      rows.foreach { case (_, ts) => n += 1; last = math.max(last, ts.getTime) }
      state.update(BurstState(n, last))
      // re-arm: one live timer per user at (last event + gap)
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
      getHandle.registerTimer(last + gapMs)
      Iterator.empty
    }

    override def handleExpiredTimer(uid: Long,
        tv: org.apache.spark.sql.streaming.TimerValues,
        info: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[IdleAlert] = {
      val out = if (state.exists()) Iterator.single(IdleAlert(uid, state.get().n))
        else Iterator.empty
      state.clear()
      out
    }
  }

  def idleUserAlerts(events: DataFrame, gapMinutes: Int = 30,
      watermark: String = "1 minute"): Dataset[IdleAlert] =
    events.withWatermark("ts", watermark)
      .selectExpr("user_id", "ts").as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .transformWithState(new IdleAlertProcessor(gapMinutes * 60000L),
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        org.apache.spark.sql.streaming.OutputMode.Append())

  case class LastType(t: String)
  case class Transition(user_id: Long, from_type: String, to_type: String)

  private implicit val lastEnc: Encoder[LastType] = ExpressionEncoder[LastType]()
  private implicit val transEnc: Encoder[Transition] = ExpressionEncoder[Transition]()
  private implicit val rowEnc: Encoder[(Long, Long, String)] = ExpressionEncoder[(Long, Long, String)]()

  /**
   * Per-user event-type transitions via `flatMapGroupsWithState` —
   * the 0..n-rows-out stateful shape (vs `mapGroupsWithState`'s
   * exactly-one). State carries the last type seen so transitions
   * spanning micro-batch boundaries are still emitted; rows are
   * ordered by event_id inside the group (the group iterator itself
   * has no order guarantee, batch or stream).
   */
  def typeTransitions(events: DataFrame): Dataset[Transition] =
    events.selectExpr("user_id", "event_id", "event_type").as[(Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
          org.apache.spark.sql.streaming.OutputMode.Append(),
          GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, Long, String)],
         state: org.apache.spark.sql.streaming.GroupState[LastType]) =>
          val types = rows.toSeq.sortBy(_._2).map(_._3)
          val seq = state.getOption.map(_.t).toSeq ++ types
          if (types.nonEmpty) state.update(LastType(types.last))
          seq.sliding(2).collect { case Seq(a, b) => Transition(uid, a, b) }
      }
}
