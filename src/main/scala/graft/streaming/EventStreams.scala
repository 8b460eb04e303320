package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
import org.apache.spark.sql.types._

/** Structured Streaming surface over the `events` shape (event_id, ts,
  * user_id, event_type, value, props). The reference has no streaming
  * semantics (its 2-stage fan-out is a lambda-harness artifact, SURVEY
  * §2.7); this module is the engine's incremental-processing path: the
  * SAME transform functions serve `spark.read` and `spark.readStream`
  * (unbounded-source planning differs only in watermarks/output mode).
  *
  * Scale notes: hourly/session aggregations are keyed state — state
  * store size is bounded by the watermark horizon, not stream length;
  * `mapGroupsWithState` keys partition across executors and time out
  * via processing-time timeouts.
  */
object EventStreams {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-backed stream of JSON-lines event files dropped into `dir`. */
  def readJsonStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema).json(dir)

  /** Hourly tumbling counts per event type — works identically on a
    * batch frame (no watermark needed) and a stream (2h late-data
    * horizon). Mirrors EventQueries.tumblingWindow. */
  def hourlyCounts(events: DataFrame): DataFrame = {
    val src =
      if (events.isStreaming) events.withWatermark("ts", "2 hours") else events
    src.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        (sum(round(col("value") * 100, 0).cast("long"))).as("value_cents"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n_events"), col("value_cents"))
  }

  /** CHAINED stateful pipeline: watermarked exact dedup feeding a
    * tumbling hourly aggregate — two stateful operators in ONE
    * streaming query (the ingest-then-aggregate shape every metrics
    * pipeline composes; at-least-once sources make the dedup stage
    * load-bearing, and fusing it with the aggregate avoids a second
    * query + intermediate sink). Stream side:
    * `dropDuplicatesWithinWatermark` keeps the FIRST arrival of each
    * `event_id` and holds the key in state for the watermark horizon
    * (a duplicate arriving after its key expired IS re-admitted — the
    * documented horizon contract; size `delay` to the source's
    * redelivery window), then the hourly aggregate consumes the
    * surviving rows, closing each window when the watermark passes its
    * end. Batch side: plain `dropDuplicates` + the same aggregate.
    * Emission mechanics for the replay gate are pinned empirically in
    * ChainedStatefulSpec (the q193/q201 playbook). State cost is the
    * sum of the two operators' stores — dedup keys within horizon +
    * open windows — both bounded by the watermark, never stream
    * length. */
  def dedupedHourlyCounts(events: DataFrame,
      delay: String = "10 minutes"): DataFrame = {
    val deduped =
      if (events.isStreaming)
        events.withWatermark("ts", delay)
          .dropDuplicatesWithinWatermark("event_id")
      else events.dropDuplicates("event_id")
    deduped.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100, 0).cast("long")).as("value_cents"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n_events"), col("value_cents"))
  }

  /** Stream-static enrichment join: per-type totals against a static
    * dimension. The static side is broadcast and re-resolved every
    * micro-batch (so a refreshed dim file picks up mid-stream) — the
    * standard pattern for joining a firehose to reference data without
    * any stream-stream state. */
  def enrichedTotals(events: DataFrame, userTiers: DataFrame): DataFrame =
    events.join(broadcast(userTiers), Seq("user_id"), "left")
      .groupBy(coalesce(col("tier"), lit("unknown")).as("tier"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100, 0).cast("long")).as("value_cents"))

  /** Sliding windows (2h span every 30min — each event lands in 4
    * overlapping windows): same batch/stream duality as
    * [[hourlyCounts]]; state size is windows-per-event × groups,
    * bounded by the watermark horizon. */
  def slidingCounts(events: DataFrame): DataFrame = {
    val src =
      if (events.isStreaming) events.withWatermark("ts", "2 hours") else events
    src.groupBy(window(col("ts"), "2 hours", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n_events"))
  }

  /** Per-type log2 value-cents histogram — the mergeable quantile
    * sketch ([[graft.operators.Frequency.log2Histogram]]) maintained
    * incrementally: cells only ever accumulate, so the stream's
    * running aggregation state IS the sketch, bounded at ≤65 bins per
    * key with no watermark needed. Reading the median off the live
    * histogram ([[graft.operators.Frequency.histQuantile]]) gives a
    * continuously-updated quantile monitor for pennies of state —
    * the streaming twin of q100. */
  def valueHistograms(events: DataFrame): DataFrame =
    events.groupBy(col("event_type"),
        graft.operators.Frequency.log2Bin(
          round(col("value") * 100, 0).cast("long")).as("bin"))
      .agg(count(lit(1)).as("cnt"))

  /** Stateless stream-side anomaly tagging: reference per-type
    * (med2, mad4) stats — computed batch-side by
    * [[graft.operators.Anomaly.madOutlierStats]] over a trusted window
    * — broadcast into the stream, each event flagged by the same
    * integer rule (2·|2v − med2| > k·mad4). A stream-static broadcast
    * join plus a projection: no state, no watermark, so the transform
    * runs identically on batch frames (parity spec-pinned). Event
    * types absent from the reference stats pass through unflagged —
    * an unseen type has no distribution to be anomalous against;
    * route those to a separate quarantine if first-seen types matter. */
  def anomalyFlags(events: DataFrame, stats: DataFrame,
      k: Long): DataFrame = {
    val c = round(col("value") * 100, 0).cast("long")
    events.join(
        broadcast(stats.select(col("event_type"), col("med2"), col("mad4"))),
        Seq("event_type"), "left")
      .withColumn("is_anom",
        when(col("med2").isNull, lit(false))
          .otherwise(abs(c * 2L - col("med2")) * 2L > lit(k) * col("mad4")))
  }

  /** Native session windows (30-min gap): the streaming-first form of
    * EventQueries.sessionize. */
  def sessionWindows(events: DataFrame): DataFrame = {
    val src =
      if (events.isStreaming) events.withWatermark("ts", "2 hours") else events
    src.groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        (sum(round(col("value") * 100, 0).cast("long"))).as("value_cents"))
      .select(col("session_window.start").as("session_start"),
        col("user_id"), col("n_events"), col("value_cents"))
  }

  /** Stream-stream interval join: purchases within one hour after a
    * click by the same user. Both sides watermarked so the join state
    * is bounded by the time-range condition + watermark horizon; the
    * identical expression runs on batch frames for parity testing. */
  def clickToPurchase(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c0 = clicks.select(col("user_id"), col("event_id").as("click_id"),
      col("ts").as("click_ts"))
    val p0 = purchases.select(col("user_id").as("p_user_id"),
      col("event_id").as("purchase_id"), col("ts").as("purchase_ts"),
      col("value"))
    val (c, p) =
      if (clicks.isStreaming)
        (c0.withWatermark("click_ts", "2 hours"),
          p0.withWatermark("purchase_ts", "2 hours"))
      else (c0, p0)
    c.join(p,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        unix_micros(col("purchase_ts")) - unix_micros(col("click_ts"))
          .as("gap_us"))
  }

  /** Streaming exact dedup on event_id: duplicates arriving within the
    * watermark horizon are dropped with bounded state (the batch
    * equivalent is a plain dropDuplicates). */
  def dedupedEvents(events: DataFrame): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", "2 hours")
        .dropDuplicatesWithinWatermark("event_id")
    else events.dropDuplicates("event_id")

  /** Watermarked STREAM-STREAM inner join: per user, each 'view'
    * matched to every 'purchase' in [view ts, view ts + 1h]. The time
    * bound is what makes unbounded-stream joins possible at all: the
    * watermark proves when a buffered view can no longer match any
    * future purchase (v_ts + 1h < watermark) and evicts it, so state
    * is bounded by the join window × arrival rate, not the stream.
    * Works identically on batch frames (the condition is plain SQL);
    * on streams Spark plans StreamingSymmetricHashJoin with state
    * cleanup driven by the same watermark. Append semantics: a pair
    * emits in the micro-batch that delivers its LATER side. */
  def viewPurchaseJoin(events: DataFrame): DataFrame = {
    val src =
      if (events.isStreaming) events.withWatermark("ts", "1 hour")
      else events
    val views = src.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("view_id"))
    val purchases = src.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"), col("value").as("p_value"))
    views.join(purchases, expr(
      "v_user = p_user AND p_ts >= v_ts AND p_ts <= v_ts + INTERVAL 1 HOUR"))
      .select(col("v_user").as("user_id"), col("view_id"),
        col("purchase_id"), col("v_ts"), col("p_ts"))
  }

  /** Watermarked STREAM-STREAM left-OUTER join: [[viewPurchaseJoin]]'s
    * pairing, but a view with NO in-window purchase eventually emits a
    * null-padded row instead of vanishing — the enrichment-pipeline
    * contract when the other side may simply never arrive. The null
    * row can only emit once the watermark PROVES no future purchase
    * can match (wm past `v_ts + 1h`): matched pairs emit in the batch
    * delivering the later side exactly like the inner join, and null
    * rows emit at eviction time, one watermark horizon later —
    * mechanics pinned empirically in StreamingOuterJoinSpec before the
    * q201 oracle was written (the q193 playbook). State stays bounded
    * by window × arrival rate; unmatched views don't leak, they
    * retire through the null path. */
  def viewPurchaseLeftJoin(events: DataFrame): DataFrame = {
    val src =
      if (events.isStreaming) events.withWatermark("ts", "1 hour")
      else events
    val views = src.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("view_id"))
    val purchases = src.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"), col("value").as("p_value"))
    views.join(purchases, expr(
        "v_user = p_user AND p_ts >= v_ts AND p_ts <= v_ts + INTERVAL 1 HOUR"),
        "left_outer")
      .select(col("v_user").as("user_id"), col("view_id"),
        col("purchase_id"), col("v_ts"), col("p_ts"))
  }

  final case class Event(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, event_type: String, value: Double, props: String)
  final case class UserTotal(user_id: Long, n_events: Long, total_cents: Long)

  /** Custom keyed state (KeyValueGroupedDataset.mapGroupsWithState):
    * running per-user totals across micro-batches — the extension point
    * for state machines the built-in windows can't express. */
  def runningUserTotals(events: Dataset[Event]): Dataset[UserTotal] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserTotal, UserTotal](GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[Event], state: GroupState[UserTotal]) =>
          val prev = state.getOption.getOrElse(UserTotal(uid, 0L, 0L))
          val now = batch.foldLeft(prev) { (acc, e) =>
            UserTotal(uid, acc.n_events + 1,
              acc.total_cents + math.round(e.value * 100))
          }
          state.update(now)
          now
      }
  }

  final case class Milestone(user_id: Long, milestone_cents: Long)

  /** Multi-output keyed state (flatMapGroupsWithState): emit one record
    * per 10 000-cent spending milestone a user crosses, however many a
    * batch crosses at once — the zero-or-many-outputs state-machine
    * shape mapGroupsWithState (exactly-one-output) can't express.
    * Events must be fed in event-time order per user for deterministic
    * milestones (a sorted batch, or an upstream watermark+sort). */
  def spendingMilestones(events: Dataset[Event]): Dataset[Milestone] = {
    import events.sparkSession.implicits._
    val step = 10000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, Milestone](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[Event], state: GroupState[Long]) =>
          var total = state.getOption.getOrElse(0L)
          val out = Seq.newBuilder[Milestone]
          batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
            val next = total + math.round(e.value * 100)
            var m = total / step + 1
            while (m * step <= next) { out += Milestone(uid, m * step); m += 1 }
            total = next
          }
          state.update(total)
          out.result().iterator
      }
  }

  /** [[runningUserTotals]] re-expressed on Spark 4's transformWithState
    * — the successor arbitrary-state API: typed state handles
    * (ValueState/ListState/MapState) with per-state TTL, timers, and
    * schema evolution, backed by the RocksDB state store. Semantics
    * here are identical to the mapGroupsWithState form (the spec pins
    * the equivalence); the win at scale is incremental state
    * checkpointing and TTL-bounded growth without hand-rolled timeout
    * logic. Requires
    * `spark.sql.streaming.stateStore.providerClass=RocksDBStateStoreProvider`.
    */
  class UserTotalsProcessor
      extends StatefulProcessor[Long, Event, UserTotal] {
    @transient private var totals: ValueState[UserTotal] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[UserTotal]("totals",
        org.apache.spark.sql.Encoders.product[UserTotal], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[UserTotal] = {
      val prev =
        if (totals.exists()) totals.get() else UserTotal(key, 0L, 0L)
      val now = rows.foldLeft(prev) { (acc, e) =>
        UserTotal(key, acc.n_events + 1,
          acc.total_cents + math.round(e.value * 100))
      }
      totals.update(now)
      Iterator.single(now)
    }
  }

  def runningUserTotalsTws(events: Dataset[Event]): Dataset[UserTotal] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new UserTotalsProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  /** [[UserTotalsProcessor]] with TTL-BOUNDED state: a user idle longer
    * than `ttl` has their running total evicted by the state store (no
    * hand-rolled timeout bookkeeping), so the next event starts from
    * zero. This is how unbounded-keyspace state (user ids, session ids,
    * device ids) stays finite on a forever-running stream — eviction is
    * the store's job, enforced at RocksDB compaction, not per-key code.
    * TTL is wall-clock based, so it requires TimeMode.ProcessingTime. */
  class TtlUserTotalsProcessor(ttl: java.time.Duration)
      extends StatefulProcessor[Long, Event, UserTotal] {
    @transient private var totals: ValueState[UserTotal] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[UserTotal]("totals",
        org.apache.spark.sql.Encoders.product[UserTotal], TTLConfig(ttl))

    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[UserTotal] = {
      val prev =
        if (totals.exists()) totals.get() else UserTotal(key, 0L, 0L)
      val now = rows.foldLeft(prev) { (acc, e) =>
        UserTotal(key, acc.n_events + 1,
          acc.total_cents + math.round(e.value * 100))
      }
      totals.update(now) // update resets the entry's TTL clock
      Iterator.single(now)
    }
  }

  def runningUserTotalsTtl(events: Dataset[Event],
      ttl: java.time.Duration): Dataset[UserTotal] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new TtlUserTotalsProcessor(ttl),
        TimeMode.ProcessingTime(), OutputMode.Update())
  }

  final case class SessionSummary(user_id: Long, n_events: Long,
      total_cents: Long, closed_at_ms: Long)
  final case class SessionAcc(n_events: Long, total_cents: Long,
      last_ts_ms: Long)

  /** Gap-session summaries via EVENT-TIME TIMERS: each input row extends
    * the open session and re-arms the key's single timer at
    * (last event time + gap); nothing is emitted until the WATERMARK
    * passes that expiry, at which point [[handleExpiredTimer]] emits
    * exactly ONE summary row and clears the key's state. This is the
    * timer-driven-emission shape the built-in `session_window` can't
    * express when closing needs custom logic (e.g. emit-once summaries,
    * side effects, state machines) — and because timers key off the
    * watermark, results are deterministic under replay, unlike
    * processing-time timeouts. State per key = one struct + one timer,
    * bounded by the active-session count, not stream length. */
  class SessionTimerProcessor(gapMs: Long)
      extends StatefulProcessor[Long, Event, SessionSummary] {
    @transient private var acc: ValueState[SessionAcc] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      acc = getHandle.getValueState[SessionAcc]("acc",
        org.apache.spark.sql.Encoders.product[SessionAcc], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[SessionSummary] = {
      val prev = if (acc.exists()) acc.get() else SessionAcc(0L, 0L, 0L)
      val now = rows.foldLeft(prev) { (a, e) =>
        SessionAcc(a.n_events + 1,
          a.total_cents + math.round(e.value * 100),
          math.max(a.last_ts_ms, e.ts.getTime))
      }
      // one timer per key: re-arm at the extended session's close time
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
      getHandle.registerTimer(now.last_ts_ms + gapMs)
      acc.update(now)
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionSummary] = {
      if (!acc.exists()) Iterator.empty
      else {
        val a = acc.get()
        acc.clear()
        Iterator.single(SessionSummary(key, a.n_events, a.total_cents,
          expiredTimerInfo.getExpiryTimeInMs()))
      }
    }
  }

  /** `events` must carry a watermark on `ts` (event-time timers fire as
    * the watermark advances past session close times). */
  def timerSessions(events: Dataset[Event], gapMs: Long): Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new SessionTimerProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Run a streaming query over `inputDir` into an in-memory table,
    * processing everything currently available, and return the result.
    * (Utility for tests/demos; production would use a durable sink.) */
  def runToMemory(spark: SparkSession, inputDir: String, name: String,
      transform: DataFrame => DataFrame,
      outputMode: OutputMode = OutputMode.Append()): DataFrame = {
    val q = transform(readJsonStream(spark, inputDir))
      .writeStream.format("memory").queryName(name)
      .outputMode(outputMode)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }
}
