package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming semantics pinned via batch/stream parity: the same
  * transform over the same rows must agree between `spark.read` and
  * `spark.readStream` (file source, AvailableNow trigger). */
class EventStreamsSpec extends SparkSpec {
  import spark.implicits._

  // events at sf0.001 re-written as JSON-lines so the file stream can
  // tail the directory with an explicit schema
  private lazy val jsonDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("events_json").toString
    Tables.events(spark, "/root/testdata/sf0.001")
      .coalesce(2).write.mode("overwrite").json(dir)
    dir
  }
  private lazy val batchEvents =
    spark.read.schema(EventStreams.eventSchema).json(jsonDir)

  test("hourly counts: stream (complete mode) equals batch") {
    val streamed = EventStreams.runToMemory(spark, jsonDir, "hourly",
      EventStreams.hourlyCounts, OutputMode.Complete())
      .as[(java.sql.Timestamp, String, Long, Long)].collect().toSet
    val batch = EventStreams.hourlyCounts(batchEvents)
      .as[(java.sql.Timestamp, String, Long, Long)].collect().toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("log2 value histogram: streaming state equals the batch sketch") {
    val streamed = EventStreams.runToMemory(spark, jsonDir, "histo",
      EventStreams.valueHistograms, OutputMode.Complete())
      .as[(String, Int, Long)].collect().toSet
    val batch = EventStreams.valueHistograms(batchEvents)
      .as[(String, Int, Long)].collect().toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
    // bounded state: ≤65 bins per event type
    assert(batch.groupBy(_._1).values.forall(_.size <= 65))
  }

  test("stream-static enrichment join: stream equals batch") {
    val tiers = spark.range(0, 1000)
      .selectExpr("id AS user_id",
        "CASE pmod(id, 3) WHEN 0 THEN 'gold' WHEN 1 THEN 'silver' ELSE 'bronze' END AS tier")
    val streamed = EventStreams.runToMemory(spark, jsonDir, "enriched",
      EventStreams.enrichedTotals(_, tiers), OutputMode.Complete())
      .as[(String, Long, Long)].collect().toSet
    val batch = EventStreams.enrichedTotals(batchEvents, tiers)
      .as[(String, Long, Long)].collect().toSet
    assert(streamed == batch)
    assert(batch.map(_._2).sum == batchEvents.count())
  }

  test("anomaly flags: stream equals batch; agree with the batch rule") {
    val stats = graft.operators.Anomaly.madOutlierStats(
      batchEvents.select(col("event_type"),
        round(col("value") * 100, 0).cast("long").as("c")),
      "event_type", col("c"), k = 5L)
    def proj(df: org.apache.spark.sql.DataFrame) =
      EventStreams.anomalyFlags(df, stats, k = 5L)
        .select(col("event_id"), col("is_anom"))
    val streamed = proj(EventStreams.readJsonStream(spark, jsonDir))
    val q = streamed.writeStream.format("memory").queryName("anom")
      .outputMode(OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val fromStream = spark.table("anom")
      .as[(Long, Boolean)].collect().toSet
    val fromBatch = proj(batchEvents).as[(Long, Boolean)].collect().toSet
    assert(fromStream == fromBatch)
    // the flag population matches the aggregate counts from the batch op
    val nFlagged = fromBatch.count(_._2).toLong
    val nAgg = stats.agg(sum("n_anom")).as[Long].head()
    assert(nFlagged == nAgg && nAgg > 0L)
  }

  test("sliding windows: stream equals batch; events land in 4 overlapping windows") {
    val streamed = EventStreams.runToMemory(spark, jsonDir, "sliding",
      EventStreams.slidingCounts, OutputMode.Complete())
      .as[(java.sql.Timestamp, String, Long)].collect()
    val batch = EventStreams.slidingCounts(batchEvents)
      .as[(java.sql.Timestamp, String, Long)].collect()
    assert(streamed.toSet == batch.toSet)
    // overlap factor: each event is counted span/slide = 4 times
    val total = batch.map(_._3).sum
    assert(total == batchEvents.count() * 4)
  }

  test("session windows: stream equals batch") {
    val streamed = EventStreams.runToMemory(spark, jsonDir, "sessions",
      EventStreams.sessionWindows, OutputMode.Complete())
      .as[(java.sql.Timestamp, Long, Long, Long)].collect().toSet
    val batch = EventStreams.sessionWindows(batchEvents)
      .as[(java.sql.Timestamp, Long, Long, Long)].collect().toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("session windows merge events within the 30-min gap") {
    val sessions = EventStreams.sessionWindows(batchEvents)
    val perUser = sessions.groupBy("user_id").count()
    val events = batchEvents.groupBy("user_id").count()
    // sessionization can only reduce or keep the per-user row count
    val joined = perUser.as("s").join(events.as("e"), "user_id")
      .filter($"s.count" > $"e.count").count()
    assert(joined == 0)
  }

  test("stream-stream interval join equals batch interval join") {
    def split(df: org.apache.spark.sql.DataFrame) =
      (df.filter($"event_type" === "click"),
        df.filter($"event_type" === "purchase"))
    val (bc, bp) = split(batchEvents)
    val batch = EventStreams.clickToPurchase(bc, bp)
      .as[(Long, Long, Long, Long)].collect().toSet
    val stream = EventStreams.readJsonStream(spark, jsonDir)
    val (sc, sp) = split(stream)
    val q = EventStreams.clickToPurchase(sc, sp)
      .writeStream.format("memory").queryName("c2p")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("c2p")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("streaming dedup drops within-watermark duplicates") {
    // duplicate the whole corpus into a second file set
    val dupDir = java.nio.file.Files.createTempDirectory("events_dup").toString
    val base = spark.read.schema(EventStreams.eventSchema).json(jsonDir)
    base.write.mode("overwrite").json(dupDir)
    base.write.mode("append").json(dupDir)
    val streamed = EventStreams.runToMemory(spark, dupDir, "deduped",
      EventStreams.dedupedEvents)
    assert(streamed.count() == base.count())
    assert(spark.read.schema(EventStreams.eventSchema).json(dupDir).count()
      == 2 * base.count())
  }

  test("mapGroupsWithState accumulates per-user running totals") {
    val ds = batchEvents.as[EventStreams.Event]
    val totals = EventStreams.runningUserTotals(ds)
      .collect().map(t => t.user_id -> t).toMap
    val expected = batchEvents.groupBy($"user_id")
      .agg(count(lit(1)).as("n"),
        sum(round($"value" * 100, 0).cast("long")).as("cents"))
      .as[(Long, Long, Long)].collect()
    assert(expected.nonEmpty)
    expected.foreach { case (uid, n, cents) =>
      assert(totals(uid).n_events == n)
      assert(totals(uid).total_cents == cents)
    }
  }

  test("transformWithState (RocksDB) matches mapGroupsWithState totals") {
    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = EventStreams.readJsonStream(spark, jsonDir)
        .as[EventStreams.Event]
      val q = EventStreams.runningUserTotalsTws(stream)
        .writeStream.format("memory").queryName("tws_totals")
        .outputMode("update")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // update mode appends one row per (user, batch); the final state
      // per user is the row with the highest event count
      val finals = spark.table("tws_totals")
        .as[(Long, Long, Long)].collect()
        .groupBy(_._1).map { case (u, rows) => u -> rows.maxBy(_._2) }
      val expected = EventStreams.runningUserTotals(
        batchEvents.as[EventStreams.Event])
        .collect().map(t => t.user_id -> t).toMap
      assert(finals.keySet == expected.keySet)
      finals.foreach { case (u, (_, n, cents)) =>
        assert(n == expected(u).n_events && cents == expected(u).total_cents,
          s"user $u")
      }
    } finally prevProvider match {
      case Some(v) =>
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None =>
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("flatMapGroupsWithState emits each spending milestone exactly once") {
    // values are non-negative, so per-user totals are monotone: every
    // 10000-cent milestone <= the final total must be emitted exactly
    // once, regardless of micro-batch boundaries or arrival order
    val stream = EventStreams.readJsonStream(spark, jsonDir)
      .as[EventStreams.Event]
    val q = EventStreams.spendingMilestones(stream)
      .writeStream.format("memory").queryName("milestones")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("milestones")
      .as[(Long, Long)].collect().toSeq
    assert(streamed.size == streamed.toSet.size, "duplicate milestone emitted")
    val expected = batchEvents.groupBy($"user_id")
      .agg(sum(round($"value" * 100, 0).cast("long")).as("cents"))
      .as[(Long, Long)].collect()
      .flatMap { case (uid, cents) =>
        (1L to cents / 10000L).map(m => (uid, m * 10000L))
      }.toSet
    assert(streamed.toSet == expected)
    assert(expected.nonEmpty)
  }

  test("stream-stream join: buffered view matches a LATER-batch purchase") {
    // q160's sf0.01 timeline has no cross-boundary pair, so the
    // state-carry semantics — a view buffered in join state matching a
    // purchase that arrives in a later micro-batch — is pinned here
    // with constructed data. Also pins eviction: a view whose whole
    // join window predates (watermark − margin) must NOT match.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx = spark.sqlContext
    def ev(id: Long, t: String, user: Long, typ: String) =
      EventStreams.Event(id, java.sql.Timestamp.valueOf(t), user, typ,
        1.0, "{}")
    val in = MemoryStream[EventStreams.Event]
    val q = EventStreams.viewPurchaseJoin(in.toDS().toDF())
      .writeStream.format("memory").queryName("ss_join")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    def rows(): Set[(Long, Long)] = spark.table("ss_join")
      .select(col("view_id"), col("purchase_id"))
      .as[(Long, Long)].collect().toSet
    try {
      // batch 1: two views; no purchases yet — nothing emits
      in.addData(ev(1, "2026-01-01 10:00:00", 7, "view"),
        ev(2, "2026-01-01 10:20:00", 7, "view"))
      q.processAllAvailable()
      assert(rows().isEmpty)
      // batch 2: purchase at 10:30 — joins BOTH buffered views (each
      // within its 1h window); same-batch view+purchase also pairs
      in.addData(ev(3, "2026-01-01 10:30:00", 7, "purchase"),
        ev(4, "2026-01-01 10:29:00", 7, "view"))
      q.processAllAvailable()
      assert(rows() == Set((1L, 3L), (2L, 3L), (4L, 3L)))
      // batch 3: advance watermark far ahead, evicting all state …
      in.addData(ev(5, "2026-01-01 20:00:00", 9, "view"))
      q.processAllAvailable()
      // … batch 4: a purchase inside view-1's window arrives LATE
      // (behind the watermark): the view is gone — no new pair
      in.addData(ev(6, "2026-01-01 10:40:00", 7, "purchase"))
      q.processAllAvailable()
      assert(rows() == Set((1L, 3L), (2L, 3L), (4L, 3L)))
    } finally q.stop()
  }
}
