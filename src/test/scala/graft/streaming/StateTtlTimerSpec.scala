package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** transformWithState timers + TTL semantics on the RocksDB provider:
  * - event-time timers fire exactly once per armed key when the
  *   WATERMARK (not wall clock) passes the expiry — deterministic under
  *   replay, pinned batch by batch;
  * - TTL state evicts idle keys by wall clock, so a long-idle key
  *   restarts from zero while an in-TTL key keeps its total.
  */
class StateTtlTimerSpec extends SparkSpec {
  import spark.implicits._

  private def withRocksDb[A](f: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try f finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private def ts(s: String): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(s)

  private def ev(id: Long, t: String, user: Long, value: Double) =
    EventStreams.Event(id, ts(t), user, "click", value, "{}")

  test("event-time timers close gap sessions as the watermark advances") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val in = MemoryStream[EventStreams.Event]
      val sessions = EventStreams.timerSessions(
        in.toDS().withWatermark("ts", "10 seconds"), gapMs = 60000L)
      val q = sessions.writeStream.format("memory").queryName("timer_sessions")
        .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
      def rows(): Set[(Long, Long, Long, Long)] =
        spark.table("timer_sessions")
          .as[(Long, Long, Long, Long)].collect().toSet
      try {
        // batch 1: user 1 (2 events, last 10:00:30), user 2 (1 event)
        in.addData(ev(1, "2026-01-01 10:00:00", 1, 1.0),
          ev(2, "2026-01-01 10:00:30", 1, 2.5),
          ev(3, "2026-01-01 10:00:00", 2, 4.0))
        q.processAllAvailable()
        // timers armed (10:01:30 / 10:01:00) but watermark is behind
        assert(rows().isEmpty, "no session may close before the watermark")

        // batch 2: user 3 event at 10:05 -> post-batch watermark 10:04:50,
        // but DURING batch 2 the operative watermark is still batch 1's
        in.addData(ev(4, "2026-01-01 10:05:00", 3, 1.0))
        q.processAllAvailable()

        // batch 3: watermark 10:04:50 now in force -> users 1 and 2 close
        in.addData(ev(5, "2026-01-01 10:05:10", 3, 1.0))
        q.processAllAvailable()
        val afterB3 = rows()
        assert(afterB3.map(r => (r._1, r._2, r._3)) ==
          Set((1L, 2L, 350L), (2L, 1L, 400L)))
        // close timestamps are event-derived: last event + 60s gap
        assert(afterB3.map(_._4) ==
          Set(ts("2026-01-01 10:01:30").getTime, ts("2026-01-01 10:01:00").getTime))

        // batch 4: advance the watermark past user 3's rearmed timer
        // (10:06:10): both user-3 events folded into ONE session — the
        // second event re-armed the first's timer rather than emitting
        in.addData(ev(6, "2026-01-01 10:30:00", 9, 1.0))
        q.processAllAvailable()
        in.addData(ev(7, "2026-01-01 10:31:00", 9, 1.0))
        q.processAllAvailable()
        assert(rows().map(r => (r._1, r._2, r._3)).contains((3L, 2L, 200L)))
        // exactly-once per session: no duplicate closes for users 1/2
        assert(rows().count(_._1 == 1L) == 1)
        assert(rows().count(_._1 == 2L) == 1)
      } finally q.stop()
    }
  }

  test("a timer whose expiry EQUALS the watermark fires (ties fire)") {
    // q151's oracle closes sessions with `last_ts + gap <= watermark`;
    // this pins the `<=` (vs `<`) against the engine. User 1 arms a
    // timer at exactly 10:01:00.000; user 2's event at 10:01:10 with a
    // 10s delay puts the watermark at exactly 10:01:00.000.
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val in = MemoryStream[EventStreams.Event]
      val sessions = EventStreams.timerSessions(
        in.toDS().withWatermark("ts", "10 seconds"), gapMs = 60000L)
      val q = sessions.writeStream.format("memory").queryName("timer_tie")
        .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
      try {
        in.addData(ev(1, "2026-01-01 10:00:00", 1, 1.0))
        q.processAllAvailable()
        in.addData(ev(2, "2026-01-01 10:01:10", 2, 1.0))
        q.processAllAvailable()
        val atTie = spark.table("timer_tie")
          .as[(Long, Long, Long, Long)].collect().toSet
        assert(atTie == Set((1L, 1L, 100L,
          ts("2026-01-01 10:01:00").getTime)),
          "expiry == watermark must FIRE, and nothing else may close")
      } finally q.stop()
    }
  }

  test("TTL state: idle key restarts from zero, in-TTL key keeps its total") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      // Phased queries against a shared checkpoint instead of a
      // long-lived ProcessingTime(0) query: a ProcessingTime-mode
      // transformWithState query NEVER quiesces — TTL needs periodic
      // evaluation, so `shouldRunAnotherBatch` is permanently true and
      // both processAllAvailable and AvailableNow termination livelock
      // (observed: suite hung here 30+ min). Each phase emits through
      // foreachBatch (the one sink that supports checkpoint recovery),
      // polls for its expected emission, and force-stops; the wall
      // clock advances between phases, which is what TTL keys off.
      def phase(in: MemoryStream[EventStreams.Event],
          got: java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Long)],
          ttl: java.time.Duration, ckpt: String, expectRows: Int): Unit = {
        // rows surface DURING the batch, but the offset commit lands
        // AFTER foreachBatch returns — stop() before the commit file
        // exists and the next phase would replay the batch. Wait for
        // both the rows and a NEW entry in the commit log.
        def commits(): Int = {
          val d = new java.io.File(s"$ckpt/commits")
          if (!d.exists()) 0
          else d.listFiles().count(f => f.getName.forall(_.isDigit))
        }
        val commitsBefore = commits()
        val q = EventStreams.runningUserTotalsTtl(in.toDS(), ttl)
          .writeStream
          .option("checkpointLocation", ckpt)
          .outputMode("update")
          .foreachBatch {
            (batch: org.apache.spark.sql.Dataset[EventStreams.UserTotal],
                _: Long) =>
              batch.collect().foreach(u =>
                got.add((u.user_id, u.n_events, u.total_cents)))
          }
          .trigger(Trigger.AvailableNow()).start()
        try {
          val deadline = System.currentTimeMillis() + 120000
          while ((got.size < expectRows || commits() <= commitsBefore) &&
              System.currentTimeMillis() < deadline)
            Thread.sleep(100)
          assert(got.size >= expectRows, s"phase never emitted $expectRows rows")
          assert(commits() > commitsBefore, "phase never committed its batch")
        } finally q.stop()
      }
      def newBuf() =
        new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Long)]()
      import scala.jdk.CollectionConverters._
      val ckS = java.nio.file.Files.createTempDirectory("ttl_s").toString
      val ckL = java.nio.file.Files.createTempDirectory("ttl_l").toString
      // short-TTL stream: user idle > 2s loses the running total
      val inShort = MemoryStream[EventStreams.Event]
      // long-TTL control: same feed pattern, TTL 1h -> total survives
      val inLong = MemoryStream[EventStreams.Event]

      val s1 = newBuf(); val l1 = newBuf()
      inShort.addData(ev(1, "2026-01-01 10:00:00", 7, 1.0),
        ev(2, "2026-01-01 10:00:01", 7, 2.0))
      phase(inShort, s1, java.time.Duration.ofSeconds(2), ckS, 1)
      inLong.addData(ev(1, "2026-01-01 10:00:00", 7, 1.0),
        ev(2, "2026-01-01 10:00:01", 7, 2.0))
      phase(inLong, l1, java.time.Duration.ofHours(1), ckL, 1)
      assert(s1.asScala.toSet == Set((7L, 2L, 300L)))
      assert(l1.asScala.toSet == Set((7L, 2L, 300L)))

      Thread.sleep(3500) // > short TTL, << long TTL

      val s2 = newBuf(); val l2 = newBuf()
      inShort.addData(ev(3, "2026-01-01 10:00:02", 7, 1.0))
      phase(inShort, s2, java.time.Duration.ofSeconds(2), ckS, 1)
      inLong.addData(ev(3, "2026-01-01 10:00:02", 7, 1.0))
      phase(inLong, l2, java.time.Duration.ofHours(1), ckL, 1)
      // after the idle gap the short-TTL state was evicted -> restart
      // (7, 1, 100), while the long-TTL control accumulated -> (7, 3, 400)
      assert(s2.asScala.toSet == Set((7L, 1L, 100L)))
      assert(l2.asScala.toSet == Set((7L, 3L, 400L)))
    }
  }
}
