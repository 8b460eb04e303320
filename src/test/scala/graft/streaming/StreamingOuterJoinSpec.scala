package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins the empirically-determined mechanics of the watermarked
  * stream-stream LEFT OUTER join ([[EventStreams.viewPurchaseLeftJoin]])
  * that q201's oracle relies on — the q193 playbook: discover the
  * engine's eviction/emission behavior with discriminator probes FIRST,
  * then write the oracle against the pinned contract.
  *
  * Window = 1h on purchases ([v_ts, v_ts + 1h]), watermark delay = 1h,
  * drains = one arrival file + one processAllAvailable. Pinned:
  *
  *  1. matched pairs emit in the drain delivering the LATER side —
  *     identical to the inner join (q160);
  *  2. an unmatched view null-emits only once the watermark is
  *     STRICTLY past `v_ts + 1h`; the exact tie `wm == v_ts + 1h`
  *     HOLDS the state (discriminated at ±1 s);
  *  3. the null row is produced by the first batch RUNNING WITH the
  *     advanced watermark — an ASYNC no-data micro-batch that
  *     `processAllAvailable` does NOT wait for (the probe that found
  *     this: a 2-drain timeline whose emission appeared only when a
  *     third drain gave the async batch time to run). Batches are
  *     strictly sequential, so the next DATA batch is the
  *     deterministic flush: anything evicted by watermark W is on
  *     disk before a later data batch's processAllAvailable returns.
  *     Harnesses (and q201) therefore end with watermark-pusher
  *     arrivals rather than sleeps;
  *  4. a view that null-emitted never emits again — a late in-window
  *     purchase arrives below the watermark and is dropped;
  *  5. a view that matched never null-emits, regardless of how far
  *     the watermark later advances.
  *
  * (Degenerate corner, deliberately unpinned: a left row at event time
  * epoch 0 exactly was observed never to null-emit; 1970-01-01
  * timestamps don't occur in any data path.)
  */
class StreamingOuterJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  /** Drive the left-outer join over an explicit drain timeline.
    * Arrivals: (eventId, userId, type, tsSec). Returns emitted rows as
    * (drain, userId, viewId, purchaseId: -1 = null row). Null-row drain
    * labels are NOT deterministic (mechanic 3: the async no-data batch
    * may run before or after the next drain's label is set), so tests
    * assert on them with ranges or ignore them. */
  private def run(drains: Seq[Seq[(Long, Long, String, Long)]])
      : Seq[(Int, Long, Long, Long)] = {
    val dir = java.nio.file.Files.createTempDirectory("soj_pin").toString
    val srcDir = s"$dir/in"
    def arrive(rows: Seq[(Long, Long, String, Long)]): Unit =
      rows.map { case (id, u, tp, t) => (id, u, tp, ts(t), 1.0) }
        .toDF("event_id", "user_id", "event_type", "ts", "value")
        .coalesce(1).write.mode("append")
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
        .json(srcDir)
    arrive(drains.head)
    val drain = new java.util.concurrent.atomic.AtomicInteger(0)
    val got = scala.collection.mutable.ArrayBuffer[(Int, Long, Long, Long)]()
    val src = spark.readStream
      .schema("event_id LONG, user_id LONG, event_type STRING, " +
        "ts TIMESTAMP, value DOUBLE")
      .json(srcDir)
    val q = EventStreams.viewPurchaseLeftJoin(src)
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (out: DataFrame, _: Long) =>
        val d = drain.get()
        out.collect().foreach { r =>
          got.synchronized {
            got += ((d, r.getLong(0), r.getLong(1),
              if (r.isNullAt(2)) -1L else r.getLong(2)))
          }
        }
        ()
      }
      .start()
    try {
      q.processAllAvailable()
      drains.tail.zipWithIndex.foreach { case (b, i) =>
        drain.set(i + 1); arrive(b); q.processAllAvailable()
      }
    } finally q.stop()
    got.toSeq.sorted
  }

  private val B = 100000L // non-epoch-zero base for every timeline
  private val H = 3600L

  test("matched pairs emit like inner, in the later side's drain") {
    val got = run(Seq(
      Seq((101L, 1L, "view", B + 1000L), (201L, 1L, "purchase", B + 2000L)),
      Seq((104L, 4L, "view", B + 1500L)),
      Seq((204L, 4L, "purchase", B + 2500L)),
      // flush far past every horizon: matched views must NOT null-emit
      Seq((209L, 9L, "purchase", B + 50000L)),
      Seq((210L, 9L, "purchase", B + 50001L))))
    assert(got.map(r => (r._2, r._3, r._4)).toSet ==
      Set((1L, 101L, 201L), (4L, 104L, 204L)), s"got $got")
    assert(got.find(_._3 == 101L).get._1 == 0, "in-drain match emits at 0")
    assert(got.find(_._3 == 104L).get._1 == 2, "cross-drain match at 2")
  }

  test("boundary: wm == v_ts + 1h HOLDS; wm one second past null-emits") {
    // tie: purchase pushes wm exactly to the view's horizon, flush
    // batch at the same wm forces any pending eviction output out
    val tie = run(Seq(
      Seq((102L, 2L, "view", B + 1000L)),
      Seq((208L, 8L, "purchase", B + 1000L + 2 * H)),      // wm = horizon
      Seq((209L, 9L, "purchase", B + 1000L + 2 * H))))     // flush, same wm
    assert(tie == Seq(), s"tie must hold state, got $tie")
    val past = run(Seq(
      Seq((102L, 2L, "view", B + 1000L)),
      Seq((208L, 8L, "purchase", B + 1001L + 2 * H)),      // wm = horizon+1
      Seq((209L, 9L, "purchase", B + 1001L + 2 * H))))     // flush
    assert(past.map(r => (r._2, r._3, r._4)) == Seq((2L, 102L, -1L)),
      s"strictly-past must null-emit exactly once, got $past")
  }

  test("a null-emitted view never re-emits; late purchases are dropped") {
    val got = run(Seq(
      Seq((101L, 1L, "view", B + 1000L), (102L, 2L, "view", B + 1000L),
        (201L, 1L, "purchase", B + 2000L)),
      Seq((209L, 9L, "purchase", B + 10000L)), // wm 6400 > 4600: evict V2
      // late in-window purchase for V2 (below wm): must emit NOTHING
      Seq((202L, 2L, "purchase", B + 3000L),
        (210L, 9L, "purchase", B + 10001L)),
      Seq((211L, 9L, "purchase", B + 10002L))))
    assert(got.map(r => (r._2, r._3, r._4)).toSet ==
      Set((1L, 101L, 201L), (2L, 102L, -1L)), s"got $got")
  }
}
