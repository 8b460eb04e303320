package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Pins the empirically-determined mechanics of the CHAINED stateful
  * pipeline ([[EventStreams.dedupedHourlyCounts]]: watermarked
  * `dropDuplicatesWithinWatermark` → tumbling hourly aggregate, two
  * stateful operators in ONE append-mode query) that q205's oracle
  * relies on — the q193/q201 playbook: discover the engine's behavior
  * with discriminator probes FIRST, then write the oracle against the
  * pinned contract.
  *
  * Watermark delay = 10 min, window = 1h, drains = one arrival file +
  * one processAllAvailable. Pinned below:
  *
  *  1. duplicates of a key drop whether they arrive in the SAME
  *     micro-batch or a LATER one while the key is still within the
  *     watermark horizon — the deduped row feeds the aggregate once;
  *  2. a window emits once the watermark REACHES its end: the exact
  *     tie `wm == window end` EMITS (discriminated at ±1 s) — the
  *     aggregate's close convention is `wm ≥ end`, the OPPOSITE tie
  *     convention from the stream-stream outer join's null-emission
  *     (strictly past, StreamingOuterJoinSpec pin 2). The two stateful
  *     families do not share a boundary rule; harnesses must pin each;
  *  3. emission rides a batch AFTER the watermark-advancing one (the
  *     async no-data batch `processAllAvailable` does not await), so
  *     harnesses end with TWO pusher arrivals: one to advance the
  *     watermark, one as the sequential data-batch barrier;
  *  4. a duplicate whose key EXPIRED from the dedup state (watermark
  *     passed first-arrival ts + delay) is RE-ADMITTED and counts
  *     again — the documented horizon contract that q205's timeline
  *     avoids by keeping duplicates inside their original drain.
  */
class ChainedStatefulSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  /** Drive the chained query over an explicit drain timeline.
    * Arrivals: (eventId, type, tsSec, value). Returns finalized rows
    * (hourStartSec, type, n, cents), sentinel-typed rows excluded. */
  private def run(drains: Seq[Seq[(Long, String, Long, Double)]])
      : Set[(Long, String, Long, Long)] = {
    val dir = java.nio.file.Files.createTempDirectory("chain_pin").toString
    val srcDir = s"$dir/in"
    def arrive(rows: Seq[(Long, String, Long, Double)]): Unit =
      rows.map { case (id, tp, t, v) => (id, 7L, tp, ts(t), v) }
        .toDF("event_id", "user_id", "event_type", "ts", "value")
        .coalesce(1).write.mode("append")
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
        .json(srcDir)
    arrive(drains.head)
    val got = scala.collection.mutable.ArrayBuffer[(Long, String, Long, Long)]()
    val src = spark.readStream
      .schema("event_id LONG, user_id LONG, event_type STRING, " +
        "ts TIMESTAMP, value DOUBLE")
      .json(srcDir)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try {
      val q = EventStreams.dedupedHourlyCounts(src)
        .writeStream.outputMode("append")
        .option("checkpointLocation", s"$dir/ckpt")
        .foreachBatch { (out: DataFrame, _: Long) =>
          out.collect().foreach { r =>
            got.synchronized {
              got += ((r.getTimestamp(0).getTime / 1000L, r.getString(1),
                r.getLong(2), r.getLong(3)))
            }
          }
          ()
        }
        .start()
      try {
        q.processAllAvailable()
        drains.tail.foreach { d => arrive(d); q.processAllAvailable() }
      } finally q.stop()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    got.synchronized(got.toSet).filterNot(_._2 == "sentinel")
  }

  private def pusher(id: Long, sec: Long): (Long, String, Long, Double) =
    (id, "sentinel", sec, 0.0)

  test("pin 1: in-batch and in-horizon duplicates feed the aggregate " +
      "exactly once") {
    // hour window [3600, 7200): id1 arrives twice in drain 0, id2 once;
    // drain 1 re-delivers id2 (ts 5000 ≥ wm 4400, key still in state)
    val got = run(Seq(
      Seq((1L, "view", 4000L, 2.0), (1L, "view", 4000L, 2.0),
        (2L, "view", 5000L, 3.0)),
      Seq((2L, "view", 5000L, 3.0)),
      Seq(pusher(90L, 100000L)),
      Seq(pusher(91L, 100001L))))
    assert(got == Set((3600L, "view", 2L, 500L)))
  }

  test("pin 2: the exact tie wm == window end EMITS; -1 s holds " +
      "(aggregate closes at wm >= end — NOT the outer join's strict >)") {
    // window [3600, 7200): wm = max event ts − 600
    val below = run(Seq(
      Seq((1L, "view", 4000L, 1.0)),
      Seq(pusher(90L, 7799L)),
      Seq(pusher(91L, 7799L))))
    assert(below.isEmpty, s"wm 7199 < end must hold, emitted: $below")
    val tie = run(Seq(
      Seq((1L, "view", 4000L, 1.0)),
      Seq(pusher(90L, 7800L)),
      Seq(pusher(91L, 7800L))))
    assert(tie == Set((3600L, "view", 1L, 100L)),
      s"wm == end must emit (observed convention), got: $tie")
  }

  test("pin 4: a duplicate past the dedup horizon is re-admitted and " +
      "counts again") {
    // id4 first at 4000; pusher advances wm to 5000 > 4600 = 4000+600,
    // expiring the key; the redelivery at 6000 (same window!) is then
    // re-admitted — the aggregate sees the key twice
    val got = run(Seq(
      Seq((4L, "view", 4000L, 1.0)),
      Seq(pusher(90L, 5600L)),
      Seq((4L, "view", 6000L, 1.0)),
      Seq(pusher(91L, 100000L)),
      Seq(pusher(92L, 100001L))))
    assert(got == Set((3600L, "view", 2L, 200L)),
      s"expired-key redelivery must count again, got: $got")
  }
}
