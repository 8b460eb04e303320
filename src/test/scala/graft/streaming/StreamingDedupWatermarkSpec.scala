package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins the empirically-determined mechanics of
  * `dropDuplicatesWithinWatermark` that the q193 oracle replays.
  * These are CONTRACTS, not implementation trivia: each one changes
  * which rows a downstream consumer sees, so a Spark upgrade that
  * moves any of them must fail here first (the q151 fire-on-tie
  * pattern, applied to dedup eviction).
  *
  * Mechanics pinned (D = watermark delay, drains = one file + one
  * processAllAvailable each, which includes the trailing no-data
  * micro-batch that commits the post-drain watermark):
  *  1. eviction is visible at the NEXT drain: state admitted at event
  *     time `a` is alive iff a + D > W, with W = max(event time seen
  *     in prior drains) - D — the no-data batch evicts with the
  *     watermark INCLUDING the drain that just ran;
  *  2. an exact tie (a + D == W) EVICTS;
  *  3. a dropped duplicate does NOT refresh the stored expiry;
  *  4. a re-admitted key is RE-EMITTED (eviction is observable output).
  */
class StreamingDedupWatermarkSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  /** Drive a dedup stream over an explicit drain timeline; returns
    * (drain, key, ts-seconds) of every emitted row. */
  private def run(drains: Seq[Seq[(Long, Long)]],
      delaySec: Long): Seq[(Int, Long, Long)] = {
    val dir = java.nio.file.Files.createTempDirectory("wm_pin").toString
    val srcDir = s"$dir/in"
    def arrive(rows: Seq[(Long, Long)]): Unit =
      rows.map { case (k, t) => (k, ts(t)) }.toDF("k", "ts")
        .coalesce(1).write.mode("append")
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
        .json(srcDir)
    arrive(drains.head)
    val drain = new java.util.concurrent.atomic.AtomicInteger(0)
    val got = scala.collection.mutable.ArrayBuffer[(Int, Long, Long)]()
    val q = spark.readStream
      .schema("k LONG, ts TIMESTAMP").json(srcDir)
      .withWatermark("ts", s"$delaySec seconds")
      .dropDuplicatesWithinWatermark("k")
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (out: DataFrame, _: Long) =>
        val d = drain.get()
        out.collect().foreach { r =>
          got.synchronized {
            got += ((d, r.getLong(0), r.getTimestamp(1).getTime / 1000L))
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

  test("eviction visible at the next drain; re-admission re-emits") {
    // k1@100 (expiry 110); drain1's k9@200 pushes W to 190 and the
    // trailing no-data batch evicts k1 BEFORE drain2's lookup, so
    // k1@201 re-emits; its fresh state (expiry 211 > W=191) then drops
    // the drain3 duplicate.
    val got = run(Seq(
      Seq((1L, 100L)),
      Seq((9L, 200L)),
      Seq((1L, 201L)),
      Seq((1L, 202L))), delaySec = 10L)
    assert(got == Seq((0, 1L, 100L), (1, 9L, 200L), (2, 1L, 201L)))
  }

  test("a dropped duplicate does not refresh the stored expiry") {
    // k2 admitted @100 (expiry 110). drain1: dup k2@195 dropped (state
    // alive at W=90) alongside k9@200 -> post-drain W=190. A refresh
    // would have moved k2's expiry to 205 > 190 and kept it; the pinned
    // behavior evicts (110 <= 190), so k2@205 re-emits at drain2.
    val got = run(Seq(
      Seq((2L, 100L)),
      Seq((2L, 195L), (9L, 200L)),
      Seq((2L, 205L))), delaySec = 10L)
    assert(got == Seq((0, 2L, 100L), (1, 9L, 200L), (2, 2L, 205L)))
  }

  test("exact expiry == watermark tie EVICTS") {
    // k3@100 (expiry 110); drain1's k9@120 sets W = 110 exactly. If the
    // tie kept state, k3@111 would be dropped; pinned behavior evicts.
    val got = run(Seq(
      Seq((3L, 100L)),
      Seq((9L, 120L)),
      Seq((3L, 111L))), delaySec = 10L)
    assert(got == Seq((0, 3L, 100L), (1, 9L, 120L), (2, 3L, 111L)))
  }

  test("state alive within the horizon drops duplicates across drains") {
    // watermark never passes k4's expiry: duplicates stay dropped
    val got = run(Seq(
      Seq((4L, 100L)),
      Seq((4L, 101L), (9L, 102L)),
      Seq((4L, 103L))), delaySec = 100L)
    assert(got == Seq((0, 4L, 100L), (1, 9L, 102L)))
  }

  test("batch/stream parity: dedupedEvents on a no-eviction horizon") {
    // EventStreams.dedupedEvents: the batch form is plain
    // dropDuplicates; with a horizon wider than the data's time range
    // the streaming form must keep exactly one row per event_id too.
    val dir = java.nio.file.Files.createTempDirectory("dedup_par").toString
    val base = (1 to 50).map(i =>
      (i.toLong % 10L, ts(1000L + i), i.toLong, "t", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .select(col("event_id") % 10, col("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    base.write.mode("overwrite")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      .json(dir)
    val batchKeys = EventStreams.dedupedEvents(
        spark.read.schema(EventStreams.eventSchema).json(dir))
      .select("event_id").as[Long].collect().sorted.toSeq
    val streamed = EventStreams.runToMemory(spark, dir, "wm_parity",
      EventStreams.dedupedEvents)
    val streamKeys =
      streamed.select("event_id").as[Long].collect().sorted.toSeq
    assert(streamKeys == batchKeys && batchKeys == (0L to 9L))
  }
}
