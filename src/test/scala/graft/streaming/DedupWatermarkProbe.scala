package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** TEMPORARY probe (deleted after reading): empirically determine
  * dropDuplicatesWithinWatermark's eviction mechanics before writing
  * the q193 oracle. */
class DedupWatermarkProbe extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  // drive a dedup stream over an explicit batch timeline; returns
  // (batchId, key, ts-seconds) of every EMITTED row
  private def run(batches: Seq[Seq[(Long, Long)]], delaySec: Long): Seq[(Long, Long, Long)] = {
    val dir = java.nio.file.Files.createTempDirectory("wm_probe").toString
    val srcDir = s"$dir/in"
    def arrive(rows: Seq[(Long, Long)]): Unit =
      rows.map { case (k, t) => (k, ts(t)) }.toDF("k", "ts")
        .coalesce(1).write.mode("append")
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
        .json(srcDir)
    arrive(batches.head)
    val got = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
    val q = spark.readStream
      .schema("k LONG, ts TIMESTAMP").json(srcDir)
      .withWatermark("ts", s"$delaySec seconds")
      .dropDuplicatesWithinWatermark("k")
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (out: DataFrame, bid: Long) =>
        out.collect().foreach { r =>
          got.synchronized { got += ((bid, r.getLong(0),
            r.getTimestamp(1).getTime / 1000L)) }
        }
        ()
      }
      .start()
    try {
      q.processAllAvailable()
      batches.tail.foreach { b => arrive(b); q.processAllAvailable() }
    } finally q.stop()
    got.toSeq.sorted
  }

  test("probe: eviction lag, boundary, refresh") {
    val D = 10L
    // A: eviction lag — expired-but-not-yet-removed state still dedups?
    // b0: k1@100 (expiry 110). b1: k9@200 (wm during b1 = 90; end-of-b1
    // eviction wm=90 keeps k1? or post-b1 wm=190 removes it?).
    // b2: k1@201 — re-admitted iff k1 removed by b1's end.
    // b3: k1@202 — re-admitted iff removed by b2's end.
    val a = run(Seq(
      Seq((1L, 100L)),
      Seq((9L, 200L)),
      Seq((1L, 201L)),
      Seq((1L, 202L))), D)
    println(s"PROBE A: $a")

    // B: duplicate refresh — does a DROPPED duplicate extend expiry?
    // b0: k2@100 (expiry 110), k8@100. b1: dup k2@195 + k9@200
    //     (wm during b1 = 90 -> dup dropped; refresh would set expiry 205)
    // b2: k7@300 (wm during b2 = 190; removes k2 iff expiry 110<190 i.e.
    //     no refresh)
    // b3: dup k2@301 -> emitted iff no refresh
    val b = run(Seq(
      Seq((2L, 100L), (8L, 100L)),
      Seq((2L, 195L), (9L, 200L)),
      Seq((7L, 300L)),
      Seq((2L, 301L))), D)
    println(s"PROBE B: $b")

    // C: exact tie — expiry == eviction watermark: removed or kept?
    // b0: k3@100 (expiry 110). b1: k9@120 (wm becomes 110).
    // b2: k8@121 (eviction during b2 uses wm=110; tie on k3)
    // b3: dup k3@122 -> emitted iff tie evicts
    val c = run(Seq(
      Seq((3L, 100L)),
      Seq((9L, 120L)),
      Seq((8L, 121L)),
      Seq((3L, 122L))), D)
    println(s"PROBE C: $c")
  }
}
