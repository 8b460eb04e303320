package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.streaming.Trigger

/** Restart semantics: a checkpointed file-source query that stops and
  * restarts must process every input row EXACTLY once across both
  * runs — the checkpoint's source offsets skip already-committed
  * files, the sink's commit log skips already-written batches. This is
  * the property that makes long-running ingestion restartable after a
  * crash or deploy without dedup logic downstream. */
class CheckpointRecoverySpec extends SparkSpec {
  import spark.implicits._

  test("restarted query skips committed input, new files flow exactly once") {
    val in = java.nio.file.Files.createTempDirectory("ckpt_in").toString
    val out = java.nio.file.Files.createTempDirectory("ckpt_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt_meta").toString

    def writeFile(name: String, ids: Range): Unit =
      ids.map(i => s"""{"id":$i}""").toDF("value")
        .coalesce(1).write.mode("append").text(s"$in/$name.json")

    def runOnce(): Unit = {
      val q = spark.readStream.schema("id LONG").json(s"$in/*")
        .writeStream
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    writeFile("a", 0 until 100)
    writeFile("b", 100 until 200)
    runOnce()
    assert(spark.read.parquet(out).count() == 200)

    writeFile("c", 200 until 300)
    runOnce() // second run: must pick up ONLY file c
    val ids = spark.read.parquet(out).select($"id").as[Long].collect()
    assert(ids.length == 300, s"got ${ids.length} rows (reprocessing?)")
    assert(ids.toSet == (0L until 300L).toSet)
  }
}
