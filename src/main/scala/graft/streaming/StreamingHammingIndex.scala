package graft.streaming

import graft.operators.HammingIndex
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.StreamingQuery

/** Structured-Streaming maintenance of a persisted
  * [[graft.operators.HammingIndex]]: every micro-batch of embeddings
  * becomes one `ingest_batch=` increment of the stored binary codes, so
  * the served shortlist ([[HammingIndex.topK]]) is always current up to
  * the last drained batch.
  *
  * Exactly-once without a transaction log: the increment id is a pure
  * function of the micro-batch id (`batchId + 1`; the one-shot build
  * owns increment 0), and [[HammingIndex.append]] OVERWRITES its own
  * `ingest_batch=` directory — a batch replayed after a crash (the
  * foreachBatch at-least-once contract) replaces its own torn output
  * instead of duplicating codes. Same idempotence argument as
  * [[BucketedCdcTable]]'s publish and the q175 crash-replay spec, now
  * keyed on the engine's checkpointed batch id instead of a caller
  * cursor.
  *
  * At scale this is the standard "index lags the stream by one trigger"
  * serving topology: ingest appends increments, a periodic compaction
  * (same generation fold as [[StreamingDedup.compactIndex]]) would bound
  * the increment count, and readers always see whole increments because
  * parquet directories appear atomically at the final rename.
  */
object StreamingHammingIndex {

  /** Start maintaining `path` (an index with its base build already on
    * disk) from `stream`. Caller owns the returned query's lifecycle. */
  def maintain(stream: DataFrame, path: String, idCol: String,
      vecCol: String, checkpoint: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        // replay = true: ids come from THIS query's checkpoint (single
        // writer by construction), and an at-least-once redelivery must
        // overwrite its own increment — that IS the exactly-once story
        HammingIndex.append(batch.sparkSession, path, batch.toDF(),
          idCol, vecCol, batchId + 1, replay = true)
      }
      .start()
}
