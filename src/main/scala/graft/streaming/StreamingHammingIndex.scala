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
  * serving topology: ingest appends increments, periodic compaction
  * ([[HammingIndex.compactIncrements]] — the [[StreamingDedup
  * .compactIndex]] covered-boundary fold, run in-place every
  * `compactEvery` batches) bounds the directory count, and readers
  * always see a consistent code set because folds commit atomically and
  * shadow the increments they cover even before those are reclaimed.
  */
object StreamingHammingIndex {

  /** Start maintaining `path` (an index with its base build already on
    * disk) from `stream`. Caller owns the returned query's lifecycle.
    *
    * `compactEvery = Some(n)` folds the increment tree in place every n
    * batches INSIDE the batch hook — safe at that point because it
    * compacts strictly below the current batch's increment (everything
    * below it is committed), and a replayed batch re-running the fold
    * against its own committed generation is a no-op-then-reclaim
    * ([[HammingIndex.compactIncrements]]'s idempotence contract). A
    * long-lived maintenance query without it accumulates one directory
    * per micro-batch until listing cost dominates the serve. */
  def maintain(stream: DataFrame, path: String, idCol: String,
      vecCol: String, checkpoint: String,
      compactEvery: Option[Int] = None): StreamingQuery = {
    compactEvery.foreach(n => require(n > 0,
      s"compactEvery must be positive, got $n"))
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        // replay = true: ids come from THIS query's checkpoint (single
        // writer by construction), and an at-least-once redelivery must
        // overwrite its own increment — that IS the exactly-once story
        HammingIndex.append(batch.sparkSession, path, batch.toDF(),
          idCol, vecCol, batchId + 1, replay = true)
        compactEvery.foreach { n =>
          if ((batchId + 1) % n == 0)
            HammingIndex.compactIncrements(batch.sparkSession, path,
              upTo = batchId + 1)
        }
      }
      .start()
  }
}
