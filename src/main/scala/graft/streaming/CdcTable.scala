package graft.streaming

import graft.operators.Upsert
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** A keyed table maintained under a CDC change stream: every
  * micro-batch folds into the current snapshot with
  * [[graft.operators.Upsert.applyChanges]] and the result is published
  * as a new generation-numbered parquet snapshot — write-new-then-flip,
  * the minimal atomic-publish protocol when no transactional table
  * format is available (a lakehouse format replaces the generation
  * dance with MERGE INTO; the per-batch dataflow is identical, and
  * `foreachBatch` is exactly where that MERGE would run).
  *
  * Scale: each batch costs one anti-join of the snapshot against the
  * batch's touched keys (broadcast — CDC batches are small relative to
  * the table) plus a full snapshot rewrite. The rewrite is the price of
  * plain parquet; with file-level transactions only touched files
  * rewrite. Generations also give free time travel and crash safety:
  * a half-written generation is simply never flipped to.
  */
final class CdcTable(
    spark: SparkSession, dir: String, keyCol: String,
    opCol: String = "op", seqCol: Option[String] = None) {

  @volatile private var gen: Int = -1

  /** Publish a full snapshot as the next generation (used for the
    * initial load and by [[applyBatch]]). */
  def publish(df: DataFrame): Unit = {
    val next = gen + 1
    df.write.mode("overwrite").parquet(s"$dir/gen=$next")
    gen = next
  }

  def generation: Int = gen

  def snapshot: DataFrame = {
    require(gen >= 0, "CdcTable has no snapshot yet — publish a base first")
    spark.read.parquet(s"$dir/gen=$gen")
  }

  /** Fold one change batch into the table. */
  def applyBatch(changes: DataFrame): Unit =
    publish(Upsert.applyChanges(snapshot, changes, keyCol, opCol, seqCol))

  /** Attach to a streaming change feed; every micro-batch becomes one
    * generation. */
  def attach(changes: DataFrame): StreamingQuery =
    changes.writeStream
      .outputMode("append")
      .foreachBatch((batch: Dataset[Row], _: Long) => applyBatch(batch))
      .start()
}
