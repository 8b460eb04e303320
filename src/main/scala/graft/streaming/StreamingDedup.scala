package graft.streaming

import graft.operators.{Dedup, Lifecycle}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Incremental corpus deduplication — the ingestion-time shape of
  * MinHash+LSH near-dup: documents arrive in batches, each batch is
  * deduplicated against itself and against an on-disk banded-signature
  * index of everything kept so far, and only NOVEL documents (and their
  * signatures) are admitted. This is what "dedup" means for a training
  * corpus that grows continuously — the batch self-join
  * ([[Dedup.minHashPairs]]) is the backfill shape, this is the
  * steady-state shape.
  *
  * Semantics (shared verbatim by the streaming ingester and the batch
  * fold, and replayed by the q80 DuckDB oracle): a document is NOVEL
  * iff it shares no (band_idx, band_hash) with (a) any smaller-id
  * document of its own batch, nor (b) any already-admitted document of
  * an earlier batch. Only novel documents' signatures enter the index,
  * so a duplicate-of-a-duplicate resolves against the earliest kept
  * copy, and the index stays bounded by the deduplicated corpus size.
  *
  * Scale: per batch, one banding pass over the batch (scan-side
  * signatures, no shuffle), one self-join on the band key (quadratic
  * only within buckets), and one band-keyed join against the index —
  * batch×index, never index×index. The index is a parquet table
  * partitioned by `ingest_batch=`; on a real cluster both paths live on
  * the shared FS and the index join prunes nothing today (every batch
  * must see all earlier bands) but stays a keyed shuffle of
  * batch-bounded left side against disk-resident right side.
  *
  * Exactly-once: [[start]] writes each micro-batch's output and index
  * rows into an `ingest_batch=<batchId>` partition directory with
  * overwrite — a replayed batch after crash recovery overwrites its own
  * partition instead of duplicating it, and [[readIndex]] filters to
  * partitions strictly below the current batch id so a half-written
  * partition from a failed attempt can never shadow its own replay.
  */
object StreamingDedup {

  /** One ingest step: deduplicate `batch` within itself and against
    * `index` (banded signatures of all previously admitted docs; None
    * on the first batch). Returns (novel docs, their banded signatures)
    * — both lazy scans over a scratch-materialized banding of the
    * batch, nothing left pinned. */
  def processBatch(
      batch: DataFrame, index: Option[DataFrame], idCol: String,
      textCol: String, shingleN: Int = 3, numHashes: Int = 16,
      bands: Int = 4, seed: Long = 42L, portable: Boolean = false)
      : (DataFrame, DataFrame) = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val banded = Lifecycle.materializeToScratch(
      Dedup.bandedSignatures(
        Dedup.withMinHashSignature(batch, idCol, textCol, shingleN,
          numHashes, seed, portable),
        idCol, bands, numHashes / bands, portable))
    val withinDup = banded.alias("x").join(banded.alias("y"),
        col("x.band_idx") === col("y.band_idx") &&
          col("x.band_hash") === col("y.band_hash") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"y.$idCol").as(idCol))
    val dupIds = (index match {
      case Some(ix) =>
        withinDup.union(
          Dedup.lshCandidatesAgainstIndex(banded, ix, idCol)
            .select(col("new_id").as(idCol)))
      case None => withinDup
    }).distinct()
    val novel = batch.join(dupIds, Seq(idCol), "left_anti")
    (novel, banded.join(dupIds, Seq(idCol), "left_anti"))
  }

  /** Banded-signature index accumulated by batches strictly below
    * `beforeBatch`; None when no batch has committed yet. */
  def readIndex(spark: SparkSession, indexPath: String,
      beforeBatch: Long): Option[DataFrame] = {
    val dirs = Option(new java.io.File(indexPath).listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("ingest_batch="))
      .filter(_.getName.stripPrefix("ingest_batch=").toLong < beforeBatch)
      .map(_.getAbsolutePath)
    if (dirs.isEmpty) None else Some(spark.read.parquet(dirs: _*))
  }

  /** Streaming ingester: each micro-batch of `docs` (a streaming frame
    * with idCol + textCol) is deduplicated per [[processBatch]]; novel
    * docs append to `outPath` and their signatures to `indexPath`, both
    * as `ingest_batch=` partitions (idempotent under replay — see
    * object doc). Restartable via `checkpointDir`; batch ids continue
    * across restarts, so the index accumulates correctly. */
  def start(docs: DataFrame, idCol: String, textCol: String,
      indexPath: String, outPath: String, checkpointDir: String,
      shingleN: Int = 3, numHashes: Int = 16, bands: Int = 4,
      seed: Long = 42L, portable: Boolean = false,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val (novel, novelBanded) = processBatch(batch,
          readIndex(spark, indexPath, batchId), idCol, textCol,
          shingleN, numHashes, bands, seed, portable)
        novel.write.mode("overwrite")
          .parquet(s"$outPath/ingest_batch=$batchId")
        novelBanded.write.mode("overwrite")
          .parquet(s"$indexPath/ingest_batch=$batchId")
        ()
      }
      .start()

  /** Batch replay of the same semantics: assign every doc a batch via
    * `batchExpr` (values 0 until nBatches), fold the batches in order
    * through [[processBatch]]. Returns (idCol, ingest_batch) of the
    * admitted docs. Streaming-vs-fold equivalence is pinned by
    * StreamingDedupSpec; the q80 oracle replays this in SQL. */
  def incrementalDedup(docs: DataFrame, idCol: String, textCol: String,
      batchExpr: org.apache.spark.sql.Column, nBatches: Int,
      shingleN: Int = 3, numHashes: Int = 16, bands: Int = 4,
      seed: Long = 42L, portable: Boolean = false): DataFrame = {
    val withB = Lifecycle.materializeToScratch(
      docs.withColumn("ingest_batch", batchExpr))
    var index: Option[DataFrame] = None
    (0 until nBatches).map { k =>
      val (novel, novelBanded) = processBatch(
        withB.filter(col("ingest_batch") === k), index, idCol, textCol,
        shingleN, numHashes, bands, seed, portable)
      // only the SIGNATURES feed later batches — materialize those for
      // the index; the per-batch novel outputs stay lazy (they are
      // cheap joins over already-scratch-materialized bandings) and
      // evaluate once in the final union
      val nb = Lifecycle.materializeToScratch(novelBanded)
      index = Some(index.map(_.union(nb)).getOrElse(nb))
      novel.select(col(idCol), col("ingest_batch"))
    }.reduce(_ union _)
  }
}
