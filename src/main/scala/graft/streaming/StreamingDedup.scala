package graft.streaming

import graft.operators.{Dedup, Lifecycle, Multimodal, Similarity}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Incremental corpus deduplication — the ingestion-time shape of
  * blocked near-dup: documents arrive in batches, each batch is
  * deduplicated against itself and against an on-disk blocking-key
  * index of everything kept so far, and only NOVEL documents (and
  * their blocking keys) are admitted. This is what "dedup" means for a
  * training corpus that grows continuously — the batch self-join
  * ([[Dedup.minHashPairs]], [[graft.operators.Fusion]]) is the
  * backfill shape, this is the steady-state shape.
  *
  * The blocking relation is pluggable: (id, block_key) rows where two
  * docs sharing ANY key are duplicates. [[minHashBlocks]] gives
  * MinHash+LSH text blocking (q80); [[fusedBlocks]] unions text bands
  * with image-embedding hyperplane buckets, so a pair is caught when
  * EITHER modality collides (q81) — the ingestion-time counterpart of
  * [[graft.operators.Fusion.imageTextNearDupPairs]].
  *
  * Semantics (shared verbatim by the streaming ingester and the batch
  * fold, and replayed by the q80/q81 DuckDB oracles): a document is
  * NOVEL iff it shares no block key with (a) any smaller-id document
  * of its own batch, nor (b) any already-admitted document of an
  * earlier batch. Only novel documents' keys enter the index, so a
  * duplicate-of-a-duplicate resolves against the earliest kept copy,
  * and the index stays bounded by the deduplicated corpus size.
  *
  * Scale: per batch, one blocking pass over the batch (scan-side
  * signatures, no shuffle), one self-join on the block key (quadratic
  * only within blocks), and one key-joined probe against the index —
  * batch×index, never index×index. The index is a parquet table
  * partitioned by `ingest_batch=`; on a real cluster both paths live
  * on the shared FS.
  *
  * Exactly-once: [[start]] writes each micro-batch's output and index
  * rows into an `ingest_batch=<batchId>` partition directory with
  * overwrite — a replayed batch after crash recovery overwrites its
  * own partition instead of duplicating it, and [[readIndex]] filters
  * to partitions strictly below the current batch id so a half-written
  * partition from a failed attempt can never shadow its own replay.
  */
object StreamingDedup {

  /** MinHash+LSH text blocking: one key per band,
    * `t:<band_idx>:<band_hash>`. */
  def minHashBlocks(idCol: String, textCol: String, shingleN: Int = 3,
      numHashes: Int = 16, bands: Int = 4, seed: Long = 42L,
      portable: Boolean = false)(df: DataFrame): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    Dedup.bandedSignatures(
      Dedup.withMinHashSignature(df, idCol, textCol, shingleN,
        numHashes, seed, portable),
      idCol, bands, numHashes / bands, portable)
      .select(col(idCol), concat_ws(":", lit("t"), col("band_idx"),
        col("band_hash")).as("block_key"))
  }

  /** Multimodal fused blocking: text MinHash bands ∪ image hyperplane
    * buckets (`i:<bucket>` over [[Multimodal.withFeatures]] embeddings)
    * — a pair is a candidate when EITHER modality collides, catching
    * same-image-rewritten-text AND same-text-reencoded-image dups. */
  def fusedBlocks(idCol: String, textCol: String, binCol: String,
      dim: Int, shingleN: Int = 3, numHashes: Int = 16, bands: Int = 4,
      nBits: Int = 8, seed: Long = 42L, planeSeed: Long = 7L,
      portable: Boolean = false)(df: DataFrame): DataFrame = {
    val text = minHashBlocks(idCol, textCol, shingleN, numHashes,
      bands, seed, portable)(df)
    val img = Multimodal.withFeatures(df.select(col(idCol), col(binCol)),
        binCol, dim)
      .select(col(idCol), concat(lit("i:"),
        Similarity.hyperplaneBucket(col("features"), dim, nBits,
          planeSeed).cast("string")).as("block_key"))
    text.union(img)
  }

  /** One ingest step: deduplicate `batch` within itself and against
    * `index` ((id, block_key) rows of all previously admitted docs;
    * None on the first batch). Returns (novel docs, their block keys)
    * — both lazy scans over a scratch-materialized blocking of the
    * batch, nothing left pinned. */
  def processBatch(batch: DataFrame, index: Option[DataFrame],
      idCol: String, blockRows: DataFrame => DataFrame)
      : (DataFrame, DataFrame) = {
    val blocks = Lifecycle.materializeToScratch(blockRows(batch))
    val withinDup = blocks.alias("x").join(blocks.alias("y"),
        col("x.block_key") === col("y.block_key") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"y.$idCol").as(idCol))
    val dupIds = (index match {
      case Some(ix) =>
        withinDup.union(
          blocks.alias("n").join(ix.alias("ix"), Seq("block_key"))
            .select(col(s"n.$idCol").as(idCol)))
      case None => withinDup
    }).distinct()
    val novel = batch.join(dupIds, Seq(idCol), "left_anti")
    (novel, blocks.join(dupIds, Seq(idCol), "left_anti"))
  }

  /** Block-key index accumulated by batches strictly below
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
    * with at least idCol + the columns `blockRows` reads) is
    * deduplicated per [[processBatch]]; novel docs append to `outPath`
    * and their block keys to `indexPath`, both as `ingest_batch=`
    * partitions (idempotent under replay — see object doc).
    * Restartable via `checkpointDir`; batch ids continue across
    * restarts, so the index accumulates correctly. */
  def start(docs: DataFrame, idCol: String,
      blockRows: DataFrame => DataFrame, indexPath: String,
      outPath: String, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val (novel, novelBlocks) = processBatch(batch,
          readIndex(spark, indexPath, batchId), idCol, blockRows)
        novel.write.mode("overwrite")
          .parquet(s"$outPath/ingest_batch=$batchId")
        novelBlocks.write.mode("overwrite")
          .parquet(s"$indexPath/ingest_batch=$batchId")
        ()
      }
      .start()

  /** [[start]] with the default text MinHash blocking (q80 shape). */
  def start(docs: DataFrame, idCol: String, textCol: String,
      indexPath: String, outPath: String, checkpointDir: String,
      shingleN: Int, numHashes: Int, bands: Int, seed: Long,
      portable: Boolean, trigger: Trigger): StreamingQuery =
    start(docs, idCol, minHashBlocks(idCol, textCol, shingleN,
      numHashes, bands, seed, portable), indexPath, outPath,
      checkpointDir, trigger)

  def start(docs: DataFrame, idCol: String, textCol: String,
      indexPath: String, outPath: String, checkpointDir: String)
      : StreamingQuery =
    start(docs, idCol, textCol, indexPath, outPath, checkpointDir,
      shingleN = 3, numHashes = 16, bands = 4, seed = 42L,
      portable = false, trigger = Trigger.AvailableNow())

  /** Batch replay of the same semantics: assign every doc a batch via
    * `batchExpr` (values 0 until nBatches), fold the batches in order
    * through [[processBatch]]. Returns (idCol, ingest_batch) of the
    * admitted docs. Streaming-vs-fold equivalence is pinned by
    * StreamingDedupSpec; the q80/q81 oracles replay this in SQL. */
  def incrementalDedupBlocked(docs: DataFrame, idCol: String,
      batchExpr: Column, nBatches: Int,
      blockRows: DataFrame => DataFrame): DataFrame = {
    val withB = Lifecycle.materializeToScratch(
      docs.withColumn("ingest_batch", batchExpr))
    var index: Option[DataFrame] = None
    (0 until nBatches).map { k =>
      val (novel, novelBlocks) = processBatch(
        withB.filter(col("ingest_batch") === k), index, idCol, blockRows)
      // only the block keys feed later batches — materialize those for
      // the index; the per-batch novel outputs stay lazy (they are
      // cheap joins over already-scratch-materialized blockings) and
      // evaluate once in the final union
      val nb = Lifecycle.materializeToScratch(novelBlocks)
      index = Some(index.map(_.union(nb)).getOrElse(nb))
      novel.select(col(idCol), col("ingest_batch"))
    }.reduce(_ union _)
  }

  /** [[incrementalDedupBlocked]] with text MinHash blocking (q80). */
  def incrementalDedup(docs: DataFrame, idCol: String, textCol: String,
      batchExpr: Column, nBatches: Int, shingleN: Int = 3,
      numHashes: Int = 16, bands: Int = 4, seed: Long = 42L,
      portable: Boolean = false): DataFrame =
    incrementalDedupBlocked(docs, idCol, batchExpr, nBatches,
      minHashBlocks(idCol, textCol, shingleN, numHashes, bands, seed,
        portable))
}
