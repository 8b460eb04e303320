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
  * the table) plus a full snapshot rewrite. That rewrite makes this
  * the SMALL-table variant; [[BucketedCdcTable]] is the scale path —
  * identical semantics, but the snapshot is hash-bucketed on the key
  * and a batch rewrites only its touched buckets, so write volume
  * tracks the batch instead of the table. Generations also give free
  * time travel and crash safety: a half-written generation is simply
  * never flipped to.
  */
final class CdcTable(
    spark: SparkSession, dir: String, keyCol: String,
    opCol: String = "op", seqCol: Option[String] = None) {

  private def fs = new org.apache.hadoop.fs.Path(dir)
    .getFileSystem(spark.sessionState.newHadoopConf())

  /** Recovered on construction: the highest `gen=N` directory whose
    * _SUCCESS marker landed — a restarted process resumes at the last
    * committed generation instead of forgetting the table exists. A
    * torn generation (no _SUCCESS) is never flipped to. */
  @volatile private var gen: Int = CdcCommits.maxCommittedGen(fs, dir)

  /** Clamp to an externally-committed generation ([[CdcAggTable]]
    * recovery: the commit record, not the bare directory listing, is
    * the truth for the table+aggregate PAIR). */
  private[streaming] def resetTo(g: Int): Unit = gen = g

  /** One conditional publish attempt at gen+1 ([[graft.operators
    * .AtomicCommit]] — the rename-if-absent CAS). A lost race reloads
    * the committed generation from disk so the caller retries against
    * the WINNER's state instead of its own stale view. */
  private def tryPublish(df: DataFrame): Boolean = {
    val next = gen + 1
    val won = graft.operators.AtomicCommit
      .publishParquet(spark, s"$dir/gen=$next") { tmp =>
        df.write.mode("overwrite").parquet(tmp)
      }
    if (won) gen = next
    else gen = CdcCommits.maxCommittedGen(fs, dir)
    won
  }

  private def refuse(what: String): Nothing =
    throw new graft.operators.ConcurrentWriteException(
      s"CdcTable $dir: lost the $what race 3 times — a concurrent " +
        "writer is live on this table; coordinate writers upstream")

  /** Publish a full snapshot as the next generation (used for the
    * initial load and by [[applyBatch]]). Concurrent-writer safe: a
    * lost generation race retries at the winner's next slot (the
    * content is generation-independent), then refuses loudly. */
  def publish(df: DataFrame): Unit =
    if (!(1 to 3).exists(_ => tryPublish(df))) refuse("publish")

  def generation: Int = gen

  /** Lowest readable generation ([[vacuum]] raises it; 0 = full
    * history). Recovered from the retention record on construction. */
  @volatile private var floor: Int = Retention.floorOf(fs, dir)

  def retentionFloor: Int = floor

  def snapshot: DataFrame = {
    require(gen >= 0, "CdcTable has no snapshot yet — publish a base first")
    spark.read.parquet(s"$dir/gen=$gen")
  }

  /** The table as of generation `g` — any generation within the
    * retention horizon. Past-horizon requests fail loudly (the
    * generation is expired or already reclaimed), never wrong. */
  def snapshotAt(g: Int): DataFrame = {
    require(g >= 0 && g <= gen, s"generation $g not in [0, $gen]")
    require(g >= floor,
      s"generation $g expired by retention (floor=$floor) — vacuumed")
    spark.read.parquet(s"$dir/gen=$g")
  }

  /** Expire every generation older than the newest `retainLast`
    * ([[Retention]] mark-then-sweep: this pass marks, the NEXT pass
    * reclaims the bytes — one janitor cycle of reader grace). Time
    * travel within the horizon stays exact; below it, [[snapshotAt]]
    * refuses. Racing janitors are idempotent. */
  def vacuum(retainLast: Int): Unit =
    floor = Retention.vacuumFlat(fs, dir, gen, retainLast)

  /** Fold one change batch into the table. Concurrent-writer safe: the
    * upsert is RECOMPUTED against the winner's snapshot on a lost race
    * (the stale plan captured the loser's pre-race snapshot), then
    * refuses loudly after 3 losses. */
  def applyBatch(changes: DataFrame): Unit =
    if (!(1 to 3).exists(_ => tryPublish(
        Upsert.applyChanges(snapshot, changes, keyCol, opCol, seqCol))))
      refuse("applyBatch")

  /** Attach to a streaming change feed; every micro-batch becomes one
    * generation. */
  def attach(changes: DataFrame): StreamingQuery =
    changes.writeStream
      .outputMode("append")
      .foreachBatch((batch: Dataset[Row], _: Long) => applyBatch(batch))
      .start()
}

/** A [[CdcTable]] with a co-maintained count/sum aggregate: every
  * change batch updates the snapshot AND incrementally refreshes the
  * materialized aggregate through [[graft.operators.Ivm]] — the
  * aggregate's refresh cost tracks the batch, never the table. The
  * delta computation reads the PRE-change snapshot (old images), so
  * ordering inside [[applyBatch]] is load-bearing: aggregate first,
  * table second.
  *
  * Redelivery: `foreachBatch` can re-deliver a batch after a crash;
  * re-applying deltas would double-count, so [[attach]] skips batch
  * ids at or below the last applied one (the standard transactional-
  * sink dedup; ids are monotonic per checkpoint). The skip state
  * SURVIVES the crash it guards against: every publish/applyBatch
  * ends by writing a commit record (batchId, tableGen, aggGen) under
  * `dir/commits` — temp-file + rename, so a record is whole or
  * absent — and construction recovers all three from the latest
  * record. A crash between the table/aggregate writes and the commit
  * leaves orphan gen directories that recovery never flips to; they
  * are protocol-torn even though internally committed (the record is
  * the pair's commit point), so the FIRST WRITE through an instance
  * reclaims every gen directory beyond the recovered record — without
  * that, the redelivered batch's conditional publish would lose the
  * CAS to its own orphan on every restart (a permanent crash loop).
  * Reclaim is deliberately NOT done at construction: a read-only
  * instance (monitoring, ad-hoc snapshot) built while the writer sits
  * between a gen write and its commit record must never delete that
  * in-flight generation.
  * The maintain ≡ recompute invariant over any batch sequence is
  * pinned by CdcTableSpec. */
final class CdcAggTable(
    spark: SparkSession, dir: String, keyCol: String, groupCol: String,
    countCol: String, sumCols: Seq[String], opCol: String = "op") {

  val table = new CdcTable(spark, s"$dir/table", keyCol, opCol)
  @volatile private var aggGen: Int = -1
  @volatile private var lastBatchId: Long = -1L

  private def fs = new org.apache.hadoop.fs.Path(dir)
    .getFileSystem(spark.sessionState.newHadoopConf())

  // recover the last COMMITTED (batchId, tableGen, aggGen) triple: the
  // commit record is the truth for the pair — gen directories beyond
  // it are torn at the protocol level (a crash landed between a gen
  // write and its record) and are reclaimed HERE, while the protocol
  // is provably single-writer, so the redelivered batch republishes
  // into clean slots instead of losing the CAS to its own orphans
  locally {
    val (b, tg, ag) = CdcCommits.latest(fs, s"$dir/commits")
      .getOrElse((-1L, -1, -1))
    lastBatchId = b; table.resetTo(tg); aggGen = ag
  }

  // Reclaiming the torn generations is a WRITE-path action, deferred to
  // the first write through this instance: a pure reader (a monitoring
  // process constructing an instance for aggSnapshot) while the single
  // writer sits between a gen write and its commit record must NOT
  // delete that committed-but-unrecorded generation — construction
  // recovery above already refuses to flip to it, which is all a reader
  // needs. At first write the single-writer contract makes the orphans
  // provably this writer's own crash debris, safe to reclaim so the
  // republish lands in clean slots instead of losing the CAS forever.
  // The boundary is RE-READ here, not taken from construction: another
  // writer may have advanced the pair since, and generations recorded
  // after our recovery are live data — deleting them would hand this
  // instance a CAS win it must instead LOSE (and refuse) on.
  private lazy val reclaimTorn: Unit = {
    val (_, tg, ag) = CdcCommits.latest(fs, s"$dir/commits")
      .getOrElse((-1L, -1, -1))
    CdcCommits.reclaimAbove(fs, s"$dir/table", math.max(tg, table.generation))
    CdcCommits.reclaimAbove(fs, s"$dir/agg", math.max(ag, aggGen))
  }

  private def commit(batchId: Long): Unit =
    CdcCommits.write(fs, s"$dir/commits", idx = aggGen.toLong,
      batchId = batchId, tableGen = table.generation, aggGen = aggGen)

  /** CAS-published like the table generations. The PAIR protocol
    * (agg + table + commit record) is single-logical-writer — the
    * streaming checkpoint serializes batches — so a lost race here
    * means a second writer is live on the same table root: refuse
    * loudly rather than publish a pair whose old-image reads raced. */
  private def writeAgg(df: DataFrame): Unit = {
    val next = aggGen + 1
    val won = graft.operators.AtomicCommit
      .publishParquet(spark, s"$dir/agg/gen=$next") { tmp =>
        df.write.mode("overwrite").parquet(tmp)
      }
    if (!won) throw new graft.operators.ConcurrentWriteException(
      s"CdcAggTable $dir: aggregate generation $next was published by " +
        "a concurrent writer; this table is single-writer — coordinate " +
        "upstream")
    aggGen = next
  }

  /** Publish a full base snapshot: table generation + the aggregate
    * computed ONCE from it (the last full scan this table needs). */
  def publish(base: DataFrame): Unit = {
    import org.apache.spark.sql.functions._
    reclaimTorn
    table.publish(base)
    writeAgg(base.groupBy(col(groupCol))
      .agg(count(lit(1)).as(countCol),
        sumCols.map(c => sum(col(c)).as(c)): _*))
    commit(lastBatchId)
  }

  def aggSnapshot: DataFrame = {
    require(aggGen >= 0, "CdcAggTable has no snapshot yet — publish first")
    spark.read.parquet(s"$dir/agg/gen=$aggGen")
  }

  /** Fold one change batch in. `batchId` (when ≥ 0, the streaming
    * micro-batch id) advances the redelivery watermark; the commit
    * record lands only after BOTH writes, so a crash anywhere before
    * it re-applies against the pre-batch pair idempotently. */
  def applyBatch(changes: DataFrame, batchId: Long = -1L): Unit = {
    reclaimTorn
    writeAgg(graft.operators.Ivm.maintainSumCountAgg(
      aggSnapshot, table.snapshot, changes, keyCol, opCol, groupCol,
      countCol, sumCols))
    table.applyBatch(changes)
    if (batchId >= 0) lastBatchId = batchId
    commit(lastBatchId)
  }

  def attach(changes: DataFrame): StreamingQuery =
    changes.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        if (id > lastBatchId) applyBatch(batch, id)
      }
      .start()

  /** Retention across the whole pair: table generations, aggregate
    * generations, and the per-batch commit-record files (recovery
    * reads only the latest; an unbounded record directory makes
    * LISTING the recovery cost). Mark-then-sweep ([[Retention]]). */
  def vacuum(retainLast: Int): Unit = {
    table.vacuum(retainLast)
    Retention.vacuumFlat(fs, s"$dir/agg", aggGen, retainLast)
    Retention.pruneCommitRecords(fs, s"$dir/commits", retainLast)
  }
}
