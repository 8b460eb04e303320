package graft.streaming

import graft.operators.Hll
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** An incrementally-maintained distinct-count rollup: a persisted HLL
  * register file folded forward one batch at a time.
  *
  * This is the aggregate [[CdcAggTable]]-style IVM can NOT maintain:
  * count/sum are subtractable, COUNT(DISTINCT) is not — a new batch's
  * contribution depends on everything already seen, so exact IVM would
  * have to keep the full key set (state ∝ history). The sketch
  * replaces that with a FIXED ≤ 2^p rows per group whose merge is an
  * elementwise max ([[Hll.merge]]), making the per-batch maintain cost
  * ∝ batch + sketch — never ∝ history — which is the only shape that
  * survives a year of batches at 100 TB. The trade is inherent:
  * estimates are ±1.04/√m and INSERT-ONLY (a register can't be
  * un-maxed; deletions mean rebuild from the surviving data, exactly
  * like every production sketch rollup).
  *
  * Storage follows the [[CdcTable]] generation protocol:
  * write-new-then-flip, `_SUCCESS`-gated recovery, so a torn write is
  * never flipped to and each generation is the complete sketch as of
  * its batch — free time travel over "distinct users so far".
  */
final class HllRollupTable(
    spark: SparkSession, dir: String, groups: Seq[String]) {

  private def fs = new org.apache.hadoop.fs.Path(dir)
    .getFileSystem(spark.sessionState.newHadoopConf())

  @volatile private var gen: Int = CdcCommits.maxCommittedGen(fs, dir)

  def generation: Int = gen

  @volatile private var floor: Int = Retention.floorOf(fs, dir)

  def retentionFloor: Int = floor

  /** Expire timeline points older than the newest `retainLast`
    * generations ([[Retention]] mark-then-sweep; the latest register
    * file — the one [[maintain]] folds into — is always retained). */
  def vacuum(retainLast: Int): Unit =
    floor = Retention.vacuumFlat(fs, dir, gen, retainLast)

  /** The register file as of generation `g` (default: latest). */
  def registers(g: Int = gen): DataFrame = {
    require(g >= 0 && g <= gen, s"no committed generation $g (latest $gen)")
    require(g >= floor,
      s"generation $g expired by retention (floor=$floor) — vacuumed")
    spark.read.parquet(s"$dir/gen=$g")
  }

  /** Fold one batch of raw rows into the sketch: hash→registers on
    * the batch only, elementwise-max merge with the stored file,
    * publish as the next generation. */
  def maintain(batch: DataFrame, key: Column): Unit = {
    val fresh = Hll.registers(batch, key, groups)
    // conditional commit + recompute-on-loss (see [[KmvRollupTable
    // .maintain]]): register max-merge is idempotent, so re-merging
    // against the winner's generation is always safe.
    var tries = 0
    var done = false
    while (!done) {
      val merged = if (gen >= 0) Hll.merge(registers(), fresh) else fresh
      val next = gen + 1
      if (graft.operators.AtomicCommit
          .publishParquet(spark, s"$dir/gen=$next") { tmp =>
            // one file per generation: the sketch table is (groups x one
            // bounded sketch) — KBs — and a full-parallelism write left
            // one near-empty file per shuffle partition for every read
            // to list (guide §6: small files hurt twice)
            merged.coalesce(1).write.mode("overwrite").parquet(tmp)
          }) { gen = next; done = true }
      else {
        gen = CdcCommits.maxCommittedGen(fs, dir)
        tries += 1
        if (tries >= 3) throw new graft.operators.ConcurrentWriteException(
          s"HllRollupTable $dir: lost the generation race 3 times — a " +
            "concurrent writer is live; coordinate upstream")
      }
    }
  }

  /** Estimated distinct counts per group as of generation `g`
    * (exact-integer raw estimator; see [[Hll.estimateCorrected]] for
    * the engine-side small-range read path). */
  def estimates(g: Int = gen): DataFrame = Hll.estimate(registers(g), groups)
}
