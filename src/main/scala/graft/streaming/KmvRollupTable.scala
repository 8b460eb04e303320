package graft.streaming

import graft.functions.KmvSketch
import graft.operators.Overlap
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** An incrementally-maintained cross-corpus overlap sketch: a persisted
  * KMV k-minima file folded forward one ingest batch at a time — the
  * [[HllRollupTable]] pattern applied to the question HLL can't answer:
  * not "how many distinct items so far" but "HOW MUCH OF THE EVAL SET
  * is in the corpus so far".
  *
  * Why this is the only shape that scales: exact overlap against a
  * growing corpus needs the corpus's full key set (state ∝ history).
  * The KMV sketch replaces it with ≤ k longs per group whose merge —
  * k smallest of the union ([[Overlap.mergeSketch]]) — is EXACTLY the
  * sketch of the underlying set union, so maintain cost is
  * ∝ batch + sketch, never ∝ history, and the maintained sketch is
  * BIT-IDENTICAL to the one-shot sketch of everything seen (maintain ≡
  * recompute is an equality, not an approximation — the estimator's
  * error budget is spent once, on the sketch itself). Insert-only,
  * like every minimum-based sketch: deletions mean rebuild.
  *
  * Storage follows the [[CdcTable]] generation protocol
  * (write-new-then-flip, `_SUCCESS`-gated), so each generation is the
  * complete sketch as of its batch — "benchmark contamination so far"
  * is readable at every point of the ingest timeline (q173).
  */
final class KmvRollupTable(
    spark: SparkSession, dir: String, groupCol: String, k: Int) {
  require(k >= 2, s"sketch size k must be >= 2, got $k")

  private def fs = new org.apache.hadoop.fs.Path(dir)
    .getFileSystem(spark.sessionState.newHadoopConf())

  @volatile private var gen: Int = CdcCommits.maxCommittedGen(fs, dir)

  def generation: Int = gen

  @volatile private var floor: Int = Retention.floorOf(fs, dir)

  def retentionFloor: Int = floor

  /** Expire timeline points older than the newest `retainLast`
    * generations ([[Retention]] mark-then-sweep; the latest sketch is
    * always retained, so estimates are unaffected — only how far back
    * [[overlapTimeline]] reaches). */
  def vacuum(retainLast: Int): Unit =
    floor = Retention.vacuumFlat(fs, dir, gen, retainLast)

  /** The sketch table as of generation `g` (default: latest):
    * one row per group, columns (groupCol, sketch). */
  def sketches(g: Int = gen): DataFrame = {
    require(g >= 0 && g <= gen, s"no committed generation $g (latest $gen)")
    require(g >= floor,
      s"generation $g expired by retention (floor=$floor) — vacuumed")
    spark.read.parquet(s"$dir/gen=$g")
  }

  /** Fold one batch of raw rows into the sketch: k-minima on the batch
    * only, union-merge with the stored file (full outer — groups may be
    * born in any batch), publish as the next generation. */
  def maintain(batch: DataFrame, hash: Column): Unit = {
    val fresh = batch.groupBy(col(groupCol))
      .agg(KmvSketch.minima(hash, k).as("sketch"))
    // conditional commit + recompute-on-loss: the merge reads the
    // CURRENT sketches, so a lost race re-merges against the winner's
    // generation (k-minima merge is idempotent, so even a duplicate
    // delivery folds safely). Refuses loudly after 3 losses.
    var tries = 0
    var done = false
    while (!done) {
      val merged =
        if (gen < 0) fresh
        else sketches().withColumnRenamed("sketch", "__old")
          .join(fresh.withColumnRenamed("sketch", "__new"),
            Seq(groupCol), "full_outer")
          .select(col(groupCol),
            Overlap.mergeSketch(col("__old"), col("__new"), k).as("sketch"))
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
          s"KmvRollupTable $dir: lost the generation race 3 times — a " +
            "concurrent writer is live; coordinate upstream")
      }
    }
  }

  /** Overlap estimate of the corpus-so-far (generation `g`) against a
    * fixed reference sketch table (groupCol, `sketch`) built with the
    * SAME k and hash — est_union / est_intersection / jaccard_est /
    * n_match per group ([[Overlap.kmvOverlapSketches]]). */
  def overlapWith(reference: DataFrame, g: Int = gen): DataFrame =
    Overlap.kmvOverlapSketches(
      sketches(g).withColumnRenamed("sketch", "__ska"),
      reference.withColumnRenamed("sketch", "__skb"),
      groupCol, k)

  /** Overlap of EVERY registry set against EVERY corpus group at
    * generation `g` — the decontamination-dashboard cell for one
    * timeline point: `registry` carries (`setCol`, sketch) for N
    * benchmark eval sets (same k and hash), output one row per
    * (corpus group × set). `setCol` must differ from the table's
    * group column ([[Overlap.kmvOverlapCross]]). */
  def overlapWithRegistry(registry: DataFrame, setCol: String,
      g: Int = gen): DataFrame =
    Overlap.kmvOverlapCross(
      sketches(g).withColumnRenamed("sketch", "__ska"), groupCol,
      registry.withColumnRenamed("sketch", "__skb"), setCol, k)

  /** The full dashboard: [[overlapWithRegistry]] at EVERY committed
    * generation — (group × set × generation) rows, the "contamination
    * by benchmark over the ingest timeline" matrix. Generation count
    * is bounded (one per ingest batch), so the union is a bounded plan
    * over ≤k-long arrays. */
  def overlapTimeline(registry: DataFrame, setCol: String): DataFrame = {
    require(gen >= 0, s"no committed generations under $dir")
    (floor to gen).map { g =>
      overlapWithRegistry(registry, setCol, g)
        .withColumn("gen", org.apache.spark.sql.functions.lit(g))
    }.reduce(_ unionByName _)
  }
}
