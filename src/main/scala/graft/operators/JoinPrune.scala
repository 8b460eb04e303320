package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning — the "runtime filter" every
  * warehouse engine applies when a SELECTIVE dimension joins a huge
  * fact table and the dimension is too big to broadcast: build a
  * bloom over the dim keys, filter the fact SCAN-side before the
  * shuffle, then run the real join on survivors.
  *
  * Why it matters at 100 TB: a sort-merge join shuffles the entire
  * fact table to match maybe 1% of it. The bloom costs one pass over
  * the (small) dim + a codegen'd scan-side predicate
  * ([[graft.functions.BloomMightContain]]), and removes the other 99%
  * BEFORE the exchange. Measured honestly (ProfileScratch `bloomjoin`,
  * 50M fact ⋈ 5M dim at 0.1% match, broadcast disabled): the filter
  * cuts exchange input 50M → 576k rows (98.8%, = match rate + 1% fpp
  * slack) for a 2.2s build + 2.4s probe — but single-box RAM shuffles
  * are so cheap that plain SMJ still wins wall-clock (4.7s vs 6.7s).
  * The operator's regime is a real cluster, where the exchange is
  * network+disk-bound and 98.8% fewer shuffled rows IS the win; on
  * one box, or when the dim fits a broadcast (BHJ never shuffles the
  * fact), skip it.
  *
  * EXACT by construction: blooms have no false negatives, so the
  * prefilter can never drop a matching fact row; false positives are
  * just rows the join itself discards. The oracle is therefore the
  * plain join — same contract as [[Dedup.bloomPrunedAntiJoin]].
  */
object JoinPrune {

  /** Inner equi-join of `fact` ⋈ `dim` on `key`, with the fact side
    * bloom-pruned by the dim keys before the join. `dim` must be the
    * small side (its keys are counted and tree-aggregated into the
    * filter; ~1.2 GB per 10⁹ keys at 1% fpp). */
  def bloomFilteredJoin(fact: DataFrame, dim: DataFrame, key: String,
      fpp: Double = 0.01,
      expectedDimKeys: Option[Long] = None): DataFrame = {
    import graft.functions.BloomFunctions
    BloomFunctions.register(fact.sparkSession)
    val nKeys = expectedDimKeys.getOrElse(dim.count())
    val bloom = BloomFunctions.buildHashedBloom(dim, key, nKeys, fpp)
    fact.filter(BloomFunctions.mightContainHashed(bloom, col(key)))
      .join(dim, Seq(key))
  }
}
