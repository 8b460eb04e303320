package graft.operators

import graft.functions.{KmvOps, KmvSketch}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-corpus overlap estimation from KMV sketches (Beyer et al.,
  * "On synopses for distinct-value estimation under multiset
  * operations", SIGMOD 2007).
  *
  * The 100 TB question this answers: how much of corpus B (an eval
  * benchmark, a licensed set, last month's crawl) is ALREADY IN corpus
  * A — without the exact-join decontamination pass (q56), which costs
  * a shuffle of both corpora. Each side is reduced to a k-minima
  * sketch (one map-side-combinable aggregation, k longs per group);
  * the estimator then needs only the two sketches:
  *
  *  - the k smallest of (minA ∪ minB) ARE the k minima of A∪B (each
  *    sketch contains its own set's k smallest, so nothing in the
  *    union's bottom-k can be missing from both);
  *  - |A∪B| ≈ (k−1)·2^60 / h_(k) on that union sketch (same estimator
  *    as [[graft.functions.KmvDistinct]]);
  *  - ρ = |{h ∈ union minima : h ∈ minA ∧ h ∈ minB}| / k is an
  *    unbiased estimate of the Jaccard J(A,B), so
  *    |A∩B| ≈ ρ · |A∪B|-est.
  *
  * Everything after the aggregation is builtin array algebra on ≤k-long
  * arrays, and the fixed 60-bit portable hash makes the WHOLE estimate
  * (not just its expectation) a deterministic function of the input
  * sets — order- and partitioning-insensitive, hence oracle-replayable
  * in ANSI SQL. When a group's union has fewer than k distinct hashes
  * the sketches are complete sets and every output is EXACT.
  */
object Overlap {

  /** Per-group overlap estimate between two keyed item sets.
    *
    * @param a        left corpus items: one row per (group, hash)
    * @param b        right corpus items: same shape
    * @param groupCol grouping column (present in both); inner-joined, so
    *                 only groups with rows on both sides are emitted
    * @param hashCol  non-null 60-bit item hash in [0, 2^60) — e.g.
    *                 `Dedup.stringHash(item, portable = true)`
    * @param k        sketch size (standard error ~ 1/sqrt(k))
    * @return one row per group: est_union, est_intersection,
    *         jaccard_est, n_match (the raw intersection evidence count)
    */
  def kmvOverlap(a: DataFrame, b: DataFrame, groupCol: String,
      hashCol: String, k: Int): DataFrame = {
    require(k >= 2, s"sketch size k must be >= 2, got $k")
    val ska = a.groupBy(col(groupCol))
      .agg(KmvSketch.minima(col(hashCol), k).as("__ska"))
    val skb = b.groupBy(col(groupCol))
      .agg(KmvSketch.minima(col(hashCol), k).as("__skb"))
    kmvOverlapSketches(ska, skb, groupCol, k)
  }

  /** The estimator over PRE-BUILT sketches: `a` carries
    * (groupCol, __ska), `b` (groupCol, __skb) — the entry point for
    * incrementally-maintained sketches
    * ([[graft.streaming.KmvRollupTable]]), where the aggregation
    * happened batch-by-batch long before the question is asked. */
  def kmvOverlapSketches(a: DataFrame, b: DataFrame, groupCol: String,
      k: Int): DataFrame =
    estimate(a.join(b, Seq(groupCol)), Seq(groupCol), k)

  /** ALL-PAIRS estimator: every `a` sketch (keyed `aKey`) against
    * every `b` sketch (keyed `bKey`) — the registry/dashboard shape:
    * one corpus (or a few corpus groups) × N benchmark eval sets. The
    * registry side is a broadcast cross join of ≤k longs per set —
    * |a|·|b| estimator rows of pure array algebra, never a corpus
    * touch. Column names must differ (both keys are emitted). */
  def kmvOverlapCross(a: DataFrame, aKey: String, b: DataFrame,
      bKey: String, k: Int): DataFrame = {
    require(aKey != bKey,
      s"aKey and bKey must differ, both were '$aKey'")
    estimate(a.crossJoin(broadcast(b)), Seq(aKey, bKey), k)
  }

  /** The shared estimator body over a joined frame carrying
    * `__ska`/`__skb`; emits `keyCols` + the four estimates. */
  private def estimate(joined: DataFrame, keyCols: Seq[String],
      k: Int): DataFrame =
    joined
      .withColumn("__um",
        slice(array_sort(array_union(col("__ska"), col("__skb"))), 1, k))
      .withColumn("__keff", size(col("__um")))
      .withColumn("est_union",
        when(col("__keff") < k, col("__keff").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(KmvOps.TwoPow60) /
            element_at(col("__um"), k).cast("double")))
      .withColumn("n_match",
        size(array_intersect(array_intersect(col("__um"), col("__ska")),
          col("__skb"))).cast("long"))
      .withColumn("jaccard_est",
        col("n_match").cast("double") / col("__keff").cast("double"))
      .withColumn("est_intersection", col("jaccard_est") * col("est_union"))
      .select(keyCols.map(col) ++ Seq(col("est_union"),
        col("est_intersection"), col("jaccard_est"), col("n_match")): _*)

  /** Merge two k-minima sketches: the k smallest of their union —
    * associative, commutative, idempotent, and EXACTLY the sketch of
    * the underlying set union (each sketch contains its set's bottom-k,
    * so the union's bottom-k is present). Null-tolerant for outer-join
    * maintenance (a group new to one side merges against empty). */
  def mergeSketch(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_union(
      coalesce(a, array().cast("array<long>")),
      coalesce(b, array().cast("array<long>")))), 1, k)
}
