package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-composition operators for training-data pipelines:
  * deterministic sampling/splitting (resumable — membership is a pure
  * function of the row id, never of partitioning or RNG state),
  * per-source mixture weighting, and token-budget document packing.
  *
  * All membership decisions hash the ID with the portable 60-bit hash,
  * so a split computed today, on any cluster size, equals the split
  * computed tomorrow — and an external system (or the DuckDB oracle)
  * can reproduce it row for row. `rand(seed)` cannot promise that: its
  * stream is partition-indexed.
  */
object DataMix {

  private val Buckets = 1000000L

  /** Uniform bucket in [0, 1e6) from (id, seed) — the shared
    * membership primitive. */
  def hashBucket(id: Column, seed: Long): Column =
    pmod(Dedup.stringHash(concat(id.cast("string"), lit(s"#$seed")),
      portable = true), lit(Buckets))

  /** Keep ~fraction of rows, deterministically by id. */
  def hashSample(df: DataFrame, idCol: String, fraction: Double,
      seed: Long = 42L): DataFrame =
    df.filter(hashBucket(col(idCol), seed) < (fraction * Buckets).toLong)

  /** Label every row train/test by id hash (no row lost, no overlap). */
  def trainTestSplit(df: DataFrame, idCol: String, testFraction: Double,
      seed: Long = 42L): DataFrame =
    df.withColumn("split",
      when(hashBucket(col(idCol), seed) < (testFraction * Buckets).toLong,
        lit("test")).otherwise(lit("train")))

  /** Per-source sampling rates (mixture weights): keep ~weight(source)
    * of each source's rows; sources missing from the map are dropped.
    * Thresholds are integerized driver-side (Math.round) — a runtime
    * `weight * 1e6` double multiply truncates 0.9 to 899999 where a
    * decimal engine gets 900000. */
  def mixtureSample(df: DataFrame, idCol: String, sourceCol: String,
      weights: Map[String, Double], seed: Long = 42L): DataFrame = {
    val threshold = weights.foldLeft(lit(-1L)) { case (acc, (src, w)) =>
      when(col(sourceCol) === src, lit(Math.round(w * Buckets))).otherwise(acc)
    }
    df.withColumn("__thr", threshold)
      .filter(hashBucket(col(idCol), seed) < col("__thr"))
      .drop("__thr")
  }

  /** Exact-size stratified sample: precisely `k` rows per stratum
    * (fewer when the stratum is smaller), chosen deterministically as
    * the k smallest portable id-hashes — a hash-ordered "reservoir"
    * that is partition- and run-invariant, unlike rand()-ranked
    * sampling. One window pass per stratum; at scale each stratum
    * sorts only its own partition slice, and a TOP-K-per-group
    * rewrite (rank ≤ k pushes into a bounded heap under AQE) keeps
    * memory flat. */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
      k: Int, seed: Long = 42L): DataFrame = {
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(hashBucket(col(idCol), seed), col(idCol))
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .drop("__rk")
  }

  /** Score-weighted sampling: keep each row with probability equal to
    * its (deterministic, row-derived) score in [0,1] — the
    * quality-weighted curation move (keep good docs surely, bad docs
    * rarely) with the same resumable hash-membership guarantee as
    * [[hashSample]]: membership is a pure function of (id, score,
    * seed), no RNG state, identical on any cluster or engine. The
    * score expression must itself be deterministic (e.g.
    * [[TextAnalysis.qualityScore]]). */
  def weightedSample(df: DataFrame, idCol: String, score: Column,
      seed: Long = 42L): DataFrame =
    df.filter(hashBucket(col(idCol), seed).cast("double") <
      score * Buckets)

  /** Temperature-flattened source mixture (α = 0.5): each source kept
    * at rate sqrt(n_min / n_source), so kept counts ∝ sqrt(n_source ·
    * n_min) — big sources are damped toward the smallest, the standard
    * multilingual/multi-domain rebalancing. Expressed with ONLY
    * correctly-rounded IEEE ops (one division, one sqrt — no
    * cross-source sum whose accumulation order could differ between
    * engines), so membership is bit-reproducible anywhere. Rates
    * derive from a tiny per-source count frame, broadcast back. */
  def temperatureFlatten(df: DataFrame, idCol: String, sourceCol: String,
      seed: Long = 42L): DataFrame = {
    val counts = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("__n"))
    val nMin = counts.agg(min(col("__n")).as("__n_min"))
    val rates = counts.crossJoin(broadcast(nMin))
      .select(col(sourceCol),
        sqrt(col("__n_min").cast("double") / col("__n").cast("double"))
          .as("__rate"))
    df.join(broadcast(rates), Seq(sourceCol))
      .filter(hashBucket(col(idCol), seed).cast("double") <
        col("__rate") * Buckets)
      .drop("__rate")
  }

  /** Sequential token-budget packing (the standard LLM-prep layout:
    * concatenate documents in a deterministic order, cut a new pack
    * whenever the running total crosses the budget — a document is
    * assigned to the pack where it STARTS). With a shard column: one
    * window pass per shard, each an independent parallel sequence.
    * Without one, the GLOBAL pack sequence runs through
    * [[PrefixSum.globalCumsum]]'s two-phase scan — the unsharded path
    * used to plan as a single-task global window, which is exactly the
    * shape that dies first at 100 TB. Same pack ids either way
    * (exact long cumsums are partitioning-independent). */
  def packByTokenBudget(df: DataFrame, idCol: String, tokenCol: String,
      budget: Long, shardCol: Option[String] = None): DataFrame = {
    val cum = shardCol match {
      case Some(c) =>
        val w = Window.partitionBy(col(c)).orderBy(col(idCol))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        df.withColumn("__cumsum", sum(col(tokenCol)).over(w))
      case None =>
        PrefixSum.globalCumsum(df, Seq(col(idCol)), col(tokenCol),
          "__cumsum")
    }
    cum.withColumn("pack_id",
        floor((col("__cumsum") - col(tokenCol)) / budget).cast("long"))
      .drop("__cumsum")
  }

  /** Deterministic global shuffle for training order: (shard, pos) per
    * row — shard by portable id-hash, position by hash order within
    * the shard. The training loader reads shards in index order and
    * rows in pos order and gets a reproducible pseudo-random
    * permutation of the corpus, independent of cluster size, file
    * layout, or Spark version (`repartition`+`rand` can promise none
    * of that). One shuffle on `shard`, per-shard external sort — no
    * global sort; size nShards so a shard ≈ one output file. */
  def shuffleShards(df: DataFrame, idCol: String, nShards: Int,
      seed: Long = 42L): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val w = Window.partitionBy(col("shard")).orderBy(col("__h"), col(idCol))
    df.withColumn("__h",
        Dedup.stringHash(concat(col(idCol).cast("string"), lit(s"#$seed")),
          portable = true))
      .withColumn("shard", pmod(col("__h"), lit(nShards.toLong)).cast("int"))
      .withColumn("pos", row_number().over(w))
      .drop("__h")
  }

  /** Leakage-safe split: assign train/test by GROUP (source, domain,
    * dedup cluster id), not by row — when near-duplicate or correlated
    * rows live inside one group, a row-hash split leaks siblings
    * across the boundary (the q56 contamination failure mode by
    * construction); hashing the group key sends every member the same
    * way, so NO group straddles. Same deterministic portable-hash
    * membership as [[trainTestSplit]]; the test fraction is now
    * approximate at GROUP granularity (exact only if groups are
    * equal-sized). Pure map-side — no shuffle, no group table. */
  def groupAwareSplit(df: DataFrame, groupCol: String,
      testFraction: Double, seed: Long = 42L): DataFrame =
    df.withColumn("split",
      when(hashBucket(col(groupCol), seed) < (testFraction * Buckets).toLong,
        lit("test")).otherwise(lit("train")))

  /** Domain quota cap: no single domain may exceed capNum/capDen of
    * the corpus — the standard pretraining-mix guard against one
    * over-crawled source dominating the distribution. Per domain,
    * keeps the first min(n_domain, ⌊cap·N⌋) rows in portable-hash
    * order (deterministic, engine-replayable; integer target, no float
    * thresholds). Domains under their quota pass through untouched.
    *
    * Cost shape: one count aggregate (scalar, broadcast back), one
    * shuffle by domain for the rank window. The window's per-key work
    * IS the hot domain — at extreme skew prefer the rate-based
    * variant: pre-thin oversized domains with [[hashSample]] at
    * ~target/n_domain BEFORE ranking, so the window never sees more
    * than ~target rows per domain (false drops bounded by hash-bucket
    * granularity; the exact pass then trims the remainder). */
  def domainQuota(df: DataFrame, idCol: String, domainCol: String,
      capNum: Long, capDen: Long, seed: Long = 42L): DataFrame = {
    require(capNum > 0 && capNum <= capDen, "cap must be in (0, 1]")
    val total = df.agg(count(lit(1)).as("__N"))
    val w = Window.partitionBy(col(domainCol))
      .orderBy(col("__h"), col(idCol))
    df.crossJoin(broadcast(total))
      .withColumn("__h",
        Dedup.stringHash(concat(col(idCol).cast("string"), lit(s"#$seed")),
          portable = true))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= expr(s"(${capNum}L * __N) div ${capDen}L"))
      .drop("__h", "__rn", "__N")
  }
}
