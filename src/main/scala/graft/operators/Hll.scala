package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog distinct-count sketch, expressed RELATIONALLY — no
  * custom aggregate, no UDF, every step a codegen'd built-in.
  *
  * Why another distinct sketch next to [[graft.functions.KmvDistinct]]
  * (q37): KMV keeps the k smallest hashes (k·8 bytes, estimate from
  * the k-th order statistic); HLL is the industry standard at large
  * scale because its state is a FIXED 2^p-byte register file whose
  * merge is an elementwise max — the shape stream processors and
  * cross-shard rollups standardize on (Flajolet et al., AofA 2007).
  * At 100 TB: one map-side-combined `groupBy(bucket).max(rho)` pass,
  * ≤ m rows of state per group — KBs — regardless of cardinality, and
  * shard sketches built independently (per day / per source) union
  * into a global one with the same `max`, so the rollup never rescans
  * history.
  *
  * Engine-replayable by construction (the oracle recomputes the exact
  * same registers in ANSI SQL):
  *  - hash: the portable 60-bit md5 hash used by the whole sketch
  *    family ([[Dedup.stringHash]] ≡ `('0x'||substr(md5(v),1,15))::BIGINT`);
  *  - bucket: top p bits (`h >> (60-p)`) — h is non-negative, so
  *    arithmetic and logical shifts agree in both engines;
  *  - rho: position of the first 1-bit in the NEXT 31 bits, via the
  *    shared `length(bin(x))` bit-length idiom (q125's histogram pin):
  *    rho = 32 − bitlen(rem) ∈ [1, 31], rem = 0 → 32;
  *  - estimate: the raw HLL estimator α·m²/Σ2^−M in EXACT integer
  *    arithmetic — the sum is scaled by 2^32 so every term
  *    (`1 << (32−M)`, absent register → `1 << 32`) is an integer, and
  *    α enters as a pinned ppm literal. No floats anywhere, so the
  *    estimate hashes identically across engines. The classic
  *    small-range linear-counting correction needs ln() — kept OUT of
  *    the cross-engine contract; callers get `n_set` (non-empty
  *    registers) alongside, which is exactly what linear counting
  *    needs, and `HllSpec` checks the raw estimator's error bound on
  *    cardinalities where the raw regime applies.
  */
object Hll {

  /** Register-index bits: m = 1024 registers ⇒ ~3.25% relative error
    * (1.04/√m) in the raw regime. */
  val P = 10
  val M = 1 << P

  /** α_m · 10^6 for m = 1024: 0.7213/(1 + 1.079/1024), the standard
    * bias constant, rounded to ppm and pinned as a literal in both
    * engines (recomputing it would drag doubles into the contract). */
  val AlphaPpm = 720541L

  private val RemBits = 31 // rho source bits; register ∈ [1, 32]
  private val RegCap = RemBits + 1

  /** Per-group HLL register file over `key`: one row per OCCUPIED
    * (group, bucket); absent buckets are implied zero (the estimator
    * accounts for them via n_set). One shuffle, map-side combined. */
  def registers(df: DataFrame, key: Column, groups: Seq[String]): DataFrame = {
    val h = Dedup.stringHash(key.cast("string"), portable = true)
    val bucket = shiftright(h, 60 - P).as("bucket")
    val rem = shiftright(h, 60 - P - RemBits)
      .bitwiseAND(lit((1L << RemBits) - 1))
    val rho = when(rem === 0L, lit(RegCap.toLong))
      .otherwise(lit(RegCap.toLong) - length(bin(rem)).cast("long"))
    df.select((groups.map(col) :+ bucket :+ rho.as("rho")): _*)
      .groupBy((groups :+ "bucket").map(col): _*)
      .agg(max(col("rho")).as("register"))
  }

  /** Merge independently-built register files (same groups/key): the
    * elementwise max. This is the cross-shard rollup path — union the
    * shard sketches, never the raw data. */
  def merge(regs: DataFrame*): DataFrame = {
    val all = regs.reduce(_ unionByName _)
    val groups = all.columns.filterNot(Set("bucket", "register")).toSeq
    all.groupBy((groups :+ "bucket").map(col): _*)
      .agg(max(col("register")).as("register"))
  }

  /** Raw estimate + the classic small-range fallback, ENGINE-SIDE
    * (Spark-only — `ln` is a transcendental whose last ulp is not part
    * of the cross-engine contract, so this variant is spec-gated, not
    * oracle-gated): when the raw estimate falls below 2.5m and empty
    * registers remain, linear counting `m·ln(m/V)` is the unbiased
    * estimator (V = empty registers). This is the production read
    * path; [[estimate]] is the exact-integer core the oracle replays. */
  def estimateCorrected(regs: DataFrame, groups: Seq[String]): DataFrame =
    estimate(regs, groups).withColumn("est",
      when(col("est_raw") <= lit(5L * M / 2) && col("n_set") < lit(M.toLong),
        round(lit(M.toDouble) *
          log(lit(M.toDouble) / (lit(M.toLong) - col("n_set")))).cast("long"))
        .otherwise(col("est_raw")))

  /** Raw HLL estimate per group from a register file, exact-integer:
    * den = Σ_occupied 2^(32−M_j) + (m − n_set)·2^32  (= 2^32·Σ 2^−M),
    * est = α_ppm · ((m²·2^32) div den) div 10^6.
    * Overflow audit: den ≤ m·2^32 = 2^42; m²·2^32 = 2^52; the div
    * result ≤ 2^52/m = 2^42; ×α_ppm < 2^62. All BIGINT-safe. */
  def estimate(regs: DataFrame, groups: Seq[String]): DataFrame =
    regs.groupBy(groups.map(col): _*)
      .agg(count(lit(1)).as("n_set"),
        sum(expr(s"shiftleft(1L, cast($RegCap - register as int))")).as("occ"))
      .withColumn("den_scaled",
        col("occ") + (lit(M.toLong) - col("n_set")) * lit(1L << RegCap))
      .withColumn("est_raw",
        expr(s"($AlphaPpm * ((${M.toLong * M} * ${1L << RegCap}) div den_scaled)) div 1000000"))
      .drop("occ")
}
