package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Poisson bootstrap — the bootstrap that works on a cluster. Classic
  * resampling draws n rows WITH replacement per replicate, which needs
  * global coordination (every row must know how often it was drawn
  * across the whole dataset) and R full passes. The Poisson
  * approximation gives each row an independent Poisson(1) multiplicity
  * per replicate (E[w]=1, Var[w]=1 ≈ the multinomial the classic
  * bootstrap induces at large n), so ALL R replicates' statistics come
  * out of ONE scan: explode rows × replicates, weight each copy, and
  * let map-side partial aggregation collapse the volume immediately.
  * Standard since the Google streams work (Chamandy et al., "Estimating
  * Uncertainty for Massive Data Streams").
  *
  * Determinism (the whole point here): the Poisson draw is an inverse-
  * CDF lookup on a uniform derived from the PORTABLE 60-bit md5 hash of
  * (row key, replicate) — the same `('0x'||substr(md5(x),1,15))::BIGINT`
  * chain every sketch oracle in this repo replays — divided by 2^60
  * (exact power of two ⇒ bit-identical double in any engine). The CDF
  * is truncated at w=8 (P(X>8 | λ=1) ≈ 1.1e-7): a deterministic,
  * replayable quantization whose cutoffs are rendered from the SAME
  * Scala doubles into both the Spark plan and the oracle SQL.
  */
object Bootstrap {

  /** Cumulative Poisson(1) CDF at k = 0..7; u ≥ last ⇒ weight 8.
    * Computed once and rendered via Double.toString on both engines. */
  val cumulativeProbs: Seq[Double] = {
    val pmf = (0 to 7).map(k => math.exp(-1.0) / (1 to k).product)
    pmf.scanLeft(0.0)(_ + _).tail
  }

  private val TwoPow60 = 1152921504606846976.0

  /** Portable uniform in [0,1): 60 md5 bits of `key` / 2^60. */
  def portableUniform(key: Column): Column =
    (conv(substring(md5(key), 1, 15), 16, 10).cast("long")
      .cast("double") / TwoPow60)

  /** Fast uniform in [0,1): xxhash64 folded to 60 bits / 2^60 — the
    * 100 TB path (one codegen'd hash, no string build, no md5; same
    * portable-vs-fast split as [[Dedup.stringHash]], same measured
    * ~2–4× hash tax). Takes the key PARTS directly — xxhash64 is
    * n-ary, so no concat allocation either. */
  def fastUniform(keyParts: Seq[Column]): Column =
    (pmod(xxhash64(keyParts: _*), lit(1L << 60)).cast("double") / TwoPow60)

  /** Truncated inverse-CDF lookup over an ALREADY-MATERIALIZED uniform.
    * Callers must alias the uniform into its own projection first
    * ([[bootstrapSums]] does): `when` duplicates the condition subtree
    * into every branch, so inlining [[portableUniform]] here would
    * evaluate the md5 chain up to 8× per row (measured: 18.4 s vs ~3 s
    * at sf0.1×16 reps). CollapseProject keeps the split projection —
    * it refuses to inline a non-cheap alias referenced 8 times. */
  def weightFromUniform(u: Column): Column =
    cumulativeProbs.zipWithIndex.foldRight(lit(8): Column) {
      case ((p, k), rest) => when(u < lit(p), lit(k)).otherwise(rest)
    }

  /** Deterministic Poisson(1) multiplicity for `key` (truncated at 8).
    * One-shot convenience — inlines the hash into every CDF branch; on
    * hot paths use [[weightFromUniform]] over a materialized uniform. */
  def poissonWeight(key: Column): Column =
    weightFromUniform(portableUniform(key))

  /** The SQL twin of [[poissonWeight]] over a string expression. */
  def poissonWeightSql(keyExpr: String): String = {
    val u = s"((('0x'||substr(md5($keyExpr),1,15))::BIGINT)::DOUBLE" +
      s" / ${TwoPow60.toString})"
    val cases = cumulativeProbs.zipWithIndex
      .map { case (p, k) => s"WHEN $u < ${p.toString} THEN $k" }
      .mkString(" ")
    s"(CASE $cases ELSE 8 END)"
  }

  /** One-scan bootstrap of a per-replicate weighted sum: returns
    * (rep, n_eff, sum_v) with `n_eff` = Σw (the replicate's effective
    * row count) and `sum_v` = Σ w·value — exact integer arithmetic, so
    * feed an exact-lifted value (cents). The spread of `sum_v` across
    * replicates IS the sampling distribution of the total. */
  def bootstrapSums(df: DataFrame, keyCols: Seq[String], valueCol: String,
      reps: Int, portable: Boolean = false): DataFrame =
    bootstrapGroupSums(df, keyCols, Nil, valueCol, reps, portable)

  /** Grouped variant: per-(group, replicate) weighted sums — every
    * cohort's sampling distribution from the SAME single scan (the
    * weight depends only on (key, replicate), so grouping is free:
    * it just changes the aggregation key). */
  def bootstrapGroupSums(df: DataFrame, keyCols: Seq[String],
      groupCols: Seq[String], valueCol: String,
      reps: Int, portable: Boolean = false): DataFrame = {
    require(reps >= 1, s"need at least one replicate, got $reps")
    // 'rep' is emitted (the replicate id) and __u/__v/__w are scratch:
    // an input column with one of those names would be silently
    // overwritten, making the draw depend on the replicate index
    // instead of the user's key. Refuse loudly.
    val reserved = Set("rep", "__u", "__v", "__w")
    val clash = (keyCols ++ groupCols :+ valueCol).filter(reserved)
    require(clash.isEmpty,
      s"bootstrapGroupSums: column name(s) ${clash.mkString(", ")} are " +
        s"reserved (${reserved.mkString(", ")}); rename the input column")
    // Null-safe key encoding on the portable path: concat_ws SKIPS null
    // parts, so ("a", NULL) and ("a") would alias to the same uniform —
    // coalesce each part to a NUL sentinel no numeric/date cast ever
    // produces (oracle twin: coalesce(x::VARCHAR, chr(0))). (The fast
    // path's n-ary xxhash64 folds null as a distinct case already.)
    val u =
      if (portable) portableUniform(concat_ws(":",
        keyCols.map(c => coalesce(col(c).cast("string"), lit("\u0000"))) :+
          col("rep").cast("string"): _*))
      else fastUniform(keyCols.map(col) :+ col("rep"))
    // single-file corpora arrive as ONE split; the hash×reps work is
    // scan-side CPU, so widen to the session's parallelism (no-op when
    // the source already has enough splits — the Dedup.widen contract)
    Dedup.widen(
      df.select((keyCols ++ groupCols).distinct.map(col) :+
        col(valueCol).as("__v"): _*),
      keyCols.head)
      .withColumn("rep", explode(array((0 until reps).map(lit): _*)))
      .withColumn("__u", u)
      .withColumn("__w", weightFromUniform(col("__u")).cast("long"))
      .groupBy(groupCols.map(col) :+ col("rep"): _*)
      .agg(sum(col("__w")).as("n_eff"),
        sum(col("__w") * col("__v")).as("sum_v"))
  }

  /** Per-group bootstrap CONFIDENCE INTERVAL — error bars on a 100 TB
    * aggregate from parts already on the shelf: one scan builds every
    * replicate's per-group sum ([[bootstrapGroupSums]]), then the CI
    * bounds are EXACT rank selections over each group's replicate
    * distribution via [[Frequency.exactRanks]] (iterative histogram
    * refinement — zero data-row exchanges, driver state O(groups)).
    * Bounds are the ⌈q·reps⌉-th smallest replicate sums with q given as
    * an exact rational qNum/qDen (default 1/40 and 39/40 → a 95% CI),
    * so both engines derive identical integer ranks. Output: (group,
    * n_reps, ci_lo, ci_hi). */
  def bootstrapGroupCi(df: DataFrame, keyCols: Seq[String],
      groupCol: String, valueCol: String, reps: Int,
      qNum: Long = 1L, qDen: Long = 40L,
      portable: Boolean = false): DataFrame = {
    require(qNum >= 1 && qNum * 2 < qDen,
      s"need 0 < qNum/qDen < 1/2 for a two-sided CI, got $qNum/$qDen")
    // Scratch-materialized (guide §1.2): exactRanks is ITERATIVE — pass
    // 0 plus one histogram re-scan of its source per refinement round
    // (~5 rounds over 64-bit cent sums), and a lazy `sums` would re-run
    // the corpus × reps explode-and-hash scan — the expensive part —
    // every round. The materialized frame is (groups × reps) rows,
    // trivially small at any corpus scale, so every refinement round
    // re-scans a KB-scale table instead of the corpus.
    val sums = Lifecycle.materializeToScratch(
      bootstrapGroupSums(df, keyCols, Seq(groupCol), valueCol,
        reps, portable))
    def rank(num: Long)(n: Long): Long =
      math.max(1L, (num * n + qDen - 1) / qDen)
    Frequency.exactRanks(sums.select(col(groupCol), col("sum_v")),
        groupCol, "sum_v",
        Seq("ci_lo" -> rank(qNum), "ci_hi" -> rank(qDen - qNum)))
      .groupBy(col(groupCol))
      .agg(max(col("n")).as("n_reps"),
        max(when(col("tag") === "ci_lo", col("kth"))).as("ci_lo"),
        max(when(col("tag") === "ci_hi", col("kth"))).as("ci_hi"))
  }
}
