package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Importance-weighted data selection — pick raw-corpus documents whose
  * hashed n-gram distribution looks like a TARGET corpus (the DSIR
  * recipe: Xie et al. 2023, "Data Selection for Language Models via
  * Importance Resampling"). The train-data use case: given a small
  * curated target set (e.g. one language, one domain), rank or
  * resample a web-scale raw pool toward it.
  *
  * Shape at 100 TB: the feature space is hashed word-bigram BUCKETS
  * (default 1024), so both corpus distributions aggregate to B rows —
  * one scan each side, map-side-combined `groupBy(bucket)`, and the
  * learned weight table broadcasts into the scoring join. Nothing in
  * the pipeline is ever wider than (docs × ≤B) rows; there is no
  * all-pairs anything and no driver data collect.
  *
  * Determinism (the cross-engine contract, same rules as the q45/q95
  * family): the bucket hash is the portable md5-derived 60-bit hash in
  * oracle mode (xxhash64 in 100-TB mode); weights are exact integer
  * arithmetic — Laplace-smoothed distributions in parts-per-billion,
  * their ratio in ppm, every division an integral `div` on positive
  * operands (identical floor semantics in Spark and DuckDB), so scores
  * hash-match bit-for-bit. DSIR's log-likelihood-ratio product becomes
  * a per-n-gram AVERAGE of ratio-ppm weights: same ordering intent,
  * zero transcendental functions (ln parity across engines is 1-ulp
  * territory — the q79 lesson).
  *
  * Exactness bound: the ppb lift keeps every intermediate under 2^63
  * for corpora up to ~9.2e9 n-grams per side. Beyond that (the 100-TB
  * regime) lift the counts to decimal(38,0) — same formula, wider
  * lanes; the ppm weight itself is capped at 1e12 (a 1e6× ratio), so
  * per-doc sums stay long-safe at any document length the chunker
  * ([[Curation]]) emits.
  */
object Selection {

  /** Per-document hashed word-bigram bucket counts:
    * (idCol, bucket, cnt). Tokenization is the corpus convention
    * (lower → trim → whitespace split, the q64/q95 tokenizer);
    * documents with fewer than two tokens have no bigrams and drop
    * out (score undefined — nothing to compare). */
  def docBucketCounts(corpus: DataFrame, idCol: String, textCol: String,
      buckets: Int, portable: Boolean = false): DataFrame = {
    require(buckets >= 2, s"buckets $buckets")
    val withToks = corpus
      .select(col(idCol), TextAnalysis.whitespaceTokens(
        lower(trim(col(textCol)))).as("__toks"))
      .filter(col("__toks").isNotNull && size(col("__toks")) >= 2)
    val toks = col("__toks")
    withToks
      .select(col(idCol), explode(transform(sequence(lit(0), size(toks) - 2),
        i => concat(element_at(toks, i + 1), lit(" "),
          element_at(toks, i + 2)))).as("pair"))
      .select(col(idCol),
        pmod(Dedup.stringHash(col("pair"), portable), lit(buckets.toLong))
          .as("bucket"))
      .groupBy(col(idCol), col("bucket")).agg(count(lit(1)).as("cnt"))
  }

  /** Corpus-level bucket distribution: (bucket, cnt), ≤ `buckets`
    * rows. */
  def bucketCounts(corpus: DataFrame, textCol: String, buckets: Int,
      portable: Boolean = false): DataFrame =
    docBucketCounts(corpus.select(lit(0L).as("__one"), col(textCol)),
      "__one", textCol, buckets, portable)
      .groupBy(col("bucket")).agg(sum(col("cnt")).as("cnt"))

  /** Weight cap: a bucket's ratio never exceeds 1e6× (1e12 ppm) — the
    * statistical clip DSIR applies anyway, and the bound that keeps
    * per-document weighted sums inside a long. */
  val WeightCapPpm = 1000000000000L

  /** Per-bucket importance weight in ppm:
    * w_ppm[b] = cap( p_target[b] / p_raw[b] · 1e6 ) with Laplace
    * smoothing over the full bucket spine (so buckets empty on either
    * side still get a finite, engine-exact weight). Output:
    * (bucket, w_ppm), exactly `buckets` rows — KB-sized, made to be
    * broadcast. */
  def importanceWeights(targetBuckets: DataFrame, rawBuckets: DataFrame,
      buckets: Int): DataFrame = {
    val spark = targetBuckets.sparkSession
    val spine = spark.range(buckets).select(col("id").as("bucket"))
    val tTot = targetBuckets.agg(
      coalesce(sum(col("cnt")), lit(0L)).as("t_tot"))
    val rTot = rawBuckets.agg(
      coalesce(sum(col("cnt")), lit(0L)).as("r_tot"))
    spine
      .join(broadcast(targetBuckets.select(col("bucket"),
        col("cnt").as("t_cnt"))), Seq("bucket"), "left")
      .join(broadcast(rawBuckets.select(col("bucket"),
        col("cnt").as("r_cnt"))), Seq("bucket"), "left")
      .crossJoin(broadcast(tTot)).crossJoin(broadcast(rTot))
      .select(col("bucket"),
        expr(s"""least(
          |  (((coalesce(t_cnt, 0L) + 1L) * 1000000000L div (t_tot + ${buckets}L))
          |    * 1000000L)
          |  div greatest(
          |    (coalesce(r_cnt, 0L) + 1L) * 1000000000L div (r_tot + ${buckets}L),
          |    1L),
          |  ${WeightCapPpm}L)""".stripMargin).as("w_ppm"))
  }

  /** Score every raw document by how target-like its bigram
    * distribution is: (idCol, n_ngrams, score_ppm) where score_ppm is
    * the per-n-gram average importance weight (length-invariant —
    * a long document earns no score just for being long). ~1e6 ppm ≈
    * "indistinguishable from the raw pool"; higher = more
    * target-like. One scan of each corpus + a broadcast join of the
    * B-row weight table. */
  def importanceScores(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, buckets: Int, portable: Boolean = false): DataFrame = {
    val docB = docBucketCounts(raw, idCol, textCol, buckets, portable)
    val rawB = docB.groupBy(col("bucket")).agg(sum(col("cnt")).as("cnt"))
    val w = importanceWeights(
      bucketCounts(target, textCol, buckets, portable), rawB, buckets)
    docB
      .join(broadcast(w), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(sum(col("cnt")).as("n_ngrams"),
        expr("sum(cnt * w_ppm) div sum(cnt)").as("score_ppm"))
  }

  /** Importance RESAMPLING — the second half of DSIR: a systematic
    * PPS pass over the scores ([[PrefixSum.systematicSample]]), so a
    * document's pick rate is proportional to its target-likeness and
    * the expected sample size is (Σ score) / step. Deterministic
    * (order-keyed, seedless) and integer-exact end to end; the
    * global cumulative weight rides the two-phase scan — no
    * single-task window at any corpus size. */
  def importanceResample(scored: DataFrame, idCol: String, step: Long,
      nParts: Int = 64): DataFrame =
    PrefixSum.systematicSample(scored, Seq(col(idCol)),
      col("score_ppm"), step, nParts)

  /** Weighted sampling WITHOUT replacement, exact k — Efraimidis &
    * Spirakis A-ES (IPL 2006): draw u_i ~ U(0,1], the k smallest
    * −ln(u_i)/w_i win, which samples without replacement with
    * inclusion proportional-ish to w. The complement to
    * [[importanceResample]]: systematic PPS needs a GLOBAL prefix
    * scan and yields a rate-controlled (variable-size) sample; A-ES
    * needs no scan at all — every key is local arithmetic and the
    * selection is ONE TakeOrderedAndProject (top-k with partial
    * per-partition top-k map-side), the cheapest possible shape when
    * you want exactly k of 100 TB.
    *
    * Determinism/parity: u_i is the portable 60-bit hash of
    * (seed, id) shifted to [1, 2^60] (so u = h/2^60 ∈ (0, 1]), and
    * −log2(u_i) = 60000 − ilog2Milli(h) in EXACT fixed-point
    * ([[graft.functions.FixedPointLog]]) — key = that, ×10⁶, div w.
    * The 5.6-milli-bit log granularity only reorders draws whose true
    * keys differ by < 0.4%, which is sampling noise, not bias; ties
    * break on id. No transcendental, no randomness source beyond the
    * seed — replayable in the oracle and stable across retries. */
  def weightedSampleK(df: DataFrame, idCol: String, weight: Column,
      k: Int, seed: Long): DataFrame = {
    import graft.functions.FixedPointLog
    df.select(col(idCol), weight.cast("long").as("w"))
      .filter(col("w") > 0)
      .withColumn("h",
        Dedup.stringHash(concat(lit(s"s${seed}_"), col(idCol).cast("string")),
          portable = true) + lit(1L))
      .withColumn("sample_key", expr(
        s"((${60 * FixedPointLog.LogScale}L - ${FixedPointLog.ilog2MilliSpark("h")}) * 1000000L) div w"))
      .orderBy(col("sample_key"), col(idCol))
      .limit(k)
      .select(col(idCol), col("w"), col("sample_key"))
  }
}
