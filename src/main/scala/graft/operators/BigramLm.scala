package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bigram language-model "perplexity" scoring in EXACT fixed-point —
  * the CCNet/GPT-3 quality-filter recipe (train a small LM on a
  * reference slice, keep low-perplexity documents), shrunk to an
  * engine-replayable model the DuckDB oracle can recompute bit for
  * bit.
  *
  * Model: Laplace-smoothed bigram LM. p(w2|w1) = (c12+1)/(c1+V) with
  * c1 = bigram-PREFIX count (so Σ_w2 p = 1) and V = training vocab
  * size. A document's score is its average per-bigram negative
  * log-likelihood — avg nll = Σ (log2(c1+V) − log2(c12+1)) / n — in
  * MILLI-BITS, so low = fluent, high = surprising, exactly the
  * quantity CCNet thresholds on (perplexity = 2^(nll/1000)).
  *
  * The whole point is the log: a float `log2` would put each engine's
  * last ulp inside the contract (the q79 lesson). Instead `ilog2Milli`
  * is a FIXED-POINT log2 both engines evaluate identically from
  * integer ops only: 1000·⌊log2 n⌋ from the shared `length(bin(n))`
  * bit-length idiom, plus a mantissa correction looked up by the top
  * 9 bits from a 256-entry table of PINNED integer literals (generated
  * once here, embedded in both dialects — never recomputed via either
  * engine's math library). Max log error: log2(1+2⁻⁸) ≈ 5.6 milli-bits
  * ≈ 0.4% in perplexity — noise for a filter whose decision margins
  * are 2-10×.
  *
  * Scale shape: training is ONE `groupBy(count)` pass over the
  * reference slice's bigrams (prefix counts and vocab size derive from
  * the materialized bigram-count table); scoring is two shuffle joins
  * (bigram → counts) + one per-doc aggregate. No driver-side data: V enters as
  * a broadcast single-row aggregate. Stopword-headed bigram keys are
  * the natural skew — AQE skew-join splits them; the joins carry only
  * (w1, w2, counts), never document text.
  */
object BigramLm {

  /** Shared fixed-point log2 (see
    * [[graft.functions.FixedPointLog]] for the contract): re-exported
    * here because the LM's oracles and scaladoc speak in terms of it. */
  val LogScale: Long = graft.functions.FixedPointLog.LogScale
  val MantissaTable: IndexedSeq[Long] =
    graft.functions.FixedPointLog.MantissaTable
  def tblDuck: String = graft.functions.FixedPointLog.tblDuck
  def ilog2MilliSpark(e: String): String =
    graft.functions.FixedPointLog.ilog2MilliSpark(e)
  def ilog2MilliDuck(e: String): String =
    graft.functions.FixedPointLog.ilog2MilliDuck(e)

  /** (id, w1, w2) — consecutive lowercase whitespace-token pairs. */
  def bigrams(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = TextAnalysis.whitespaceTokens(lower(trim(col(textCol))))
    docs.select(col(idCol), toks.as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col(idCol), explode(transform(
        sequence(lit(0), size(col("toks")) - 2),
        i => struct(element_at(col("toks"), i + 1).as("w1"),
          element_at(col("toks"), i + 2).as("w2")))).as("bg"))
      .select(col(idCol), col("bg.w1"), col("bg.w2"))
  }

  /** Train on `trainDocs`, score every document of `docs`:
    * (id, n_bigrams, nll_sum_milli, avg_nll_milli). Documents with
    * fewer than two tokens have no bigrams and are absent — a
    * length-based gate, not this model's job. */
  def scoreDocs(docs: DataFrame, trainDocs: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    // ONE pass over the reference slice (guide §1.2 — remove passes
    // before tuning inside them): the distinct-bigram count table is
    // scratch-materialized once, and the other two training quantities
    // are arithmetic consequences of it — c1 = Σ_w2 c12 (prefix count
    // counts every bigram occurrence with that prefix) and
    // V = |{w1}| = row count of the prefix table — where the previous
    // shape re-ran the corpus-scale tokenize+explode three times. The
    // materialized table is vocab-scale (distinct bigrams), never the
    // corpus, and all three consumers scan it instead of re-exploding.
    val bi = Lifecycle.materializeToScratch(
      bigrams(trainDocs, idCol, textCol)
        .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12")))
    val uni = bi.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val v = uni.agg(count(lit(1)).as("vv"))
    bigrams(docs, idCol, textCol)
      .join(bi, Seq("w1", "w2"), "left")
      .join(uni, Seq("w1"), "left")
      .crossJoin(broadcast(v))
      .select(col(idCol),
        (coalesce(col("c1"), lit(0L)) + col("vv")).as("den"),
        (coalesce(col("c12"), lit(0L)) + lit(1L)).as("num"))
      .withColumn("nll",
        expr(ilog2MilliSpark("den")) - expr(ilog2MilliSpark("num")))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("nll")).as("nll_sum_milli"))
      .withColumn("avg_nll_milli", expr("nll_sum_milli div n_bigrams"))
  }
}
