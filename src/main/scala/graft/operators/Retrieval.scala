package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sparse lexical retrieval over a document corpus: BM25 scoring in
  * PORTABLE FIXED-POINT integer arithmetic. The training-data use case
  * is targeted corpus search at curation time — "find every document
  * that looks like this benchmark task" (decontamination triage),
  * "pull the docs that mention these entities" (domain audits) — where
  * the ranking must be reproducible across engines and runs.
  *
  * Why fixed-point: real BM25 mixes `ln` and double sums, both of
  * which are engine-dependent (libm vs JVM `Math.log`; FP addition
  * order under parallel aggregation), so results can't be
  * hash-verified. Here every factor is scaled to ×1e6 integers and
  * combined with `+`, `*`, and truncating integral division only —
  * bit-identical in any ANSI engine (`div` in Spark, `//` in DuckDB),
  * order-independent under the exact long sum. The idf uses the
  * log-free Robertson form (N - df + ½)/(df + ½) — monotone in df,
  * same ranking family; k1 = 1.2 and b = 0.75 appear as the exact
  * rationals 12/10 and 75/100.
  *
  * Scale shape: one token pass builds (doc, term) counts — the
  * shuffle is on (doc_id, term), partitioning evenly; per-term df and
  * the global (N, totLen) are tiny aggregates broadcast back; the
  * final top-k is TakeOrderedAndProject (no global sort). Overflow
  * bound: intermediate products stay < 2^63 for corpora up to ~1e9
  * scoring docs with doc lengths ≤ ~1e4 tokens (the largest term is
  * tf·2.2e12); beyond that, shard scoring by term group.
  */
object Retrieval {

  /** Top-k docs for a bag-of-words query under fixed-point BM25.
    * Output: (idCol, n_terms, score) — `score` is the ×1e6-scaled
    * integer BM25 sum, `n_terms` the number of distinct query terms
    * the doc matched. Ties broken by ascending id for a total order. */
  def bm25TopK(
      docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int): DataFrame = {
    // EAGER (see [[Lifecycle]]): the top-k materializes now, the pinned
    // token frame unpins before return
    val (out, pinned) = bm25TopKLazy(docs, idCol, textCol, queryTerms, k)
    Lifecycle.materializeThenRelease(out, pinned: _*)
  }

  /** The un-materialized plan + the frames it pins (plan-shape tests
    * inspect this; production callers use [[bm25TopK]]). */
  private[graft] def bm25TopKLazy(
      docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int): (DataFrame, Seq[DataFrame]) = {
    require(queryTerms.nonEmpty, "bm25TopK: empty query")
    val toks = docs
      .select(col(idCol),
        explode(TextAnalysis.whitespaceTokens(lower(trim(col(textCol)))))
          .as("term"))
      .filter(col("term") =!= "")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // doc lengths + corpus stats over docs that have >=1 token (avgdl
    // over the scoring population; empty/null docs can never match)
    val lens = toks.groupBy(col(idCol)).agg(count(lit(1)).as("len_d"))
    val stats = lens.agg(count(lit(1)).as("n_docs"), sum("len_d").as("tot_len"))
    val qToks = toks.filter(col("term").isin(queryTerms: _*))
    val dfT = qToks.groupBy(col("term"))
      .agg(countDistinct(col(idCol)).as("df"))
    val tf = qToks.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val scored = tf
      .join(lens, idCol)
      .join(broadcast(dfT), "term")
      .crossJoin(broadcast(stats))
      // idf6 = 1e6 * (N - df + 1/2)/(df + 1/2)  [exact: x2 numerator/denominator]
      .withColumn("idf6",
        expr("((2*(n_docs - df) + 1) * 1000000) div (2*df + 1)"))
      // kd6 = 1e6 * k1*((1-b) + b*len_d/avgdl), k1=12/10, b=75/100,
      // avgdl = tot_len/n_docs exactly
      .withColumn("kd6",
        expr("(12 * (250000 + (750000 * len_d * n_docs) div tot_len)) div 10"))
      // contrib = 1e6 * (tf*(k1+1)/(tf + kd)) * idf  [÷1e6 rescale at the end]
      .withColumn("contrib",
        expr("(((tf * 2200000 * 1000000) div (tf * 1000000 + kd6)) * idf6) div 1000000"))
    val out = scored.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_terms"), sum("contrib").as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
    (out, Seq(toks))
  }

  /** Reciprocal-rank fusion — the standard hybrid-retrieval combiner
    * (lexical BM25 list + semantic ANN list feeding one candidate set
    * for dedup/decontamination lookups). Each input must carry `idCol`
    * and an integer `rank` (1-based); a doc's fused score is
    *
    *   rrf = Σ_lists 10⁶ div (rrfK + rank)
    *
    * in EXACT integer arithmetic (the fixed-point discipline of
    * [[bm25TopK]] — no doubles, so ranking and scores hash-replay in
    * any engine), ties broken by ascending id for a total order.
    * Inputs are top-k lists (bounded rows), so the union/groupBy is
    * driver-light and the final order is a bounded TakeOrdered.
    * Output: (idCol, n_lists, rrf_score). */
  def rrfFuse(lists: Seq[DataFrame], idCol: String, k: Int,
      rrfK: Int = 60): DataFrame = {
    require(lists.nonEmpty, "rrfFuse: no input lists")
    lists.map(_.select(col(idCol), col("rank")))
      .reduce(_ unionByName _)
      .withColumn("contrib", expr(s"1000000 div ($rrfK + rank)"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_lists"), sum(col("contrib")).as("rrf_score"))
      .orderBy(col("rrf_score").desc, col(idCol))
      .limit(k)
  }

  /** Maximal-marginal-relevance diversified rerank over a BOUNDED
    * candidate pool (the post-retrieval stage: BM25/ANN top-k →
    * [[rrfFuse]] → MMR is the standard relevance-with-diversity
    * chain). Greedy: step 1 picks max relevance; step t picks
    *
    *   argmax  λ·rel(i) − (10⁶−λ)·max_{s∈S} sim(i, s)
    *
    * in EXACT integer ppm arithmetic (rel and pairwise cosines enter
    * as ppm longs; λ is ppm, so scores are exact λ·rel − (10⁶−λ)·sim
    * longs and the oracle replays every step bit-for-bit), ties on
    * ascending id. The pairwise cosines are computed DISTRIBUTED
    * (pool ⋈ pool scan-side — the pool is a top-k list, so the matrix
    * is k² bounded rows); only the greedy selection — inherently
    * sequential, k steps over ≤|pool| candidates — runs driver-side,
    * the [[graft.operators.ProductQuant]] codebook pattern of bounded
    * metadata, never data. Output: (rank, idCol, mmr_score). */
  def mmrDiversify(pool: DataFrame, idCol: String, relCol: String,
      vecCol: String, lambdaPpm: Long, k: Int): DataFrame = {
    require(lambdaPpm >= 0L && lambdaPpm <= 1000000L, s"lambda $lambdaPpm")
    graft.functions.VectorFunctions.register(pool.sparkSession)
    // cosine is null for a zero-magnitude vector — treat as similarity 0
    // instead of NPE-ing at the driver-side getLong; ids/relevance are
    // cast to long explicitly so a non-integer id column fails the cast
    // analysis with a clear type error rather than an opaque getLong.
    val simPpm = coalesce(
      round(round(Similarity.cosine(col("__va"), col("__vb")),
        6) * lit(1000000L), 0).cast("long"), lit(0L))
    val sims = pool.select(col(idCol).cast("long").as("__ia"),
        col(vecCol).as("__va"))
      .join(pool.select(col(idCol).cast("long").as("__ib"),
          col(vecCol).as("__vb")),
        col("__ia") < col("__ib"))
      .select(col("__ia"), col("__ib"), simPpm.as("__sim"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .toMap
    val rels = pool
      .select(col(idCol).cast("long"), col(relCol).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    def sim(x: Long, y: Long): Long =
      if (x < y) sims((x, y)) else sims((y, x))
    var selected = Vector.empty[(Long, Long)]
    var remaining = rels.toSeq
    while (selected.size < k && remaining.nonEmpty) {
      val best = remaining.map { case (id, rel) =>
        val maxSim =
          if (selected.isEmpty) 0L
          else selected.map(s => sim(id, s._1)).max
        (id, lambdaPpm * rel - (1000000L - lambdaPpm) * maxSim)
      }.minBy { case (id, score) => (-score, id) }
      selected :+= best
      remaining = remaining.filterNot(_._1 == best._1)
    }
    val spark = pool.sparkSession
    import spark.implicits._
    selected.zipWithIndex
      .map { case ((id, score), i) => (i + 1, id, score) }
      .toDF("rank", idCol, "mmr_score")
  }

  /** DuckDB replay of [[bm25TopK]] (same fixed-point formula, `//` =
    * truncating integral division on BIGINT; `::BIGINT` pins DuckDB's
    * HUGEINT sums back to the long type Spark produces). */
  def bm25TopKSql(
      table: String, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int): String = {
    val inList = queryTerms.map(t => s"'$t'").mkString(", ")
    s"""WITH toks AS (
       |  SELECT $idCol, unnest(regexp_split_to_array(trim(lower($textCol)), '\\s+')) AS term
       |  FROM $table),
       |t AS (SELECT * FROM toks WHERE term <> ''),
       |lens AS (SELECT $idCol, count(*) AS len_d FROM t GROUP BY 1),
       |stats AS (SELECT count(*) AS n_docs, sum(len_d)::BIGINT AS tot_len FROM lens),
       |dft AS (SELECT term, count(DISTINCT $idCol) AS df
       |        FROM t WHERE term IN ($inList) GROUP BY 1),
       |tf AS (SELECT $idCol, term, count(*) AS tf
       |       FROM t WHERE term IN ($inList) GROUP BY 1, 2),
       |scored AS (
       |  SELECT tf.$idCol,
       |    (((tf * 2200000 * 1000000)
       |        // (tf * 1000000
       |           + ((12 * (250000 + (750000 * len_d * n_docs) // tot_len)) // 10)))
       |      * (((2*(n_docs - df) + 1) * 1000000) // (2*df + 1))) // 1000000 AS contrib
       |  FROM tf
       |  JOIN lens USING ($idCol)
       |  JOIN dft USING (term)
       |  CROSS JOIN stats)
       |SELECT $idCol, count(*) AS n_terms, sum(contrib)::BIGINT AS score
       |FROM scored GROUP BY 1
       |ORDER BY score DESC, $idCol LIMIT $k""".stripMargin
  }

  /** Retrieval-quality metrics over a system ranking vs a truth set,
    * in exact fixed-point — evaluation as a first-class, oracle-
    * checkable operator (retrieval pipelines are tuned on exactly
    * these numbers, so they deserve the same determinism as the
    * rankings themselves). Inputs: `system` = (query_id, neighbor_id,
    * rank 1..k), `truth` = (query_id, neighbor_id) — binary relevance.
    * Per query:
    *  - n_hits, first_hit_rank (0 when none);
    *  - mrr_ppm = 10^6 div first_hit_rank (reciprocal rank, exact);
    *  - dcg_micro = Σ_hits 10^9 div ilog2Milli(rank+1) — the classic
    *    1/log2(rank+1) discount on the shared fixed-point log
    *    ([[graft.functions.FixedPointLog]]);
    *  - ndcg_ppm = dcg·10^6 div IDCG, where IDCG (all k positions
    *    relevant) is derived ONCE via the driver-side evaluator and
    *    enters both engines as the same literal.
    * One left join + one aggregate; metrics over a 100-TB eval set
    * are exactly as distributed as the rankings were. */
  def rankingMetrics(system: DataFrame, truth: DataFrame, k: Int): DataFrame = {
    import graft.functions.FixedPointLog
    val idcg = (1 to k).map(i => 1000000000L / FixedPointLog.ilog2Milli(i + 1L)).sum
    val rel = truth.withColumn("rel", lit(1L))
    system
      .join(rel, Seq("query_id", "neighbor_id"), "left")
      .withColumn("rel", coalesce(col("rel"), lit(0L)))
      .withColumn("disc", expr(
        s"1000000000L div ${FixedPointLog.ilog2MilliSpark("(rank + 1)")}"))
      .groupBy(col("query_id"))
      .agg(sum(col("rel")).as("n_hits"),
        coalesce(min(when(col("rel") === 1L, col("rank"))), lit(0L))
          .as("first_hit_rank"),
        sum(when(col("rel") === 1L, col("disc")).otherwise(0L))
          .as("dcg_micro"))
      .withColumn("mrr_ppm",
        when(col("first_hit_rank") > 0, expr("1000000L div first_hit_rank"))
          .otherwise(lit(0L)))
      .withColumn("ndcg_ppm", expr(s"(dcg_micro * 1000000L) div ${idcg}L"))
  }
}
