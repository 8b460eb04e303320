package graft.queries

import graft.Tables
import graft.operators.IvfPq
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF-PQ composite-index coverage ([[graft.operators.IvfPq]]): coarse
  * k-means (kc=16, 2 fixed-point Lloyd steps — q127's pinned trainer)
  * + residual product quantization (m=4, k=16, 4 Lloyd steps — q123's
  * training budget) over the 64-dim embeddings. The oracle replays the
  * ENTIRE composite pipeline in SQL — coarse training, assignment,
  * element-wise residuals, residual-codebook training, encoding,
  * query routing, and the decomposed ADC score
  * ⟨q,centroid⟩ + Σ_s LUT_s[code_s] — as one chain of unrolled CTEs,
  * so every stage is cross-engine-pinned, not trusted.
  *
  * Recall context (the reason this operator exists): flat PQ at the
  * SAME m/k code bytes measured 1.5/5 mean top-5 overlap after Lloyd
  * (q123); residual quantization spends the same 4 nibbles on the
  * centroid-subtracted remainder, which is the standard IVFADC recall
  * fix. q138 ships the side-by-side histogram.
  */
object IvfPqQueries {

  private val Kc = 16          // coarse clusters
  private val CoarseIters = 2  // q127's pinned k-means depth
  private val M = 4            // PQ subspaces
  private val K = 16           // codewords per subspace
  private val PqIters = 4      // q123's lloyd4 training budget
  private val Sub = 16         // 64 dims / 4 subspaces
  private val Dims = 64

  private def dimList(n: Int): String = (1 to n).mkString("[", ",", "]")

  /** One unrolled fixed-point Lloyd step with PREFIXED CTE names, so
    * the coarse chain (prefix g, dims=64) and the residual-PQ chain
    * (prefix p, dims=16 per subspace) coexist in one WITH. Identical
    * math to SimilarityQueries.lloydIterSql. */
  private def lloydStep(p: String, i: Int, dims: Int): String = {
    val j = i - 1
    s"""${p}ld$i AS (SELECT sv.vec_id, sv.s AS s, sv.sv AS sv, cb.code AS code,
      |    list_dot_product(cb.cw,cb.cw) - 2*list_dot_product(sv.sv,cb.cw) AS score
      |  FROM ${p}sv sv JOIN ${p}cb$j cb ON cb.s = sv.s),
      |${p}lenc$i AS (SELECT vec_id, s, sv, code FROM (
      |    SELECT *, row_number() OVER (PARTITION BY vec_id, s
      |      ORDER BY score, code) AS r FROM ${p}ld$i) WHERE r = 1),
      |${p}lsum$i AS (SELECT s, code, dim, count(*) AS n,
      |    sum(CAST(floor(sv[dim]*1000000 + 0.5) AS BIGINT)) AS sq
      |  FROM ${p}lenc$i, unnest(${dimList(dims)}) t(dim)
      |  GROUP BY 1, 2, 3),
      |${p}lcent$i AS (SELECT s, code, list(sq / (n*1000000.0) ORDER BY dim) AS cw
      |  FROM ${p}lsum$i GROUP BY 1, 2),
      |${p}cb$i AS (SELECT b.s, b.code, coalesce(ct.cw, b.cw) AS cw
      |  FROM ${p}cb$j b LEFT JOIN ${p}lcent$i ct
      |    ON ct.s = b.s AND ct.code = b.code)""".stripMargin
  }

  /** The full IVF-PQ pipeline as one DuckDB query: top-`topK` ADC for
    * queries `vec_id < maxQuery` at the given nprobe. `topKSqlOverride`
    * replaces the shortlist bound with an arbitrary SQL scalar (the
    * q165 self-sizing oracle computes it from cell stats); `extraCtes`
    * are appended after `enc`/`gassign` are in scope. */
  /** The coarse-model CTE prefix — corpus `c`, the seeded/unrolled
    * Lloyd chain, final centroid table `cent`, assignment `gassign` —
    * shared verbatim by [[ivfPqSqlFor]] and the q177 ladder oracle so
    * both replay the IDENTICAL q127-pinned coarse trainer. */
  private def coarseChainSql: String = {
    val coarse = (1 to CoarseIters).map(lloydStep("g", _, Dims))
      .mkString("", ",\n", ",\n")
    s"""c AS MATERIALIZED (
      |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |gseeds AS (SELECT v, row_number() OVER (ORDER BY vec_id) - 1 AS code
      |           FROM (SELECT * FROM c ORDER BY vec_id LIMIT $Kc)),
      |gcb0 AS (SELECT 0 AS s, code, v AS cw FROM gseeds),
      |gsv AS (SELECT vec_id, 0 AS s, v AS sv FROM c),
      |$coarse
      |cent AS MATERIALIZED (SELECT code AS cluster, cw FROM gcb$CoarseIters),
      |gd AS (SELECT sv.vec_id, cb.code AS code,
      |    list_dot_product(cb.cw,cb.cw) - 2*list_dot_product(sv.sv,cb.cw) AS score
      |  FROM gsv sv JOIN gcb$CoarseIters cb ON cb.s = sv.s),
      |gassign AS MATERIALIZED (SELECT vec_id, code AS cluster FROM (
      |    SELECT *, row_number() OVER (PARTITION BY vec_id
      |      ORDER BY score, code) AS r FROM gd) WHERE r = 1)""".stripMargin
  }

  private[queries] def ivfPqSqlFor(maxQuery: Int, nprobe: Int,
      topK: Int = 5, topKSqlOverride: Option[String] = None,
      extraCtes: String = ""): String = {
    val topKSql = topKSqlOverride.getOrElse(topK.toString)
    val extra = if (extraCtes.isEmpty) "" else extraCtes + "\n"
    val pq = (1 to PqIters).map(lloydStep("p", _, Sub))
      .mkString("", ",\n", ",\n")
    s"""WITH $coarseChainSql,
      |rv AS MATERIALIZED (
      |  SELECT c.vec_id, list(c.v[t.d] - ct.cw[t.d] ORDER BY t.d) AS v
      |  FROM c JOIN gassign a ON a.vec_id = c.vec_id
      |         JOIN cent ct ON ct.cluster = a.cluster,
      |       unnest(${dimList(Dims)}) t(d)
      |  GROUP BY c.vec_id),
      |pseeds AS (SELECT v, row_number() OVER (ORDER BY vec_id) - 1 AS code
      |           FROM (SELECT * FROM rv ORDER BY vec_id LIMIT $K)),
      |pcb0 AS (SELECT s, code, v[s*$Sub+1 : s*$Sub+$Sub] AS cw
      |         FROM pseeds, unnest([0,1,2,3]) t(s)),
      |psv AS MATERIALIZED (SELECT vec_id, s, v[s*$Sub+1 : s*$Sub+$Sub] AS sv
      |       FROM rv, unnest([0,1,2,3]) t(s)),
      |$pq
      |pd AS (SELECT sv.vec_id, sv.s AS s, cb.code AS code,
      |    list_dot_product(cb.cw,cb.cw) - 2*list_dot_product(sv.sv,cb.cw) AS score
      |  FROM psv sv JOIN pcb$PqIters cb ON cb.s = sv.s),
      |enc AS MATERIALIZED (SELECT vec_id, s, code FROM (
      |    SELECT *, row_number() OVER (PARTITION BY vec_id, s
      |      ORDER BY score, code) AS r FROM pd) WHERE r = 1),
      |${extra}q AS (SELECT vec_id AS query_id, v AS qv FROM c
      |      WHERE vec_id < $maxQuery),
      |qroute AS (SELECT query_id, cluster, qcp FROM (
      |    SELECT q.query_id, ct.cluster,
      |      list_dot_product(q.qv, ct.cw) AS qcp,
      |      row_number() OVER (PARTITION BY q.query_id ORDER BY
      |        list_dot_product(ct.cw, ct.cw) - 2*list_dot_product(q.qv, ct.cw),
      |        ct.cluster) AS r
      |    FROM q CROSS JOIN cent ct) WHERE r <= $nprobe),
      |lut AS (SELECT query_id, s, code,
      |          list_dot_product(qv[s*$Sub+1 : s*$Sub+$Sub], cw) AS part
      |        FROM q, pcb$PqIters),
      |parts AS (SELECT query_id, e.vec_id AS neighbor_id,
      |            max(CASE WHEN e.s = 0 THEN part END) AS p0,
      |            max(CASE WHEN e.s = 1 THEN part END) AS p1,
      |            max(CASE WHEN e.s = 2 THEN part END) AS p2,
      |            max(CASE WHEN e.s = 3 THEN part END) AS p3
      |          FROM enc e JOIN lut l ON l.s = e.s AND l.code = e.code
      |          GROUP BY 1, 2),
      |scored AS (SELECT r.query_id, a.vec_id AS neighbor_id,
      |    round(r.qcp + p.p0 + p.p1 + p.p2 + p.p3, 6) AS approx_score
      |  FROM qroute r
      |  JOIN gassign a ON a.cluster = r.cluster
      |  JOIN parts p ON p.query_id = r.query_id AND p.neighbor_id = a.vec_id
      |  WHERE r.query_id <> a.vec_id),
      |rk AS (SELECT *, row_number() OVER (PARTITION BY query_id
      |         ORDER BY approx_score DESC, neighbor_id) AS rank FROM scored)
      |SELECT query_id, neighbor_id, rank, approx_score FROM rk
      |WHERE rank <= $topKSql""".stripMargin
  }

  /** Build the persisted index once per call in a scratch dir —
    * the q83 lifecycle pattern. */
  private def builtIndex(s: SparkSession, d: String,
      prefix: String): IvfPq.Index = {
    val emb = Tables.embeddings(s, d)
    val path = tempWorkDir(prefix)
    IvfPq.build(emb, "vec_id", "embedding", kc = Kc,
      coarseIters = CoarseIters, m = M, k = K, pqIters = PqIters, path)
    IvfPq.load(s, path, "vec_id")
  }

  /** ADC top-5 for the first 10 vectors through the PERSISTED index at
    * nprobe=4 — the serving shape: routing + LUTs are per-query
    * constants, the codes scan partition-prunes to 4 of 16 clusters. */
  def ivfPqAnn(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    IvfPq.topK(builtIndex(s, d, "graft_q137_"),
      emb.filter(col("vec_id") < 10), "embedding", k = 5, nprobe = 4)
  }

  val ivfPqAnnSql: String = ivfPqSqlFor(10, 4)

  /** Recall side-by-side at the SAME code bytes (4 nibbles/vector,
    * same Lloyd budget): flat PQ (q123's lloyd4) vs residual IVF-PQ at
    * nprobe=4 (production operating point: scans 1/4 of the codes) and
    * nprobe=16 (probe-all: isolates pure quantization quality from
    * routing loss). Per-query top-5 overlap with the exact
    * brute-force top-5 over 20 queries → histogram per variant. */
  def ivfPqRecall(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val exact = SimilarityQueries.knnBruteForce(s, d)
      .select(col("query_id"), col("neighbor_id"))
    def hist(approx: DataFrame, name: String): DataFrame = {
      val a = approx.select(col("query_id").as("qq"),
        col("neighbor_id").as("qn"))
      exact.join(a,
          col("query_id") === col("qq") && col("neighbor_id") === col("qn"),
          "left")
        .groupBy(col("query_id"))
        .agg(count(col("qn")).as("n_common"))
        .groupBy(col("n_common")).agg(count(lit(1)).as("n_queries"))
        .select(lit(name).as("variant"), col("n_common"), col("n_queries"))
    }
    val flat = graft.operators.ProductQuant.pqTopK(emb,
      emb.filter(col("vec_id") < 20), "vec_id", "embedding",
      m = M, k = K, topK = 5, lloydIters = PqIters)
    val index = builtIndex(s, d, "graft_q138_")
    val queries = emb.filter(col("vec_id") < 20)
    hist(flat, "flat_lloyd4")
      .unionByName(hist(
        IvfPq.topK(index, queries, "embedding", k = 5, nprobe = 4),
        "ivfpq_probe4"))
      .unionByName(hist(
        IvfPq.topK(index, queries, "embedding", k = 5, nprobe = Kc),
        "ivfpq_probe_all"))
  }

  val ivfPqRecallSql: String = {
    def hist(inner: String, name: String): String =
      s"""SELECT '$name' AS variant, n_common, n_queries FROM (
         |  WITH exact AS (${SimilarityQueries.knnBruteForceSql.replace("\n", "\n  ")}),
         |  approx AS (${inner.replace("\n", "\n  ")}),
         |  per_q AS (
         |    SELECT e.query_id, count(a.neighbor_id) AS n_common
         |    FROM exact e LEFT JOIN approx a
         |      ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
         |    GROUP BY 1)
         |  SELECT n_common, count(*) AS n_queries FROM per_q GROUP BY 1)""".stripMargin
    Seq(
      hist(SimilarityQueries.pqSqlFor(20, PqIters), "flat_lloyd4"),
      hist(ivfPqSqlFor(20, 4), "ivfpq_probe4"),
      hist(ivfPqSqlFor(20, Kc), "ivfpq_probe_all")
    ).mkString("\nUNION ALL\n")
  }

  /** q146: [[IvfPq.topKRefined]] — the ADC top-25 shortlist per query
    * re-ranked by EXACT cosine (one candidate-pruned corpus scan),
    * top-5 of the true scores shipped. The oracle replays the entire
    * composite (q137's chain at topK=25) and then the re-rank:
    * candidates joined back to raw vectors, 6-dp cosine, window. */
  def ivfPqRefined(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    IvfPq.topKRefined(builtIndex(s, d, "graft_q146_"), emb,
      emb.filter(col("vec_id") < 10), "embedding", k = 5, nprobe = 4,
      refine = 5)
  }

  val ivfPqRefinedSql: String = {
    def cos(a: String, b: String) =
      s"round(list_dot_product($a,$b)/(sqrt(list_dot_product($a,$a))*sqrt(list_dot_product($b,$b))), 6)"
    s"""WITH sl AS MATERIALIZED (
       |  ${ivfPqSqlFor(10, 4, topK = 25).replace("\n", "\n  ")}),
       |cv AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |qv AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS v
       |       FROM embeddings WHERE vec_id < 10),
       |ex AS (SELECT sl.query_id, sl.neighbor_id,
       |    ${cos("qv.v", "cv.v")} AS similarity
       |  FROM sl JOIN cv ON cv.vec_id = sl.neighbor_id
       |          JOIN qv ON qv.qid = sl.query_id),
       |rr AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |         ORDER BY similarity DESC, neighbor_id) AS rank FROM ex)
       |SELECT query_id, neighbor_id, rank, similarity FROM rr
       |WHERE rank <= 5""".stripMargin
  }

  /** q165: [[IvfPq.topKRefined]] at AUTO-SIZED refine — the shortlist
    * derives from the index's persisted cell stats (shortlist ≈ mean
    * quantization-cell population, the quantity that made refine=10
    * recover nothing at 1M where the cells held ~4000 vectors). The
    * oracle is SELF-SIZING: it recomputes n / occupied-cells from the
    * replayed encoding and bounds the shortlist with the same
    * ceil((n/cells)/k) scalar, so the query stays hash-exact at ANY
    * scale factor — no pinned constant to go stale. */
  def ivfPqAutoRefined(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    IvfPq.topKRefined(builtIndex(s, d, "graft_q165_"), emb,
      emb.filter(col("vec_id") < 10), "embedding", k = 5, nprobe = 4)
  }

  val ivfPqAutoRefinedSql: String = {
    def cos(a: String, b: String) =
      s"round(list_dot_product($a,$b)/(sqrt(list_dot_product($a,$a))*sqrt(list_dot_product($b,$b))), 6)"
    val statsCtes =
      s"""pvt AS (SELECT vec_id,
         |    max(CASE WHEN s = 0 THEN code END) AS c0,
         |    max(CASE WHEN s = 1 THEN code END) AS c1,
         |    max(CASE WHEN s = 2 THEN code END) AS c2,
         |    max(CASE WHEN s = 3 THEN code END) AS c3
         |  FROM enc GROUP BY 1),
         |cellstats AS (SELECT count(*) AS n,
         |    count(DISTINCT (a.cluster, c0, c1, c2, c3)) AS cells
         |  FROM pvt JOIN gassign a ON a.vec_id = pvt.vec_id),
         |refctl AS (SELECT greatest(1,
         |    CAST(ceil((n::DOUBLE / cells) / 5) AS BIGINT)) AS refine
         |  FROM cellstats),""".stripMargin
    val inner = ivfPqSqlFor(10, 4,
      topKSqlOverride = Some("5 * (SELECT refine FROM refctl)"),
      extraCtes = statsCtes)
    s"""WITH sl AS MATERIALIZED (
       |  ${inner.replace("\n", "\n  ")}),
       |cv AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |qv AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS v
       |       FROM embeddings WHERE vec_id < 10),
       |ex AS (SELECT sl.query_id, sl.neighbor_id,
       |    ${cos("qv.v", "cv.v")} AS similarity
       |  FROM sl JOIN cv ON cv.vec_id = sl.neighbor_id
       |          JOIN qv ON qv.qid = sl.query_id),
       |rr AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |         ORDER BY similarity DESC, neighbor_id) AS rank FROM ex)
       |SELECT query_id, neighbor_id, rank, similarity FROM rr
       |WHERE rank <= 5""".stripMargin
  }

  private val LadderShortlist = 15

  /** q177: the coarse∧binary serving ladder — the production "coarse
    * quantizer + binary re-rank" composition ([[graft.operators
    * .HammingIndex.topKProbed]]): the q127-pinned coarse k-means
    * assigns clusters, the 1-bit sign codes are PERSISTED partitioned
    * by cluster, and a query (a) routes to its 4 nearest centroids —
    * pruning the codes scan to 4/16 partitions, (b) Hamming-shortlists
    * 15 within the probed cells off the stored codes, (c) exact-reranks
    * top-5. Cluster pruning × bit pruning = (nprobe/kc)·(1/32) of the
    * corpus bytes before the rerank. The oracle replays ALL THREE
    * stages: the coarse chain (shared verbatim with q137's), the
    * routing argmin, the per-dim sign tests inside probed clusters,
    * and the exact rerank. */
  def ivfHammingLadder(s: SparkSession, d: String): DataFrame = {
    import graft.operators.{HammingIndex, ProductQuant, Similarity}
    val emb = Tables.embeddings(s, d)
    graft.functions.VectorFunctions.register(s)
    val centroids = ProductQuant.trainCodebooksLloyd(
      emb, "vec_id", "embedding", m = 1, k = Kc, iters = CoarseIters).head
    val assigned = Similarity.assignToCentroids(emb, "embedding", centroids)
    val path = tempWorkDir("graft_q177_")
    HammingIndex.build(assigned, "vec_id", "embedding", dim = Dims,
      path, clusterCol = Some("cluster"))
    HammingIndex.topKProbed(HammingIndex.load(s, path, "vec_id"),
      emb, emb.filter(col("vec_id") < 10), "embedding", centroids,
      k = 5, shortlist = LadderShortlist, nprobe = 4)
  }

  val ivfHammingLadderSql: String = {
    val hammingTerms = (1 to Dims)
      .map(i => s"(CASE WHEN (r.qv[$i]>0)<>(cv.v[$i]>0) THEN 1 ELSE 0 END)")
      .mkString("+")
    def cos(a: String, b: String) =
      s"round(list_dot_product($a,$b)/(sqrt(list_dot_product($a,$a))*sqrt(list_dot_product($b,$b))), 6)"
    s"""WITH $coarseChainSql,
       |q AS (SELECT vec_id AS query_id, v AS qv FROM c
       |      WHERE vec_id < 10),
       |qroute AS (SELECT query_id, qv, cluster FROM (
       |    SELECT q.query_id, q.qv, ct.cluster,
       |      row_number() OVER (PARTITION BY q.query_id ORDER BY
       |        list_dot_product(ct.cw, ct.cw) - 2*list_dot_product(q.qv, ct.cw),
       |        ct.cluster) AS r
       |    FROM q CROSS JOIN cent ct) WHERE r <= 4),
       |ham AS (SELECT r.query_id, a.vec_id, r.qv, cv.v AS cv,
       |    ($hammingTerms)::BIGINT AS hamming
       |  FROM qroute r
       |  JOIN gassign a ON a.cluster = r.cluster
       |  JOIN c cv ON cv.vec_id = a.vec_id
       |  WHERE r.query_id <> a.vec_id),
       |short AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |        ORDER BY hamming, vec_id) AS hrank FROM ham),
       |rer AS (SELECT query_id, vec_id AS neighbor_id, hamming,
       |    ${cos("qv", "cv")} AS similarity
       |  FROM short WHERE hrank <= $LadderShortlist),
       |rk AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |        ORDER BY similarity DESC, neighbor_id) AS rank FROM rer)
       |SELECT query_id, neighbor_id, rank, hamming, similarity FROM rk
       |WHERE rank <= 5""".stripMargin
  }

  def all: Seq[Q] = Seq(
    Q("q137_ivfpq_ann", ivfPqAnn, Some(ivfPqAnnSql)),
    Q("q138_ivfpq_recall", ivfPqRecall, Some(ivfPqRecallSql)),
    Q("q146_ivfpq_refined", ivfPqRefined, Some(ivfPqRefinedSql)),
    Q("q165_ivfpq_auto_refined", ivfPqAutoRefined, Some(ivfPqAutoRefinedSql)),
    Q("q177_ivf_hamming_ladder", ivfHammingLadder, Some(ivfHammingLadderSql)))
}
