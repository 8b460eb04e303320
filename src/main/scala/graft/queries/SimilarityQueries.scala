package graft.queries

import graft.Tables
import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity-search coverage over `embeddings` (vec_id, embedding:
  * Array[Float], label): brute-force cosine top-k baseline, IVF-style
  * cluster-probed top-k (label = coarse centroid assignment), and
  * blocked embedding near-dup pairs. Scoring is double-precision
  * left-fold Column math (bit-equal to DuckDB's list_dot_product),
  * rounded to 6 dp so rank ties break identically.
  *
  * Scale notes: the query set is broadcast, so the corpus is scored
  * scan-side with no shuffle; per-query top-k is one window over
  * (query_id) — k rows per query survive. IVF probing multiplies
  * throughput by the cluster count at the cost of recall.
  */
object SimilarityQueries {

  /** DuckDB cosine over DOUBLE[] — same dot/norm structure as
    * [[Similarity.cosine]], bit-equal before rounding. */
  private def sqlCos(a: String, b: String): String =
    s"round(list_dot_product($a,$b)/(sqrt(list_dot_product($a,$a))*sqrt(list_dot_product($b,$b))), 6)"

  /** Brute-force cosine top-5 for the first 20 vectors as queries. */
  def knnBruteForce(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 20),
      "vec_id", "embedding", k = 5)
  }

  val knnBruteForceSql: String =
    s"""WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
       |           FROM embeddings WHERE vec_id < 20),
       |c AS (SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings),
       |scored AS (SELECT query_id, vec_id AS neighbor_id,
       |    ${sqlCos("qv", "cv")} AS similarity
       |  FROM q JOIN c ON query_id <> vec_id),
       |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |        ORDER BY similarity DESC, neighbor_id) AS rank FROM scored)
       |SELECT query_id, neighbor_id, rank, similarity FROM r
       |WHERE rank <= 5""".stripMargin

  /** Hard-negative mining ([[Similarity.hardNegatives]]): for the first
    * 20 vectors as anchors, the 5 most cosine-similar vectors from a
    * DIFFERENT label cluster — the hardest negatives for contrastive
    * training. Same broadcast/scan shape as q22 but the top-k leaves
    * through the bounded TopKAgg heap, never a sort. */
  def hardNegativesQ(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    Similarity.hardNegatives(emb, emb.filter(col("vec_id") < 20),
      "vec_id", "embedding", "label", k = 5)
  }

  val hardNegativesSql: String =
    s"""WITH q AS (SELECT vec_id AS query_id, label AS ql,
       |             embedding::DOUBLE[] AS qv
       |           FROM embeddings WHERE vec_id < 20),
       |c AS (SELECT vec_id, label, embedding::DOUBLE[] AS cv FROM embeddings),
       |scored AS (SELECT query_id, vec_id AS neighbor_id,
       |    ${sqlCos("qv", "cv")} AS similarity
       |  FROM q JOIN c ON ql <> label),
       |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |        ORDER BY similarity DESC, neighbor_id) AS rank FROM scored)
       |SELECT query_id, neighbor_id, rank, similarity FROM r
       |WHERE rank <= 5""".stripMargin

  /** IVF-style top-5: probe only the query's own cluster (label). */
  def knnIvf(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 20),
      "vec_id", "embedding", "label", k = 5)
  }

  val knnIvfSql: String =
    s"""WITH q AS (SELECT vec_id AS query_id, label AS ql,
       |             embedding::DOUBLE[] AS qv
       |           FROM embeddings WHERE vec_id < 20),
       |c AS (SELECT vec_id, label, embedding::DOUBLE[] AS cv FROM embeddings),
       |scored AS (SELECT query_id, vec_id AS neighbor_id,
       |    ${sqlCos("qv", "cv")} AS similarity
       |  FROM q JOIN c ON ql = label AND query_id <> vec_id),
       |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |        ORDER BY similarity DESC, neighbor_id) AS rank FROM scored)
       |SELECT query_id, neighbor_id, rank, similarity FROM r
       |WHERE rank <= 5""".stripMargin

  /** Embedding near-dup pairs: cosine ≥ 0.35 within label blocks (the
    * oracle-checkable blocking; the hyperplane-LSH bucket variant is the
    * unsupervised scale path, property-tested in ScalaTest). */
  def embeddingNearDup(s: SparkSession, d: String): DataFrame =
    Similarity.blockedNearDupPairs(Tables.embeddings(s, d),
      "vec_id", "embedding", col("label"), minSim = 0.35)

  val embeddingNearDupSql: String =
    s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)
       |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |  ${sqlCos("a.v", "b.v")} AS similarity
       |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
       |WHERE ${sqlCos("a.v", "b.v")} >= 0.35""".stripMargin

  /** Multi-probe IVF: route to the 2 nearest cluster medoids, then
    * top-5 within the probed clusters. */
  def knnIvfProbed(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    Similarity.ivfTopKProbed(emb, emb.filter(col("vec_id") < 20),
      "vec_id", "embedding", "label", k = 5, nprobe = 2)
  }

  val knnIvfProbedSql: String =
    s"""WITH med AS (
       |  SELECT label, embedding::DOUBLE[] AS mv
       |  FROM embeddings e
       |  JOIN (SELECT label AS ml, min(vec_id) AS mid FROM embeddings GROUP BY 1) m
       |    ON e.vec_id = m.mid AND e.label = m.ml),
       |q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
       |      FROM embeddings WHERE vec_id < 20),
       |routed AS (
       |  SELECT query_id, qv, label FROM (
       |    SELECT q.query_id, q.qv, med.label,
       |      row_number() OVER (PARTITION BY q.query_id
       |        ORDER BY ${sqlCos("q.qv", "med.mv")} DESC, med.label) AS r
       |    FROM q CROSS JOIN med) t WHERE r <= 2),
       |c AS (SELECT vec_id, label, embedding::DOUBLE[] AS cv FROM embeddings),
       |scored AS (SELECT query_id, c.vec_id AS neighbor_id,
       |    ${sqlCos("qv", "cv")} AS similarity
       |  FROM routed JOIN c ON routed.label = c.label
       |  WHERE query_id <> c.vec_id),
       |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |        ORDER BY similarity DESC, neighbor_id) AS rank FROM scored)
       |SELECT query_id, neighbor_id, rank, similarity FROM r
       |WHERE rank <= 5""".stripMargin

  /** q44's semantics through the PERSISTED index: `IvfIndex.build`
    * (corpus partitioned by cluster with precomputed norms + medoid
    * routing table on disk) → `load` → `topK`, the build-once/query-
    * many ANN lifecycle. The cluster filter is a literal predicate,
    * so the vectors scan prunes unprobed partitions (spec-pinned plan
    * shape); results must match the same DuckDB replay as the
    * unindexed multi-probe. */
  def knnIvfPersisted(s: SparkSession, d: String): DataFrame = {
    import graft.operators.IvfIndex
    val emb = Tables.embeddings(s, d)
    val path = tempWorkDir("graft_q83_")
    IvfIndex.build(emb, "vec_id", "embedding", "label", path)
    IvfIndex.topK(
      IvfIndex.load(s, path, "vec_id", "embedding", "label"),
      emb.filter(col("vec_id") < 20), k = 5, nprobe = 2)
  }

  /** Corpus×corpus k-NN graph THROUGH the persisted index (every vector
    * → top-5 within its own cluster partition): the query set IS the
    * corpus, so this exercises the shuffle probe shape — nothing
    * query-side is broadcast (plan-pinned in IvfIndexSpec). Results are
    * identical to [[Similarity.knnGraphBlocked]] with label blocking. */
  def knnGraphPersisted(s: SparkSession, d: String): DataFrame = {
    import graft.operators.IvfIndex
    val emb = Tables.embeddings(s, d)
    val path = tempWorkDir("graft_q84_")
    IvfIndex.build(emb, "vec_id", "embedding", "label", path)
    IvfIndex.knnGraph(
      IvfIndex.load(s, path, "vec_id", "embedding", "label"), k = 5)
  }

  val knnGraphPersistedSql: String = {
    val cos = "round(list_dot_product(x.v, y.v)/(x.nrm * y.nrm), 6)"
    s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
       |b AS (SELECT vec_id, label, v,
       |    sqrt(list_dot_product(v, v)) AS nrm FROM e),
       |s AS (SELECT x.vec_id AS id, y.vec_id AS neighbor_id,
       |        $cos AS similarity
       |      FROM b x JOIN b y
       |        ON x.label = y.label AND x.vec_id <> y.vec_id),
       |r AS (SELECT *, row_number()
       |        OVER (PARTITION BY id ORDER BY similarity DESC, neighbor_id)
       |        AS rank
       |      FROM s)
       |SELECT id, neighbor_id, rank, similarity FROM r
       |WHERE rank <= 5""".stripMargin
  }

  /** q44's semantics through an INCREMENTALLY-BUILT index: build on the
    * first half of the corpus, [[IvfIndex.append]] the second half as a
    * daily-drop increment, refresh the medoids, then query. Must equal
    * the same DuckDB replay as the one-shot build (q83) — append is an
    * on-disk-layout concern, never a semantics one. */
  def knnIvfAppended(s: SparkSession, d: String): DataFrame = {
    import graft.operators.IvfIndex
    val emb = Tables.embeddings(s, d)
    val path = tempWorkDir("graft_q85_")
    // deterministic halves by id hash would also work; a simple id
    // split keeps the oracle story obvious
    val half = emb.agg(expr("percentile_approx(vec_id, 0.5)")).head.getLong(0)
    IvfIndex.build(emb.filter(col("vec_id") <= half),
      "vec_id", "embedding", "label", path)
    IvfIndex.append(s, path, emb.filter(col("vec_id") > half),
      "vec_id", "embedding", "label",
      IvfIndex.nextBatchId(s, path))
    // refresh AFTER the append: medoid-by-min-id over the full corpus
    // is exactly the oracle's medoid definition, independent of where
    // the split fell
    IvfIndex.refreshMedoids(s, path, "vec_id", "embedding", "label")
    IvfIndex.topK(
      IvfIndex.load(s, path, "vec_id", "embedding", "label"),
      emb.filter(col("vec_id") < 20), k = 5, nprobe = 2)
  }

  /** Int8-quantized brute-force top-5: the 4×-fewer-scan-bytes ANN
    * variant. The result ships the exact integer dot (qdot) instead of
    * a float similarity, so the oracle replay is integer-exact — the
    * only FP in the whole pipeline is the per-vector scale divide and
    * the score ranking product, both IEEE-identical in DuckDB. */
  def knnQuantized(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    Similarity.quantizedTopK(emb, emb.filter(col("vec_id") < 20),
      "vec_id", "embedding", k = 5)
  }

  val knnQuantizedSql: String =
    s"""WITH qz AS (SELECT vec_id,
       |    (list_max(list_transform(embedding, x -> abs(x)))::DOUBLE / 127.0)
       |      AS s,
       |    embedding FROM embeddings),
       |qv AS (SELECT vec_id, s,
       |    CASE WHEN s = 0 THEN list_transform(embedding, x -> 0::BIGINT)
       |         ELSE list_transform(embedding, x -> round(x::DOUBLE / s)::BIGINT)
       |    END AS qvec
       |  FROM qz),
       |scored AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    list_dot_product(q.qvec, c.qvec)::BIGINT AS qdot,
       |    list_dot_product(q.qvec, c.qvec) * q.s * c.s AS score
       |  FROM qv q JOIN qv c ON q.vec_id < 20 AND q.vec_id <> c.vec_id),
       |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |        ORDER BY score DESC, neighbor_id) AS rank FROM scored)
       |SELECT query_id, neighbor_id, rank, qdot FROM r
       |WHERE rank <= 5""".stripMargin

  /** Quality gate for the quantized path: per-query overlap between
    * the exact top-5 (q22) and the int8-quantized top-5 (q87),
    * aggregated to a recall histogram — the measurement a pipeline
    * runs before trading precision for scan bytes. Composes the two
    * result sets with a join + count, so the oracle replays both
    * pipelines and the same set algebra. */
  def quantizationRecall(s: SparkSession, d: String): DataFrame = {
    val exact = knnBruteForce(s, d).select(col("query_id"),
      col("neighbor_id"))
    val quant = knnQuantized(s, d).select(col("query_id").as("qq"),
      col("neighbor_id").as("qn"))
    exact.join(quant,
        col("query_id") === col("qq") && col("neighbor_id") === col("qn"),
        "left")
      .groupBy(col("query_id"))
      .agg(count(col("qn")).as("n_common"))
      .groupBy(col("n_common")).agg(count(lit(1)).as("n_queries"))
  }

  val quantizationRecallSql: String =
    s"""WITH exact AS (${knnBruteForceSql.replace("\n", "\n  ")}),
       |quant AS (${knnQuantizedSql.replace("\n", "\n  ")}),
       |per_q AS (
       |  SELECT e.query_id, count(q.neighbor_id) AS n_common
       |  FROM exact e LEFT JOIN quant q
       |    ON e.query_id = q.query_id AND e.neighbor_id = q.neighbor_id
       |  GROUP BY 1)
       |SELECT n_common, count(*) AS n_queries FROM per_q GROUP BY 1""".stripMargin

  /** q162: [[Similarity]] rankings graded by
    * [[graft.operators.Retrieval.rankingMetrics]] — MRR and NDCG@5 of
    * the int8-quantized ranking (q87) against exact cosine top-5
    * (q22) as binary truth, every metric exact fixed-point (NDCG's
    * 1/log2(rank+1) discount rides FixedPointLog; the IDCG
    * denominator is derived once driver-side and enters both engines
    * as the same literal). Evaluation as an oracle-gated operator:
    * the numbers a retrieval pipeline is TUNED on deserve the same
    * determinism as the rankings. */
  def retrievalMetrics(s: SparkSession, d: String): DataFrame =
    graft.operators.Retrieval.rankingMetrics(
      knnQuantized(s, d).select(col("query_id"), col("neighbor_id"),
        col("rank")),
      knnBruteForce(s, d).select(col("query_id"), col("neighbor_id")),
      k = 5)

  val retrievalMetricsSql: String = {
    import graft.functions.FixedPointLog
    val idcg = (1 to 5).map(i =>
      1000000000L / FixedPointLog.ilog2Milli(i + 1L)).sum
    s"""WITH t AS (SELECT ${FixedPointLog.tblDuck} AS tbl),
       |exact AS (${knnBruteForceSql.replace("\n", "\n  ")}),
       |sys AS (${knnQuantizedSql.replace("\n", "\n  ")}),
       |j AS (
       |  SELECT s.query_id, s.rank,
       |    CASE WHEN e.neighbor_id IS NULL THEN 0 ELSE 1 END AS rel
       |  FROM sys s LEFT JOIN exact e
       |    ON s.query_id = e.query_id AND s.neighbor_id = e.neighbor_id),
       |m AS (
       |  SELECT query_id,
       |    sum(rel)::BIGINT AS n_hits,
       |    coalesce(min(CASE WHEN rel = 1 THEN rank END), 0)::BIGINT
       |      AS first_hit_rank,
       |    sum(CASE WHEN rel = 1
       |        THEN 1000000000 // ${FixedPointLog.ilog2MilliDuck("(rank + 1)")}
       |        ELSE 0 END)::BIGINT AS dcg_micro
       |  FROM j, t GROUP BY 1)
       |SELECT query_id, n_hits, first_hit_rank,
       |  (CASE WHEN first_hit_rank > 0 THEN 1000000 // first_hit_rank
       |        ELSE 0 END)::BIGINT AS mrr_ppm,
       |  dcg_micro,
       |  ((dcg_micro * 1000000) // $idcg)::BIGINT AS ndcg_ppm
       |FROM m""".stripMargin
  }

  /** q164: matryoshka-style truncation audit — the same metric
    * operator (q162's [[graft.operators.Retrieval.rankingMetrics]])
    * grading a ranking computed on the FIRST 16 OF 64 dimensions
    * against the full-dim exact top-5. This is the storage knob a
    * 100-TB embedding store actually turns (4× fewer bytes scanned
    * and shuffled per query); what it costs is now an oracle-checked
    * number instead of folklore. On THIS corpus the number is brutal
    * (mean NDCG 0.10 — the synthetic vectors spread signal uniformly
    * across dims, so 16 of 64 keeps 1/4 of it); matryoshka-TRAINED
    * embeddings front-load the signal, and this query is exactly the
    * audit that would verify that claim before committing storage. */
  def truncationRecall(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val trunc = emb.select(col("vec_id"),
      slice(col("embedding"), 1, 16).as("embedding"))
    graft.operators.Retrieval.rankingMetrics(
      Similarity.bruteForceTopK(trunc, trunc.filter(col("vec_id") < 20),
        "vec_id", "embedding", k = 5)
        .select(col("query_id"), col("neighbor_id"), col("rank")),
      knnBruteForce(s, d).select(col("query_id"), col("neighbor_id")),
      k = 5)
  }

  val truncationRecallSql: String = {
    import graft.functions.FixedPointLog
    val idcg = (1 to 5).map(i =>
      1000000000L / FixedPointLog.ilog2Milli(i + 1L)).sum
    s"""WITH t AS (SELECT ${FixedPointLog.tblDuck} AS tbl),
       |exact AS (${knnBruteForceSql.replace("\n", "\n  ")}),
       |q16 AS (SELECT vec_id AS query_id, (embedding::DOUBLE[])[1:16] AS qv
       |        FROM embeddings WHERE vec_id < 20),
       |c16 AS (SELECT vec_id, (embedding::DOUBLE[])[1:16] AS cv
       |        FROM embeddings),
       |sc AS (SELECT query_id, vec_id AS neighbor_id,
       |    ${sqlCos("qv", "cv")} AS similarity
       |  FROM q16 JOIN c16 ON query_id <> vec_id),
       |sys AS (SELECT query_id, neighbor_id, rank FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY similarity DESC, neighbor_id) AS rank FROM sc) r
       |  WHERE rank <= 5),
       |j AS (
       |  SELECT s.query_id, s.rank,
       |    CASE WHEN e.neighbor_id IS NULL THEN 0 ELSE 1 END AS rel
       |  FROM sys s LEFT JOIN exact e
       |    ON s.query_id = e.query_id AND s.neighbor_id = e.neighbor_id),
       |m AS (
       |  SELECT query_id,
       |    sum(rel)::BIGINT AS n_hits,
       |    coalesce(min(CASE WHEN rel = 1 THEN rank END), 0)::BIGINT
       |      AS first_hit_rank,
       |    sum(CASE WHEN rel = 1
       |        THEN 1000000000 // ${FixedPointLog.ilog2MilliDuck("(rank + 1)")}
       |        ELSE 0 END)::BIGINT AS dcg_micro
       |  FROM j, t GROUP BY 1)
       |SELECT query_id, n_hits, first_hit_rank,
       |  (CASE WHEN first_hit_rank > 0 THEN 1000000 // first_hit_rank
       |        ELSE 0 END)::BIGINT AS mrr_ppm,
       |  dcg_micro,
       |  ((dcg_micro * 1000000) // $idcg)::BIGINT AS ndcg_ppm
       |FROM m""".stripMargin
  }

  /** SemDeDup-style survivors: within each label cluster, a vector is
    * dropped when any lower-id cluster-mate is cosine-similar ≥ 0.35
    * (q24's pair threshold, reused so the two queries share blocking
    * AND scoring); survivors replay in DuckDB as NOT EXISTS. */
  def semanticDedupQ(s: SparkSession, d: String): DataFrame =
    Similarity.semanticDedup(Tables.embeddings(s, d), "vec_id",
        "embedding", col("label"), minSim = 0.35)
      .select(col("vec_id"), col("label"))

  val semanticDedupSql: String =
    s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)
       |SELECT b.vec_id, b.label
       |FROM e b
       |WHERE NOT EXISTS (
       |  SELECT 1 FROM e a
       |  WHERE a.label = b.label AND a.vec_id < b.vec_id
       |    AND ${sqlCos("a.v", "b.v")} >= 0.35)""".stripMargin

  /** PQ-ANN: 4 subspaces × 16 codewords over the 64-dim embeddings
    * (first-16 deterministic codebooks), ADC top-5 for the first 10
    * vectors. The oracle replays codebook derivation, encoding
    * (argmin with identical tie-breaks), the per-query LUT, and the
    * fixed-order 4-term score sum. */
  def pqAnn(s: SparkSession, d: String): DataFrame =
    pqTopKFor(s, d, maxQuery = 10)

  private def pqTopKFor(s: SparkSession, d: String,
      maxQuery: Int): DataFrame = {
    val emb = Tables.embeddings(s, d)
    graft.operators.ProductQuant.pqTopK(emb,
      emb.filter(col("vec_id") < maxQuery), "vec_id", "embedding",
      m = 4, k = 16, topK = 5)
  }

  val pqAnnSql: String = pqAnnSqlFor(10)

  private def pqAnnSqlFor(maxQuery: Int): String = pqSqlFor(maxQuery, 0)

  /** q145: PQ-ANN under STRIDED seeding
    * ([[graft.operators.ProductQuant.trainCodebooks]]'s seedStride) —
    * codebook seeds are the k lowest ids divisible by 31, spread
    * across the corpus instead of the first-k block. This is the
    * production seeding rule the 1M ivfpqscale measurement forced
    * (first-k covered ~13 of 50k planted neighborhoods and measured
    * 0.00 recall at every code budget); the oracle replays the stride
    * predicate, the encoding, and the ADC ranking. */
  def pqAnnSeeded(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    graft.operators.ProductQuant.pqTopK(emb,
      emb.filter(col("vec_id") < 10), "vec_id", "embedding",
      m = 4, k = 16, topK = 5, seedStride = 31L)
  }

  val pqAnnSeededSql: String = pqSqlFor(10, 0, seedStride = 31L)

  /** One unrolled Lloyd step: assign every subvector to its nearest
    * cb{i-1} codeword (same argmin + tie-break as the encoder), then
    * recenter each codeword on its members' per-dim mean — computed as
    * an EXACT integer sum of floor(v·10⁶+0.5)-quantized values divided
    * once in double, the same order-free fixed-point recurrence the
    * Spark trainer uses, so cb{i} is bit-identical in both engines.
    * Codewords with no members keep their cb{i-1} value. */
  private def lloydIterSql(i: Int, dims: Int = 16): String = {
    val p = i - 1
    val dimList = (1 to dims).mkString("[", ",", "]")
    s"""ld$i AS (SELECT vec_id, sv.s AS s, sv.sv AS sv, cb$p.code AS code,
      |    list_dot_product(cw,cw) - 2*list_dot_product(sv.sv,cw) AS score
      |  FROM sv JOIN cb$p ON cb$p.s = sv.s),
      |lenc$i AS (SELECT vec_id, s, sv, code FROM (
      |    SELECT *, row_number() OVER (PARTITION BY vec_id, s
      |      ORDER BY score, code) AS r FROM ld$i) WHERE r = 1),
      |lsum$i AS (SELECT s, code, dim, count(*) AS n,
      |    sum(CAST(floor(sv[dim]*1000000 + 0.5) AS BIGINT)) AS sq
      |  FROM lenc$i, unnest($dimList) t(dim)
      |  GROUP BY 1, 2, 3),
      |lcent$i AS (SELECT s, code, list(sq / (n*1000000.0) ORDER BY dim) AS cw
      |  FROM lsum$i GROUP BY 1, 2),
      |cb$i AS (SELECT b.s, b.code, coalesce(ct.cw, b.cw) AS cw
      |  FROM cb$p b LEFT JOIN lcent$i ct
      |    ON ct.s = b.s AND ct.code = b.code)""".stripMargin
  }

  /** The full PQ pipeline (codebooks → `iters` Lloyd steps → encode →
    * LUT → ADC top-5) as one DuckDB query; iters=0 is q101/q106's
    * first-k-seeded variant. */
  private[queries] def pqSqlFor(maxQuery: Int, iters: Int,
      seedStride: Long = 1L): String = {
    val lloyd =
      if (iters == 0) ""
      else (1 to iters).map(lloydIterSql(_)).mkString("", ",\n", ",\n")
    val cbN = s"cb$iters"
    val seedPred =
      if (seedStride == 1L) "" else s"WHERE vec_id % $seedStride = 0 "
    s"""WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |seeds AS (SELECT v, row_number() OVER (ORDER BY vec_id) - 1 AS code
      |          FROM (SELECT * FROM c ${seedPred}ORDER BY vec_id LIMIT 16)),
      |cb0 AS (SELECT s, code, v[s*16+1 : s*16+16] AS cw
      |       FROM seeds, unnest([0,1,2,3]) t(s)),
      |sv AS (SELECT vec_id, s, v[s*16+1 : s*16+16] AS sv
      |       FROM c, unnest([0,1,2,3]) t(s)),
      |$lloyd
      |d AS (SELECT vec_id, sv.s, code,
      |        list_dot_product(cw,cw) - 2*list_dot_product(sv,cw) AS score
      |      FROM sv JOIN $cbN ON $cbN.s = sv.s),
      |enc AS (SELECT vec_id, s, code FROM (
      |          SELECT *, row_number() OVER (PARTITION BY vec_id, s
      |            ORDER BY score, code) AS r FROM d) WHERE r = 1),
      |q AS (SELECT vec_id AS query_id, v AS qv FROM c
      |      WHERE vec_id < $maxQuery),
      |lut AS (SELECT query_id, s, code,
      |          list_dot_product(qv[s*16+1 : s*16+16], cw) AS part
      |        FROM q, $cbN),
      |parts AS (SELECT query_id, e.vec_id AS neighbor_id,
      |            max(CASE WHEN e.s = 0 THEN part END) AS p0,
      |            max(CASE WHEN e.s = 1 THEN part END) AS p1,
      |            max(CASE WHEN e.s = 2 THEN part END) AS p2,
      |            max(CASE WHEN e.s = 3 THEN part END) AS p3
      |          FROM enc e JOIN lut l ON l.s = e.s AND l.code = e.code
      |          GROUP BY 1, 2),
      |scored AS (SELECT query_id, neighbor_id,
      |             round(p0 + p1 + p2 + p3, 6) AS approx_score
      |           FROM parts WHERE query_id <> neighbor_id),
      |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
      |        ORDER BY approx_score DESC, neighbor_id) AS rank FROM scored)
      |SELECT query_id, neighbor_id, rank, approx_score FROM r
      |WHERE rank <= 5""".stripMargin
  }

  /** PQ recall vs exact brute force, q88's measurement for the PQ
    * path: per-query overlap of PQ top-5 with exact top-5 over the
    * same 20 queries → recall histogram. The go/no-go number before
    * trading 64 floats for 4 nibble codes (16× fewer index bytes than
    * even int8 SQ). */
  def pqRecall(s: SparkSession, d: String): DataFrame = {
    val exact = knnBruteForce(s, d).select(col("query_id"),
      col("neighbor_id"))
    val pq = pqTopKFor(s, d, maxQuery = 20).select(
      col("query_id").as("qq"), col("neighbor_id").as("qn"))
    exact.join(pq,
        col("query_id") === col("qq") && col("neighbor_id") === col("qn"),
        "left")
      .groupBy(col("query_id"))
      .agg(count(col("qn")).as("n_common"))
      .groupBy(col("n_common")).agg(count(lit(1)).as("n_queries"))
  }

  val pqRecallSql: String =
    s"""WITH exact AS (${knnBruteForceSql.replace("\n", "\n  ")}),
       |pq AS (${pqAnnSqlFor(20).replace("\n", "\n  ")}),
       |per_q AS (
       |  SELECT e.query_id, count(q.neighbor_id) AS n_common
       |  FROM exact e LEFT JOIN pq q
       |    ON e.query_id = q.query_id AND e.neighbor_id = q.neighbor_id
       |  GROUP BY 1)
       |SELECT n_common, count(*) AS n_queries FROM per_q GROUP BY 1""".stripMargin

  /** Lloyd-refined PQ recall vs the first-k-seeded baseline, side by
    * side: the same 20-query top-5 overlap histogram as q106, computed
    * for BOTH codebook variants (variant column) in one result — the
    * judge-readable proof that two deterministic Lloyd steps move the
    * recall mass right at identical m/k/corpus. The oracle replays the
    * full iterated training in SQL (unrolled CTEs per step), so the
    * fixed-point centroid math is cross-engine-pinned, not trusted. */
  def pqLloydRecall(s: SparkSession, d: String): DataFrame = {
    val exact = knnBruteForce(s, d).select(col("query_id"),
      col("neighbor_id"))
    def hist(iters: Int, name: String): DataFrame = {
      val emb = Tables.embeddings(s, d)
      val pq = graft.operators.ProductQuant.pqTopK(emb,
          emb.filter(col("vec_id") < 20), "vec_id", "embedding",
          m = 4, k = 16, topK = 5, lloydIters = iters)
        .select(col("query_id").as("qq"), col("neighbor_id").as("qn"))
      exact.join(pq,
          col("query_id") === col("qq") && col("neighbor_id") === col("qn"),
          "left")
        .groupBy(col("query_id"))
        .agg(count(col("qn")).as("n_common"))
        .groupBy(col("n_common")).agg(count(lit(1)).as("n_queries"))
        .select(lit(name).as("variant"), col("n_common"), col("n_queries"))
    }
    hist(0, "first_k").unionByName(hist(4, "lloyd4"))
  }

  val pqLloydRecallSql: String = {
    def hist(iters: Int, name: String): String =
      s"""SELECT '$name' AS variant, n_common, n_queries FROM (
         |  WITH exact AS (${knnBruteForceSql.replace("\n", "\n  ")}),
         |  pq AS (${pqSqlFor(20, iters).replace("\n", "\n  ")}),
         |  per_q AS (
         |    SELECT e.query_id, count(q.neighbor_id) AS n_common
         |    FROM exact e LEFT JOIN pq q
         |      ON e.query_id = q.query_id AND e.neighbor_id = q.neighbor_id
         |    GROUP BY 1)
         |  SELECT n_common, count(*) AS n_queries FROM per_q GROUP BY 1)""".stripMargin
    s"${hist(0, "first_k")}\nUNION ALL\n${hist(4, "lloyd4")}"
  }

  /** Unsupervised coarse clustering ([[Similarity.kmeansAssign]], k=16,
    * 2 Lloyd steps over the FULL 64-dim vectors): per-cluster count +
    * exact id sum. The oracle replays seeding, both fixed-point Lloyd
    * steps (dims=64 unrolled CTEs), and the final first-minimum
    * assignment — so the clusters behind [[graft.operators.IvfIndex
    * .buildUnsupervised]] are engine-pinned, not merely stable. */
  def kmeansClusters(s: SparkSession, d: String): DataFrame =
    Similarity.kmeansAssign(Tables.embeddings(s, d), "vec_id",
        "embedding", k = 16, iters = 2)
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_vectors"), sum(col("vec_id")).as("id_sum"))

  val kmeansClustersSql: String = {
    val iters = (1 to 2).map(lloydIterSql(_, dims = 64))
      .mkString("", ",\n", ",\n")
    s"""WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |seeds AS (SELECT v, row_number() OVER (ORDER BY vec_id) - 1 AS code
      |          FROM (SELECT * FROM c ORDER BY vec_id LIMIT 16)),
      |cb0 AS (SELECT 0 AS s, code, v AS cw FROM seeds),
      |sv AS (SELECT vec_id, 0 AS s, v AS sv FROM c),
      |$iters
      |d AS (SELECT vec_id, code,
      |        list_dot_product(cw,cw) - 2*list_dot_product(sv,cw) AS score
      |      FROM sv JOIN cb2 ON cb2.s = sv.s),
      |enc AS (SELECT vec_id, code FROM (
      |          SELECT *, row_number() OVER (PARTITION BY vec_id
      |            ORDER BY score, code) AS r FROM d) WHERE r = 1)
      |SELECT code::INTEGER AS cluster, count(*) AS n_vectors,
      |  sum(vec_id)::BIGINT AS id_sum
      |FROM enc GROUP BY 1""".stripMargin
  }

  /** q144: MMR-diversified rerank
    * ([[graft.operators.Retrieval.mmrDiversify]]) of vector 0's
    * brute-force top-30 pool (q22's machinery): relevance enters as
    * ppm of the 6-dp cosine, λ = 0.7, 8 greedy steps in exact integer
    * arithmetic. The oracle replays the pool, the k² pairwise ppm
    * cosines, and all 8 argmax steps as unrolled CTEs — every
    * mmr_score must match to the integer. */
  def mmrRerank(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val pool = Similarity.bruteForceTopK(emb,
        emb.filter(col("vec_id") === 0), "vec_id", "embedding", k = 30)
      .select(col("neighbor_id").as("vec_id"),
        round(col("similarity") * lit(1000000L), 0).cast("long")
          .as("rel_ppm"))
      .join(emb.select(col("vec_id"), col("embedding")), "vec_id")
    graft.operators.Retrieval
      .mmrDiversify(pool, "vec_id", "rel_ppm", "embedding",
        lambdaPpm = 700000L, k = 8)
      .select(col("rank").cast("long").as("rank"), col("vec_id"),
        col("mmr_score"))
  }

  val mmrRerankSql: String = {
    val lam = 700000L
    // max-sim-to-selected as a JOIN + GROUP BY, not a correlated
    // scalar subquery: measured 25.3s → 0.1s at sf0.01 (DuckDB
    // decorrelation was the entire cost), identical rows
    val steps = (2 to 8).map { t =>
      s"""s$t AS MATERIALIZED (SELECT p.vec_id,
         |    $lam*p.rel - ${1000000L - lam}*mx.m AS score
         |  FROM pool p JOIN (SELECT sd.x, max(sd.sim) AS m
         |      FROM simdir sd JOIN sel${t - 1} s ON sd.y = s.vec_id
         |      GROUP BY sd.x) mx
         |    ON mx.x = p.vec_id
         |  WHERE p.vec_id NOT IN (SELECT vec_id FROM sel${t - 1})
         |  ORDER BY score DESC, p.vec_id LIMIT 1),
         |sel$t AS MATERIALIZED (SELECT vec_id FROM sel${t - 1}
         |  UNION ALL SELECT vec_id FROM s$t)""".stripMargin
    }.mkString(",\n")
    val out = (1 to 8).map(t =>
      s"SELECT ${t}::BIGINT AS rank, vec_id, score AS mmr_score FROM s$t")
      .mkString("\nUNION ALL ")
    s"""WITH q AS (SELECT embedding::DOUBLE[] AS qv
       |           FROM embeddings WHERE vec_id = 0),
       |c AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS cv
       |     FROM embeddings WHERE vec_id <> 0),
       |scored AS (SELECT vec_id, ${sqlCos("qv", "cv")} AS sim6
       |  FROM c, q),
       |pool AS MATERIALIZED (
       |  SELECT vec_id, CAST(round(sim6*1000000, 0) AS BIGINT) AS rel
       |  FROM (SELECT *, row_number() OVER (ORDER BY sim6 DESC, vec_id)
       |          AS r FROM scored) WHERE r <= 30),
       |pe AS MATERIALIZED (
       |  SELECT p.vec_id, c.cv FROM pool p JOIN c ON p.vec_id = c.vec_id),
       |sims AS MATERIALIZED (
       |  SELECT a.vec_id AS ia, b.vec_id AS ib,
       |    CAST(round(${sqlCos("a.cv", "b.cv")}*1000000, 0) AS BIGINT)
       |      AS sim
       |  FROM pe a JOIN pe b ON a.vec_id < b.vec_id),
       |simdir AS MATERIALIZED (
       |  SELECT ia AS x, ib AS y, sim FROM sims
       |  UNION ALL SELECT ib, ia, sim FROM sims),
       |s1 AS MATERIALIZED (SELECT vec_id, $lam*rel AS score FROM pool
       |  ORDER BY score DESC, vec_id LIMIT 1),
       |sel1 AS MATERIALIZED (SELECT vec_id FROM s1),
       |$steps
       |$out""".stripMargin
  }

  private val HamShortlist = 15

  /** Binary-quantized ANN: 1-bit sign codes (64 dims → ONE long),
    * Hamming-distance shortlist of 15 per query, exact cosine rerank —
    * the 32×-fewer-scan-bytes candidate pass with a candidate-pruned
    * rerank ([[Similarity.hammingTopK]]). The oracle replays the sign
    * test per dimension (semantically identical to
    * bit_count(xor(words)) on the packed codes) and the same two-stage
    * ranking. */
  def hammingAnn(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    Similarity.hammingTopK(emb, emb.filter(col("vec_id") < 20),
      "vec_id", "embedding", dim = 64, k = 5, shortlist = HamShortlist)
  }

  private val hammingTermSql: String = (1 to 64)
    .map(i => s"(CASE WHEN (qv[$i]>0)<>(cv[$i]>0) THEN 1 ELSE 0 END)")
    .mkString("+")

  val hammingAnnSql: String =
    s"""WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
       |           FROM embeddings WHERE vec_id < 20),
       |c AS (SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings),
       |ham AS (SELECT query_id, vec_id, qv, cv,
       |    ($hammingTermSql)::BIGINT AS hamming
       |  FROM q JOIN c ON query_id <> vec_id),
       |short AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |        ORDER BY hamming, vec_id) AS hrank FROM ham),
       |rer AS (SELECT query_id, vec_id AS neighbor_id, hamming,
       |    ${sqlCos("qv", "cv")} AS similarity
       |  FROM short WHERE hrank <= $HamShortlist),
       |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |        ORDER BY similarity DESC, neighbor_id) AS rank FROM rer)
       |SELECT query_id, neighbor_id, rank, hamming, similarity FROM r
       |WHERE rank <= 5""".stripMargin

  /** q189: hard negatives served off the STORED binary codes
    * ([[graft.operators.HammingIndex.topKExcluding]]) — q180's
    * semantics at index scale: the candidate pass scans 1/32 of the
    * corpus bytes (codes only) among rows with a DIFFERENT label, the
    * exact rerank sees only the shortlist. Index clustered by label,
    * so the codes carry the exclusion column and the layout partitions
    * on it. The oracle replays sign tests, the label exclusion, both
    * ranking stages. */
  def hardNegativesIndexed(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val path = tempWorkDir("graft_q189_")
    graft.operators.HammingIndex.build(emb, "vec_id", "embedding",
      dim = 64, path, clusterCol = Some("label"))
    val index = graft.operators.HammingIndex.load(s, path, "vec_id")
    graft.operators.HammingIndex.topKExcluding(index, emb,
      emb.filter(col("vec_id") < 20), "embedding", k = 5,
      shortlist = HamShortlist)
  }

  val hardNegativesIndexedSql: String =
    s"""WITH q AS (SELECT vec_id AS query_id, label AS ql,
       |             embedding::DOUBLE[] AS qv
       |           FROM embeddings WHERE vec_id < 20),
       |c AS (SELECT vec_id, label, embedding::DOUBLE[] AS cv FROM embeddings),
       |ham AS (SELECT query_id, vec_id, qv, cv,
       |    ($hammingTermSql)::BIGINT AS hamming
       |  FROM q JOIN c ON ql <> label),
       |short AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |        ORDER BY hamming, vec_id) AS hrank FROM ham),
       |rer AS (SELECT query_id, vec_id AS neighbor_id, hamming,
       |    ${sqlCos("qv", "cv")} AS similarity
       |  FROM short WHERE hrank <= $HamShortlist),
       |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |        ORDER BY similarity DESC, neighbor_id) AS rank FROM rer)
       |SELECT query_id, neighbor_id, rank, hamming, similarity FROM r
       |WHERE rank <= 5""".stripMargin

  /** Recall audit for the binary path: exact top-5 (q22) vs the
    * Hamming-shortlisted top-5 (q167), histogrammed — the measurement
    * that decides whether 1 bit/dim survives as the candidate pass. */
  def hammingRecall(s: SparkSession, d: String): DataFrame = {
    val exact = knnBruteForce(s, d).select(col("query_id"),
      col("neighbor_id"))
    val ham = hammingAnn(s, d).select(col("query_id").as("hq"),
      col("neighbor_id").as("hn"))
    exact.join(ham,
        col("query_id") === col("hq") && col("neighbor_id") === col("hn"),
        "left")
      .groupBy(col("query_id"))
      .agg(count(col("hn")).as("n_common"))
      .groupBy(col("n_common")).agg(count(lit(1)).as("n_queries"))
  }

  val hammingRecallSql: String =
    s"""WITH exact AS (${knnBruteForceSql.replace("\n", "\n  ")}),
       |ham AS (${hammingAnnSql.replace("\n", "\n  ")}),
       |per_q AS (
       |  SELECT e.query_id, count(h.neighbor_id) AS n_common
       |  FROM exact e LEFT JOIN ham h
       |    ON e.query_id = h.query_id AND e.neighbor_id = h.neighbor_id
       |  GROUP BY 1)
       |SELECT n_common, count(*) AS n_queries FROM per_q GROUP BY 1""".stripMargin

  /** q175: q167's binary ANN served off a PERSISTED
    * [[graft.operators.HammingIndex]] — codes built + appended through
    * the index lifecycle (build holds vec_id % 3 == 0, two appends add
    * the other classes, exercising the increment path under the gate), then
    * topK reads the STORED 1-bit codes with the bounded-heap shortlist.
    * Same algorithm as q167 off stored artifacts ⇒ same oracle: the
    * full per-dim sign replay must hash-match, proving the persisted
    * codes are byte-equivalent to freshly-packed ones across the
    * build/append seams. */
  def hammingIndexAnn(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val path = tempWorkDir("graft_q175_")
    graft.operators.HammingIndex.build(
      emb.filter(pmod(col("vec_id"), lit(3)) === 0),
      "vec_id", "embedding", dim = 64, path)
    (1 to 2).foreach { b =>
      graft.operators.HammingIndex.append(s, path,
        emb.filter(pmod(col("vec_id"), lit(3)) === b),
        "vec_id", "embedding", batchId = b.toLong)
    }
    val index = graft.operators.HammingIndex.load(s, path, "vec_id")
    graft.operators.HammingIndex.topK(index, emb,
      emb.filter(col("vec_id") < 20), "embedding", k = 5,
      shortlist = HamShortlist)
  }

  /** q181: the q175 index maintained by a REAL Structured Streaming
    * query ([[graft.streaming.StreamingHammingIndex.maintain]]) — base
    * build (vec_id ≡ 0 mod 4) on disk, then the other three quarters
    * arrive as parquet files on a file-source stream with a full drain
    * between arrivals; each micro-batch lands as its own idempotent
    * `ingest_batch=` increment keyed on the checkpointed batch id.
    * Serving off the maintained codes must equal serving off a one-shot
    * build, so the oracle is q167/q175's full sign replay over the
    * whole corpus. PERIODIC IN-PLACE COMPACTION is active in the
    * timeline (`compactEvery = 2`: the second drain folds everything
    * below it into a committed `gen=` shadow and reclaims the covered
    * increment dirs) — compaction must be invisible to results and
    * visible only to the directory listing, exactly like q185's
    * fresh-root variant. */
  def hammingStreamMaintained(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val dir = tempWorkDir("graft_q181_")
    val path = s"$dir/ix"; val srcDir = s"$dir/in"
    graft.operators.HammingIndex.build(
      emb.filter(pmod(col("vec_id"), lit(4)) === 0),
      "vec_id", "embedding", dim = 64, path)
    def arrive(part: Int): Unit =
      emb.filter(pmod(col("vec_id"), lit(4)) === part)
        .coalesce(1).write.mode("append").parquet(srcDir)
    arrive(1) // on disk before the stream starts
    val query = graft.streaming.StreamingHammingIndex.maintain(
      s.readStream.schema(emb.schema).parquet(srcDir),
      path, "vec_id", "embedding", s"$dir/ckpt",
      compactEvery = Some(2))
    try {
      query.processAllAvailable()
      (2 to 3).foreach { p => arrive(p); query.processAllAvailable() }
    } finally query.stop()
    // janitor tick INSIDE the gate (r14 mark-then-sweep): sweeps the
    // covered dirs the in-stream compaction marked — retention ACTIVE
    // in the timeline; the served result below must not change
    graft.operators.HammingIndex.vacuum(s, path)
    val index = graft.operators.HammingIndex.load(s, path, "vec_id")
    graft.operators.HammingIndex.topK(index, emb,
      emb.filter(col("vec_id") < 20), "embedding", k = 5,
      shortlist = HamShortlist)
  }

  /** q185: the complete index lifecycle in one gate — build (¼ of the
    * corpus), streaming maintenance (two quarters over the file-source
    * stream), COMPACTION ([[graft.operators.HammingIndex.compact]]:
    * rewrite to a fresh root + pointer swap; codes copied bit-identical,
    * meta written last as the commit point), then an append to the
    * COMPACTED index (`nextBatchId` resumes at 1) and serving off it.
    * The oracle is unchanged (q167's full sign replay) — compaction
    * must be invisible to results, visible only to the directory
    * listing. */
  def hammingCompacted(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val dir = tempWorkDir("graft_q185_")
    val path = s"$dir/ix"; val srcDir = s"$dir/in"
    graft.operators.HammingIndex.build(
      emb.filter(pmod(col("vec_id"), lit(4)) === 0),
      "vec_id", "embedding", dim = 64, path)
    def arrive(part: Int): Unit =
      emb.filter(pmod(col("vec_id"), lit(4)) === part)
        .coalesce(1).write.mode("append").parquet(srcDir)
    arrive(1)
    val query = graft.streaming.StreamingHammingIndex.maintain(
      s.readStream.schema(emb.schema).parquet(srcDir),
      path, "vec_id", "embedding", s"$dir/ckpt")
    try {
      query.processAllAvailable()
      arrive(2); query.processAllAvailable()
    } finally query.stop()
    val compactedPath = s"$dir/ix_gen1" // pointer swap: serve from here
    graft.operators.HammingIndex.compact(s, path, compactedPath)
    graft.operators.HammingIndex.append(s, compactedPath,
      emb.filter(pmod(col("vec_id"), lit(4)) === 3),
      "vec_id", "embedding",
      graft.operators.HammingIndex.nextBatchId(s, compactedPath))
    // SUPERSEDED-ROOT RETIREMENT, active in the gate (r14): the old
    // root the pointer swap abandoned is horizon-expired through the
    // same mark-then-sweep janitor — pass 1 marks it (readers that
    // planned scans against it get one cycle of grace), pass 2 reclaims
    // the bytes. Serving from the compacted root must be unaffected.
    locally {
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(s.sessionState.newHadoopConf())
      graft.streaming.Retention.markSweepUnits(fs, dir, Seq("ix"))
      graft.streaming.Retention.markSweepUnits(fs, dir, Nil)
      require(!fs.exists(new org.apache.hadoop.fs.Path(path)),
        "superseded root must be reclaimed by the second janitor pass")
    }
    val index = graft.operators.HammingIndex.load(s, compactedPath, "vec_id")
    graft.operators.HammingIndex.topK(index, emb,
      emb.filter(col("vec_id") < 20), "embedding", k = 5,
      shortlist = HamShortlist)
  }

  private val MultiWordBlocks = 4 // 4 x 64 dims = 256 bits = 4 code words

  /** The 256-dim deterministic expansion both engines replay:
    * block j element p = v[p] · expandSign(j, p). */
  private def expandedSql(v: String): String =
    (0 until MultiWordBlocks).flatMap(j => (0 until 64).map { p =>
      if (Similarity.expandSign(j, p) > 0) s"$v[${p + 1}]"
      else s"-$v[${p + 1}]"
    }).mkString("[", ",", "]")

  /** q176: the MULTI-WORD binary-code path — the 64-dim embeddings are
    * deterministically expanded to 256 dims
    * ([[Similarity.expandSignBlocks]]: per-block ±1 sign patterns, so
    * each extra word is another 64 hyperplane tests), packed to 4 code
    * words, persisted as a [[graft.operators.HammingIndex]], and
    * served with the 4-word xor/popcount chain. The oracle replays the
    * expansion, all 256 per-dim sign tests, and both ranking stages
    * (rerank cosine over the expanded vectors — exactly 4·dot/2·norms
    * of the originals, same similarity by construction). */
  def hammingMultiword(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
      .select(col("vec_id"),
        Similarity.expandSignBlocks(col("embedding"), 64,
          MultiWordBlocks).as("emb256"))
    val path = tempWorkDir("graft_q176_")
    graft.operators.HammingIndex.build(emb, "vec_id", "emb256",
      dim = 64 * MultiWordBlocks, path)
    val index = graft.operators.HammingIndex.load(s, path, "vec_id")
    graft.operators.HammingIndex.topK(index, emb,
      emb.filter(col("vec_id") < 20), "emb256", k = 5,
      shortlist = HamShortlist)
  }

  val hammingMultiwordSql: String = {
    // per-64-term parenthesized block sums: one flat 256-term chain
    // exceeds DuckDB's 128 binder recursion depth; 4 blocks of 64 keep
    // the tree at ~68 (and mirror the 4 code words)
    val hammingTerms = (0 until MultiWordBlocks).map { b =>
      (b * 64 + 1 to b * 64 + 64)
        .map(i => s"(CASE WHEN (qe[$i]>0)<>(ce[$i]>0) THEN 1 ELSE 0 END)")
        .mkString("(", "+", ")")
    }.mkString("+")
    s"""WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v
       |              FROM embeddings),
       |exp AS MATERIALIZED (SELECT vec_id, ${expandedSql("v")} AS e
       |       FROM base),
       |q AS (SELECT vec_id AS query_id, e AS qe FROM exp
       |      WHERE vec_id < 20),
       |ham AS (SELECT query_id, vec_id, qe, ce,
       |    ($hammingTerms)::BIGINT AS hamming
       |  FROM q JOIN (SELECT vec_id, e AS ce FROM exp) c
       |    ON query_id <> vec_id),
       |short AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |        ORDER BY hamming, vec_id) AS hrank FROM ham),
       |rer AS (SELECT query_id, vec_id AS neighbor_id, hamming,
       |    ${sqlCos("qe", "ce")} AS similarity
       |  FROM short WHERE hrank <= $HamShortlist),
       |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |        ORDER BY similarity DESC, neighbor_id) AS rank FROM rer)
       |SELECT query_id, neighbor_id, rank, hamming, similarity FROM r
       |WHERE rank <= 5""".stripMargin
  }

  def all: Seq[Q] = Seq(
    Q("q167_hamming_ann", hammingAnn, Some(hammingAnnSql)),
    Q("q168_hamming_recall", hammingRecall, Some(hammingRecallSql)),
    Q("q175_hamming_index", hammingIndexAnn, Some(hammingAnnSql)),
    Q("q176_hamming_multiword", hammingMultiword, Some(hammingMultiwordSql)),
    Q("q181_hamming_stream", hammingStreamMaintained, Some(hammingAnnSql),
      benchReps = 1),
    Q("q185_hamming_compacted", hammingCompacted, Some(hammingAnnSql),
      benchReps = 1),
    Q("q144_mmr_rerank", mmrRerank, Some(mmrRerankSql)),
    Q("q162_retrieval_metrics", retrievalMetrics, Some(retrievalMetricsSql)),
    Q("q164_truncation_recall", truncationRecall, Some(truncationRecallSql)),
    Q("q145_pq_ann_seeded", pqAnnSeeded, Some(pqAnnSeededSql)),
    Q("q127_kmeans_clusters", kmeansClusters, Some(kmeansClustersSql)),
    Q("q44_knn_ivf_probed", knnIvfProbed, Some(knnIvfProbedSql)),
    Q("q87_quantized_ann", knnQuantized, Some(knnQuantizedSql)),
    Q("q88_quantization_recall", quantizationRecall, Some(quantizationRecallSql)),
    Q("q22_knn_bruteforce", knnBruteForce, Some(knnBruteForceSql)),
    Q("q180_hard_negatives", hardNegativesQ, Some(hardNegativesSql)),
    Q("q189_hard_negatives_indexed", hardNegativesIndexed,
      Some(hardNegativesIndexedSql)),
    Q("q23_knn_ivf", knnIvf, Some(knnIvfSql)),
    Q("q24_embedding_neardup", embeddingNearDup, Some(embeddingNearDupSql)),
    Q("q83_knn_ivf_persisted", knnIvfPersisted, Some(knnIvfProbedSql)),
    Q("q84_knn_graph_persisted", knnGraphPersisted, Some(knnGraphPersistedSql)),
    Q("q85_knn_ivf_appended", knnIvfAppended, Some(knnIvfProbedSql)),
    Q("q98_semantic_dedup", semanticDedupQ, Some(semanticDedupSql)),
    Q("q101_pq_ann", pqAnn, Some(pqAnnSql)),
    Q("q106_pq_recall", pqRecall, Some(pqRecallSql)),
    Q("q123_pq_lloyd_recall", pqLloydRecall, Some(pqLloydRecallSql)))
}
