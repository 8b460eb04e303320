package graft.queries

import graft.Tables
import graft.operators.{DataMix, Selection, TextAnalysis => TA}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dataset-composition coverage: deterministic split, mixture
  * weighting, and token packing over `documents` — each oracle replays
  * the portable-hash membership arithmetic, so the EXACT membership
  * (not just counts) is checked via the aggregates.
  */
object DataMixQueries {

  private[queries] def sqlBucket(id: String, seed: Long): String =
    s"('0x'||substr(md5($id::VARCHAR || '#$seed'),1,15))::BIGINT % 1000000"

  /** Train/test split + per-split stats (membership-sensitive sums). */
  def splitStats(s: SparkSession, d: String): DataFrame =
    DataMix.trainTestSplit(Tables.documents(s, d), "doc_id", 0.2)
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        sum(col("doc_id")).as("id_sum"))

  val splitStatsSql: String =
    s"""SELECT CASE WHEN ${sqlBucket("doc_id", 42L)} < 200000
       |            THEN 'test' ELSE 'train' END AS split,
       |  lang, count(*) AS n_docs, (sum(n_chars))::BIGINT AS total_chars,
       |  (sum(doc_id))::BIGINT AS id_sum
       |FROM documents GROUP BY 1, 2""".stripMargin

  /** Source-mixture sampling: src0..src4 upweighted, the rest thinned.
    * id_sum pins exact membership, not just acceptance rates. */
  def mixtureStats(s: SparkSession, d: String): DataFrame = {
    val weights = (0 until 20).map(i =>
      s"src$i" -> (if (i < 5) 0.9 else 0.3)).toMap
    DataMix.mixtureSample(Tables.documents(s, d), "doc_id", "source", weights)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("id_sum"))
  }

  val mixtureStatsSql: String =
    s"""SELECT source, count(*) AS n_docs, (sum(doc_id))::BIGINT AS id_sum
       |FROM documents
       |WHERE ${sqlBucket("doc_id", 42L)} <
       |  CASE WHEN source IN ('src0','src1','src2','src3','src4')
       |       THEN 900000 ELSE 300000 END
       |GROUP BY 1""".stripMargin

  /** Token packing at a 2 000-token budget in doc_id order, SHARDED:
    * each of 8 deterministic id-shards packs independently, so the
    * running-sum window partitions by shard instead of moving every row
    * to one partition (the unsharded `Window.partitionBy()` form is the
    * canonical scale-killer — packs are only meaningful within an
    * ordered shard anyway in a distributed layout). Per (shard, pack),
    * membership-sensitive aggregates. */
  def tokenPacking(s: SparkSession, d: String): DataFrame = {
    val withTokens = Tables.documents(s, d)
      .select(col("doc_id"), pmod(col("doc_id"), lit(8L)).as("shard"),
        TA.tokenCount(col("text")).as("n_tokens"))
    DataMix.packByTokenBudget(withTokens, "doc_id", "n_tokens", 2000L,
      shardCol = Some("shard"))
      .groupBy(col("shard"), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("pack_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
  }

  val tokenPackingSql: String =
    """WITH t AS (SELECT doc_id, doc_id % 8 AS shard,
      |    len(regexp_extract_all(text, '\S+')) AS n_tokens
      |  FROM documents),
      |c AS (SELECT doc_id, shard, n_tokens,
      |    (sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
      |      ROWS UNBOUNDED PRECEDING))::BIGINT AS cumsum
      |  FROM t)
      |SELECT shard, ((cumsum - n_tokens) // 2000)::BIGINT AS pack_id,
      |  count(*) AS n_docs, (sum(n_tokens))::BIGINT AS pack_tokens,
      |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
      |FROM c GROUP BY 1, 2""".stripMargin

  /** Exact-k stratified sample (20 docs per language), summarized with
    * a membership-sensitive id checksum: the oracle reproduces the
    * hash-ordered rank, so the precise sampled SET is verified. */
  def stratifiedSample(s: SparkSession, d: String): DataFrame =
    DataMix.stratifiedSample(Tables.documents(s, d), "doc_id", "lang", k = 20)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("doc_id")).as("id_checksum"),
        sum(col("n_chars")).as("total_chars"))

  val stratifiedSampleSql: String =
    s"""WITH r AS (SELECT lang, doc_id, n_chars,
       |    row_number() OVER (PARTITION BY lang
       |                       ORDER BY ${sqlBucket("doc_id", 42L)}, doc_id) AS rk
       |  FROM documents)
       |SELECT lang, count(*) AS n_docs,
       |  (sum(doc_id))::BIGINT AS id_checksum,
       |  (sum(n_chars))::BIGINT AS total_chars
       |FROM r WHERE rk <= 20 GROUP BY 1""".stripMargin

  /** Quality-weighted sampling: each doc kept with probability equal
    * to its deterministic quality score; per-lang survivor stats with
    * a membership-sensitive checksum so the oracle verifies the exact
    * kept set, not just rates. */
  def weightedSampleStats(s: SparkSession, d: String): DataFrame =
    DataMix.weightedSample(Tables.documents(s, d), "doc_id",
        TA.qualityScore(col("text")), seed = 42L)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("doc_id")).as("id_checksum"))

  val weightedSampleStatsSql: String =
    s"""SELECT lang, count(*) AS n_docs,
       |  (sum(doc_id))::BIGINT AS id_checksum
       |FROM documents
       |WHERE (${sqlBucket("doc_id", 42L)})::DOUBLE
       |      < (${TextQueries.quality}) * 1000000
       |GROUP BY 1""".stripMargin

  /** Temperature-flattened (α=0.5) source mixture: per-source keep rate
    * sqrt(n_min/n_source); survivor stats with membership checksums.
    * The rate uses only correctly-rounded IEEE ops, so the oracle's
    * membership decisions are bit-identical. */
  def temperatureMixture(s: SparkSession, d: String): DataFrame =
    DataMix.temperatureFlatten(Tables.documents(s, d), "doc_id", "source")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"),
        sum(col("doc_id")).as("id_checksum"))

  val temperatureMixtureSql: String =
    s"""WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
       |r AS (SELECT source,
       |        sqrt((SELECT min(n) FROM c)::DOUBLE / n::DOUBLE) AS rate
       |      FROM c)
       |SELECT d.source, count(*) AS n_kept,
       |  (sum(doc_id))::BIGINT AS id_checksum
       |FROM documents d JOIN r ON d.source = r.source
       |WHERE (${sqlBucket("doc_id", 42L)})::DOUBLE < rate * 1000000
       |GROUP BY 1""".stripMargin

  /** Deterministic training-order shuffle ([[DataMix.shuffleShards]]):
    * every doc's (shard, pos) is a pure function of its id — the full
    * permutation is the result, so the oracle checks it row-for-row. */
  def shuffleShardsQ(s: SparkSession, d: String): DataFrame =
    DataMix.shuffleShards(Tables.documents(s, d), "doc_id", nShards = 8)
      .select(col("doc_id"), col("shard"), col("pos"))

  val shuffleShardsSql: String =
    s"""WITH h AS (
       |  SELECT doc_id,
       |    ('0x'||substr(md5(doc_id::VARCHAR || '#42'),1,15))::BIGINT AS h
       |  FROM documents)
       |SELECT doc_id, h % 8 AS shard,
       |  row_number() OVER (PARTITION BY h % 8 ORDER BY h, doc_id) AS pos
       |FROM h""".stripMargin

  /** Domain quota: no language may exceed 30% of the corpus (en is
    * 43% of the testdata — it gets capped; the rest pass through).
    * id_sum pins the exact hash-order membership of the trim. */
  def domainQuotaStats(s: SparkSession, d: String): DataFrame =
    DataMix.domainQuota(Tables.documents(s, d), "doc_id", "lang",
        capNum = 3, capDen = 10)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("id_sum"))

  val domainQuotaStatsSql: String =
    s"""WITH h AS (
       |  SELECT doc_id, lang,
       |    ('0x'||substr(md5(doc_id::VARCHAR || '#42'),1,15))::BIGINT AS h
       |  FROM documents),
       |t AS (SELECT (3 * count(*)) // 10 AS target FROM documents),
       |r AS (SELECT doc_id, lang,
       |        row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rn
       |      FROM h)
       |SELECT lang, count(*) AS n_docs, (sum(doc_id))::BIGINT AS id_sum
       |FROM r, t WHERE rn <= target GROUP BY 1""".stripMargin

  /** Leakage-safe split by SOURCE (group-aware): every doc of a source
    * lands on one side, so near-dup families inside a source can never
    * straddle train/test — visible in the output as exactly one row
    * per source (a doc-hash split would emit two). */
  def groupSplitStats(s: SparkSession, d: String): DataFrame =
    DataMix.groupAwareSplit(Tables.documents(s, d), "source", 0.25)
      .groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("id_sum"))

  val groupSplitStatsSql: String =
    s"""SELECT source,
       |  CASE WHEN ${sqlBucket("source", 42L)} < 250000
       |       THEN 'test' ELSE 'train' END AS split,
       |  count(*) AS n_docs, (sum(doc_id))::BIGINT AS id_sum
       |FROM documents GROUP BY 1, 2""".stripMargin

  /** Systematic PPS sampling via the DISTRIBUTED prefix sum
    * ([[graft.operators.PrefixSum]]): ~50 docs picked proportionally to
    * n_chars by crossing multiples of step = Σw div 50 in the global
    * cumulative weight — no seed, no single-task global window (the
    * two-phase scan is the scale shape; the oracle's plain windowed
    * sum pins its values bit-for-bit). */
  def systematicSampleQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("n_chars"))
    val step = docs.agg(sum(col("n_chars"))).head().getLong(0) / 50L
    graft.operators.PrefixSum.systematicSample(
        docs, Seq(col("doc_id")), col("n_chars"), step, nParts = 16)
      .select(col("doc_id"), col("n_chars"), col("cum_weight"))
  }

  val systematicSampleSql: String =
    """WITH w AS (SELECT doc_id, n_chars FROM documents),
      |tot AS (SELECT (sum(n_chars) // 50)::BIGINT AS step FROM w),
      |c AS (SELECT doc_id, n_chars,
      |        (sum(n_chars) OVER (ORDER BY doc_id
      |           ROWS UNBOUNDED PRECEDING))::BIGINT AS cum_weight
      |      FROM w)
      |SELECT doc_id, n_chars, cum_weight
      |FROM c, tot
      |WHERE cum_weight // step > (cum_weight - n_chars) // step""".stripMargin

  /** GLOBAL token packing (no shard column): one corpus-wide pack
    * sequence through [[graft.operators.PrefixSum]]'s two-phase scan —
    * q47's sharded packs are parallel sequences; this is the
    * single-sequence layout (curriculum order, strict global
    * determinism) that used to force a one-task window. Per-pack
    * membership-sensitive aggregates; the oracle's plain global window
    * pins the distributed cumsum bit-for-bit. */
  def globalPacking(s: SparkSession, d: String): DataFrame =
    DataMix.packByTokenBudget(
        Tables.documents(s, d)
          .select(col("doc_id"), TA.tokenCount(col("text")).as("n_tokens")),
        "doc_id", "n_tokens", 2000L)
      .groupBy(col("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("pack_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))

  val globalPackingSql: String =
    s"""WITH d AS (
       |  SELECT doc_id,
       |    len(regexp_extract_all(text, '\\S+')) AS n_tokens
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, n_tokens,
       |    sum(n_tokens) OVER (ORDER BY doc_id
       |      ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM d)
       |SELECT ((cum - n_tokens) // 2000)::BIGINT AS pack_id,
       |  count(*) AS n_docs,
       |  sum(n_tokens)::BIGINT AS pack_tokens,
       |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
       |FROM c GROUP BY 1""".stripMargin

  /** DSIR importance selection ([[graft.operators.Selection]]): score
    * every document by how 'en'-like its hashed-bigram distribution is
    * (target = the English slice, raw = the whole pool) and take the
    * top 100. The oracle replays the ENTIRE estimator — bigram
    * explode, portable bucket hash, both smoothed ppb distributions,
    * the capped ppm ratio, and the per-doc weighted average — in
    * integer SQL. */
  private val selBuckets = 1024
  private val resampleStep = 25000000L

  def importanceSelect(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    Selection.importanceScores(docs, docs.filter(col("lang") === "en"),
        "doc_id", "text", selBuckets, portable = true)
      .orderBy(col("score_ppm").desc, col("doc_id")).limit(100)
  }

  /** Shared oracle body: per-doc importance scores. */
  private val importanceScoresCtes: String =
    s"""WITH pairs AS MATERIALIZED (
       |  SELECT doc_id, lang,
       |    ('0x'||substr(md5(toks[i] || ' ' || toks[i+1]),1,15))::BIGINT
       |      % $selBuckets AS bucket
       |  FROM (SELECT doc_id, lang,
       |          regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
       |        FROM documents) d,
       |    unnest(range(1, len(toks))) t(i)
       |  WHERE len(toks) >= 2),
       |docb AS MATERIALIZED (
       |  SELECT doc_id, bucket, count(*) AS cnt FROM pairs GROUP BY 1, 2),
       |rawc AS (SELECT bucket, sum(cnt)::BIGINT AS r_cnt
       |         FROM docb GROUP BY 1),
       |tgtc AS (SELECT bucket, count(*)::BIGINT AS t_cnt
       |         FROM pairs WHERE lang = 'en' GROUP BY 1),
       |tot AS (SELECT (SELECT sum(cnt) FROM docb)::BIGINT AS r_tot,
       |               (SELECT count(*) FROM pairs WHERE lang = 'en')::BIGINT
       |                 AS t_tot),
       |w AS (
       |  SELECT s.range AS bucket,
       |    least((((coalesce(t_cnt, 0) + 1) * 1000000000
       |             // (t_tot + $selBuckets)) * 1000000)
       |      // greatest((coalesce(r_cnt, 0) + 1) * 1000000000
       |             // (r_tot + $selBuckets), 1),
       |      1000000000000) AS w_ppm
       |  FROM range(0, $selBuckets) s
       |  LEFT JOIN tgtc ON s.range = tgtc.bucket
       |  LEFT JOIN rawc ON s.range = rawc.bucket
       |  CROSS JOIN tot),
       |scores AS (
       |  SELECT doc_id, sum(cnt)::BIGINT AS n_ngrams,
       |    (sum(cnt * w_ppm) // sum(cnt))::BIGINT AS score_ppm
       |  FROM docb JOIN w USING (bucket) GROUP BY 1)""".stripMargin

  val importanceSelectSql: String =
    s"""$importanceScoresCtes
       |SELECT doc_id, n_ngrams, score_ppm FROM scores
       |ORDER BY score_ppm DESC, doc_id LIMIT 100""".stripMargin

  /** DSIR importance RESAMPLING: systematic PPS over the scores —
    * pick rate ∝ target-likeness, expected n = Σscore/step,
    * deterministic and seedless. Full selected membership (plus the
    * exact cumulative weight) is the gated output. */
  def importanceResample(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    Selection.importanceResample(
      Selection.importanceScores(docs, docs.filter(col("lang") === "en"),
        "doc_id", "text", selBuckets, portable = true),
      "doc_id", resampleStep)
  }

  val importanceResampleSql: String =
    s"""$importanceScoresCtes,
       |c AS (SELECT doc_id, n_ngrams, score_ppm,
       |    (sum(score_ppm) OVER (ORDER BY doc_id
       |       ROWS UNBOUNDED PRECEDING))::BIGINT AS cum_weight
       |  FROM scores)
       |SELECT doc_id, n_ngrams, score_ppm, cum_weight FROM c
       |WHERE cum_weight // $resampleStep >
       |      (cum_weight - score_ppm) // $resampleStep""".stripMargin

  /** q157: [[Selection.weightedSampleK]] — A-ES weighted sampling
    * without replacement, exactly 100 documents with inclusion scaled
    * by n_chars (the token-weighted doc-sampling shape). No global
    * scan: the whole selection is one TakeOrderedAndProject over
    * locally-computed fixed-point keys, vs q148's prefix-scan PPS.
    * The oracle recomputes every key from the same pinned mantissa
    * table and takes the same ordered limit. */
  def weightedSampleDocs(s: SparkSession, d: String): DataFrame =
    Selection.weightedSampleK(Tables.documents(s, d), "doc_id",
      col("n_chars"), k = 100, seed = 42L)

  val weightedSampleDocsSql: String = {
    import graft.functions.FixedPointLog.{ilog2MilliDuck, tblDuck}
    s"""WITH t AS (SELECT $tblDuck AS tbl),
       |h AS (
       |  SELECT doc_id, n_chars AS w,
       |    ('0x'||substr(md5('s42_'||doc_id::VARCHAR),1,15))::BIGINT + 1
       |      AS h
       |  FROM documents WHERE n_chars > 0),
       |k AS (
       |  SELECT doc_id, w,
       |    ((60000 - ${ilog2MilliDuck("h")}) * 1000000) // w AS sample_key
       |  FROM h, t)
       |SELECT doc_id, w, sample_key FROM k
       |ORDER BY sample_key, doc_id LIMIT 100""".stripMargin
  }

  def all: Seq[Q] = Seq(
    Q("q157_weighted_sample", weightedSampleDocs,
      Some(weightedSampleDocsSql)),
    Q("q147_importance_select", importanceSelect, Some(importanceSelectSql)),
    Q("q148_importance_resample", importanceResample,
      Some(importanceResampleSql)),
    Q("q133_global_packing", globalPacking, Some(globalPackingSql)),
    Q("q129_systematic_sample", systematicSampleQ, Some(systematicSampleSql)),
    Q("q45_split_stats", splitStats, Some(splitStatsSql)),
    Q("q46_mixture_stats", mixtureStats, Some(mixtureStatsSql)),
    Q("q47_token_packing", tokenPacking, Some(tokenPackingSql)),
    Q("q66_stratified_sample", stratifiedSample, Some(stratifiedSampleSql)),
    Q("q77_weighted_sample", weightedSampleStats, Some(weightedSampleStatsSql)),
    Q("q78_temperature_mixture", temperatureMixture, Some(temperatureMixtureSql)),
    Q("q92_shuffle_shards", shuffleShardsQ, Some(shuffleShardsSql)),
    Q("q102_domain_quota", domainQuotaStats, Some(domainQuotaStatsSql)),
    Q("q104_group_split", groupSplitStats, Some(groupSplitStatsSql)))
}
