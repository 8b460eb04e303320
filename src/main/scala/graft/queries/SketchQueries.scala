package graft.queries

import graft.Tables
import graft.operators.{Dedup, GraphRank, Hll, Similarity}
import graft.functions.KmvSketch
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sketch / LSH coverage where the whole algorithm is replayed by the
  * oracle: KMV distinct-count (typed Aggregator; order-insensitive →
  * deterministic → SQL-replayable) and hyperplane-LSH embedding
  * near-dup (plane constants embedded into the generated SQL).
  */
object SketchQueries {

  private val K = 64

  /** q184: Poisson bootstrap ([[graft.operators.Bootstrap]]) — the
    * sampling distribution of lineitem's total price from ONE scan: 8
    * replicates, each row's per-replicate multiplicity a deterministic
    * Poisson(1) draw off the portable md5 hash of (key, replicate).
    * The oracle replays the uniform, the truncated inverse-CDF lookup
    * (cutoff literals rendered from the SAME Scala doubles), and both
    * exact integer sums. */
  def poissonBootstrap(s: SparkSession, d: String): DataFrame =
    graft.operators.Bootstrap.bootstrapSums(
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          cents(col("l_extendedprice")).as("c")),
      Seq("l_orderkey", "l_linenumber"), "c", reps = 8, portable = true)

  val poissonBootstrapSql: String = {
    val w = graft.operators.Bootstrap
      .poissonWeightSql("l_orderkey||':'||l_linenumber||':'||rep")
    s"""WITH r AS (SELECT unnest(range(8)) AS rep),
       |v AS (SELECT l_orderkey, l_linenumber,
       |    ${sqlCents("l_extendedprice")} AS c
       |  FROM lineitem),
       |w AS (SELECT rep, $w AS w, c FROM v, r)
       |SELECT rep::INTEGER AS rep, sum(w)::BIGINT AS n_eff,
       |  sum(w*c)::BIGINT AS sum_v
       |FROM w GROUP BY 1""".stripMargin
  }

  /** q188: grouped Poisson bootstrap — every event type's sampling
    * distribution of total value from the SAME single scan (the weight
    * depends only on (event, replicate); grouping just changes the
    * aggregation key). Per-cohort uncertainty is the production shape:
    * one pass, |types|×reps output rows. */
  def groupedBootstrap(s: SparkSession, d: String): DataFrame =
    graft.operators.Bootstrap.bootstrapGroupSums(
      Tables.events(s, d)
        .select(col("event_id"), col("event_type"),
          cents(col("value")).as("c")),
      Seq("event_id"), Seq("event_type"), "c", reps = 8, portable = true)

  val groupedBootstrapSql: String = {
    val w = graft.operators.Bootstrap.poissonWeightSql("event_id||':'||rep")
    s"""WITH r AS (SELECT unnest(range(8)) AS rep),
       |v AS (SELECT event_id, event_type,
       |    ${sqlCents("value")} AS c
       |  FROM events),
       |w AS (SELECT event_type, rep, $w AS w, c FROM v, r)
       |SELECT event_type, rep::INTEGER AS rep, sum(w)::BIGINT AS n_eff,
       |  sum(w*c)::BIGINT AS sum_v
       |FROM w GROUP BY 1, 2""".stripMargin
  }

  /** q196: per-group bootstrap CONFIDENCE INTERVALS composed from parts
    * already gated separately — q188's one-scan replicate sums feeding
    * q186's sortless exact rank selection: error bars on every event
    * type's total from one scan plus ≤6 histogram re-scans, zero
    * data-row exchanges. 40 replicates, 95% CI = the 1st and 39th
    * smallest replicate sums (⌈reps/40⌉ / ⌈39·reps/40⌉ — exact rational
    * ranks both engines derive identically). The oracle replays draw →
    * grouped sums → rank selection with a window, the sort-based form
    * this operator refuses to shuffle for. */
  def bootstrapCi(s: SparkSession, d: String): DataFrame =
    graft.operators.Bootstrap.bootstrapGroupCi(
      Tables.events(s, d)
        .select(col("event_id"), col("event_type"),
          cents(col("value")).as("c")),
      Seq("event_id"), "event_type", "c", reps = 40, portable = true)

  val bootstrapCiSql: String = {
    val w = graft.operators.Bootstrap.poissonWeightSql("event_id||':'||rep")
    s"""WITH r AS (SELECT unnest(range(40)) AS rep),
       |v AS (SELECT event_id, event_type, ${sqlCents("value")} AS c
       |  FROM events),
       |w AS (SELECT event_type, rep, $w AS w, c FROM v, r),
       |sums AS (
       |  SELECT event_type, rep, sum(w*c)::BIGINT AS sum_v
       |  FROM w GROUP BY 1, 2),
       |rk AS (
       |  SELECT event_type, sum_v,
       |    row_number() OVER (PARTITION BY event_type ORDER BY sum_v)
       |      AS rk,
       |    count(*) OVER (PARTITION BY event_type) AS n
       |  FROM sums)
       |SELECT event_type, max(n)::BIGINT AS n_reps,
       |  max(CASE WHEN rk = greatest(1, (n + 39) // 40)
       |      THEN sum_v END) AS ci_lo,
       |  max(CASE WHEN rk = greatest(1, (39 * n + 39) // 40)
       |      THEN sum_v END) AS ci_hi
       |FROM rk GROUP BY 1""".stripMargin
  }

  /** q186: EXACT per-key median with NO global sort
    * ([[graft.operators.Frequency.exactKth]]) — distributed selection
    * by iterative histogram refinement: each pass scans the live range
    * and ships only ≤ keys·4096 histogram rows; the driver narrows the
    * bucket holding the target rank (2 passes for money cents). The
    * sort-based exact path (q100's window) shuffles every row to its
    * key's reducer; this one never exchanges data at all. Oracle = the
    * very sort it avoids. */
  def exactMedianSelection(s: SparkSession, d: String): DataFrame =
    graft.operators.Frequency.exactKth(
      Tables.lineitem(s, d).select(col("l_returnflag").as("key"),
        cents(col("l_extendedprice")).as("c")),
      "key", "c")

  val exactMedianSelectionSql: String =
    s"""WITH v AS (SELECT l_returnflag AS key,
       |    ${sqlCents("l_extendedprice")} AS v
       |  FROM lineitem),
       |r AS (SELECT key, v,
       |    row_number() OVER (PARTITION BY key ORDER BY v) AS rn,
       |    count(*) OVER (PARTITION BY key) AS nn
       |  FROM v)
       |SELECT key, nn::BIGINT AS n, v AS kth
       |FROM r WHERE rn = (nn + 1) // 2""".stripMargin

  /** q190: all three EXACT quartiles per key in the SAME refinement
    * passes ([[graft.operators.Frequency.exactRanks]]) — the multi-rank
    * generalization of q186: each pass scans once, each (key, quartile)
    * narrows its own bucket; ranges disjoin after pass 1 so the per-tag
    * overlap collapses. Rank = ⌈q·n⌉, the histQuantile target formula. */
  def exactQuartiles(s: SparkSession, d: String): DataFrame =
    graft.operators.Frequency.exactRanks(
      Tables.lineitem(s, d).select(col("l_returnflag").as("key"),
        cents(col("l_extendedprice")).as("c")),
      "key", "c",
      Seq("p25" -> ((n: Long) => (n + 3) / 4),
        "p50" -> ((n: Long) => (2 * n + 3) / 4),
        "p75" -> ((n: Long) => (3 * n + 3) / 4)))

  val exactQuartilesSql: String =
    s"""WITH v AS (SELECT l_returnflag AS key,
       |    ${sqlCents("l_extendedprice")} AS v
       |  FROM lineitem),
       |r AS (SELECT key, v,
       |    row_number() OVER (PARTITION BY key ORDER BY v) AS rn,
       |    count(*) OVER (PARTITION BY key) AS nn
       |  FROM v),
       |t AS (SELECT * FROM (VALUES ('p25', 1), ('p50', 2), ('p75', 3))
       |      q(tag, num))
       |SELECT key, tag, nn::BIGINT AS n, v AS kth
       |FROM r, t WHERE rn = (num * nn + 3) // 4""".stripMargin

  /** q198: q190's exact quartiles over the RAW DOUBLE column — no
    * caller-side cents lifting
    * ([[graft.operators.Frequency.exactRanksDouble]]). The machinery is
    * a radix descent over the order-preserving IEEE-754 bit lift
    * (shift/mask windows over the lifted unsigned bit-string — exact
    * over the full double domain, where range arithmetic would
    * overflow), still with zero data-row exchanges. Selection returns a
    * VALUE THE DATA CONTAINS, so the result bit-matches DuckDB's
    * sort-based replay on the same parquet doubles with no rounding
    * discipline needed — the one aggregate family where double columns
    * can be hash-compared directly. */
  def exactDoubleQuantiles(s: SparkSession, d: String): DataFrame =
    graft.operators.Frequency.exactRanksDouble(
      Tables.lineitem(s, d).select(col("l_returnflag").as("key"),
        col("l_extendedprice").as("v")),
      "key", "v",
      Seq("p25" -> ((n: Long) => (n + 3) / 4),
        "p50" -> ((n: Long) => (2 * n + 3) / 4),
        "p75" -> ((n: Long) => (3 * n + 3) / 4)))

  val exactDoubleQuantilesSql: String =
    """WITH r AS (SELECT l_returnflag AS key, l_extendedprice AS v,
      |    row_number() OVER (PARTITION BY l_returnflag
      |                       ORDER BY l_extendedprice) AS rn,
      |    count(*) OVER (PARTITION BY l_returnflag) AS nn
      |  FROM lineitem),
      |t AS (SELECT * FROM (VALUES ('p25', 1), ('p50', 2), ('p75', 3))
      |      q(tag, num))
      |SELECT key, tag, nn::BIGINT AS n, v AS kth
      |FROM r, t WHERE rn = (num * nn + 3) // 4""".stripMargin

  /** Approximate distinct users per event type via the KMV Aggregator,
    * alongside the exact count. */
  def kmvDistinctUsers(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(
        KmvSketch.approxDistinct(
          Dedup.stringHash(col("user_id").cast("string"), portable = true),
          K).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"))

  val kmvDistinctUsersSql: String =
    s"""WITH h AS (SELECT DISTINCT event_type,
       |    ('0x'||substr(md5(user_id::VARCHAR),1,15))::BIGINT AS h
       |  FROM events),
       |r AS (SELECT event_type, h,
       |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
       |  FROM h),
       |sk AS (SELECT event_type, count(*) AS n,
       |    max(CASE WHEN rn = $K THEN h END) AS hk
       |  FROM r GROUP BY 1),
       |ex AS (SELECT event_type, count(DISTINCT user_id) AS exact_users
       |  FROM events GROUP BY 1)
       |SELECT sk.event_type,
       |  CASE WHEN n < $K THEN n::DOUBLE
       |       ELSE ${K - 1}::DOUBLE * 1152921504606846976::BIGINT::DOUBLE / hk::DOUBLE
       |  END AS approx_users,
       |  exact_users
       |FROM sk JOIN ex USING (event_type)""".stripMargin

  private val Dim = 64

  /** Bucket width pinned to what [[Similarity.adaptiveHyperplaneBits]]
    * chooses at the LARGEST corpus the driver benches (sf1.0, 20k
    * embeddings → 11 bits): an oracle pin must be a fixed bucket
    * function (static SQL can't read the corpus count), and the q79
    * lesson (r9→r10: 15.3× wall at 10× data) is that a pinned LSH
    * shape must be sized for the biggest corpus it will ever see —
    * under-sized fixed buckets saturate and the within-bucket pair
    * volume grows quadratically. q38 was the last fixed-width family
    * (8 bits → 6.2× at 10× data); at 11 bits the bucket population
    * scales with the corpus instead. */
  private val NBits = Similarity.adaptiveHyperplaneBits(20000L)
  private val MinSim = 0.25

  /** Embedding near-dup pairs inside hyperplane-LSH buckets — the
    * unsupervised scale path, fully oracle-replayed. */
  def hyperplaneNearDup(s: SparkSession, d: String): DataFrame =
    Similarity.embeddingNearDupPairs(Tables.embeddings(s, d),
      "vec_id", "embedding", dim = Dim, minSim = MinSim, nBits = NBits)

  /** DuckDB replay of [[Similarity.hyperplaneBucket]]: the seed-derived
    * plane constants embedded as array literals. */
  private def bucketSql(nBits: Int): String =
    Similarity.hyperplanes(Dim, nBits).zipWithIndex.map { case (p, i) =>
      val arr = p.mkString("[", ",", "]") + "::DOUBLE[]"
      s"(CASE WHEN list_dot_product(v, $arr) > 0 THEN 1::BIGINT << $i ELSE 0::BIGINT END)"
    }.mkString("\n    + ")

  val hyperplaneNearDupSql: String = {
    val cos = "round(list_dot_product(x.v, y.v)/(x.nrm * y.nrm), 6)"
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |b AS (SELECT vec_id, v,
       |    ${bucketSql(NBits)} AS bucket,
       |    sqrt(list_dot_product(v, v)) AS nrm
       |  FROM e)
       |SELECT x.vec_id AS id_a, y.vec_id AS id_b, $cos AS similarity
       |FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
       |WHERE $cos >= $MinSim""".stripMargin
  }

  private val GraphBits = 6 // coarser buckets than q38 → denser graph
  private val GraphK = 5

  /** k-NN graph over the whole embedding set inside coarse LSH buckets
    * (every vector → top-5 in-bucket neighbors). */
  def knnGraph(s: SparkSession, d: String): DataFrame =
    Similarity.knnGraphBlocked(Tables.embeddings(s, d), "vec_id",
      "embedding",
      Similarity.hyperplaneBucket(col("embedding"), Dim, GraphBits),
      k = GraphK)

  val knnGraphSql: String = {
    val cos = "round(list_dot_product(x.v, y.v)/(x.nrm * y.nrm), 6)"
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |b AS (SELECT vec_id, v,
       |    ${bucketSql(GraphBits)} AS bucket,
       |    sqrt(list_dot_product(v, v)) AS nrm
       |  FROM e),
       |s AS (SELECT x.vec_id AS id, y.vec_id AS neighbor_id,
       |        $cos AS similarity
       |      FROM b x JOIN b y
       |        ON x.bucket = y.bucket AND x.vec_id <> y.vec_id),
       |r AS (SELECT *, row_number()
       |        OVER (PARTITION BY id ORDER BY similarity DESC, neighbor_id)
       |        AS rank
       |      FROM s)
       |SELECT id, neighbor_id, rank, similarity FROM r
       |WHERE rank <= $GraphK""".stripMargin
  }

  /** Fixed-point PageRank (3 iterations, scale 10⁶, damping 85/100)
    * over the q70 k-NN graph — centrality-for-data-selection: the
    * oracle rebuilds the identical edge relation and replays the
    * integer iterations, so ranks match to the last unit. */
  def knnPageRank(s: SparkSession, d: String): DataFrame =
    GraphRank.pageRankScaled(
      knnGraph(s, d).select(col("id"), col("neighbor_id")),
      "id", "neighbor_id", iters = 3)
      .select(col("id").as("vec_id"), col("pr").as("pr_scaled"))

  val knnPageRankSql: String = {
    val cos = "round(list_dot_product(x.v, y.v)/(x.nrm * y.nrm), 6)"
    def iter(prev: String, cur: String): String =
      s"""$cur AS (SELECT nd.id,
         |    CAST(150000 + (85 * coalesce(agg_.acc, 0)) // 100 AS BIGINT)
         |      AS pr
         |  FROM nodes nd LEFT JOIN (
         |    SELECT e2.neighbor_id AS id, sum(p.pr // d2.outd) AS acc
         |    FROM edges e2
         |      JOIN $prev p ON e2.id = p.id
         |      JOIN deg d2 ON e2.id = d2.id
         |    GROUP BY 1) agg_ ON nd.id = agg_.id)""".stripMargin
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |b AS (SELECT vec_id, v,
       |    ${bucketSql(GraphBits)} AS bucket,
       |    sqrt(list_dot_product(v, v)) AS nrm
       |  FROM e),
       |sim AS (SELECT x.vec_id AS id, y.vec_id AS neighbor_id,
       |        $cos AS similarity
       |      FROM b x JOIN b y
       |        ON x.bucket = y.bucket AND x.vec_id <> y.vec_id),
       |r AS (SELECT *, row_number()
       |        OVER (PARTITION BY id ORDER BY similarity DESC, neighbor_id)
       |        AS rank
       |      FROM sim),
       |edges AS (SELECT id, neighbor_id FROM r WHERE rank <= $GraphK),
       |nodes AS (SELECT DISTINCT id FROM (
       |    SELECT id FROM edges
       |    UNION ALL SELECT neighbor_id FROM edges) u),
       |deg AS (SELECT id, count(*) AS outd FROM edges GROUP BY 1),
       |it0 AS (SELECT id, CAST(1000000 AS BIGINT) AS pr FROM nodes),
       |${iter("it0", "it1")},
       |${iter("it1", "it2")},
       |${iter("it2", "it3")}
       |SELECT id AS vec_id, pr AS pr_scaled FROM it3""".stripMargin
  }

  /** Count-min sketch (4×64, portable hashes) over the document token
    * stream, estimates joined against exact counts for every distinct
    * term — the oracle replays cells AND estimates, so the one-sided
    * overcount property (cm_est ≥ cnt_exact) is checked on real
    * numbers, not asserted. */
  def countMinTokens(s: SparkSession, d: String): DataFrame = {
    import graft.operators.{Frequency, TextAnalysis => TA}
    val toks = Tables.documents(s, d)
      .select(explode(TA.whitespaceTokens(lower(trim(col("text")))))
        .as("term"))
      .filter(col("term") =!= "")
    val sketch = Frequency.countMinTable(toks, "term",
      depth = 4, width = 64, seed = 42L, portable = true)
    val exact = toks.groupBy(col("term")).agg(count(lit(1)).as("cnt_exact"))
    Frequency.countMinEstimate(sketch, exact.select(col("term")), "term",
        depth = 4, width = 64, seed = 42L, portable = true)
      .join(exact, "term")
      .select(col("term"), col("cnt_exact"), col("cm_est"))
  }

  val countMinTokensSql: String = {
    val params = Dedup.hashParams(4, 42L)
    val p = Dedup.MersennePrime31
    val rowSelects = (tbl: String) => params.zipWithIndex.map {
      case ((a, b), i) =>
        s"SELECT term, $i AS row_idx, ((h*$a + $b) % $p) % 64 AS bucket FROM $tbl"
    }.mkString("\n  UNION ALL ")
    s"""WITH toks AS (
       |  SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS term
       |  FROM documents),
       |t AS (SELECT term FROM toks WHERE term <> ''),
       |h AS (SELECT term, ('0x'||substr(md5(term),1,15))::BIGINT % $p AS h FROM t),
       |cells AS (SELECT row_idx, bucket, count(*) AS cell_cnt FROM (
       |  ${rowSelects("h")}) GROUP BY 1, 2),
       |exact AS (SELECT term, count(*) AS cnt_exact FROM t GROUP BY 1),
       |dh AS (SELECT DISTINCT term, h FROM h),
       |tb AS (${rowSelects("dh")}),
       |est AS (SELECT tb.term, min(coalesce(cell_cnt, 0)) AS cm_est
       |        FROM tb LEFT JOIN cells USING (row_idx, bucket)
       |        GROUP BY 1)
       |SELECT term, cnt_exact, cm_est
       |FROM est JOIN exact USING (term)""".stripMargin
  }

  /** Power-of-two histogram quantile sketch vs exact median, per
    * return flag over price cents: the sketch shuffles ≤65 bins per
    * key (q62's exact quantiles shuffle every distinct value — the
    * 100 TB difference), the estimate brackets the true quantile
    * within its bin's [2^(k-1), 2^k−1] bounds, and the query JOINS
    * the exact median in so the guarantee est_lo ≤ exact ≤ est_hi is
    * verified on real numbers — same pattern as q96's one-sided
    * count-min bound. */
  def histQuantiles(s: SparkSession, d: String): DataFrame = {
    import graft.operators.Frequency
    val v = Tables.lineitem(s, d).select(
      col("l_returnflag").as("key"),
      cents(col("l_extendedprice")).as("v"))
    val est = Frequency.histQuantile(
      Frequency.log2Histogram(v, "key", "v"), "key", qNum = 1, qDen = 2)
    // exact lower median via histogram-refinement selection (q186's
    // exactKth; same (n+1) div 2 rank) — the r9-r10 window form fed a
    // per-key global sort into 3 reducers, the first thing to cliff at
    // 10x data (sf1.0 8.8x); selection never exchanges data rows
    val exact = Frequency.exactKth(v, "key", "v")
      .select(col("key"), col("kth").as("exact_median"))
    est.join(exact, "key")
      .select(col("key"), col("n"), col("bin"), col("est_lo"),
        col("est_hi"), col("exact_median"))
  }

  val histQuantilesSql: String =
    """WITH v AS (
      |  SELECT l_returnflag AS key,
      |    CAST(round(l_extendedprice*100,0) AS BIGINT) AS v
      |  FROM lineitem),
      |hist AS (
      |  SELECT key,
      |    CASE WHEN v > 0 THEN length(bin(v)) ELSE 0 END AS bin,
      |    count(*) AS cnt
      |  FROM v GROUP BY 1, 2),
      |cum AS (
      |  SELECT key, bin, cnt,
      |    sum(cnt) OVER (PARTITION BY key ORDER BY bin) AS c,
      |    sum(cnt) OVER (PARTITION BY key) AS n
      |  FROM hist),
      |est AS (
      |  SELECT key, n::BIGINT AS n, bin::INTEGER AS bin,
      |    (CASE WHEN bin > 0 THEN 1::BIGINT << (bin-1)::INTEGER
      |          ELSE 0 END)::BIGINT AS est_lo,
      |    (CASE WHEN bin > 0 THEN (1::BIGINT << bin::INTEGER) - 1
      |          ELSE 0 END)::BIGINT AS est_hi
      |  FROM cum
      |  WHERE c >= (n + 1) // 2 AND c - cnt < (n + 1) // 2),
      |ranked AS (
      |  SELECT key, v, row_number() OVER (PARTITION BY key ORDER BY v) AS rn,
      |    count(*) OVER (PARTITION BY key) AS nn
      |  FROM v)
      |SELECT est.key, est.n, est.bin, est.est_lo, est.est_hi,
      |  r.v AS exact_median
      |FROM est JOIN ranked r ON est.key = r.key AND r.rn = (r.nn + 1) // 2""".stripMargin

  /** Sketch-based join-size estimate (the salting/broadcast planning
    * primitive): CM sketches of orders.o_custkey and the AUTOMOBILE
    * customers' keys, row-wise inner product, min over rows — next to
    * the exact join count so the one-sided bound (est ≥ exact) is
    * verified on real numbers, q96-style. */
  def joinSizeSketch(s: SparkSession, d: String): DataFrame = {
    import graft.operators.Frequency
    val o = Tables.orders(s, d)
      .select(col("o_custkey").cast("string").as("k"))
    val c = Tables.customer(s, d)
      .filter(col("c_mktsegment") === "AUTOMOBILE")
      .select(col("c_custkey").cast("string").as("k"))
    // width ~ key cardinality: a planner sizes the sketch to the
    // expected distinct count (4x4096 cells is still KBs); width 64
    // here inflates the bound 24x from pure collisions
    val sa = Frequency.countMinTable(o, "k", depth = 4, width = 4096,
      seed = 42L, portable = true)
    val sb = Frequency.countMinTable(c, "k", depth = 4, width = 4096,
      seed = 42L, portable = true)
    val est = Frequency.countMinJoinSize(sa, sb)
    val exact = o.join(c, "k").agg(count(lit(1)).as("exact_join_size"))
    est.crossJoin(exact)
  }

  val joinSizeSketchSql: String = {
    val params = Dedup.hashParams(4, 42L)
    val p = Dedup.MersennePrime31
    def rowSelects(tbl: String) = params.zipWithIndex.map {
      case ((a, b), i) =>
        s"SELECT $i AS row_idx, ((h*$a + $b) % $p) % 4096 AS bucket FROM $tbl"
    }.mkString("\n  UNION ALL ")
    s"""WITH ka AS (SELECT o_custkey::VARCHAR AS k FROM orders),
       |kb AS (SELECT c_custkey::VARCHAR AS k FROM customer
       |       WHERE c_mktsegment = 'AUTOMOBILE'),
       |ha AS (SELECT ('0x'||substr(md5(k),1,15))::BIGINT % $p AS h FROM ka),
       |hb AS (SELECT ('0x'||substr(md5(k),1,15))::BIGINT % $p AS h FROM kb),
       |ca AS (SELECT row_idx, bucket, count(*) AS cca FROM (
       |  ${rowSelects("ha")}) GROUP BY 1, 2),
       |cb AS (SELECT row_idx, bucket, count(*) AS ccb FROM (
       |  ${rowSelects("hb")}) GROUP BY 1, 2),
       |rws AS (SELECT DISTINCT row_idx FROM ca),
       |prod AS (SELECT ca.row_idx, sum(cca*ccb)::BIGINT AS row_est
       |         FROM ca JOIN cb
       |           ON ca.row_idx = cb.row_idx AND ca.bucket = cb.bucket
       |         GROUP BY 1),
       |est AS (SELECT min(coalesce(row_est, 0))::BIGINT AS est_join_size
       |        FROM rws LEFT JOIN prod USING (row_idx)),
       |exact AS (SELECT count(*)::BIGINT AS exact_join_size
       |          FROM ka JOIN kb ON ka.k = kb.k)
       |SELECT est_join_size, exact_join_size FROM est, exact""".stripMargin
  }

  /** Triangle census of the q70 k-NN graph's undirected closure
    * ([[GraphRank.triangleStats]], degree-ordered compact-forward):
    * edges, wedges, exact triangle count, and the global clustering
    * coefficient as an integer ppm — the graph-density health check a
    * similarity graph gets before anything (components, PageRank,
    * label propagation) consumes it. The oracle rebuilds the identical
    * edge relation and counts a<b<c triples directly; the operator's
    * orientation trick must land on exactly the same number. */
  def knnTriangles(s: SparkSession, d: String): DataFrame =
    GraphRank.triangleStats(
      knnGraph(s, d).select(col("id"), col("neighbor_id")),
      "id", "neighbor_id")

  val knnTrianglesSql: String =
    s"""WITH g AS (${knnGraphSql.replace("\n", "\n  ")}),
       |und AS (SELECT DISTINCT least(id, neighbor_id) AS a,
       |          greatest(id, neighbor_id) AS b
       |        FROM g WHERE id <> neighbor_id),
       |deg AS (SELECT v, count(*) AS deg FROM (
       |          SELECT a AS v FROM und UNION ALL SELECT b FROM und)
       |        GROUP BY 1),
       |tri AS (SELECT count(*)::BIGINT AS n_triangles
       |        FROM und e1
       |        JOIN und e2 ON e2.a = e1.b
       |        JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
       |w AS (SELECT (sum(deg*(deg-1)//2))::BIGINT AS n_wedges FROM deg),
       |ne AS (SELECT count(*)::BIGINT AS n_edges FROM und)
       |SELECT n_edges, n_wedges, n_triangles,
       |  CASE WHEN n_wedges > 0 THEN (3000000*n_triangles)//n_wedges
       |       ELSE 0 END AS cc_ppm
       |FROM ne, w, tri""".stripMargin

  /** DOULION sampled triangle estimate next to the exact census
    * ([[GraphRank.sampledTriangleEstimate]], p = 1/2, deterministic
    * edge-hash sampling): the budget knob for graph censuses too big
    * to count exactly — cost drops ~p² while the estimator stays
    * unbiased. One row: sampled edges/triangles, the ×(1/p)³ scaled
    * estimate, and the exact count — q96's estimate-next-to-truth
    * pattern, so the accuracy is verified on real numbers, not
    * asserted. */
  def knnTrianglesSampled(s: SparkSession, d: String): DataFrame = {
    val edges = knnGraph(s, d).select(col("id"), col("neighbor_id"))
    GraphRank.sampledTriangleEstimate(edges, "id", "neighbor_id",
        invP = 2, seed = 99L)
      .crossJoin(broadcast(
        GraphRank.triangleStats(edges, "id", "neighbor_id")
          .select(col("n_triangles").as("exact_triangles"))))
  }

  val knnTrianglesSampledSql: String =
    s"""WITH g AS (${knnGraphSql.replace("\n", "\n  ")}),
       |und AS (SELECT DISTINCT least(id, neighbor_id) AS a,
       |          greatest(id, neighbor_id) AS b
       |        FROM g WHERE id <> neighbor_id),
       |kept AS MATERIALIZED (SELECT a, b FROM und
       |        WHERE (('0x'||substr(md5(a::VARCHAR || '#' || b::VARCHAR
       |          || '#99'),1,15))::BIGINT % 1000000) * 2 < 1000000),
       |stri AS (SELECT count(*)::BIGINT AS tri_sampled
       |        FROM kept e1
       |        JOIN kept e2 ON e2.a = e1.b
       |        JOIN kept e3 ON e3.a = e1.a AND e3.b = e2.b),
       |sne AS (SELECT count(*)::BIGINT AS n_sampled_edges FROM kept),
       |etri AS (SELECT count(*)::BIGINT AS exact_triangles
       |        FROM und e1
       |        JOIN und e2 ON e2.a = e1.b
       |        JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b)
       |SELECT n_sampled_edges, tri_sampled,
       |  (tri_sampled * 8)::BIGINT AS est_triangles, exact_triangles
       |FROM sne, stri, etri""".stripMargin

  /** q152: [[Hll.registers]] — the HyperLogLog register file itself,
    * per event type over event_id. Oracle recomputes every register
    * (bucket = top 10 hash bits, rho = first-1-bit position in the
    * next 31) in ANSI SQL, so the whole hash→bucket→rho→max pipeline
    * is pinned at the REGISTER level — the mergeable state a 100-TB
    * rollup ships between shards — not just at the estimate. */
  def hllRegisters(s: SparkSession, d: String): DataFrame =
    Hll.registers(Tables.events(s, d), col("event_id"), Seq("event_type"))

  val hllRegistersSql: String =
    """WITH h AS (
      |  SELECT event_type,
      |    ('0x'||substr(md5(event_id::VARCHAR),1,15))::BIGINT AS h
      |  FROM events),
      |b AS (
      |  SELECT event_type, h >> 50 AS bucket,
      |    (h >> 19) & 2147483647 AS rem
      |  FROM h)
      |SELECT event_type, bucket,
      |  max(CASE WHEN rem = 0 THEN 32
      |           ELSE 32 - length(bin(rem)) END)::BIGINT AS register
      |FROM b GROUP BY 1, 2""".stripMargin

  /** q153: [[Hll.merge]] + [[Hll.estimate]] — shard register files
    * (event_id parity split) merged via elementwise max, then the
    * exact-integer raw estimator, joined against the true distinct
    * count with a signed integer-ppm error column. The Spark side
    * going THROUGH the two-shard merge while the oracle computes the
    * global registers directly is the mergeability gate: max-of-max
    * must equal the one-pass register file bit for bit. */
  def hllEstimate(s: SparkSession, d: String): DataFrame = {
    val events = Tables.events(s, d)
    val shards = Seq(0, 1).map(p =>
      Hll.registers(events.filter(pmod(col("event_id"), lit(2)) === p),
        col("event_id"), Seq("event_type")))
    val est = Hll.estimate(Hll.merge(shards: _*), Seq("event_type"))
    val exact = events.groupBy("event_type")
      .agg(countDistinct(col("event_id")).as("exact_distinct"))
    est.join(exact, "event_type")
      .withColumn("err_ppm",
        expr("((est_raw - exact_distinct) * 1000000) div exact_distinct"))
  }

  val hllEstimateSql: String =
    """WITH h AS (
      |  SELECT event_type,
      |    ('0x'||substr(md5(event_id::VARCHAR),1,15))::BIGINT AS h
      |  FROM events),
      |b AS (
      |  SELECT event_type, h >> 50 AS bucket,
      |    (h >> 19) & 2147483647 AS rem
      |  FROM h),
      |r AS (
      |  SELECT event_type, bucket,
      |    max(CASE WHEN rem = 0 THEN 32
      |             ELSE 32 - length(bin(rem)) END)::BIGINT AS reg
      |  FROM b GROUP BY 1, 2),
      |e AS (
      |  SELECT event_type, count(*)::BIGINT AS n_set,
      |    (sum(1::BIGINT << (32 - reg)::INTEGER)
      |      + (1024 - count(*)) * 4294967296)::BIGINT AS den_scaled
      |  FROM r GROUP BY 1),
      |x AS (
      |  SELECT event_type, count(DISTINCT event_id)::BIGINT AS exact_distinct
      |  FROM events GROUP BY 1),
      |est AS (
      |  SELECT event_type, n_set, den_scaled,
      |    ((720541 * (4503599627370496 // den_scaled)) // 1000000)::BIGINT
      |      AS est_raw
      |  FROM e)
      |SELECT est.event_type, n_set, den_scaled, est_raw, exact_distinct,
      |  (((est_raw - exact_distinct) * 1000000) // exact_distinct)::BIGINT
      |    AS err_ppm
      |FROM est JOIN x ON est.event_type = x.event_type""".stripMargin

  /** q156: [[graft.streaming.HllRollupTable]] — the distinct-count
    * rollup IVM can't do (COUNT DISTINCT isn't subtractable; exact
    * maintenance would keep state ∝ history) — maintained through
    * three on-disk generations, one per event_id%3 batch. The Spark
    * side folds INCREMENTALLY (stored registers max-merged with each
    * batch, generation-committed parquet between steps); the oracle
    * recomputes every step's sketch FROM SCRATCH over the prefix, so
    * maintain ≡ recompute is hash-proven at every generation, not
    * asserted. Estimates are the exact-integer raw estimator. */
  def hllRollup(s: SparkSession, d: String): DataFrame = {
    import graft.streaming.HllRollupTable
    val events = Tables.events(s, d)
    val t = new HllRollupTable(s, tempWorkDir("graft_q156_"),
      Seq("event_type"))
    (0 until 3).foreach(p =>
      t.maintain(events.filter(pmod(col("event_id"), lit(3)) === p),
        col("event_id")))
    (0 until 3).map(g => t.estimates(g).withColumn("step", lit(g)))
      .reduce(_ unionByName _)
      .select(col("step"), col("event_type"), col("n_set"),
        col("den_scaled"), col("est_raw"))
  }

  val hllRollupSql: String =
    """WITH h AS (
      |  SELECT event_type, event_id % 3 AS part,
      |    ('0x'||substr(md5(event_id::VARCHAR),1,15))::BIGINT AS h
      |  FROM events),
      |b AS (
      |  SELECT event_type, part, h >> 50 AS bucket,
      |    (h >> 19) & 2147483647 AS rem
      |  FROM h),
      |steps AS (SELECT * FROM unnest([0,1,2]) t(step)),
      |r AS (
      |  SELECT step, event_type, bucket,
      |    max(CASE WHEN rem = 0 THEN 32
      |             ELSE 32 - length(bin(rem)) END)::BIGINT AS reg
      |  FROM steps JOIN b ON b.part <= step GROUP BY 1, 2, 3),
      |e AS (
      |  SELECT step, event_type, count(*)::BIGINT AS n_set,
      |    (sum(1::BIGINT << (32 - reg)::INTEGER)
      |      + (1024 - count(*)) * 4294967296)::BIGINT AS den_scaled
      |  FROM r GROUP BY 1, 2)
      |SELECT step, event_type, n_set, den_scaled,
      |  ((720541 * (4503599627370496 // den_scaled)) // 1000000)::BIGINT
      |    AS est_raw
      |FROM e""".stripMargin

  private val OverlapK = 256

  /** Train↔eval corpus-overlap estimate per language from KMV sketch
    * intersection ([[graft.operators.Overlap.kmvOverlap]]): the
    * shuffle-free "did the benchmark leak into training" measurement.
    * Items are the q19/q20 3-gram shingles under the portable 60-bit
    * hash; train = doc_id % 5 ≠ 0, eval = doc_id % 5 = 0. The oracle
    * replays the SKETCH (per-side k smallest distinct hashes) and the
    * whole Beyer et al. estimator in list algebra — deterministic at
    * any sf because the hash is fixed, not seeded. */
  /** Shared item frame for the overlap family: one row per distinct
    * (doc, 3-gram shingle) with lang, eval membership (doc_id%5=0) and
    * ingest batch (doc_id%4) labels + the portable 60-bit hash. */
  private def overlapItems(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    Dedup.shingles(docs, "doc_id", "text", n = 3)
      .filter(col("shingle").isNotNull)
      .join(docs.select(col("doc_id"), col("lang"),
        (col("doc_id") % 5 === 0).as("__iseval"),
        pmod(col("doc_id"), lit(3)).cast("int").as("__set"),
        pmod(col("doc_id"), lit(4)).cast("int").as("__batch")), Seq("doc_id"))
      .select(col("lang"), col("__iseval"), col("__set"), col("__batch"),
        Dedup.stringHash(col("shingle"), portable = true).as("__h"))
  }

  def corpusOverlap(s: SparkSession, d: String): DataFrame = {
    val sh = overlapItems(s, d)
    graft.operators.Overlap.kmvOverlap(
      sh.filter(!col("__iseval")), sh.filter(col("__iseval")),
      groupCol = "lang", hashCol = "__h", k = OverlapK)
  }

  val corpusOverlapSql: String =
    s"""WITH ${DedupQueries.shingleCtes(3)},
       |lab AS MATERIALIZED (
       |  SELECT d.lang, (d.doc_id % 5 = 0) AS iseval,
       |    ('0x'||substr(md5(s.shingle),1,15))::BIGINT AS h
       |  FROM sh s JOIN documents d USING (doc_id)
       |  WHERE s.shingle IS NOT NULL),
       |ha AS (SELECT DISTINCT lang, h FROM lab WHERE NOT iseval),
       |hb AS (SELECT DISTINCT lang, h FROM lab WHERE iseval),
       |ra AS (SELECT lang, h,
       |    row_number() OVER (PARTITION BY lang ORDER BY h) AS rn FROM ha),
       |rb AS (SELECT lang, h,
       |    row_number() OVER (PARTITION BY lang ORDER BY h) AS rn FROM hb),
       |ska AS (SELECT lang, array_agg(h ORDER BY h) AS a FROM ra
       |  WHERE rn <= $OverlapK GROUP BY 1),
       |skb AS (SELECT lang, array_agg(h ORDER BY h) AS b FROM rb
       |  WHERE rn <= $OverlapK GROUP BY 1),
       |m AS (SELECT lang, a, b,
       |    list_slice(list_sort(list_distinct(list_concat(a, b))), 1,
       |      $OverlapK) AS um
       |  FROM ska JOIN skb USING (lang)),
       |e AS (SELECT lang, len(um) AS keff,
       |    CASE WHEN len(um) < $OverlapK THEN len(um)::DOUBLE
       |         ELSE ${OverlapK - 1}::DOUBLE *
       |           1152921504606846976::BIGINT::DOUBLE / um[$OverlapK]::DOUBLE
       |    END AS est_union,
       |    len(list_intersect(list_intersect(um, a), b))::BIGINT AS n_match
       |  FROM m)
       |SELECT lang, est_union,
       |  (n_match::DOUBLE / keff::DOUBLE) * est_union AS est_intersection,
       |  n_match::DOUBLE / keff::DOUBLE AS jaccard_est,
       |  n_match
       |FROM e""".stripMargin

  private val RollupK = 128

  /** q173: the q169 overlap question asked INCREMENTALLY — the train
    * corpus arrives in 4 ingest batches (doc_id % 4), each folded into
    * a persisted [[graft.streaming.KmvRollupTable]]; after every batch
    * the rollup's "contamination so far" vs the fixed eval sketch is
    * emitted. KMV merge is exactly the sketch of the set union, so
    * generation g's sketch is BIT-IDENTICAL to a one-shot sketch of
    * batches 0..g — the oracle replays each generation as a fresh
    * prefix sketch and the whole timeline must hash-match. */
  def overlapRollup(s: SparkSession, d: String): DataFrame = {
    val items = overlapItems(s, d)
    val evalSk = items.filter(col("__iseval"))
      .groupBy(col("lang"))
      .agg(graft.functions.KmvSketch.minima(col("__h"), RollupK).as("sketch"))
    val train = items.filter(!col("__iseval"))
    val dir = tempWorkDir("graft_kmvroll") + "/t"
    val tbl = new graft.streaming.KmvRollupTable(s, dir, "lang", RollupK)
    val gens = (0 to 3).map { g =>
      tbl.maintain(train.filter(col("__batch") === g), col("__h"))
      tbl.overlapWith(evalSk, g).withColumn("gen", lit(g))
    }
    gens.reduce(_.unionByName(_))
      .select(col("gen"), col("lang"), col("est_union"),
        col("est_intersection"), col("jaccard_est"), col("n_match"))
  }

  private def rollupGenSql(g: Int): String =
    s"""ha_$g AS (SELECT DISTINCT lang, h FROM lab
       |  WHERE NOT iseval AND batch <= $g),
       |ra_$g AS (SELECT lang, h,
       |    row_number() OVER (PARTITION BY lang ORDER BY h) AS rn FROM ha_$g),
       |ska_$g AS (SELECT lang, array_agg(h ORDER BY h) AS a FROM ra_$g
       |  WHERE rn <= $RollupK GROUP BY 1),
       |m_$g AS (SELECT lang, a, b,
       |    list_slice(list_sort(list_distinct(list_concat(a, b))), 1,
       |      $RollupK) AS um
       |  FROM ska_$g JOIN skb USING (lang)),
       |e_$g AS (SELECT $g AS gen, lang, len(um) AS keff,
       |    CASE WHEN len(um) < $RollupK THEN len(um)::DOUBLE
       |         ELSE ${RollupK - 1}::DOUBLE *
       |           1152921504606846976::BIGINT::DOUBLE / um[$RollupK]::DOUBLE
       |    END AS est_union,
       |    len(list_intersect(list_intersect(um, a), b))::BIGINT AS n_match
       |  FROM m_$g)""".stripMargin

  val overlapRollupSql: String = {
    val genBlocks = (0 to 3).map(rollupGenSql).mkString(",\n")
    val genUnion = (0 to 3).map(g => s"SELECT * FROM e_$g")
      .mkString("\n  UNION ALL ")
    s"""WITH ${DedupQueries.shingleCtes(3)},
       |lab AS MATERIALIZED (
       |  SELECT d.lang, (d.doc_id % 5 = 0) AS iseval,
       |    (d.doc_id % 4)::INT AS batch,
       |    ('0x'||substr(md5(s.shingle),1,15))::BIGINT AS h
       |  FROM sh s JOIN documents d USING (doc_id)
       |  WHERE s.shingle IS NOT NULL),
       |hb AS (SELECT DISTINCT lang, h FROM lab WHERE iseval),
       |rb AS (SELECT lang, h,
       |    row_number() OVER (PARTITION BY lang ORDER BY h) AS rn FROM hb),
       |skb AS MATERIALIZED (SELECT lang, array_agg(h ORDER BY h) AS b FROM rb
       |  WHERE rn <= $RollupK GROUP BY 1),
       |$genBlocks
       |SELECT gen, lang, est_union,
       |  (n_match::DOUBLE / keff::DOUBLE) * est_union AS est_intersection,
       |  n_match::DOUBLE / keff::DOUBLE AS jaccard_est,
       |  n_match
       |FROM ($genUnion)""".stripMargin
  }

  /** q178: the q173 timeline against a REGISTRY of eval sets — the
    * real decontamination dashboard: N benchmarks × the ingest
    * timeline, every (corpus group × eval set × generation) cell one
    * KMV estimate ([[graft.streaming.KmvRollupTable.overlapTimeline]],
    * an all-pairs broadcast cross of ≤k-long sketches — never a corpus
    * touch at question time). Eval docs (doc_id%5=0) split into three
    * benchmark sets by doc_id%3; the corpus rolls up per lang over 4
    * ingest batches. The oracle replays EVERY cell: each generation as
    * a fresh per-lang prefix sketch crossed with each set's sketch. */
  def overlapRegistry(s: SparkSession, d: String): DataFrame = {
    val items = overlapItems(s, d)
    val registry = items.filter(col("__iseval"))
      .withColumn("eval_set", concat(lit("bench_"), col("__set")))
      .groupBy(col("eval_set"))
      .agg(graft.functions.KmvSketch.minima(col("__h"), RollupK)
        .as("sketch"))
    val train = items.filter(!col("__iseval"))
    val dir = tempWorkDir("graft_kmvreg") + "/t"
    val tbl = new graft.streaming.KmvRollupTable(s, dir, "lang", RollupK)
    (0 to 3).foreach(g =>
      tbl.maintain(train.filter(col("__batch") === g), col("__h")))
    tbl.overlapTimeline(registry, "eval_set")
      .select(col("gen"), col("lang"), col("eval_set"), col("est_union"),
        col("est_intersection"), col("jaccard_est"), col("n_match"))
  }

  private def registryGenSql(g: Int): String =
    s"""hr_$g AS (SELECT DISTINCT lang, h FROM lab
       |  WHERE NOT iseval AND batch <= $g),
       |rr_$g AS (SELECT lang, h,
       |    row_number() OVER (PARTITION BY lang ORDER BY h) AS rn FROM hr_$g),
       |skr_$g AS (SELECT lang, array_agg(h ORDER BY h) AS a FROM rr_$g
       |  WHERE rn <= $RollupK GROUP BY 1),
       |mr_$g AS (SELECT lang, eval_set, a, b,
       |    list_slice(list_sort(list_distinct(list_concat(a, b))), 1,
       |      $RollupK) AS um
       |  FROM skr_$g CROSS JOIN skreg),
       |er_$g AS (SELECT $g AS gen, lang, eval_set, len(um) AS keff,
       |    CASE WHEN len(um) < $RollupK THEN len(um)::DOUBLE
       |         ELSE ${RollupK - 1}::DOUBLE *
       |           1152921504606846976::BIGINT::DOUBLE / um[$RollupK]::DOUBLE
       |    END AS est_union,
       |    len(list_intersect(list_intersect(um, a), b))::BIGINT AS n_match
       |  FROM mr_$g)""".stripMargin

  val overlapRegistrySql: String = {
    val genBlocks = (0 to 3).map(registryGenSql).mkString(",\n")
    val genUnion = (0 to 3).map(g => s"SELECT * FROM er_$g")
      .mkString("\n  UNION ALL ")
    s"""WITH ${DedupQueries.shingleCtes(3)},
       |lab AS MATERIALIZED (
       |  SELECT d.lang, (d.doc_id % 5 = 0) AS iseval,
       |    'bench_' || (d.doc_id % 3) AS eval_set,
       |    (d.doc_id % 4)::INT AS batch,
       |    ('0x'||substr(md5(s.shingle),1,15))::BIGINT AS h
       |  FROM sh s JOIN documents d USING (doc_id)
       |  WHERE s.shingle IS NOT NULL),
       |hreg AS (SELECT DISTINCT eval_set, h FROM lab WHERE iseval),
       |rreg AS (SELECT eval_set, h,
       |    row_number() OVER (PARTITION BY eval_set ORDER BY h) AS rn
       |  FROM hreg),
       |skreg AS MATERIALIZED (SELECT eval_set, array_agg(h ORDER BY h) AS b
       |  FROM rreg WHERE rn <= $RollupK GROUP BY 1),
       |$genBlocks
       |SELECT gen, lang, eval_set, est_union,
       |  (n_match::DOUBLE / keff::DOUBLE) * est_union AS est_intersection,
       |  n_match::DOUBLE / keff::DOUBLE AS jaccard_est,
       |  n_match
       |FROM ($genUnion)""".stripMargin
  }

  def all: Seq[Q] = Seq(
    Q("q169_corpus_overlap", corpusOverlap, Some(corpusOverlapSql)),
    Q("q173_overlap_rollup", overlapRollup, Some(overlapRollupSql)),
    Q("q178_overlap_registry", overlapRegistry, Some(overlapRegistrySql)),
    Q("q152_hll_registers", hllRegisters, Some(hllRegistersSql)),
    Q("q153_hll_estimate", hllEstimate, Some(hllEstimateSql)),
    Q("q156_hll_rollup", hllRollup, Some(hllRollupSql)),
    Q("q135_sampled_triangles", knnTrianglesSampled,
      Some(knnTrianglesSampledSql)),
    Q("q130_knn_triangles", knnTriangles, Some(knnTrianglesSql)),
    Q("q37_kmv_distinct", kmvDistinctUsers, Some(kmvDistinctUsersSql)),
    Q("q38_hyperplane_neardup", hyperplaneNearDup, Some(hyperplaneNearDupSql)),
    Q("q184_poisson_bootstrap", poissonBootstrap, Some(poissonBootstrapSql)),
    Q("q186_exact_median_selection", exactMedianSelection,
      Some(exactMedianSelectionSql)),
    Q("q188_grouped_bootstrap", groupedBootstrap, Some(groupedBootstrapSql)),
    Q("q196_bootstrap_ci", bootstrapCi, Some(bootstrapCiSql)),
    Q("q190_exact_quartiles", exactQuartiles, Some(exactQuartilesSql)),
    Q("q198_exact_double_quantiles", exactDoubleQuantiles,
      Some(exactDoubleQuantilesSql)),
    Q("q70_knn_graph", knnGraph, Some(knnGraphSql)),
    Q("q109_knn_pagerank", knnPageRank, Some(knnPageRankSql)),
    Q("q96_countmin_tokens", countMinTokens, Some(countMinTokensSql)),
    Q("q100_hist_quantiles", histQuantiles, Some(histQuantilesSql)),
    Q("q105_join_size_sketch", joinSizeSketch, Some(joinSizeSketchSql)))
}
