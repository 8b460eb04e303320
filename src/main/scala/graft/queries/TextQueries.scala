package graft.queries

import graft.Tables
import graft.operators.{BigramLm, Dedup, Lifecycle, TextAnalysis => TA}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis coverage over the `documents` table: token counting,
  * quality scoring, language-ID, content fingerprinting, exact dedup.
  * Every metric is a deterministic expression over exact ints (or a
  * single double division), so results hash-match DuckDB bit-for-bit.
  *
  * Scale notes: all scan-side scalar expressions (regexp count/replace,
  * md5) — zero shuffles except the final group-bys; at 100 TB these run
  * at parquet-scan speed inside one WholeStageCodegen span.
  */
object TextQueries {

  /** Per-doc stat block (SURVEY north-star: token count, quality score,
    * lang-ID, fingerprint). */
  def textStats(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      TA.tokenCount(col("text")).as("n_tokens"),
      TA.bpeTokenCount(col("text")).as("n_bpe_tokens"),
      TA.punctCount(col("text")).as("n_punct"),
      TA.stopwordCount(col("text")).as("n_stopwords"),
      round(TA.avgTokenLen(col("text")), 6).as("avg_token_len"),
      round(TA.qualityScore(col("text")), 6).as("quality"),
      TA.langId(col("text")).as("lang_pred"),
      TA.fingerprint(col("text")).as("fingerprint"))

  /** BPE pattern with SQL-literal quote doubling. */
  val bpeSqlPattern: String = TA.BpePattern.replace("'", "''")

  // DuckDB mirrors of the TextAnalysis expressions. Operation order is
  // kept identical so doubles are bit-equal before rounding.
  private val nTok = """len(regexp_extract_all(text, '\S+'))"""
  private val nPunct = """len(regexp_extract_all(text, '[.,;:!?]'))"""
  private val nStop =
    """len(regexp_extract_all(lower(text), '\b(the|a|an|and|of|to|in|is|it)\b'))"""
  private val avgTokLen =
    s"""length(regexp_replace(text, '\\s', '', 'g'))::DOUBLE / greatest($nTok, 1)::DOUBLE"""
  private def langCount(words: String) =
    s"""len(regexp_extract_all(lower(text), '\\b($words)\\b'))"""
  private val zh = """len(regexp_extract_all(text, '[\x{4e00}-\x{9fff}]'))"""
  private val en = langCount("the|and|of|to|is")
  private val de = langCount("der|die|das|und|ist")
  private val fr = langCount("le|la|les|et|est")
  private val es = langCount("el|los|las|y|es")
  private val langPred =
    s"""CASE WHEN $zh > 0 THEN 'zh'
       |     WHEN $en >= $de AND $en >= $fr AND $en >= $es THEN 'en'
       |     WHEN $de >= $fr AND $de >= $es THEN 'de'
       |     WHEN $fr >= $es THEN 'fr'
       |     ELSE 'es' END""".stripMargin
  private[queries] val quality =
    s"""least($nTok::DOUBLE / 50.0, 1.0) * 0.4
       | + least($nStop::DOUBLE * 10.0 / greatest($nTok::DOUBLE, 1.0), 1.0) * 0.2
       | + (1.0 - least($nPunct::DOUBLE * 4.0 / greatest($nTok::DOUBLE, 1.0), 1.0)) * 0.2
       | + (CASE WHEN $avgTokLen BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.0 END) * 0.2""".stripMargin
  private[queries] val fingerprint =
    """md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))"""

  val textStatsSql: String =
    s"""SELECT doc_id, $nTok AS n_tokens,
       |  len(list_filter(regexp_extract_all(text, '$bpeSqlPattern'),
       |      t -> regexp_matches(t, '\\S'))) AS n_bpe_tokens,
       |  $nPunct AS n_punct,
       |  $nStop AS n_stopwords,
       |  round($avgTokLen, 6) AS avg_token_len,
       |  round($quality, 6) AS quality,
       |  $langPred AS lang_pred,
       |  $fingerprint AS fingerprint
       |FROM documents""".stripMargin

  /** Language-ID confusion matrix vs the generator's `lang` label, plus
    * mean quality per cell (exact-int ratio). */
  def langBreakdown(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy(col("lang"), TA.langId(col("text")).as("lang_pred"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))

  val langBreakdownSql: String =
    s"""SELECT lang, $langPred AS lang_pred, count(*) AS n_docs,
       |  (sum(n_chars))::BIGINT AS total_chars
       |FROM documents GROUP BY 1, 2""".stripMargin

  /** Exact dedup keyed on the normalized-content fingerprint (SURVEY
    * north-star "exact hash-groupBy dedup"): canonical doc id + copy
    * count per distinct content. */
  def dedupExact(s: SparkSession, d: String): DataFrame =
    Dedup.exact(
      Tables.documents(s, d)
        .withColumn("fingerprint", TA.fingerprint(col("text"))),
      "doc_id", Seq(col("fingerprint")))

  val dedupExactSql: String =
    s"""SELECT $fingerprint AS fingerprint, min(doc_id) AS doc_id,
       |  count(*) AS n_copies
       |FROM documents GROUP BY 1""".stripMargin

  /** Order-sensitive rolling-hash fingerprint (portable md5-leaf mode so
    * DuckDB can replay the fold with list_reduce). */
  def rollingFingerprint(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      TA.rollingHash(col("text"), portable = true).as("rhash"))

  val rollingFingerprintSql: String =
    s"""SELECT doc_id,
       |  list_reduce(
       |    list_prepend(0::BIGINT, regexp_split_to_array(trim(text), '\\s+')
       |      .list_transform(t -> ('0x'||substr(md5(t),1,15))::BIGINT % ${Dedup.MersennePrime31})),
       |    (acc, h) -> (acc * 31 + h) % ${Dedup.MersennePrime31}) AS rhash
       |FROM documents""".stripMargin

  /** Explode / lateral-unnest shape: corpus-wide token frequencies,
    * deterministic top-50 ((n, token) is a total order). */
  def tokenExplode(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(explode(split(trim(col("text")), "\\s+")).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(50)

  val tokenExplodeSql: String =
    """SELECT token, count(*) AS n FROM (
      |  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token
      |  FROM documents) t
      |WHERE token <> '' GROUP BY 1
      |ORDER BY n DESC, token LIMIT 50""".stripMargin

  /** TF-IDF-style top terms per language: per-(lang, term) term
    * frequency × an inverse-document-frequency ratio N/df. The ratio
    * form (single correctly-rounded IEEE division, then one multiply)
    * is bit-deterministic across engines, unlike ln()-based idf where
    * libm implementations differ in the last ulp. Dataflow = two
    * shuffles over the token relation (tf keyed by (lang,term), df by
    * term) + a broadcast scalar N + a per-lang top-k window — at
    * 100 TB the token explosion stays partition-local and both
    * aggregations combine map-side. */
  def tfidfTopTerms(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val toks = docs
      .select(col("lang"), col("doc_id"),
        explode(split(trim(lower(col("text"))), "\\s+")).as("term"))
      .filter(col("term") =!= "")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tf = toks.groupBy(col("lang"), col("term")).agg(count(lit(1)).as("tf"))
    val idf = toks.groupBy(col("term")).agg(countDistinct(col("doc_id")).as("df"))
    val n = docs.agg(count(lit(1)).as("__n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("score").desc, col("term"))
    tf.join(idf, "term").crossJoin(broadcast(n))
      .withColumn("score", col("tf") * (col("__n").cast("double") / col("df")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 10)
      .select(col("lang"), col("term"), col("tf"), col("df"), col("score"))
  }

  val tfidfTopTermsSql: String =
    """WITH toks AS (
      |  SELECT lang, doc_id,
      |    unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
      |  FROM documents),
      |t AS (SELECT * FROM toks WHERE term <> ''),
      |tf AS (SELECT lang, term, count(*) AS tf FROM t GROUP BY 1, 2),
      |idf AS (SELECT term, count(DISTINCT doc_id) AS df FROM t GROUP BY 1),
      |n AS (SELECT count(*) AS n FROM documents),
      |scored AS (
      |  SELECT lang, term, tf, df, tf * ((SELECT n FROM n)::DOUBLE / df) AS score
      |  FROM tf JOIN idf USING (term)),
      |ranked AS (SELECT *, row_number()
      |    OVER (PARTITION BY lang ORDER BY score DESC, term) AS rk
      |  FROM scored)
      |SELECT lang, term, tf, df, score FROM ranked WHERE rk <= 10""".stripMargin

  /** Fixed-point BM25 top-20 for a 3-term query (one rare term, "dup",
    * plus two common ones — the idf spread is what BM25 is for). The
    * oracle replays the full integer formula, so ranking AND scores
    * hash-match; see [[graft.operators.Retrieval]] for why fixed-point. */
  private val bm25Terms = Seq("dup", "spark", "join")

  def bm25Search(s: SparkSession, d: String): DataFrame =
    graft.operators.Retrieval.bm25TopK(
      Tables.documents(s, d), "doc_id", "text", bm25Terms, k = 20)

  val bm25SearchSql: String =
    graft.operators.Retrieval.bm25TopKSql(
      "documents", "doc_id", "text", bm25Terms, k = 20)

  /** q90's exact BM25 ranking THROUGH the persisted inverted index
    * (lean non-positional build): tf/len_d come from the bucket-pruned
    * postings, (N, totLen) from the per-batch stats files — no corpus
    * re-tokenization at query time. Same oracle as q90: the two paths
    * must produce identical scores, which pins the denormalized
    * len_d/stats layout against the from-scratch computation. */
  def bm25Indexed(s: SparkSession, d: String): DataFrame = {
    import graft.operators.InvertedIndex
    val path = tempWorkDir("graft_q128_")
    InvertedIndex.build(Tables.documents(s, d), "doc_id", "text",
      nBuckets = 16, path, positions = false)
    InvertedIndex.bm25Search(InvertedIndex.load(s, path), bm25Terms, k = 20)
  }

  /** Hybrid retrieval: reciprocal-rank fusion of the INDEXED BM25
    * top-20 (q128's machinery — bucket-pruned postings, no corpus
    * re-tokenization) with the persisted-IVF ANN top-20 neighbors of
    * vector 0 (q83's machinery — partition-pruned probes). Fusion is
    * [[graft.operators.Retrieval.rrfFuse]]'s exact integer
    * Σ 10⁶ div (60 + rank), so the oracle replays both rankings AND
    * the fused scores bit-for-bit — the standard candidate-generation
    * shape for dedup/decontamination lookups that need both lexical
    * and semantic recall. */
  def hybridRrf(s: SparkSession, d: String): DataFrame = {
    import graft.operators.{InvertedIndex, IvfIndex, Retrieval}
    import org.apache.spark.sql.expressions.Window
    val lexPath = tempWorkDir("graft_q141_lex_")
    InvertedIndex.build(Tables.documents(s, d), "doc_id", "text",
      nBuckets = 16, lexPath, positions = false)
    val lex = InvertedIndex
      .bm25Search(InvertedIndex.load(s, lexPath), bm25Terms, k = 20)
      // bounded 20-row list: the unpartitioned rank window is fine
      .withColumn("rank", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id"))))
      .select(col("doc_id"), col("rank"))
    val emb = Tables.embeddings(s, d)
    val semPath = tempWorkDir("graft_q141_sem_")
    IvfIndex.build(emb, "vec_id", "embedding", "label", semPath)
    val sem = IvfIndex.topK(
        IvfIndex.load(s, semPath, "vec_id", "embedding", "label"),
        emb.filter(col("vec_id") === 0), k = 20, nprobe = 2)
      .select(col("neighbor_id").as("doc_id"), col("rank"))
    Retrieval.rrfFuse(Seq(lex, sem), "doc_id", k = 10)
  }

  val hybridRrfSql: String = {
    def cos(a: String, b: String) =
      s"round(list_dot_product($a,$b)/(sqrt(list_dot_product($a,$a))*sqrt(list_dot_product($b,$b))), 6)"
    s"""WITH bm AS (${bm25SearchSql.replace("\n", "\n  ")}),
       |bmr AS (SELECT doc_id,
       |    row_number() OVER (ORDER BY score DESC, doc_id) AS rank FROM bm),
       |ann AS (
       |  WITH med AS (
       |    SELECT label, embedding::DOUBLE[] AS mv
       |    FROM embeddings e
       |    JOIN (SELECT label AS ml, min(vec_id) AS mid
       |          FROM embeddings GROUP BY 1) m
       |      ON e.vec_id = m.mid AND e.label = m.ml),
       |  q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
       |        FROM embeddings WHERE vec_id = 0),
       |  routed AS (SELECT query_id, qv, label FROM (
       |      SELECT q.query_id, q.qv, med.label,
       |        row_number() OVER (PARTITION BY q.query_id
       |          ORDER BY ${cos("q.qv", "med.mv")} DESC, med.label) AS r
       |      FROM q CROSS JOIN med) t WHERE r <= 2),
       |  c AS (SELECT vec_id, label, embedding::DOUBLE[] AS cv FROM embeddings),
       |  scored AS (SELECT query_id, c.vec_id AS neighbor_id,
       |      ${cos("qv", "cv")} AS similarity
       |    FROM routed JOIN c ON routed.label = c.label
       |    WHERE query_id <> c.vec_id),
       |  r AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |          ORDER BY similarity DESC, neighbor_id) AS rank FROM scored)
       |  SELECT neighbor_id AS doc_id, rank FROM r WHERE rank <= 20),
       |u AS (SELECT doc_id, rank FROM bmr
       |      UNION ALL SELECT doc_id, rank FROM ann),
       |f AS (SELECT doc_id, count(*) AS n_lists,
       |        sum(1000000 // (60 + rank))::BIGINT AS rrf_score
       |      FROM u GROUP BY 1)
       |SELECT doc_id, n_lists, rrf_score FROM f
       |ORDER BY rrf_score DESC, doc_id LIMIT 10""".stripMargin
  }

  /** Exact heavy hitters (tokens covering ≥1% of the corpus token
    * stream) through the Misra-Gries candidate pass + exact-confirm
    * second pass ([[graft.operators.Frequency]]) — identical output to
    * the oracle's plain GROUP BY + HAVING, without shuffling the full
    * distinct-term space. */
  def heavyTokens(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(explode(TA.whitespaceTokens(lower(trim(col("text")))))
        .as("term"))
      .filter(col("term") =!= "")
    val n = toks.count()
    graft.operators.Frequency.heavyHitters(
      toks, "term", math.max(n / 100, 1), Some(n))
  }

  val heavyTokensSql: String =
    """WITH toks AS (
      |  SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
      |  FROM documents),
      |t AS (SELECT * FROM toks WHERE term <> ''),
      |n AS (SELECT count(*) AS n FROM t)
      |SELECT term, count(*) AS cnt FROM t GROUP BY term
      |HAVING count(*) >= greatest((SELECT n FROM n) // 100, 1)""".stripMargin

  /** Corpus-wide adjacent-token pair counts — the candidate table for
    * one BPE merge step (vocabulary induction at corpus scale): one
    * scan-side pair explode, one keyed count, top-20 via
    * TakeOrderedAndProject. */
  def bpeMergeCandidates(s: SparkSession, d: String): DataFrame = {
    val withToks = Tables.documents(s, d)
      .select(TA.whitespaceTokens(lower(trim(col("text")))).as("__toks"))
      .filter(col("__toks").isNotNull && size(col("__toks")) >= 2)
    val toks = col("__toks")
    withToks
      .select(explode(transform(sequence(lit(0), size(toks) - 2),
        i => concat(element_at(toks, i + 1), lit(" "), element_at(toks, i + 2))))
        .as("pair"))
      .groupBy(col("pair")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("pair")).limit(20)
  }

  val bpeMergeCandidatesSql: String =
    """WITH docs AS (
      |  SELECT regexp_split_to_array(trim(lower(text)), '\s+') AS toks
      |  FROM documents),
      |p AS (SELECT toks[i] || ' ' || toks[i+1] AS pair
      |      FROM docs, unnest(range(1, len(toks))) t(i)
      |      WHERE len(toks) >= 2)
      |SELECT pair, count(*) AS cnt FROM p GROUP BY 1
      |ORDER BY cnt DESC, pair LIMIT 20""".stripMargin

  /** Persisted inverted-index lookup: `InvertedIndex.build` (postings
    * bucket-partitioned on disk by the portable term hash) → `load` →
    * `search` — the build-once/query-many lexical lifecycle. The term
    * list routes to bucket literals driver-side, so the postings scan
    * partition-prunes (spec-pinned); the oracle replays the postings
    * relation and the (n_matched, tf_sum, doc_id) ranking. */
  private val invTerms = Seq("merge", "vector", "stream")

  def invertedSearch(s: SparkSession, d: String): DataFrame = {
    import graft.operators.InvertedIndex
    val path = tempWorkDir("graft_q110_")
    InvertedIndex.build(Tables.documents(s, d), "doc_id", "text",
      nBuckets = 16, path)
    InvertedIndex.search(InvertedIndex.load(s, path), invTerms, k = 20)
  }

  val invertedSearchSql: String = {
    val inList = invTerms.map(t => s"'$t'").mkString(", ")
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS term
       |  FROM documents),
       |t AS (SELECT * FROM toks WHERE term <> ''),
       |p AS (SELECT term, doc_id, count(*) AS tf FROM t GROUP BY 1, 2),
       |m AS (SELECT doc_id, count(DISTINCT term) AS n_matched,
       |        sum(tf) AS tf_sum
       |      FROM p WHERE term IN ($inList) GROUP BY 1)
       |SELECT doc_id, n_matched::BIGINT AS n_matched, tf_sum::BIGINT AS tf_sum
       |FROM m ORDER BY n_matched DESC, tf_sum DESC, doc_id LIMIT 20""".stripMargin
  }

  /** q204: the inverted index's full lifecycle WITH RETENTION ACTIVE
    * in the gate — build (⅓ of the corpus) → append (⅓) → in-place
    * compaction fold ([[graft.operators.InvertedIndex.compactPostings]]
    * folds both increments + their stats into one committed `gen=`
    * unit and MARKS the covered directories) → VACUUM tick (sweeps
    * them — the r14 mark-then-sweep protocol, one janitor cycle of
    * reader grace) → post-fold append (⅓) → BM25 serving off the
    * folded+live tree. Gated by the SAME oracle as q90/q128: retention
    * must be invisible to scores — postings AND the summed (N, totLen)
    * stats must survive the fold exactly, which makes the fold's
    * stats-summing a contract instead of an accident. */
  def invertedLifecycle(s: SparkSession, d: String): DataFrame = {
    import graft.operators.InvertedIndex
    val docs = Tables.documents(s, d)
    val path = tempWorkDir("graft_q204_")
    InvertedIndex.build(docs.filter(pmod(col("doc_id"), lit(3)) === 0),
      "doc_id", "text", nBuckets = 16, path, positions = false)
    InvertedIndex.append(s, path,
      docs.filter(pmod(col("doc_id"), lit(3)) === 1), "doc_id", "text")
    InvertedIndex.compactPostings(s, path, upTo = 2L)
    InvertedIndex.vacuum(s, path)
    InvertedIndex.append(s, path,
      docs.filter(pmod(col("doc_id"), lit(3)) === 2), "doc_id", "text")
    InvertedIndex.bm25Search(InvertedIndex.load(s, path), bm25Terms, k = 20)
  }

  /** Vocabulary coverage / OOV audit: the top-100 terms of the English
    * slice (count desc, term asc — a total order, so the cutoff is
    * deterministic) form the vocabulary; every language's token stream
    * is scored against it. The rate ships as integer parts-per-million
    * (floor div) — no float ratio in the gate. The vocabulary
    * broadcast-joins against the token stream, so the audit is one
    * pass over the corpus regardless of corpus size — the coverage
    * check run before committing to a tokenizer/vocab on new data. */
  def vocabCoverage(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(col("lang"),
        explode(TA.whitespaceTokens(lower(trim(col("text"))))).as("term"))
      .filter(col("term") =!= "")
    val vocab = toks.filter(col("lang") === "en")
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term")).limit(100)
      .select(col("term"), lit(1L).as("__inv"))
    toks.join(broadcast(vocab), Seq("term"), "left")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__inv").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("lang"), col("n_tokens"), col("n_oov"),
        expr("(n_oov * 1000000) div n_tokens").as("oov_ppm"))
  }

  val vocabCoverageSql: String =
    s"""WITH toks AS (
       |  SELECT lang,
       |    unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS term
       |  FROM documents),
       |t AS (SELECT * FROM toks WHERE term <> ''),
       |vocab AS (SELECT term FROM (
       |    SELECT term, count(*) AS cnt FROM t WHERE lang = 'en'
       |    GROUP BY 1)
       |  ORDER BY cnt DESC, term LIMIT 100)
       |SELECT lang, count(*) AS n_tokens,
       |  (sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END))::BIGINT AS n_oov,
       |  ((sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) * 1000000)
       |    // count(*))::BIGINT AS oov_ppm
       |FROM t LEFT JOIN vocab v ON t.term = v.term
       |GROUP BY 1""".stripMargin

  /** Windowed term co-occurrence (window ≤ 5 positions) — the raw
    * counts table behind PMI/embedding-training pair generation. The
    * scale shape is the point: co-occurrence is INTRA-document, so
    * pairs at distance `off` are the array zipped with itself shifted
    * by `off` — a pure scan-side projection (a first cut equi-joined
    * token rows on (doc, pos+off): correct, but it shuffled the whole
    * positional token stream through the join — measured 16.96s at
    * sf1.0 vs 0.61s for this form, 28x). The only shuffle left is the final
    * pair count, map-side combined. The oracle is the naive positional
    * band theta-join; pairs are canonicalized (least, greatest) and
    * same-term pairs dropped. */
  def termCooccurrence(s: SparkSession, d: String): DataFrame = {
    val raw = Tables.documents(s, d)
      .select(TA.whitespaceTokens(lower(trim(col("text")))).as("toks"))
    val toks = col("toks")
    val shifted = (1 to 5).map { off =>
      arrays_zip(
        slice(toks, lit(1), greatest(size(toks) - off, lit(0))),
        slice(toks, lit(off + 1), greatest(size(toks) - off, lit(0))))
    }
    raw.select(explode(concat(shifted: _*)).as("p"))
      .select(col("p.0").as("t1"), col("p.1").as("t2"))
      .filter(col("t1") =!= col("t2"))
      .select(least(col("t1"), col("t2")).as("term_a"),
        greatest(col("t1"), col("t2")).as("term_b"))
      .groupBy(col("term_a"), col("term_b"))
      .agg(count(lit(1)).as("n_cooc"))
      .orderBy(col("n_cooc").desc, col("term_a"), col("term_b"))
      .limit(20)
  }

  val termCooccurrenceSql: String =
    """WITH docs AS (
      |  SELECT doc_id,
      |    regexp_split_to_array(trim(lower(text)), '\s+') AS toks
      |  FROM documents),
      |tk AS (SELECT doc_id, i AS pos, toks[i] AS term
      |       FROM docs, unnest(range(1, len(toks)+1)) t(i))
      |SELECT least(a.term, b.term) AS term_a,
      |  greatest(a.term, b.term) AS term_b, count(*) AS n_cooc
      |FROM tk a JOIN tk b
      |  ON a.doc_id = b.doc_id AND b.pos > a.pos AND b.pos <= a.pos + 5
      |WHERE a.term <> b.term
      |GROUP BY 1, 2
      |ORDER BY n_cooc DESC, term_a, term_b LIMIT 20""".stripMargin

  /** Exact phrase search through the POSITIONAL inverted index: the
    * i-th phrase term's positions shift by −i and intersect — no
    * document is re-tokenized at query time, and the postings scan is
    * bucket-pruned to the phrase's terms. Oracle replays positions
    * from the raw corpus with an adjacency join. */
  def phraseSearchDocs(s: SparkSession, d: String): DataFrame = {
    import graft.operators.InvertedIndex
    val path = tempWorkDir("graft_q120_")
    InvertedIndex.build(Tables.documents(s, d), "doc_id", "text",
      nBuckets = 16, path)
    InvertedIndex.phraseSearch(InvertedIndex.load(s, path),
      Seq("table", "hash"), k = 15)
  }

  val phraseSearchDocsSql: String =
    """WITH docs AS (
      |  SELECT doc_id,
      |    regexp_split_to_array(trim(lower(text)), '\s+') AS toks
      |  FROM documents),
      |tk AS (SELECT doc_id, i AS pos, toks[i] AS term
      |       FROM docs, unnest(range(1, len(toks)+1)) t(i)),
      |m AS (SELECT a.doc_id, count(*) AS n_occurrences
      |      FROM tk a JOIN tk b
      |        ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
      |      WHERE a.term = 'table' AND b.term = 'hash'
      |      GROUP BY 1)
      |SELECT doc_id, (n_occurrences)::INT AS n_occurrences
      |FROM m ORDER BY n_occurrences DESC, doc_id LIMIT 15""".stripMargin

  /** Full BPE vocabulary induction ([[graft.operators.Bpe]]): learn
    * `BpeMerges` merges over the documents corpus and emit the merge
    * table itself — (step, lhs, rhs, pair_cnt). The oracle replays
    * EVERY training iteration as an unrolled CTE pair (pair counts →
    * deterministic argmax → vocab substitution), so the greedy
    * left-to-right merge semantics and the (count DESC, lhs, rhs)
    * tie-break are cross-engine-pinned, not trusted. */
  private[queries] val BpeMerges = 8

  def bpeTrain(s: SparkSession, d: String): DataFrame = {
    val merges = graft.operators.Bpe.trainMerges(
      Tables.documents(s, d), "text", BpeMerges)
    import s.implicits._
    merges.toDF()
  }

  /** One unrolled BPE training step: pair counts over v{i-1}, the
    * argmax merge (ties: lhs, rhs ascending), and the vocab rewritten
    * by the engines' shared leftmost-nonoverlapping `replace`. */
  private def bpeStepSql(i: Int): String = {
    val p = i - 1
    s"""bp$i AS (SELECT t[j] AS lhs, t[j+1] AS rhs, sum(cnt)::BIGINT AS pair_cnt
       |  FROM (SELECT list_filter(str_split(w, chr(31)), x -> x <> '') AS t,
       |          cnt FROM v$p),
       |       unnest(range(1, len(t))) u(j)
       |  GROUP BY 1, 2),
       |best$i AS (SELECT lhs, rhs, pair_cnt FROM bp$i
       |  ORDER BY pair_cnt DESC, lhs, rhs LIMIT 1),
       |v$i AS (SELECT word,
       |    replace(w, chr(31)||lhs||chr(31)||rhs||chr(31),
       |               chr(31)||lhs||rhs||chr(31)) AS w, cnt
       |  FROM v$p, best$i)""".stripMargin
  }

  private[queries] def bpeChainSql(n: Int): String = {
    val steps = (1 to n).map(bpeStepSql).mkString(",\n")
    s"""WITH vocab AS (SELECT w AS word, count(*) AS cnt FROM (
       |    SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS w
       |    FROM documents)
       |  WHERE w <> '' AND strpos(w, chr(31)) = 0 GROUP BY 1),
       |v0 AS (SELECT word,
       |    chr(31) || regexp_replace(word, '(.)', '\\1' || chr(31), 'g') AS w,
       |    cnt FROM vocab),
       |$steps""".stripMargin
  }

  val bpeTrainSql: String = {
    val union = (1 to BpeMerges)
      .map(i => s"SELECT $i AS step, lhs, rhs, pair_cnt FROM best$i")
      .mkString("\nUNION ALL\n")
    s"""${bpeChainSql(BpeMerges)}
       |$union""".stripMargin
  }

  /** Tokenize the corpus under the learned vocabulary
    * ([[graft.operators.Bpe.applyMerges]] — replace chain per DISTINCT
    * word, dictionary join back) → top-20 subword tokens by corpus
    * frequency. The oracle derives the same counts from the final
    * trained vocab table (token count = Σ word_cnt × occurrences in
    * the word's segmentation — the dictionary identity). */
  def bpeTokens(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    // driver-side trainer, uncapped (maxVocab = -1): spec-pinned
    // IDENTICAL merge list to the distributed loop at any input, minus
    // its 8 vocab-generation parquet round-trips + per-step argmax jobs
    // — q139 keeps gating the distributed loop itself; this query's
    // subject is the tokenizer (guide §1.2: the training passes here
    // were fixed cost the tokenize gate re-paid for no extra coverage)
    val merges = graft.operators.Bpe.trainMergesLocal(
      docs, "text", BpeMerges, maxVocab = -1)
    graft.operators.Bpe.applyMerges(docs, "doc_id", "text", merges)
      .select(explode(col("tokens")).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token")).limit(20)
  }

  val bpeTokensSql: String =
    s"""${bpeChainSql(BpeMerges)}
       |SELECT tok AS token, sum(cnt)::BIGINT AS cnt
       |FROM (SELECT list_filter(str_split(w, chr(31)), x -> x <> '') AS t,
       |        cnt FROM v$BpeMerges),
       |     unnest(t) u(tok)
       |GROUP BY 1 ORDER BY cnt DESC, token LIMIT 20""".stripMargin

  /** q154: [[BigramLm.scoreDocs]] — Laplace-smoothed bigram-LM
    * negative log-likelihood per document, fixed-point milli-bits.
    * Trained on the deterministic doc_id%5=0 reference slice, scored
    * over the whole corpus. The oracle re-trains the counts AND
    * re-evaluates the fixed-point log2 from the same pinned 256-entry
    * mantissa table, so the scores hash-match to the last milli-bit —
    * a perplexity filter with no float anywhere in the contract. */
  def bigramLmScores(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    BigramLm.scoreDocs(docs, docs.filter(pmod(col("doc_id"), lit(5)) === 0),
      "doc_id", "text")
  }

  val bigramLmScoresSql: String = {
    import graft.operators.BigramLm.{ilog2MilliDuck, tblDuck}
    s"""WITH t AS (SELECT ${tblDuck} AS tbl),
      |docs AS (
      |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+')
      |    AS toks
      |  FROM documents),
      |bg AS (
      |  SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2
      |  FROM docs, unnest(range(1, len(toks))) u(i)
      |  WHERE len(toks) >= 2),
      |tbg AS (SELECT w1, w2 FROM bg WHERE doc_id % 5 = 0),
      |bi AS (SELECT w1, w2, count(*)::BIGINT AS c12 FROM tbg GROUP BY 1, 2),
      |uni AS (SELECT w1, count(*)::BIGINT AS c1 FROM tbg GROUP BY 1),
      |v AS (SELECT count(DISTINCT w1)::BIGINT AS vv FROM tbg),
      |sc AS (
      |  SELECT bg.doc_id,
      |    coalesce(c1, 0) + vv AS den, coalesce(c12, 0) + 1 AS num
      |  FROM bg
      |  LEFT JOIN bi ON bg.w1 = bi.w1 AND bg.w2 = bi.w2
      |  LEFT JOIN uni ON bg.w1 = uni.w1
      |  CROSS JOIN v),
      |n AS (
      |  SELECT doc_id, count(*)::BIGINT AS n_bigrams,
      |    sum(${ilog2MilliDuck("den")}
      |      - ${ilog2MilliDuck("num")})::BIGINT AS nll_sum_milli
      |  FROM sc, t GROUP BY 1)
      |SELECT doc_id, n_bigrams, nll_sum_milli,
      |  (nll_sum_milli // n_bigrams)::BIGINT AS avg_nll_milli
      |FROM n""".stripMargin
  }

  /** q155: the CCNet-style KEEP decision — documents at or below the
    * corpus median LM score (fluent half stays). Median over integral
    * milli-bit scores rides the established exact-percentile parity
    * (Spark `percentile` ≡ DuckDB `quantile_cont` on integers at
    * p=0.5); the threshold stays internal, the kept set is the
    * contract. At 100 TB the median comes from approx_percentile or
    * the equi-depth scan (q136) — the decision shape is identical. */
  def perplexityFilter(s: SparkSession, d: String): DataFrame = {
    val scores = Lifecycle.materializeToScratch(bigramLmScores(s, d))
    val med = scores.agg(
      percentile(col("avg_nll_milli"), lit(0.5)).as("med"))
    scores.crossJoin(broadcast(med))
      .filter(col("avg_nll_milli") <= col("med"))
      .select(col("doc_id"), col("avg_nll_milli"))
  }

  val perplexityFilterSql: String =
    s"""WITH n AS MATERIALIZED ($bigramLmScoresSql),
      |m AS (SELECT quantile_cont(avg_nll_milli, 0.5) AS med FROM n)
      |SELECT doc_id, avg_nll_milli FROM n, m
      |WHERE avg_nll_milli <= med""".stripMargin

  def all: Seq[Q] = Seq(
    Q("q154_bigram_lm_scores", bigramLmScores, Some(bigramLmScoresSql)),
    Q("q155_perplexity_filter", perplexityFilter, Some(perplexityFilterSql)),
    Q("q139_bpe_train", bpeTrain, Some(bpeTrainSql)),
    Q("q140_bpe_tokens", bpeTokens, Some(bpeTokensSql)),
    Q("q15_text_stats", textStats, Some(textStatsSql)),
    Q("q110_inverted_search", invertedSearch, Some(invertedSearchSql)),
    Q("q120_phrase_search", phraseSearchDocs, Some(phraseSearchDocsSql)),
    Q("q115_vocab_coverage", vocabCoverage, Some(vocabCoverageSql)),
    Q("q119_term_cooccurrence", termCooccurrence, Some(termCooccurrenceSql)),
    Q("q16_lang_breakdown", langBreakdown, Some(langBreakdownSql)),
    Q("q17_dedup_exact", dedupExact, Some(dedupExactSql)),
    Q("q18_rolling_fingerprint", rollingFingerprint, Some(rollingFingerprintSql)),
    Q("q51_token_explode", tokenExplode, Some(tokenExplodeSql)),
    Q("q64_tfidf_top_terms", tfidfTopTerms, Some(tfidfTopTermsSql)),
    Q("q90_bm25_search", bm25Search, Some(bm25SearchSql)),
    Q("q128_bm25_indexed", bm25Indexed, Some(bm25SearchSql)),
    Q("q204_inverted_lifecycle", invertedLifecycle, Some(bm25SearchSql)),
    Q("q141_hybrid_rrf", hybridRrf, Some(hybridRrfSql)),
    Q("q91_heavy_tokens", heavyTokens, Some(heavyTokensSql)),
    Q("q95_bpe_merge_pairs", bpeMergeCandidates, Some(bpeMergeCandidatesSql)))
}
