package graft.queries

import graft.Tables
import graft.operators.{Curation, DataMix}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-curation coverage (training-data pipeline first-class ops):
  * Gopher-style repetition quality metrics, corpus-level boilerplate
  * n-grams, and train/test contamination. Oracles replay the full
  * pipelines (tokenization, bigram multiset, the md5-derived split,
  * the stop-shingle cap) in DuckDB.
  */
object CurationQueries {

  /** Per-doc repetition metrics; all divisions are single exact-int →
    * double operations, so values hash-match bit-for-bit. */
  def repetitionQuality(s: SparkSession, d: String): DataFrame =
    Curation.repetitionStats(Tables.documents(s, d), "doc_id", "text")

  val repetitionQualitySql: String =
    """WITH docs AS (SELECT doc_id,
      |    regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
      |st AS (SELECT doc_id, len(toks) AS n_tokens,
      |         len(list_distinct(toks)) AS n_distinct FROM docs),
      |bg AS (SELECT doc_id, array_to_string(toks[i:i+1], ' ') AS bigram
      |       FROM docs, unnest(range(1, len(toks))) t(i)),
      |bgc AS (SELECT doc_id, bigram, count(*) AS n FROM bg GROUP BY 1, 2),
      |bga AS (SELECT doc_id, max(n) AS top_n, (sum(n))::BIGINT AS n_bigrams
      |        FROM bgc GROUP BY 1)
      |SELECT st.doc_id, n_tokens,
      |  (n_tokens - n_distinct)::DOUBLE / greatest(n_tokens, 1) AS dup_token_frac,
      |  coalesce(top_n::DOUBLE / n_bigrams, 0.0) AS top_bigram_frac
      |FROM st LEFT JOIN bga ON st.doc_id = bga.doc_id""".stripMargin

  /** Boilerplate 3-grams: present in >= 5 distinct docs. */
  def boilerplate(s: SparkSession, d: String): DataFrame =
    Curation.boilerplateNgrams(Tables.documents(s, d), "doc_id", "text",
      n = 3, minDocs = 5)

  val boilerplateSql: String =
    """WITH docs AS (SELECT doc_id,
      |    regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
      |sh AS (SELECT DISTINCT doc_id, array_to_string(toks[i:i+2], ' ') AS shingle
      |       FROM docs, unnest(range(1, greatest(len(toks)-1, 2))) t(i))
      |SELECT shingle, count(*) AS n_docs FROM sh
      |GROUP BY 1 HAVING count(*) >= 5""".stripMargin

  /** Cross-split 5-gram contamination over the deterministic md5 split
    * (same membership as q45), stop-shingle cap 50. */
  def contamination(s: SparkSession, d: String): DataFrame = {
    val split = DataMix.trainTestSplit(Tables.documents(s, d), "doc_id", 0.2)
    Curation.splitContamination(split, "doc_id", "text", "split",
      n = 5, maxDocFreq = 50)
  }

  val contaminationSql: String =
    """WITH docs AS (SELECT doc_id,
      |    CASE WHEN ('0x'||substr(md5(doc_id::VARCHAR || '#42'),1,15))::BIGINT % 1000000 < 200000
      |         THEN 'test' ELSE 'train' END AS split,
      |    regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
      |sh AS (SELECT DISTINCT doc_id, split, array_to_string(toks[i:i+4], ' ') AS shingle
      |       FROM docs, unnest(range(1, greatest(len(toks)-3, 2))) t(i)),
      |freq AS (SELECT shingle, count(*) AS n_df FROM sh GROUP BY 1),
      |rare AS (SELECT sh.* FROM sh JOIN freq USING (shingle) WHERE n_df <= 50)
      |SELECT a.doc_id AS test_id,
      |  count(DISTINCT b.doc_id) AS n_train_docs,
      |  count(*) AS n_hits
      |FROM rare a JOIN rare b
      |  ON a.shingle = b.shingle AND a.split = 'test' AND b.split = 'train'
      |GROUP BY 1""".stripMargin

  /** The full curation loop composed end-to-end — what a 100 TB
    * training-data job actually runs, as ONE declarative plan:
    *
    *   1. exact dedup (normalized-content fingerprint, keep min id);
    *   2. quality gate (deterministic heuristic score ≥ 0.6);
    *   3. near-dup removal: capped-Jaccard pairs over the survivors →
    *      connected components → drop non-representatives;
    *   4. deterministic train/test split (portable id-hash).
    *
    * Output is one row per (split, lang) with a membership-sensitive
    * id checksum, so the oracle — which replays every stage in DuckDB,
    * including the recursive component closure — catches a single
    * mis-kept document. Stage order matters at scale: the cheap exact
    * dedup and scan-side quality gate shrink the corpus before the
    * (shuffle-heavy) near-dup stage runs. */
  def curateCorpus(s: SparkSession, d: String): DataFrame = {
    import graft.operators.{Components, Dedup, TextAnalysis => TA}
    val docs = Tables.documents(s, d)
    val keepIds = docs.groupBy(TA.fingerprint(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val d1 = docs.join(keepIds, Seq("doc_id"), "left_semi")
    // the filtered corpus feeds three consumers (pair generation, the
    // anti-join, the final aggregate) — without materialization the
    // dedup join + quality scan re-run per consumer. Scratch-table
    // materialization (not persist): the round-3 persist here pinned
    // the frame in the CacheManager for the session lifetime, leaking
    // across bench runs ("Asked to cache already cached data") and
    // making q65 timings cache-state-dependent. At 100 TB this IS the
    // curated intermediate table a real pipeline writes between stages.
    val d2 = graft.operators.Lifecycle.materializeToScratch(
      d1.filter(TA.qualityScore(col("text")) >= 0.6))
    val pairs = Dedup.ngramJaccardPairs(d2, "doc_id", "text",
      n = 3, minJaccard = 0.5, maxDocFreq = Some(DedupQueries.NgramMaxDocFreq))
    val d3 = Components.dropNearDuplicates(d2, "doc_id", pairs)
    val d4 = DataMix.trainTestSplit(d3, "doc_id", testFraction = 0.1)
    d4.groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(TA.tokenCount(col("text"))).as("n_tokens"),
        sum(col("doc_id")).as("id_checksum"))
  }

  val curateCorpusSql: String =
    s"""WITH RECURSIVE
       |fp AS (SELECT ${TextQueries.fingerprint} AS fp, min(doc_id) AS keep_id
       |       FROM documents GROUP BY 1),
       |d1 AS (SELECT d.* FROM documents d
       |       JOIN fp ON d.doc_id = fp.keep_id),
       |d2 AS (SELECT * FROM d1 WHERE ${TextQueries.quality} >= 0.6),
       |${DedupQueries.shingleCtes(3, from = "d2")},
       |${DedupQueries.cappedCommonCtes},
       |${DedupQueries.clusterCtes},
       |losers AS (SELECT s AS doc_id FROM reach GROUP BY s
       |           HAVING least(s, min(d)) <> s),
       |d3 AS (SELECT * FROM d2
       |       WHERE doc_id NOT IN (SELECT doc_id FROM losers)),
       |d4 AS (SELECT *,
       |  CASE WHEN ('0x'||substr(md5(doc_id::VARCHAR || '#42'),1,15))::BIGINT
       |         % 1000000 < 100000
       |       THEN 'test' ELSE 'train' END AS split
       |  FROM d3)
       |SELECT split, lang, count(*) AS n_docs,
       |  (sum(len(regexp_extract_all(text, '\\S+'))))::BIGINT AS n_tokens,
       |  (sum(doc_id))::BIGINT AS id_checksum
       |FROM d4 GROUP BY 1, 2""".stripMargin

  /** Sliding-window chunking (64-token windows, stride 48): per-chunk
    * token counts + content digests, so the oracle verifies exact
    * window boundaries and chunk text byte-for-byte. */
  def docChunks(s: SparkSession, d: String): DataFrame = {
    import graft.operators.{Curation, TextAnalysis => TA}
    Curation.chunk(Tables.documents(s, d), "doc_id", "text",
        chunkTokens = 64, stride = 48)
      .select(col("doc_id"), col("chunk_idx"),
        TA.tokenCount(col("chunk_text")).as("n_tokens"),
        md5(col("chunk_text")).as("chunk_md5"))
  }

  val docChunksSql: String =
    """WITH docs AS (SELECT doc_id,
      |    regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
      |c AS (SELECT doc_id, i AS chunk_idx,
      |        array_to_string(toks[i*48+1 : i*48+64], ' ') AS chunk_text
      |      FROM docs, unnest(range(0,
      |        greatest(1, ceil((len(toks)-64)/48.0)::BIGINT + 1))) t(i))
      |SELECT doc_id, chunk_idx,
      |  len(regexp_extract_all(chunk_text, '\S+')) AS n_tokens,
      |  md5(chunk_text) AS chunk_md5
      |FROM c""".stripMargin

  /** PII scrub over documents carrying deterministic synthetic PII
    * (email + IPv4 + phone derived from the doc id — the testdata
    * corpus itself is synthetic prose with none): per-doc hit counts
    * and the digest of the scrubbed text. */
  def piiRedaction(s: SparkSession, d: String): DataFrame = {
    import graft.operators.Curation
    val withPii = Tables.documents(s, d).withColumn("text",
      concat(col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@example.com or 10.0.0."),
        pmod(col("doc_id"), lit(256)).cast("string"),
        lit(" tel +1 (555) 010-"),
        pmod(col("doc_id"), lit(10000)).cast("string")))
    Curation.redactPii(withPii, "text")
      .select(col("doc_id"), col("n_emails"), col("n_ips"), col("n_phones"),
        md5(col("text")).as("redacted_md5"))
  }

  val piiRedactionSql: String = {
    import graft.operators.Curation.{EmailRe, Ipv4Re, PhoneRe}
    s"""WITH t AS (SELECT doc_id,
       |    text || ' contact user' || doc_id::VARCHAR
       |         || '@example.com or 10.0.0.' || (doc_id % 256)::VARCHAR
       |         || ' tel +1 (555) 010-' || (doc_id % 10000)::VARCHAR AS text
       |  FROM documents)
       |SELECT doc_id,
       |  len(regexp_extract_all(text, '$EmailRe')) AS n_emails,
       |  len(regexp_extract_all(text, '$Ipv4Re')) AS n_ips,
       |  len(regexp_extract_all(text, '$PhoneRe')) AS n_phones,
       |  md5(regexp_replace(regexp_replace(regexp_replace(text,
       |    '$EmailRe', '<EMAIL>', 'g'),
       |    '$Ipv4Re', '<IP>', 'g'),
       |    '$PhoneRe', '<PHONE>', 'g')) AS redacted_md5
       |FROM t""".stripMargin
  }

  /** Corpus-wide segment dedup over non-overlapping 8-token segments:
    * repeated segments keep only their first (doc_id, idx) occurrence,
    * docs reassemble from survivors. The oracle replays segmentation,
    * the global first-occurrence window, and the reassembled digest. */
  def segmentDedup(s: SparkSession, d: String): DataFrame = {
    import graft.operators.Curation
    val segs = Curation.chunk(Tables.documents(s, d), "doc_id", "text",
      chunkTokens = 8, stride = 8)
    Curation.dedupSegments(segs, "doc_id", "chunk_idx", "chunk_text", " ")
      .select(col("doc_id"), col("n_segments"), col("n_kept"),
        md5(col("text")).as("kept_md5"))
  }

  val segmentDedupSql: String =
    """WITH docs AS (SELECT doc_id,
      |    regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
      |c AS (SELECT doc_id, i AS chunk_idx,
      |        array_to_string(toks[i*8+1 : i*8+8], ' ') AS seg
      |      FROM docs, unnest(range(0,
      |        greatest(1, ceil((len(toks)-8)/8.0)::BIGINT + 1))) t(i)),
      |m AS (SELECT doc_id, chunk_idx, seg,
      |        row_number() OVER (PARTITION BY seg
      |                           ORDER BY doc_id, chunk_idx) = 1 AS keep
      |      FROM c)
      |SELECT doc_id, count(*) AS n_segments,
      |  (sum(CASE WHEN keep THEN 1 ELSE 0 END))::BIGINT AS n_kept,
      |  md5(coalesce(string_agg(CASE WHEN keep THEN seg END, ' '
      |                          ORDER BY chunk_idx), '')) AS kept_md5
      |FROM m GROUP BY 1""".stripMargin

  /** Maximal cross-doc repeated spans (5-gram granularity, ≥2 docs,
    * ≥10 tokens) — the substring-dedup removal list. The oracle
    * replays the whole pipeline: positional shingles, the duplicated
    * set, and the gaps-and-islands merge. */
  def repeatedSpansQ(s: SparkSession, d: String): DataFrame =
    Curation.repeatedSpans(Tables.documents(s, d), "doc_id", "text",
      n = 5, minDocs = 2, minTokens = 10)

  val repeatedSpansSql: String =
    """WITH docs AS (
      |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
      |  FROM documents),
      |sh AS (SELECT doc_id, i - 1 AS pos, array_to_string(toks[i:i+4], ' ') AS shingle
      |       FROM docs, unnest(range(1, len(toks) - 5 + 2)) t(i)
      |       WHERE len(toks) >= 5),
      |dup AS (SELECT shingle FROM sh GROUP BY 1
      |        HAVING count(DISTINCT doc_id) >= 2),
      |cov AS (SELECT doc_id, pos, pos + 4 AS endpos FROM sh JOIN dup USING (shingle)),
      |isl AS (SELECT doc_id, pos, endpos,
      |  max(endpos) OVER (PARTITION BY doc_id ORDER BY pos
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prevmax
      |  FROM cov),
      |flag AS (SELECT *, CASE WHEN prevmax IS NULL OR pos > prevmax + 1
      |                        THEN 1 ELSE 0 END AS isnew FROM isl),
      |grp AS (SELECT *, sum(isnew) OVER (PARTITION BY doc_id ORDER BY pos
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island FROM flag)
      |SELECT doc_id, min(pos) AS span_start, max(endpos) AS span_end,
      |  max(endpos) - min(pos) + 1 AS span_tokens
      |FROM grp GROUP BY doc_id, island
      |HAVING max(endpos) - min(pos) + 1 >= 10""".stripMargin

  /** Quality-score calibration report: per-language decile buckets of
    * the deterministic quality score (decile from integer rank
    * arithmetic — ((rank-1)*10) div (n-1) — so bucket membership is
    * engine-exact, unlike ntile or FP percent_rank). The per-bucket
    * count + score range is what a data-mix curator reads before
    * picking per-language quality cutoffs. */
  def qualityCalibration(s: SparkSession, d: String): DataFrame = {
    import graft.operators.{TextAnalysis => TA}
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("quality"), col("doc_id"))
    val wn = org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        round(TA.qualityScore(col("text")), 6).as("quality"))
      .withColumn("__rk", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(wn))
      .withColumn("decile",
        least(expr("((__rk - 1) * 10) div greatest(__n - 1, 1)"), lit(9)))
      .groupBy(col("lang"), col("decile"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("quality")).as("min_q"), max(col("quality")).as("max_q"))
  }

  val qualityCalibrationSql: String = {
    // quality replay shared verbatim with q15's oracle expression
    val quality = TextQueries.quality
    s"""WITH q AS (
       |  SELECT doc_id, lang, round($quality, 6) AS quality FROM documents),
       |rk AS (SELECT doc_id, lang, quality,
       |  row_number() OVER (PARTITION BY lang ORDER BY quality, doc_id) AS rk,
       |  count(*) OVER (PARTITION BY lang) AS n FROM q)
       |SELECT lang,
       |  least(((rk - 1) * 10) // greatest(n - 1, 1), 9) AS decile,
       |  count(*) AS n_docs, min(quality) AS min_q, max(quality) AS max_q
       |FROM rk GROUP BY 1, 2""".stripMargin
  }

  /** [[graft.operators.QualityModel]] — linear quality probe trained
    * by exact-integer full-batch GD (12 iterations, η = 1000/lrDen).
    * Demo target on this corpus: the long-document slice
    * (n_chars ≥ 250), learnable from the text-shape features alone.
    * q149 gates the full weight TRAJECTORY (the oracle re-trains the
    * model as 12 unrolled CTE iterations); q150 gates per-label score
    * aggregates under the final weights. */
  private val probeIters = 12
  private val probeLrDen = 1000L

  private def probeDocs(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("label", (col("n_chars") >= 250L).cast("long"))

  def qualityProbeTrain(s: SparkSession, d: String): DataFrame = {
    import graft.operators.QualityModel
    val hist = QualityModel.train(probeDocs(s, d), "text", "label",
      probeIters, probeLrDen)
    import s.implicits._
    hist.zipWithIndex.map { case (w, i) =>
      ((i + 1).toLong, w(0), w(1), w(2), w(3), w(4))
    }.toDF("iter", "w0", "w1", "w2", "w3", "w4")
  }

  /** Shared oracle fragment: feature CTE + unrolled GD iterations
    * it1..it{probeIters}. */
  private def probeCtes: String = {
    val nTok = """len(regexp_extract_all(text, '\S+'))"""
    val nStop =
      """len(regexp_extract_all(lower(text), '\b(the|a|an|and|of|to|in|is|it)\b'))"""
    val nPunct = """len(regexp_extract_all(text, '[.,;:!?]'))"""
    val nChar = """length(regexp_replace(text, '\s', '', 'g'))"""
    val dot = (0 until 5).map(j => s"w.w$j*f$j").mkString(" + ")
    val iters = (1 to probeIters).map { i =>
      val sums = (0 until 5).map(j =>
        s"sum(f$j * (($dot) // 1000 - y)) AS s$j").mkString(",\n  ")
      val upds = (0 until 5).map(j =>
        s"(w.w$j - (g.s$j // nn.n) // $probeLrDen)::BIGINT AS w$j")
        .mkString(", ")
      s"""g$i AS MATERIALIZED (SELECT
         |  $sums
         |  FROM feats, it${i - 1} w),
         |it$i AS MATERIALIZED (SELECT $upds FROM g$i g, it${i - 1} w, nn)""".stripMargin
    }.mkString(",\n")
    s"""WITH feats AS MATERIALIZED (
       |  SELECT doc_id,
       |    CASE WHEN n_chars >= 250 THEN 1 ELSE 0 END AS label,
       |    1000 AS f0,
       |    least(1000, ($nStop * 10000) // greatest($nTok, 1)) AS f1,
       |    least(1000, ($nPunct * 4000) // greatest($nTok, 1)) AS f2,
       |    least(1000, $nTok * 10) AS f3,
       |    least(1000, ($nChar * 100) // greatest($nTok, 1)) AS f4,
       |    CASE WHEN n_chars >= 250 THEN 1000000 ELSE 0 END AS y
       |  FROM documents),
       |nn AS MATERIALIZED (SELECT count(*) AS n FROM feats),
       |it0 AS (SELECT ${(0 until 5).map(j => s"0::BIGINT AS w$j").mkString(", ")}),
       |$iters""".stripMargin
  }

  val qualityProbeTrainSql: String = {
    val rows = (1 to probeIters).map(i =>
      s"SELECT $i::BIGINT AS iter, w0, w1, w2, w3, w4 FROM it$i")
      .mkString("\n UNION ALL ")
    s"$probeCtes\n$rows"
  }

  def qualityProbeScores(s: SparkSession, d: String): DataFrame = {
    import graft.operators.QualityModel
    val docs = probeDocs(s, d)
    val w = QualityModel.train(docs, "text", "label",
      probeIters, probeLrDen).last
    QualityModel.score(docs, "text", w)
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("quality_ppm")).as("score_sum"),
        min(col("quality_ppm")).as("min_q"),
        max(col("quality_ppm")).as("max_q"),
        sum(when(col("quality_ppm") >= 500000L, 1L).otherwise(0L))
          .as("n_pred_pos"))
  }

  val qualityProbeScoresSql: String = {
    val dot = (0 until 5).map(j => s"w.w$j*f$j").mkString(" + ")
    s"""$probeCtes,
       |sc AS (SELECT label, ($dot) // 1000 AS q
       |       FROM feats, it$probeIters w)
       |SELECT label::BIGINT AS label, count(*) AS n_docs,
       |  sum(q)::BIGINT AS score_sum, min(q)::BIGINT AS min_q,
       |  max(q)::BIGINT AS max_q,
       |  sum(CASE WHEN q >= 500000 THEN 1 ELSE 0 END)::BIGINT AS n_pred_pos
       |FROM sc GROUP BY 1""".stripMargin
  }

  /** q166 — the END-TO-END training-data capstone (the q65-for-LLM-data,
    * composing the now-complete pieces as ONE plan): BPE tokenize
    * (q140's vocabulary, counted per doc) → CCNet perplexity gate
    * (q155's keep-≤-median) → near-dup drop (q60's capped-candidate
    * clusters) → domain quota (q102's 30% lang cap) → GLOBAL
    * token-budget packing by BPE tokens (q133's distributed prefix
    * sum) → deterministic shard shuffle of the PACKS (q92's portable
    * permutation). Output: one row per (shard, pack) with membership
    * checksums, so every stage's exact decisions are in the hash.
    * The oracle replays the whole chain as MATERIALIZED CTEs; the
    * merge list comes from the r10 DRIVER-SIDE trainer
    * ([[graft.operators.Bpe.trainMergesLocal]] — spec-pinned identical
    * to the distributed loop the q139 oracle replays).
    *
    * Cross-operator lineage note (what a composed plan surfaces that
    * per-query gates can't): the quality-kept corpus feeds BOTH the
    * dedup pair generation and the final join chain, so it
    * materializes once ([[graft.operators.Lifecycle]] scratch, zero
    * pinned RDDs — spec-checked), exactly the intermediate-table shape
    * a 100 TB pipeline persists between stages. */
  def curateLlmCorpus(s: SparkSession, d: String): DataFrame = {
    import graft.operators.{BigramLm, Bpe, Components, Dedup, Lifecycle}
    val docs = Tables.documents(s, d)
    // 1. BPE tokenization: per-doc subword token counts under the
    //    corpus-trained vocabulary
    val merges = Bpe.trainMergesLocal(docs, "text", TextQueries.BpeMerges)
    // token COUNTS only (Bpe.tokenCounts): the packing stage never
    // reads the token arrays, so the collect_list+sort+flatten
    // reassembly and the token-level shuffle are dead work here —
    // identical (doc_id, n_bpe_tokens) by construction
    val btok = Lifecycle.materializeToScratch(
      Bpe.tokenCounts(docs, "doc_id", "text", merges))
    // 2. quality gate: keep docs at or below the median LM score
    val scores = Lifecycle.materializeToScratch(
      BigramLm.scoreDocs(docs,
        docs.filter(pmod(col("doc_id"), lit(5)) === 0), "doc_id", "text"))
    val med = scores.agg(
      percentile(col("avg_nll_milli"), lit(0.5)).as("med"))
    val keptQ = scores.crossJoin(broadcast(med))
      .filter(col("avg_nll_milli") <= col("med")).select(col("doc_id"))
    val d2 = Lifecycle.materializeToScratch(
      docs.join(keptQ, Seq("doc_id"), "left_semi"))
    // 3. near-dup drop over the quality-kept corpus
    val pairs = Dedup.ngramJaccardPairs(d2, "doc_id", "text",
      n = 3, minJaccard = 0.5,
      maxDocFreq = Some(DedupQueries.NgramMaxDocFreq))
    val d3 = Components.dropNearDuplicates(d2, "doc_id", pairs)
    // 4. domain quota: no language over 30% of the curated corpus
    val d4 = DataMix.domainQuota(d3, "doc_id", "lang",
      capNum = 3, capDen = 10)
    // 5. global packing by BPE-token budget (curriculum doc_id order)
    val packed = DataMix.packByTokenBudget(
      d4.select(col("doc_id")).join(btok, "doc_id"),
      "doc_id", "n_bpe_tokens", 2000L)
    // 6. deterministic shard shuffle of the packs
    val shards = DataMix.shuffleShards(
      packed.select(col("pack_id")).distinct(), "pack_id", nShards = 8)
    packed.join(shards, "pack_id")
      .groupBy(col("shard"), col("pack_id"), col("pos"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_bpe_tokens")).as("pack_tokens"),
        sum(col("doc_id")).as("id_checksum"))
  }

  val curateLlmCorpusSql: String = {
    val h = (c: String) =>
      s"('0x'||substr(md5($c::VARCHAR || '#42'),1,15))::BIGINT"
    s"""WITH RECURSIVE
       |v8 AS MATERIALIZED (
       |  ${TextQueries.bpeChainSql(TextQueries.BpeMerges).replace("\n", "\n  ")}
       |  SELECT word, w, cnt FROM v${TextQueries.BpeMerges}),
       |seg AS (SELECT word,
       |    len(list_filter(str_split(w, chr(31)), x -> x <> '')) AS seg_len
       |  FROM v8),
       |dw AS (SELECT doc_id, w AS word FROM (
       |    SELECT doc_id,
       |      unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS w
       |    FROM documents)
       |  WHERE w <> '' AND strpos(w, chr(31)) = 0),
       |btok AS MATERIALIZED (
       |  SELECT doc_id, sum(seg_len)::BIGINT AS n_bpe_tokens
       |  FROM dw JOIN seg USING (word) GROUP BY 1),
       |nq AS MATERIALIZED (
       |  ${TextQueries.bigramLmScoresSql.replace("\n", "\n  ")}),
       |mq AS (SELECT quantile_cont(avg_nll_milli, 0.5) AS med FROM nq),
       |d2 AS MATERIALIZED (
       |  SELECT d.* FROM documents d
       |  JOIN nq ON nq.doc_id = d.doc_id, mq
       |  WHERE nq.avg_nll_milli <= mq.med),
       |${DedupQueries.shingleCtes(3, from = "d2")},
       |${DedupQueries.cappedCommonCtes},
       |${DedupQueries.clusterCtes},
       |losers AS (SELECT s AS doc_id FROM reach GROUP BY s
       |           HAVING least(s, min(d)) <> s),
       |d3 AS MATERIALIZED (SELECT * FROM d2
       |      WHERE doc_id NOT IN (SELECT doc_id FROM losers)),
       |qt AS (SELECT (3 * count(*)) // 10 AS target FROM d3),
       |qr AS (SELECT doc_id FROM (
       |    SELECT doc_id, row_number() OVER (PARTITION BY lang
       |      ORDER BY ${h("doc_id")}, doc_id) AS rn
       |    FROM d3), qt
       |  WHERE rn <= target),
       |pk AS MATERIALIZED (
       |  SELECT b.doc_id, b.n_bpe_tokens,
       |    sum(b.n_bpe_tokens) OVER (ORDER BY b.doc_id
       |      ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM btok b JOIN qr ON qr.doc_id = b.doc_id),
       |packed AS (SELECT doc_id, n_bpe_tokens,
       |    ((cum - n_bpe_tokens) // 2000)::BIGINT AS pack_id FROM pk),
       |sh2 AS (SELECT pack_id, ${h("pack_id")} AS h
       |        FROM (SELECT DISTINCT pack_id FROM packed)),
       |shards AS (SELECT pack_id, h % 8 AS shard,
       |    row_number() OVER (PARTITION BY h % 8 ORDER BY h, pack_id) AS pos
       |  FROM sh2)
       |SELECT s.shard, p.pack_id, s.pos, count(*) AS n_docs,
       |  sum(p.n_bpe_tokens)::BIGINT AS pack_tokens,
       |  sum(p.doc_id)::BIGINT AS id_checksum
       |FROM packed p JOIN shards s USING (pack_id)
       |GROUP BY 1, 2, 3""".stripMargin
  }

  def all: Seq[Q] = Seq(
    Q("q166_curate_llm_corpus", curateLlmCorpus, Some(curateLlmCorpusSql)),
    Q("q149_quality_probe_train", qualityProbeTrain,
      Some(qualityProbeTrainSql)),
    Q("q150_quality_probe_scores", qualityProbeScores,
      Some(qualityProbeScoresSql)),
    Q("q54_repetition_quality", repetitionQuality, Some(repetitionQualitySql)),
    Q("q55_boilerplate_ngrams", boilerplate, Some(boilerplateSql)),
    Q("q56_split_contamination", contamination, Some(contaminationSql)),
    Q("q65_curate_corpus", curateCorpus, Some(curateCorpusSql)),
    Q("q71_doc_chunks", docChunks, Some(docChunksSql)),
    Q("q72_pii_redaction", piiRedaction, Some(piiRedactionSql)),
    Q("q73_segment_dedup", segmentDedup, Some(segmentDedupSql)),
    Q("q93_repeated_spans", repeatedSpansQ, Some(repeatedSpansSql)),
    Q("q94_quality_calibration", qualityCalibration, Some(qualityCalibrationSql)))
}
