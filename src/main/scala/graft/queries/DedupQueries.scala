package graft.queries

import graft.Tables
import graft.operators.{Components, DataMix, Dedup}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{coalesce, col, concat, count, countDistinct, expr, lit, md5, pmod, sum}

/** Near-duplicate detection coverage on `documents` (SURVEY north-star:
  * n-gram Jaccard, MinHash+LSH, SimHash). The oracle SQL replays the
  * *entire* pipeline — shingling, the md5-derived portable hash, the
  * seed-derived permutations, banding, Hamming blocking — in DuckDB, so
  * the check validates the algorithm end-to-end (not just a lucky
  * recall=1 corpus).
  *
  * Scale notes: the exact-Jaccard query is quadratic within shingle
  * buckets (fine for dedup-scale corpora after stop-shingle capping);
  * MinHash+LSH and SimHash banding are the 100 TB paths — candidate
  * generation is linear in rows × bands, and verification touches only
  * colliding pairs.
  */
object DedupQueries {

  private val P = Dedup.MersennePrime31

  /** Shared DuckDB CTEs: distinct word n-gram shingles per doc (n=3),
    * whole-text shingle for short docs — mirrors [[Dedup.shingles]].
    * `from` lets composed pipelines (q65) shingle a filtered relation. */
  private[queries] def shingleCtes(n: Int, from: String = "documents"): String =
    s"""docs AS MATERIALIZED (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
       |         FROM $from),
       |sh AS MATERIALIZED (SELECT DISTINCT doc_id, array_to_string(toks[i:i+${n - 1}], ' ') AS shingle
       |       FROM docs, unnest(range(1, greatest(len(toks)-${n - 2}, 2))) t(i))""".stripMargin

  private val jaccardTail: String =
    s"""sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id)
       |SELECT id_a, id_b,
       |  common::DOUBLE/(sa.n_sh + sb.n_sh - common) AS jaccard
       |FROM common
       |JOIN sizes sa ON sa.doc_id = id_a
       |JOIN sizes sb ON sb.doc_id = id_b
       |WHERE common::DOUBLE/(sa.n_sh + sb.n_sh - common) >= 0.5""".stripMargin

  /** Stop-shingle cap for the registered contract path: shingles seen in
    * more docs than this never generate candidates (verification still
    * uses full sets). Bounds the hottest bucket's quadratic term — the
    * uncapped exact join is kept for small-sf spec regression only. */
  val NgramMaxDocFreq = 50

  /** Pairwise 3-gram Jaccard ≥ 0.5 via shingle equi-join, with the
    * stop-shingle candidate cap (the 100 TB-safe registration; the
    * oracle replays the cap, so semantics are fully checked). */
  def ngramJaccard(s: SparkSession, d: String): DataFrame =
    Dedup.ngramJaccardPairs(Tables.documents(s, d), "doc_id", "text",
      n = 3, minJaccard = 0.5, maxDocFreq = Some(NgramMaxDocFreq))

  /** Capped-candidate common-shingle counts, shared by the pair query
    * and the cluster query's pair source. */
  private[queries] val cappedCommonCtes: String =
    s"""freq AS MATERIALIZED (SELECT shingle, count(*) AS n_df FROM sh GROUP BY 1),
       |rare AS MATERIALIZED (SELECT sh.doc_id, sh.shingle
       |         FROM sh JOIN freq USING (shingle) WHERE n_df <= $NgramMaxDocFreq),
       |cand AS MATERIALIZED (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |         FROM rare a JOIN rare b
       |           ON a.shingle = b.shingle AND a.doc_id < b.doc_id),
       |common AS MATERIALIZED (SELECT id_a, id_b, count(*) AS common
       |           FROM cand
       |           JOIN sh a ON a.doc_id = id_a
       |           JOIN sh b ON b.doc_id = id_b AND b.shingle = a.shingle
       |           GROUP BY 1, 2)""".stripMargin

  val ngramJaccardSql: String =
    s"""WITH ${shingleCtes(3)},
       |$cappedCommonCtes,
       |$jaccardTail""".stripMargin

  /** MinHash(64)+LSH(16×4) with exact-Jaccard verification ≥ 0.5,
    * portable-hash mode so DuckDB replays it exactly. */
  def minHashLsh(s: SparkSession, d: String): DataFrame =
    Dedup.minHashPairs(Tables.documents(s, d), "doc_id", "text",
      shingleN = 3, numHashes = 64, bands = 16, minJaccard = 0.5,
      seed = 42L, portable = true)

  val minHashLshSql: String = {
    val params = Dedup.hashParams(64, 42L)
    val mins = params.zipWithIndex.map { case ((a, b), i) =>
      s"min((h*$a + $b) % $P) AS mh_$i"
    }.mkString(",\n  ")
    val bandSelects = (0 until 16).map { b =>
      val comps = (0 until 4).map(r => s"mh_${b * 4 + r}").mkString(",")
      s"SELECT doc_id, $b AS band_idx, md5(array_to_string([$comps], ',')) AS band_hash FROM sig"
    }.mkString("\n  UNION ALL ")
    s"""WITH ${shingleCtes(3)},
       |h AS MATERIALIZED (SELECT doc_id, ('0x'||substr(md5(shingle),1,15))::BIGINT % $P AS h
       |      FROM sh WHERE shingle IS NOT NULL),
       |sig AS MATERIALIZED (SELECT doc_id,
       |  $mins
       |  FROM h GROUP BY doc_id),
       |bands AS MATERIALIZED (
       |  $bandSelects),
       |cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
       |         FROM bands x JOIN bands y
       |           ON x.band_idx = y.band_idx AND x.band_hash = y.band_hash
       |          AND x.doc_id < y.doc_id),
       |common AS (SELECT id_a, id_b, count(*) AS common
       |           FROM cand
       |           JOIN sh a ON a.doc_id = id_a
       |           JOIN sh b ON b.doc_id = id_b AND b.shingle = a.shingle
       |           GROUP BY 1, 2),
       |$jaccardTail""".stripMargin
  }

  /** SimHash(60-bit, shingle-set) pairs with Hamming ≤ 3 via 4×15-bit
    * band blocking, portable-hash mode. */
  def simHash(s: SparkSession, d: String): DataFrame =
    Dedup.simHashPairs(Tables.documents(s, d), "doc_id", "text",
      shingleN = 3, maxHamming = 3, portable = true)

  val simHashSql: String = {
    val votes = (0 until 60).map(i =>
      s"sum(CASE WHEN (h >> $i) & 1 = 1 THEN 1 ELSE -1 END) AS v_$i").mkString(",\n  ")
    val bits = (0 until 60).map(i =>
      s"(CASE WHEN v_$i > 0 THEN (1::BIGINT << $i) ELSE 0 END)").mkString(" + ")
    s"""WITH ${shingleCtes(3)},
       |h AS (SELECT doc_id, ('0x'||substr(md5(shingle),1,15))::BIGINT AS h
       |      FROM sh WHERE shingle IS NOT NULL),
       |votes AS (SELECT doc_id,
       |  $votes
       |  FROM h GROUP BY doc_id),
       |sig AS (SELECT doc_id, $bits AS simhash FROM votes),
       |banded AS (SELECT doc_id, simhash, b AS band_idx,
       |             (simhash >> (b*15)) & 32767 AS band_val
       |           FROM sig, unnest([0,1,2,3]) t(b)),
       |pairs AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b,
       |            bit_count(xor(x.simhash, y.simhash)) AS hamming
       |          FROM banded x JOIN banded y
       |            ON x.band_idx = y.band_idx AND x.band_val = y.band_val
       |           AND x.doc_id < y.doc_id)
       |SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 3""".stripMargin
  }

  /** Near-dup pairs resolved to duplicate CLUSTERS: connected
    * components over the capped-Jaccard pair graph, one row per doc
    * that appears in any pair, labelled with its component's smallest
    * doc id. The oracle replays the whole chain — shingles → capped
    * pairs → recursive reachability closure → min label — so the
    * component semantics (not just the pair set) are checked. */
  def dedupClusters(s: SparkSession, d: String): DataFrame = {
    val pairs = Dedup.ngramJaccardPairs(Tables.documents(s, d), "doc_id",
      "text", n = 3, minJaccard = 0.5, maxDocFreq = Some(NgramMaxDocFreq))
    Components.connectedComponents(pairs, "id_a", "id_b")
      .select(col("node").as("doc_id"), col("component").as("cluster_id"))
  }

  /** sizes→pairs→edges→recursive reachability: the component CTE chain
    * over an existing `sh`+`common` pair source (requires WITH
    * RECURSIVE). Shared with the composed curation pipeline (q65). */
  private[queries] val clusterCtes: String =
    s"""sizes AS MATERIALIZED (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
       |pairs AS MATERIALIZED (SELECT id_a, id_b
       |          FROM common
       |          JOIN sizes sa ON sa.doc_id = id_a
       |          JOIN sizes sb ON sb.doc_id = id_b
       |          WHERE common::DOUBLE/(sa.n_sh + sb.n_sh - common) >= 0.5),
       |edges AS MATERIALIZED (SELECT id_a AS s, id_b AS d FROM pairs
       |          UNION ALL SELECT id_b, id_a FROM pairs),
       |reach AS (SELECT s, d FROM edges
       |          UNION
       |          SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s)""".stripMargin

  val dedupClustersSql: String =
    s"""WITH RECURSIVE ${shingleCtes(3)},
       |$cappedCommonCtes,
       |$clusterCtes
       |SELECT s AS doc_id, least(s, min(d)) AS cluster_id
       |FROM reach GROUP BY s""".stripMargin

  /** Leakage-safe train/test split at DUP-CLUSTER granularity: the
    * split key is the q60 component label (coalesced to the doc's own
    * id for unclustered docs), hashed through
    * [[DataMix.groupAwareSplit]] — so a near-dup family can NEVER
    * straddle train/test, the exact leak a row-hash split (q45)
    * permits and q56 then has to detect. Output is the per-split audit
    * (docs, clustered docs, distinct clusters, id checksum); the
    * straddle-impossibility is structural (one hash per group), and
    * the oracle replays components + hash-split + aggregate end to
    * end. At 100 TB the extra cost over a row split is exactly the
    * q60 clustering pass; the split itself stays map-side. */
  def clusterSplit(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val clusters = dedupClusters(s, d).withColumnRenamed("cluster_id", "__cid")
    val keyed = docs.join(clusters, Seq("doc_id"), "left")
      .withColumn("__grp", coalesce(col("__cid"), col("doc_id")))
    DataMix.groupAwareSplit(keyed, "__grp", testFraction = 0.25)
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        count(col("__cid")).as("n_clustered_docs"),
        countDistinct(col("__cid")).as("n_clusters"),
        sum(col("doc_id")).as("id_sum"))
  }

  val clusterSplitSql: String =
    s"""WITH RECURSIVE ${shingleCtes(3)},
       |$cappedCommonCtes,
       |$clusterCtes,
       |cl AS (SELECT s AS doc_id, least(s, min(d)) AS cid
       |       FROM reach GROUP BY s),
       |k AS (SELECT d.doc_id, cl.cid,
       |        coalesce(cl.cid, d.doc_id) AS grp
       |      FROM documents d LEFT JOIN cl USING (doc_id)),
       |sp AS (SELECT doc_id, cid,
       |        CASE WHEN ${DataMixQueries.sqlBucket("grp", 42L)} < 250000
       |             THEN 'test' ELSE 'train' END AS split
       |       FROM k)
       |SELECT split, count(*) AS n_docs,
       |  count(cid) AS n_clustered_docs,
       |  count(DISTINCT cid) AS n_clusters,
       |  (sum(doc_id))::BIGINT AS id_sum
       |FROM sp GROUP BY 1""".stripMargin

  /** Incremental (ingestion-order) MinHash+LSH dedup: docs arrive in 4
    * batches (doc_id % 4), each batch dedups against itself (smaller-id
    * wins) and against the admitted-so-far signature index — the
    * steady-state shape of corpus dedup ([[StreamingDedup]]; the
    * streaming ingester shares this exact per-batch step, pinned by
    * StreamingDedupSpec). Returns the admitted (doc_id, ingest_batch).
    * 16 hashes × 4 bands so collisions actually occur at corpus scale. */
  def incrementalDedupQ(s: SparkSession, d: String): DataFrame =
    graft.streaming.StreamingDedup.incrementalDedup(
      Tables.documents(s, d), "doc_id", "text",
      pmod(col("doc_id"), lit(4)).cast("int"), nBatches = 4,
      shingleN = 3, numHashes = 16, bands = 4, seed = 42L,
      portable = true)

  /** SQL replay of the 4-batch incremental fold; `withRetraction` adds
    * a takedown of every admitted doc with `doc_id % 10 = 1` BETWEEN
    * batch 2 and batch 3 — batch 3's index probe then sees the retained
    * set only, and the retracted docs leave the final corpus (q86's
    * tombstone semantics: "fold over the retained subset"). */
  private def incrementalSql(withRetraction: Boolean): String = {
    val params = Dedup.hashParams(16, 42L)
    val mins = params.zipWithIndex.map { case ((a, b), i) =>
      s"min((h*$a + $b) % $P) AS mh_$i"
    }.mkString(",\n  ")
    val bandSelects = (0 until 4).map { b =>
      val comps = (0 until 4).map(r => s"mh_${b * 4 + r}").mkString(",")
      s"SELECT doc_id, $b AS band_idx, md5(array_to_string([$comps], ',')) AS band_hash FROM sig"
    }.mkString("\n  UNION ALL ")
    // novelty unrolls across the 4 batches: novel_k = batch-k docs with
    // no same-batch smaller-id collision (w) and no collision with any
    // earlier batch's NOVEL docs — the index only ever holds admitted
    // signatures, exactly like StreamingDedup.processBatch. With
    // retraction, batch 3's cross-batch probe skips tombstoned ids.
    val novelCte = (k: Int) => {
      val cross = if (k == 0) "" else {
        val prev = (0 until k).map(j => s"SELECT doc_id FROM novel$j")
          .mkString(" UNION ALL ")
        val skipRetracted =
          if (withRetraction && k == 3)
            " AND y.doc_id NOT IN (SELECT doc_id FROM ret)"
          else ""
        s"""
           |  AND NOT EXISTS (SELECT 1 FROM bands x JOIN bands y
           |    ON x.band_idx = y.band_idx AND x.band_hash = y.band_hash
           |    WHERE x.doc_id = bt.doc_id AND y.doc_id IN ($prev)$skipRetracted)""".stripMargin
      }
      s"""novel$k AS (SELECT doc_id FROM bt WHERE b = $k
         |  AND NOT EXISTS (SELECT 1 FROM w WHERE w.doc_id = bt.doc_id)$cross)""".stripMargin
    }
    // the ret CTE sits between novel2 and novel3: the takedown happens
    // after batch 2 committed, over the admitted-so-far set
    val retCte =
      s"""ret AS (SELECT doc_id FROM bt WHERE doc_id % 10 = 1
         |  AND doc_id IN (${(0 until 3).map(j => s"SELECT doc_id FROM novel$j")
           .mkString(" UNION ALL ")}))""".stripMargin
    val novelCtes =
      if (withRetraction)
        ((0 until 3).map(novelCte) ++ Seq(retCte, novelCte(3))).mkString(",\n")
      else (0 until 4).map(novelCte).mkString(",\n")
    val admitted = (0 until 4).map(k => s"SELECT doc_id FROM novel$k")
      .mkString(" UNION ALL ")
    val finalFilter =
      if (withRetraction)
        s"doc_id IN ($admitted) AND doc_id NOT IN (SELECT doc_id FROM ret)"
      else s"doc_id IN ($admitted)"
    s"""WITH ${shingleCtes(3)},
       |h AS MATERIALIZED (SELECT doc_id, ('0x'||substr(md5(shingle),1,15))::BIGINT % $P AS h
       |      FROM sh WHERE shingle IS NOT NULL),
       |sig AS MATERIALIZED (SELECT doc_id,
       |  $mins
       |  FROM h GROUP BY doc_id),
       |bands AS MATERIALIZED (
       |  $bandSelects),
       |bt AS (SELECT doc_id, (doc_id % 4)::INT AS b FROM documents),
       |w AS (SELECT DISTINCT y.doc_id
       |      FROM bands x JOIN bands y
       |        ON x.band_idx = y.band_idx AND x.band_hash = y.band_hash
       |       AND x.doc_id < y.doc_id
       |      JOIN bt bx ON bx.doc_id = x.doc_id
       |      JOIN bt byy ON byy.doc_id = y.doc_id AND byy.b = bx.b),
       |$novelCtes
       |SELECT doc_id, b AS ingest_batch FROM bt
       |WHERE $finalFilter""".stripMargin
  }

  val incrementalDedupSql: String = incrementalSql(withRetraction = false)

  val retractedDedupSql: String = incrementalSql(withRetraction = true)

  /** q80's semantics through the REAL on-disk ingest path: each batch
    * writes its novel docs and block keys as `ingest_batch=` partitions,
    * probes the accumulated index via [[graft.streaming.StreamingDedup
    * .readIndex]] (Hadoop-FS listing, generation-aware), the index is
    * compacted into a `gen=` generation MID-RUN and the output corpus
    * compacted at the end — so the driver's DuckDB gate covers the
    * storage machinery (partition listing, crash-safe generation fold,
    * mixed-layout [[graft.streaming.StreamingDedup.readCorpus]]), not
    * just the in-memory fold q80 exercises. Same admitted set as q80
    * by construction, checked against the same SQL replay. */
  def ingestedDedupQ(s: SparkSession, d: String): DataFrame = {
    import graft.streaming.StreamingDedup
    val docs = Tables.documents(s, d)
    // durable storage, NOT under Lifecycle.scratchRoot: the per-batch
    // release() below frees the batch's scratch blocking by deleting
    // every scanned root under the scratch root — an index parquet
    // placed there would be reclaimed out from under later batches
    val root = tempWorkDir("graft_q82_")
    val ix = s"$root/ix"; val out = s"$root/out"
    val blocks: DataFrame => DataFrame =
      StreamingDedup.minHashBlocks("doc_id", "text",
        shingleN = 3, numHashes = 16, bands = 4, seed = 42L,
        portable = true)
    (0 until 4).foreach { k =>
      val batch = docs.filter(pmod(col("doc_id"), lit(4)) === k)
      val (novel, novelBlocks) = StreamingDedup.processBatch(batch,
        StreamingDedup.readIndex(s, ix, k), "doc_id", blocks)
      novel.write.mode("overwrite").parquet(s"$out/ingest_batch=$k")
      novelBlocks.write.mode("overwrite").parquet(s"$ix/ingest_batch=$k")
      graft.operators.Lifecycle.release(novelBlocks)
      // compact committed batches 0-1 into gen=2: batch 3's probe then
      // reads a generation PLUS a live partition (the mixed layout)
      if (k == 2) StreamingDedup.compactIndex(s, ix)
    }
    StreamingDedup.compactOutput(s, out)
    StreamingDedup.readCorpus(s, out).get
      .select(col("doc_id"),
        col("ingest_batch").cast("int").as("ingest_batch"))
  }

  /** q82's on-disk ingest with a TAKEDOWN between batches 2 and 3:
    * every admitted doc with `doc_id % 10 = 1` is retracted
    * ([[graft.streaming.StreamingDedup.retract]] tombstones on both the
    * index and the corpus), the index is compacted WITH the tombstones
    * in force (retracted rows physically leave the generation), then
    * batch 3 ingests against the retained index — a batch-3 doc whose
    * only near-dup was retracted must now be admitted. The oracle
    * replays the same timeline over the retained subset. */
  def retractedDedupQ(s: SparkSession, d: String): DataFrame = {
    import graft.streaming.StreamingDedup
    val docs = Tables.documents(s, d)
    val root = tempWorkDir("graft_q86_")
    val ix = s"$root/ix"; val out = s"$root/out"
    val blocks: DataFrame => DataFrame =
      StreamingDedup.minHashBlocks("doc_id", "text",
        shingleN = 3, numHashes = 16, bands = 4, seed = 42L,
        portable = true)
    (0 until 4).foreach { k =>
      if (k == 3) {
        val takedown = StreamingDedup.readCorpus(s, out).get
          .filter(pmod(col("doc_id"), lit(10)) === 1)
          .select(col("doc_id"))
        StreamingDedup.retract(s, ix, takedown, "doc_id")
        StreamingDedup.retract(s, out, takedown, "doc_id")
        // compact with tombstones in force: the new generation is the
        // retained subset — batch 3 then probes generation + nothing
        StreamingDedup.compactIndex(s, ix)
      }
      val batch = docs.filter(pmod(col("doc_id"), lit(4)) === k)
      val (novel, novelBlocks) = StreamingDedup.processBatch(batch,
        StreamingDedup.readIndex(s, ix, k), "doc_id", blocks)
      novel.write.mode("overwrite").parquet(s"$out/ingest_batch=$k")
      novelBlocks.write.mode("overwrite").parquet(s"$ix/ingest_batch=$k")
      graft.operators.Lifecycle.release(novelBlocks)
    }
    StreamingDedup.compactOutput(s, out)
    StreamingDedup.readCorpus(s, out).get
      .select(col("doc_id"),
        col("ingest_batch").cast("int").as("ingest_batch"))
  }

  /** Exact membership dedup of a new batch (doc_id ≡ 0 mod 4) against
    * the existing corpus (everything else) via [[Dedup
    * .bloomPrunedAntiJoin]]: the corpus side — 100 TB in a real ingest
    * — is bloom-pruned to possible collisions before the anti-join
    * shuffle ever runs. The oracle replays plain NOT EXISTS semantics:
    * identical output is the whole point (blooms have no false
    * negatives; false positives die in the exact join). */
  def bloomDedupQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), md5(col("text")).as("fp"))
    val batch = docs.filter(pmod(col("doc_id"), lit(4)) === 0)
    val corpus = docs.filter(pmod(col("doc_id"), lit(4)) =!= 0)
    Dedup.bloomPrunedAntiJoin(batch, corpus, "fp")
      .select(col("doc_id"), col("fp"))
  }

  val bloomDedupSql: String =
    """WITH fp AS (SELECT doc_id, md5(text) AS fp FROM documents),
      |batch AS (SELECT * FROM fp WHERE doc_id % 4 = 0),
      |corpus AS (SELECT * FROM fp WHERE doc_id % 4 <> 0)
      |SELECT doc_id, fp FROM batch b
      |WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.fp = b.fp)""".stripMargin

  /** Asymmetric containment pairs at C ≥ 0.8: catches docs quoted or
    * embedded inside much larger docs, where Jaccard stays below any
    * usable threshold (J ≈ |A|/|B| at full containment). Shares q19's
    * shingling, stop-shingle cap, and candidate generation — only the
    * verification ratio differs, and it's directional. */
  def containmentDedup(s: SparkSession, d: String): DataFrame =
    Dedup.containmentPairs(Tables.documents(s, d), "doc_id", "text",
      n = 3, minContainment = 0.8, maxDocFreq = NgramMaxDocFreq)

  val containmentDedupSql: String =
    s"""WITH ${shingleCtes(3)},
       |$cappedCommonCtes,
       |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
       |c AS (SELECT id_a, id_b, common, sa.n_sh AS n_a, sb.n_sh AS n_b
       |      FROM common
       |      JOIN sizes sa ON sa.doc_id = id_a
       |      JOIN sizes sb ON sb.doc_id = id_b)
       |SELECT id_a AS contained_id, id_b AS container_id,
       |  round(common::DOUBLE/n_a, 6) AS containment
       |FROM c WHERE round(common::DOUBLE/n_a, 6) >= 0.8
       |UNION ALL
       |SELECT id_b, id_a, round(common::DOUBLE/n_b, 6)
       |FROM c WHERE round(common::DOUBLE/n_b, 6) >= 0.8""".stripMargin

  /** Prefix-filtered all-pairs Jaccard ≥ 4/5 — the LOSSLESS scale path
    * for exact similarity join ([[graft.operators.Dedup
    * .prefixJaccardPairs]]): candidates only from each doc's
    * rarest-first prefix. The oracle is deliberately the PLAIN exact
    * all-pairs SQL with no prefix anywhere: equality against the naive
    * join — not a replay of the optimization — is the correctness
    * claim (same pattern as the salted-join oracles). */
  def prefixJaccard(s: SparkSession, d: String): DataFrame =
    Dedup.prefixJaccardPairs(Tables.documents(s, d), "doc_id", "text",
      n = 3, tNum = 4L, tDen = 5L)

  val prefixJaccardSql: String =
    s"""WITH ${shingleCtes(3)},
       |common AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |             count(*) AS common
       |           FROM sh a JOIN sh b
       |             ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |           GROUP BY 1, 2),
       |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id)
       |SELECT id_a, id_b,
       |  common::DOUBLE/(sa.n_sh + sb.n_sh - common) AS jaccard
       |FROM common
       |JOIN sizes sa ON sa.doc_id = id_a
       |JOIN sizes sb ON sb.doc_id = id_b
       |WHERE common * 5 >= 4 * (sa.n_sh + sb.n_sh - common)""".stripMargin

  /** Entity resolution under typos: every third customer name gets one
    * deterministically-deleted character, then matches back against
    * the clean reference via [[graft.operators.FuzzyJoin.ed1Join]]
    * (deletion-neighborhood blocking — never the all-pairs Levenshtein
    * scan). The oracle IS the all-pairs scan (`ON levenshtein ≤ 1`):
    * the blocked join must reproduce it exactly, including incidental
    * matches to OTHER reference names one edit away.
    *
    * Deliberately UNCAPPED ([[graft.operators.FuzzyJoin.ed1Join]]'s
    * `maxBucket` stays at its exact default): the measured sf1.0
    * candidate set is 4,094,320 distinct pairs of which 4,094,320 —
    * every one — verify as genuine ed≤1 matches (digit-run name
    * collisions make the true answer grow ~quadratically in customer
    * count). The blocking emits ZERO junk here, so this query's
    * super-linear 10×-data ratio is the RESULT SIZE, not a candidate
    * blowup — an anchor cap could only shrink it by dropping true
    * matches. Reach for the cap on distributions whose hot buckets are
    * collision junk (transposition-heavy keys), not this one. */
  def fuzzyEntityMatch(s: SparkSession, d: String): DataFrame = {
    import graft.operators.FuzzyJoin
    val cust = Tables.customer(s, d).select(col("c_custkey"), col("c_name"))
    val corrupted = cust.filter(col("c_custkey") % 3 === 0)
      .select(col("c_custkey").as("corr_key"),
        concat(expr("substring(c_name, 1, cast(c_custkey % length(c_name) as int))"),
          expr("substring(c_name, cast(c_custkey % length(c_name) as int) + 2, length(c_name))"))
          .as("corr_name"))
    FuzzyJoin.ed1Join(corrupted, cust, "corr_key", "corr_name",
        "c_custkey", "c_name")
      .groupBy(col("corr_key"))
      .agg(count(lit(1)).as("n_matches"),
        sum(col("c_custkey")).as("match_key_sum"))
  }

  /** The oracle replays the DELETION-NEIGHBORHOOD BLOCKING itself
    * (FastSS): two strings at edit distance ≤ 1 always share a member
    * of their {self} ∪ one-char-deletions sets (substitution at i →
    * both drop i; insert/delete → the longer's deletion IS the
    * shorter; the intersection can also fire on ed-2 pairs like
    * ab/ba, which the exact levenshtein verify on CANDIDATES removes).
    * Verified equal to the naive all-pairs scan at sf0.01; unlike
    * all-pairs — O(n²) edit distances, infeasible at sf1.0 in any
    * engine — this form checks the losslessness claim at every scale
    * the suite runs. Shared CTEs materialized per the sf1.0 oracle
    * discipline. */
  val fuzzyEntityMatchSql: String =
    """WITH corr AS MATERIALIZED (
      |  SELECT c_custkey AS corr_key,
      |    substr(c_name, 1, CAST(c_custkey % length(c_name) AS INT)) ||
      |    substr(c_name, CAST(c_custkey % length(c_name) AS INT) + 2,
      |           length(c_name)) AS corr_name
      |  FROM customer WHERE c_custkey % 3 = 0),
      |cv AS MATERIALIZED (
      |  SELECT corr_key, corr_name, corr_name AS v FROM corr
      |  UNION ALL
      |  SELECT corr_key, corr_name,
      |    substr(corr_name, 1, i-1) || substr(corr_name, i+1,
      |      length(corr_name))
      |  FROM corr, unnest(generate_series(1, length(corr_name))) t(i)),
      |uv AS MATERIALIZED (
      |  SELECT c_custkey, c_name, c_name AS v FROM customer
      |  UNION ALL
      |  SELECT c_custkey, c_name,
      |    substr(c_name, 1, i-1) || substr(c_name, i+1, length(c_name))
      |  FROM customer, unnest(generate_series(1, length(c_name))) t(i)),
      |cand AS (
      |  SELECT DISTINCT corr_key, corr_name, c_custkey, c_name
      |  FROM cv JOIN uv ON cv.v = uv.v)
      |SELECT corr_key, count(*) AS n_matches,
      |  (sum(c_custkey))::BIGINT AS match_key_sum
      |FROM cand WHERE levenshtein(corr_name, c_name) <= 1
      |GROUP BY 1""".stripMargin

  def all: Seq[Q] = Seq(
    Q("q113_prefix_jaccard", prefixJaccard, Some(prefixJaccardSql)),
    Q("q117_fuzzy_entity_match", fuzzyEntityMatch, Some(fuzzyEntityMatchSql)),
    Q("q19_ngram_jaccard", ngramJaccard, Some(ngramJaccardSql)),
    Q("q20_minhash_lsh", minHashLsh, Some(minHashLshSql)),
    Q("q21_simhash", simHash, Some(simHashSql)),
    Q("q60_dedup_clusters", dedupClusters, Some(dedupClustersSql)),
    Q("q170_cluster_split", clusterSplit, Some(clusterSplitSql)),
    Q("q80_incremental_dedup", incrementalDedupQ, Some(incrementalDedupSql)),
    Q("q82_ingested_dedup", ingestedDedupQ, Some(incrementalDedupSql)),
    Q("q86_retracted_dedup", retractedDedupQ, Some(retractedDedupSql)),
    Q("q89_bloom_dedup", bloomDedupQ, Some(bloomDedupSql)),
    Q("q97_containment_dedup", containmentDedup, Some(containmentDedupSql)))
}
